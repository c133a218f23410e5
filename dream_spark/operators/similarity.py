"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths, per SURVEY.md's north-star extensions:
- ``knn_bruteforce`` — exact cosine top-k: the correctness baseline.  A
  broadcast of the (small) query set against the full corpus: corpus-side
  scan parallelizes perfectly, no corpus shuffle at all.
- ``knn_lsh`` — the scale path: random-hyperplane LSH buckets restrict each
  query to its candidate bucket(s), then exact rerank within candidates.
  At 100 TB the bucket join replaces the full scan; recall is tunable by
  tables × planes.

Both use the FLOOR(x·10^6) integer quantization from operators/dedup.py so
every cosine is bit-identical across engines (see the determinism contract
in operators/relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dream_spark.operators.dedup import EMB_QUANT, _bucket_expr, _duck_buckets, _duck_quantized, _quantized

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5

_DOT = (
    "aggregate(sequence(1, size(qa)), CAST(0 AS BIGINT),"
    " (acc, i) -> acc + element_at(qa, CAST(i AS INT)) * element_at(qb, CAST(i AS INT)))"
)


def _cos_col():
    return F.expr(_DOT).cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k neighbors for each query vector (vec_id < N_QUERIES),
    self excluded; deterministic ordering by (cos DESC, neighbor id)."""
    q = _quantized(spark, sf_dir)
    queries = q.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("qa"), F.col("nrm").alias("na")
    )
    corpus = q.select(
        F.col("vec_id").alias("neighbor_id"), F.col("qe").alias("qb"), F.col("nrm").alias("nb")
    )
    pairs = F.broadcast(queries).crossJoin(corpus).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select("query_id", "neighbor_id", _cos_col().alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


_DUCK_COS = (
    "CAST(list_sum([qa[CAST(i AS INT)] * qb[CAST(i AS INT)] FOR i IN range(1, 1 + len(qa))]) AS DOUBLE)"
    " / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))"
)

KNN_BRUTEFORCE_SQL = f"""
WITH {_duck_quantized()},
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         a.qe AS qa, b.qe AS qb, a.nrm AS na, b.nrm AS nb
  FROM qn a JOIN qn b ON a.vec_id < {N_QUERIES} AND a.vec_id <> b.vec_id
),
scored AS (
  SELECT query_id, neighbor_id, {_DUCK_COS} AS cos FROM pairs
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""".strip()


def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: candidates = corpus vectors sharing an LSH bucket with the
    query in ≥1 of the hash tables, exact cosine rerank within candidates.
    Smaller k_eff than brute force when buckets miss — the documented LSH
    recall tradeoff; the oracle replays identical buckets."""
    q = _quantized(spark, sf_dir)
    b = q.select("vec_id", "qe", "nrm", F.explode(F.expr(_bucket_expr())).alias("x")).select(
        "vec_id", "qe", "nrm", F.col("x.tbl").alias("tbl"), F.col("x.bkt").alias("bkt")
    )
    queries = b.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qe").alias("qa"),
        F.col("nrm").alias("na"),
        "tbl",
        "bkt",
    )
    corpus = b.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("qe").alias("qb"),
        F.col("nrm").alias("nb"),
        "tbl",
        "bkt",
    )
    cand = (
        F.broadcast(queries)
        .join(corpus, on=["tbl", "bkt"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select("query_id", "neighbor_id", _cos_col().alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


KNN_LSH_SQL = f"""
WITH {_duck_quantized()},
{_duck_buckets()},
cand AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ANY_VALUE(a.qe) AS qa, ANY_VALUE(b.qe) AS qb,
         ANY_VALUE(a.nrm) AS na, ANY_VALUE(b.nrm) AS nb
  FROM buckets a JOIN buckets b ON a.tbl = b.tbl AND a.bkt = b.bkt
  WHERE a.vec_id < {N_QUERIES} AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
scored AS (SELECT query_id, neighbor_id, {_DUCK_COS} AS cos FROM cand)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""".strip()


QUERIES = {
    "knn_bruteforce": knn_bruteforce,
    "knn_lsh": knn_lsh,
}

ORACLES = {
    "knn_bruteforce": KNN_BRUTEFORCE_SQL,
    "knn_lsh": KNN_LSH_SQL,
}

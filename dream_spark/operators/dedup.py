"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
and embedding-cosine near-duplicates.

Scale design notes (the part that matters at 100 TB):
- No operator materializes the O(n^2) pair space.  Candidate pairs always
  come from an equi-join on a *bucket key* (LSH band hash, SimHash band,
  rare-feature id, hyperplane bucket) — Spark shuffles by bucket, buckets are
  small, and the exact verification runs only on candidates.
- Signatures are computed as per-document aggregations (groupBy doc_id with
  K conditional-min/sum columns) — partial aggregation map-side, one shuffle
  of #docs rows, no K-fold row explosion.
- All hashing is the deterministic integer family in functions/hashing.py,
  replayed verbatim by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dream_spark.functions.features import (
    duck_shingle_ids_cte,
    shingle_ids,
)
from dream_spark.functions.hashing import BAND_WEIGHTS, hash_sql
from dream_spark.sources.tables import load_table

# MinHash configuration: 16 hashes in 4 bands of 4 → LSH threshold ≈ 0.71.
MINHASH_K = 16
BAND_ROWS = 4
N_BANDS = MINHASH_K // BAND_ROWS

JACCARD_THRESHOLD = 0.8
RARE_DF_MAX = 50  # candidate filter: only shingles appearing in ≤ 50 docs

SIMHASH_BITS = 16
SIMHASH_MAX_HAMMING = 3

EMB_QUANT = 1_000_000  # float → int quantization scale (exact cross-engine)
EMB_COS_THRESHOLD = 0.4
EMB_PLANES = 16  # 4 tables × 4 hyperplanes


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact row dedup — ``part`` unioned with itself (the FIXTURES.md
    duplicate-injection recipe) then dropDuplicates == SELECT DISTINCT."""
    part = load_table(spark, sf_dir, "part")
    return part.unionAll(part).dropDuplicates()


DEDUP_EXACT_SQL = "SELECT DISTINCT * FROM (SELECT * FROM part UNION ALL SELECT * FROM part)"


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-keyed dedup: one surviving doc_id per distinct text (keep the
    smallest id), with the duplicate count — groupBy on the content key, the
    canonical hash-dedup shape (shuffle keyed by text hash at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("keep_id", "n_copies")


DEDUP_EXACT_DOCS_SQL = (
    "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies FROM documents GROUP BY text"
)


# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------
def _minhash_signatures(sids: DataFrame) -> DataFrame:
    """(doc_id, sig0..sig{K-1}): K conditional mins in ONE groupBy — no row
    explosion, map-side partial min."""
    aggs = [
        F.min(F.expr(hash_sql("sid", i))).alias(f"sig{i}") for i in range(MINHASH_K)
    ]
    return sids.groupBy("doc_id").agg(*aggs)


def _band_frame(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, bh): band hash = commutative weighted sum of in-band
    signature values (fits int64; see hashing.BAND_WEIGHTS)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                sum(
                    F.col(f"sig{b * BAND_ROWS + r}") * F.lit(BAND_WEIGHTS[r])
                    for r in range(BAND_ROWS)
                ).alias("bh"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(bands).alias("x")).select(
        "doc_id", F.col("x.band").alias("band"), F.col("x.bh").alias("bh")
    )


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs over character-3-gram sets.

    shingle → minhash → band → bucket-join: the only shuffles are the
    signature groupBy and the band self-join, both keyed small."""
    docs = load_table(spark, sf_dir, "documents")
    bands = _band_frame(_minhash_signatures(shingle_ids(docs)))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _duck_minhash_bands() -> str:
    sig_cols = ", ".join(f"MIN({hash_sql('sid', i)}) AS sig{i}" for i in range(MINHASH_K))
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " + ".join(f"sig{b * BAND_ROWS + r} * {BAND_WEIGHTS[r]}" for r in range(BAND_ROWS))
        + " AS bh FROM sigs"
        for b in range(N_BANDS)
    )
    return f"""
sids AS ({duck_shingle_ids_cte()}),
sigs AS (SELECT doc_id, {sig_cols} FROM sids GROUP BY doc_id),
bands AS ({band_selects})""".strip()


DEDUP_MINHASH_SQL = f"""
WITH {_duck_minhash_bands()}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
""".strip()


# --------------------------------------------------------------------------
# exact n-gram Jaccard with rare-feature candidate filtering
# --------------------------------------------------------------------------
def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with shingle-set Jaccard ≥ 0.8.

    Candidate generation joins only on *rare* shingles (document frequency
    ≤ RARE_DF_MAX) — the prefix-filtering idea: near-identical documents
    share rare features, while stopword-like features (df ~ all docs) would
    make the join quadratic.  Exact |∩|/|∪| is then computed on candidates
    only.
    """
    docs = load_table(spark, sf_dir, "documents")
    sids = shingle_ids(docs)
    sizes = sids.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    rare = sids.join(
        sids.groupBy("sid").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") <= RARE_DF_MAX),
        on="sid",
    ).select("doc_id", "sid")
    cand = (
        rare.alias("a")
        .join(rare.alias("b"), on="sid")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    inter = (
        cand.join(sids.alias("sa"), cand.doc_a == F.col("sa.doc_id"))
        .join(
            sids.alias("sb"),
            (cand.doc_b == F.col("sb.doc_id")) & (F.col("sa.sid") == F.col("sb.sid")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    jac = (
        inter.join(na, on="doc_a")
        .join(nb, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= JACCARD_THRESHOLD)


DEDUP_JACCARD_SQL = f"""
WITH sids AS ({duck_shingle_ids_cte()}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sids GROUP BY doc_id),
rare AS (
  SELECT doc_id, sid FROM sids
  WHERE sid IN (SELECT sid FROM sids GROUP BY sid HAVING COUNT(*) <= {RARE_DF_MAX})
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare a JOIN rare b ON a.sid = b.sid AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sids sa ON sa.doc_id = c.doc_a
  JOIN sids sb ON sb.doc_id = c.doc_b AND sb.sid = sa.sid
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter) >= {JACCARD_THRESHOLD}
""".strip()


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash): 16-bit SimHash over the shingle set — bit j is the
    sign of Σ ±1 where ± is bit j of h_0(shingle).  Computed as 16
    conditional sums in one groupBy (no explosion)."""
    docs = load_table(spark, sf_dir, "documents")
    sids = shingle_ids(docs)
    h = hash_sql("sid", 0)
    aggs = [
        F.sum(F.expr(f"2 * (({h} >> {j}) & 1) - 1")).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    per = sids.groupBy("doc_id").agg(*aggs)
    fp = sum(
        F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(SIMHASH_BITS)
    )
    out = per.select("doc_id", fp.cast("bigint").alias("simhash"))
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .join(out, on="doc_id", how="left")
        .na.fill({"simhash": 0})
    )


def _duck_simhash() -> str:
    h = hash_sql("sid", 0)
    sums = ", ".join(
        f"SUM(2 * (({h} >> {j}) & 1) - 1) AS s{j}" for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return f"""
sids AS ({duck_shingle_ids_cte()}),
persum AS (SELECT doc_id, {sums} FROM sids GROUP BY doc_id),
sh AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM persum)""".strip()


SIMHASH_DOCS_SQL = f"""
WITH {_duck_simhash()}
SELECT d.doc_id, COALESCE(sh.simhash, 0) AS simhash
FROM (SELECT doc_id FROM documents) d LEFT JOIN sh USING (doc_id)
""".strip()


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on 4-bit bands (a pair within
    hamming ≤ 3 of a 16-bit fingerprint shares ≥ 1 of 4 bands), verify
    exact hamming on candidates."""
    fps = simhash_docs(spark, sf_dir)
    bands = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"(simhash >> {4 * b}) & 15").alias("nib"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("x"),
    ).select("doc_id", "simhash", F.col("x.band").alias("band"), F.col("x.nib").alias("nib"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.nib") == F.col("b.nib")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.expr("bit_count(ha ^ hb)").alias("hamming"),
    ).where(F.col("hamming") <= SIMHASH_MAX_HAMMING)


DEDUP_SIMHASH_SQL = f"""
WITH {_duck_simhash()},
bands AS (
  SELECT doc_id, simhash, i AS band, (simhash >> (4 * CAST(i AS INT))) & 15 AS nib
  FROM sh, range(0, 4) t(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS ha, b.simhash AS hb
  FROM bands a JOIN bands b ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(ha, hb)) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {SIMHASH_MAX_HAMMING}
""".strip()


# --------------------------------------------------------------------------
# embedding-cosine near-duplicates (quantized-exact, LSH-bucketed)
# --------------------------------------------------------------------------
def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, qe: array<bigint>, nrm: bigint) — FLOOR(x·10^6) quantization
    makes every dot product integer-exact and thus bit-identical across
    engines and partition orders."""
    emb = load_table(spark, sf_dir, "embeddings")
    qe = F.expr(f"transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * {EMB_QUANT}) AS BIGINT))")
    out = emb.select("vec_id", qe.alias("qe"))
    nrm = F.expr("aggregate(qe, CAST(0 AS BIGINT), (acc, v) -> acc + v * v)")
    return out.select("vec_id", "qe", nrm.alias("nrm"))


def _bucket_expr(n_tables: int = 4, planes_per_table: int = 4) -> str:
    """SQL expr: array of (table, bucket) structs — random-hyperplane LSH
    with deterministic integer plane weights w[p][dim] = h_p(dim) mod 2001
    - 1000."""
    tables = []
    for t in range(n_tables):
        bits = []
        for pp in range(planes_per_table):
            p = t * planes_per_table + pp
            w = f"((({hash_sql('CAST(i AS BIGINT)', p)}) % 2001) - 1000)"
            dot = (
                "aggregate(sequence(1, size(qe)), CAST(0 AS BIGINT),"
                f" (acc, i) -> acc + element_at(qe, CAST(i AS INT)) * {w})"
            )
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << pp} ELSE 0 END)")
        tables.append(f"named_struct('tbl', {t}, 'bkt', {' + '.join(bits)})")
    return f"array({', '.join(tables)})"


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ τ among LSH-bucket candidates.

    4 tables × 4 hyperplanes: candidates collide in ≥1 table; exact
    (quantized-integer) cosine verifies.  Recall is the standard LSH
    tradeoff; the oracle replays the same buckets so both engines see the
    identical candidate set.
    """
    q = _quantized(spark, sf_dir)
    b = q.select(
        "vec_id", "qe", "nrm", F.explode(F.expr(_bucket_expr())).alias("x")
    ).select("vec_id", "qe", "nrm", F.col("x.tbl").alias("tbl"), F.col("x.bkt").alias("bkt"))
    a, c = b.alias("a"), b.alias("b")
    cand = (
        a.join(c, (F.col("a.tbl") == F.col("b.tbl")) & (F.col("a.bkt") == F.col("b.bkt")))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.qe").alias("qa"),
            F.col("b.qe").alias("qb"),
            F.col("a.nrm").alias("na"),
            F.col("b.nrm").alias("nb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    dot = F.expr(
        "aggregate(sequence(1, size(qa)), CAST(0 AS BIGINT),"
        " (acc, i) -> acc + element_at(qa, CAST(i AS INT)) * element_at(qb, CAST(i AS INT)))"
    )
    cos = dot.cast("double") / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
    return cand.select("vec_a", "vec_b", cos.alias("cos")).where(F.col("cos") >= EMB_COS_THRESHOLD)


def _duck_quantized() -> str:
    return (
        f"q AS (SELECT vec_id, [CAST(FLOOR(CAST(x AS DOUBLE) * {EMB_QUANT}) AS BIGINT) FOR x IN embedding] AS qe"
        f" FROM embeddings),"
        f" qn AS (SELECT vec_id, qe, list_sum([v * v FOR v IN qe]) AS nrm FROM q)"
    )


def _duck_buckets(n_tables: int = 4, planes_per_table: int = 4) -> str:
    rows = []
    for t in range(n_tables):
        bits = []
        for pp in range(planes_per_table):
            p = t * planes_per_table + pp
            w = f"((({hash_sql('CAST(i AS BIGINT)', p)}) % 2001) - 1000)"
            dot = f"list_sum([qe[CAST(i AS INT)] * {w} FOR i IN range(1, 1 + len(qe))])"
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << pp} ELSE 0 END)")
        rows.append(f"SELECT vec_id, qe, nrm, {t} AS tbl, {' + '.join(bits)} AS bkt FROM qn")
    return "buckets AS (" + " UNION ALL ".join(rows) + ")"


DEDUP_EMBEDDING_SQL = f"""
WITH {_duck_quantized()},
{_duck_buckets()},
cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ANY_VALUE(a.qe) AS qa, ANY_VALUE(b.qe) AS qb,
         ANY_VALUE(a.nrm) AS na, ANY_VALUE(b.nrm) AS nb
  FROM buckets a JOIN buckets b ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT vec_a, vec_b,
       CAST(list_sum([qa[CAST(i AS INT)] * qb[CAST(i AS INT)] FOR i IN range(1, 1 + len(qa))]) AS DOUBLE)
         / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cos
FROM cand
WHERE CAST(list_sum([qa[CAST(i AS INT)] * qb[CAST(i AS INT)] FOR i IN range(1, 1 + len(qa))]) AS DOUBLE)
        / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= {EMB_COS_THRESHOLD}
""".strip()


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_exact_docs": dedup_exact_docs,
    "dedup_minhash": dedup_minhash,
    "dedup_jaccard": dedup_jaccard,
    "simhash_docs": simhash_docs,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding": dedup_embedding,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_exact_docs": DEDUP_EXACT_DOCS_SQL,
    "dedup_minhash": DEDUP_MINHASH_SQL,
    "dedup_jaccard": DEDUP_JACCARD_SQL,
    "simhash_docs": SIMHASH_DOCS_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "dedup_embedding": DEDUP_EMBEDDING_SQL,
}

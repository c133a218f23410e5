"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths, per SURVEY.md's north-star extensions:
- ``knn_bruteforce`` — exact cosine top-k: the correctness baseline.  A
  broadcast of the (small) query set against the full corpus: corpus-side
  scan parallelizes perfectly, no corpus shuffle at all.
- ``knn_lsh`` — the scale path: random-hyperplane LSH buckets restrict each
  query to its candidate bucket(s), then exact rerank within candidates.
  At 100 TB the bucket join replaces the full scan; recall is tunable by
  tables × planes.

Both use the FLOOR(x·10^6) integer quantization from operators/dedup.py and
the flat codegen-able dot products from functions/vectors.py, so every
cosine is bit-identical across engines (see the determinism contract in
operators/relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dream_spark.functions.joins import broadcast_if_small
from dream_spark.functions.vectors import cos_sql, dot_col, dot_sql, l2_col, l2_sql
from dream_spark.session import release_local_checkpoint
from dream_spark.operators.dedup import (
    _bucket_ids,
    _duck_buckets,
    _duck_quantized,
    _quantized,
    corpus_count,
    quantize,
    shared_buckets,
    shared_quantized,
)
from dream_spark.sources.tables import load_table

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5

_COS = cos_sql("dot", "na", "nb")


def _scored(pairs: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, cos) from (qa, na, qb, nb) pair rows — exact
    int64 dot JVM-side (``dot_col``: no Python worker in the pair path),
    final division in SQL (both engines share the double formula)."""
    return pairs.withColumn("dot", dot_col("qa", "qb")).select(
        "query_id", "neighbor_id", F.expr(_COS).alias("cos")
    )


def _topk(scored: DataFrame, k: int = TOP_K) -> DataFrame:
    """Deterministic per-query top-k: (cos DESC, neighbor id) tiebreak."""
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def knn_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    corpus_quantized: DataFrame | None = None,
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for ANY pair of
    ``(vec_id, embedding)`` DataFrames — the library surface and the
    correctness baseline for the LSH/IVF scale paths.  The (small) query
    set broadcasts against the corpus scan: the corpus never shuffles.
    Rows where query and neighbor share a vec_id are excluded (self-match
    when queries ⊆ corpus)."""
    qq = quantize(queries).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("qa"), F.col("nrm").alias("na")
    )
    qc = (corpus_quantized if corpus_quantized is not None else quantize(corpus)).select(
        F.col("vec_id").alias("neighbor_id"), F.col("qe").alias("qb"), F.col("nrm").alias("nb")
    )
    pairs = F.broadcast(qq).crossJoin(qc).where(F.col("query_id") != F.col("neighbor_id"))
    return _topk(_scored(pairs), k)


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``knn_topk`` with the first N_QUERIES
    corpus vectors as the query set."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_topk(
        emb,
        emb.where(F.col("vec_id") < N_QUERIES),
        corpus_quantized=shared_quantized(spark, sf_dir),
    )


_DUCK_COS = cos_sql(dot_sql("qa", "qb", duck=True), "na", "nb")

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


def knn_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    corpus_count: int | None = None,
    corpus_quantized: DataFrame | None = None,
    corpus_buckets: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k for ANY pair of ``(vec_id, embedding)`` DataFrames:
    candidates = corpus vectors sharing an LSH bucket with the query in ≥1
    of the hash tables, exact cosine rerank within candidates.  Smaller
    k_eff than brute force when buckets miss — the documented LSH recall
    tradeoff.

    The bucket join moves ids only; vectors are joined back per side for
    the rerank.  The query side broadcasts (an ANN query set is small by
    contract), the corpus side grows with the data so its broadcast is
    size-gated — degrading to a keyed shuffle join past the row
    threshold.  ``corpus_buckets`` lets the caller supply the persisted
    (vec_id, tbl, bkt) index (``shared_buckets``) instead of re-running
    the hyperplane kernel over the corpus per query."""
    qc = corpus_quantized if corpus_quantized is not None else quantize(corpus)
    qq = quantize(queries)
    bc = corpus_buckets if corpus_buckets is not None else _bucket_ids(qc)
    bq = _bucket_ids(qq)
    cand = (
        F.broadcast(bq.select(F.col("vec_id").alias("query_id"), "tbl", "bkt"))
        .join(bc.select(F.col("vec_id").alias("neighbor_id"), "tbl", "bkt"), on=["tbl", "bkt"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qa = qq.select(F.col("vec_id").alias("query_id"), F.col("qe").alias("qa"), F.col("nrm").alias("na"))
    qb = qc.select(F.col("vec_id").alias("neighbor_id"), F.col("qe").alias("qb"), F.col("nrm").alias("nb"))
    pairs = cand.join(F.broadcast(qa), on="query_id").join(
        broadcast_if_small(qb, known_count=corpus_count), on="neighbor_id"
    )
    return _topk(_scored(pairs), k)


def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``knn_lsh_topk`` with the first N_QUERIES
    corpus vectors as the query set (parquet-metadata corpus count feeds
    the broadcast gate); the oracle replays identical buckets."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_lsh_topk(
        emb,
        emb.where(F.col("vec_id") < N_QUERIES),
        corpus_count=corpus_count(spark, sf_dir),
        corpus_quantized=shared_quantized(spark, sf_dir),
        corpus_buckets=shared_buckets(spark, sf_dir),
    )


KNN_LSH_SQL = f"""
WITH {_duck_quantized()},
{_duck_buckets()},
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM buckets a JOIN buckets b ON a.tbl = b.tbl AND a.bkt = b.bkt
  WHERE a.vec_id < {N_QUERIES} AND a.vec_id <> b.vec_id
),
scored AS (
  SELECT query_id, neighbor_id,
         {cos_sql(dot_sql("qa.qe", "qb.qe", duck=True), "qa.nrm", "qb.nrm")} AS cos
  FROM cand JOIN qn qa ON qa.vec_id = query_id JOIN qn qb ON qb.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""".strip()


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse-quantizer cells + multi-probe
# --------------------------------------------------------------------------
IVF_K = 8  # number of coarse cells
IVF_NPROBE = 2  # cells probed per query

_D2 = "(nrm + cn - 2 * cdot)"  # ‖x−c‖² = ‖x‖² + ‖c‖² − 2⟨x,c⟩, exact int64


IVF_TRAIN_ITERS = 2


def _ivf_seed(qc: DataFrame, n_cells: int) -> DataFrame:
    """Deterministic init: the n_cells lowest-id corpus vectors."""
    return qc.orderBy("vec_id").limit(n_cells).select(
        F.col("vec_id").alias("cell"), F.col("qe").alias("ce"), F.col("nrm").alias("cn")
    )


def _ivf_centroids(qc: DataFrame, n_cells: int, iters: int = IVF_TRAIN_ITERS) -> DataFrame:
    """Deterministic integer k-means (Lloyd), exactly replayable by the
    oracle: seed with the n_cells lowest-id vectors, then ``iters`` rounds
    of (assign to nearest centroid by exact integer distance, ties by cell
    id) → (new centroid = element-wise FLOOR(sum/count) of the assigned
    vectors).  Every quantity is either an int64 (sums, distances) or a
    floor of a double division whose operands are exactly representable
    (|sum| < 2^53), so both engines compute identical centroids — the
    property a float k-means could never give the correctness gate.
    Cells that lose all members drop out (both engines agree).  The final
    centroid table is materialized driver-side (k rows × dim ints): the
    assignment/probe joins broadcast it and the training lineage is
    truncated instead of being re-evaluated per downstream subtree."""
    key = (id(qc.sparkSession), qc.semanticHash(), n_cells, iters)
    hit = _TRAINED_CENTROIDS.get(key)
    if hit is not None:
        return hit
    # Each round's centroid table is k rows × dim ints — materialize it
    # DRIVER-SIDE per round (collect + local frame), so round r's
    # assignment broadcast builds from a local relation instead of
    # re-executing rounds 1..r-1's whole lineage (the lazy-chained form
    # was quadratic in iters: every broadcast build re-ran the preceding
    # rounds AND the corpus quantize kernel; guide §7.2's iterative-loop
    # truncation, at the natural k-rows-fit-on-the-driver size).  cn is
    # an exact int64 sum of squares either way — Python bigints can only
    # agree with the UDF.
    sess = qc.sparkSession
    cents = _mk_local_centroids(
        sess,
        [(r["cell"], list(r["ce"])) for r in _ivf_seed(qc, n_cells).collect()],
    )
    for _ in range(iters):
        # carry qe through the fused assignment (same trick as the
        # inverted-file writers): the means pass needs each vector's
        # components, and carrying them beats re-joining the corpus on
        # vec_id — one aggregate, zero joins per round
        asgn = _ivf_assign1(qc, cents, carry=("qe",))
        pos = asgn.select("cell", F.posexplode("qe").alias("dim", "v"))
        means = pos.groupBy("cell", "dim").agg(
            F.expr("CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT)").alias("m")
        )
        ce = means.groupBy("cell").agg(
            F.expr("transform(sort_array(collect_list(struct(dim, m))), x -> x.m)").alias("ce")
        )
        cents = _mk_local_centroids(
            sess, [(r["cell"], list(r["ce"])) for r in ce.collect()]
        )
    _TRAINED_CENTROIDS[key] = cents
    return cents


def _mk_local_centroids(sess: SparkSession, rows: list) -> DataFrame:
    """(cell, ce, cn) as a driver-local Arrow frame from collected
    ``(cell, ce)`` pairs — cn = ⟨ce, ce⟩ computed exactly in Python ints
    (the components are int64, so the sum of squares is exact in both
    engines' arithmetic)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "cell": pd.Series([c for c, _ in rows], dtype="int64"),
            "ce": pd.Series([e for _, e in rows], dtype=object),
            "cn": pd.Series([sum(v * v for v in e) for _, e in rows], dtype="int64"),
        }
    )
    return sess.createDataFrame(pdf, schema="cell long, ce array<long>, cn long")


#: (session id, corpus semanticHash, n_cells, iters) -> trained centroid
#: frame.  Training is a build-once index step (a deployment persists the
#: centroid table — sinks.write_parquet — and reloads it); within a session
#: the memo gives the same train-once economics.
_TRAINED_CENTROIDS: dict = {}


def _ivf_assign(q: DataFrame, cents: DataFrame, nprobe: int) -> DataFrame:
    """(vec_id, cell, crank) — nearest-centroid assignment: argmin exact
    integer distance, ties by cell id."""
    pairs = q.crossJoin(F.broadcast(cents)).withColumn("cdot", dot_col("qe", "ce"))
    w = Window.partitionBy("vec_id").orderBy(F.expr(_D2), F.col("cell"))
    return (
        pairs.withColumn("crank", F.row_number().over(w))
        .where(F.col("crank") <= nprobe)
        .select("vec_id", "cell", F.col("crank"))
    )


def _ivf_assign1(q: DataFrame, cents: DataFrame, carry: tuple = ()) -> DataFrame:
    """Nearest-centroid assignment for the nprobe=1 (corpus) side as ONE
    partial-aggregating groupBy: ``min(struct(d2, cell, *carry))`` is
    exactly ``_ivf_assign``'s argmin-with-cell-tiebreak — (d2, cell) is
    unique per (vector, centroid) pair, so the carried payload columns
    never decide the struct ordering, they just ride along.  vs the
    window form: the map side pre-aggregates |q|×k pair rows down to |q|
    before the exchange (no full sort of the pair set), and carrying
    ``qe``/``nrm`` through the aggregate removes the vec_id join-back the
    inverted-file writers otherwise need (one shuffle less per write)."""
    pairs = q.crossJoin(F.broadcast(cents)).withColumn("cdot", dot_col("qe", "ce"))
    fields = [F.expr(_D2).alias("d2"), F.col("cell")] + [F.col(c) for c in carry]
    best = pairs.groupBy("vec_id").agg(F.min(F.struct(*fields)).alias("b"))
    return best.select(
        "vec_id", F.col("b.cell").alias("cell"), *[F.col(f"b.{c}").alias(c) for c in carry]
    )


def knn_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    n_cells: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    corpus_count: int | None = None,
    corpus_quantized: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN top-k for ANY pair of ``(vec_id, embedding)`` DataFrames:
    corpus vectors live in their nearest-centroid cell (an inverted file,
    partition-prunable at scale); each query probes its ``nprobe`` nearest
    cells and reranks exactly within them.  Recall is the cells-probed
    tradeoff."""
    qc = corpus_quantized if corpus_quantized is not None else quantize(corpus)
    qq = quantize(queries)
    cents = centroids if centroids is not None else _ivf_centroids(qc, n_cells)
    corpus_cells = _ivf_assign1(qc, cents).select(F.col("vec_id").alias("neighbor_id"), "cell")
    query_cells = _ivf_assign(qq, cents, nprobe).select(F.col("vec_id").alias("query_id"), "cell")
    # each corpus vector lives in exactly ONE cell (nprobe=1 assignment)
    # and a query probes DISTINCT cells, so the cell join yields every
    # (query, neighbor) pair at most once — no distinct (one Exchange
    # less; same argument as _probe_inverted's no-dedup contract)
    cand = (
        F.broadcast(query_cells)
        .join(corpus_cells, on="cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    qa = qq.select(F.col("vec_id").alias("query_id"), F.col("qe").alias("qa"), F.col("nrm").alias("na"))
    qb = qc.select(F.col("vec_id").alias("neighbor_id"), F.col("qe").alias("qb"), F.col("nrm").alias("nb"))
    pairs = cand.join(F.broadcast(qa), on="query_id").join(
        broadcast_if_small(qb, known_count=corpus_count), on="neighbor_id"
    )
    return _topk(_scored(pairs), k)


def save_vector_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Persist the ANN index artifacts to parquet — the build-once
    deployment step the session-shared artifacts stand in for: the
    quantized corpus (vec_id, qe, nrm), the LSH bucket table written
    PARTITIONED BY hash table so a probe prunes to its table directories,
    and the trained IVF centroids.  ``load_vector_index`` + the
    ``corpus_quantized``/``corpus_buckets``/``centroids`` parameters turn
    serving into pure joins against these tables — no kernel re-runs, the
    FAISS-style train/serve split as actual storage."""
    qc = shared_quantized(spark, sf_dir)
    shared_buckets(spark, sf_dir).hint("rebalance", "tbl").write.mode(
        "overwrite"
    ).partitionBy("tbl").parquet(f"{path}/buckets")
    _write_ivf_index(path, qc, _ivf_centroids(qc, IVF_K))


def _write_ivf_index(path: str, qc: DataFrame, cents: DataFrame) -> None:
    """The IVF half of the index layout, shared by the deployment builder
    (:func:`save_vector_index`) and the refresh entry so a layout change
    (_INDEX_FORMAT_VERSION bump) happens in one place: the flat quantized
    table, the trained centroids, and the INVERTED FILE as storage —
    corpus vectors written PARTITIONED BY their nearest-centroid cell, so
    a probe reads only its nprobe cell directories (SCALE.md §6.3; at
    100 TB this is the difference between scanning the corpus and
    scanning nprobe/n_cells of it; Spark's partition pruning does the
    skipping from a plain ``cell IN (...)`` filter, no custom reader)."""
    # Directory-partitioned writes get an AQE rebalance on the partition
    # column (guide §6): without it every write task opens a file in each
    # cell directory it touches — files = tasks × cells at scale; with it
    # rows cluster by target directory, AQE sizes the output partitions
    # (and splits skewed cells), so each dir holds advisory-size files.
    # The FLAT table writes stay unhinted: their file sizes are already
    # governed by scan/shuffle partition sizing, and a rebalance there
    # would add a full corpus shuffle for nothing.
    #
    # ONE materialization feeds BOTH writes (r11): the quantized corpus is
    # localCheckpoint-ed, the flat write scans the blocks, and the cell
    # assignment scans the SAME blocks — so the Arrow quantize kernel runs
    # once per build (guide §4) and the r10 read-the-parquet-back pass
    # (one extra DFS listing + scan per build, plus the cannot-overwrite-
    # path-being-read hazard for in-place rebuilds flagged in r10 ADVICE)
    # disappears.  Row equivalence is now trivial: the rows written to
    # {path}/quantized and the rows assigned to cells are the same
    # materialized blocks, not two evaluations argued equal.
    qck = qc.localCheckpoint()
    try:
        qck.write.mode("overwrite").parquet(f"{path}/quantized")
        cents.write.mode("overwrite").parquet(f"{path}/centroids")
        _ivf_assign1(qck, cents, carry=("qe", "nrm")).select(
            "vec_id", "qe", "nrm", "cell"
        ).hint("rebalance", "cell").write.mode("overwrite").partitionBy("cell").parquet(
            f"{path}/cells"
        )
    finally:
        release_local_checkpoint(qck)


def load_vector_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(quantized, buckets, centroids) read back from
    :func:`save_vector_index`'s layout."""
    return (
        spark.read.parquet(f"{path}/quantized"),
        spark.read.parquet(f"{path}/buckets"),
        spark.read.parquet(f"{path}/centroids"),
    )


#: Persisted-index layout/parameter version: part of the cache digest, so
#: a code change to anything index-defining (hyperplane scheme, bucket
#: layout, quantization, IVF training) must BUMP this — otherwise an old
#: on-disk index with a COMPLETE marker would keep serving buckets the
#: NEW code (and the DuckDB oracle) no longer computes.
_INDEX_FORMAT_VERSION = 3  # v3: + cell-partitioned inverted file (/cells)


def _served_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic on-disk location of the persisted vector index for
    ``sf_dir`` — built once, reused across sessions AND processes (the
    deployment's build-once economics, like :func:`default_stats_path` for
    statistics).  Keyed on the absolute data path + the embeddings parquet
    mtime + the index format version and parameters, so neither
    regenerated testdata nor changed index code ever serves a stale index.

    Concurrency/safety shape: see
    :func:`dream_spark.functions.artifacts.build_once_path` (racing
    builders, interrupted builds, and pre-planted paths are all handled
    there; this function only computes the signature)."""
    import os

    from dream_spark.functions.artifacts import build_once_path

    root = os.path.abspath(sf_dir)
    emb = os.path.join(root, "embeddings.parquet")
    sig = "|".join(
        [
            root,
            str(os.path.getmtime(emb) if os.path.exists(emb) else 0),
            f"v{_INDEX_FORMAT_VERSION}",
            f"ivf{IVF_K}x{IVF_TRAIN_ITERS}",
        ]
    )
    return build_once_path(sig, "vecindex", lambda tmp: save_vector_index(spark, sf_dir, tmp))


def knn_lsh_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper for the SERVE path: probe the PERSISTED
    parquet index (:func:`save_vector_index`'s quantized corpus + LSH
    bucket table) instead of session-shared in-memory frames — serving is
    pure joins against storage, the corpus-side hyperplane kernel never
    re-runs, and the bucket scan prunes to the probed tbl= directories.
    Same results as ``knn_lsh`` (the roundtrip preserves exact int64
    quantities), so the LSH oracle replays identically."""
    qc, buckets, _ = load_vector_index(spark, _served_index_path(spark, sf_dir))
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_lsh_topk(
        emb,
        emb.where(F.col("vec_id") < N_QUERIES),
        corpus_count=corpus_count(spark, sf_dir),
        corpus_quantized=qc,
        corpus_buckets=buckets,
    )


def knn_ivf_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper for the IVF SERVE path: probe the PERSISTED
    parquet index (quantized corpus + trained centroids) instead of the
    session-shared frames — the FAISS train/serve split as storage; no
    quantize kernel and no k-means iteration at query time.  The roundtrip
    preserves exact int64 quantities and the centroid training is
    deterministic, so the IVF oracle replays identically."""
    qc, _, cents = load_vector_index(spark, _served_index_path(spark, sf_dir))
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ivf_topk(
        emb,
        emb.where(F.col("vec_id") < N_QUERIES),
        corpus_count=corpus_count(spark, sf_dir),
        corpus_quantized=qc,
        centroids=cents,
    )


def knn_ivf_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF serve with real PARTITION PRUNING: the persisted index's
    cell-partitioned inverted file (``save_vector_index`` writes the
    quantized corpus ``partitionBy("cell")``) is filtered with a literal
    ``cell IN (probed)`` predicate, so the parquet scan reads ONLY the
    nprobe cell directories each query probes — at 100 TB the corpus scan
    shrinks by nprobe/n_cells with zero custom reader code (closes
    SCALE.md §6.3's open item).  The probed-cell collect is bounded by
    N_QUERIES x IVF_NPROBE ints (the bounded-collect contract).  Candidate
    set, rerank, and tiebreaks are identical to ``knn_ivf``, so the IVF
    oracle replays byte-identically."""
    path = _served_index_path(spark, sf_dir)
    cents = spark.read.parquet(f"{path}/centroids")
    inverted = spark.read.parquet(f"{path}/cells")  # (vec_id, qe, nrm, cell)
    emb = load_table(spark, sf_dir, "embeddings")
    qq = quantize(emb.where(F.col("vec_id") < N_QUERIES))
    return _probe_inverted(cents, inverted, qq)


def _probe_inverted(cents: DataFrame, inverted: DataFrame, qq: DataFrame) -> DataFrame:
    """Serve quantized queries against a cell-partitioned inverted file:
    probe each query's nprobe nearest cells, partition-prune the file scan
    with a literal ``cell IN (probed)``, exact-rerank, top-k."""
    # ONE bounded collect of the (query, probed cell) pairs (<= N_QUERIES x
    # nprobe rows) serves both needs: the literal cell IN (...) pruning
    # predicate AND the probe table itself — vs collecting distinct cells
    # and re-evaluating the assignment subtree inside the main query (one
    # assignment job instead of two)
    qrows = (
        _ivf_assign(qq, cents, IVF_NPROBE)
        .select(F.col("vec_id").alias("query_id"), "cell")
        .collect()
    )
    probed = sorted({r["cell"] for r in qrows})
    qcells = qq.sparkSession.createDataFrame(
        [(r["query_id"], r["cell"]) for r in qrows], "query_id long, cell long"
    )
    pruned = inverted.where(F.col("cell").isin(probed))
    qa = qq.select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("qa"), F.col("nrm").alias("na")
    )
    qside = qcells.join(qa, on="query_id")  # <= N_QUERIES x nprobe rows
    # each corpus vector lives in exactly ONE cell and a query probes
    # DISTINCT cells, so the cell join yields every candidate pair at most
    # once — no distinct needed before the exact rerank
    pairs = F.broadcast(qside).join(
        pruned.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("qe").alias("qb"),
            F.col("nrm").alias("nb"),
            "cell",
        ),
        on="cell",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    return _topk(_scored(pairs), TOP_K)


def refresh_vector_index(spark: SparkSession, path: str, new_vectors: DataFrame) -> None:
    """Index MAINTENANCE: append new vectors into a persisted index
    WITHOUT retraining — quantize, assign each to its nearest EXISTING
    centroid, and append into the cell-partitioned inverted file, the
    flat quantized table, and (when the index carries one —
    ``save_vector_index`` layouts do) the LSH bucket table, so every
    serve path sees the appended vectors.  Centroids are immutable
    post-training (the FAISS add-after-train contract): at 100 TB you do
    not re-run Lloyd on every ingest batch; recall for appended vectors
    degrades only as the data distribution drifts from the trained
    centroids, and a retrain is an explicit rebuild
    (``save_vector_index``).  Because assignment is the same argmin the
    builder uses, a refreshed index is INDISTINGUISHABLE from one built
    with the union corpus under the same centroids — serving needs no
    special casing and the oracle replays one combined assignment.

    IDEMPOTENT per location: each artifact append anti-joins the batch
    against the vec_ids already present THERE, so re-running a partially
    failed or duplicate refresh converges instead of appending duplicate
    rows (a duplicated vec_id would take two of the k ranks in
    ``_probe_inverted``'s no-dedup top-k and silently evict a genuine
    neighbor).  Concurrent refreshers are NOT coordinated — like
    compaction, this is a single-writer maintenance pass."""
    from pyspark.sql.utils import AnalysisException

    cents = spark.read.parquet(f"{path}/centroids")
    # quantize the batch ONCE for the up-to-three artifact appends (each
    # otherwise re-scans the input and re-runs the Arrow dot kernel); the
    # checkpoint blocks are released before returning (the r10 residency
    # contract), and each invocation recomputes from its inputs — this is
    # an intra-call intermediate, not a cross-run cache
    qn = quantize(new_vectors).localCheckpoint()
    try:

        def _have(sub: str) -> DataFrame | None:
            # read-probe, not a path check (os.path.exists answers only for
            # LOCAL paths — the streaming/documents.py trap).  No distinct:
            # left_anti semantics are unaffected by duplicate right-side
            # keys, so deduping here is one aggregate Exchange for nothing.
            try:
                return spark.read.parquet(f"{path}/{sub}").select("vec_id")
            except AnalysisException:
                return None

        def _fresh(sub: str) -> DataFrame:
            have = _have(sub)
            return qn if have is None else qn.join(have, on="vec_id", how="left_anti")

        # same keyed-rebalance treatment as _write_ivf_index for the
        # directory-partitioned appends (an append batch is far smaller than
        # the corpus, so unbalanced it scatters per-task KB files into every
        # partition directory it touches); flat append stays unhinted
        _fresh("quantized").write.mode("append").parquet(f"{path}/quantized")
        # fused assignment carries (qe, nrm): no vec_id join-back, and the
        # anti-joined batch subtree appears ONCE in the plan instead of
        # twice (the old self-join evaluated it on both sides)
        _ivf_assign1(_fresh("cells"), cents, carry=("qe", "nrm")).select(
            "vec_id", "qe", "nrm", "cell"
        ).hint("rebalance", "cell").write.mode("append").partitionBy("cell").parquet(
            f"{path}/cells"
        )
        have_b = _have("buckets")
        if have_b is not None:  # IVF-only layouts carry no bucket table
            fb = qn.join(have_b, on="vec_id", how="left_anti")
            _bucket_ids(fb).hint("rebalance", "tbl").write.mode("append").partitionBy(
                "tbl"
            ).parquet(f"{path}/buckets")
    finally:
        qn.unpersist()


def knn_ivf_refreshed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper for the REFRESH path, measured end-to-end
    like ``maintenance_compact``: build an IVF index on HALF the corpus
    (even vec_ids), :func:`refresh_vector_index` the odd half in (no
    retrain), then serve the standard query set from the refreshed
    cell-partitioned file.  Queries and neighbors span both halves, so
    the row pins (a) appended vectors are findable, (b) assignment parity
    between builder and refresher, (c) the centroid set is the
    base-trained one (the oracle trains on the even half only — a sneaky
    retrain-on-append would fail the value hash).  Scratch is a per-call
    driver-local temp dir (local-mode/shared-FS note in sinks.py); the
    result is materialized eagerly so the dir can be removed before
    returning."""
    import shutil
    import tempfile

    import pandas as pd

    base_dir = tempfile.mkdtemp(prefix="dream_spark_ivfrefresh_")
    path = f"{base_dir}/index"
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        # the LAZY quantized frame is the _TRAINED_CENTROIDS memo key the
        # warm pass filled; _write_ivf_index localCheckpoints it once and
        # feeds the flat write AND the cell assignment from the same
        # blocks, so the Arrow quantize kernel runs ONCE per build
        qb = quantize(emb.where(F.col("vec_id") % 2 == 0))
        _write_ivf_index(path, qb, _ivf_centroids(qb, IVF_K))
        refresh_vector_index(spark, path, emb.where(F.col("vec_id") % 2 != 0))
        qq = quantize(emb.where(F.col("vec_id") < N_QUERIES))
        out = _probe_inverted(
            spark.read.parquet(f"{path}/centroids"),
            spark.read.parquet(f"{path}/cells"),
            qq,
        )
        rows = out.collect()  # eager: the scratch dir dies with this call
        pdf = pd.DataFrame(
            {
                "query_id": pd.Series([r["query_id"] for r in rows], dtype="int64"),
                "neighbor_id": pd.Series([r["neighbor_id"] for r in rows], dtype="int64"),
                "cos": pd.Series([r["cos"] for r in rows], dtype="float64"),
                "rank": pd.Series([r["rank"] for r in rows], dtype="int64"),
            }
        )
        return spark.createDataFrame(
            pdf, schema="query_id long, neighbor_id long, cos double, rank long"
        )
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)


def warm_ivf_index(spark: SparkSession, sf_dir: str) -> None:
    """Train (or re-hit) the IVF coarse quantizer for the standard corpus —
    the build-the-index step a deployment runs once before serving queries
    (FAISS train/search separation)."""
    _ivf_centroids(shared_quantized(spark, sf_dir), IVF_K)


def warm_vector_indexes(spark: SparkSession, sf_dir: str) -> None:
    """Build every vector index artifact for the standard corpus: the
    session-shared quantized vectors, LSH bucket table, and IVF centroids,
    plus the PERSISTED on-disk index the serve-path entry loads.  bench.py
    calls this in setup so the measured numbers are query latency, not
    index construction — the same train/serve split a deployment has
    (without this, knn_lsh_served's first call would time the index build
    and parquet write instead of load+probe)."""
    shared_buckets(spark, sf_dir)  # builds shared_quantized too
    warm_ivf_index(spark, sf_dir)
    _served_index_path(spark, sf_dir)
    # the refresh entry's BASE-half training is a build step too — warming
    # it leaves knn_ivf_refreshed measuring what it claims to measure:
    # assign-and-append plus serve, not Lloyd iterations (the memo key is
    # the quantized frame's semanticHash, which the entry reproduces)
    emb = load_table(spark, sf_dir, "embeddings")
    _ivf_centroids(quantize(emb.where(F.col("vec_id") % 2 == 0)), IVF_K)


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``knn_ivf_topk`` with the first N_QUERIES
    corpus vectors as the query set; the oracle replays identical cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ivf_topk(
        emb,
        emb.where(F.col("vec_id") < N_QUERIES),
        corpus_count=corpus_count(spark, sf_dir),
        corpus_quantized=shared_quantized(spark, sf_dir),
    )


_DUCK_D2 = f"(a.nrm + c.nrm - 2 * {dot_sql('a.qe', 'c.qe', duck=True)})"


def _duck_ivf_training(iters: int = IVF_TRAIN_ITERS, src: str = "qn", seed: str | None = None) -> str:
    """Unrolled k-means rounds as CTEs — the DuckDB twin of
    _ivf_centroids (identical seed, assignment order, and integer means).

    ``src`` is the quantized-corpus CTE to train on; the default ``seed``
    (``vec_id < IVF_K``) is the n-lowest-ids shortcut valid only when the
    training corpus contains ids 0..IVF_K-1 — callers training on a
    SUBSET (the refresh entry's even half) pass the general
    ORDER BY/LIMIT form instead."""
    if seed is None:
        seed = f"SELECT vec_id AS cell, qe, nrm FROM {src} WHERE vec_id < {IVF_K}"
    parts = [f"cents0 AS ({seed})"]
    d2 = f"(a.nrm + c.nrm - 2 * {dot_sql('a.qe', 'c.qe', duck=True)})"
    for r in range(1, iters + 1):
        parts.append(
            f"""asgn_t{r} AS (
  SELECT vec_id, cell FROM (
    SELECT a.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {d2}, c.cell) AS rr
    FROM {src} a CROSS JOIN cents{r - 1} c
  ) WHERE rr = 1
)"""
        )
        parts.append(
            f"""m_t{r} AS (
  SELECT cell, dim, CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
  FROM (SELECT s.cell, unnest(a.qe) AS v, generate_subscripts(a.qe, 1) AS dim
        FROM asgn_t{r} s JOIN {src} a ON a.vec_id = s.vec_id)
  GROUP BY cell, dim
)"""
        )
        parts.append(
            f"""cents{r} AS (
  SELECT cell, ce AS qe, {dot_sql('ce', 'ce', duck=True)} AS nrm
  FROM (SELECT cell, list(m ORDER BY dim) AS ce FROM m_t{r} GROUP BY cell)
)"""
        )
    parts.append(f"cents AS (SELECT * FROM cents{iters})")
    return ",\n".join(parts)


KNN_IVF_SQL = f"""
WITH {_duck_quantized()},
{_duck_ivf_training()},
asgn AS (
  SELECT vec_id, cell, crank FROM (
    SELECT a.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {_DUCK_D2}, c.cell) AS crank
    FROM qn a CROSS JOIN cents c
  )
),
corpus_cells AS (SELECT vec_id AS neighbor_id, cell FROM asgn WHERE crank = 1),
query_cells AS (SELECT vec_id AS query_id, cell FROM asgn
                WHERE crank <= {IVF_NPROBE} AND vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT query_id, neighbor_id
  FROM query_cells JOIN corpus_cells USING (cell)
  WHERE query_id <> neighbor_id
),
scored AS (
  SELECT query_id, neighbor_id,
         {cos_sql(dot_sql("qa.qe", "qb.qe", duck=True), "qa.nrm", "qb.nrm")} AS cos
  FROM cand JOIN qn qa ON qa.vec_id = query_id JOIN qn qb ON qb.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""".strip()


KNN_IVF_REFRESHED_SQL = f"""
WITH {_duck_quantized()},
qnb AS (SELECT * FROM qn WHERE vec_id % 2 = 0),
{_duck_ivf_training(src="qnb", seed=f"SELECT vec_id AS cell, qe, nrm FROM qnb ORDER BY vec_id LIMIT {IVF_K}")},
asgn AS (
  SELECT vec_id, cell, crank FROM (
    SELECT a.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY {_DUCK_D2}, c.cell) AS crank
    FROM qn a CROSS JOIN cents c
  )
),
corpus_cells AS (SELECT vec_id AS neighbor_id, cell FROM asgn WHERE crank = 1),
query_cells AS (SELECT vec_id AS query_id, cell FROM asgn
                WHERE crank <= {IVF_NPROBE} AND vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT query_id, neighbor_id
  FROM query_cells JOIN corpus_cells USING (cell)
  WHERE query_id <> neighbor_id
),
scored AS (
  SELECT query_id, neighbor_id,
         {cos_sql(dot_sql("qa.qe", "qb.qe", duck=True), "qa.nrm", "qb.nrm")} AS cos
  FROM cand JOIN qn qa ON qa.vec_id = query_id JOIN qn qb ON qb.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
""".strip()
# The builder assigns the even half and the refresher assigns the odd half
# with the SAME argmin over the SAME (base-trained) centroids, so the
# oracle's one combined assignment over qn IS the refreshed index — while
# the centroids come from qnb only: an implementation that retrained on
# append, or assigned the delta against different centroids, fails this
# value hash.


#: metadata predicate of the filtered-search entry: corpus side restricted
#: to this label BEFORE any distance work
FILTER_LABEL = 3


def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: exact top-k over ONLY the corpus vectors
    satisfying a metadata predicate (``label = 3``) — the
    pre-filter strategy.  The predicate applies to the embeddings SCAN
    before quantization, so Catalyst pushes it into the parquet read and
    the distance kernel touches the ~1/10 surviving fraction; the
    post-filter alternative (search first, discard mismatches) breaks
    top-k completeness and re-ranks k, which is why serious vector stores
    pre-filter exactly like this.  Same broadcast-queries/no-corpus-shuffle
    shape as ``knn_bruteforce``."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_topk(
        emb.where(F.col("label") == FILTER_LABEL),
        emb.where(F.col("vec_id") < N_QUERIES),
    )


KNN_FILTERED_SQL = f"""
WITH {_duck_quantized()},
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         a.qe AS qa, b.qe AS qb, a.nrm AS na, b.nrm AS nb
  FROM qn a JOIN qn b ON a.vec_id < {N_QUERIES} AND a.vec_id <> b.vec_id
  WHERE b.vec_id IN (SELECT vec_id FROM embeddings WHERE label = {FILTER_LABEL})
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


# --------------------------------------------------------------------------
# scalar quantization (SQ8): the embedding-COMPRESSION layer
# --------------------------------------------------------------------------
#: SQ8 code levels (8-bit codes in [0, 255])
SQ8_LEVELS = 255
#: candidates per query surviving the code-space scan into the exact rerank
SQ8_RERANK = 4 * TOP_K


def sq8_stats(qn: DataFrame) -> DataFrame:
    """Per-dimension ``(mns: array<bigint>, mxs: array<bigint>)`` min/max
    of a quantized ``(vec_id, qe)`` corpus, as ONE row — the SQ8
    "codebook" (FAISS ``ScalarQuantizer.train`` analog).  posexplode →
    64-group partial aggregate → re-assemble sorted arrays: map-side
    combine makes the shuffle 64 rows per partition regardless of corpus
    size, and the result broadcasts to the encode pass — the codebook
    never touches the driver."""
    ex = qn.select(F.posexplode("qe").alias("pos", "v"))
    st = ex.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    return st.groupBy().agg(
        F.expr("transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)").alias("mns"),
        F.expr("transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)").alias("mxs"),
    )


def sq8_encode(qn: DataFrame, stats: DataFrame) -> DataFrame:
    """8-bit scalar-quantize ANY quantized ``(vec_id, qe)`` frame against
    a corpus codebook: ``code[i] = ((qe[i] − mn[i]) · 255) div max(mx[i] −
    mn[i], 1)`` — exact integer arithmetic end-to-end (qe ranges < 2^22,
    ×255 < 2^30), so both engines emit bit-identical codes.  Map-only
    after the broadcast codebook attach; at 100 TB this is the compression
    pass that shrinks a resident vector corpus 8× (64×int64 → 64 bytes)
    before it ever meets a distance kernel."""
    code = F.expr(
        f"transform(qe, (x, i) -> CAST(((x - element_at(mns, i + 1)) * {SQ8_LEVELS})"
        " div greatest(element_at(mxs, i + 1) - element_at(mns, i + 1), 1) AS BIGINT))"
    )
    return qn.crossJoin(F.broadcast(stats)).select("vec_id", code.alias("code"))


def knn_sq8_topk(
    corpus_quantized: DataFrame,
    k: int = TOP_K,
    r: int = SQ8_RERANK,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """Compressed-domain ANN: scan 8-bit SQ codes for the r nearest
    candidates per query (integer squared-L2 in code space, JVM-side
    ``l2_col``), then exact-rerank the candidates with the full-precision
    int64 cosine.  The classic memory/recall trade every large vector
    store ships (FAISS ``SQ8``): the hot scan touches 1/8 the bytes of
    the raw vectors and stays exact-integer, so the candidate set — and
    therefore the hash-verified result — is deterministic across engines
    and partition orders.  Queries broadcast; the corpus never shuffles
    (same posture as ``knn_bruteforce``); the rerank join is
    candidate-sized (≤ queries × r rows)."""
    st = sq8_stats(corpus_quantized)
    codes = sq8_encode(corpus_quantized, st)
    qcodes = codes.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("ca")
    )
    pairs = F.broadcast(qcodes).crossJoin(
        codes.select(F.col("vec_id").alias("neighbor_id"), F.col("code").alias("cb"))
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("neighbor_id"))
    cand = (
        pairs.withColumn("d2", l2_col("ca", "cb"))
        .withColumn("rr", F.row_number().over(w))
        .where(F.col("rr") <= r)
        .select("query_id", "neighbor_id")
    )
    qa = corpus_quantized.select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("qa"), F.col("nrm").alias("na")
    )
    qb = corpus_quantized.select(
        F.col("vec_id").alias("neighbor_id"), F.col("qe").alias("qb"), F.col("nrm").alias("nb")
    )
    reranked = cand.join(F.broadcast(qa), on="query_id").join(qb, on="neighbor_id")
    return _topk(_scored(reranked), k)


def knn_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: SQ8 compressed-domain scan + exact rerank
    with the first N_QUERIES corpus vectors as the query set."""
    return knn_sq8_topk(shared_quantized(spark, sf_dir))


KNN_SQ8_SQL = f"""
WITH {_duck_quantized()},
st AS (
  SELECT pos, MIN(v) AS mn, MAX(v) AS mx
  FROM (SELECT unnest(qe) AS v, generate_subscripts(qe, 1) AS pos FROM qn)
  GROUP BY pos
),
codes AS (
  SELECT vec_id,
         list(((v - mn) * {SQ8_LEVELS}) // GREATEST(mx - mn, 1) ORDER BY pos) AS code
  FROM (SELECT vec_id, unnest(qe) AS v, generate_subscripts(qe, 1) AS pos FROM qn) e
  JOIN st USING (pos)
  GROUP BY vec_id
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                              ORDER BY {l2_sql("a.code", "b.code", duck=True)}, b.vec_id) AS rr
    FROM codes a JOIN codes b ON a.vec_id < {N_QUERIES} AND a.vec_id <> b.vec_id
  ) WHERE rr <= {SQ8_RERANK}
),
pairs AS (
  SELECT c.query_id, c.neighbor_id, a.qe AS qa, b.qe AS qb, a.nrm AS na, b.nrm AS nb
  FROM cand c JOIN qn a ON a.vec_id = c.query_id JOIN qn b ON b.vec_id = c.neighbor_id
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


# --------------------------------------------------------------------------
# hybrid retrieval: lexical + vector rank fusion
# --------------------------------------------------------------------------
def borda_fuse(a: DataFrame, b: DataFrame, k: int = TOP_K) -> DataFrame:
    """Integer Borda fusion of two ``(query_id, neighbor_id, rank)``
    rankings: candidate points = (k+1 − rank) from each list it appears
    in, summed, re-ranked per query with the id tiebreak.  Borda rather
    than reciprocal-rank fusion because it is EXACT in int64 — RRF's
    1/(c+rank) sums are floats whose cross-engine comparison the repo's
    determinism contract forbids — while ordering candidates the same way
    for bounded k.  The join is (query, neighbor)-keyed over two
    top-k-sized frames (≤ queries × k rows each): output-sized work, no
    corpus access at all."""
    # defensive truncation: a ranking deeper than k would otherwise score
    # NEGATIVE points (k+1 - rank < 0) and rank BELOW absent candidates —
    # silently, since both engines would apply the same wrong formula
    pa = a.where(F.col("rank") <= k).select(
        "query_id", "neighbor_id", (F.lit(k + 1) - F.col("rank")).alias("pa")
    )
    pb = b.where(F.col("rank") <= k).select(
        "query_id", "neighbor_id", (F.lit(k + 1) - F.col("rank")).alias("pb")
    )
    fused = pa.join(pb, on=["query_id", "neighbor_id"], how="full")
    scored = fused.select(
        "query_id",
        "neighbor_id",
        (F.coalesce("pa", F.lit(0)) + F.coalesce("pb", F.lit(0)))
        .cast("long")
        .alias("borda"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("borda").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: hybrid retrieval over the SAME corpus ids
    (documents.doc_id ≡ embeddings.vec_id in the fixtures, the usual
    one-row-per-document layout) — hashed-BoW lexical top-k fused with the
    LSH-bucketed vector top-k.  The modern retrieval shape: lexical
    matching catches exact-term queries embeddings smooth over, vectors
    catch paraphrases lexical misses; rank fusion needs no score
    calibration between the two spaces."""
    from dream_spark.operators.text import text_knn

    return borda_fuse(text_knn(spark, sf_dir), knn_lsh(spark, sf_dir))


def _hybrid_sql() -> str:
    from dream_spark.operators.text import TEXT_KNN_SQL

    k = TOP_K
    return f"""
WITH lex AS (
{TEXT_KNN_SQL}
),
vec AS (
{KNN_LSH_SQL}
),
pa AS (SELECT query_id, neighbor_id, {k + 1} - rank AS pa FROM lex WHERE rank <= {k}),
pb AS (SELECT query_id, neighbor_id, {k + 1} - rank AS pb FROM vec WHERE rank <= {k}),
fused AS (
  SELECT COALESCE(a.query_id, b.query_id) AS query_id,
         COALESCE(a.neighbor_id, b.neighbor_id) AS neighbor_id,
         CAST(COALESCE(pa, 0) + COALESCE(pb, 0) AS BIGINT) AS borda
  FROM pa a FULL JOIN pb b
    ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
)
SELECT query_id, neighbor_id, borda,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY borda DESC, neighbor_id) AS BIGINT) AS rank
FROM fused
QUALIFY rank <= {k}
""".strip()



QUERIES = {
    "hybrid_search": hybrid_search,
    "knn_bruteforce": knn_bruteforce,
    "knn_lsh": knn_lsh,
    "knn_lsh_served": knn_lsh_served,
    "knn_ivf_served": knn_ivf_served,
    "knn_ivf_pruned": knn_ivf_pruned,
    "knn_ivf_refreshed": knn_ivf_refreshed,
    "knn_ivf": knn_ivf,
    "knn_filtered": knn_filtered,
    "knn_sq8": knn_sq8,
}

ORACLES = {
    "hybrid_search": _hybrid_sql(),
    "knn_bruteforce": KNN_BRUTEFORCE_SQL,
    "knn_lsh": KNN_LSH_SQL,
    # the serve path loads the persisted index; values are identical to the
    # in-session LSH plan, so the same oracle replays it
    "knn_lsh_served": KNN_LSH_SQL,
    "knn_ivf": KNN_IVF_SQL,
    "knn_ivf_served": KNN_IVF_SQL,
    # the pruned serve path reads only the probed cell directories; the
    # candidate set and exact rerank are the same, so the IVF oracle
    # replays identically
    "knn_ivf_pruned": KNN_IVF_SQL,
    "knn_ivf_refreshed": KNN_IVF_REFRESHED_SQL,
    "knn_filtered": KNN_FILTERED_SQL,
    "knn_sq8": KNN_SQ8_SQL,
}

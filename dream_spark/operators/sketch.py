"""Sketch operators: KMV (k-minimum-values) distinct-count estimation and
exact grouped quantiles — the cardinality/profile statistics a pipeline
computes before committing to a shuffle strategy.

Why KMV and not HyperLogLog: Spark's ``approx_count_distinct`` (HLL++) is
the right production choice, but its estimate is not replayable by an
independent engine, so it cannot pass a value-exact oracle gate.  KMV with
the package's universal hash family IS deterministic: both engines hash
every value with the same h, keep the k smallest distinct hashes, and apply
the same integer estimator — bit-identical output, genuinely sublinear
state.  (The estimator D̂ = (k−1)·P/h_(k) is the standard KMV unbiased
form; the integer division quantizes identically on both engines.)

Scale notes:
- KMV state is k longs per group — mergeable by "union then keep k
  smallest", i.e. a partial-aggregatable sketch: map-side combine reduces
  every partition to ≤ k values before the shuffle, exactly like a SUM.
  The implementation here uses distinct + global top-k (two exchanges of
  hash-sized rows); at 100 TB swap the final orderBy().limit(k) for the
  same windowless aggregate the oracle uses — the plan already moves only
  hashes, never raw values.
- Exact grouped quantiles need a per-group sort; the window runs after one
  shuffle on the group key.  For percentile sets at extreme scale use
  partial histograms instead; the exact form is the oracle-checkable
  definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dream_spark.functions.hashing import MERSENNE_P, hash_params, hash_sql
from dream_spark.sources.tables import load_table

#: sketch size (values kept); estimator error ~ 1/sqrt(k) ≈ 6% at 256
KMV_K = 256
#: hash-function index reserved for the KMV sketch
_KMV_FN = 2


def _nn_hash_sql(col: str, fn: int) -> str:
    """Non-negative universal hash in [0, P): Spark and DuckDB ``%``
    truncate toward zero, so a NEGATIVE input value yields a negative raw
    hash — which would make the KMV order statistic h_(k) ≤ 0 and the
    estimator (k−1)·P div h_(k) negative or NULL (silently, identically on
    both engines — invisible to the oracle gate).  ``(h + P) % P`` maps
    into [0, P) on both engines.  Inherent domain note: the 31-bit family
    hashes x mod P, so x and x+P collide; callers' values must span less
    than P (2^31−1) for the distinct-count contract to be exact."""
    return f"((({hash_sql(col, fn)}) + {MERSENNE_P}) % {MERSENNE_P})"


def _kmv_est(k: int):
    """The shared KMV estimator column: exact below k, else (k−1)·P div
    h_(k) — one definition for both Spark paths."""
    return F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.expr(f"({k} - 1) * {MERSENNE_P}L div kth_min")
    )


def _kmv_est_sql(k: int) -> str:
    """The shared KMV estimator fragment for the oracle strings."""
    return (
        f"CAST(CASE WHEN n_kept < {k} THEN n_kept"
        f" ELSE CAST({k - 1} AS BIGINT) * {MERSENNE_P} // kth_min END AS BIGINT)"
    )


def kmv_distinct(df: DataFrame, col: str, k: int = KMV_K) -> DataFrame:
    """One-row distinct-count estimate of integer column ``col`` for ANY
    DataFrame: (k, n_kept, kth_min, est_distinct).

    ``est_distinct`` = exact count when fewer than ``k`` distinct hashes
    exist (the sketch has seen everything), else (k−1)·P div h_(k)."""
    hv = df.select(F.expr(_nn_hash_sql(col, _KMV_FN)).alias("hv")).where(
        F.col("hv").isNotNull()
    ).distinct()
    kept = hv.orderBy("hv").limit(k)
    agg = kept.agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("kth_min")
    )
    return agg.select(
        F.lit(k).cast("bigint").alias("k"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.col("kth_min").cast("bigint").alias("kth_min"),
        _kmv_est(k).cast("bigint").alias("est_distinct"),
    )


def sketch_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: KMV estimate of distinct event users."""
    return kmv_distinct(load_table(spark, sf_dir, "events"), "user_id")


SKETCH_KMV_SQL = f"""
WITH h AS (SELECT DISTINCT {_nn_hash_sql("user_id", _KMV_FN)} AS hv
           FROM events WHERE user_id IS NOT NULL),
kept AS (SELECT hv FROM h ORDER BY hv LIMIT {KMV_K}),
agg AS (SELECT COUNT(*) AS n_kept, MAX(hv) AS kth_min FROM kept)
SELECT CAST({KMV_K} AS BIGINT) AS k,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(kth_min AS BIGINT) AS kth_min,
       {_kmv_est_sql(KMV_K)} AS est_distinct
FROM agg
""".strip()


#: tumbling window for the per-window KMV (hour, microseconds)
KMV_WINDOW_US = 3_600_000_000


def _window_bucket(us, width: int):
    """Exact integer floor-division window bucket (pmod-subtract keeps the
    double division exact for |us| < 2^53 and floors negatives)."""
    return ((us - F.pmod(us, F.lit(width))) / F.lit(width)).cast("long")


def _window_bucket_oracle_sql(width: int, ts: str = "ts") -> str:
    """The oracle-side twin of :func:`_window_bucket` (floored integer
    window bucket over epoch micros) — ONE rendering shared by every
    windowed-sketch oracle string so the bucket definition cannot drift
    between entries on the DuckDB side while the Spark side is
    centralized."""
    e = f"epoch_us({ts})"
    return f"CAST(({e} - (({e} % {width}) + {width}) % {width}) / {width} AS BIGINT)"


def kmv_distinct_by_window(
    df: DataFrame,
    col: str,
    ts_col: str = "ts",
    k: int = KMV_K,
    window_us: int = KMV_WINDOW_US,
) -> DataFrame:
    """Per-tumbling-window KMV distinct-count estimates for ANY DataFrame
    with an integer column and a timestamp: (hour_bucket, k, n_kept,
    kth_min, est_distinct) — the batch twin of the bounded-state
    streaming sketch (streaming/events.kmv_stream; identical hash, so the
    closed stream windows equal these rows exactly).

    Scale shape: distinct (bucket, hash) pairs partially aggregate before
    the shuffle; the per-bucket rank touches at most the distinct hashes
    of one window, and only k of them survive to the final aggregate."""
    from dream_spark.functions.timeutils import epoch_micros

    us = epoch_micros(df, ts_col)
    hv = (
        df.select(
            _window_bucket(us, window_us).alias("hour_bucket"),
            F.expr(_nn_hash_sql(col, _KMV_FN)).alias("hv"),
        )
        .where(F.col("hv").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("hour_bucket").orderBy("hv")
    kept = hv.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    agg = kept.groupBy("hour_bucket").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("kth_min")
    )
    return agg.select(
        F.col("hour_bucket").cast("bigint").alias("hour_bucket"),
        F.lit(k).cast("bigint").alias("k"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.col("kth_min").cast("bigint").alias("kth_min"),
        _kmv_est(k).cast("bigint").alias("est_distinct"),
    )


def sketch_kmv_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: hourly KMV distinct-user estimates."""
    return kmv_distinct_by_window(load_table(spark, sf_dir, "events"), "user_id")


SKETCH_KMV_HOURLY_SQL = f"""
WITH h AS (
  SELECT DISTINCT
         {_window_bucket_oracle_sql(KMV_WINDOW_US)} AS hour_bucket,
         {_nn_hash_sql("user_id", _KMV_FN)} AS hv
  FROM events WHERE user_id IS NOT NULL
),
kept AS (
  SELECT hour_bucket, hv,
         ROW_NUMBER() OVER (PARTITION BY hour_bucket ORDER BY hv) AS rn
  FROM h
),
agg AS (
  SELECT hour_bucket, COUNT(*) AS n_kept, MAX(hv) AS kth_min
  FROM kept WHERE rn <= {KMV_K} GROUP BY hour_bucket
)
SELECT CAST(hour_bucket AS BIGINT) AS hour_bucket,
       CAST({KMV_K} AS BIGINT) AS k,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(kth_min AS BIGINT) AS kth_min,
       {_kmv_est_sql(KMV_K)} AS est_distinct
FROM agg
""".strip()


def grouped_quantiles(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Exact lower-median and quartiles of ``value_col`` per group —
    type-1 (no interpolation) quantiles: the element at 1-based rank
    ⌈q·n⌉ of the ascending sort, a pure integer definition both engines
    compute identically (unlike interpolating percentile functions)."""
    # NULL values are excluded on BOTH engines: Spark sorts NULLS FIRST
    # ascending, DuckDB NULLS LAST — without the filter every group
    # containing a NULL would disagree on all its quantiles
    df = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    # reserved internal names: a user group/value column named v/r/n must
    # not collide with the rank plumbing
    ranked = df.select(
        group_col,
        F.col(value_col).alias("__gq_v"),
        F.row_number().over(w).alias("__gq_r"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("__gq_n"),
    )
    def at(q_num: int, q_den: int):
        # rank = ceil(q·n) with integer arithmetic
        target = F.expr(f"cast((__gq_n * {q_num} + {q_den} - 1) div {q_den} as int)")
        return F.max(F.when(F.col("__gq_r") == target, F.col("__gq_v")))

    return (
        ranked.groupBy(group_col)
        .agg(
            F.max("__gq_n").cast("bigint").alias("n"),
            at(1, 4).cast("bigint").alias("p25"),
            at(1, 2).cast("bigint").alias("p50"),
            at(3, 4).cast("bigint").alias("p75"),
        )
    )


def sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: exact n_chars quartiles per document source."""
    docs = load_table(spark, sf_dir, "documents")
    return grouped_quantiles(docs, "source", "n_chars")


SKETCH_QUANTILES_SQL = """
WITH ranked AS (
  SELECT source, n_chars AS v,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents WHERE n_chars IS NOT NULL
)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN r = (n * 1 + 3) // 4 THEN v END) AS BIGINT) AS p25,
       CAST(MAX(CASE WHEN r = (n * 1 + 1) // 2 THEN v END) AS BIGINT) AS p50,
       CAST(MAX(CASE WHEN r = (n * 3 + 3) // 4 THEN v END) AS BIGINT) AS p75
FROM ranked GROUP BY source
""".strip()


#: bottom-k sample size per group for the approximate-quantile sketch
AQ_K = 512
#: hash-function index reserved for quantile sampling
_AQ_FN = 4


def sampled_quantiles(
    df: DataFrame, group_col: str, value_col: str, id_col: str, k: int = AQ_K
) -> DataFrame:
    """Approximate per-group quartiles from a deterministic bottom-``k``
    sample — the sketch form of :func:`grouped_quantiles` for groups too
    large to sort exactly.

    The sample is the ``k`` rows with the smallest ``h(id)`` per group
    (ties by id) — a uniform sample that is *mergeable* exactly like KMV:
    the bottom-k of a union is the bottom-k of the per-sub-split bottom-ks.
    The rank runs in TWO phases like :func:`kmv_distinct_by` — phase 1
    ranks within (group, h mod S) sub-splits, S-way parallel, each keeping
    ≤ k rows; phase 2 ranks the ≤ S·k survivors per group — so no single
    task ever sorts a whole group's cardinality, which is the entire point
    of sampling before the value sort.  NULL ids are excluded (Spark
    orders NULL hashes first, DuckDB last — they would pick different
    samples).  Same type-1 quantile definition as the exact form, so the
    result is an actual data element and both engines agree bit-for-bit
    on the same sample."""
    S = 32
    h = F.expr(_nn_hash_sql(id_col, _AQ_FN))
    nn = df.where(F.col(id_col).isNotNull())
    w1 = Window.partitionBy(
        group_col, F.expr(f"({_nn_hash_sql(id_col, _AQ_FN)}) % {S}")
    ).orderBy(h.asc(), F.col(id_col).asc())
    pre = nn.withColumn("__aq_r1", F.row_number().over(w1)).where(F.col("__aq_r1") <= k)
    ws = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    samp = (
        pre.withColumn("__aq_sr", F.row_number().over(ws))
        .where(F.col("__aq_sr") <= k)
        .select(group_col, value_col)
    )
    return grouped_quantiles(samp, group_col, value_col)


def sketch_quantiles_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: sampled n_chars quartiles per doc source."""
    docs = load_table(spark, sf_dir, "documents")
    return sampled_quantiles(docs, "source", "n_chars", "doc_id")


SKETCH_QUANTILES_SAMPLED_SQL = f"""
WITH samp AS (
  SELECT source, n_chars FROM (
    SELECT source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY {_nn_hash_sql("doc_id", _AQ_FN)}, doc_id) AS sr
    FROM documents WHERE doc_id IS NOT NULL
  ) WHERE sr <= {AQ_K}
),
ranked AS (
  SELECT source, n_chars AS v,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM samp WHERE n_chars IS NOT NULL
)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN r = (n * 1 + 3) // 4 THEN v END) AS BIGINT) AS p25,
       CAST(MAX(CASE WHEN r = (n * 1 + 1) // 2 THEN v END) AS BIGINT) AS p50,
       CAST(MAX(CASE WHEN r = (n * 3 + 3) // 4 THEN v END) AS BIGINT) AS p75
FROM ranked GROUP BY source
""".strip()


def kmv_distinct_by(
    df: DataFrame, group_col: str, col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group KMV distinct-count estimates — the grouped form of
    :func:`kmv_distinct`: (group, k, n_kept, kth_min, est_distinct).

    Two-phase bottom-k so NO single partition ever sorts a whole group's
    distinct-hash set: phase 1 ranks within (group, hv mod S) sub-splits —
    S-way parallel, each sub-split keeps ≤ k rows — and phase 2 ranks the
    ≤ S·k survivors per group exactly.  Sound because the global bottom-k
    is contained in the union of per-sub-split bottom-ks (same argument as
    the KMV merge property)."""
    S = 32  # sub-splits per group for the parallel pre-rank
    hv = (
        df.where(F.col(col).isNotNull())
        .select(group_col, F.expr(_nn_hash_sql(col, _KMV_FN)).alias("hv"))
        .distinct()
    )
    w1 = Window.partitionBy(group_col, F.expr(f"hv % {S}")).orderBy(F.col("hv").asc())
    pre = hv.withColumn("rn1", F.row_number().over(w1)).where(F.col("rn1") <= k)
    w = Window.partitionBy(group_col).orderBy(F.col("hv").asc())
    kept = pre.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    agg = kept.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("kth_min")
    )
    return agg.select(
        group_col,
        F.lit(k).cast("bigint").alias("k"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.col("kth_min").cast("bigint").alias("kth_min"),
        _kmv_est(k).cast("bigint").alias("est_distinct"),
    )


def sketch_kmv_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: distinct-user KMV estimate per event type."""
    return kmv_distinct_by(load_table(spark, sf_dir, "events"), "event_type", "user_id")


SKETCH_KMV_BY_TYPE_SQL = f"""
WITH h AS (SELECT DISTINCT event_type, {_nn_hash_sql("user_id", _KMV_FN)} AS hv
           FROM events WHERE user_id IS NOT NULL),
kept AS (
  SELECT event_type, hv FROM (
    SELECT event_type, hv,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
    FROM h
  ) WHERE rn <= {KMV_K}
),
agg AS (SELECT event_type, COUNT(*) AS n_kept, MAX(hv) AS kth_min
        FROM kept GROUP BY event_type)
SELECT event_type,
       CAST({KMV_K} AS BIGINT) AS k,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(kth_min AS BIGINT) AS kth_min,
       {_kmv_est_sql(KMV_K)} AS est_distinct
FROM agg
""".strip()


#: count-min sketch geometry: depth (hash rows) × width (buckets per row).
#: ε ≈ e/width, δ ≈ e^-depth — 4×1024 gives ~0.27% of stream length error
#: at 98% confidence, in 4 KB of counters per group of interest.
CMS_DEPTH = 4
CMS_WIDTH = 1024
#: hash-function indices reserved for the CMS rows
_CMS_FN0 = 8


def cms_table(df: DataFrame, col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Count-min sketch of integer column ``col`` for ANY DataFrame:
    (row, bucket, cnt) — ``depth × width`` counters.

    The sketch is a plain partial-aggregatable groupBy: each input row
    contributes +1 to one bucket per hash row, map-side combine reduces
    every partition to ≤ depth·width rows before the shuffle, and sketches
    of two datasets MERGE by adding counters.  Point frequency estimates
    (``cms_estimate``) take the min over the depth rows — always an
    overestimate, within ε·N with probability 1−δ.  Deterministic: the
    universal hash family is replayed verbatim by the oracle."""
    # ONE scan: each input row explodes into its depth (row, bucket) cells
    # map-side — a union of depth per-row projections would scan the input
    # depth times (Spark does not reuse scans across union branches).
    # NULLs are excluded here (not only in wrappers): a NULL value hashes
    # to NULL and would materialize counter cells no estimator ever probes.
    return (
        df.where(F.col(col).isNotNull())
        .select(cms_cells(col, depth, width))
        .select(F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_cells(col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """The ONE depth-cell explode expression both the batch sketch and the
    streaming windowed sketch build from — a single definition so batch and
    stream sketches merge and ``cms_estimate`` probes identical buckets.
    Yields a generator column aliased ``__c`` with fields (row, bucket)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    F.expr(f"{hash_sql(col, _CMS_FN0 + i)} % {width}").alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    ).alias("__c")


def _trunc_mod(a: int, b: int) -> int:
    """Truncated (C/SQL-style) modulo — Spark and DuckDB ``%`` both truncate
    toward zero, so a NEGATIVE input value yields a negative bucket on the
    table side; the estimator must probe the same bucket, not Python's
    floored (always non-negative) one."""
    r = abs(a) % abs(b)
    return r if a >= 0 else -r


def cms_estimate(sketch_rows: list, col_value: int, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> int:
    """Point-frequency estimate from a collected sketch (driver-side):
    min over rows of the value's bucket counter."""
    counters = {(r["row"], r["bucket"]): r["cnt"] for r in sketch_rows}
    est = None
    for i in range(depth):
        a, b = hash_params(_CMS_FN0 + i)
        bucket = _trunc_mod(_trunc_mod(a * col_value + b, MERSENNE_P), width)
        c = counters.get((i, bucket), 0)
        est = c if est is None else min(est, c)
    return int(est or 0)


def sketch_cms_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: CMS of event user_ids (the heavy-hitter
    profile of the stream in depth×width bounded state)."""
    # NULL exclusion is cms_table's own first step — no wrapper-side guard
    ev = load_table(spark, sf_dir, "events")
    return cms_table(ev, "user_id").select(
        F.col("row").cast("bigint").alias("row"),
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("cnt").cast("bigint").alias("cnt"),
    )


def _cms_sql() -> str:
    parts = " UNION ALL ".join(
        f"SELECT {i} AS row, {hash_sql('user_id', _CMS_FN0 + i)} % {CMS_WIDTH} AS bucket"
        " FROM events WHERE user_id IS NOT NULL"
        for i in range(CMS_DEPTH)
    )
    return f"""
WITH cells AS ({parts})
SELECT CAST(row AS BIGINT) AS row, CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM cells GROUP BY row, bucket
""".strip()


SKETCH_CMS_SQL = _cms_sql()


def kmv_overlap(
    df: DataFrame, group_col: str, col: str, ga: str, gb: str, k: int = KMV_K
) -> DataFrame:
    """Distinct-value OVERLAP estimate between two groups from their KMV
    sketches — the theta-sketch-style set intersection, kept exact-integer
    for the oracle: one row ``(k, theta, n_common, est_common)``.

    Per side, ``theta_side`` = P when the sketch is unsaturated (it holds
    the side's ENTIRE distinct hash set) else its k-th minimum;
    ``theta = min(theta_a, theta_b)``.  Every hash below ``theta`` is
    inside BOTH bottom-k sets by construction, so ``n_common`` = |{h < θ:
    h ∈ Sₐ ∧ h ∈ S_b}| is an exact count over a uniform θ/P fraction of
    the hash space, giving ``est_common = n_common · P div θ`` — which
    degrades to the EXACT intersection when both sketches are unsaturated
    (θ = P).  Mergeability story at 100 TB: each side's bottom-k is a
    two-phase parallel rank (like :func:`kmv_distinct_by`) and the
    intersection runs on ≤ 2k rows — sketch sizes, never data sizes."""
    hv = (
        df.where(F.col(group_col).isin([ga, gb]) & F.col(col).isNotNull())
        .select(group_col, F.expr(_nn_hash_sql(col, _KMV_FN)).alias("hv"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy(F.col("hv").asc())
    kept = hv.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    side = kept.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("kth_min")
    )
    theta = side.agg(
        F.min(
            F.when(F.col("n_kept") < k, F.lit(MERSENNE_P)).otherwise(F.col("kth_min"))
        ).alias("theta")
    )
    common = (
        kept.where(F.col(group_col) == ga)
        .select("hv")
        .join(kept.where(F.col(group_col) == gb).select("hv"), on="hv")
    )
    n_common = common.crossJoin(F.broadcast(theta)).where(
        F.col("hv") < F.col("theta")
    ).agg(F.count(F.lit(1)).alias("n_common"))
    return (
        n_common.crossJoin(F.broadcast(theta))
        .select(
            F.lit(k).cast("bigint").alias("k"),
            F.col("theta").cast("bigint").alias("theta"),
            F.col("n_common").cast("bigint").alias("n_common"),
            F.expr(f"n_common * {MERSENNE_P}L div theta").cast("bigint").alias("est_common"),
        )
    )


def sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: estimated distinct-user overlap between
    the click and purchase event streams."""
    return kmv_overlap(
        load_table(spark, sf_dir, "events"), "event_type", "user_id", "click", "purchase"
    )


SKETCH_KMV_OVERLAP_SQL = f"""
WITH h AS (SELECT DISTINCT event_type, {_nn_hash_sql("user_id", _KMV_FN)} AS hv
           FROM events
           WHERE user_id IS NOT NULL AND event_type IN ('click', 'purchase')),
kept AS (
  SELECT event_type, hv FROM (
    SELECT event_type, hv,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
    FROM h
  ) WHERE rn <= {KMV_K}
),
side AS (SELECT event_type, COUNT(*) AS n_kept, MAX(hv) AS kth_min
         FROM kept GROUP BY event_type),
th AS (SELECT MIN(CASE WHEN n_kept < {KMV_K} THEN {MERSENNE_P} ELSE kth_min END) AS theta
       FROM side),
common AS (
  SELECT a.hv FROM (SELECT hv FROM kept WHERE event_type = 'click') a
  JOIN (SELECT hv FROM kept WHERE event_type = 'purchase') b USING (hv)
),
nc AS (SELECT COUNT(*) AS n_common FROM common CROSS JOIN th WHERE hv < theta)
SELECT CAST({KMV_K} AS BIGINT) AS k,
       CAST(theta AS BIGINT) AS theta,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(n_common * {MERSENNE_P} // theta AS BIGINT) AS est_common
FROM nc CROSS JOIN th
""".strip()


#: Bloom filter geometry: m bits, k hash functions.  m is a CONSTANT —
#: the whole point of the sketch is state bounded independent of data size
BLOOM_M = 4096
BLOOM_K = 3
#: universal-hash function indices reserved for the bloom positions
_BLOOM_HASH_BASE = 7
#: the build source (the "seen corpus" whose membership the filter answers)
BLOOM_BUILD_SOURCE = "src0"
#: document membership key: Horner pack of the text prefix (shared exact
#: fragment on both engines; collisions are just part of the hash)
_BLOOM_KEY_CHARS = 24


# ---------------------------------------------------------------------------
# Heavy hitters: mergeable Misra–Gries candidate pass + exact recount
# ---------------------------------------------------------------------------

#: threshold denominator AND counter budget: report tokens whose corpus
#: count satisfies cnt · HH_K ≥ total.  Using the same value for the MG
#: counter budget makes the candidate pass provably complete (below).
HH_K = 100


def misra_gries_candidates(toks: DataFrame, k: int = HH_K) -> DataFrame:
    """Per-partition Misra–Gries summaries over a ``tok`` column: each task
    keeps at most ``k`` weighted counters regardless of how many distinct
    tokens stream through it, and emits its surviving candidate terms.

    Batch-merge form (the mergeable-summaries result of Agarwal et al.,
    PODS'12): fold each Arrow batch's exact ``value_counts`` into the
    running counters, and when more than ``k`` survive, subtract the
    (k+1)-th largest count from ALL of them and drop the non-positive —
    equivalent to a sequence of classic MG decrement steps, so the merged
    summary keeps every term whose true partition count exceeds
    N_part/(k+1).

    Completeness of the union: if a term's corpus count is ≥ total/k,
    then by pigeonhole some partition holds ≥ N_part/k > N_part/(k+1) of
    it, so the term survives THAT partition's summary.  The union of the
    per-partition candidate sets is therefore a superset of the true
    heavy hitters — the exact recount pass makes the final answer
    deterministic and partitioning-independent.

    The partition's exact TOKEN COUNT rides along as one extra row
    (term = NULL) so the caller gets the stream length from the same
    pass — without it, computing ``total`` would re-tokenize the corpus
    a third time (r7 review finding).

    Scale shape: one map-only pass with O(k) state per task, ≤ k+1 rows
    out per task; no shuffle of the token stream."""
    import pandas as pd

    def mg(batches):
        from collections import Counter

        counters: Counter = Counter()
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            counters.update(pdf["tok"].value_counts().to_dict())
            if len(counters) > k:
                top = counters.most_common(k + 1)
                cut = top[k][1]
                counters = Counter({t: c - cut for t, c in top[:k] if c > cut})
        yield pd.DataFrame(
            {
                "term": list(counters.keys()) + [None],
                "n_part": [None] * len(counters) + [n_part],
            }
        )

    return toks.select("tok").mapInPandas(mg, schema="term string, n_part long")


def heavy_hitters(toks: DataFrame, k: int = HH_K) -> DataFrame:
    """Exact frequent items (count ≥ stream_length/k) by the classic
    two-pass scheme: a bounded-memory Misra–Gries candidate sweep, then an
    exact recount of the ≤ k·n_tasks candidates via a broadcast semi-join.
    Output is EXACT — the sketch only bounds what the second pass counts —
    so the entry carries a full value-hash oracle even though pass 1 is
    not SQL-expressible."""
    # ONE sketch pass feeds both the candidate set and the stream length:
    # collect the ≤ (k+1)·n_tasks sketch rows to the driver ONCE (the
    # bounded-collect contract — bounded by sketch geometry, never by data)
    # and derive both from the collected rows.  This replaces an earlier
    # localCheckpoint (unreplicated blocks — unrecoverable on executor
    # loss, r7 ADVICE) and its persist successor (CacheManager entries a
    # long-lived session never releases, r8 review finding): the second
    # pass re-reads only the literal candidate list, and no cluster state
    # outlives the call.
    rows = misra_gries_candidates(toks, k).collect()
    terms = sorted({r["term"] for r in rows if r["term"] is not None})
    total_n = sum(r["n_part"] for r in rows if r["n_part"] is not None)
    spark = toks.sparkSession
    cands = spark.createDataFrame([(t,) for t in terms] or [], "term string")
    exact = (
        toks.join(F.broadcast(cands), toks["tok"] == cands["term"])
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.where(F.col("cnt") * k >= F.lit(total_n)).select(
        "term", "cnt", F.lit(total_n).cast("bigint").alias("total")
    )


def sketch_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: corpus-level frequent tokens (≥ 1/HH_K of
    the token stream) over the documents table — the stopword/vocab-head
    discovery pass of a tokenizer-training pipeline."""
    from dream_spark.functions.features import tokens
    from dream_spark.functions.textkernels import spread_small

    docs = spread_small(load_table(spark, sf_dir, "documents"))
    return heavy_hitters(tokens(docs))


def _heavyhitters_sql() -> str:
    from dream_spark.functions.features import duck_tokens_cte

    return f"""
WITH toks AS ({duck_tokens_cte()}),
total AS (SELECT COUNT(*) AS total FROM toks),
counts AS (SELECT tok AS term, COUNT(*) AS cnt FROM toks GROUP BY tok)
SELECT term, cnt, total FROM counts CROSS JOIN total
WHERE cnt * {HH_K} >= total
""".strip()


SKETCH_HEAVYHITTERS_SQL = _heavyhitters_sql()


# ---------------------------------------------------------------------------
# HyperLogLog registers: replayable sketch state + integer-exact estimator
# ---------------------------------------------------------------------------

HLL_P = 8  #: 2^8 = 256 registers; standard error ≈ 1.04/sqrt(m) ≈ 6.5%
HLL_M = 1 << HLL_P
_HLL_FN = 6  #: hash-function index reserved for the HLL sketch
_HLL_FN2 = 7  #: second draw for the quadratic mixer below
#: the 31-bit hash splits into an 8-bit bucket and a 23-bit suffix w;
#: rho = leading zeros of w within 23 bits, plus 1 — so rho ∈ [1, 24]
_HLL_RHO_MAX = 24
#: alpha_256 = 0.7213/(1 + 1.079/256) ≈ 0.71827 as an exact rational
_HLL_ALPHA_NUM = 71_827
_HLL_ALPHA_DEN = 100_000


def _hll_mix_sql(col: str) -> str:
    """Quadratic strengthening of the universal hash for the HLL input:
    mix(x) = (h² + a₂·h + b₂) mod P over h = h_FN(x).  The LINEAR family
    alone is only pairwise independent, and on dense sequential ids its
    image is a lattice whose per-bucket minima are systematically small —
    measured ~50-90% HLL overestimates (the max-rho statistic reads
    exactly those minima; KMV's k-th order statistic is insensitive to
    this, which is why the linear family suffices there).  The quadratic
    composition breaks the lattice: measured error on 5k-1M sequential
    AND random ids is within ~1.5σ of the 1.04/√m bound.  Every
    intermediate stays below 2^62 (h < 2^31, so h² < 2^62), exact int64
    on both engines."""
    h = f"({_nn_hash_sql(col, _HLL_FN)})"
    a2, b2 = hash_params(_HLL_FN2)
    return (
        f"((({h} * {h}) % {MERSENNE_P} + {a2} * {h} + {b2}) % {MERSENNE_P})"
    )


def _hll_rho_sql(w: str) -> str:
    """rho(w) for a 23-bit suffix, portable: both engines render ``bin()``
    without leading zeros, so floor(log2(w)) = length(bin(w)) − 1 and
    rho = 23 − floor(log2(w)) + 1; w = 0 means all 23 bits are zero."""
    return (
        f"(CASE WHEN ({w}) = 0 THEN {_HLL_RHO_MAX}"
        f" ELSE {_HLL_RHO_MAX} - length(bin({w})) END)"
    )


def _hll_est_sql(s_obs: str, m_obs: str, d: str) -> str:
    """The ONE rendering of the raw HLL estimator
    alpha·m²·2^RHO_MAX div (s_obs + (m − m_obs)·2^RHO_MAX) — shared by
    every Spark selectExpr and every DuckDB oracle string (``d`` is the
    integer-division operator: `div` or `//`); the streaming twin's
    Python mirror is :func:`hll_est_py`.  One definition, so the
    stream/batch/oracle bit-for-bit parity cannot drift."""
    num = f"{_HLL_ALPHA_NUM} * CAST({HLL_M * HLL_M} AS BIGINT) * {1 << _HLL_RHO_MAX}"
    den = f"{_HLL_ALPHA_DEN} * (({s_obs}) + ({HLL_M} - ({m_obs})) * {1 << _HLL_RHO_MAX})"
    return f"CAST(({num}) {d} ({den}) AS BIGINT)"


def hll_est_py(s_obs: int, m_obs: int) -> int:
    """Python mirror of :func:`_hll_est_sql` for the streaming state
    function."""
    num = _HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << _HLL_RHO_MAX)
    den = _HLL_ALPHA_DEN * (s_obs + (HLL_M - m_obs) * (1 << _HLL_RHO_MAX))
    return num // den


def _hll_pow2_sql(reg: str) -> str:
    """2^(RHO_MAX − register) as an integer CASE — no float pow, no
    engine-specific shift operator."""
    whens = " ".join(
        f"WHEN {r} THEN {1 << (_HLL_RHO_MAX - r)}" for r in range(1, _HLL_RHO_MAX + 1)
    )
    return f"(CASE ({reg}) {whens} END)"


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """HyperLogLog sketch of ``count distinct col`` with fully REPLAYABLE
    state: (bucket, register) rows — the max-rho per bucket under the
    package's universal hash — plus the raw HLL estimate as an exact
    integer rational.  Unlike ``approx_count_distinct`` (whose HLL++ state
    is engine-internal), every register value here is reproduced bit-for-
    bit by the DuckDB oracle, so the sketch STATE itself is value-hash
    checked, not just a tolerance on the estimate.

    Scale shape: registers are a partial-aggregatable MAX — map-side
    combine reduces every partition to ≤ m=256 rows before the one
    m-row shuffle; merging two sketches is an elementwise MAX, and the
    estimator never touches the raw column again.  Duplicates need no
    pre-distinct (max is idempotent), which is the whole point of HLL at
    100 TB: one pass, 256 longs of state, union-mergeable.

    The estimate column is the RAW HLL harmonic-mean estimator
    E = alpha·m²/Σ 2^(−M_j) computed over a common 2^24 denominator in
    int64 (empty buckets contribute 2^24) — exact integer arithmetic on
    both engines.  Production HLL adds low/high-range corrections
    (linear counting below 2.5m); this entry pins the register state and
    the raw estimator, which the corrections are pure driver-side
    functions of."""
    h = _hll_mix_sql(col)
    hashed = df.where(F.col(col).isNotNull()).selectExpr(
        f"{h} % {HLL_M} AS bucket",
        f"{_hll_rho_sql(f'{h} div {HLL_M}')} AS rho",
    )
    regs = hashed.groupBy("bucket").agg(F.max("rho").alias("register"))
    est = regs.agg(
        F.sum(F.expr(_hll_pow2_sql("register"))).alias("s_obs"),
        F.count(F.lit(1)).alias("m_obs"),
    ).selectExpr(f"{_hll_est_sql('s_obs', 'm_obs', 'div')} AS est")
    return regs.crossJoin(F.broadcast(est)).select(
        F.col("bucket").cast("bigint"),
        F.col("register").cast("bigint"),
        "est",
    )


def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: HLL registers + raw estimate for distinct
    users over the events table."""
    return hll_registers(load_table(spark, sf_dir, "events"), "user_id")


def hll_merge_union(df: DataFrame, col: str, group_col: str) -> DataFrame:
    """THE operation HLL exists for: per-group sketches merged into a
    union estimate WITHOUT touching the raw values again.  Builds one
    register set per group (partial-aggregated MAX, ≤ m rows per group),
    then merges ALL groups by elementwise register MAX — the union
    sketch — and reports per-group estimates next to the merged-union
    estimate.  At 100 TB this is the cross-partition / cross-day /
    cross-source rollup: sketches built independently (per partition, per
    ingest batch) union losslessly because max is associative,
    commutative, and idempotent; no re-scan, no distinct.

    Output: one row per group (group, est_group, est_union) — est_union
    identical on every row, computed purely from the merged registers.
    The whole computation is replayable, so the oracle hash-checks the
    merge itself, not just the estimates."""
    h = _hll_mix_sql(col)
    # NULL groups are KEPT (a group of their own, like GROUP BY on both
    # engines) — filtering them would drop their registers from the merged
    # union sketch and silently break the merge-equals-rebuild contract
    # on any dataset with a nullable group column (r7 review finding)
    hashed = df.where(F.col(col).isNotNull()).selectExpr(
        f"{group_col} AS grp",
        f"{h} % {HLL_M} AS bucket",
        f"{_hll_rho_sql(f'{h} div {HLL_M}')} AS rho",
    )
    regs = hashed.groupBy("grp", "bucket").agg(F.max("rho").alias("register"))

    def est_over(frame: DataFrame, keys: list) -> DataFrame:
        agg = frame.groupBy(*keys).agg(
            F.sum(F.expr(_hll_pow2_sql("register"))).alias("s_obs"),
            F.count(F.lit(1)).alias("m_obs"),
        )
        return agg.selectExpr(
            *keys, f"{_hll_est_sql('s_obs', 'm_obs', 'div')} AS est"
        )

    per_group = est_over(regs, ["grp"]).withColumnRenamed("est", "est_group")
    # the union sketch: elementwise MAX across every group's registers
    merged = regs.groupBy("bucket").agg(F.max("register").alias("register"))
    union_est = est_over(merged, []).withColumnRenamed("est", "est_union")
    return (
        per_group.crossJoin(F.broadcast(union_est))
        .select(F.col("grp").alias(group_col), "est_group", "est_union")
    )


def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: per-event-type distinct-user sketches
    merged into the all-types union estimate."""
    return hll_merge_union(load_table(spark, sf_dir, "events"), "user_id", "event_type")


def _hll_sql() -> str:
    h = _hll_mix_sql("user_id")
    return f"""
WITH hashed AS (
  SELECT {h} % {HLL_M} AS bucket,
         {_hll_rho_sql(f'{h} // {HLL_M}')} AS rho
  FROM events WHERE user_id IS NOT NULL
),
regs AS (SELECT bucket, MAX(rho) AS register FROM hashed GROUP BY bucket),
est AS (
  SELECT {_hll_est_sql(f"SUM({_hll_pow2_sql('register')})", "COUNT(*)", "//")} AS est
  FROM regs
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(register AS BIGINT) AS register, est
FROM regs CROSS JOIN est
""".strip()


SKETCH_HLL_SQL = _hll_sql()


def _hll_union_sql() -> str:
    h = _hll_mix_sql("user_id")
    est = _hll_est_sql(f"SUM({_hll_pow2_sql('register')})", "COUNT(*)", "//")
    return f"""
WITH hashed AS (
  SELECT event_type AS grp, {h} % {HLL_M} AS bucket,
         {_hll_rho_sql(f'{h} // {HLL_M}')} AS rho
  FROM events WHERE user_id IS NOT NULL
),
regs AS (SELECT grp, bucket, MAX(rho) AS register FROM hashed GROUP BY grp, bucket),
per_group AS (
  SELECT grp, {est} AS est_group
  FROM regs GROUP BY grp
),
merged AS (SELECT bucket, MAX(register) AS register FROM regs GROUP BY bucket),
uni AS (SELECT {est} AS est_union FROM merged)
SELECT grp AS event_type, est_group, est_union FROM per_group CROSS JOIN uni
""".strip()


SKETCH_HLL_UNION_SQL = _hll_union_sql()


def hll_by_window(
    df: DataFrame,
    col: str,
    ts_col: str = "ts",
    window_us: int = KMV_WINDOW_US,
) -> DataFrame:
    """Per-tumbling-window HLL distinct estimates: (hour_bucket, m_obs,
    est) — the batch twin of the bounded-state streaming sketch
    (streaming/events.hll_stream; identical hash+mixer+estimator, so the
    closed stream windows equal these rows exactly).

    Scale shape: (window, bucket, rho) partially MAX-aggregates before
    the shuffle — ≤ m=256 rows per window per partition move, however
    many events the window saw."""
    from dream_spark.functions.timeutils import epoch_micros

    us = epoch_micros(df, ts_col)
    h = _hll_mix_sql(col)
    hashed = df.where(F.col(col).isNotNull()).select(
        _window_bucket(us, window_us).alias("hour_bucket"),
        F.expr(f"{h} % {HLL_M}").alias("bucket"),
        F.expr(_hll_rho_sql(f"{h} div {HLL_M}")).alias("rho"),
    )
    regs = hashed.groupBy("hour_bucket", "bucket").agg(F.max("rho").alias("register"))
    agg = regs.groupBy("hour_bucket").agg(
        F.sum(F.expr(_hll_pow2_sql("register"))).alias("s_obs"),
        F.count(F.lit(1)).alias("m_obs"),
    )
    return agg.selectExpr(
        "CAST(hour_bucket AS BIGINT) AS hour_bucket",
        "CAST(m_obs AS BIGINT) AS m_obs",
        f"{_hll_est_sql('s_obs', 'm_obs', 'div')} AS est",
    )


def sketch_hll_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: hourly-window HLL distinct-user estimates
    over the events table."""
    return hll_by_window(load_table(spark, sf_dir, "events"), "user_id")


def _hll_hourly_sql() -> str:
    h = _hll_mix_sql("user_id")
    est = _hll_est_sql(f"SUM({_hll_pow2_sql('register')})", "COUNT(*)", "//")
    return f"""
WITH hashed AS (
  SELECT {_window_bucket_oracle_sql(KMV_WINDOW_US)} AS hour_bucket,
         {h} % {HLL_M} AS bucket,
         {_hll_rho_sql(f'{h} // {HLL_M}')} AS rho
  FROM events WHERE user_id IS NOT NULL
),
regs AS (SELECT hour_bucket, bucket, MAX(rho) AS register
         FROM hashed GROUP BY hour_bucket, bucket)
SELECT CAST(hour_bucket AS BIGINT) AS hour_bucket,
       CAST(COUNT(*) AS BIGINT) AS m_obs,
       {est} AS est
FROM regs GROUP BY hour_bucket
""".strip()


SKETCH_HLL_HOURLY_SQL = _hll_hourly_sql()


def bloom_position_array():
    """The in-row bit-position array of one document's ``text`` column:
    k universal-hash positions in [0, m), duplicates collapsed — the
    shared kernel of the batch probe and the streaming ingest gate."""
    from dream_spark.functions.features import pack_sql

    key = pack_sql("text", _BLOOM_KEY_CHARS)
    return F.array_distinct(F.array(*[F.expr(p) for p in _bloom_positions_sql(key)]))


def _bloom_positions_sql(key_expr: str) -> list[str]:
    from dream_spark.functions.hashing import hash_sql as _h

    return [f"({_h(key_expr, _BLOOM_HASH_BASE + i)} % {BLOOM_M})" for i in range(BLOOM_K)]


def bloom_probe(docs: DataFrame) -> DataFrame:
    """Bloom-filter membership probe: build an ``m``-bit / ``k``-hash Bloom
    filter over the ``BLOOM_BUILD_SOURCE`` documents' content keys, probe
    every OTHER source's documents against it, and report per-source
    ``(n_docs, n_maybe_seen)`` — the have-we-crawled-this-before gate of a
    dedup-at-ingest pipeline.

    Both engines compute the identical universal-hash bit positions, so
    even the FALSE POSITIVES are deterministic and the oracle hash-match
    is exact — the cross-check proves implementation equality, and the
    false-positive RATE follows from the standard (1-e^{-kn/m})^k bound.

    Scale shape: the filter is the set of SET BIT POSITIONS — at most
    ``m`` values (a constant, here 4096) regardless of corpus size — so
    it collapses to a bounded driver-side literal (same bounded-collect
    contract as the DESCRIBE inline-IN gate: ≤ 8·m bytes ride the task
    closure) and merging filters is a distinct-union.  The build pass is
    one distinct whose output is ≤ m rows (map-side partial distinct
    reduces every partition to ≤ m values before the exchange); the probe
    is then fully ROW-LOCAL — each doc's k positions live in one in-row
    array tested against the literal with array_except — so the only
    probe-side shuffle is the #sources-row partial-agg rollup.  Nothing
    corpus-sized ever shuffles."""
    pos_arr = bloom_position_array()
    bits = sorted(
        r["pos"]
        for r in docs.where(F.col("source") == BLOOM_BUILD_SOURCE)
        .select(F.explode(pos_arr).alias("pos"))
        # a NULL-text build doc yields pos=NULL, which would TypeError
        # inside sorted() against ints; the oracle's join never matches
        # NULL, so dropping it here keeps the engines aligned (r7 review)
        .where(F.col("pos").isNotNull())
        .distinct()  # ≤ BLOOM_M distinct values: bounded collect
        .collect()
    )
    if bits:
        hit = F.size(F.array_except(F.col("__ps"), F.lit(bits))) == 0
    else:  # empty filter (no build docs): nothing is ever maybe-seen
        hit = F.lit(False)
    return (
        docs.where(F.col("source") != BLOOM_BUILD_SOURCE)
        .select("source", pos_arr.alias("__ps"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("n_maybe_seen"),
        )
    )


def sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``bloom_probe`` over the documents table."""
    return bloom_probe(load_table(spark, sf_dir, "documents"))


def _bloom_sql() -> str:
    from dream_spark.functions.features import pack_sql

    key = pack_sql("text", _BLOOM_KEY_CHARS)
    pos_union = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, source, {p} AS pos FROM documents"
        for p in _bloom_positions_sql(key)
    )
    return f"""
WITH pos AS (
  SELECT DISTINCT doc_id, source, pos FROM (
{pos_union}
  )
),
bits AS (SELECT DISTINCT pos FROM pos WHERE source = '{BLOOM_BUILD_SOURCE}'),
per_doc AS (
  SELECT p.doc_id, p.source,
         COUNT(*) AS n_pos,
         COUNT(b.pos) AS n_hit
  FROM pos p LEFT JOIN bits b ON b.pos = p.pos
  WHERE p.source <> '{BLOOM_BUILD_SOURCE}'
  GROUP BY p.doc_id, p.source
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_hit = n_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe_seen
FROM per_doc GROUP BY source
""".strip()


SKETCH_BLOOM_SQL = _bloom_sql()

QUERIES = {
    "sketch_bloom": sketch_bloom,
    "sketch_kmv_users": sketch_kmv_users,
    "sketch_kmv_hourly": sketch_kmv_hourly,
    "sketch_quantiles": sketch_quantiles,
    "sketch_quantiles_sampled": sketch_quantiles_sampled,
    "sketch_cms_users": sketch_cms_users,
    "sketch_kmv_by_type": sketch_kmv_by_type,
    "sketch_kmv_overlap": sketch_kmv_overlap,
    "sketch_heavyhitters": sketch_heavyhitters,
    "sketch_hll_registers": sketch_hll_registers,
    "sketch_hll_union": sketch_hll_union,
    "sketch_hll_hourly": sketch_hll_hourly,
}

ORACLES = {
    "sketch_bloom": SKETCH_BLOOM_SQL,
    "sketch_kmv_users": SKETCH_KMV_SQL,
    "sketch_kmv_hourly": SKETCH_KMV_HOURLY_SQL,
    "sketch_quantiles": SKETCH_QUANTILES_SQL,
    "sketch_quantiles_sampled": SKETCH_QUANTILES_SAMPLED_SQL,
    "sketch_cms_users": SKETCH_CMS_SQL,
    "sketch_kmv_by_type": SKETCH_KMV_BY_TYPE_SQL,
    "sketch_kmv_overlap": SKETCH_KMV_OVERLAP_SQL,
    "sketch_heavyhitters": SKETCH_HEAVYHITTERS_SQL,
    "sketch_hll_registers": SKETCH_HLL_SQL,
    "sketch_hll_union": SKETCH_HLL_UNION_SQL,
    "sketch_hll_hourly": SKETCH_HLL_HOURLY_SQL,
}

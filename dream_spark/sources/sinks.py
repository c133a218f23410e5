"""Generic output sinks: partitioned parquet, bucketed tables, and JSONL.

The reference engine's only sink is a text file of decoded rows on the proxy
(Proxy.c:211-228); a Spark-native engine instead writes layouts the NEXT
job can exploit:

- ``write_partitioned``: hive-style directory partitioning.  A reader that
  filters on the partition column scans only the matching directories
  (partition pruning — the `PartitionFilters` line in `.explain`), which at
  100 TB is the difference between reading one day/language and all of them.
- ``write_bucketed``: pre-shuffled, hash-bucketed table layout.  Two tables
  bucketed on the same key with the same bucket count join WITHOUT a
  shuffle exchange — the persisted analog of co-partitioning, and the right
  layout for fact tables that are repeatedly joined on the same key
  (the triple store uses the same mechanism for its subject-bucketed
  layout, sources/triples.py).
- ``write_jsonl``: newline-delimited JSON — the interchange format
  tokenizer/training jobs usually ingest.

Partition-count guidance at scale: aim for output files near the
``spark.sql.files.maxPartitionBytes`` the readers will use (default 128 MB)
— thousands of tiny files thrash the driver's listing and any metastore;
``coalesce_to`` caps the file count for small outputs without a full
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def coalesce_to(df: DataFrame, max_files: int) -> DataFrame:
    """Cap output file count without a shuffle (coalesce narrows; it never
    redistributes, so it cannot fix skew — use repartition for that)."""
    return df.coalesce(max_files) if max_files > 0 else df


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_files_per_partition: int = 0,
) -> None:
    """Hive-style partitioned parquet: one directory tree level per
    partition column.  Readers filtering on those columns prune at plan
    time.  Choose LOW-cardinality columns (date, lang, source); a
    high-cardinality partition column creates millions of directories.

    ``max_files_per_partition`` salts the shuffle: repartitioning by the
    partition columns ALONE would hash each partition value to exactly one
    task — one giant file per directory and write parallelism capped at
    the distinct-value count, the straggler/OOM shape on a skewed
    partition.  The salt is derived from ROW CONTENT (xxhash64 over every
    column), so recomputed map tasks under partial stage retry or
    speculative execution reassign each row to the SAME reduce partition —
    a nondeterministic salt (e.g. monotonically_increasing_id) can
    silently duplicate or drop rows on fetch-failure retry, the hazard
    SPARK-23207 fixed for round-robin but not for user expressions.
    (Identical rows co-locating in one file is acceptable skew: exact
    duplicates are rare post-dedup, and the cap N still bounds files.)"""
    if max_files_per_partition:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(max_files_per_partition)
        )
        df = (
            df.withColumn("__sink_salt", salt)
            .repartition(*partition_cols, F.col("__sink_salt"))
            .drop("__sink_salt")
        )
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


#: date-format pattern per time-partition granularity
_TIME_PART_FMT = {"hour": "yyyy-MM-dd-HH", "day": "yyyy-MM-dd", "month": "yyyy-MM"}


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    granularity: str = "day",
    mode: str = "overwrite",
) -> None:
    """Time-partitioned parquet — the warehouse layout for event streams:
    one directory per hour/day/month bucket of ``ts_col`` (added as a
    derived ``part_<granularity>`` string column; the original timestamp
    column is preserved in the files).  Time-range queries filtering on the
    partition column prune whole directories at plan time, the property
    that makes a 100 TB event table queryable for one day's slice."""
    fmt = _TIME_PART_FMT.get(granularity)
    if fmt is None:
        raise ValueError(f"granularity must be one of {sorted(_TIME_PART_FMT)}, got {granularity!r}")
    part_col = f"part_{granularity}"
    out = df.withColumn(part_col, F.date_format(F.col(ts_col).cast("timestamp"), fmt))
    out.write.mode(mode).partitionBy(part_col).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (and optionally sorted) managed table.  Joins and
    aggregations keyed on ``bucket_col`` between tables sharing the bucket
    spec skip the shuffle exchange entirely."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact (a plain
    ``spark.read.parquet`` of the files would lose the bucket spec and
    reintroduce the shuffle)."""
    return spark.table(table_name)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite", max_files: int = 0) -> None:
    """Newline-delimited JSON export (one object per row)."""
    coalesce_to(df, max_files).write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSONL source.  Always pass an explicit ``schema`` in production —
    schema inference is a full extra pass over the data at 100 TB."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


#: compaction target: match the default reader split size so one output
#: file ≈ one scan task (spark.sql.files.maxPartitionBytes default)
COMPACT_TARGET_BYTES = 128 * 1024 * 1024


def compact_parquet(
    spark: SparkSession, path: str, target_bytes: int = COMPACT_TARGET_BYTES
) -> tuple[int, int]:
    """Rewrite a (non-hive-partitioned) parquet dataset into ~target-sized
    files, in place; returns ``(files_before, files_after)``.

    The small-file problem is the standard failure mode of streaming /
    micro-batch sinks at scale: thousands of KB-sized files thrash
    directory listings and give every reader task almost nothing to do.
    Compaction = read → repartition to ceil(bytes/target) → write beside →
    swap.  ``repartition`` (a real shuffle) rather than ``coalesce``: a
    maintenance pass runs once and SHOULD pay the shuffle to fix skew —
    coalesce merges neighbors and keeps whatever imbalance the input had.

    The swap is a rename pair (old → .pre-compact trash, new → path) — the
    local-filesystem stand-in for a table format's atomic commit; there is
    a reader-visible gap between the renames, so at scale this runs under
    the same maintenance window (or table-format commit) any file-moving
    operation needs.  Hive-partitioned trees are rejected: compacting one
    would need per-directory passes that preserve the partition columns
    dropped from the files themselves.

    FILESYSTEM ASSUMPTION: ``path`` must be visible at the same location
    to the driver (os.walk/rename here) AND every executor (the Spark
    read/write) — i.e. local mode or a shared filesystem mount (NFS,
    FUSE-mounted object store).  On a real cluster the equivalent pass
    lists and commits through the table format / HDFS API instead of
    os.rename; this function is the single-namespace stand-in."""
    import math
    import os
    import shutil
    import uuid

    path = os.path.normpath(path)  # a trailing slash would nest tmp INSIDE
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"compact_parquet: {path!r} does not exist — refusing to report "
            "a missing dataset as already compact"
        )
    files, sizes = [], []
    for root, dirs, names in os.walk(path):
        if any(seg.count("=") for seg in os.path.relpath(root, path).split(os.sep) if seg != "."):
            raise ValueError(
                f"compact_parquet: {path!r} is hive-partitioned; compact each "
                "partition directory individually"
            )
        for n in names:
            if n.endswith(".parquet"):
                f = os.path.join(root, n)
                files.append(f)
                sizes.append(os.path.getsize(f))
    total = sum(sizes)
    n_out = max(1, math.ceil(total / target_bytes))
    # already compact = right COUNT and no oversized file (a count-only
    # gate would skip the 255 MB + 1 MB skew case the rewrite exists for)
    if len(files) <= n_out and (not sizes or max(sizes) <= target_bytes):
        return len(files), len(files)  # no write, no swap
    # mergeSchema: a schema-evolved dataset (older files missing newer
    # columns — the micro-batch-sink norm) must rewrite the UNION schema;
    # the default single-footer read would silently drop columns and the
    # trash removal below would destroy the only copy
    df = spark.read.option("mergeSchema", "true").parquet(path)
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    try:
        df.repartition(n_out).write.mode("errorifexists").parquet(tmp)
        trash = f"{path}.pre-compact-{uuid.uuid4().hex[:8]}"
        os.rename(path, trash)
        try:
            os.rename(tmp, path)
        except BaseException:
            os.rename(trash, path)  # roll the first rename back: the
            raise                   # dataset must never be left missing
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)  # no orphaned partials
        raise
    shutil.rmtree(trash)
    after = sum(
        1
        for root, _, names in os.walk(path)
        for n in names
        if n.endswith(".parquet")
    )
    return len(files), after


# --------------------------------------------------------------------------
# driver-contract maintenance entry
# --------------------------------------------------------------------------
def maintenance_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction as a measured end-to-end roundtrip: fragment
    the documents table into 64 files (the micro-batch-sink failure mode),
    :func:`compact_parquet` them back to ~target-sized files, re-read and
    count.  The returned row cross-checks against the DuckDB oracle:

    - ``n_rows`` — the post-compaction count must equal the table's true
      count (compaction lost or duplicated nothing; this is the real
      correctness claim, verified independently by the oracle);
    - ``files_reduced`` — the engine-side assertion that the rewrite
      actually shrank the file count (64 → ceil(bytes/128 MB)); the
      oracle pins it TRUE, so a silently-skipped compaction fails the
      value hash.

    The staging dataset lives in a per-call DRIVER-LOCAL temp dir —
    correct in local mode / shared-FS only (see the compact_parquet
    filesystem note; a cluster run would stage under a shared URI) — and
    the result row is computed EAGERLY so the dir can be removed before
    returning (the caller's count()/collect() must not depend on scratch
    files).  Bench
    therefore times write + compact + read as one maintenance row
    (VERDICT r5 task 4: make the compaction work driver-visible)."""
    import shutil
    import tempfile

    from dream_spark.sources.tables import load_table

    base = tempfile.mkdtemp(prefix="dream_spark_compact_")
    path = f"{base}/documents"
    try:
        load_table(spark, sf_dir, "documents").repartition(64).write.parquet(path)
        files_before, files_after = compact_parquet(spark, path)
        n_rows = spark.read.parquet(path).count()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        [(n_rows, files_after < files_before)],
        "n_rows long, files_reduced boolean",
    )


MAINTENANCE_COMPACT_SQL = (
    "SELECT COUNT(*) AS n_rows, TRUE AS files_reduced FROM documents"
)


# --------------------------------------------------------------------------
# Z-order clustering maintenance (multi-column data skipping)
# --------------------------------------------------------------------------
#: bits per dimension (codes in [0, 255]; z in [0, 65536))
ZORDER_BITS = 8
#: z-range width of one layout bucket: 65536 / 16 = 16 output buckets
ZORDER_BUCKET_WIDTH = 4096


def _q8_sql(col: str, mn: str, mx: str, duck: bool) -> str:
    """8-bit min/max linear quantization, exact integer arithmetic (same
    formula as similarity.sq8_encode)."""
    d = "//" if duck else "div"
    return f"((({col}) - ({mn})) * 255) {d} GREATEST(({mx}) - ({mn}), 1)"


def _z16_sql(xq: str, yq: str, duck: bool) -> str:
    """Interleave two 8-bit codes into a 16-bit Morton (Z-order) key —
    pure integer arithmetic, identical on both engines (no engine bit-op
    dialect differences)."""
    d = "//" if duck else "div"
    return "(" + " + ".join(
        f"((({xq}) {d} {1 << b}) % 2) * {1 << (2 * b + 1)}"
        f" + ((({yq}) {d} {1 << b}) % 2) * {1 << (2 * b)}"
        for b in range(ZORDER_BITS)
    ) + ")"


def zorder_bucket(df: DataFrame, xcol: str, ycol: str) -> DataFrame:
    """Attach ``zbucket`` (Morton-key range bucket) over two BIGINT
    columns of ANY DataFrame — the layout key for multi-column data
    skipping (Delta/Iceberg ``OPTIMIZE ZORDER BY`` analog).

    A sort on a single column clusters min/max file stats for that column
    only; the Z-order key interleaves the bits of both dimensions so rows
    close in EITHER dimension land in the same bucket, and a reader
    filtering on either (or both) prunes most buckets.  The per-dimension
    8-bit codes come from a global min/max linear quantization — one
    partial-aggregate pass, broadcast back as a one-row codebook (never
    through the driver), then the bucket assignment is map-only.  At
    100 TB this is the once-per-window maintenance shuffle that makes
    every later scan cheap; rank-based (ntile) normalization would balance
    buckets better but costs a global sort — min/max scaling is the
    deterministic, shuffle-free choice."""
    st = df.groupBy().agg(
        F.min(xcol).alias("_mnx"), F.max(xcol).alias("_mxx"),
        F.min(ycol).alias("_mny"), F.max(ycol).alias("_mxy"),
    )
    xq = _q8_sql(xcol, "_mnx", "_mxx", duck=False)
    yq = _q8_sql(ycol, "_mny", "_mxy", duck=False)
    z = _z16_sql(xq, yq, duck=False)
    return (
        df.crossJoin(F.broadcast(st))
        .withColumn("zbucket", F.expr(f"CAST({z} div {ZORDER_BUCKET_WIDTH} AS BIGINT)"))
        .drop("_mnx", "_mxx", "_mny", "_mxy")
    )


def _zprobe_bounds_sql(mn: str, mx: str, duck: bool) -> tuple[str, str]:
    """The fixed probe box in RANGE-RELATIVE integer terms: [min + range/4,
    min + range/2] per dimension — meaningful at every scale factor, exact
    integer on both engines."""
    d = "//" if duck else "div"
    return (
        f"(({mn}) + ((({mx}) - ({mn})) {d} 4))",
        f"(({mn}) + ((({mx}) - ({mn})) {d} 2))",
    )


def maintenance_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout maintenance as a measured end-to-end roundtrip:
    bucket events by the Morton key over (user_id, event time), WRITE the
    table ``partitionBy(zbucket)`` to scratch (the OPTIMIZE ZORDER
    rewrite), re-read, and emit the per-bucket data-skipping index —
    ``(zbucket, n_rows, min/max user, min/max event-time micros)`` — plus
    ``probe_hit``: whether the fixed probe box (middle quarter of each
    dimension's range) overlaps the bucket's stats, i.e. whether a reader
    running that query would scan the bucket at all.  The oracle replays
    the identical integer bucket assignment from the RAW table, so a
    write that lost/duplicated rows or scrambled the assignment fails the
    value hash; the skipping CLAIM is pinned by probe_hit (most buckets
    must be FALSE) and the pruning plan itself by
    tests/test_sinks.py::test_zorder_partition_pruning.  Scratch is a
    per-call driver-local temp dir (same local-mode/shared-FS note as
    compact_parquet); the result is materialized eagerly."""
    import shutil
    import tempfile

    from dream_spark.functions.timeutils import epoch_micros
    from dream_spark.sources.tables import load_table

    base = tempfile.mkdtemp(prefix="dream_spark_zorder_")
    path = f"{base}/events"
    try:
        ev = load_table(spark, sf_dir, "events")
        keyed = ev.select(
            "event_id", "user_id", epoch_micros(ev, "ts").cast("long").alias("tsu")
        )
        # keyed AQE rebalance before the directory-partitioned rewrite
        # (guide §6, same treatment as the vector-index writes): without
        # it every write task opens a file in each zbucket directory it
        # touches — files = tasks × buckets; with it rows cluster by
        # target directory and AQE sizes the output partitions.
        zorder_bucket(keyed, "user_id", "tsu").hint("rebalance", "zbucket").write.partitionBy(
            "zbucket"
        ).parquet(path)
        back = spark.read.parquet(path)
        stats = back.groupBy(F.col("zbucket").cast("long").alias("zbucket")).agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
            F.min("tsu").alias("min_tsu"),
            F.max("tsu").alias("max_tsu"),
        )
        gl = back.groupBy().agg(
            F.min("user_id").alias("_gmnu"), F.max("user_id").alias("_gmxu"),
            F.min("tsu").alias("_gmnt"), F.max("tsu").alias("_gmxt"),
        )
        ulo, uhi = _zprobe_bounds_sql("_gmnu", "_gmxu", duck=False)
        tlo, thi = _zprobe_bounds_sql("_gmnt", "_gmxt", duck=False)
        out = stats.crossJoin(F.broadcast(gl)).select(
            "zbucket", "n_rows", "min_user", "max_user", "min_tsu", "max_tsu",
            F.expr(
                f"max_user >= {ulo} AND min_user <= {uhi}"
                f" AND max_tsu >= {tlo} AND min_tsu <= {thi}"
            ).alias("probe_hit"),
        )
        rows = out.collect()  # eager: the scratch dir dies with this call
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "zbucket long, n_rows long, min_user long, max_user long, "
        "min_tsu long, max_tsu long, probe_hit boolean",
    )


def _zorder_sql() -> str:
    xq = _q8_sql("user_id", "_mnx", "_mxx", duck=True)
    yq = _q8_sql("tsu", "_mny", "_mxy", duck=True)
    z = _z16_sql(xq, yq, duck=True)
    ulo, uhi = _zprobe_bounds_sql("_gmnu", "_gmxu", duck=True)
    tlo, thi = _zprobe_bounds_sql("_gmnt", "_gmxt", duck=True)
    return f"""
WITH keyed AS (
  SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events
),
st AS (
  SELECT MIN(user_id) AS _mnx, MAX(user_id) AS _mxx,
         MIN(tsu) AS _mny, MAX(tsu) AS _mxy
  FROM keyed
),
b AS (
  SELECT event_id, user_id, tsu,
         CAST({z} // {ZORDER_BUCKET_WIDTH} AS BIGINT) AS zbucket
  FROM keyed CROSS JOIN st
),
stats AS (
  SELECT zbucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(user_id) AS min_user, MAX(user_id) AS max_user,
         MIN(tsu) AS min_tsu, MAX(tsu) AS max_tsu
  FROM b GROUP BY zbucket
),
gl AS (
  SELECT MIN(user_id) AS _gmnu, MAX(user_id) AS _gmxu,
         MIN(tsu) AS _gmnt, MAX(tsu) AS _gmxt
  FROM b
)
SELECT zbucket, n_rows, min_user, max_user, min_tsu, max_tsu,
       (max_user >= {ulo} AND min_user <= {uhi}
        AND max_tsu >= {tlo} AND min_tsu <= {thi}) AS probe_hit
FROM stats CROSS JOIN gl
""".strip()


MAINTENANCE_ZORDER_SQL = _zorder_sql()

QUERIES = {
    "maintenance_compact": maintenance_compact,
    "maintenance_zorder": maintenance_zorder,
}
ORACLES = {
    "maintenance_compact": MAINTENANCE_COMPACT_SQL,
    "maintenance_zorder": MAINTENANCE_ZORDER_SQL,
}

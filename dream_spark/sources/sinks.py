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

QUERIES = {"maintenance_compact": maintenance_compact}
ORACLES = {"maintenance_compact": MAINTENANCE_COMPACT_SQL}

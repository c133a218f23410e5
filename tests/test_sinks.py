"""Sinks: partition pruning, bucketed shuffle-free joins, JSONL round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dream_spark.sources import sinks
from dream_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_partitioned_write_prunes(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part") / "docs")
    sinks.write_partitioned(docs, out, ["lang"])
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # filtering on the partition column must reach the scan as a partition
    # filter (pruned directories), not a post-scan filter
    plan = back.where(F.col("lang") == "en")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
    en_spark = back.where(F.col("lang") == "en").count()
    assert en_spark == docs.where(F.col("lang") == "en").count()


def test_bucketed_join_has_no_shuffle(spark, docs, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    a = docs.select("doc_id", "lang")
    b = docs.select("doc_id", "n_chars")
    sinks.write_bucketed(a, "t_bucket_a", "doc_id", 4)
    sinks.write_bucketed(b, "t_bucket_b", "doc_id", 4)
    try:
        ta = sinks.read_bucketed(spark, "t_bucket_a")
        tb = sinks.read_bucketed(spark, "t_bucket_b")
        joined = ta.join(tb, on="doc_id")
        assert joined.count() == docs.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed equi-join: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_jsonl_roundtrip(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("jsonl") / "docs")
    sinks.write_jsonl(docs.select("doc_id", "lang", "text"), out, max_files=2)
    back = sinks.read_jsonl(spark, out, schema="doc_id long, lang string, text string")
    assert back.count() == docs.count()
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.select("doc_id", "lang", "text").collect())
    )


def test_time_partitioned_write_prunes_at_plan_time(spark, tmp_path):
    """Day-partitioned events: a filter on the partition column must reach
    the scan as a PartitionFilter (directory pruning), and the data reads
    back whole."""
    from pyspark.sql import functions as F

    from dream_spark.sources.sinks import write_time_partitioned
    from dream_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(ev, path, ts_col="ts", granularity="day")
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    one_day = back.select("part_day").distinct().limit(1).collect()[0][0]
    q = back.where(F.col("part_day") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part_day" in plan.split("PartitionFilters")[1][:120]
    want = ev.where(F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd") == one_day).count()
    assert q.count() == want


def test_compact_parquet_reduces_files_preserves_rows(spark, docs, tmp_path_factory):
    """Many tiny files → few target-sized files with the exact same rows;
    an already-compact dataset is left untouched (no write, no swap)."""
    import os

    from dream_spark.sources.sinks import compact_parquet

    path = str(tmp_path_factory.mktemp("compact") / "d")
    docs.repartition(24).write.parquet(path)
    before_rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    nb, na = compact_parquet(spark, path, target_bytes=1 << 40)  # everything fits one file
    assert nb == 24 and na == 1
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before_rows
    # idempotent second pass: already compact
    nb2, na2 = compact_parquet(spark, path, target_bytes=1 << 40)
    assert (nb2, na2) == (1, 1)
    # hive-partitioned trees are rejected
    ppath = str(tmp_path_factory.mktemp("compactp") / "p")
    docs.write.partitionBy("lang").parquet(ppath)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compact_parquet(spark, ppath)


def test_compact_parquet_guards_and_skew_gate(spark, docs, tmp_path_factory):
    """Missing paths raise (a typo'd maintenance job must not report
    success), trailing slashes are normalized, and an oversized file is
    compacted even when the file COUNT already matches the target."""
    import os

    import pytest as _pytest

    from dream_spark.sources.sinks import compact_parquet

    with _pytest.raises(FileNotFoundError):
        compact_parquet(spark, str(tmp_path_factory.mktemp("nope") / "missing"))

    path = str(tmp_path_factory.mktemp("slash") / "d")
    docs.repartition(6).write.parquet(path)
    nb, na = compact_parquet(spark, path + "/", target_bytes=1 << 40)
    assert nb == 6 and na == 1 and os.path.isdir(path)

    # skew gate: two files, one far over target → still rewritten even
    # though ceil(total/target) == 2 == file count
    p2 = str(tmp_path_factory.mktemp("skew") / "d")
    docs.limit(1).coalesce(1).write.parquet(p2)
    docs.coalesce(1).write.mode("append").parquet(p2)
    sizes = sorted(
        os.path.getsize(os.path.join(p2, n))
        for n in os.listdir(p2) if n.endswith(".parquet")
    )
    target = sizes[0] + 10  # small file fits; big file is oversized
    before_rows = sorted(map(tuple, spark.read.parquet(p2).collect()))
    nb2, na2 = compact_parquet(spark, p2, target_bytes=target)
    # a skipped rewrite would return (2, 2): the rewrite splits the big
    # file, so the output count must EXCEED the input count and the
    # largest output file must shrink below the old maximum
    assert nb2 == 2 and na2 > 2
    new_max = max(
        os.path.getsize(os.path.join(p2, n))
        for n in os.listdir(p2) if n.endswith(".parquet")
    )
    assert new_max < sizes[-1]
    assert sorted(map(tuple, spark.read.parquet(p2).collect())) == before_rows


def test_zorder_partition_pruning_and_skipping(spark, tmp_path):
    """The z-ordered layout must (a) partition-prune a zbucket filter at
    plan time, (b) cluster both dimensions (most buckets miss the probe
    box), (c) preserve every row through the write roundtrip."""
    from dream_spark.functions.timeutils import epoch_micros

    ev = load_table(spark, SF_DIR, "events")
    keyed = ev.select(
        "event_id", "user_id", epoch_micros(ev, "ts").cast("long").alias("tsu")
    )
    path = str(tmp_path / "zorder")
    sinks.zorder_bucket(keyed, "user_id", "tsu").write.partitionBy("zbucket").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == keyed.count()

    pruned = back.where(F.col("zbucket") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "zbucket" in plan
    n_buckets = back.select("zbucket").distinct().count()
    assert 1 < n_buckets <= 16
    # the pruned scan must read strictly fewer partition dirs than exist
    assert pruned.count() < back.count()

    # skipping effectiveness: the fixed probe box hits a minority of buckets
    out = sinks.maintenance_zorder(spark, SF_DIR).collect()
    hits = sum(1 for r in out if r["probe_hit"])
    assert 0 < hits < len(out) / 2, (hits, len(out))

"""Triple-store physical layout: predicate-partitioned parquet roundtrip
and partition pruning — the §1/§M6 scale layout, evidenced in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from dream_spark.plans.sparql import parse_sparql
from dream_spark.plans.translator import translate
from dream_spark.sources.triples import TripleStore
from tests.conftest import SF_DIR


def test_partitioned_roundtrip_and_pruning(spark, engine, tmp_path):
    tdir, ddir = str(tmp_path / "triples"), str(tmp_path / "dict")
    engine.store.write_parquet(tdir, ddir)
    st = TripleStore.from_parquet(spark, tdir, ddir)

    assert st.triples.count() == engine.store.triples.count()

    # constant-predicate pattern must prune to the one p= directory
    q = parse_sparql("select ?O ?C where { ?O placedBy ?C }")
    plan = (
        translate(st, q, None)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "p#" in plan

    # and produce the same rows as the in-memory derivation
    a = sorted(map(tuple, translate(st, q, None).collect()))
    b = sorted(map(tuple, engine.sparql("select ?O ?C where { ?O placedBy ?C }").collect()))
    assert a == b


def test_partition_count_is_predicate_count(spark, engine, tmp_path):
    tdir, ddir = str(tmp_path / "t2"), str(tmp_path / "d2")
    engine.store.write_parquet(tdir, ddir)
    st = TripleStore.from_parquet(spark, tdir, ddir)
    n_preds = st.triples.select("p").distinct().count()
    import os

    dirs = [d for d in os.listdir(tdir) if d.startswith("p=")]
    assert len(dirs) == n_preds


def test_bucketed_store_star_join_is_shuffle_free(spark, engine, tmp_path):
    """SCALE §6.1: the subject-bucketed layout runs a BGP star query's
    subject joins with ZERO hash-partitioning exchanges (bucket-aligned
    SortMergeJoin), and returns the same rows as the derived store.
    Auto-broadcast is disabled so the shuffle-free claim is the bucketing,
    not a broadcast."""
    tdir, ddir = str(tmp_path / "bt"), str(tmp_path / "bd")
    spark.sql("DROP TABLE IF EXISTS triples_bucketed_test")
    spark.sql("DROP TABLE IF EXISTS triples_bucketed_test_dict")
    engine.store.write_bucketed("triples_bucketed_test", tdir, ddir, n_buckets=8)
    st = TripleStore.from_table(spark, "triples_bucketed_test")

    q = parse_sparql(
        "select ?O ?ST ?PR where { ?O type Order . ?O status ?ST . ?O priority ?PR }"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        df = translate(st, q, None)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 0, plan
        assert "SortMergeJoin" in plan
        a = sorted(map(tuple, df.collect()))

        # §6.4: decode must never hash-shuffle the DICTIONARY, in either
        # regime of the size-gated decode broadcast (r10):
        #  - under the gate (a local-scale dict) the dict side is an
        #    explicit broadcast hint — no __id exchange at all;
        #  - past the gate (a 100-TB dict; forced here via maxRows=0) the
        #    bucketed layout serves the join — the only __id exchange is
        #    the (small) melted result side aligning to the dict's buckets.
        from dream_spark.functions.joins import BROADCAST_MAX_ROWS_CONF

        dfd = translate(st, q, None, decode=True)
        pland = dfd._jdf.queryExecution().executedPlan().toString()
        assert pland.count("Exchange hashpartitioning(__id") == 0, pland
        assert "BroadcastExchange" in pland, pland
        # capture-and-restore (not unset): a pre-existing session-level
        # gate value must survive this test (ADVICE r10 #3)
        prev_max_rows = spark.conf.get(BROADCAST_MAX_ROWS_CONF, None)
        spark.conf.set(BROADCAST_MAX_ROWS_CONF, "0")
        try:
            dfd = translate(st, q, None, decode=True)
            pland = dfd._jdf.queryExecution().executedPlan().toString()
            assert pland.count("Exchange hashpartitioning(__id") == 1, pland
            assert "BroadcastExchange" not in pland, pland
            n_decoded = dfd.count()
        finally:
            if prev_max_rows is None:
                spark.conf.unset(BROADCAST_MAX_ROWS_CONF)
            else:
                spark.conf.set(BROADCAST_MAX_ROWS_CONF, prev_max_rows)
    finally:
        from dream_spark.session import AUTO_BCAST_THRESHOLD

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", AUTO_BCAST_THRESHOLD)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    b = sorted(
        map(
            tuple,
            engine.sparql(
                "select ?O ?ST ?PR where { ?O type Order . ?O status ?ST . ?O priority ?PR }"
            ).collect(),
        )
    )
    assert a == b
    assert n_decoded == len(b)
    spark.sql("DROP TABLE IF EXISTS triples_bucketed_test")
    spark.sql("DROP TABLE IF EXISTS triples_bucketed_test_dict")

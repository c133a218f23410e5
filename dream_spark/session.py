"""SparkSession factory with scale-oriented defaults.

The reference engine's distribution knobs (NUM_WORKERS, network-speed probe,
vertex merging — QueryPlanner.h:8, Optimizer.cpp:20-60/464-566) all collapse
into Spark conf here: AQE replaces the adaptive planner's runtime re-costing,
shuffle partitions replace the worker count, and broadcast thresholds replace
the replicate-everything strategy.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: session default for spark.sql.autoBroadcastJoinThreshold (bytes, as str) —
#: also what tests restore after temporarily flipping the conf
AUTO_BCAST_THRESHOLD = os.environ.get("SPARK_GRAFT_AUTOBCAST", str(4 * 1024 * 1024))


def get_spark(app_name: str = "dream_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    Local test default is ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
    master comes from spark-submit and these confs still apply.  Every conf
    below is chosen for 100 TB posture, not just local runs:

    - AQE on: runtime re-planning (coalesce, skew-join split, empty-relation
      propagation) — subsumes the reference's execute-to-estimate planner
      (PlanCostEstimator.cpp:585-655) and its empty short-circuit
      (Proxy.c:71-85).
    - CBO + histogram stats on: join reordering for the multi-way self-joins
      that SPARQL BGPs compile to.
    - Arrow on: every Python-side operator uses vectorized pandas UDFs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(int(cpus) if cpus.isdigit() else 32, 8)))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")
        # Catalyst's CostBasedJoinReorder is OFF, deliberately: the SPARQL
        # translator already orders BGP joins with a Selinger DP over
        # per-predicate triple stats (plans/translator.py), which beats
        # generic CBO on one-table self-joins — and CostBasedJoinReorder
        # treats ANY cross-relation predicate as a joinable edge, so a
        # non-equi residual (multi-variable VALUES struct-IN, UNDEF
        # disjunction, two-variable arithmetic FILTER) can get picked as
        # the only "join condition" of a reordered pair, degrading an
        # equi-join star to a CartesianProduct.  Observed: once the cached
        # triples relation has rowCount stats, the reorderer paired the
        # ?O status / ?O priority scans of sparql_values_undef on the
        # struct-IN alone — a 150k x 150k cartesian (one straggler task
        # writing GBs of shuffle).  cbo.enabled stays ON: stats still
        # drive join *selection* (broadcast thresholds), just not order.
        .config("spark.sql.cbo.joinReorder.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 4 MB, down from the build rounds' 32 MB (overridable via
        # SPARK_GRAFT_AUTOBCAST).  Broadcast builds are driver-serial:
        # collect + serialize + ship per join.  Measured on the open
        # triple store (r10, guide §3.1): a 5-way self-join over
        # 600k-row predicate sets runs 3.4 s with those sides broadcast
        # vs 0.7-0.9 s as shuffle joins, while genuinely small sides
        # (dimension tables, ≤~150k-row edge sets) still fit under 4 MB
        # and keep their broadcast plans.  This threshold also caps
        # AQE's runtime SMJ→BHJ conversion, which otherwise re-adds the
        # slow broadcast from accurate cached-relation sizes.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_AUTOBCAST", str(4 * 1024 * 1024)),
        )
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        # Legacy-robustness: older driver testdata used nanosecond parquet
        # timestamps, which Spark 4 rejects unless read as longs (repaired in
        # register_tables).  Harmless no-op on micro-precision data.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def release_local_checkpoint(df) -> None:
    """Immediately free the storage blocks behind a SUPERSEDED
    ``localCheckpoint`` frame.

    A checkpointed DataFrame's rows live in RDD block storage, not the
    relation cache, so ``DataFrame.unpersist()`` never touches them and
    the blocks otherwise linger until the driver garbage-collects the
    plan and the ContextCleaner notices — measured (SCALE.md §7 r9
    order-reversal experiment) as a 1.5-2x memory-contention tax on the
    NEXT iterative job in the same session at the 100x decade.  The
    iterative loops (pagerank supersteps, min-label CC rounds, path-
    closure rounds) call this on each round's frame as soon as the next
    checkpoint has MATERIALIZED.

    The caller must guarantee the frame is never read again: a local
    checkpoint's lineage is truncated, so Spark fails a post-release read
    loudly (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND) instead of silently
    recomputing — the right failure mode for a hygiene helper (a
    use-after-release is a bug, not a performance regression).
    Best-effort by design: plan shapes or backends without the
    LogicalRDD handle (e.g. Connect) degrade to the old GC-eventually
    behavior, never to an error.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass

"""Graph analytics over the triple store: integer-quantized PageRank.

The reference is a graph *store* with no analytics (SURVEY.md §2.3); the
north-star approach note names GraphX-style processing as the Spark
mapping.  Rather than GraphX's RDD API (row-at-a-time, no Catalyst), the
operators here are DataFrame iterations — the same dataflow Pregel runs,
expressed as join + groupBy per superstep, so AQE/codegen apply.

Determinism contract: classic PageRank sums floats, and distributed float
summation is partition-order dependent — unacceptable under the oracle
gate.  Ranks here are int64 micro-units (RANK_SCALE per unit mass):
every superstep moves ``contrib = rank · D_NUM div (D_DEN · outdeg)``
(truncating integer division, identical on both engines) and adds the
teleport term ``RANK_SCALE · (D_DEN − D_NUM) div D_DEN``.  Integer sums
are associative-commutative — bit-identical under ANY partitioning — and
the quantization error (< outdeg ULPs per step) is deterministic too.

Scale notes: each superstep shuffles (dst, contrib) pairs — partially
aggregated map-side, so the shuffle carries ≤ #distinct-dst rows per
partition; ranks and degrees are joined on the node id.  O(iters) rounds;
lineage is truncated per round via localCheckpoint in the library loop
(same pattern as connected_components' distributed path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dream_spark.sources.triples import TRIPLES_SQL

#: rank mass per node, in integer micro-units
RANK_SCALE = 1_000_000
#: damping factor 0.85 as an exact integer fraction
D_NUM, D_DEN = 85, 100
PAGERANK_ITERS = 2

#: entity→entity predicates of the TPC-H triple derivation (constants are
#: class/status objects — excluded so rank flows only between entities)
_ENTITY_PREDS = ("placedBy", "inNation", "inRegion", "suppliedBy", "ofOrder", "ofPart")


def degree_base(e: DataFrame) -> DataFrame:
    """(node, outdeg) for a normalized (src, dst) edge frame: the node set
    and the out-degree from ONE shuffle (a 0/1-weighted union-aggregate
    instead of distinct + groupBy)."""
    return (
        e.select(F.col("src").alias("node"), F.lit(1).alias("od"))
        .unionAll(e.select(F.col("dst").alias("node"), F.lit(0).alias("od")))
        .groupBy("node")
        .agg(F.sum("od").alias("outdeg"))
    )


def pagerank(
    edges: DataFrame | None,
    iters: int = PAGERANK_ITERS,
    src: str = "src",
    dst: str = "dst",
    seed_sql: str | None = None,
    prepared: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Integer-quantized PageRank for ANY directed edge DataFrame:
    (node, rank) after ``iters`` supersteps, rank in micro-units.

    ``seed_sql`` switches to PERSONALIZED PageRank: a SQL predicate over
    ``node`` defining the seed set — initial mass and the per-step
    teleport land only on seeds, so rank measures proximity to the seed
    set instead of global centrality.  The predicate string is shared
    verbatim with the oracle, keeping the personalization deterministic
    cross-engine.

    Dangling nodes (no out-edges) keep their teleport share; their
    non-teleport mass is dropped, the standard simplification (both
    engines drop it identically).

    ``prepared`` supplies an already-persisted ``(edges, degree_base)``
    pair (``shared_entity_graph`` for the standard store) — the caller
    then owns those caches; global and personalized runs over the same
    graph skip rebuilding the edge/degree artifacts."""
    # Right-size shuffle partitions for the iterative joins: under a
    # default session (200 partitions) every shuffle write opens 200
    # compressed bucket streams per concurrent task — an iterative op on a
    # small-heap local session OOMs on writer buffers alone.  Runtime-
    # settable conf, same contract as the table loader's nanos conf; AQE
    # still coalesces the read side.
    spark = (edges if edges is not None else prepared[0]).sparkSession
    restore_partitions = None
    try:
        par = spark.sparkContext.defaultParallelism
        current = spark.conf.get("spark.sql.shuffle.partitions")
        if int(current) > 4 * par:
            restore_partitions = current
            spark.conf.set("spark.sql.shuffle.partitions", str(2 * par))
    except Exception:
        pass  # locked confs (e.g. Connect): proceed with the session's value
    try:
        # NOTE: fusing outdeg into a wide EDGE table measured ~1.6× slower (it
        # caches a wider row per edge for no join saved).  Fusing it into the
        # RANK table is different and wins twice: the node set and the out-degree
        # come from ONE shuffle (degree_base's 0/1-weighted union-aggregate),
        # and each superstep runs one edge join instead of two (rank and
        # outdeg travel together, keyed identically).
        own = prepared is None
        if own:
            e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
            deg_base_df = degree_base(e).persist()
            deg_base_df.count()  # one evaluation fills BOTH caches (reads through e)
        else:
            e, deg_base_df = prepared
        ind = (
            F.expr(f"CASE WHEN {seed_sql} THEN 1 ELSE 0 END")
            if seed_sql is not None
            else F.lit(1)
        )
        # keep the PERSISTED frame in its own name: unpersist at the end
        # must target the cached plan, not this derived projection
        deg = deg_base_df.withColumn("ind", ind)
        ranks = deg.withColumn("rank", (F.lit(RANK_SCALE) * F.col("ind")).cast("long"))
        teleport = RANK_SCALE * (D_DEN - D_NUM) // D_DEN
        for it in range(iters):
            contribs = (
                e.join(ranks, e.src == ranks.node)
                .select(
                    F.col("dst").alias("node"),
                    F.expr(f"(rank * {D_NUM}) div ({D_DEN} * outdeg)").alias("contrib"),
                )
                .groupBy("node")
                .agg(F.sum("contrib").alias("inflow"))
            )
            ranks = deg.join(contribs, on="node", how="left").select(
                "node",
                "outdeg",
                (F.lit(teleport) * F.col("ind") + F.coalesce(F.col("inflow"), F.lit(0))).alias("rank"),
            )
            # truncate lineage only every few supersteps: each localCheckpoint
            # materializes the full rank table, which costs more than carrying
            # a few rounds of shallow lineage (the plan doubles per round, so
            # unbounded iteration still needs the cut)
            if (it + 1) % 4 == 0 and it + 1 < iters:
                ranks = ranks.localCheckpoint()
        # materialize BEFORE dropping the caches: the returned frame must not
        # re-derive the edge union after e/deg are unpersisted (the lazy-return
        # variant silently recomputed everything at evaluation time)
        out = ranks.select("node", "rank").localCheckpoint()
        if own:
            e.unpersist()
            deg_base_df.unpersist()
        return out
    finally:
        # the result is localCheckpoint-materialized above, so restoring
        # the caller's shuffle-partition conf cannot change this plan —
        # only stop the override leaking into unrelated later queries
        if restore_partitions is not None:
            try:
                spark.conf.set("spark.sql.shuffle.partitions", restore_partitions)
            except Exception:
                pass


def _entity_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pull the triple view from the session's SHARED store (cached at first
    # engine/graph use) instead of re-deriving the 7-table union per call —
    # the open-store model the reference runs (Main.c:122).
    from dream_spark.sources.triples import TripleStore, resolve_lexical

    t = TripleStore.shared(spark, sf_dir).triples
    pids = [resolve_lexical(p) for p in _ENTITY_PREDS]
    pids = [p for p in pids if p is not None]
    return t.where(F.col("p").isin(pids)).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )


#: (session id, sf_dir) -> persisted entity edge / degree-base frames
_EDGES_MEMO: dict = {}
_DEG_MEMO: dict = {}


def shared_entity_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The session's persisted (edges, degree_base) pair for the standard
    entity graph — the load-the-graph-once artifact both the global and
    the personalized PageRank wrappers iterate over (same open-artifact
    economics as ``TripleStore.shared`` / ``shared_quantized``; a
    deployment persists both tables)."""
    from dream_spark.operators.dedup import _shared_artifact

    key = (id(spark), sf_dir)
    e = _shared_artifact(_EDGES_MEMO, key, lambda: _entity_edges(spark, sf_dir))
    deg = _shared_artifact(_DEG_MEMO, key, lambda: degree_base(e))
    return e, deg


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: PageRank over the entity edges of the
    triple graph, top 100 nodes by (rank DESC, node) for a bounded result."""
    pr = pagerank(None, prepared=shared_entity_graph(spark, sf_dir))
    return pr.orderBy(F.col("rank").desc(), F.col("node")).limit(100)


def _pagerank_sql(seed_sql: str | None = None) -> str:
    from dream_spark.sources.triples import resolve_lexical

    pids = ", ".join(
        str(resolve_lexical(p)) for p in _ENTITY_PREDS if resolve_lexical(p) is not None
    )
    teleport = RANK_SCALE * (D_DEN - D_NUM) // D_DEN
    ind = f"(CASE WHEN {seed_sql} THEN 1 ELSE 0 END)" if seed_sql is not None else "1"
    parts = [
        f"e AS (SELECT s AS src, o AS dst FROM triples WHERE p IN ({pids}))",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e))",
        "outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        f"r0 AS (SELECT node, CAST({RANK_SCALE} * {ind} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        parts.append(
            f"""c{i} AS (
  SELECT e.dst AS cnode, SUM((r.rank * {D_NUM}) // ({D_DEN} * d.outdeg)) AS inflow
  FROM e JOIN r{i - 1} r ON r.node = e.src JOIN outdeg d ON d.src = e.src
  GROUP BY e.dst
)"""
        )
        # c{i} exposes `cnode`, so `node` below unambiguously means n.node —
        # the seed predicate text is embedded VERBATIM (no string rewriting,
        # which would corrupt predicates containing 'node' as a substring)
        parts.append(
            f"""r{i} AS (
  SELECT n.node, CAST({teleport} * {ind} + COALESCE(c.inflow, 0) AS BIGINT) AS rank
  FROM nodes n LEFT JOIN c{i} c ON c.cnode = n.node
)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH triples AS ({TRIPLES_SQL}),
{body}
SELECT node, rank FROM r{PAGERANK_ITERS}
ORDER BY rank DESC, node LIMIT 100
""".strip()


GRAPH_PAGERANK_SQL = _pagerank_sql()

#: personalized-PageRank seed set: the supplier entities (shared predicate
#: text — Spark evaluates it via F.expr, the oracle embeds it verbatim)
from dream_spark.sources.triples import BASE_CUSTOMER as _BC, BASE_SUPPLIER as _BS

PPR_SEED_SQL = f"(node >= {_BS} AND node < {_BC})"


def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: personalized PageRank seeded at the
    supplier entities — rank measures proximity to suppliers in the
    entity graph; top 100 by (rank DESC, node)."""
    pr = pagerank(None, seed_sql=PPR_SEED_SQL, prepared=shared_entity_graph(spark, sf_dir))
    return pr.orderBy(F.col("rank").desc(), F.col("node")).limit(100)


GRAPH_PPR_SQL = _pagerank_sql(PPR_SEED_SQL)


def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-degree DISTRIBUTION of the entity graph — the first diagnostic
    run on any new graph (skew detection: a heavy-tailed histogram says
    which joins need salting before PageRank-style iteration is attempted).
    Reuses the session's persisted ``degree_base`` artifact, so after any
    rank query this is one small aggregate over #nodes rows; the histogram
    itself is two partial-aggregated shuffles whose keys (node, then
    outdeg) are both bounded by the node count — never edge-sized."""
    _, deg = shared_entity_graph(spark, sf_dir)
    return (
        deg.groupBy(F.col("outdeg").cast("bigint").alias("outdeg"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def _degree_sql() -> str:
    from dream_spark.sources.triples import resolve_lexical

    pids = ", ".join(
        str(resolve_lexical(p)) for p in _ENTITY_PREDS if resolve_lexical(p) is not None
    )
    return f"""
WITH triples AS ({TRIPLES_SQL}),
e AS (SELECT s AS src, o AS dst FROM triples WHERE p IN ({pids})),
deg AS (
  SELECT node, CAST(SUM(od) AS BIGINT) AS outdeg FROM (
    SELECT src AS node, 1 AS od FROM e
    UNION ALL SELECT dst AS node, 0 AS od FROM e
  ) GROUP BY node
)
SELECT outdeg, COUNT(*) AS n_nodes FROM deg GROUP BY outdeg
""".strip()


GRAPH_DEGREE_SQL = _degree_sql()

QUERIES = {
    "graph_pagerank": graph_pagerank,
    "graph_ppr": graph_ppr,
    "graph_degree": graph_degree,
}
ORACLES = {
    "graph_pagerank": GRAPH_PAGERANK_SQL,
    "graph_ppr": GRAPH_PPR_SQL,
    "graph_degree": GRAPH_DEGREE_SQL,
}

"""Graph analytics (PageRank / personalized PageRank) vs DuckDB oracle +
semantic invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dream_spark.operators import graph as G
from tests.conftest import SF_DIR, assert_oracle_match


# graph_components gained a hash oracle in r10 (unrolled min-label +
# pointer-jump rounds, _components_sql) after nine rounds rows-only; the
# A/B union-find test below stays as the Spark-side independent pin, and
# the two template tests after it pin the oracle machinery itself
@pytest.mark.parametrize("name", sorted(G.ORACLES))
def test_graph_oracle(spark, duck, name):
    assert_oracle_match(G.QUERIES[name](spark, SF_DIR), duck, G.ORACLES[name])


def _minlabel_on_edges(duck, edge_rows, rounds):
    """Run the SHIPPED min-label oracle tail over a VALUES-built edge set."""
    values = ", ".join(f"({a}, {b})" for a, b in edge_rows)
    sql = (
        f"WITH e0 AS MATERIALIZED (SELECT * FROM (VALUES {values}) v(a, b)),\n"
        + G._minlabel_histogram_sql(rounds)
    )
    return sorted(duck.execute(sql).fetchall())


def test_components_oracle_template_adversarial_graphs(duck):
    """The oracle's 12 unrolled rounds converge graphs far nastier than
    the near-clique it ships against: a 3000-node path (diameter 2999 —
    pointer jumping is what makes 12 rounds enough), plus a disjoint
    1000-node cycle and an isolated pair, interleaved node ids."""
    edges = [(i * 3 + 1, (i + 1) * 3 + 1) for i in range(2999)]  # path
    edges += [(900000 + i, 900000 + (i + 1) % 1000) for i in range(1000)]  # cycle
    edges += [(5, 2000000)]  # pair
    out = _minlabel_on_edges(duck, edges, rounds=12)
    assert out == [(2, 1), (1000, 1), (3000, 1)] or out == sorted(
        [(3000, 1), (1000, 1), (2, 1)]
    )


def test_components_oracle_guard_fails_visibly_when_unconverged(duck):
    """The honesty property the docstring promises: with too few rounds
    the fixed-point guard EMPTIES the result (driver rows-mismatch), it
    never returns a plausible-but-wrong histogram."""
    edges = [(i, i + 1) for i in range(200)]  # 201-node path
    assert _minlabel_on_edges(duck, edges, rounds=1) == []


def test_pagerank_mass_positive_and_bounded(spark):
    pr = G.pagerank(G._entity_edges(spark, SF_DIR))
    stats = pr.agg(
        F.min("rank").alias("lo"), F.max("rank").alias("hi"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert stats["lo"] >= G.RANK_SCALE * (G.D_DEN - G.D_NUM) // G.D_DEN
    assert stats["hi"] < G.RANK_SCALE * stats["n"]  # no node exceeds total mass


def test_ppr_concentrates_on_seed_neighborhood(spark):
    """Personalized teleport: every node with positive rank is a seed or
    receives inflow; nodes disconnected from the seed set rank 0 — unlike
    global PageRank where every node keeps its teleport share."""
    ppr = G.pagerank(G._entity_edges(spark, SF_DIR), seed_sql=G.PPR_SEED_SQL)
    zero = ppr.where(F.col("rank") == 0)
    seeds_zero = zero.where(F.expr(G.PPR_SEED_SQL)).count()
    assert seeds_zero == 0  # seeds always keep their teleport share
    assert zero.count() > 0  # far-from-seed nodes really get zero mass


def test_degree_histogram_mass(spark):
    """The histogram's masses reconcile with the graph itself: Σ n_nodes =
    |nodes| and Σ outdeg·n_nodes = |edges| (no rows lost or double-counted
    anywhere in the two aggregations)."""
    e, _ = G.shared_entity_graph(spark, SF_DIR)
    n_edges = e.count()
    n_nodes = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    rows = G.graph_degree(spark, SF_DIR).collect()
    assert sum(r["n_nodes"] for r in rows) == n_nodes
    assert sum(r["outdeg"] * r["n_nodes"] for r in rows) == n_edges


def test_triangles_match_naive_enumeration(spark):
    """Algorithmic cross-validation INSIDE Spark (independent of the
    DuckDB oracle): the compact-forward degree-ordered count equals the
    naive a<b<c three-way edge self-join, and the census totals reconcile
    with the edge frame itself."""
    e = G.copurchase_edges(spark, SF_DIR)
    res = G.graph_triangles(spark, SF_DIR).collect()[0]
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    naive = e1.join(e2, "y").join(e3, ["x", "z"]).count()
    assert res["n_triangles"] == naive
    assert res["n_edges"] == e.count()
    assert 3 * res["n_triangles"] <= res["n_wedges"]  # closed ≤ all wedges


def test_warm_graph_artifacts_fills_every_memo(spark):
    """Bench setup's warm pass must leave all five shared artifacts (entity
    edges + degrees, co-purchase edges + degrees + adjacency) session-cached
    so no query row pays a first-touch build (VERDICT r5 task 5)."""
    G.warm_graph_artifacts(spark, SF_DIR)
    key = (id(spark), SF_DIR)
    for memo in (G._EDGES_MEMO, G._DEG_MEMO, G._COP_EDGES_MEMO,
                 G._COP_DEG_MEMO, G._COP_ADJ_MEMO):
        assert key in memo
    # the triangle census on a warmed session runs off the cached adjacency
    assert G.graph_triangles(spark, SF_DIR).count() == 1


def test_components_distributed_matches_unionfind(spark):
    """A/B pin for graph_components' scale path: the DISTRIBUTED min-label
    propagation must produce EXACTLY the driver union-find labels on the
    same random edges (two independent implementations, both defining a
    component's label as its min node id), and the fixed point must hold —
    no edge joins two different labels.  This is the oracle-equivalent for
    the rows-only entry (dense-graph CC closure is not DuckDB-tractable)."""
    import random

    from dream_spark.operators.dedup import connected_components

    rng = random.Random(41)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    dist = {
        r["node"]: r["cluster"]
        for r in connected_components(df, small_edges=0).collect()
    }
    driver = {
        r["node"]: r["cluster"]
        for r in connected_components(df, small_edges=10**9).collect()
    }
    assert dist == driver
    for a, b in edges:
        assert dist[a] == dist[b]


def test_graph_components_histogram_reconciles(spark):
    """The co-purchase component-size histogram must account for every
    node of the edge-induced subgraph exactly once."""
    e = G.copurchase_edges(spark, SF_DIR)
    n_nodes = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .distinct()
        .count()
    )
    hist = G.graph_components(spark, SF_DIR).collect()
    assert sum(r["component_size"] * r["n_components"] for r in hist) == n_nodes


def test_components_forest_matches_geography(spark):
    """The forest CC entry's components must be exactly the regions: one
    component per region, each sized 1 (region) + its nations + their
    customers and suppliers — cross-checked against plain relational
    counts over the same tables (independent of both the triple encoding
    and the CC loop)."""
    from dream_spark.sources.tables import load_table

    nation = load_table(spark, SF_DIR, "nation")
    per_region = {
        r["n_regionkey"]: r["cnt"]
        for r in nation.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    cust = {
        r["n_regionkey"]: r["cnt"]
        for r in load_table(spark, SF_DIR, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    supp = {
        r["n_regionkey"]: r["cnt"]
        for r in load_table(spark, SF_DIR, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    expected = sorted(
        1 + per_region[k] + cust.get(k, 0) + supp.get(k, 0) for k in per_region
    )
    got = sorted(r["component_size"] for r in G.graph_components_forest(spark, SF_DIR).collect())
    assert got == expected


def test_pagerank_releases_superseded_checkpoints(spark):
    """r9 VERDICT task 2: superseded localCheckpoint blocks must be freed
    the moment the next checkpoint materializes, not at driver GC — the
    resident blocks taxed the NEXT same-session iterative job 1.5-2x at
    the 100x decade (order-reversal experiment, SCALE.md §7).  Local
    checkpoints live in RDD block storage (sc.getPersistentRDDs), not the
    relation cache, so their count is a direct residency metric: a
    9-superstep run checkpoints at rounds 4 and 8 plus the final result —
    at most ONE checkpointed frame (the returned one) may remain."""
    jsc = spark.sparkContext._jsc.sc()
    edges = spark.createDataFrame(
        [(i, (i + 1) % 40) for i in range(40)] + [(i, (i + 7) % 40) for i in range(40)],
        "src long, dst long",
    )
    before = jsc.getPersistentRDDs().size()
    pr = G.pagerank(edges, iters=9)
    after = jsc.getPersistentRDDs().size()
    # before the fix this delta was 3 (two intermediates + the result);
    # <= allows the ContextCleaner to have swept unrelated older frames
    assert after - before <= 1, (before, after)
    # and the returned frame's own blocks are intact (released frames
    # fail loudly on read — the right failure mode, but not for this one)
    assert pr.count() == 40


def test_connected_components_releases_superseded_checkpoints(spark):
    """Same residency pin for the distributed min-label CC loop: every
    round's half/merged frame is released once superseded; only the frame
    backing the returned labels may remain checkpoint-resident."""
    from dream_spark.operators.dedup import connected_components

    jsc = spark.sparkContext._jsc.sc()
    # a 60-node path forces many rounds (and the pointer-doubling branch)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "src long, dst long"
    )
    before = jsc.getPersistentRDDs().size()
    cc = connected_components(edges, small_edges=0)
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, (before, after)
    got = cc.collect()
    assert len(got) == 61 and {r["cluster"] for r in got} == {0}

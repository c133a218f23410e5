"""Physical-plan invariants — the 100 TB posture checks (SCALE.md).

These assert properties of the *executed* plan, not results: filters reach
the parquet scan, small dims broadcast, aggregations are partial (map-side
combine), and nothing silently degrades to a cartesian product.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


# Queries whose semantics REQUIRE a cross product: a broadcast scan of the
# whole corpus (brute-force kNN) or a disconnected BGP (bag-union, ref O7).
_CARTESIAN_OK = {"knn_bruteforce", "sparql_disconnected"}


def test_no_accidental_cartesian_products(spark, queries):
    """A CartesianProduct in any operator plan means a join lost its keys."""
    offenders = []
    for name, fn in sorted(queries.items()):
        if name in _CARTESIAN_OK:
            continue
        plan = _plan(fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_values_rows_residual_never_reorders_to_cartesian(spark, queries):
    """Multi-variable VALUES lowers to a non-equi struct-IN / UNDEF-OR
    residual on the top join.  With rowCount stats on the cached triples
    relation, Catalyst's CostBasedJoinReorder treats that residual as the
    only "join condition" of a reordered pair and emits a CartesianProduct
    (observed at sf0.1: the ?O status x ?O priority scans of
    sparql_values_undef, 150k x 150k, one straggler writing GBs of
    shuffle).  session.get_spark pins joinReorder OFF; this guards
    re-enablement under the executed (post-AQE) plan, cache materialized."""
    assert spark.conf.get("spark.sql.cbo.joinReorder.enabled") == "false"
    for name in ("sparql_values_rows", "sparql_values_undef"):
        df = queries[name](spark, SF_DIR)
        df.count()  # materialize the cache and finalize the AQE plan
        assert "CartesianProduct" not in _plan(df), name


def test_no_row_at_a_time_python_udfs(spark, queries):
    """Row-wise Python UDFs (BatchEvalPython) are the forbidden slow path
    (SCALE.md §4): the only Python allowed in any plan is Arrow-vectorized
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)."""
    offenders = []
    for name, fn in sorted(queries.items()):
        plan = _plan(fn(spark, SF_DIR))
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"row-wise Python UDFs in: {offenders}"


def test_disconnected_component_broadcasts_small_side(spark, queries):
    """A disconnected BGP component (reference O7 bag-union cross product)
    with a small cardinality estimate must run as BroadcastNestedLoopJoin
    (p tasks), never a partition-pair CartesianProduct (p² tasks over the
    open store)."""
    plan = _plan(queries["sparql_disconnected"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q1_partial_aggregation_and_column_pruning(spark, queries):
    plan = _plan(queries["rel_q1_pricing"](spark, SF_DIR))
    # partial + final HashAggregate pair = map-side combine: the shuffle
    # carries #groups rows, not raw lineitems
    assert plan.count("HashAggregate") >= 2
    # column pruning: the scan must not read join-irrelevant columns
    assert "l_partkey" not in plan.split("ReadSchema")[-1]


def test_q6_filter_pushdown(spark, queries):
    plan = _plan(queries["rel_q6_filter"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "LessThan" in plan


def test_sparql_constant_predicate_pushdown(engine):
    """A constant-predicate triple pattern must reach the scan as a pushed
    equality filter on p — the analog of RDF-3X predicate-index pruning."""
    plan = engine.sparql(
        "select ?O ?ST where { ?O placedBy <customer:1> . ?O status ?ST }"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan


def test_sparql_pattern_broadcast_gate(engine):
    """The translator broadcast-hints a pattern scan into its equi-join
    when the predicate edge set's EXACT stats count is under
    _BCAST_JOIN_MAX_ROWS (Catalyst sizes every filtered scan of the open
    triples relation at the whole file, so it would sort-merge without
    the hint), and withholds the hint above the bound or where no exact
    bound exists (var predicate, path closure)."""
    from dream_spark.plans.sparql import parse_sparql
    from dream_spark.plans.stats import PredStat, TripleStats
    from dream_spark.plans.translator import _bcast_pattern_ok

    # physical assertion: the size-attach join of a pair query broadcasts
    p = engine.sparql(
        "select ?P ?SZ ?NM where { ?P size ?SZ . ?P name ?NM }", decode=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p

    # unit direction checks on the gate itself
    store = engine.store
    big = TripleStats({store.resolve("size"): PredStat(10_000_000, 1, 1)}, 10_000_000)
    small = TripleStats({store.resolve("size"): PredStat(20_000, 1, 1)}, 20_000)
    cond = parse_sparql("select ?P ?SZ where { ?P size ?SZ }").conditions[0]
    assert _bcast_pattern_ok(small, store, cond)
    assert not _bcast_pattern_ok(big, store, cond)       # above the bound
    assert not _bcast_pattern_ok(None, store, cond)      # no stats
    varp = parse_sparql("select ?P ?X ?O where { ?P ?X ?O }").conditions[0]
    assert not _bcast_pattern_ok(small, store, varp)     # var pred: no bound
    closure = parse_sparql("select ?A ?B where { ?A inRegion* ?B }").conditions[0]
    assert not _bcast_pattern_ok(small, store, closure)  # closure > edges


def test_bcast_gate_uses_exact_object_counts(engine):
    """A bound-object pattern must gate on the EXACT per-(pred, obj) count
    where obj_counts covers the predicate (``?C type Customer`` is a
    15 K-row scan even though ``type`` totals 786 K edges at sf0.1), and
    fall back to the predicate total where it does not — both directions
    exact bounds, never estimates."""
    from dream_spark.plans.sparql import parse_sparql
    from dream_spark.plans.stats import PredStat, TripleStats
    from dream_spark.plans.translator import _bcast_pattern_ok

    store = engine.store
    tid = store.resolve("type")
    cust = store.resolve("Customer")
    cond = parse_sparql("select ?C where { ?C type Customer }").conditions[0]
    # predicate total far over the gate; the one object's count far under
    with_oc = TripleStats({tid: PredStat(10_000_000, 1, 7)}, 10_000_000, {tid: {cust: 15_000}})
    assert _bcast_pattern_ok(with_oc, store, cond)
    # same predicate, a hub object past the gate: hint withheld
    hub = TripleStats({tid: PredStat(10_000_000, 1, 7)}, 10_000_000, {tid: {cust: 600_000}})
    assert not _bcast_pattern_ok(hub, store, cond)
    # no obj_counts coverage: conservative predicate-total bound applies
    no_oc = TripleStats({tid: PredStat(10_000_000, 1, 7)}, 10_000_000)
    assert not _bcast_pattern_ok(no_oc, store, cond)
    # the physical consequence: the dimension-shaped type join broadcasts
    p = engine.sparql(
        "select ?C ?NM where { ?C type Customer . ?C name ?NM }", decode=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_stats_obj_counts_roundtrip_and_estimates(tmp_path, engine):
    """obj_counts must survive the JSON cache and sharpen the bound-object
    cardinality estimate from count/ndv_o to the exact per-object figure."""
    from dream_spark.plans.stats import TripleStats

    st = engine.stats
    assert st is not None and st.obj_counts, "low-ndv predicates must be covered"
    path = str(tmp_path / "s.json")
    st.save(path)
    st2 = TripleStats.load(path)
    assert st2 is not None and st2.obj_counts == st.obj_counts
    # exact estimate: a skewed enum object stops being averaged
    tid = engine.store.resolve("type")
    oc = st.obj_counts.get(tid)
    assert oc, "type is enum-shaped and must carry exact object counts"
    some_obj, exact = next(iter(oc.items()))
    assert st.pattern_cardinality(tid, False, True, some_obj) == float(exact)


def test_decode_dict_join_broadcasts(engine):
    """Every dictionary decode join (regex/string filters, final id2name)
    carries the size-gated broadcast hint: at bench SF the dict is the
    build side, so the result stream is never sort-merge-shuffled against
    a re-shuffled dictionary (r10: the 4 MB session threshold had demoted
    these to SMJ, 2-3x slower across the decode family)."""
    p = engine.sparql(
        'select ?C ?NM where { ?C type Customer . ?C name ?NM . filter strends(?NM, "7") }',
        decode=True,
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p


def test_articulation_split_targets_and_guards(engine):
    """The bushy split fires exactly on hub-variable self-join shapes and
    nowhere else: the pair query splits at its most BALANCED articulation
    variable (?O — 3+3, not ?L1's 2+4); a 5-cycle (2-connected) and a
    star (size-1 components) return None and keep their left-deep chain."""
    from dream_spark.plans.sparql import parse_sparql
    from dream_spark.plans.translator import _articulation_split

    pair = parse_sparql(
        "select ?L1 ?L2 ?S1 ?S2 where { ?L1 ofOrder ?O . ?L2 ofOrder ?O ."
        " ?L1 ofPart ?P1 . ?L2 ofPart ?P2 . ?P1 size ?S1 . ?P2 size ?S2 }"
    )
    split = _articulation_split(pair.conditions)
    assert split is not None
    comps, v = split
    assert v == "O" and sorted(len(g) for g in comps) == [3, 3]

    cycle = parse_sparql(
        "select ?L ?C ?S ?N where { ?L suppliedBy ?S . ?S inNation ?N ."
        " ?C inNation ?N . ?O placedBy ?C . ?L ofOrder ?O }"
    )
    assert _articulation_split(cycle.conditions) is None  # 2-connected

    star = parse_sparql(
        "select ?C ?NM ?N ?MS where { ?C type Customer . ?C name ?NM ."
        " ?C inNation ?N . ?C mktsegment ?MS }"
    )
    assert _articulation_split(star.conditions) is None  # size-1 components


def test_pair_query_plans_bushy(engine):
    """Physical consequences of the split on the pair shape: each branch
    broadcast-builds its small size pattern (2 BroadcastHashJoin — the
    left-deep chain had 1), and the cross-branch arithmetic filter fuses
    into the top join condition, so the C(k,2) pair stream is never
    materialized below a standalone Filter or exchanged."""
    df = engine.sparql(
        "select ?L1 ?L2 ?S1 ?S2 where { ?L1 ofOrder ?O . ?L2 ofOrder ?O ."
        " ?L1 ofPart ?P1 . ?L2 ofPart ?P2 . ?P1 size ?S1 . ?P2 size ?S2 ."
        " filter (abs(?S1 - ?S2) >= 45) }",
        decode=False,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    # the top pair join carries the filter as its join condition
    top = plan[plan.index("Join"):].splitlines()[0]
    assert "abs(" in top


def test_sparql_subquery_outer_pattern_broadcasts(engine):
    """The analytic subquery shape (aggregate ⋈ one dimension-like outer
    pattern) broadcasts the exact-count-bounded outer side instead of
    sort-merging the #groups-sized aggregate."""
    plan = engine.sparql(
        "select ?N ?C ?cnt where { { select ?C (count(?O) as ?cnt) where"
        " { ?O placedBy ?C } group by ?C } . ?C inNation ?N }"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_knn_corpus_not_shuffled(spark, queries):
    """Brute-force kNN broadcasts the query side; the corpus scan must feed
    the join without an Exchange (no corpus shuffle at any scale)."""
    plan = _plan(queries["knn_bruteforce"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    before_join = plan.split("Join")[-1]
    assert "Exchange hashpartitioning" not in before_join


def test_chunking_is_map_only(spark, queries):
    """Document chunking claims a pure scan shape: no Exchange of any kind
    in the plan — the property that makes it free at 100 TB."""
    plan = _plan(queries["pipeline_chunks"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_shard_packing_shuffles_once_on_bucket(spark, queries):
    """Shard packing must shuffle exactly once — by the hash bucket its
    window partitions on — and never collapse to a single global sort
    partition (Exchange SinglePartition = the 100 TB serialization bug)."""
    plan = _plan(queries["pipeline_shards"](spark, SF_DIR))
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "bucket" in plan.split("Exchange hashpartitioning")[1][:80]


def test_semi_and_anti_join_operators(spark, queries):
    assert "LeftSemi" in _plan(queries["rel_q4_semi"](spark, SF_DIR))
    assert "LeftAnti" in _plan(queries["rel_anti"](spark, SF_DIR))


def test_dedup_minhash_signatures_from_kernel(spark, queries):
    """Signatures must come from the zero-shuffle Arrow kernel, not an
    explode→groupBy pipeline (which would shuffle ~300× the corpus size).
    r11: minhash_pairs localCheckpoint-materializes the kernel output
    before the band self-join, so the pin splits in two — the kernel node
    lives in the SIGNATURE frame's plan, and the entry's plan must show
    the kernel ran EXACTLY ONCE at build (a checkpointed-rows scan with
    ZERO Python eval nodes — two MapInPandas would mean the self-join
    sides each re-ran the kernel, the shape r11 removed)."""
    from dream_spark.functions.textkernels import minhash_signatures
    from dream_spark.operators.dedup import MINHASH_K
    from dream_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sig_plan = _plan(minhash_signatures(docs, MINHASH_K))
    assert "MapInPandas" in sig_plan  # the Arrow kernel
    assert "partial_min" not in sig_plan  # no shingle-row groupBy(doc_id) min

    plan = _plan(queries["dedup_minhash"](spark, SF_DIR))
    assert "MapInPandas" not in plan  # kernel already ran, once, at build
    assert "partial_min" not in plan
    assert "ExistingRDD" in plan  # both join sides read the checkpointed rows


def test_sparql_optional_is_left_outer_join(engine):
    plan = _plan(
        engine.sparql("select ?C ?O where { ?C type Customer . optional { ?O placedBy ?C } }")
    )
    assert "LeftOuter" in plan


def test_sparql_minus_is_anti_join(engine):
    plan = _plan(
        engine.sparql("select ?C where { ?C type Customer . minus { ?O placedBy ?C } }")
    )
    assert "LeftAnti" in plan


def test_sparql_union_is_plain_union(engine):
    """Union must be partition concatenation — no exchange introduced by the
    union itself (each branch scans + filters only; no join, no shuffle)."""
    plan = _plan(
        engine.sparql("select ?X where { { ?X type Customer } union { ?X type Supplier } }")
    )
    assert "Union" in plan
    assert "Exchange" not in plan  # scans + filters + union only


def test_q7_broadcasts_both_nation_lookups(spark, queries):
    plan = _plan(queries["rel_q7_nations"](spark, SF_DIR))
    assert plan.count("BroadcastExchange") >= 2


def test_q22_global_aggregate_is_broadcast_not_cartesian(spark, queries):
    plan = _plan(queries["rel_q22_idle"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_q16_distinct_aggregate_is_two_phase(spark, queries):
    """COUNT(DISTINCT) must plan as expand + partial aggregate — only
    (brand, type, suppkey) triples shuffle, never raw join output."""
    plan = _plan(queries["rel_q16_countd"](spark, SF_DIR))
    assert "partial_count(distinct" in plan.lower() or "Expand" in plan


def test_broadcast_gate_hints_when_small(spark, queries):
    """Default threshold: the Jaccard verification joins broadcast the
    (tiny at test SF) docset arrays — the pair stream is never shuffled."""
    plan = _plan(queries["dedup_jaccard"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_broadcast_gate_degrades_to_shuffle_join(spark, queries):
    """Threshold 0 models a corpus-sized build side: the size-gated hint
    must be withheld so the verification join degrades to a keyed shuffle
    join (SortMergeJoin/ShuffledHashJoin) instead of OOMing a broadcast.
    Auto-broadcast is disabled for the check so Catalyst/AQE can't re-add
    the hint from measured (test-SF-small) sizes."""
    from dream_spark.functions.joins import BROADCAST_MAX_ROWS_CONF

    # evict cached operator outputs (e.g. jaccard_pairs' persisted pair
    # set): a cache hit would serve the result without planning the join
    # whose physical shape this test asserts
    spark.catalog.clearCache()
    spark.conf.set(BROADCAST_MAX_ROWS_CONF, "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        for name in ("dedup_jaccard", "knn_lsh"):
            plan = _plan(queries[name](spark, SF_DIR))
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, name
    finally:
        from dream_spark.session import AUTO_BCAST_THRESHOLD

        spark.conf.unset(BROADCAST_MAX_ROWS_CONF)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", AUTO_BCAST_THRESHOLD)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_cc_small_edges_conf_knob(spark):
    """The collect-to-driver CC threshold is conf-overridable: 0 forces the
    distributed label-propagation path; result must be identical."""
    from dream_spark.functions.joins import CC_SMALL_EDGES_CONF
    from dream_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    expect = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    spark.conf.set(CC_SMALL_EDGES_CONF, "0")
    try:
        got = {(r["node"], r["cluster"]) for r in connected_components(edges).collect()}
    finally:
        spark.conf.unset(CC_SMALL_EDGES_CONF)
    assert got == expect
    got_small = {(r["node"], r["cluster"]) for r in connected_components(edges).collect()}
    assert got_small == expect


def test_ensure_open_drops_path_cache_with_store_cache(spark):
    """localCheckpoint-materialized path frames (closures, node frame) have
    no recompute path once their blocks are gone: after an external
    clearCache forces ensure_open to re-cache the store, the path cache
    must be dropped too, so later path queries re-derive instead of
    failing on lost checkpoint blocks for the session's remainder."""
    from dream_spark.plans.translator import _path_cache
    from dream_spark.sources.triples import TripleStore

    st = TripleStore.from_tpch(spark, SF_DIR, cache=True)
    _path_cache(st)["closure_probe"] = object()
    spark.catalog.clearCache()
    st.ensure_open()
    assert "_path_frame_cache" not in st.__dict__
    lvl = st.triples.storageLevel
    assert lvl.useMemory or lvl.useDisk  # store re-opened
    st.triples.unpersist()


def test_stats_persist_across_engine_constructions(spark, tmp_path, monkeypatch):
    """Second construction must reload the stat file, running zero Spark
    jobs for statistics (reference startup stat reload, Main.c:146-161)."""
    import os as _os

    from dream_spark.engine import Engine
    from dream_spark.plans import stats as stats_mod

    path = str(tmp_path / "stats.json")
    e1 = Engine.from_tpch(spark, SF_DIR, stats_path=path)
    assert e1.stats is not None and _os.path.exists(path)

    def boom(*a, **k):
        raise AssertionError("stats recollected despite cache file")

    monkeypatch.setattr(stats_mod.TripleStats, "collect", classmethod(boom))
    e2 = Engine.from_tpch(spark, SF_DIR, stats_path=path)
    assert e2.stats is not None
    assert e2.stats.per_pred == e1.stats.per_pred
    assert e2.stats.total == e1.stats.total


def test_sparql_ground_pattern_filters_cached_store(engine):
    """On the OPEN-STORE path (cached triples — the default engine), the
    same pattern must scan the in-memory store with the p/o filters pushed
    into the cache scan (batch-stat pruning); nothing executes below the
    InMemoryRelation boundary (the FileScans printed under it are the
    cache's definition, not executed operators).  Ordered BEFORE the
    derive-path test below: that one registers views for another sf_dir,
    which deliberately invalidates this session store's cache."""
    plan = _plan(engine.sparql("select ?X where { ?X placedBy <customer:1> }"))
    executed = plan.split("InMemoryRelation")[0]
    assert "InMemoryTableScan" in executed
    assert executed.count("FileScan") == 0
    assert "= 100000001)" in executed  # o = customer:1 reaches the cache scan


def test_sparql_ground_pattern_prunes_to_single_scan(spark):
    """On the DERIVE-PER-QUERY path (cache=False — the shape the persisted
    predicate-partitioned layout scans at warehouse scale), a constant
    predicate must prune the derived triples view down to the ONE base
    table holding that predicate — Catalyst folds `p = placedBy` through
    the UNION ALL, eliminating the other 23 branches, the Spark analog of
    RDF-3X predicate-index pruning (QueryPlanner.c:780-821).  The constant
    object then filters that single scan, which reads only the two columns
    the pattern needs."""
    from dream_spark.engine import Engine
    from dream_spark.sources.triples import TripleStore

    # a DIFFERENT sf_dir than the cached session store: the cache manager
    # substitutes any matching canonicalized plan, which would mask the
    # derive-path shape this test pins down
    alt_sf = "/root/testdata/sf0.01"
    store = TripleStore.from_tpch(spark, alt_sf, cache=False)
    eng = Engine(spark, store, None, sf_dir=alt_sf)
    plan = _plan(eng.sparql("select ?X where { ?X placedBy <customer:1> }"))
    assert plan.count("FileScan") == 1
    assert "orders.parquet" in plan
    assert "= 100000001)" in plan  # o = customer:1 on the surviving branch
    scan_schema = plan.split("ReadSchema")[-1]
    assert "o_orderkey" in scan_schema and "o_totalprice" not in scan_schema
    # restore the default-session table registrations for later tests
    TripleStore.from_tpch(spark, SF_DIR, cache=False)


def test_sparql_varpred_constant_subject_pushdown_no_cartesian(engine):
    """A variable-predicate pattern must still push its constant subject
    into every UNION branch (each scan filtered, never a full-table pass
    unfiltered), and joining it to a second pattern must stay a keyed
    join — never a cartesian over the whole triple table."""
    plan = _plan(engine.sparql("select ?P ?X where { <customer:1> ?P ?X }"))
    assert "= 100000001)" in plan  # s-constant folded into branch filters
    assert "CartesianProduct" not in plan

    joined = _plan(
        engine.sparql("select ?P ?X ?N where { <customer:1> ?P ?X . ?X inNation ?N }")
    )
    assert "CartesianProduct" not in joined
    assert (
        "SortMergeJoin" in joined
        or "BroadcastHashJoin" in joined
        or "ShuffledHashJoin" in joined
    )


def test_sparql_exists_is_semi_join(engine):
    """FILTER EXISTS lowers to a left SEMI join (never an inner join that
    would duplicate left rows per match); NOT EXISTS to a left ANTI join."""
    pos = _plan(
        engine.sparql(
            "select ?C ?N where { ?C type Customer . ?C inNation ?N ."
            " filter exists { ?O placedBy ?C } }"
        )
    )
    assert "LeftSemi" in pos and "CartesianProduct" not in pos
    neg = _plan(
        engine.sparql(
            "select ?C where { ?C type Customer ."
            " filter not exists { ?O placedBy ?C } }"
        )
    )
    assert "LeftAnti" in neg and "CartesianProduct" not in neg


def test_sparql_alternation_is_single_in_filtered_scan(engine):
    """p1|p2 must compile to ONE scan with an IN predicate on the predicate
    ids — not a two-branch union or a join."""
    import re

    plan = _plan(engine.sparql("select ?X ?Y where { ?X inNation|inRegion ?Y }"))
    assert re.search(r"p#\d+L? IN ", plan), plan[:500]
    # the cached store prints its own (union-of-tables) derivation inside
    # the InMemoryTableScan node — judge only the query plan above the scan
    above_scan = plan.split("InMemoryTableScan")[0]
    assert "Union" not in above_scan and "Join" not in above_scan


def test_funnel_windows_share_one_exchange(spark):
    """The k chained per-user window mins must reuse ONE user-keyed
    exchange (plus the final single-row aggregate's) — not re-shuffle per
    stage; and the unbounded frames need no per-stage sort."""
    from dream_spark.operators.temporal import funnel
    from dream_spark.sources.tables import load_table

    plan = (
        funnel(load_table(spark, SF_DIR, "events"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") == 3
    assert plan.count("Exchange") <= 2, plan[:800]


def test_stats_load_degrades_on_any_malformed_cache(tmp_path):
    """Unreadable cache == no cache, for EVERY corruption shape — a planted
    or drifted file must trigger recollection, never crash construction or
    (worse) blow up later inside cardinality estimation."""
    from dream_spark.plans.stats import TripleStats

    cases = [
        "not json at all",
        '{"total": 5, "per_pred": {"x": [1, 1, 1]}}',      # non-int key
        '{"total": 5, "per_pred": {"1": ["a", "b", "c"]}}',  # non-int stats
        '{"total": 5, "per_pred": {"1": [1]}}',              # wrong arity
        '{"total": "n", "per_pred": {}}',                    # non-int total
        '{"per_pred": {}}',                                  # missing total
    ]
    for i, text in enumerate(cases):
        p = tmp_path / f"c{i}.json"
        p.write_text(text)
        assert TripleStats.load(str(p)) is None, text


def test_dup_spans_single_sid_shuffle(spark, queries):
    """dedup_spans claims the canonical exact-substring shape: the only
    shuffle in the plan is the sid-keyed count with MAP-SIDE partial
    aggregation (one partial_count before the exchange), and no global
    single-partition collapse anywhere."""
    plan = _plan(queries["dedup_spans"](spark, SF_DIR))
    assert "Exchange SinglePartition" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan[:2000]
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_temporal_concurrency_windows_are_day_partitioned(spark, queries):
    """The sweep line must NOT run as one unpartitioned running-sum window
    over the whole timeline: the per-boundary window partitions by day,
    and the only single-partition stage is the day-level carry over the
    calendar-sized day-total table (bounded rows by construction)."""
    plan = _plan(queries["temporal_concurrency"](spark, SF_DIR))
    # the in-day running sum window is keyed by day
    assert "hashpartitioning(day" in plan, plan[:2000]
    # exactly one SinglePartition exchange is tolerated: the day-level
    # carry (365 rows/year); the boundary stream itself must never pass
    # through it
    assert plan.count("Exchange SinglePartition") <= 1


def test_window_movavg_is_range_frame(spark, queries):
    """rel_window_movavg must execute a RANGE (value) frame, not a ROWS
    frame — the sparse-day correctness property — partitioned by priority
    (never a global window)."""
    plan = _plan(queries["rel_window_movavg"](spark, SF_DIR))
    assert "RangeFrame" in plan, plan[:2000]
    assert "RowFrame" not in plan
    assert "Exchange SinglePartition" not in plan


def test_pair_gate_prunes_before_join(spark, queries):
    """media_pair_gate's caption-length and geometry predicates must reach
    the scans (PushedFilters / pre-join Filter), and the doc_id equi-join
    must not degrade to a cartesian."""
    plan = _plan(queries["media_pair_gate"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ivf_pruned_scan_reads_only_probed_cells(spark, queries):
    """The cell-partitioned IVF serve path must PARTITION-PRUNE: the
    inverted-file parquet scan's plan must carry a partition filter on
    `cell` (Spark prunes the unprobed cell directories from the file
    listing), and the pruned scan must not degrade to a full-corpus read.
    This pins SCALE.md §6.3's closed item — at scale the corpus scan is
    nprobe/n_cells of the data, enforced by layout + a literal IN filter,
    not custom reader code."""
    plan = _plan(queries["knn_ivf_pruned"](spark, SF_DIR))
    # scope to the inverted-file scan (other scans carry their own empty
    # PartitionFilters), then require a literal IN over cell in ITS entry
    cells_segs = [
        seg for seg in plan.split("Scan parquet")[1:]
        if "/cells" in seg[:600]
    ]
    assert cells_segs, "no scan over the cell-partitioned inverted file"
    pf = cells_segs[0].split("PartitionFilters")[1][:300]
    assert "cell" in pf and " IN (" in pf


def test_lsh_cluster_star_edges_are_joinless(spark):
    """The 100-TB cluster path's edge list must come from ONE window pass
    over the band frame — no bucket self-join anywhere (that is exactly
    the Σ(bucket size)² shape dedup_minhash pays for pair OUTPUT, which a
    cluster assembly never needs), and the window shuffle is keyed by the
    bucket, not a global sort."""
    from dream_spark.operators.dedup import _lsh_star_edges
    from dream_spark.sources.tables import load_table

    plan = _plan(_lsh_star_edges(load_table(spark, SF_DIR, "documents")))
    assert "Join" not in plan, plan[:2000]
    assert "hashpartitioning(band" in plan, plan[:2000]
    assert "Exchange SinglePartition" not in plan


def test_sample_alloc_windows_are_strata_bounded(spark, queries):
    """The proportional sampler's per-doc rank window must be keyed by the
    stratum (hashpartitioning(source)), the allocation side must
    broadcast onto it, and the only SinglePartition exchange is the
    allocation computation over the strata-COUNT table (strata-sized by
    construction) — the corpus stream never collapses to one task."""
    plan = _plan(queries["pipeline_sample_alloc"](spark, SF_DIR))
    assert "hashpartitioning(source" in plan, plan[:2000]
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_bm25_served_scan_pushes_query_terms(spark, queries):
    """The persisted-postings serve path must push the literal query-term
    IN predicate into the tok-sorted postings scan (PushedFilters carries
    `In(tok, ...)`), so parquet min/max row-group stats skip everything
    but the probed terms' postings ranges — the Spark-native analog of
    reading only the query terms' postings lists."""
    plan = _plan(queries["text_bm25_served"](spark, SF_DIR))
    postings_segs = [
        seg for seg in plan.split("Scan parquet")[1:]
        if "/postings" in seg[:600]
    ]
    assert postings_segs, "no scan over the persisted postings file"
    seg = postings_segs[0]
    pf = seg.split("PushedFilters")[1][:400]
    assert "In(tok" in pf, pf


def test_minhash_serve_index_scan_pushes_probes(spark):
    """The incremental-dedup serve path must push the batch's literal
    per-band ``bh IN (...)`` probe predicate into the persisted band-index
    scan (PushedFilters carries `In(bh, ...)`) and prune the
    ``partitionBy("band")`` directories (PartitionFilters carries band),
    so the corpus-index read is probe-sized — the same narrow-serve
    economics as the BM25 postings scan."""
    from pyspark.sql import functions as F

    from dream_spark.operators import dedup as D
    from dream_spark.sources.tables import load_table

    path = D._served_minhash_index_path(spark, SF_DIR)
    index = spark.read.parquet(f"{path}/bands")
    batch = load_table(spark, SF_DIR, "documents").where(F.col("doc_id") % 2 == 1)
    bands = D.minhash_index(batch).persist()
    try:
        bands.count()
        plan = _plan(D._probe_pruned_index(index, bands))
    finally:
        bands.unpersist()
    segs = [
        seg for seg in plan.split("Scan parquet")[1:] if "/bands" in seg[:600]
    ]
    assert segs, "no scan over the persisted band index"
    seg = segs[0]
    assert "In(bh" in seg.split("PushedFilters")[1][:400], seg[:800]
    assert "band" in seg.split("PartitionFilters")[1][:200], seg[:800]


def test_bm25_lookup_narrow_pushdown_and_one_doc_scan(spark, queries):
    """The NARROW lookup must (a) push its few-term literal IN into the
    postings scan like the broad serve path, and (b) read the documents
    table with the query-doc equality predicate pushed down — the term-set
    derivation touches ONE document, not the corpus (SCALE.md §7's
    narrow-slope design)."""
    plan = _plan(queries["text_bm25_lookup"](spark, SF_DIR))
    postings_segs = [
        seg for seg in plan.split("Scan parquet")[1:]
        if "/postings" in seg[:600]
    ]
    assert postings_segs, "no scan over the persisted postings file"
    pf = postings_segs[0].split("PushedFilters")[1][:400]
    assert "In(tok" in pf, pf
    doc_segs = [
        seg for seg in plan.split("Scan parquet")[1:]
        if "documents.parquet" in seg[:600]
    ]
    assert doc_segs, "no scan over the documents table"
    dpf = doc_segs[0].split("PushedFilters")[1][:400]
    assert "EqualTo(doc_id,0)" in dpf, dpf


def test_weighted_sample_is_map_only(spark, queries):
    """pipeline_sample_weighted must compile to a pure scan stage: the
    coin and keep probability are row-local, so ANY Exchange in the plan
    means the map-only contract broke."""
    plan = _plan(queries["pipeline_sample_weighted"](spark, SF_DIR))
    assert "Exchange" not in plan

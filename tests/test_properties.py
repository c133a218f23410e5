"""Property-based tests (hypothesis).

Driver-side algorithms get full randomized coverage (100 examples); the
Spark pipelines get a handful of randomized corpora each (Spark job cost),
checking the properties that matter most:

- PPJoin prefix filtering is EXACT-recall: the bucketed pipeline finds
  precisely the pairs a brute-force O(n²) Jaccard finds (the scale design
  must not change the answer).
- Connected components (driver union-find path) matches an independent
  BFS reference on arbitrary graphs.
- The triple-store ID space is injective across entity kinds at TPC-H
  bounds (the collision-freedom claim in sources/triples.py).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR  # noqa: F401  (ensures env setup)

# ---------------------------------------------------------------------------
# Oracle-reach telemetry (r9 ADVICE): the composition fuzzers skip the
# DuckDB comparison when the oracle renderer raises NotImplementedError
# for a documented-unsupported shape.  A renderer regression that starts
# raising for EVERY drawn composition would make those tests pass
# vacuously.  Each instrumented fuzzer tallies whether its example
# reached the oracle; test_fuzzers_reach_oracle (bottom of this module,
# so pytest's in-file ordering runs it after the fuzzers) asserts every
# instrumented fuzzer that ran produced at least one oracle-compared
# example.
# ---------------------------------------------------------------------------
_ORACLE_REACH: dict[str, list[int]] = {}


def _oracle_reach(test: str, reached: bool) -> None:
    from hypothesis import event

    tally = _ORACLE_REACH.setdefault(test, [0, 0])
    tally[0] += 1
    if reached:
        tally[1] += 1
    else:
        event(f"{test}: oracle skipped (NotImplementedError)")

# ---------------------------------------------------------------------------
# driver-side: union-find vs BFS reference
# ---------------------------------------------------------------------------
edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=60,
)


def _bfs_components(pairs):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label: dict[int, int] = {}
    for start in sorted(adj):
        if start in label:
            continue
        seen, queue = {start}, [start]
        while queue:
            x = queue.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    queue.append(y)
        root = min(seen)
        for x in seen:
            label[x] = root
    return sorted(label.items())


@given(edges_strategy)
@settings(max_examples=100, deadline=None)
def test_unionfind_matches_bfs(pairs):
    from dream_spark.operators.dedup import _unionfind_components

    assert _unionfind_components(pairs) == _bfs_components(pairs)


# ---------------------------------------------------------------------------
# driver-side: ID-space injectivity at TPC-H bounds
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["region", "nation", "supplier", "customer", "part", "order"]),
            st.integers(0, 10**9),
        ),
        min_size=2,
        max_size=50,
        unique=True,
    )
)
@settings(max_examples=100, deadline=None)
def test_entity_id_space_injective(entities):
    """Distinct (kind, key) pairs must never collide in id space up to
    10^9 keys per kind (sf 10 000 headroom)."""
    from dream_spark.sources.triples import resolve_lexical

    ids = [resolve_lexical(f"{kind}:{key}") for kind, key in entities]
    assert None not in ids
    assert len(set(ids)) == len(entities)


# ---------------------------------------------------------------------------
# Spark: PPJoin prefix filtering is exact-recall vs brute force
# ---------------------------------------------------------------------------
def _ngrams(text: str) -> set[tuple[str, ...]]:
    import re

    from dream_spark.operators.dedup import JACCARD_NGRAM

    toks = [t for t in re.split(r"[^0-9a-z]+", text.lower()) if t]
    n = JACCARD_NGRAM
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute_force_pairs(docs: list[tuple[int, str]], threshold=0.8):
    out = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            (ia, ta), (ib, tb) = docs[i], docs[j]
            sa, sb = _ngrams(ta), _ngrams(tb)
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            if jac >= threshold:
                out.add((min(ia, ib), max(ia, ib)))
    return out


# small vocabulary forces heavy overlap → near-dups actually occur
_words = st.sampled_from(["red", "blue", "widget", "bolt", "ring", "gear"])
_doc_text = st.lists(_words, min_size=2, max_size=8).map(" ".join)
_corpus = st.lists(_doc_text, min_size=2, max_size=10).map(
    lambda texts: [(i, t) for i, t in enumerate(texts)]
)


@given(_corpus)
@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_jaccard_pipeline_exact_recall(spark, corpus):
    """The bucketed PPJoin pipeline must return exactly the brute-force
    J ≥ 0.8 pair set — prefix/size/positional filters lose no recall and
    verification admits no false positives."""
    from dream_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]) for r in jaccard_pairs(docs).collect()
    }
    assert got == _brute_force_pairs(corpus)


# ---------------------------------------------------------------------------
# Spark: generic as-of join vs exhaustive reference
# ---------------------------------------------------------------------------
_left_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 500)), unique=True, min_size=1, max_size=12
)
_right_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 500)), unique=True, min_size=1, max_size=12
)


@given(_left_rows, _right_rows)
@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_join_matches_reference(spark, left_rows, right_rows):
    """For every left row, asof_join must pick exactly the latest right row
    with rts <= lts sharing the key (NULL when none exists)."""
    from pyspark.sql import functions as F

    from dream_spark.operators.temporal import asof_join

    left = spark.createDataFrame(left_rows, "k long, lsec long").select(
        "k", F.timestamp_seconds("lsec").alias("lts")
    )
    right = spark.createDataFrame(right_rows, "k long, rsec long").select(
        "k", F.timestamp_seconds("rsec").alias("rts")
    )
    got = {
        (r["k"], r["lts"].timestamp()): (None if r["rts"] is None else r["rts"].timestamp())
        for r in asof_join(left, right, on="k", left_ts="lts", right_ts="rts").collect()
    }
    for k, lt in left_rows:
        cands = [rt for rk, rt in right_rows if rk == k and rt <= lt]
        want = float(max(cands)) if cands else None
        assert got[(k, float(lt))] == want, (k, lt)


@given(_corpus)
@settings(max_examples=3, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_jaccard_pipeline_exact_recall_at_half_threshold(spark, corpus):
    """Threshold is a parameter, not a constant: the prefix/size/positional
    arithmetic must stay exact-recall at J ≥ 0.5 too."""
    from dream_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]) for r in jaccard_pairs(docs, threshold=(1, 2)).collect()
    }
    assert got == _brute_force_pairs(corpus, threshold=0.5)


def test_pagerank_mass_and_determinism(spark):
    """PageRank invariants on a hand graph: teleport floor for sources,
    higher rank for the sink everyone points at, and bit-identical reruns."""
    from dream_spark.operators.graph import RANK_SCALE, pagerank

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (4, 3), (3, 1)], "src long, dst long"
    )
    a = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    assert a == b
    # nodes on the 1<->3 cycle accumulate mass; pure sources keep exactly
    # the teleport share
    teleport = RANK_SCALE * 15 // 100
    assert a[1] > teleport and a[3] > teleport
    assert a[2] == a[4] == teleport
    # hand-computed second superstep: r2(1) = teleport + 0.85*r1(3)
    r1_3 = teleport + 3 * (RANK_SCALE * 85 // 100)
    assert a[1] == teleport + r1_3 * 85 // 100


# ---------------------------------------------------------------------------
# chunking: pure-python reference over random corpora (Spark-side, few runs)
# ---------------------------------------------------------------------------
docs_strategy = st.lists(
    st.tuples(
        st.integers(0, 10_000),
        st.text(
            alphabet=st.sampled_from("ab c1."),  # tokens, digits, separators
            min_size=0,
            max_size=200,
        ),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda d: d[0],
)


def _ref_tokens(text: str) -> list[str]:
    import re as _re

    return [t for t in _re.split(r"[^a-z0-9]+", text.lower()) if t]


@given(docs_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunking_matches_reference(spark, docs):
    from dream_spark.operators.pipeline import CHUNK_OVERLAP, CHUNK_TOKENS, chunk_documents

    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    df = spark.createDataFrame(docs, schema="doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["start_pos"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df).collect()
    }
    want = {}
    for doc_id, text in docs:
        toks = _ref_tokens(text)
        for ci, start in enumerate(range(0, len(toks), stride)):
            window = toks[start : start + CHUNK_TOKENS]
            want[(doc_id, ci)] = (start + 1, len(window), " ".join(window))
    assert got == want


@given(docs_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_shard_packing_matches_reference(spark, docs):
    from dream_spark.functions.hashing import hash_params
    from dream_spark.operators.pipeline import (
        PACK_BUCKETS,
        PACK_BUDGET_TOKENS,
        PACK_SHARD_STRIDE,
        pack_shards,
    )

    df = spark.createDataFrame(docs, schema="doc_id long, text string")
    got = {r["doc_id"]: (r["bucket"], r["shard"]) for r in pack_shards(df).collect()}

    def h(i, x):
        a, b = hash_params(i)
        return (a * x + b) % 2_147_483_647

    by_bucket: dict[int, list] = {}
    for doc_id, text in docs:
        by_bucket.setdefault(h(2, doc_id) % PACK_BUCKETS, []).append(doc_id)
    want = {}
    for bucket, ids in by_bucket.items():
        cum = 0
        for doc_id in sorted(ids, key=lambda d: (h(3, d), d)):
            n = len(_ref_tokens(dict(docs)[doc_id]))
            want[doc_id] = (bucket, bucket * PACK_SHARD_STRIDE + cum // PACK_BUDGET_TOKENS)
            cum += n
    assert got == want


# ---------------------------------------------------------------------------
# SPARQL property-path grammar: parser invariants over random predicates
# ---------------------------------------------------------------------------
_pred_name = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll")), min_size=1, max_size=8
)


@given(_pred_name)
@settings(max_examples=100, deadline=None)
def test_parser_inverse_marker_roundtrip(pred):
    from dream_spark.plans.sparql import parse_sparql

    q = parse_sparql(f"select ?A ?B where {{ ?A ^{pred} ?B }}")
    t = q.conditions[0].pred
    assert t.is_inverse and not t.is_transitive and not t.is_alternation
    assert t.lexical == pred


@given(st.lists(_pred_name, min_size=2, max_size=4, unique=True))
@settings(max_examples=100, deadline=None)
def test_parser_alternation_alternatives(preds):
    from dream_spark.plans.sparql import parse_sparql

    q = parse_sparql(f"select ?A ?B where {{ ?A {'|'.join(preds)} ?B }}")
    t = q.conditions[0].pred
    assert t.is_alternation and t.alternatives == tuple(preds)


# ---------------------------------------------------------------------------
# Typed-value arithmetic FILTER fragment vs a pure-Python reference
# ---------------------------------------------------------------------------
@given(
    st.sampled_from([None, "+", "-", "*"]),
    st.integers(-1000, 1000),
    st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
    st.integers(-2_000_000, 2_000_000),
)
@settings(max_examples=100, deadline=None)
def test_arith_filter_fragment_matches_python(lhs_op, lhs_num, op, rhs_num):
    """The shared arith SQL fragment (the exact string both engines run)
    must agree with a pure-Python evaluation of the typed-value contract:
    ids inside the numeric window carry value id − BASE_SIZE_LIT; every
    other id values to NULL and its row drops (the SPARQL type-error
    contract), for all of + − * and every comparison op."""
    import duckdb

    from dream_spark.sources.triples import BASE_SIZE_LIT, BASE_SUPPLIER, arith_filter_sql

    ids = [5, 101, 2_003, BASE_SIZE_LIT, BASE_SIZE_LIT + 1, BASE_SIZE_LIT + 25,
           BASE_SUPPLIER - 1, BASE_SUPPLIER, 100_000_001]
    pred = arith_filter_sql("v", lhs_op, lhs_num if lhs_op else None, op, rhs_num)
    vals = ", ".join(f"({i})" for i in ids)
    got = {
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT v FROM (VALUES {vals}) t(v) WHERE {pred}")
        .fetchall()
    }
    pyops = {
        "=": lambda a, b: a == b, "!=": lambda a, b: a != b,
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    }
    want = set()
    for i in ids:
        if not (BASE_SIZE_LIT <= i < BASE_SUPPLIER):
            continue  # non-numeric term: NULL comparison, row drops
        val = i - BASE_SIZE_LIT
        if lhs_op is not None:
            val = {"+": val + lhs_num, "-": val - lhs_num, "*": val * lhs_num}[lhs_op]
        if pyops[op](val, rhs_num):
            want.add(i)
    assert got == want


@given(
    st.sampled_from(["+", "-", "*"]),
    st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
    st.integers(-2_000_000, 2_000_000),
)
@settings(max_examples=100, deadline=None)
def test_arith2_fragment_matches_python(arith_op, cmp_op, rhs_num):
    """The two-variable arithmetic fragment (arith2_sql — the exact
    string both engines run) must agree with pure-Python over all id
    pairs: either side outside the numeric window NULLs the expression
    and the pair drops; inside, + − * are exact int64."""
    import duckdb

    from dream_spark.sources.triples import BASE_SIZE_LIT, BASE_SUPPLIER, arith2_sql

    ids = [5, BASE_SIZE_LIT, BASE_SIZE_LIT + 7, BASE_SIZE_LIT + 699_999,
           BASE_SUPPLIER, 100_000_001]
    expr = arith2_sql("a", arith_op, "b")
    sqlop = "<>" if cmp_op == "!=" else cmp_op
    # CAST to BIGINT like the real triples columns: bare VALUES literals
    # are INT32 in DuckDB and 699999² would overflow the test harness
    rows = ", ".join(
        f"(CAST({x} AS BIGINT), CAST({y} AS BIGINT))" for x in ids for y in ids
    )
    got = set(
        duckdb.connect()
        .execute(f"SELECT a, b FROM (VALUES {rows}) t(a, b) WHERE {expr} {sqlop} {rhs_num}")
        .fetchall()
    )
    pyops = {
        "=": lambda a, b: a == b, "!=": lambda a, b: a != b,
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    }
    want = set()
    for x in ids:
        for y in ids:
            if not (BASE_SIZE_LIT <= x < BASE_SUPPLIER) or not (
                BASE_SIZE_LIT <= y < BASE_SUPPLIER
            ):
                continue  # a non-numeric side NULLs the whole expression
            vx, vy = x - BASE_SIZE_LIT, y - BASE_SIZE_LIT
            val = {"+": vx + vy, "-": vx - vy, "*": vx * vy}[arith_op]
            if pyops[cmp_op](val, rhs_num):
                want.add((x, y))
    assert got == want


@given(
    st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
    st.integers(-100, 100),
    st.integers(-1000, 1000),
    st.integers(-1000, 1000),
)
@settings(max_examples=100, deadline=None)
def test_if_numeric_fragment_matches_python(op, rhs_num, then_num, else_num):
    """The IF() BIND fragment (if_numeric_sql) must agree with Python:
    non-numeric ids leave the alias NULL (condition type error), numeric
    ids take then/else by the comparison."""
    import duckdb

    from dream_spark.sources.triples import BASE_SIZE_LIT, BASE_SUPPLIER, if_numeric_sql

    ids = [5, BASE_SIZE_LIT, BASE_SIZE_LIT + 50, BASE_SUPPLIER - 1,
           BASE_SUPPLIER, 100_000_001]
    expr = if_numeric_sql("v", op, rhs_num, then_num, else_num)
    vals = ", ".join(f"({i})" for i in ids)
    got = dict(
        duckdb.connect()
        .execute(f"SELECT v, {expr} FROM (VALUES {vals}) t(v)")
        .fetchall()
    )
    pyops = {
        "=": lambda a, b: a == b, "!=": lambda a, b: a != b,
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    }
    for i in ids:
        if not (BASE_SIZE_LIT <= i < BASE_SUPPLIER):
            assert got[i] is None  # type error → unbound
        else:
            val = i - BASE_SIZE_LIT
            assert got[i] == (then_num if pyops[op](val, rhs_num) else else_num)


# ---------------------------------------------------------------------------
# Funnel semantics vs a pure-Python reference on random event streams
# ---------------------------------------------------------------------------
_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),                 # user
        st.integers(0, 50),                # second
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=40,
)


def _funnel_reference(rows, steps=("view", "click", "purchase")):
    """Sequential conditional-min reference, per user."""
    users = sorted({u for u, _, _ in rows})
    counts = [0] * len(steps)
    for u in users:
        prev = None
        for i, step in enumerate(steps):
            ts = [t for uu, t, e in rows if uu == u and e == step and (prev is None or t >= prev)]
            if i == 0:
                ts = [t for uu, t, e in rows if uu == u and e == step]
            if not ts:
                break
            prev = min(ts)
            counts[i] += 1
    return counts


@given(_events_strategy)
@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_funnel_matches_reference(spark, rows):
    from pyspark.sql import functions as F

    from dream_spark.operators.temporal import funnel

    ev = spark.createDataFrame(rows, "user_id long, sec long, event_type string").select(
        "user_id", F.timestamp_seconds("sec").alias("ts"), "event_type"
    )
    got = [r["n_users"] for r in funnel(ev).orderBy("stage_idx").collect()]
    assert got == _funnel_reference(rows)


# ---------------------------------------------------------------------------
# Spark: bucketed range join vs exhaustive reference
# ---------------------------------------------------------------------------
@given(_left_rows, _right_rows)
@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_range_join_matches_reference(spark, left_rows, right_rows):
    """The bucketed band join must emit EXACTLY the pairs with the same key
    and lts < rts <= lts + W, each exactly once (bucket membership must
    neither drop boundary pairs nor double-count)."""
    from pyspark.sql import functions as F

    from dream_spark.operators.temporal import range_join

    W_US = 60 * 1_000_000  # 60 s window over second-granularity data
    left = spark.createDataFrame(left_rows, "k long, lsec long").select(
        "k", F.timestamp_seconds("lsec").alias("lts"), F.col("lsec")
    )
    right = spark.createDataFrame(right_rows, "k long, rsec long").select(
        "k", F.timestamp_seconds("rsec").alias("rts"), F.col("rsec")
    )
    got = sorted(
        (r["k"], r["lsec"], r["rsec"])
        for r in range_join(
            left, right, on="k", left_ts="lts", right_ts="rts", window_us=W_US
        ).collect()
    )
    want = sorted(
        (lk, ls, rs)
        for lk, ls in left_rows
        for rk, rs in right_rows
        if lk == rk and ls < rs <= ls + 60
    )
    assert got == want


# ---------------------------------------------------------------------------
# driver-side: streaming session islands vs batch gaps-and-islands
# ---------------------------------------------------------------------------
_event_times = st.lists(st.integers(0, 1000), min_size=1, max_size=40)


def _batch_islands(times, gap):
    out = []
    for t in sorted(times):
        if out and t - out[-1][1] <= gap:
            s, _l, n = out[-1]
            out[-1] = (s, t, n + 1)
        else:
            out.append((t, t, 1))
    return out


@given(_event_times, st.integers(1, 50))
@settings(max_examples=100, deadline=None)
def test_merge_session_islands_matches_batch(times, gap):
    """Feeding ALL events as single-event intervals must reproduce the
    batch gaps-and-islands exactly: closed islands + the open last one."""
    from dream_spark.streaming.events import merge_session_islands

    closed, open_sess = merge_session_islands([(t, t, 1) for t in times], gap)
    assert closed + [open_sess] == _batch_islands(times, gap)


@given(_event_times, st.integers(1, 50), st.integers(0, 40))
@settings(max_examples=100, deadline=None)
def test_merge_session_islands_two_batch_split(times, gap, split):
    """A time-ordered split of the same events across two micro-batches
    (second batch arriving with the first batch's open island as state)
    must emit the SAME island set as a single batch — the guaranteed-exact
    case of the streaming contract (out-of-order arrivals within the span
    an island already compressed are the documented approximation)."""
    from dream_spark.streaming.events import merge_session_islands

    b1 = sorted(times)[: split % (len(times) + 1)]
    b2 = sorted(times)[split % (len(times) + 1) :]
    closed1, open1 = merge_session_islands([(t, t, 1) for t in b1], gap)
    items2 = [(t, t, 1) for t in b2]
    if open1 is not None:
        items2.append(open1)
    closed2, open2 = merge_session_islands(items2, gap)
    combined = closed1 + closed2 + ([open2] if open2 else [])
    assert sorted(combined) == _batch_islands(times, gap)


# ---------------------------------------------------------------------------
# driver-side: recursive boolean FILTER grammar — parse-shape round trip
# ---------------------------------------------------------------------------
_ATOMS = [
    ("?SZ < 10", "arith"),
    ("?SZ >= 25", "arith"),
    ("?SZ * 2 = 40", "arith"),
    ("bound(?SZ)", "bound"),
    ("?P = <part:1>", "cmp"),
    ("?P in (<part:1>, <part:2>)", "in"),
    ("sameTerm(?P, <part:3>)", "cmp"),
]

bool_tree = st.recursive(
    st.sampled_from(range(len(_ATOMS))),
    lambda kids: st.tuples(
        st.sampled_from(["||", "&&", "!"]),
        st.lists(kids, min_size=1, max_size=3),
    ),
    max_leaves=8,
)


def _render(node) -> str:
    if isinstance(node, int):
        return _ATOMS[node][0]
    op, kids = node
    if op == "!":
        return "!(" + _render(kids[0]) + ")"
    return "(" + f" {op} ".join(_render(k) for k in kids) + ")"


def _shape(node):
    """Expected Filter shape: single-kid connectives collapse to the kid
    (rendering one operand emits no connective), '!' keeps only its first
    kid (the renderer drops the rest)."""
    if isinstance(node, int):
        return _ATOMS[node][1]
    op, kids = node
    if op == "!":
        return ("!", [_shape(kids[0])])
    if len(kids) == 1:
        return _shape(kids[0])
    return (op, [_shape(k) for k in kids])


def _filter_shape(f):
    if f.kind == "boolop":
        return (f.op, [_filter_shape(p) for p in f.parts])
    return f.kind


@given(bool_tree)
@settings(max_examples=100, deadline=None)
def test_boolop_grammar_parse_shape_roundtrip(tree):
    """Any explicitly-grouped boolean tree over the row-local atoms parses
    to exactly the tree's boolop shape — the recursive-grammar contract
    (connectives split at the right level, ! binds its group, atoms keep
    their single-clause kinds)."""
    from dream_spark.plans.sparql import parse_sparql

    q = (
        "select ?P ?SZ where { ?P type Part . ?P size ?SZ . filter ("
        + _render(tree)
        + ") }"
    )
    parsed = parse_sparql(q)
    assert len(parsed.filters) == 1
    assert _filter_shape(parsed.filters[0]) == _shape(tree)


# ---------------------------------------------------------------------------
# Spark-side: randomized BGPs vs the DuckDB oracle (join-order machinery)
# ---------------------------------------------------------------------------
# entity-linking predicates with their (subject kind, object kind) — the
# generator chains them so every random BGP is CONNECTED and anchored,
# keeping result sizes tractable at sf0.001
_PRED_SIG = {
    "inNation": ("CN", "N"),   # customer-or-supplier -> nation
    "inRegion": ("N", "R"),
    "placedBy": ("O", "C"),
    "ofOrder": ("L", "O"),
    "ofPart": ("L", "P"),
    "suppliedBy": ("L", "S"),
    "status": ("O", "ST"),
    "priority": ("O", "PR"),
    "size": ("P", "SZ"),
    "mktsegment": ("C", "MS"),
}
_ANCHORS = ["<nation:3>", "<customer:17>", "<order:40>", "<part:5>"]
_ANCHOR_KIND = {"<nation:3>": "N", "<customer:17>": "C", "<order:40>": "O", "<part:5>": "P"}


@st.composite
def _bgp(draw):
    preds = draw(
        st.lists(st.sampled_from(sorted(_PRED_SIG)), min_size=2, max_size=4)
    )
    # variable names by kind keep the chain connected: two patterns whose
    # signatures share a kind share that variable
    def var(kind: str) -> str:
        return f"?V{kind}"

    pats, used = [], set()
    for p in preds:
        sk, ok = _PRED_SIG[p]
        sk = "C" if sk == "CN" and draw(st.booleans()) else ("S" if sk == "CN" else sk)
        pats.append((var(sk), p, var(ok)))
        used.update((var(sk), var(ok)))
    # optionally ground ONE endpoint with a matching-kind constant
    if draw(st.booleans()):
        for const, kind in _ANCHOR_KIND.items():
            if var(kind) in used:
                i, (s, p, o) = next(
                    (i, t) for i, t in enumerate(pats) if var(kind) in (t[0], t[2])
                )
                pats[i] = (const if s == var(kind) else s, p, const if o == var(kind) else o)
                break
    # connectivity check: union-find over shared variables (disconnected
    # BGPs are legal but cross-product-sized — out of scope here)
    comp = {}
    def find(x):
        while comp.get(x, x) != x:
            x = comp[x]
        return x
    for i, (s, p, o) in enumerate(pats):
        comp.setdefault(f"#{i}", f"#{i}")
        for t in (s, o):
            if t.startswith("?"):
                comp.setdefault(t, t)
                comp[find(t)] = find(f"#{i}")
    roots = {find(f"#{i}") for i in range(len(pats))}
    if len(roots) > 1:
        # connect by renaming ONE variable of each extra component to a
        # base-component variable — renamed at EVERY occurrence within
        # its component, so the component stays internally connected
        # (renaming just one pattern's slot would sever its siblings)
        base = pats[0][0] if pats[0][0].startswith("?") else pats[0][2]
        base_root = find("#0")
        rename: dict[str, str] = {}
        for i, (s, p, o) in enumerate(pats):
            r = find(f"#{i}")
            if r == base_root or r in rename:
                continue
            v = s if s.startswith("?") else o  # every pattern has ≥1 var
            rename[r] = v
        pats = [
            (
                base if s == rename.get(find(f"#{i}")) else s,
                p,
                base if o == rename.get(find(f"#{i}")) else o,
            )
            for i, (s, p, o) in enumerate(pats)
        ]
    return pats


@given(_bgp())
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_bgp_matches_oracle(engine, duck, pats):
    """Random connected BGPs over the entity vocabulary answer identically
    on both engines — the DP join order, the exact-stats broadcast gate,
    and AQE's runtime choices must never change the RESULT."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import parse_sparql
    from tests.conftest import assert_oracle_match

    # generator contract: the BGP is CONNECTED (cross products are out of
    # scope here — they'd blow up result sizes, not exercise join order)
    reach = {0}
    grew = True
    while grew:
        grew = False
        vs = {t for i in reach for t in (pats[i][0], pats[i][2]) if t.startswith("?")}
        for i, (s, p, o) in enumerate(pats):
            if i not in reach and ({s, o} & vs):
                reach.add(i)
                grew = True
    assert reach == set(range(len(pats))), pats

    proj = sorted({t for s, p, o in pats for t in (s, o) if t.startswith("?")})
    body = " . ".join(f"{s} {p} {o}" for s, p, o in pats)
    q = f"select {' '.join(proj)} where {{ {body} }}"
    parsed = parse_sparql(q)
    df = engine.sparql(q, decode=False)
    n = df.count()
    if n > 300_000:  # pathological blowup guard: counts still compared
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({bgp_to_sql(parsed, decode=False)})"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


@given(_bgp(), st.booleans())
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_bgp_with_optional_matches_oracle(engine, duck, pats, tail):
    """The left-join lowering fuzzed: move one end pattern of a random
    connected BGP into an OPTIONAL group (when the remainder stays
    connected and shares a variable with it) and compare engines — the
    NULL-extension semantics must agree row-for-row."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    if len(pats) < 3:
        return
    idx = len(pats) - 1 if tail else 1
    opt, rest = pats[idx], pats[:idx] + pats[idx + 1 :]

    def connected(ps):
        reach = {0}
        grew = True
        while grew:
            grew = False
            vs = {t for i in reach for t in (ps[i][0], ps[i][2]) if t.startswith("?")}
            for i, (s, p, o) in enumerate(ps):
                if i not in reach and ({s, o} & vs):
                    reach.add(i)
                    grew = True
        return reach == set(range(len(ps)))

    rest_vars = {t for s, p, o in rest for t in (s, o) if t.startswith("?")}
    opt_vars = {t for t in (opt[0], opt[2]) if t.startswith("?")}
    if not connected(rest) or not (opt_vars & rest_vars):
        return  # the split would change semantics class; skip this draw
    proj = sorted(rest_vars | opt_vars)
    body = " . ".join(f"{s} {p} {o}" for s, p, o in rest)
    q = (
        f"select {' '.join(proj)} where {{ {body} ."
        f" optional {{ {opt[0]} {opt[1]} {opt[2]} }} }}"
    )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return  # e.g. the optional's only NEW var duplicated elsewhere
    df = engine.sparql(q, decode=False)
    if df.count() > 300_000:
        return
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


# ---------------------------------------------------------------------------
# Spark-side: depth-3 boolean-connective FILTER trees vs the DuckDB oracle
# ---------------------------------------------------------------------------
# Constant pools by variable kind for comparison/IN leaves.  Deliberately
# includes ids outside the data's range and lexicals that may not resolve:
# an unknown term lowers to the shared UNKNOWN_ID sentinel on BOTH engines
# (unequal to everything, never an error), so those draws probe the
# boundary instead of breaking the comparison.
_KIND_CONSTS = {
    "N": ["<nation:1>", "<nation:7>", "<nation:19>", "<nation:3>", "<nation:9999>"],
    "R": ["<region:0>", "<region:1>", "<region:4>"],
    "ST": ["<F>", "<O>", "<P>"],
    "PR": ["<1-URGENT>", "<2-HIGH>", "<3-MEDIUM>", "<5-LOW>"],
    "C": ["<customer:17>", "<customer:1>", "<customer:5>"],
    "O": ["<order:40>", "<order:1>", "<order:8>"],
    "P": ["<part:5>", "<part:2>", "<part:9>"],
    "S": ["<supplier:1>", "<supplier:3>"],
    "MS": ["<BUILDING>", "<AUTOMOBILE>", "<MACHINERY>"],
}
_CMP_OPS = ["=", "!=", "<", "<=", ">", ">="]


@st.composite
def _filter_leaf(draw, vars_by_kind: dict[str, str]):
    """One row-local connective operand over the BGP's variables: id
    comparison (const or var-var), sameTerm, IN / NOT IN, typed-numeric
    arithmetic (single- and two-variable), or bound()."""
    kinds = sorted(vars_by_kind)
    pooled = [k for k in kinds if k in _KIND_CONSTS]
    choices = ["varvar", "sameterm", "bound", "isnum", "arith", "arith2"]
    if pooled:
        choices += ["cmp", "cmp", "in"]  # weight toward the id layer
    form = draw(st.sampled_from(choices))
    if form == "cmp":
        k = draw(st.sampled_from(pooled))
        return f"{vars_by_kind[k]} {draw(st.sampled_from(_CMP_OPS))} {draw(st.sampled_from(_KIND_CONSTS[k]))}"
    if form == "in":
        k = draw(st.sampled_from(pooled))
        pool = _KIND_CONSTS[k]
        n = draw(st.integers(2, min(3, len(pool))))
        items = draw(st.permutations(pool))[:n]
        neg = draw(st.sampled_from(["", "not "]))
        return f"{vars_by_kind[k]} {neg}in ({', '.join(items)})"
    if form == "varvar":
        a, b = draw(st.sampled_from(kinds)), draw(st.sampled_from(kinds))
        return f"{vars_by_kind[a]} {draw(st.sampled_from(_CMP_OPS))} {vars_by_kind[b]}"
    if form == "sameterm":
        a, b = draw(st.sampled_from(kinds)), draw(st.sampled_from(kinds))
        neg = draw(st.sampled_from(["", "!"]))
        return f"{neg}sameTerm({vars_by_kind[a]}, {vars_by_kind[b]})"
    if form == "bound":
        # every BGP var is bound (no OPTIONAL here) — a constant-outcome
        # leaf, which is exactly what shakes out short-circuit bugs
        neg = draw(st.sampled_from(["", "!"]))
        return f"{neg}bound({vars_by_kind[draw(st.sampled_from(kinds))]})"
    if form == "isnum":
        # type introspection: true only for ids in the numeric-literal
        # window (SZ values), false for every entity/enum id
        neg = draw(st.sampled_from(["", "!"]))
        return f"{neg}isNumeric({vars_by_kind[draw(st.sampled_from(kinds))]})"
    if form == "arith":
        # typed-numeric value layer; a non-numeric id values to NULL and
        # the row drops (the SPARQL type-error contract) on BOTH engines,
        # so drawing a non-SZ var here probes the error path on purpose
        k = "SZ" if "SZ" in vars_by_kind and draw(st.booleans()) else draw(st.sampled_from(kinds))
        v = vars_by_kind[k]
        op = draw(st.sampled_from(_CMP_OPS))
        rhs = draw(st.integers(-10, 60))
        if draw(st.booleans()):
            return f"{v} {draw(st.sampled_from('+-*'))} {draw(st.integers(1, 9))} {op} {rhs}"
        return f"{v} {op} {rhs}"
    # arith2: (?a op ?b) cmp k, optionally abs-wrapped
    a, b = draw(st.sampled_from(kinds)), draw(st.sampled_from(kinds))
    expr = f"{vars_by_kind[a]} {draw(st.sampled_from('+-*'))} {vars_by_kind[b]}"
    op = draw(st.sampled_from(_CMP_OPS))
    rhs = draw(st.integers(-10, 60))
    if draw(st.booleans()):
        return f"abs({expr}) {'>=' if op in ('=', '!=') else op} {rhs}"
    # grammar: the two-variable arithmetic operand is unparenthesized
    # (?a + ?b cmp k); a parenthesized expression is not a filter form
    return f"{expr} {op} {rhs}"


@st.composite
def _filter_tree(draw, vars_by_kind: dict[str, str], depth: int):
    """Random boolean tree to ``depth``: leaves from :func:`_filter_leaf`,
    inner nodes !/||/&& with explicit grouping (mixed connectives at one
    level require parens, which the renderer always emits)."""
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        return draw(_filter_leaf(vars_by_kind))
    op = draw(st.sampled_from(["||", "&&", "!"]))
    if op == "!":
        return f"!({draw(_filter_tree(vars_by_kind, depth - 1))})"
    n = draw(st.integers(2, 3))
    parts = [draw(_filter_tree(vars_by_kind, depth - 1)) for _ in range(n)]
    return "(" + f" {op} ".join(parts) + ")"


@st.composite
def _bgp_with_filter(draw):
    pats = draw(_bgp())
    vars_by_kind = {}
    for s, p, o in pats:
        for t in (s, o):
            if t.startswith("?"):
                vars_by_kind[t[2:]] = t  # kind = var name minus "?V"
    tree = draw(_filter_tree(vars_by_kind, depth=3))
    return pats, tree


@pytest.mark.slow
@given(_bgp_with_filter())
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_boolean_filter_matches_oracle(engine, duck, case):
    """VERDICT r5 task 6: the boolean-connective FILTER layer fuzzed to
    depth 3 — random ||/&&/!/IN/sameTerm/bound/arithmetic trees over random
    typed-value and id operands on random connected BGPs must answer
    identically on both engines (three-valued logic, the typed-numeric
    NULL-drop contract, and unknown-term sentinels included)."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import parse_sparql
    from tests.conftest import assert_oracle_match

    pats, tree = case
    proj = sorted({t for s, p, o in pats for t in (s, o) if t.startswith("?")})
    body = " . ".join(f"{s} {p} {o}" for s, p, o in pats)
    q = f"select {' '.join(proj)} where {{ {body} . filter ({tree}) }}"
    parsed = parse_sparql(q)
    df = engine.sparql(q, decode=False)
    n = df.count()
    if n > 300_000:  # pathological BGP blowup guard: counts still compared
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({bgp_to_sql(parsed, decode=False)})"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


# ---------------------------------------------------------------------------
# N-Triples writer/parser roundtrip over arbitrary lexicals
# ---------------------------------------------------------------------------
# exportable lexicals: anything non-empty without unassigned surrogates;
# subjects/predicates additionally need an IRIREF rendering (the writer
# fails fast otherwise — that contract has its own test)
_sp_ok = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters='\x00'),
    min_size=1,
    max_size=24,
).filter(lambda s: not any(ch in ' \t\n\r<>"{}|^`\\' for ch in s) and not any(ord(c) <= 0x20 for c in s))
_obj_ok = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters='\x00'),
    min_size=1,
    max_size=24,
)


@pytest.mark.slow
@given(st.lists(st.tuples(_sp_ok, _sp_ok, _obj_ok), min_size=1, max_size=8, unique=True))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ntriples_roundtrip_preserves_arbitrary_lexicals(spark, triple_lexicals):
    """write_ntriples -> load_ntriples preserves the triple multiset at
    the LEXICAL level for arbitrary terms: ECHAR escaping, the urn:x-lex:
    minting/doubling convention, and IRIREF validation must compose to a
    lossless fixed point (blank-node-shaped subjects excluded — `_:x`
    passes through as a label, a different, documented channel)."""
    import tempfile

    from dream_spark.sources.ntriples import load_ntriples, write_ntriples
    from dream_spark.sources.triples import TripleStore

    triple_lexicals = [
        (s, p, o) for s, p, o in triple_lexicals if not s.startswith("_:")
    ]
    if not triple_lexicals:
        return
    lex = sorted({x for t in triple_lexicals for x in t})
    ids = {x: i + 1 for i, x in enumerate(lex)}
    triples = spark.createDataFrame(
        [(ids[s], ids[p], ids[o]) for s, p, o in triple_lexicals],
        "s long, p long, o long",
    )
    dict_df = spark.createDataFrame(list(ids.items()), "lexical string, id long")
    store = TripleStore(spark, triples, dict_df.select("id", "lexical"), resolver=None)
    with tempfile.TemporaryDirectory() as base:
        out = f"{base}/fuzz.nt"
        write_ntriples(store, out, max_files=1)
        nt = load_ntriples(spark, out)
        back = {r["id"]: r["lexical"] for r in nt.dictionary.collect()}
        got = sorted(
            (back[r["s"]], back[r["p"]], back[r["o"]]) for r in nt.triples.collect()
        )
        assert got == sorted(triple_lexicals)


@st.composite
def _bgp_optional_with_filter(draw):
    """Random connected BGP with one end pattern moved into OPTIONAL and a
    depth-2 boolean tree over ALL variables — including the optional-only
    ones, which can be UNBOUND: the three-valued-logic surface (bound /
    isNumeric / comparisons over NULL) the all-bound fuzzer never reaches."""
    from hypothesis import assume

    pats = draw(_bgp())
    assume(len(pats) >= 3)  # retry the draw, don't burn it as a vacuous pass

    def connected(ps):
        reach = {0}
        grew = True
        while grew:
            grew = False
            vs = {t for i in reach for t in (ps[i][0], ps[i][2]) if t.startswith("?")}
            for i, (s, p, o) in enumerate(ps):
                if i not in reach and ({s, o} & vs):
                    reach.add(i)
                    grew = True
        return reach == set(range(len(ps)))

    # try EVERY split point before rejecting: most draws admit some valid
    # (connected remainder, shared variable) split even when a random one
    # does not — maximizing real (non-assumed) examples per run
    first = draw(st.integers(1, len(pats) - 1))
    opt = rest = None
    for off in range(len(pats) - 1):
        idx = 1 + (first - 1 + off) % (len(pats) - 1)
        cand_opt, cand_rest = pats[idx], pats[:idx] + pats[idx + 1 :]
        r_vars = {t for s, p, o in cand_rest for t in (s, o) if t.startswith("?")}
        o_vars = {t for t in (cand_opt[0], cand_opt[2]) if t.startswith("?")}
        if connected(cand_rest) and (o_vars & r_vars):
            opt, rest = cand_opt, cand_rest
            break
    assume(opt is not None)
    vars_by_kind = {}
    for s, p, o in rest + [opt]:
        for t in (s, o):
            if t.startswith("?"):
                vars_by_kind[t[2:]] = t
    tree = draw(_filter_tree(vars_by_kind, depth=2))
    return rest, opt, tree


@pytest.mark.slow
@given(_bgp_optional_with_filter())
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_filter_over_optional_matches_oracle(engine, duck, case):
    """Boolean trees over potentially-UNBOUND variables: the NULL rows an
    OPTIONAL produces must flow through bound()/isNumeric()/comparisons/
    connectives with identical three-valued outcomes on both engines."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    rest, opt, tree = case
    proj = sorted(
        {t for s, p, o in rest + [opt] for t in (s, o) if t.startswith("?")}
    )
    body = " . ".join(f"{s} {p} {o}" for s, p, o in rest)
    q = (
        f"select {' '.join(proj)} where {{ {body} ."
        f" optional {{ {opt[0]} {opt[1]} {opt[2]} }} . filter ({tree}) }}"
    )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return  # e.g. the optional's only new var duplicated elsewhere
    df = engine.sparql(q, decode=False)
    if df.count() > 300_000:
        return
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


# ---------------------------------------------------------------------------
# Spark-side: property-path markers fuzzed over random connected BGPs
# ---------------------------------------------------------------------------
@st.composite
def _bgp_with_path(draw):
    """Random connected BGP with ONE pattern's predicate upgraded to a
    closure marker (+ / * / ?) — fuzzing the semi-naive closure, the
    zero-length identity domains (sibling-restricted AND constant-
    anchored, the machinery the r6 spec fix changed), and their
    recursive/anchored oracle CTEs."""
    pats = draw(_bgp())
    idx = draw(st.integers(0, len(pats) - 1))
    marker = draw(st.sampled_from(["+", "*", "?"]))
    s, p, o = pats[idx]
    pats = pats[:idx] + [(s, p + marker, o)] + pats[idx + 1 :]
    return pats


@pytest.mark.slow
@given(_bgp_with_path())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_path_bgp_matches_oracle(engine, duck, pats):
    """p+/p*/p? dropped into arbitrary join positions — variable-variable,
    sibling-bound, and constant-anchored endpoints — must answer
    identically on both engines (closure frame ∪ identity vs the
    recursive + anchored CTEs)."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    proj = sorted({t for s, p, o in pats for t in (s, o) if t.startswith("?")})
    body = " . ".join(f"{s} {p} {o}" for s, p, o in pats)
    q = f"select {' '.join(proj)} where {{ {body} }}"
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return  # e.g. a marker on a variable-predicate pattern
    df = engine.sparql(q, decode=False)
    n = df.count()
    if n > 300_000:
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({bgp_to_sql(parsed, decode=False)})"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


# ---------------------------------------------------------------------------
# Spark-side: property paths composed UNDER OPTIONAL / inside EXISTS
# (VERDICT r7 task 5: the closure-frame cache and the identity-domain
# restriction interact with group nesting, translator.py:48-231)
# ---------------------------------------------------------------------------
@st.composite
def _path_composed(draw):
    """Random connected BGP carrying one closure-marked pattern, with one
    pattern (half the time the PATH pattern itself, half a plain sibling)
    pushed under OPTIONAL (depth 1), nested OPTIONAL { .. OPTIONAL { } }
    (depth 2), a FILTER [NOT] EXISTS group, or a MINUS group — the
    composition square of zero-length identity domains × left-join NULL
    extension × semi/anti substitution × set-difference semantics."""
    from hypothesis import assume

    pats = draw(_bgp_with_path())
    assume(len(pats) >= 3)
    path_idx = next(i for i, (s, p, o) in enumerate(pats) if p[-1] in "+*?")
    idx = path_idx if draw(st.booleans()) else draw(st.integers(0, len(pats) - 1))
    inner, rest = pats[idx], pats[:idx] + pats[idx + 1 :]

    def connected(ps):
        reach = {0}
        grew = True
        while grew:
            grew = False
            vs = {t for i in reach for t in (ps[i][0], ps[i][2]) if t.startswith("?")}
            for i, (s, p, o) in enumerate(ps):
                if i not in reach and ({s, o} & vs):
                    reach.add(i)
                    grew = True
        return reach == set(range(len(ps)))

    rest_vars = {t for s, p, o in rest for t in (s, o) if t.startswith("?")}
    inner_vars = {t for t in (inner[0], inner[2]) if t.startswith("?")}
    assume(rest and connected(rest) and (inner_vars & rest_vars))

    mode = draw(
        st.sampled_from(["optional", "optional2", "exists", "not_exists", "minus"])
    )
    mid = None
    if mode == "optional2":
        # pull a second pattern out for the middle OPTIONAL level; fall
        # back to depth 1 when no split keeps every level connected
        j = draw(st.integers(0, len(rest) - 1))
        cand_mid, rest2 = rest[j], rest[:j] + rest[j + 1 :]
        mid_vars = {t for t in (cand_mid[0], cand_mid[2]) if t.startswith("?")}
        rest2_vars = {t for s, p, o in rest2 for t in (s, o) if t.startswith("?")}
        if (
            rest2
            and connected(rest2)
            and (mid_vars & rest2_vars)
            and (inner_vars & (mid_vars | rest2_vars))
        ):
            mid, rest = cand_mid, rest2
        else:
            mode = "optional"
    return rest, mid, inner, mode


@pytest.mark.slow
@given(_path_composed())
@settings(max_examples=18, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_path_under_optional_and_exists_matches_oracle(engine, duck, case):
    """p+/p*/p? under OPTIONAL (both depths) and inside [NOT] EXISTS must
    answer identically on both engines: the zero-length path's identity
    domain is computed inside the nested group, the left join NULL-extends
    it, and EXISTS substitution correlates through it.  Compositions the
    oracle renderer documents as unsupported (path CTEs under specific
    nestings, plans/oracle.py) are skipped — the skip is visible in the
    draw statistics, not silent."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    rest, mid, inner, mode = case
    rest_body = " . ".join(f"{s} {p} {o}" for s, p, o in rest)
    rest_vars = {t for s, p, o in rest for t in (s, o) if t.startswith("?")}
    inner_vars = {t for t in (inner[0], inner[2]) if t.startswith("?")}
    if mode == "optional":
        proj = sorted(rest_vars | inner_vars)
        q = (
            f"select {' '.join(proj)} where {{ {rest_body} ."
            f" optional {{ {inner[0]} {inner[1]} {inner[2]} }} }}"
        )
    elif mode == "optional2":
        mid_vars = {t for t in (mid[0], mid[2]) if t.startswith("?")}
        proj = sorted(rest_vars | mid_vars | inner_vars)
        q = (
            f"select {' '.join(proj)} where {{ {rest_body} ."
            f" optional {{ {mid[0]} {mid[1]} {mid[2]} ."
            f" optional {{ {inner[0]} {inner[1]} {inner[2]} }} }} }}"
        )
    elif mode == "minus":
        proj = sorted(rest_vars)
        q = (
            f"select {' '.join(proj)} where {{ {rest_body} ."
            f" minus {{ {inner[0]} {inner[1]} {inner[2]} }} }}"
        )
    else:
        kw = "exists" if mode == "exists" else "not exists"
        proj = sorted(rest_vars)
        q = (
            f"select {' '.join(proj)} where {{ {rest_body} ."
            f" filter {kw} {{ {inner[0]} {inner[1]} {inner[2]} }} }}"
        )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    try:
        oracle = bgp_to_sql(parsed, decode=False)
    except NotImplementedError:
        # documented unsupported oracle composition: still require the
        # ENGINE to execute it without error
        _oracle_reach("path_under_optional_and_exists", False)
        assert df.count() >= 0
        return
    _oracle_reach("path_under_optional_and_exists", True)
    if df.count() > 300_000:
        return
    assert_oracle_match(df, duck, oracle)


# ---------------------------------------------------------------------------
# Spark-side: aggregates over UNION (r8) — branch-private variables arrive
# NULL-padded in the other branch's rows, so COUNT(v)/SUM(v)'s NULL-skipping
# and COUNT(*)'s NULL-keeping compose with the bag union's multiplicity
# ---------------------------------------------------------------------------
@st.composite
def _agg_over_union(draw):
    from hypothesis import assume

    pats_a = draw(_bgp())
    pats_b = draw(_bgp())
    va = {t for s, p, o in pats_a for t in (s, o) if t.startswith("?")}
    vb = {t for s, p, o in pats_b for t in (s, o) if t.startswith("?")}
    shared, union_vars = sorted(va & vb), sorted(va | vb)
    n_keys = draw(st.integers(0, min(2, len(shared))))
    keys = sorted(draw(st.permutations(shared))[:n_keys]) if shared else []
    n_aggs = draw(st.integers(1, 3))
    # r10 (VERDICT r9 task 5b): SUM/AVG/GROUP_CONCAT/SAMPLE join the draw —
    # sum/avg exercise the typed numeric-value layer over NULL-padded
    # branch-private vars (non-numeric → NULL, skipped identically), sample
    # is the deterministic MIN-over-ids contract, group_concat the decoded
    # sorted-join contract — each composed with bag-union multiplicity
    aggs, seen = [], set()
    for i in range(n_aggs):
        form = draw(st.sampled_from([
            "count", "count_distinct", "count_star", "min", "max",
            "sum", "avg", "sample", "group_concat",
        ]))
        # weight toward branch-PRIVATE vars (the NULL-padded surface)
        private = sorted((va ^ vb))
        v = draw(st.sampled_from(private)) if private and draw(st.booleans()) else draw(
            st.sampled_from(union_vars)
        )
        if (form, v) in seen:
            continue
        seen.add((form, v))
        alias = f"?a{i}"
        if form == "count_star":
            aggs.append(f"(count(*) as {alias})")
        elif form == "count_distinct":
            aggs.append(f"(count(distinct {v}) as {alias})")
        else:
            aggs.append(f"({form}({v}) as {alias})")
    assume(aggs)
    return pats_a, pats_b, keys, aggs


@pytest.mark.slow
@given(_agg_over_union())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_agg_over_union_matches_oracle(engine, duck, case):
    """GROUP BY + aggregates computed over {A} UNION {B}: COUNT/MIN/MAX
    skip the branch that never binds the argument, COUNT(*) keeps every
    padded row, implicit groups aggregate the whole bag union — engines
    must agree exactly."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    pats_a, pats_b, keys, aggs = case
    body_a = " . ".join(f"{s} {p} {o}" for s, p, o in pats_a)
    body_b = " . ".join(f"{s} {p} {o}" for s, p, o in pats_b)
    proj = " ".join(keys + aggs)
    group = f" group by {' '.join(keys)}" if keys else ""
    q = f"select {proj} where {{ {{ {body_a} }} union {{ {body_b} }} }}{group}"
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    try:
        oracle = bgp_to_sql(parsed, decode=False)
    except NotImplementedError:
        _oracle_reach("agg_over_union", False)
        assert df.count() >= 0
        return
    _oracle_reach("agg_over_union", True)
    if df.count() > 300_000:
        return
    assert_oracle_match(df, duck, oracle)


# ---------------------------------------------------------------------------
# Spark-side: aggregates + HAVING over OPTIONAL groups (VERDICT r6 task 7)
# ---------------------------------------------------------------------------
@st.composite
def _bgp_optional_with_agg(draw):
    """Random connected BGP with one end pattern moved into OPTIONAL, then
    a random aggregate SELECT over it: group keys drawn from the always-
    bound remainder vars (or NONE — the implicit group), 1–3 aggregates
    (count / count distinct / count(*) / min / max / sum) whose argument is
    weighted toward the optional-only variable (which can be UNBOUND — the
    NULL-skipping layer), and optionally a HAVING over count/sum.  This is
    the composition surface the per-entry queries only sample: implicit
    groups, typed-value SUM over non-numeric ids (NULL contribution), and
    three-valued HAVING all stacking on a left join."""
    from hypothesis import assume

    pats = draw(_bgp())
    assume(len(pats) >= 3)

    def connected(ps):
        reach = {0}
        grew = True
        while grew:
            grew = False
            vs = {t for i in reach for t in (ps[i][0], ps[i][2]) if t.startswith("?")}
            for i, (s, p, o) in enumerate(ps):
                if i not in reach and ({s, o} & vs):
                    reach.add(i)
                    grew = True
        return reach == set(range(len(ps)))

    first = draw(st.integers(1, len(pats) - 1))
    opt = rest = None
    for off in range(len(pats) - 1):
        idx = 1 + (first - 1 + off) % (len(pats) - 1)
        cand_opt, cand_rest = pats[idx], pats[:idx] + pats[idx + 1 :]
        r_vars = {t for s, p, o in cand_rest for t in (s, o) if t.startswith("?")}
        o_vars = {t for t in (cand_opt[0], cand_opt[2]) if t.startswith("?")}
        if connected(cand_rest) and (o_vars & r_vars):
            opt, rest = cand_opt, cand_rest
            break
    assume(opt is not None)

    rest_vars = sorted({t for s, p, o in rest for t in (s, o) if t.startswith("?")})
    opt_only = sorted(
        {t for t in (opt[0], opt[2]) if t.startswith("?")} - set(rest_vars)
    )
    all_vars = sorted(set(rest_vars) | set(opt_only))
    # group keys: 0 (implicit group), 1 or 2 of the always-bound vars
    n_keys = draw(st.integers(0, min(2, len(rest_vars))))
    keys = sorted(draw(st.permutations(rest_vars))[:n_keys])

    def agg_var():
        # 50/50 the optional-only var (NULL surface) when one exists
        if opt_only and draw(st.booleans()):
            return draw(st.sampled_from(opt_only))
        return draw(st.sampled_from(all_vars))

    n_aggs = draw(st.integers(1, 3))
    aggs, seen = [], set()
    for i in range(n_aggs):
        form = draw(st.sampled_from(
            ["count", "count_distinct", "count_star", "min", "max", "sum"]
        ))
        v = agg_var()
        if (form, v) in seen:
            continue
        seen.add((form, v))
        alias = f"?a{i}"
        if form == "count_star":
            aggs.append(f"(count(*) as {alias})")
        elif form == "count_distinct":
            aggs.append(f"(count(distinct {v}) as {alias})")
        else:
            aggs.append(f"({form}({v}) as {alias})")
    assume(aggs)

    having = ""
    if draw(st.booleans()):
        hv = agg_var()
        if draw(st.booleans()):
            having = f" having (count({hv}) {draw(st.sampled_from(['>', '>=', '=']))} {draw(st.integers(0, 4))})"
        else:
            having = f" having (sum({hv}) {draw(st.sampled_from(['>', '>=', '<']))} {draw(st.integers(-5, 500))})"
    return rest, opt, keys, aggs, having


@pytest.mark.slow
@given(_bgp_optional_with_agg())
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_agg_having_over_optional_matches_oracle(engine, duck, case):
    """Aggregates and HAVING stacked on a left join must agree with the
    oracle: COUNT skips the OPTIONAL's NULLs while COUNT(*) keeps them,
    SUM reads the typed numeric value (non-numeric ids contribute NULL),
    implicit groups aggregate the whole result, and HAVING filters groups
    by either layer — all on random connected BGPs."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    rest, opt, keys, aggs, having = case
    body = " . ".join(f"{s} {p} {o}" for s, p, o in rest)
    group = f" group by {' '.join(keys)}" if keys else ""
    q = (
        f"select {' '.join(keys + aggs)} where {{ {body} ."
        f" optional {{ {opt[0]} {opt[1]} {opt[2]} }} }}{group}{having}"
    )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return  # a composition the grammar rejects (its own contract tests)
    df = engine.sparql(q, decode=False)
    if df.count() > 300_000:
        return
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


# ---------------------------------------------------------------------------
# Spark-side: MINUS over random connected BGPs (set-difference semantics)
# ---------------------------------------------------------------------------
@st.composite
def _bgp_with_minus(draw):
    """Random connected BGP with one end pattern moved into MINUS.  Unlike
    the OPTIONAL fuzzers this does NOT require the moved pattern to share
    a variable with the remainder: per SPARQL §8.3.3 a MINUS group with a
    DISJOINT domain removes nothing (no shared bindings to be compatible
    on), and that spec corner is exactly what a fuzzer should reach —
    both engines must agree on the nothing-removed outcome as well as on
    the shared-variable anti-join."""
    from hypothesis import assume

    pats = draw(_bgp())
    assume(len(pats) >= 3)

    def connected(ps):
        reach = {0}
        grew = True
        while grew:
            grew = False
            vs = {t for i in reach for t in (ps[i][0], ps[i][2]) if t.startswith("?")}
            for i, (s, p, o) in enumerate(ps):
                if i not in reach and ({s, o} & vs):
                    reach.add(i)
                    grew = True
        return reach == set(range(len(ps)))

    first = draw(st.integers(1, len(pats) - 1))
    m = rest = None
    for off in range(len(pats) - 1):
        idx = 1 + (first - 1 + off) % (len(pats) - 1)
        cand_m, cand_rest = pats[idx], pats[:idx] + pats[idx + 1 :]
        if connected(cand_rest):
            m, rest = cand_m, cand_rest
            break
    assume(m is not None)
    return rest, m


@pytest.mark.slow
@given(_bgp_with_minus())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_minus_matches_oracle(engine, duck, case):
    """MINUS dropped at arbitrary join positions — shared-variable
    anti-join removal and the disjoint-domain nothing-removed corner —
    must answer identically on both engines."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    rest, m = case
    proj = sorted({t for s, p, o in rest for t in (s, o) if t.startswith("?")})
    body = " . ".join(f"{s} {p} {o}" for s, p, o in rest)
    q = (
        f"select {' '.join(proj)} where {{ {body} ."
        f" minus {{ {m[0]} {m[1]} {m[2]} }} }}"
    )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    if df.count() > 300_000:
        return
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


# ---------------------------------------------------------------------------
# Spark: cluster assembly path equality (small vs scale vs brute force)
# ---------------------------------------------------------------------------
def _brute_force_clusters(corpus, threshold=0.8):
    pairs = _brute_force_pairs(corpus, threshold)
    return set(_bfs_components(list(pairs)))


@given(_corpus)
@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_duplicate_clusters_paths_agree(spark, corpus):
    """duplicate_clusters must return the components of the brute-force
    J ≥ 0.8 pair graph on BOTH physical paths: the small path
    (CC(jaccard_pairs), ascending-sid order) and the conf-forced scale
    path (rarest-first order + star/remainder label-pruned verification).
    This is the randomized form of the label-pruning equality proof —
    the paths may verify very different pair subsets, the components may
    not differ."""
    from dream_spark.operators.dedup import JACCARD_SMALL_DOCS_CONF, duplicate_clusters

    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    want = _brute_force_clusters(corpus)
    spark.catalog.clearCache()  # drop pair sets cached by other examples
    small = {
        (r["doc_id"], r["cluster_id"]) for r in duplicate_clusters(docs).collect()
    }
    assert small == want
    spark.catalog.clearCache()
    spark.conf.set(JACCARD_SMALL_DOCS_CONF, "0")
    try:
        scale = {
            (r["doc_id"], r["cluster_id"]) for r in duplicate_clusters(docs).collect()
        }
    finally:
        spark.conf.unset(JACCARD_SMALL_DOCS_CONF)
        spark.catalog.clearCache()
    assert scale == want


# ---------------------------------------------------------------------------
# Spark-side: FILTER [NOT] EXISTS over random connected BGPs
# ---------------------------------------------------------------------------
@pytest.mark.slow
@given(_bgp_with_minus(), st.booleans())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_exists_matches_oracle(engine, duck, case, positive):
    """FILTER EXISTS / NOT EXISTS at arbitrary join positions — the
    semi/anti-join lowering with shared variables, plus the
    disjoint-domain corner where the group shares nothing with the outer
    bindings and the filter is constant true-iff-nonempty for every row
    (the substitution semantics of SPARQL §8.1.1 degenerate to an
    uncorrelated subquery there) — must answer identically on both
    engines.  Reuses the MINUS split strategy: same shape, different
    algebra (EXISTS keeps multiplicity, MINUS is set-difference)."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    rest, m = case
    proj = sorted({t for s, p, o in rest for t in (s, o) if t.startswith("?")})
    body = " . ".join(f"{s} {p} {o}" for s, p, o in rest)
    kw = "exists" if positive else "not exists"
    q = (
        f"select {' '.join(proj)} where {{ {body} ."
        f" filter {kw} {{ {m[0]} {m[1]} {m[2]} }} }}"
    )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    if df.count() > 300_000:
        return
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


# ---------------------------------------------------------------------------
# Spark-side: UNION over pairs of random connected BGPs
# ---------------------------------------------------------------------------
@pytest.mark.slow
@given(_bgp(), _bgp(), st.booleans())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_union_matches_oracle(engine, duck, pats_a, pats_b, distinct):
    """{A} UNION {B} over two independently drawn connected BGPs — bag
    UNION ALL semantics, NULL-padding of variables only one branch binds
    (the kind-derived variable names make branches overlap on SOME
    variables and differ on others, so both the aligned-column and the
    typed-NULL paths are exercised), and the DISTINCT-over-union variant
    — must answer identically on both engines."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    proj = sorted(
        {
            t
            for pats in (pats_a, pats_b)
            for s, p, o in pats
            for t in (s, o)
            if t.startswith("?")
        }
    )
    body_a = " . ".join(f"{s} {p} {o}" for s, p, o in pats_a)
    body_b = " . ".join(f"{s} {p} {o}" for s, p, o in pats_b)
    kw = "select distinct" if distinct else "select"
    q = f"{kw} {' '.join(proj)} where {{ {{ {body_a} }} union {{ {body_b} }} }}"
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    n = df.count()
    if n > 300_000:  # pathological blowup guard: counts still compared
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({bgp_to_sql(parsed, decode=False)}) __c"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


# ---------------------------------------------------------------------------
# Spark-side: ORDER BY + LIMIT/OFFSET over random connected BGPs
# ---------------------------------------------------------------------------
@pytest.mark.slow
@given(_bgp(), st.lists(st.booleans(), min_size=1, max_size=4), st.integers(1, 40), st.integers(0, 5))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_orderby_limit_matches_oracle(engine, duck, pats, descs, lim, off):
    """Multi-key mixed-direction ORDER BY over ALL projected variables +
    LIMIT/OFFSET: the total order makes the selected window deterministic,
    so the engines must return the identical row SET — fuzzes the final
    sort, the limit pushdown, and the offset arithmetic together."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    proj = sorted({t for s, p, o in pats for t in (s, o) if t.startswith("?")})
    body = " . ".join(f"{s} {p} {o}" for s, p, o in pats)
    order = " ".join(
        f"DESC({v})" if descs[i % len(descs)] else v for i, v in enumerate(proj)
    )
    q = (
        f"select {' '.join(proj)} where {{ {body} }}"
        f" order by {order} limit {lim} offset {off}"
    )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    assert df.count() <= lim
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


# ---------------------------------------------------------------------------
# Spark-side: aggregated subqueries joined into random outer BGPs
# ---------------------------------------------------------------------------
@st.composite
def _bgp_with_subquery(draw):
    """Random inner BGP grouped+aggregated on one of its variables, then a
    random OUTER BGP that shares that variable: the inner SELECT runs
    first (SPARQL bottom-up evaluation) and its aggregate joins into the
    outer pattern — the composition sparql_subquery samples, over
    arbitrary shapes.  Optionally the inner block gains ORDER BY+LIMIT
    (the deterministic top-k variant)."""
    from hypothesis import assume

    inner = draw(_bgp())
    outer = draw(_bgp())
    inner_vars = sorted({t for s, p, o in inner for t in (s, o) if t.startswith("?")})
    outer_vars = {t for s, p, o in outer for t in (s, o) if t.startswith("?")}
    shared = sorted(set(inner_vars) & outer_vars)
    assume(shared)
    key = draw(st.sampled_from(shared))
    cnt_var = draw(st.sampled_from(inner_vars))
    # r10 (VERDICT r9 task 5b): the aggregate form joins the draw — count
    # stays weighted; sum/avg exercise typed numeric aggregation
    # (non-numeric → NULL, skipped identically both engines), sample the
    # deterministic MIN-over-ids contract, group_concat the decoded
    # sorted-join contract — each INSIDE a subquery joined outward.
    # ORDER BY ?cnt DESC stays sound for the nullable forms: Spark desc
    # and DuckDB default are both NULLS LAST, and the ascending key
    # tiebreak is a GROUP BY key (never NULL).
    agg_fn = draw(st.sampled_from(
        ["count", "count", "count", "sum", "avg", "sample", "group_concat", "min", "max"]
    ))
    topk = draw(st.sampled_from([0, 0, 3, 7]))  # 0 = no inner limit
    return inner, outer, key, cnt_var, agg_fn, topk


@pytest.mark.slow
@given(_bgp_with_subquery())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_subquery_matches_oracle(engine, duck, case):
    """{ SELECT ?k (count(?v) AS ?cnt) ... GROUP BY ?k [ORDER BY ?cnt
    DESC ?k LIMIT n] } joined into a random outer BGP must agree with the
    oracle — the aggregate runs before the join, the key equi-joins, and
    the inner top-k (when drawn) is made deterministic by the ?k
    tie-break."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    inner, outer, key, cnt_var, agg_fn, topk = case
    inner_body = " . ".join(f"{s} {p} {o}" for s, p, o in inner)
    outer_body = " . ".join(f"{s} {p} {o}" for s, p, o in outer)
    outer_proj = sorted(
        {t for s, p, o in outer for t in (s, o) if t.startswith("?")}
    )
    proj = sorted(set(outer_proj) | {key, "?cnt"})
    lim = f" order by ?cnt desc {key} limit {topk}" if topk else ""
    q = (
        f"select {' '.join(proj)} where {{"
        f" {{ select {key} ({agg_fn}({cnt_var}) as ?cnt)"
        f" where {{ {inner_body} }} group by {key}{lim} }} ."
        f" {outer_body} }}"
    )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    try:
        oracle = bgp_to_sql(parsed, decode=False)
    except NotImplementedError:
        # documented unsupported oracle composition (possible for the r10
        # aggregate forms in subquery position): engine must still execute
        _oracle_reach("subquery_agg", False)
        assert df.count() >= 0
        return
    _oracle_reach("subquery_agg", True)
    n = df.count()
    if n > 300_000:  # pathological blowup guard: counts still compared
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({oracle}) __c"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, oracle)


# ---------------------------------------------------------------------------
# Spark-side: VALUES blocks (incl. UNDEF rows) over random connected BGPs
# ---------------------------------------------------------------------------
_VALUES_POOL = {
    "N": [f"<nation:{i}>" for i in range(0, 25)],
    "C": [f"<customer:{i}>" for i in range(1, 121)],
    "O": [f"<order:{i}>" for i in range(1, 301)],
    "P": [f"<part:{i}>" for i in range(1, 41)],
    "PR": ["<1-URGENT>", "<2-HIGH>", "<5-LOW>"],
}


@st.composite
def _bgp_with_values(draw):
    """Random connected BGP plus a VALUES block over 1-2 of its variables
    with kind-correct constants: single-variable form (IN-filter
    lowering), multi-variable row form (row-IN on id tuples), and UNDEF
    wildcards in random row positions.  Constants may or may not match
    real data — empty restrictions are a legal outcome the engines must
    agree on."""
    from hypothesis import assume

    pats = draw(_bgp())
    usable = sorted(
        {
            t
            for s, p, o in pats
            for t in (s, o)
            if t.startswith("?") and t[2:] in _VALUES_POOL
        }
    )
    assume(usable)
    n_vars = draw(st.integers(1, min(2, len(usable))))
    vs = sorted(draw(st.permutations(usable))[:n_vars])
    n_rows = draw(st.integers(1, 4))
    rows = []
    for _ in range(n_rows):
        row = []
        for v in vs:
            if n_vars > 1 and draw(st.booleans()) and draw(st.booleans()):
                row.append("UNDEF")  # ~25% wildcard slots in row form
            else:
                row.append(draw(st.sampled_from(_VALUES_POOL[v[2:]])))
        rows.append(tuple(row))
    return pats, vs, sorted(set(rows))


@pytest.mark.slow
@given(_bgp_with_values())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_values_matches_oracle(engine, duck, case):
    """VALUES over random connected BGPs — the single-variable IN
    lowering, the multi-variable row-IN on id tuples, UNDEF wildcards,
    and constants that match nothing — must answer identically on both
    engines."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    pats, vs, rows = case
    proj = sorted({t for s, p, o in pats for t in (s, o) if t.startswith("?")})
    body = " . ".join(f"{s} {p} {o}" for s, p, o in pats)
    if len(vs) == 1:
        vals = " ".join(r[0] for r in rows)
        vblock = f"values {vs[0]} {{ {vals} }}"
    else:
        vals = " ".join("(" + " ".join(r) + ")" for r in rows)
        vblock = f"values ({' '.join(vs)}) {{ {vals} }}"
    q = f"select {' '.join(proj)} where {{ {body} . {vblock} }}"
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    if df.count() > 300_000:
        return
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


# ---------------------------------------------------------------------------
# Spark-side: property paths INSIDE aggregated subqueries (r9) — the closure
# frame (semi-naive fixpoint + zero-length identity domain) is computed in
# the bottom-up inner block, aggregated, and only then joined into the outer
# pattern; fuzzes the interaction of the path cache with subquery scoping
# ---------------------------------------------------------------------------
@st.composite
def _subquery_with_path(draw):
    """Random inner BGP carrying ONE closure-marked pattern (+ * ?),
    grouped+aggregated on a variable the outer BGP shares — the
    composition of ``_bgp_with_path`` and ``_bgp_with_subquery``."""
    from hypothesis import assume

    inner = draw(_bgp_with_path())
    outer = draw(_bgp())
    inner_vars = sorted({t for s, p, o in inner for t in (s, o) if t.startswith("?")})
    outer_vars = {t for s, p, o in outer for t in (s, o) if t.startswith("?")}
    shared = sorted(set(inner_vars) & outer_vars)
    assume(shared)
    key = draw(st.sampled_from(shared))
    cnt_var = draw(st.sampled_from(inner_vars))
    # r10 (VERDICT r9 task 5b): the aggregate form joins the draw — count
    # stays weighted; sum/avg/sample/group_concat/min/max compose with the
    # path closure inside the subquery.  ORDER BY ?cnt DESC stays sound
    # for the nullable forms: Spark desc and DuckDB default are both
    # NULLS LAST, and the ascending key tiebreak is a GROUP BY key.
    agg_fn = draw(st.sampled_from(
        ["count", "count", "count", "sum", "avg", "sample", "group_concat", "min", "max"]
    ))
    topk = draw(st.sampled_from([0, 0, 3, 7]))  # 0 = no inner limit
    return inner, outer, key, cnt_var, agg_fn, topk


@pytest.mark.slow
@given(_subquery_with_path())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_subquery_with_path_matches_oracle(engine, duck, case):
    """{ SELECT ?k (count(?v) AS ?cnt) WHERE { ...p+/p*/p?... } GROUP BY
    ?k [ORDER BY ... LIMIT n] } joined into a random outer BGP must agree
    with the oracle: the path closure evaluates inside the subquery (its
    identity domain restricted to the INNER block's bindings, not the
    outer join's), the aggregate counts closure-reachable rows, and the
    key equi-joins outward.  Oracle compositions the renderer documents
    as unsupported raise NotImplementedError and are skipped visibly —
    the engine must still execute them."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    inner, outer, key, cnt_var, agg_fn, topk = case
    inner_body = " . ".join(f"{s} {p} {o}" for s, p, o in inner)
    outer_body = " . ".join(f"{s} {p} {o}" for s, p, o in outer)
    outer_proj = sorted({t for s, p, o in outer for t in (s, o) if t.startswith("?")})
    proj = sorted(set(outer_proj) | {key, "?cnt"})
    lim = f" order by ?cnt desc {key} limit {topk}" if topk else ""
    q = (
        f"select {' '.join(proj)} where {{"
        f" {{ select {key} ({agg_fn}({cnt_var}) as ?cnt)"
        f" where {{ {inner_body} }} group by {key}{lim} }} ."
        f" {outer_body} }}"
    )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return  # e.g. a closure marker on a variable predicate
    df = engine.sparql(q, decode=False)
    try:
        oracle = bgp_to_sql(parsed, decode=False)
    except NotImplementedError:
        _oracle_reach("subquery_with_path", False)
        assert df.count() >= 0  # engine still executes; skip the oracle
        return
    _oracle_reach("subquery_with_path", True)
    n = df.count()
    if n > 300_000:  # pathological blowup guard: counts still compared
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({oracle}) __c"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, oracle)


# ---------------------------------------------------------------------------
# Spark-side: OPTIONAL inside UNION branches (r9) — a branch's OPTIONAL
# variable can be NULL two different ways in the union output (left-join
# non-match in its own branch, NULL-padding in the other branch), and the
# bag-union multiplicity must survive both (translator.py UNION superset)
# ---------------------------------------------------------------------------
@st.composite
def _union_with_optional(draw):
    """Two independently drawn connected BGPs; in one (or both) branches a
    pattern is pulled under OPTIONAL, keeping the remaining required part
    connected and sharing ≥1 variable with the optional pattern."""
    from hypothesis import assume

    def connected(ps):
        if not ps:
            return False
        reach = {0}
        grew = True
        while grew:
            grew = False
            vs = {t for i in reach for t in (ps[i][0], ps[i][2]) if t.startswith("?")}
            for i, (s, p, o) in enumerate(ps):
                if i not in reach and ({s, o} & vs):
                    reach.add(i)
                    grew = True
        return reach == set(range(len(ps)))

    def split(pats):
        """(required rest, optional inner) or None when no valid split."""
        if len(pats) < 2:
            return None
        idx = draw(st.integers(0, len(pats) - 1))
        inner, rest = pats[idx], pats[:idx] + pats[idx + 1 :]
        rest_vars = {t for s, p, o in rest for t in (s, o) if t.startswith("?")}
        inner_vars = {t for t in (inner[0], inner[2]) if t.startswith("?")}
        if connected(rest) and (inner_vars & rest_vars):
            return rest, inner
        return None

    pats_a = draw(_bgp())
    pats_b = draw(_bgp())
    which = draw(st.sampled_from(["a", "b", "both"]))
    opt_a = split(pats_a) if which in ("a", "both") else None
    opt_b = split(pats_b) if which in ("b", "both") else None
    assume(opt_a or opt_b)  # at least one branch actually carries OPTIONAL
    distinct = draw(st.booleans())
    return pats_a, opt_a, pats_b, opt_b, distinct


@pytest.mark.slow
@given(_union_with_optional())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_union_with_optional_matches_oracle(engine, duck, case):
    """{ A optional { a } } UNION { B [optional { b }] } — the left-join
    NULL extension inside a branch composes with the union's NULL-padding
    of branch-private variables: a variable may be NULL because its own
    branch's OPTIONAL missed OR because the other branch never binds it,
    and bag multiplicity (plus the DISTINCT variant's NULL-equality
    collapse) must agree with the oracle either way."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    pats_a, opt_a, pats_b, opt_b, distinct = case

    def branch(pats, opt):
        if opt is None:
            return " . ".join(f"{s} {p} {o}" for s, p, o in pats)
        rest, (s, p, o) = opt
        rest_body = " . ".join(f"{s2} {p2} {o2}" for s2, p2, o2 in rest)
        return f"{rest_body} . optional {{ {s} {p} {o} }}"

    proj = sorted(
        {
            t
            for pats in (pats_a, pats_b)
            for s, p, o in pats
            for t in (s, o)
            if t.startswith("?")
        }
    )
    kw = "select distinct" if distinct else "select"
    q = (
        f"{kw} {' '.join(proj)} where"
        f" {{ {{ {branch(pats_a, opt_a)} }} union {{ {branch(pats_b, opt_b)} }} }}"
    )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    n = df.count()
    if n > 300_000:  # pathological blowup guard: counts still compared
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({bgp_to_sql(parsed, decode=False)}) __c"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


# ---------------------------------------------------------------------------
# Spark-side: property paths inside UNION branches (r9) — the closure frame
# evaluates per-branch, then the bag union NULL-pads branch-private
# variables around it (the last path×group-operator composition square
# cell: paths under OPTIONAL/EXISTS/MINUS and in subqueries are fuzzed
# above; UNION completes the set)
# ---------------------------------------------------------------------------
@st.composite
def _union_with_path(draw):
    """Two independently drawn connected BGPs, one (or both) carrying a
    closure-marked pattern; DISTINCT drawn half the time."""
    which = draw(st.sampled_from(["a", "b", "both"]))
    pats_a = draw(_bgp_with_path() if which in ("a", "both") else _bgp())
    pats_b = draw(_bgp_with_path() if which in ("b", "both") else _bgp())
    distinct = draw(st.booleans())
    return pats_a, pats_b, distinct


@pytest.mark.slow
@given(_union_with_path())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_union_with_path_matches_oracle(engine, duck, case):
    """{ ...p+... } UNION { B } — the semi-naive closure (and the
    zero-length identity domain for * / ?) computed inside a union
    branch, its variables NULL-padded in the other branch's rows, with
    the DISTINCT variant collapsing across the padding — must answer
    identically on both engines.  Unsupported oracle path compositions
    raise NotImplementedError and are skipped visibly; the engine must
    still execute them."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    pats_a, pats_b, distinct = case
    proj = sorted(
        {
            t
            for pats in (pats_a, pats_b)
            for s, p, o in pats
            for t in (s, o)
            if t.startswith("?")
        }
    )
    body_a = " . ".join(f"{s} {p} {o}" for s, p, o in pats_a)
    body_b = " . ".join(f"{s} {p} {o}" for s, p, o in pats_b)
    kw = "select distinct" if distinct else "select"
    q = f"{kw} {' '.join(proj)} where {{ {{ {body_a} }} union {{ {body_b} }} }}"
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return  # e.g. a closure marker on a variable predicate
    df = engine.sparql(q, decode=False)
    try:
        oracle = bgp_to_sql(parsed, decode=False)
    except NotImplementedError:
        _oracle_reach("union_with_path", False)
        assert df.count() >= 0
        return
    _oracle_reach("union_with_path", True)
    n = df.count()
    if n > 300_000:  # pathological blowup guard: counts still compared
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({oracle}) __c"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, oracle)


# ---------------------------------------------------------------------------
# Spark-side: VALUES restricting OPTIONAL-bound variables (r9) — the IN
# lowering lands on a column the left join can NULL-extend: an UNBOUND
# optional variable must NOT satisfy a VALUES restriction (SPARQL's
# join-compatibility would keep it only under UNDEF), the composition the
# all-required VALUES fuzzer above never reaches
# ---------------------------------------------------------------------------
@st.composite
def _values_over_optional(draw):
    """Random connected BGP with one pattern under OPTIONAL, plus a
    VALUES block over a variable drawn — with preference — from the
    OPTIONAL-only variables (falling back to any usable variable), with
    kind-correct constants and an UNDEF row ~25% of the time."""
    from hypothesis import assume

    rest, opt, _tree = draw(_bgp_optional_with_filter())
    rest_vars = {t for s, p, o in rest for t in (s, o) if t.startswith("?")}
    opt_vars = {t for t in (opt[0], opt[2]) if t.startswith("?")}
    opt_only = sorted((opt_vars - rest_vars))
    usable = [v for v in sorted(opt_vars | rest_vars) if v[2:] in _VALUES_POOL]
    pref = [v for v in opt_only if v[2:] in _VALUES_POOL]
    assume(usable)
    v = draw(st.sampled_from(pref if pref else usable))
    n_rows = draw(st.integers(1, 4))
    rows = sorted({draw(st.sampled_from(_VALUES_POOL[v[2:]])) for _ in range(n_rows)})
    undef = draw(st.booleans()) and draw(st.booleans())  # ~25%: UNDEF row
    return rest, opt, v, rows, undef


@pytest.mark.slow
@given(_values_over_optional())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_values_over_optional_matches_oracle(engine, duck, case):
    """VALUES ?v { ... } where ?v is (preferentially) bound only inside
    an OPTIONAL group: rows whose optional side missed carry UNBOUND ?v,
    which is join-INCOMPATIBLE with every concrete VALUES constant but
    compatible with an UNDEF row — both engines must agree on exactly
    which NULL-extended rows survive."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    rest, opt, v, rows, undef = case
    rest_body = " . ".join(f"{s} {p} {o}" for s, p, o in rest)
    proj = sorted(
        {t for s, p, o in rest + [opt] for t in (s, o) if t.startswith("?")}
    )
    vals = " ".join(rows + (["UNDEF"] if undef else []))
    q = (
        f"select {' '.join(proj)} where {{ {rest_body} ."
        f" optional {{ {opt[0]} {opt[1]} {opt[2]} }} ."
        f" values {v} {{ {vals} }} }}"
    )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    n = df.count()
    if n > 300_000:
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({bgp_to_sql(parsed, decode=False)}) __c"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, bgp_to_sql(parsed, decode=False))


# ---------------------------------------------------------------------------
# Spark-side: BIND chains over random BGPs (r9) — arithmetic over typed
# values (numeric ?VSZ vs entity-id variables, whose arith is NULL on both
# engines), two-variable arithmetic, and re-binding a previous alias
# ---------------------------------------------------------------------------
@st.composite
def _bgp_with_binds(draw):
    """Random connected BGP plus a 1-2 step BIND chain: one-variable
    arithmetic (?v op k), two-variable arithmetic (?a op ?b), or a chain
    step over the PREVIOUS alias — sources drawn from all variable kinds
    so both the typed-numeric path and the NULL-for-non-numeric path are
    exercised."""
    pats = draw(_bgp())
    vars_ = sorted({t for s, p, o in pats for t in (s, o) if t.startswith("?")})
    binds = []
    aliases = []
    n = draw(st.integers(1, 2))
    for i in range(n):
        op = draw(st.sampled_from(["+", "*", "-"]))
        alias = f"?B{i}"
        mode = draw(st.sampled_from(["arith", "arith", "arith2", "chain"]))
        if mode == "chain" and aliases:
            binds.append(f"bind({aliases[-1]} {op} {draw(st.integers(-5, 9))} as {alias})")
        elif mode == "arith2" and len(vars_) >= 2:
            a, b = draw(st.sampled_from(vars_)), draw(st.sampled_from(vars_))
            binds.append(f"bind({a} {op} {b} as {alias})")
        else:
            v = draw(st.sampled_from(vars_))
            binds.append(f"bind({v} {op} {draw(st.integers(-5, 9))} as {alias})")
        aliases.append(alias)
    return pats, binds, aliases


@pytest.mark.slow
@given(_bgp_with_binds())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_bind_chain_matches_oracle(engine, duck, case):
    """BIND chains — integer arithmetic over typed values, NULL
    propagation for non-numeric sources, alias-over-alias chaining —
    must answer identically on both engines.  Grammar-rejected
    compositions (e.g. a chain form the parser does not accept) return
    visibly via the SparqlSyntaxError skip."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    pats, binds, aliases = case
    body = " . ".join(f"{s} {p} {o}" for s, p, o in pats)
    proj = sorted({t for s, p, o in pats for t in (s, o) if t.startswith("?")})
    q = (
        f"select {' '.join(proj + aliases)} where"
        f" {{ {body} . {' . '.join(binds)} }}"
    )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    try:
        oracle = bgp_to_sql(parsed, decode=False)
    except NotImplementedError:
        _oracle_reach("bind_chain", False)
        assert df.count() >= 0
        return
    _oracle_reach("bind_chain", True)
    n = df.count()
    if n > 300_000:
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({oracle}) __c"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, oracle)


# ---------------------------------------------------------------------------
# Spark-side: CONSTRUCT templates over random BGPs (r9) — template
# instantiation per binding (bag), dictionary resolution of template
# constants, and the spec's omit-unbound-slot rule when the body carries
# an OPTIONAL (an optional-only variable in a template slot)
# ---------------------------------------------------------------------------
@st.composite
def _construct_case(draw):
    """Random body (half the time with one pattern under OPTIONAL) plus a
    1-2 triple CONSTRUCT template whose slots draw from the body's
    variables (including optional-only ones — the NULL-omission path) and
    kind-matching constants."""
    if draw(st.booleans()):
        rest, opt, _tree = draw(_bgp_optional_with_filter())
    else:
        rest, opt = draw(_bgp()), None
    all_pats = rest + ([opt] if opt is not None else [])
    vars_ = sorted({t for s, p, o in all_pats for t in (s, o) if t.startswith("?")})
    preds = sorted(_PRED_SIG)
    tmpl = []
    for _ in range(draw(st.integers(1, 2))):
        s_slot = draw(st.sampled_from(vars_ + _ANCHORS))
        p_slot = draw(st.sampled_from(preds))
        o_slot = draw(st.sampled_from(vars_ + _ANCHORS))
        tmpl.append((s_slot, p_slot, o_slot))
    return rest, opt, tmpl


@pytest.mark.slow
@given(_construct_case())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_construct_matches_oracle(engine, duck, case):
    """CONSTRUCT { t1 [. t2] } over random (optionally OPTIONAL-bearing)
    bodies: one emitted (s,p,o) row per template triple per binding,
    template constants resolved through the dictionary, and template
    triples with an UNBOUND slot omitted per the spec — identical on
    both engines."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    rest, opt, tmpl = case
    body = " . ".join(f"{s} {p} {o}" for s, p, o in rest)
    if opt is not None:
        body += f" . optional {{ {opt[0]} {opt[1]} {opt[2]} }}"
    tmpl_body = " . ".join(f"{s} {p} {o}" for s, p, o in tmpl)
    q = f"construct {{ {tmpl_body} }} where {{ {body} }}"
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    try:
        oracle = bgp_to_sql(parsed, decode=False)
    except NotImplementedError:
        _oracle_reach("construct", False)
        assert df.count() >= 0
        return
    _oracle_reach("construct", True)
    n = df.count()
    if n > 300_000:
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({oracle}) __c"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, oracle)


# ---------------------------------------------------------------------------
# Spark-side: negated property sets !(…) / !p and inverse hops ^p INSIDE
# group operators (r10 — VERDICT r9 task 5a): sparql.py's negation
# machinery (plans/sparql.py:218-250) was only exercised standalone; here
# it composes with OPTIONAL's NULL-extension, UNION's bag padding, MINUS's
# shared-variable compatibility, EXISTS/NOT EXISTS substitution, and
# aggregated subqueries.
# ---------------------------------------------------------------------------
@st.composite
def _group_with_negation(draw):
    """Random connected base BGP plus ONE inner pattern whose predicate is
    a negated property set (!p or !(p1|p2|p3)) or an inverse hop (^p),
    placed under a drawn group operator.  Negation subjects come from the
    base's variables (the join surface); inverse patterns use the
    kind-consistent ?V names so they share variables with the base
    whenever kinds overlap — and when they don't, the engines must still
    agree (MINUS over disjoint domains removes nothing, per spec)."""
    from hypothesis import assume

    base = draw(_bgp())
    base_vars = sorted({t for s, p, o in base for t in (s, o) if t.startswith("?")})
    assume(base_vars)
    form = draw(st.sampled_from(["neg", "neg", "neg_single", "inv", "inv"]))
    if form == "inv":
        p = draw(st.sampled_from(sorted(_PRED_SIG)))
        sk, ok = _PRED_SIG[p]
        sk = draw(st.sampled_from(["C", "S"])) if sk == "CN" else sk
        # inverse flips the slots: ?a ^p ?b  ≡  ?b p ?a
        inner = (f"?V{ok}", f"^{p}", f"?V{sk}")
    else:
        subj = draw(st.sampled_from(base_vars))
        n_excl = draw(st.integers(1, 3)) if form == "neg" else 1
        excl = draw(st.permutations(sorted(_PRED_SIG)))[:n_excl]
        pred = f"!({'|'.join(sorted(excl))})" if form == "neg" else f"!{excl[0]}"
        inner = (subj, pred, "?W")
    mode = draw(st.sampled_from(
        ["optional", "union", "minus", "exists", "not_exists", "subquery"]
    ))
    if mode == "subquery":
        # the inner block aggregates on a variable shared with the base
        inner_vars = [t for t in (inner[0], inner[2]) if t.startswith("?")]
        shared = sorted(set(inner_vars) & set(base_vars))
        assume(shared)
        key = draw(st.sampled_from(shared))
        cnt_var = next((v for v in inner_vars if v != key), key)
        return base, inner, mode, (key, cnt_var)
    return base, inner, mode, None


@pytest.mark.slow
@given(_group_with_negation())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_negation_in_groups_matches_oracle(engine, duck, case):
    """!(…) / !p / ^p under OPTIONAL / UNION / MINUS / EXISTS / NOT
    EXISTS / aggregated subqueries: the negated-set NOT-IN residual and
    the inverse slot swap must compose with each group operator's
    NULL-extension / padding / compatibility semantics identically on
    both engines.  Unsupported oracle compositions raise
    NotImplementedError and are skipped visibly (tallied below)."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    base, inner, mode, subq = case
    base_body = " . ".join(f"{s} {p} {o}" for s, p, o in base)
    base_vars = sorted({t for s, p, o in base for t in (s, o) if t.startswith("?")})
    inner_body = f"{inner[0]} {inner[1]} {inner[2]}"
    inner_vars = [t for t in (inner[0], inner[2]) if t.startswith("?")]
    if mode == "optional":
        proj = sorted(set(base_vars) | set(inner_vars))
        q = (
            f"select {' '.join(proj)} where"
            f" {{ {base_body} . optional {{ {inner_body} }} }}"
        )
    elif mode == "union":
        proj = sorted(set(base_vars) | set(inner_vars))
        q = (
            f"select {' '.join(proj)} where"
            f" {{ {{ {base_body} }} union {{ {inner_body} }} }}"
        )
    elif mode == "minus":
        q = (
            f"select {' '.join(base_vars)} where"
            f" {{ {base_body} . minus {{ {inner_body} }} }}"
        )
    elif mode in ("exists", "not_exists"):
        kw = "exists" if mode == "exists" else "not exists"
        q = (
            f"select {' '.join(base_vars)} where"
            f" {{ {base_body} . filter {kw} {{ {inner_body} }} }}"
        )
    else:  # subquery
        key, cnt_var = subq
        proj = sorted(set(base_vars) | {key, "?cnt"})
        q = (
            f"select {' '.join(proj)} where {{"
            f" {{ select {key} (count({cnt_var}) as ?cnt)"
            f" where {{ {inner_body} }} group by {key} }} ."
            f" {base_body} }}"
        )
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    try:
        oracle = bgp_to_sql(parsed, decode=False)
    except NotImplementedError:
        _oracle_reach("negation_in_groups", False)
        assert df.count() >= 0
        return
    _oracle_reach("negation_in_groups", True)
    n = df.count()
    if n > 300_000:  # pathological blowup guard: counts still compared
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({oracle}) __c"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, oracle)


# ---------------------------------------------------------------------------
# Spark-side: LEFT-JOIN TREES (r10) — nested OPTIONAL (optional inside an
# optional group) and sibling OPTIONALs (two optional groups against the
# same required part).  The per-entry queries and the unit tests at
# tests/test_sparql.py pin fixed shapes; this draws random well-designed
# trees so the translator's group-nesting bookkeeping (optional_parent,
# plans/sparql.py:398) is exercised across the predicate signature space.
# ---------------------------------------------------------------------------
@st.composite
def _optional_tree(draw):
    """Connected BGP split into (required rest, g1, g2) plus a tree shape:
    'nested'  → rest . optional { g1 . optional { g2 } }
    'sibling' → rest . optional { g1 } . optional { g2 }
    Both variants are kept WELL-DESIGNED (an optional-only variable never
    leaks into a scope that binds it elsewhere), matching the fragment the
    engine documents; non-well-designed shapes raise at translation and
    are unit-tested separately."""
    from hypothesis import assume

    def connected(ps):
        if not ps:
            return False
        reach = {0}
        grew = True
        while grew:
            grew = False
            vs = {t for i in reach for t in (ps[i][0], ps[i][2]) if t.startswith("?")}
            for i, (s, p, o) in enumerate(ps):
                if i not in reach and ({s, o} & vs):
                    reach.add(i)
                    grew = True
        return reach == set(range(len(ps)))

    pats = draw(_bgp())
    assume(len(pats) >= 3)
    order = draw(st.permutations(range(len(pats))))
    i, j = order[0], order[1]
    g1, g2 = pats[i], pats[j]
    rest = [p for k, p in enumerate(pats) if k not in (i, j)]
    g1v = {t for t in (g1[0], g1[2]) if t.startswith("?")}
    g2v = {t for t in (g2[0], g2[2]) if t.startswith("?")}
    rest_vars = {t for s, p, o in rest for t in (s, o) if t.startswith("?")}
    assume(connected(rest))
    assume(g1v & rest_vars)  # the first optional joins the required part
    shape = draw(st.sampled_from(["nested", "sibling"]))
    if shape == "nested":
        assume(g2v & g1v)  # the inner optional joins its parent group
        # well-designed: inner-only vars stay out of the required part
        assume(not ((g2v - g1v) & rest_vars))
    else:
        assume(g2v & rest_vars)  # each sibling joins the required part
        # well-designed: a var private to one optional group must not
        # appear in the other (that cross-branch correlation is the
        # non-well-designed fragment)
        assume(not ((g2v - rest_vars) & g1v))
        assume(not ((g1v - rest_vars) & g2v))
    distinct = draw(st.booleans())
    return rest, g1, g2, shape, distinct


@pytest.mark.slow
@given(_optional_tree())
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_optional_tree_matches_oracle(engine, duck, case):
    """Nested and sibling OPTIONAL left-join trees must agree with the
    oracle: nesting NULL-extends in two stages (a row can carry g1's
    bindings with g2's all-NULL, or neither), siblings NULL-extend
    independently against the same required rows, and DISTINCT's
    NULL-equality collapse must agree on top of either tree."""
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import SparqlSyntaxError, parse_sparql
    from tests.conftest import assert_oracle_match

    rest, g1, g2, shape, distinct = case
    rest_body = " . ".join(f"{s} {p} {o}" for s, p, o in rest)
    g1_body = f"{g1[0]} {g1[1]} {g1[2]}"
    g2_body = f"{g2[0]} {g2[1]} {g2[2]}"
    if shape == "nested":
        body = f"{rest_body} . optional {{ {g1_body} . optional {{ {g2_body} }} }}"
    else:
        body = f"{rest_body} . optional {{ {g1_body} }} . optional {{ {g2_body} }}"
    proj = sorted(
        {t for pat in (*rest, g1, g2) for t in (pat[0], pat[2]) if t.startswith("?")}
    )
    kw = "select distinct" if distinct else "select"
    q = f"{kw} {' '.join(proj)} where {{ {body} }}"
    try:
        parsed = parse_sparql(q)
    except SparqlSyntaxError:
        return
    df = engine.sparql(q, decode=False)
    try:
        oracle = bgp_to_sql(parsed, decode=False)
    except NotImplementedError:
        _oracle_reach("optional_tree", False)
        assert df.count() >= 0
        return
    _oracle_reach("optional_tree", True)
    n = df.count()
    if n > 300_000:  # pathological blowup guard: counts still compared
        assert n == duck.execute(
            f"SELECT COUNT(*) FROM ({oracle}) __c"
        ).fetchone()[0]
        return
    assert_oracle_match(df, duck, oracle)


# ---------------------------------------------------------------------------
# Keep last in this module: vacuity guard over the oracle-reach tallies
# ---------------------------------------------------------------------------
def test_fuzzers_reach_oracle():
    """r9 ADVICE: the NotImplementedError skip paths above must not be
    silently vacuous.  pytest runs tests in definition order within a
    module, so by the time this runs every instrumented fuzzer that was
    selected has recorded its tally; any fuzzer that drew a meaningful
    number of examples (>=5) without ONE reaching the DuckDB comparison
    signals the renderer regressing to NotImplementedError across the
    board (today's unsupported shapes are a small documented subset, so
    real reach rates are far above 0).  When the slow fuzzers are
    deselected the tally is empty and this is a no-op by construction."""
    vacuous = {
        name: tuple(tally)
        for name, tally in _ORACLE_REACH.items()
        if tally[0] >= 5 and tally[1] == 0
    }
    assert not vacuous, (
        "fuzzer(s) never reached the oracle — is bgp_to_sql raising "
        f"NotImplementedError for every composition? {vacuous}"
    )

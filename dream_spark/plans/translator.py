"""BGP → DataFrame translator with stats-driven greedy join ordering.

This is the Spark-first replacement for the reference's entire planning +
execution stack (SURVEY.md §2.2/§3): query-graph construction
(QueryPlanner.c:192-239), condition assignment (242-333), plan enumeration
and cost-based vertex merging (Optimizer.cpp:207-566), subquery dispatch and
the hand-rolled MPI hash-join pipeline (Worker.c, BasicHashJoin.cpp).

Design: each triple pattern becomes a filtered, variable-aliased scan of the
``triples`` DataFrame; patterns are then chained with inner equi-joins on
shared variables in a greedy smallest-cardinality-first order seeded by
per-predicate statistics (stats.py).  Catalyst handles the physical side the
reference hand-built: hash/sort-merge join choice, broadcast of small sides,
AQE empty-relation propagation (the reference's empty short-circuit,
Proxy.c:71-85), skew splitting, and whole-stage codegen.

Why translation-time ordering instead of a Catalyst rule: the join order for
an n-pattern BGP over ONE table is decided before Catalyst sees the plan, and
per-predicate stats (which CBO lacks for self-joins) make the greedy choice
well-informed; see SURVEY.md §7.2 M3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dream_spark.plans.sparql import Condition, ParsedQuery
from dream_spark.plans.stats import TripleStats
from dream_spark.sources.triples import TripleStore


def _condition_frame(store: TripleStore, cond: Condition) -> DataFrame:
    """One triple pattern → filtered/aliased scan.

    Constants become pushdown-able filters (reference O3,
    QueryPlanner.c:780-821); variables become column aliases.  A variable
    repeated inside one pattern (e.g. ``?x p ?x``) becomes a same-row equality
    filter.
    """
    df = store.triples
    slots = {"s": cond.subj, "p": cond.pred, "o": cond.obj}
    seen: dict[str, str] = {}  # var -> first slot bound to it
    cols = []
    for slot, term in slots.items():
        if term.is_var:
            if term.var in seen:
                df = df.where(F.col(slot) == F.col(seen[term.var]))
            else:
                seen[term.var] = slot
                cols.append(F.col(slot).alias(term.var))
        else:
            df = df.where(F.col(slot) == F.lit(store.resolve(term.lexical)))
    if not cols:
        # Fully-ground pattern: contributes one empty mapping iff present.
        return df.select(F.lit(1).alias(f"__ground_{cond.cid}")).limit(1)
    return df.select(*cols)


def _estimate(stats: TripleStats | None, store: TripleStore, cond: Condition) -> float:
    if stats is None:
        return 1.0
    pred_id = None if cond.pred.is_var else store.resolve(cond.pred.lexical)
    return stats.pattern_cardinality(pred_id, not cond.subj.is_var, not cond.obj.is_var)


def greedy_order(conditions: list[Condition], est: dict[int, float]) -> list[Condition]:
    """Smallest-first greedy: start at the cheapest pattern, then repeatedly
    take the cheapest pattern *connected* to the bound variables; fall back to
    the globally cheapest (cartesian) only when the query graph is
    disconnected.  This replaces the reference's exhaustive plan enumeration +
    vertex merging (Optimizer.cpp:270-333, 464-566) with the standard greedy
    heuristic; AQE corrects mis-estimates at runtime."""
    remaining = list(conditions)
    remaining.sort(key=lambda c: (est[c.cid], c.cid))
    order = [remaining.pop(0)]
    bound = set(order[0].variables())
    while remaining:
        connected = [c for c in remaining if set(c.variables()) & bound]
        pick = min(connected or remaining, key=lambda c: (est[c.cid], c.cid))
        remaining.remove(pick)
        order.append(pick)
        bound |= set(pick.variables())
    return order


def translate(
    store: TripleStore,
    query: ParsedQuery,
    stats: TripleStats | None = None,
    decode: bool = False,
) -> DataFrame:
    """Compile a parsed BGP to a DataFrame plan (bag semantics, like the
    reference — SURVEY.md §2.3; ``distinct`` only when the query asks)."""
    est = {c.cid: _estimate(stats, store, c) for c in query.conditions}
    order = greedy_order(query.conditions, est)

    plan: DataFrame | None = None
    bound: set[str] = set()
    for cond in order:
        cdf = _condition_frame(store, cond)
        if plan is None:
            plan = cdf
        else:
            shared = sorted(bound & set(cond.variables()))
            plan = plan.join(cdf, on=shared) if shared else plan.crossJoin(cdf)
        bound |= set(cond.variables())

    assert plan is not None
    if decode:
        # Final dictionary decode — the id2name step (reference Proxy.c:211-224)
        # as one join per projected column against the dict DataFrame.
        for v in query.projection:
            lex = store.dictionary.select(
                F.col("id").alias(v), F.col("lexical").alias(f"__lex_{v}")
            )
            plan = plan.join(lex, on=v, how="left")
        plan = plan.select(*[F.col(f"__lex_{v}").alias(v) for v in query.projection])
    else:
        plan = plan.select(*query.projection)
    if query.distinct:
        plan = plan.distinct()
    return plan

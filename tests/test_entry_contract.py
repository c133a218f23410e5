"""Driver-contract invariants for __spark_entry__ — cheap structural checks
that would otherwise only fail at round-grading time.

The driver adjudicates the FIRST 50 queries() entries (insertion order), so
the invariants are: exactly 50 priority names, all resolvable, emitted
first, every operator family represented inside the cap, and an oracle for
every declared query.
"""

from __future__ import annotations

import __spark_entry__ as entry

# One prefix per operator family that must land inside the driver's 50-entry
# adjudication cap.  (Round 5: knn_ is back in-cap via the new
# knn_lsh_served serve-path entry.  Round 10: maintenance_/hybrid_/simhash_
# added — r9 VERDICT gap 3: the guard omitted three families the cap could
# silently drop.)
FAMILIES = [
    "sparql_",
    "rel_",
    "temporal_",
    "text_",
    "pipeline_",
    "dedup_",
    "sketch_",
    "graph_",
    "media_",
    "streaming_",
    "knn_",
    "maintenance_",
    "hybrid_",
    "simhash_",
]


def test_priority_order_is_exactly_the_first_fifty():
    qs = list(entry.queries())
    assert len(entry.PRIORITY_ORDER) == 50
    missing = [n for n in entry.PRIORITY_ORDER if n not in qs]
    assert not missing, f"priority names without a queries() entry: {missing}"
    assert qs[:50] == entry.PRIORITY_ORDER


def test_every_family_inside_the_cap():
    first50 = list(entry.queries())[:50]
    for fam in FAMILIES:
        assert any(n.startswith(fam) for n in first50), f"family {fam} outside the 50-cap"


# Entries ALLOWED to lack an oracle_sql(): the driver records the weaker
# rows-only check for these, by documented design (each must carry an
# oracle-equivalent property test — see COVERAGE.md for the pin).
# EMPTY since r10: graph_components — the last rows-only entry — gained a
# closure-free hash oracle (operators/graph.py::_components_sql, unrolled
# min-label + pointer-jump rounds with a visible fixed-point guard), so
# this set now exists only to keep the contract explicit for any future
# genuinely non-SQL-expressible entry.
ROWS_ONLY: set[str] = set()


def test_every_query_has_an_oracle_with_matching_keys():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) == set(qs) - ROWS_ONLY, (
        f"oracle/query key mismatch: only-in-queries="
        f"{sorted(set(qs) - set(os_) - ROWS_ONLY)}, "
        f"only-in-oracles={sorted(set(os_) - set(qs))}"
    )
    assert ROWS_ONLY <= set(qs), "rows-only allowlist names a missing entry"


def test_oracle_sql_is_nonempty_text():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name

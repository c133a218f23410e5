"""Relational operators vs DuckDB oracle (joins, aggs, windows, top-k)."""

from __future__ import annotations

import pytest

from dream_spark.operators import relational as R
from tests.conftest import SF_DIR, assert_oracle_match


@pytest.mark.parametrize("name", sorted(R.QUERIES))
def test_relational_oracle(spark, duck, name):
    df = R.QUERIES[name](spark, SF_DIR)
    assert_oracle_match(df, duck, R.ORACLES[name])


def test_q3_is_deterministic_top10(spark):
    a = R.q3_shipping_priority(spark, SF_DIR).collect()
    b = R.q3_shipping_priority(spark, SF_DIR).collect()
    assert a == b and len(a) <= 10


def test_q5_broadcasts_nation(spark):
    plan = R.q5_local_supplier_volume(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_grouping_sets_shape(spark):
    """Exactly the three declared sets appear: per-flag rows (status NULL),
    per-status rows (flag NULL), and one grand-total row — no cross cells
    (that would be CUBE)."""
    rows = R.grouping_sets_pricing(spark, SF_DIR).collect()
    flag_rows = [r for r in rows if r["l_returnflag"] is not None and r["l_linestatus"] is None]
    status_rows = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is not None]
    grand = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is None]
    cross = [r for r in rows if r["l_returnflag"] is not None and r["l_linestatus"] is not None]
    assert len(grand) == 1 and not cross
    assert len(flag_rows) + len(status_rows) + 1 == len(rows)
    assert grand[0]["n_items"] == sum(r["n_items"] for r in flag_rows)

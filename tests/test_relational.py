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

"""Temporal joins (as-of, range) vs DuckDB oracle + semantic invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dream_spark.functions.timeutils import epoch_micros
from dream_spark.operators import temporal as T
from dream_spark.sources.tables import load_table
from tests.conftest import SF_DIR, assert_oracle_match


@pytest.mark.parametrize("name", sorted(T.QUERIES))
def test_temporal_oracle(spark, duck, name):
    df = T.QUERIES[name](spark, SF_DIR)
    assert_oracle_match(df, duck, T.ORACLES[name])


def test_asof_left_semantics(spark):
    """Every purchase appears exactly once, matched or not."""
    out = T.asof_click_attribution(spark, SF_DIR)
    n_purchases = (
        load_table(spark, SF_DIR, "events").where(F.col("event_type") == "purchase").count()
    )
    assert out.count() == n_purchases
    assert out.select("purchase_id").distinct().count() == n_purchases


def test_asof_click_not_after_purchase(spark):
    out = T.asof_click_attribution(spark, SF_DIR).where(F.col("click_id").isNotNull())
    late = out.where(epoch_micros(out, "click_ts") > epoch_micros(out, "purchase_ts"))
    assert late.count() == 0


def test_range_join_within_window(spark):
    """Attributed value only counts purchases inside (click, click+30min]."""
    out = T.range_join_attribution(spark, SF_DIR)
    assert out.where(F.col("n_purchases") <= 0).count() == 0

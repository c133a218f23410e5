"""Temporal join operators over the events stream: as-of join and
range (interval) join — operators Spark lacks as primitives and the
reference lacks entirely (SURVEY.md §2.3), composed from equi-join +
window semantics per the custom-operator ladder (composition of built-in
DataFrame ops before any UDF).

Scale notes:
- Both joins are equi-keyed on ``user_id`` first, so Spark shuffles both
  sides by user and evaluates the temporal predicate within the key group —
  never a cross join.  Skewed users are AQE's skew-join case.
- The as-of "latest prior" pick is a per-left-row top-1 window, the same
  dedup-rank shape Catalyst pipelines after the join without an extra
  shuffle (window partitions by the join's output key).
- All temporal comparisons run on integer microseconds (``unix_micros`` /
  ``epoch_us``) so Spark and the DuckDB oracle agree exactly, including on
  fractional-second gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dream_spark.sources.tables import load_table

#: attribution window for the range join
RANGE_WINDOW_MIN = 30


def _typed_events(spark: SparkSession, sf_dir: str, etype: str, prefix: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == etype)
    return ev.select(
        F.col("event_id").alias(f"{prefix}_id"),
        F.col("user_id").alias(f"{prefix}_user"),
        F.col("ts").alias(f"{prefix}_ts"),
        F.col("value").alias(f"{prefix}_value"),
    )


def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: for every purchase, the user's latest click at-or-before
    the purchase time (classic last-touch attribution).  LEFT semantics —
    purchases with no prior click keep NULL click columns.

    Shape: equi-join on user + inequality on time, then top-1 per left row
    by (click_ts DESC, click_id DESC) with explicit NULLS LAST so both
    engines rank the unmatched-left row identically.
    """
    p = _typed_events(spark, sf_dir, "purchase", "purchase")
    c = _typed_events(spark, sf_dir, "click", "click")
    joined = p.join(
        c,
        (F.col("purchase_user") == F.col("click_user"))
        & (F.unix_micros("click_ts") <= F.unix_micros("purchase_ts")),
        "left_outer",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("click_ts").desc_nulls_last(), F.col("click_id").desc_nulls_last()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("purchase_id", "purchase_user", "purchase_ts", "click_id", "click_ts")
    )


ASOF_SQL = """
SELECT purchase_id, purchase_user, purchase_ts, click_id, click_ts
FROM (
  SELECT p.event_id AS purchase_id, p.user_id AS purchase_user, p.ts AS purchase_ts,
         c.event_id AS click_id, c.ts AS click_ts,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST) AS rn
  FROM events p
  LEFT OUTER JOIN events c
    ON c.user_id = p.user_id AND c.event_type = 'click'
   AND epoch_us(c.ts) <= epoch_us(p.ts)
  WHERE p.event_type = 'purchase'
)
WHERE rn = 1
""".strip()


def range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (interval) JOIN: purchases landing within RANGE_WINDOW_MIN
    minutes *after* each click, aggregated per click — the banded-time join
    every attribution/feature pipeline needs."""
    win_us = RANGE_WINDOW_MIN * 60 * 1_000_000
    c = _typed_events(spark, sf_dir, "click", "click")
    p = _typed_events(spark, sf_dir, "purchase", "purchase")
    joined = c.join(
        p,
        (F.col("click_user") == F.col("purchase_user"))
        & (F.unix_micros("purchase_ts") > F.unix_micros("click_ts"))
        & (F.unix_micros("purchase_ts") <= F.unix_micros("click_ts") + win_us),
    )
    return joined.groupBy("click_id", "click_user").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("purchase_value").cast("decimal(12,2)")).cast("double").alias("attributed_value"),
    )


RANGE_SQL = f"""
SELECT c.event_id AS click_id, c.user_id AS click_user,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE) AS attributed_value
FROM events c
JOIN events p
  ON p.user_id = c.user_id AND p.event_type = 'purchase'
 AND epoch_us(p.ts) > epoch_us(c.ts)
 AND epoch_us(p.ts) <= epoch_us(c.ts) + {RANGE_WINDOW_MIN * 60 * 1_000_000}
WHERE c.event_type = 'click'
GROUP BY c.event_id, c.user_id
""".strip()


QUERIES = {
    "temporal_asof": asof_click_attribution,
    "temporal_range": range_join_attribution,
}

ORACLES = {
    "temporal_asof": ASOF_SQL,
    "temporal_range": RANGE_SQL,
}

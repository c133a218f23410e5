"""Relational core operators: joins, aggregations, windows, top-k.

The reference has no aggregates/windows/order-by at all (SURVEY.md §2.3) —
this module is the declared superset that exercises the same Spark machinery
the SPARQL path uses (hash joins, partial aggregation, AQE) on the driver's
TPC-H-ish tables, plus the window/top-k operators a complete engine needs.

Cross-engine determinism contract (applies to every operator here and in the
other operator modules): floating aggregates are computed on DECIMAL-cast
inputs (exact, order-independent) and only the FINAL value is cast to DOUBLE,
so Spark and the DuckDB oracle produce bit-identical values regardless of
partition/accumulation order.  Raw double SUMs would differ in the last ulp
between any two execution orders — including between two Spark runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dream_spark.sources.tables import load_table

# Decimal shapes: prices < 5*10^5 with 2 decimals, discounts/tax in [0,0.1]
# with 2 decimals, quantity integral < 100.
_PRICE = "decimal(12,2)"
_RATE = "decimal(4,2)"
_QTY = "decimal(12,2)"

CUTOFF = "1999-01-01 00:00:00"


def _dec(col: str, typ: str):
    return F.col(col).cast(typ)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: scan-heavy partial aggregation (map-side combine).

    At 100 TB this is the pattern that must NOT shuffle raw rows: Catalyst
    plans partial_sum per partition, shuffles only #groups rows (6 groups).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    charge = disc_price * (F.lit(1).cast(_RATE) + _dec("l_tax", _RATE))
    return (
        li.where(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity", _QTY)).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice", _PRICE)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity", _QTY)).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS {_QTY})) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS {_PRICE})) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE}))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE})) * (1 + CAST(l_tax AS {_RATE}))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS {_QTY})) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""".strip()


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: 3-way join + agg + deterministic top-10.

    Scale notes: customer filter applied before the join (pushdown), orders
    joined on the shuffled key it already groups by, ordering ties broken by
    key so LIMIT is deterministic.
    """
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(CUTOFF).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(
        _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


Q3_SQL = f"""
SELECT o_orderkey,
       CAST(SUM(CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE}))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '{CUTOFF}'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY SUM(CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE}))) DESC, o_orderkey
LIMIT 10
""".strip()


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: the 5-way cycle join (same shape the SPARQL cycle
    query compiles to) — customer and supplier in the same nation.

    nation/region are broadcast-size dims; Spark broadcasts them under the
    threshold, so only the lineitem⋈orders⋈customer/supplier shuffles.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    revenue = F.sum(
        _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(revenue.cast("double").alias("revenue"))
    )


Q5_SQL = f"""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE}))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""".strip()


def window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window/top-k per group: rank each customer's orders by price, keep 3.

    Ranking on the DECIMAL value with key tiebreak makes row_number
    deterministic across engines and runs.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        _dec("o_totalprice", _PRICE).desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            _dec("o_totalprice", _PRICE).cast("double").alias("totalprice"),
            "rk",
        )
    )


WINDOW_TOP_SQL = f"""
SELECT o_custkey, o_orderkey,
       CAST(CAST(o_totalprice AS {_PRICE}) AS DOUBLE) AS totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS {_PRICE}) DESC, o_orderkey) AS rk
  FROM orders
) t
WHERE rk <= 3
""".strip()


def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative windowed aggregation: per-customer running spend over time."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec("o_totalprice", _PRICE)).over(w).cast("double").alias("running_spend"),
    )


WINDOW_RUNNING_SQL = f"""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS {_PRICE})) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
""".strip()


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation over the events stream table — the batch
    twin of streaming/events.py's windowed aggregation (same semantics the
    watermarked streaming query produces once windows close)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_PRICE)).cast("double").alias("sum_value"),
        )
    )


EVENTS_HOURLY_SQL = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS {_PRICE})) AS DOUBLE) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""".strip()


QUERIES = {
    "rel_q1_pricing": q1_pricing_summary,
    "rel_q3_top10": q3_shipping_priority,
    "rel_q5_cycle": q5_local_supplier_volume,
    "rel_window_top3": window_top_orders,
    "rel_window_running": window_running_spend,
    "rel_events_hourly": events_hourly,
}

ORACLES = {
    "rel_q1_pricing": Q1_SQL,
    "rel_q3_top10": Q3_SQL,
    "rel_q5_cycle": Q5_SQL,
    "rel_window_top3": WINDOW_TOP_SQL,
    "rel_window_running": WINDOW_RUNNING_SQL,
    "rel_events_hourly": EVENTS_HOURLY_SQL,
}

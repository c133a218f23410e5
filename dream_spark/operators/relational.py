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
        orders.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            _dec("o_totalprice", _PRICE).cast("double").alias("totalprice"),
            "rk",
        )
    )


def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: per order-priority quartile population and exact
    DECIMAL price boundaries — the percentile-bucket analysis SQL
    analysts run before choosing skew thresholds.

    NTILE(4) over a TOTAL order (DECIMAL price, key tiebreak) is
    deterministic and identically defined on both engines (equal buckets,
    remainder to the leading buckets); aggregating the buckets keeps the
    output at 4 rows per priority with exact-decimal min/max boundaries,
    so no float comparison exists anywhere.  One shuffle on the priority
    key; the quartile aggregate is partial-agg on (priority, quartile)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        _dec("o_totalprice", _PRICE).asc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("q", F.ntile(4).over(w).cast("bigint"))
        .groupBy("o_orderpriority", "q")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(_dec("o_totalprice", _PRICE)).cast("double").alias("lo_price"),
            F.max(_dec("o_totalprice", _PRICE)).cast("double").alias("hi_price"),
        )
    )


WINDOW_NTILE_SQL = f"""
SELECT o_orderpriority, q, COUNT(*) AS n_orders,
       CAST(MIN(CAST(o_totalprice AS {_PRICE})) AS DOUBLE) AS lo_price,
       CAST(MAX(CAST(o_totalprice AS {_PRICE})) AS DOUBLE) AS hi_price
FROM (
  SELECT o_orderpriority, o_totalprice,
         CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
                             ORDER BY CAST(o_totalprice AS {_PRICE}), o_orderkey) AS BIGINT) AS q
  FROM orders
) t
GROUP BY o_orderpriority, q
""".strip()


def median_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE median order price per priority: the ceil(n/2)-th
    value under the total (DECIMAL price, key) order — an actual data
    value, so the result is decimal-exact with no interpolation (the
    float-free percentile the oracle can hash; percentile_cont-style
    interpolation would put engine-floating-point in the output).

    One shuffle on the priority key; the rank window and the group count
    share that exchange, and the pick is a row-local predicate."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        _dec("o_totalprice", _PRICE).asc(), F.col("o_orderkey")
    )
    wc = Window.partitionBy("o_orderpriority")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") * 2 == F.col("n") + (F.col("n") % 2))  # ceil(n/2)
        .select(
            "o_orderpriority",
            F.col("n").cast("bigint").alias("n_orders"),
            _dec("o_totalprice", _PRICE).cast("double").alias("median_price"),
        )
    )


MEDIAN_SQL = f"""
SELECT o_orderpriority,
       CAST(n AS BIGINT) AS n_orders,
       CAST(CAST(o_totalprice AS {_PRICE}) AS DOUBLE) AS median_price
FROM (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(o_totalprice AS {_PRICE}), o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
) t
WHERE rn * 2 = n + (n % 2)
""".strip()


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


def window_order_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset window functions (LAG/LEAD): per customer, each order's
    price delta vs the PREVIOUS order and days until the NEXT order — the
    sequential-comparison window shape (rank and running-frame windows are
    covered by their own queries; offset access is a distinct executor
    path).  Deterministic ordering via the (date, key) composite; deltas
    in exact DECIMAL before the final double cast; day difference as
    integer date arithmetic, identical on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
    price = _dec("o_totalprice", _PRICE)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (price - F.lag(price, 1).over(w)).cast("double").alias("price_delta"),
        F.datediff(F.lead(F.col("o_orderdate"), 1).over(w), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_next"),
    )


WINDOW_DELTA_SQL = f"""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(CAST(o_totalprice AS {_PRICE})
            - LAG(CAST(o_totalprice AS {_PRICE}), 1) OVER w AS DOUBLE) AS price_delta,
       CAST(DATE_DIFF('day', o_orderdate, LEAD(o_orderdate, 1) OVER w) AS BIGINT) AS days_to_next
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
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


def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: hourly, daily, and grand
    totals of the events stream in ONE pass (`ROLLUP (day, hour)` —
    the continuous-aggregate shape time-series stores maintain).  Spark
    plans rollup as a single Expand + partial aggregation, so the fact
    rows are read once and only #groups rows shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_PRICE)).cast("double").alias("sum_value"),
        )
    )


EVENTS_ROLLUP_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       date_trunc('hour', ts) AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS {_PRICE})) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
""".strip()


EVENTS_HOURLY_SQL = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS {_PRICE})) AS DOUBLE) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""".strip()


def q4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: LEFT SEMI join — orders with ≥1 returned lineitem,
    counted by priority.  Semi joins ship only the join key of the probe
    side and stop at first match; the oracle's EXISTS is the same plan."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


Q4_SEMI_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""".strip()


def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers who never placed a 1-URGENT order — the
    NOT EXISTS shape (reference has no anti join at all, SURVEY.md §2.3)."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""".strip()


def q13_outer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog: LEFT OUTER join + two-level aggregation — the
    order-count-per-customer distribution including zero-order customers."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    per_cust = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""".strip()


def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: pure scan-filter-aggregate — the pattern where
    predicate pushdown into the parquet scan is the whole plan."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.sum(_dec("l_extendedprice", _PRICE) * _dec("l_discount", _RATE))
    return (
        li.where(
            (F.col("l_shipdate") < F.lit(CUTOFF).cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 10)
        )
        .agg(rev.cast("double").alias("revenue"))
    )


Q6_SQL = f"""
SELECT CAST(SUM(CAST(l_extendedprice AS {_PRICE}) * CAST(l_discount AS {_RATE})) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate < TIMESTAMP '{CUTOFF}'
  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 10
""".strip()


Q18_MIN_QTY = 150


def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: HAVING over a grouped join — orders whose total
    quantity exceeds a threshold, with their customer."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity", _QTY)).alias("qty_dec"))
        .where(F.col("qty_dec") > Q18_MIN_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("qty_dec").cast("double").alias("sum_qty"),
        )
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(qty_dec AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS {_QTY})) AS qty_dec
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS {_QTY})) > {Q18_MIN_QTY}
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""".strip()


def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (the hypertable-rollup shape): per
    (returnflag, linestatus), per returnflag subtotal, and grand total in
    one pass — Spark and DuckDB share ROLLUP null-marker semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity", _QTY)).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS {_QTY})) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""".strip()


def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull an integer out of the JSON ``props``
    column and aggregate — get_json_object stays JVM-side; the oracle uses
    DuckDB's json_extract on the identical path expression."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.when(k.isNotNull(), 1)).alias("n_with_k"),
    )


JSON_PROPS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 END) AS n_with_k
FROM events
GROUP BY event_type
""".strip()


# One ANSI-SQL text, two engines: the engine.sql() passthrough surface
# (reference O1 analog — the query *text* is the user API) run verbatim by
# Spark SQL and by the DuckDB oracle.
SQL_PASSTHROUGH = f"""
WITH spend AS (
  SELECT c_nationkey, c_custkey, SUM(CAST(o_totalprice AS {_PRICE})) AS tot
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_nationkey, c_custkey
)
SELECT c_nationkey, c_custkey, CAST(tot AS DOUBLE) AS total_spend, rnk
FROM (SELECT c_nationkey, c_custkey, tot,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY tot DESC, c_custkey) AS BIGINT) AS rnk
      FROM spend)
WHERE rnk <= 3
""".strip()


def sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """engine.sql(): the same ANSI text the oracle runs, executed by Spark
    SQL over the registered tables — Catalyst plans it, no translation."""
    from dream_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(SQL_PASSTHROUGH)


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: volume shipped between two nations in either
    direction — a 5-way join whose selective pair-predicate sits across two
    broadcast dims.  At scale only lineitem⋈orders⋈customer shuffles; both
    nation lookups broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nat.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nat.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")))
    vol = F.sum(_dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE)))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == F.col("sk"))
        .join(n2, cust.c_nationkey == F.col("ck"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(vol.cast("double").alias("revenue"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE}))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year, l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
""".strip()


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: conditional-aggregate ratio — share of revenue from
    ECONOMY-type parts.  Two CASE-WHEN sums in one pass; part is the
    broadcast side of the join.  Ratio computed on exact decimals, cast to
    double only at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    promo = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0).cast(_PRICE))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double")).alias(
                "promo_share"
            )
        )
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'ECONOMY'
                             THEN CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE}))
                             ELSE CAST(0 AS {_PRICE}) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE}))) AS DOUBLE)
       AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
""".strip()


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: COUNT(DISTINCT) per group with an exclusion
    predicate — distinct suppliers per (brand, type), skipping one brand.
    Spark plans distinct-agg as a two-phase expand+agg; only (brand, type,
    suppkey) triples shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#2")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#2'
GROUP BY p_brand, p_type
""".strip()


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: correlated scalar subquery — revenue from lineitems
    whose quantity is below half their part's average.

    The correlation is decorrelated into a per-part aggregate joined back
    (exactly what a decorrelating optimizer emits).  The avg comparison
    ``qty < 0.5 * avg(qty)`` is algebraically rewritten to
    ``2*qty*cnt < sum(qty)`` so both engines compare exact decimals —
    no division, no float rounding divergence."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity", _QTY)).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    return (
        li.join(per_part, li.l_partkey == F.col("pk"))
        .where(
            F.lit(2) * _dec("l_quantity", _QTY) * F.col("cnt_qty") < F.col("sum_qty")
        )
        .agg(F.sum(_dec("l_extendedprice", _PRICE)).cast("double").alias("small_qty_revenue"))
    )


Q17_SQL = f"""
SELECT CAST(SUM(CAST(l_extendedprice AS {_PRICE})) AS DOUBLE) AS small_qty_revenue
FROM lineitem
JOIN (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS {_QTY})) AS sum_qty, COUNT(*) AS cnt_qty
  FROM lineitem GROUP BY l_partkey
) ON l_partkey = pk
WHERE 2 * CAST(l_quantity AS {_QTY}) * cnt_qty < sum_qty
""".strip()


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: disjunction of conjunctive branches across a join —
    the OR-of-ANDs shape that defeats naive pushdown.  Catalyst still pushes
    the common join key and prunes columns; the disjunction evaluates
    post-join in one codegen stage."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    branch1 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 5))
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 11)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 20)
    )
    branch3 = (
        (F.col("p_brand") == "Brand#34")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity") >= 20)
        & (F.col("l_quantity") <= 30)
    )
    rev = F.sum(_dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE)))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(branch1 | branch2 | branch3)
        .agg(rev.cast("double").alias("revenue"))
    )


Q19_SQL = f"""
SELECT CAST(SUM(CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE}))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""".strip()


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: global scalar subquery + anti join + string ops —
    customers with above-average balance and no orders, grouped by a
    name-derived code.  The global (sum,count) aggregate is a single row
    cross-joined (broadcast) against customer; the above-average predicate
    ``bal > sum/cnt`` is rewritten to ``bal*cnt > sum`` on exact decimals."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    positive = cust.where(F.col("c_acctbal") > 0.0)
    glob = positive.agg(
        F.sum(_dec("c_acctbal", _PRICE)).alias("sum_bal"),
        F.count(F.lit(1)).alias("cnt_bal"),
    )
    return (
        positive.crossJoin(F.broadcast(glob))
        .where(_dec("c_acctbal", _PRICE) * F.col("cnt_bal") > F.col("sum_bal"))
        .join(orders, F.col("c_custkey") == orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 2).alias("code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal", _PRICE)).cast("double").alias("totacctbal"),
        )
    )


Q22_SQL = f"""
SELECT substr(c_name, 10, 2) AS code,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS {_PRICE})) AS DOUBLE) AS totacctbal
FROM customer
CROSS JOIN (
  SELECT SUM(CAST(c_acctbal AS {_PRICE})) AS sum_bal, COUNT(*) AS cnt_bal
  FROM customer WHERE c_acctbal > 0.0
)
WHERE c_acctbal > 0.0
  AND CAST(c_acctbal AS {_PRICE}) * cnt_bal > sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY substr(c_name, 10, 2)
""".strip()


def cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation: all 4 grouping sets over (returnflag, linestatus)
    in one pass — the full grouping-sets machinery (rollup covers only the
    hierarchical prefix sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity", _QTY)).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


CUBE_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS {_QTY})) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""".strip()


def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: the general form cube/rollup specialize —
    per-returnflag and per-linestatus marginals plus the grand total, but
    NOT the (flag, status) cross cells a CUBE would also emit.  One pass:
    Catalyst expands the sets with a single Expand node over the scan, so
    at 100 TB the cost is the same partial-aggregated scan as Q1 — the
    expansion multiplies rows map-side (3× here) BEFORE the #groups-sized
    shuffle, never re-reading the table per set."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.sum(_dec("l_quantity", _QTY)).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


GROUPING_SETS_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS {_QTY})) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""".strip()


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as columns.  The explicit value
    list keeps the plan single-pass (no distinct-values pre-scan) and the
    output schema static — the production form at scale."""
    ev = load_table(spark, sf_dir, "events")
    out = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).agg(F.count(F.lit(1)))
    return out.na.fill(0, EVENT_TYPES)


PIVOT_SQL = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events
GROUP BY user_id
""".strip()


def intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): BUILDING-segment customers who also
    placed an urgent order.  Spark plans INTERSECT as a distinct left-semi
    join — only distinct keys shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return building.intersect(urgent)


INTERSECT_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""".strip()


def except_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): customers minus those with any order — the
    set-difference twin of the anti join (distinct output, unlike rel_anti)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.select(F.col("c_custkey").alias("custkey")).subtract(
        orders.select(F.col("o_custkey").alias("custkey"))
    )


EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders
""".strip()


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: returned-item revenue per customer, top 20.

    Scale notes: the `l_returnflag = 'R'` filter is pushed into the lineitem
    scan; nation is broadcast; the three-way join shuffles on the join keys
    Catalyst picks, and only 20 rows survive the final sort (Spark plans
    TakeOrderedAndProject, no full sort).  Ties broken by unique c_custkey so
    the LIMIT boundary is deterministic across engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.sum(
        _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE}))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""".strip()


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog (no partsupp table in the corpus): parts whose
    lineitem revenue exceeds 0.1% of total revenue.

    The fraction predicate ``value > total * 0.001`` is rewritten to
    ``value * 1000 > total`` so both sides stay exact DECIMAL (no double
    rounding at the threshold).  The global total is one row, broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice", _PRICE)).alias("value_dec")
    )
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_dec") * F.lit(1000) > F.col("total_dec"))
        .select(F.col("l_partkey").alias("partkey"), F.col("value_dec").cast("double").alias("value"))
    )


Q11_SQL = f"""
SELECT l_partkey AS partkey, CAST(value_dec AS DOUBLE) AS value
FROM (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS {_PRICE})) AS value_dec
  FROM lineitem GROUP BY l_partkey
) CROSS JOIN (
  SELECT SUM(value_dec) AS total_dec FROM (
    SELECT SUM(CAST(l_extendedprice AS {_PRICE})) AS value_dec
    FROM lineitem GROUP BY l_partkey
  )
)
WHERE value_dec * 1000 > total_dec
""".strip()


def q12_priority_by_shipyear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog (no l_shipmode column): per ship-year, count of
    high-priority vs other orders among shipped lineitems — conditional
    aggregation after an orders⋈lineitem join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("l_shipdate").cast("bigint").alias("shipyear"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT EXTRACT(year FROM l_shipdate) AS shipyear,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY EXTRACT(year FROM l_shipdate)
""".strip()


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog: supplier(s) with maximum revenue over a quarter.

    The max is compared on exact DECIMAL (ties and the max itself are
    bit-stable across engines); only the final projection casts to double.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
        ).alias("rev_dec")
    )
    top = rev.agg(F.max("rev_dec").alias("max_dec"))
    return (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("rev_dec") == F.col("max_dec"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE}))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey AS suppkey, s_name AS name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
""".strip()


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: NATION_1's share of AMERICA-customer revenue per
    order-year.  A 6-way join whose two nation lookups and the region
    lookup broadcast; the ratio divides two exact DECIMAL sums as DOUBLE
    (identical on both engines).  At scale only
    lineitem⋈orders⋈customer shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    cnat = F.broadcast(
        nat.join(reg, nat.n_regionkey == reg.r_regionkey)
        .where(F.col("r_name") == "AMERICA")
        .select(F.col("n_nationkey").alias("cnk"))
    )
    snat = F.broadcast(nat.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")))
    rev = _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE))
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(cnat, cust.c_nationkey == F.col("cnk"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(snat, supp.s_nationkey == F.col("snk"))
        .select(F.year("o_orderdate").cast("bigint").alias("o_year"), rev.alias("volume"), "supp_nation")
    )
    agg = base.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume"))).alias("num"),
        F.sum("volume").alias("den"),
    )
    return agg.select(
        "o_year",
        (F.coalesce(F.col("num"), F.lit(0).cast(_PRICE)).cast("double") / F.col("den").cast("double")).alias(
            "mkt_share"
        ),
    )


Q8_SQL = f"""
WITH base AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE})) AS volume,
         ns.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'AMERICA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
)
SELECT o_year,
       CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume END), 0) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM base GROUP BY o_year
""".strip()


def q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog (no partsupp table in the testdata, so supply cost
    is modeled as 10% of the part's retail price — documented adaptation):
    profit by supplier nation and order-year for parts whose name contains
    'red'.  Part/nation lookups broadcast; all arithmetic on exact
    DECIMALs, final cast to DOUBLE."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nat = load_table(spark, sf_dir, "nation")
    red = F.broadcast(part.where(F.col("p_name").contains("red")).select("p_partkey", "p_retailprice"))
    snat = F.broadcast(nat.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("nation")))
    amount = _dec("l_extendedprice", _PRICE) * (F.lit(1).cast(_RATE) - _dec("l_discount", _RATE)) - _dec(
        "p_retailprice", _PRICE
    ) * F.lit(0.1).cast(_RATE) * _dec("l_quantity", _QTY)
    return (
        li.join(red, li.l_partkey == red.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(snat, supp.s_nationkey == F.col("snk"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS {_PRICE}) * (1 - CAST(l_discount AS {_RATE}))
                - CAST(p_retailprice AS {_PRICE}) * CAST(0.1 AS {_RATE}) * CAST(l_quantity AS {_QTY})) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
""".strip()


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog (the testdata lacks receipt/commit dates, so the
    'late' marker is l_returnflag = 'R'): suppliers whose returned line sits
    in a finished multi-supplier order where NO other supplier's line was
    returned — the EXISTS + NOT-EXISTS double-correlation shape, lowered to
    a left-semi then left-anti join, both keyed on l_orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    l1 = (
        li.join(orders.where(F.col("o_orderstatus") == "F"), li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
    )
    l2 = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    cand = l1.join(
        l2, (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")), "leftsemi"
    ).join(l3, (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")), "leftanti")
    return (
        cand.join(supp, F.col("sk") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""".strip()


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (no partsupp: a supplier's 'offer' for a part is its
    MIN lineitem extendedprice — exact decimal): for each part of size
    < 15, the supplier(s) with the minimum offer — the correlated-argmin
    shape, lowered to a window rank over the per-(part, supplier)
    aggregate, ties kept like Q2's ORDER BY tie semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    small = F.broadcast(part.where(F.col("p_size") < 15).select("p_partkey", "p_size"))
    offers = (
        li.join(small, li.l_partkey == small.p_partkey)
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.min(_dec("l_extendedprice", _PRICE)).alias("offer_dec"))
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("offer_dec"))
    best = offers.withColumn("rk", F.rank().over(w)).where(F.col("rk") == 1)
    return best.join(supp, best.l_suppkey == supp.s_suppkey).select(
        F.col("p_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
        "s_name",
        F.col("offer_dec").cast("double").alias("min_offer"),
    )


Q2_SQL = f"""
WITH offers AS (
  SELECT p_partkey, l_suppkey, MIN(CAST(l_extendedprice AS {_PRICE})) AS offer_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_size < 15
  GROUP BY p_partkey, l_suppkey
)
SELECT p_partkey AS partkey, l_suppkey AS suppkey, s_name,
       CAST(offer_dec AS DOUBLE) AS min_offer
FROM offers o JOIN supplier ON l_suppkey = s_suppkey
WHERE offer_dec = (SELECT MIN(offer_dec) FROM offers i WHERE i.p_partkey = o.p_partkey)
""".strip()


Q20_MIN_QTY = 2000


def q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog shape: semi-join against an AGGREGATED subquery —
    suppliers whose total shipped quantity of 'red' parts exceeds a
    threshold (the IN-over-derived-aggregate form; no partsupp in the
    testdata, so availability is modeled from lineitem).  The aggregate
    runs first (shuffle = #suppliers rows), then a left-semi join keeps
    supplier rows — the probe side never expands."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    red = F.broadcast(part.where(F.col("p_name").contains("red")).select("p_partkey"))
    bulk = (
        li.join(red, li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity", _QTY)).alias("qty_dec"))
        .where(F.col("qty_dec") > Q20_MIN_QTY)
    )
    return supp.join(bulk, supp.s_suppkey == bulk.l_suppkey, "leftsemi").select(
        "s_suppkey", "s_name"
    )


Q20_SQL = f"""
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%red%'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS {_QTY})) > {Q20_MIN_QTY}
)
""".strip()


def window_trailing_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window over a sparse integer day axis: per order
    priority, each active day's order count plus the trailing-7-DAY count
    and revenue.  RANGE (value-based) vs ROWS (position-based) is the
    point: on days with gaps, the frame must cover [day-6, day] by VALUE —
    the previous 7 ROWS would silently reach back weeks.  The day axis is
    integer epoch-days (the exact-time contract; DATE objects round-trip
    differently across engines) and revenue aggregates in DECIMAL then
    casts to double, like the other money windows."""
    from dream_spark.functions.timeutils import epoch_micros

    orders = load_table(spark, sf_dir, "orders")
    day_us = 86_400 * 1_000_000
    daily = (
        orders.select(
            "o_orderpriority",
            epoch_micros(orders, "o_orderdate").alias("__us"),
            _dec("o_totalprice", _PRICE).alias("price"),
        )
        # exact int64 division — a float quotient rounds across bucket
        # boundaries above 2^53 µs and diverges from the oracle's `//`
        .select(
            "o_orderpriority",
            F.expr(f"__us div {day_us}").alias("day"),
            "price",
        )
        .groupBy("o_orderpriority", "day")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("price").alias("rev"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("day").rangeBetween(-6, 0)
    return daily.select(
        "o_orderpriority",
        "day",
        "n_orders",
        F.sum("n_orders").over(w).cast("long").alias("trailing_n"),
        F.sum("rev").over(w).cast("double").alias("trailing_rev"),
    )


WINDOW_TRAILING_SQL = f"""
WITH daily AS (
  SELECT o_orderpriority, epoch_us(o_orderdate) // {86_400 * 1_000_000} AS day,
         COUNT(*) AS n_orders, SUM(CAST(o_totalprice AS {_PRICE})) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, day, n_orders,
       CAST(SUM(n_orders) OVER (PARTITION BY o_orderpriority ORDER BY day
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_n,
       CAST(SUM(rev) OVER (PARTITION BY o_orderpriority ORDER BY day
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_rev
FROM daily
""".strip()



QUERIES = {
    "rel_q1_pricing": q1_pricing_summary,
    "rel_q10_returns": q10_returned_items,
    "rel_q11_important": q11_important_parts,
    "rel_q12_priority": q12_priority_by_shipyear,
    "rel_q15_topsupp": q15_top_supplier,
    "rel_q3_top10": q3_shipping_priority,
    "rel_q5_cycle": q5_local_supplier_volume,
    "rel_window_top3": window_top_orders,
    "rel_window_ntile": window_ntile_quartiles,
    "rel_median": median_price_by_priority,
    "rel_window_running": window_running_spend,
    "rel_window_delta": window_order_deltas,
    "rel_window_movavg": window_trailing_week,
    "rel_events_hourly": events_hourly,
    "rel_events_rollup": events_time_rollup,
    "rel_q4_semi": q4_semi_join,
    "rel_anti": anti_join_customers,
    "rel_q13_outer": q13_outer_distribution,
    "rel_q6_filter": q6_revenue_delta,
    "rel_q18_having": q18_big_orders,
    "rel_rollup": rollup_pricing,
    "rel_json_props": json_props_stats,
    "rel_sql_passthrough": sql_passthrough,
    "rel_q7_nations": q7_nation_volume,
    "rel_q14_promo": q14_promo_share,
    "rel_q16_countd": q16_supplier_counts,
    "rel_q17_corr": q17_small_quantity,
    "rel_q19_disjunct": q19_disjunctive,
    "rel_q22_idle": q22_idle_customers,
    "rel_cube": cube_pricing,
    "rel_grouping_sets": grouping_sets_pricing,
    "rel_pivot": pivot_event_counts,
    "rel_intersect": intersect_segments,
    "rel_except": except_no_orders,
    "rel_q2_mincost": q2_min_cost_supplier,
    "rel_q8_share": q8_market_share,
    "rel_q9_profit": q9_profit,
    "rel_q20_bulk": q20_bulk_suppliers,
    "rel_q21_waiting": q21_waiting_supplier,
}

ORACLES = {
    "rel_q1_pricing": Q1_SQL,
    "rel_q10_returns": Q10_SQL,
    "rel_q11_important": Q11_SQL,
    "rel_q12_priority": Q12_SQL,
    "rel_q15_topsupp": Q15_SQL,
    "rel_q3_top10": Q3_SQL,
    "rel_q5_cycle": Q5_SQL,
    "rel_window_top3": WINDOW_TOP_SQL,
    "rel_window_ntile": WINDOW_NTILE_SQL,
    "rel_median": MEDIAN_SQL,
    "rel_window_running": WINDOW_RUNNING_SQL,
    "rel_window_delta": WINDOW_DELTA_SQL,
    "rel_window_movavg": WINDOW_TRAILING_SQL,
    "rel_events_hourly": EVENTS_HOURLY_SQL,
    "rel_events_rollup": EVENTS_ROLLUP_SQL,
    "rel_q4_semi": Q4_SEMI_SQL,
    "rel_anti": ANTI_SQL,
    "rel_q13_outer": Q13_SQL,
    "rel_q6_filter": Q6_SQL,
    "rel_q18_having": Q18_SQL,
    "rel_rollup": ROLLUP_SQL,
    "rel_json_props": JSON_PROPS_SQL,
    "rel_sql_passthrough": SQL_PASSTHROUGH,
    "rel_q7_nations": Q7_SQL,
    "rel_q14_promo": Q14_SQL,
    "rel_q16_countd": Q16_SQL,
    "rel_q17_corr": Q17_SQL,
    "rel_q19_disjunct": Q19_SQL,
    "rel_q22_idle": Q22_SQL,
    "rel_cube": CUBE_SQL,
    "rel_grouping_sets": GROUPING_SETS_SQL,
    "rel_pivot": PIVOT_SQL,
    "rel_intersect": INTERSECT_SQL,
    "rel_except": EXCEPT_SQL,
    "rel_q2_mincost": Q2_SQL,
    "rel_q8_share": Q8_SQL,
    "rel_q9_profit": Q9_SQL,
    "rel_q20_bulk": Q20_SQL,
    "rel_q21_waiting": Q21_SQL,
}

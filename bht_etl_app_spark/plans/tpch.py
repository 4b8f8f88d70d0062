"""Analytic queries over the TPC-H-ish fixture tables.

These exercise the general query surface the engine exposes beyond the
reference app's tabulation operators (SURVEY.md §2.4): joins
(broadcast + sort-merge), windows, sorts/limits/top-k, set ops and
date functions — all native DataFrame API so Catalyst picks physical
strategies (broadcast for dims, AQE for skew/coalescing).

Numeric determinism: money sums go through DECIMAL(18,2) so the
aggregate is exact (order-independent), then cast back to DOUBLE.
Plain double summation is order-dependent at the ULP level, which
breaks value-hash comparison against any other engine; the decimal
detour makes Spark and DuckDB produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem shipped on or before
    1998-09-02. Single shuffle on (l_returnflag, l_linestatus) with
    map-side partial aggregation; filter pushed to the parquet scan."""
    disc = (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge_mult = (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * disc).cast("double").alias("sum_disc_price"),
            F.sum(_dec("l_extendedprice") * disc * charge_mult).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3-style: top 10 open orders by revenue for one segment.
    customer is small -> Catalyst broadcasts it; orders⋈lineitem is the
    big sort-merge/shuffle join on the order key."""
    disc = (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_dec("l_extendedprice") * disc).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_region_nation_revenue(
    region: DataFrame, nation: DataFrame, customer: DataFrame,
    orders: DataFrame, lineitem: DataFrame,
) -> DataFrame:
    """Q5-style: revenue per (region, nation) via a 5-way join.
    region/nation broadcast (tiny dims); customer->orders->lineitem
    chains on keys. Explicit broadcast hints keep the plan stable at
    scale regardless of stats."""
    disc = (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(_dec("l_extendedprice") * disc).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "r_name", "n_name")
    )


Q5_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY revenue DESC, r_name, n_name
"""


def top_parts_per_brand(part: DataFrame, k: int = 3) -> DataFrame:
    """Window-function top-k: k most expensive parts per brand
    (row_number with a deterministic tiebreak)."""
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.select(
            "p_brand", "p_partkey", "p_retailprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= k)
    )


TOP_PARTS_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
  FROM part
) t
WHERE rn <= 3
"""


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti join (set difference): customers that never ordered.
    Spark left_anti = NOT EXISTS; broadcast or shuffled-hash chosen by
    Catalyst based on the build side size."""
    return (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        ).select("c_custkey", "c_name")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def active_order_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Set op INTERSECT: customer keys that appear in orders."""
    return customer.select("c_custkey").intersect(
        orders.select(F.col("o_custkey").alias("c_custkey"))
    )


ACTIVE_ORDER_CUSTOMERS_SQL = """
SELECT c_custkey FROM customer
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
"""


def orders_by_year(orders: DataFrame) -> DataFrame:
    """Date-function aggregate: order count + exact total price per year."""
    return (
        orders.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .orderBy("order_year")
    )


ORDERS_BY_YEAR_SQL = """
SELECT CAST(date_part('year', o_orderdate) AS INTEGER) AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1
ORDER BY 1
"""


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time window per event type — the batch
    equivalent of the streaming path (streaming/events.py reuses this
    aggregation via readStream + watermark)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""

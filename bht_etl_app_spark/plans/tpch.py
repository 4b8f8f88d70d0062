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


# ---------------------------------------------------------------------------
# Further TPC-H shapes adapted to the fixture schemas (lineitem has no
# commitdate/receiptdate/shipmode; customer has no acctbal — each query
# keeps the original's PLAN shape, which is what matters here).
# ---------------------------------------------------------------------------

def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-style correlated semi join with a
    non-equi component (lineitem shipped >90 days after order date).
    Spark plans a left-semi join on the order key with the date
    predicate as a join-side filter — one shuffle, no duplicate
    explosion from multi-lineitem orders."""
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp"))
        )
        .join(lineitem, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY 1
"""


def q12_priority_by_linestatus(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape: big join + CASE-bucketed conditional counts."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
"""


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue ratio over a broadcast
    dimension join (part is tiny relative to lineitem -> broadcast
    hash join, no shuffle of the fact side)."""
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    j = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev)).alias("promo"),
        F.sum(rev).alias("total"),
    )
    return agg.select(
        F.bround(
            F.lit(100.0) * F.col("promo").cast("double") / F.col("total").cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        F.col("total").cast("double").alias("total_revenue"),
    )


Q14_SQL = """
SELECT round_even(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
         AS promo_revenue_pct,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


def q15_top_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: aggregate view + scalar-subquery max, as a
    broadcast of a 1-row aggregate (no collect; fully lazy). DECIMAL
    revenue keeps the max comparison exact."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        supplier.join(rev, F.col("s_suppkey") == F.col("l_suppkey"))
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
"""


def q18_large_volume_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    min_qty: float = 300.0,
) -> DataFrame:
    """TPC-H Q18 shape: HAVING-subquery — aggregate lineitem per
    order, filter on the aggregate, then join back to orders and
    customer. The big groupBy pre-shrinks the fact side before any
    join touches it."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .where(F.col("sum_qty") > F.lit(min_qty).cast("decimal(18,2)"))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
) big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    branches over a broadcast part join. Catalyst extracts the common
    l_partkey = p_partkey equi-condition; the OR residual is evaluated
    post-join inside codegen."""
    j = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return j.where(b1 | b2 | b3).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q22_above_avg_suppliers(supplier: DataFrame) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery as a filter. The average
    is compared multiplicatively (bal * n > total) in DECIMAL so the
    threshold test is exact — no double-division ULP flakiness at the
    boundary."""
    pos = supplier.where(F.col("s_acctbal") > 0).agg(
        F.sum(_dec("s_acctbal")).alias("total_pos"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    return (
        supplier.crossJoin(F.broadcast(pos))
        .where(_dec("s_acctbal") * F.col("n_pos") > F.col("total_pos"))
        .groupBy(F.col("s_nationkey").cast("long").alias("s_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_dec("s_acctbal")).cast("double").alias("total_bal"),
        )
    )


Q22_SQL = """
WITH pos AS (
  SELECT SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS total_pos, COUNT(*) AS n_pos
  FROM supplier WHERE s_acctbal > 0
)
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
       COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM supplier, pos
WHERE CAST(s_acctbal AS DECIMAL(18,2)) * n_pos > total_pos
GROUP BY 1
"""


def q7_nation_volume(
    supplier: DataFrame, customer: DataFrame, orders: DataFrame,
    lineitem: DataFrame, nation: DataFrame,
    nation_a: str = "NATION_1", nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: supplier-nation x customer-nation trade volume
    by year, restricted to one nation pair in either direction. Two
    broadcast dim joins (nation twice under different aliases) hang
    off the orders⋈lineitem fact join."""
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    disc = (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    pair = (
        ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
        | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.sum(_dec("l_extendedprice") * disc).cast("double").alias("volume"))
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def q10_returned_top_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    nation: DataFrame, k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top-k.
    Deterministic top-k: DECIMAL revenue (exact -> no ULP ties) with
    c_custkey as the final tiebreak."""
    disc = (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    rev = (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_dec("l_extendedprice") * disc).alias("rev"))
    )
    return (
        rev.orderBy(F.col("rev").desc(), F.col("c_custkey").asc())
        .limit(k)
        .select("c_custkey", "c_name", "n_name", F.col("rev").cast("double").alias("revenue"))
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name, CAST(rev AS DOUBLE) AS revenue
FROM (
  SELECT c_custkey, c_name, n_name,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY 1, 2, 3
)
ORDER BY rev DESC, c_custkey
LIMIT 20
"""


def q13_order_count_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer including
    zero-order customers (left outer join, count of the join key, then
    a second groupBy over the counts)."""
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY 1
)
GROUP BY 1
"""


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average subquery — lineitem
    rows with quantity below 20% of their part's average quantity.
    The per-part average is a groupBy joined back on the part key (the
    decorrelated plan Catalyst would produce for the subquery); the
    0.2 threshold comparison is exact decimal (avg as sum/count via
    multiplicative compare: 5 * qty * n < total)."""
    per_part = lineitem.groupBy(F.col("l_partkey").alias("p_key")).agg(
        F.sum(_dec("l_quantity")).alias("qty_total"),
        F.count(F.lit(1)).alias("qty_n"),
    )
    j = (
        lineitem.join(F.broadcast(part.where(F.col("p_brand") == "Brand#23")),
                      F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("p_key"))
        .where(
            _dec("l_quantity") * F.lit(5) * F.col("qty_n") < F.col("qty_total")
        )
    )
    return j.agg(
        F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q17_SQL = """
WITH per_part AS (
  SELECT l_partkey AS p_key,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_total,
         COUNT(*) AS qty_n
  FROM lineitem GROUP BY 1
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = p_key
WHERE p_brand = 'Brand#23'
  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * qty_n < qty_total
"""


def q16_supplier_counts(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    with a NOT IN subquery exclusion (planned as a left-anti join —
    safe here because s_suppkey is non-null; a nullable NOT IN needs
    the null-aware anti join Spark also provides)."""
    excluded = supplier.where(F.col("s_name").like("%3%")).select("s_suppkey")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(
            (F.col("p_brand") != "Brand#12")
            & F.col("p_size").isin(1, 5, 9, 13)
        )
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#12'
  AND p_size IN (1, 5, 9, 13)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%3%')
GROUP BY 1, 2, 3
"""


def q21_sole_late_supplier(
    supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS pair): per multi-supplier
    order, find the supplier who was the ONLY one to ship late
    (>60 days after the order date), and count such orders per
    supplier. The exists/not-exists pair collapses into one grouped
    pass over the joined fact — per order: distinct suppliers,
    distinct late suppliers, and (when exactly one) that supplier."""
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    j = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", late.alias("late")
    )
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
        F.min(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    culprits = per_order.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    return (
        culprits.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier), F.col("late_supp") == F.col("s_suppkey"))
        .select(F.col("s_suppkey"), F.col("s_name"), F.col("numwait"))
    )


Q21_SQL = """
WITH j AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
         MIN(CASE WHEN late THEN l_suppkey END) AS late_supp
  FROM j GROUP BY 1
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Remaining TPC-H shapes (Q2/Q8/Q9/Q11/Q20). The fixtures have no
# partsupp table, so the supply relation is proxied by lineitem
# aggregates — per-(part, supplier) min price stands in for
# ps_supplycost, shipped-quantity sums for ps_availqty. Each query
# keeps the original's PLAN shape (correlated-min decorrelation,
# market-share conditional ratio, threshold-vs-global-aggregate,
# nested semi-join chain), which is what the engine exercises.
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
    nation: DataFrame, region: DataFrame,
    region_name: str = "EUROPE", p_type: str = "STANDARD", max_size: int = 15,
) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-cost supplier within a region.
    The correlated MIN subquery decorrelates into a groupBy over the
    supply relation joined back on (part, cost) — exactly the plan
    Catalyst produces for the SQL form. Supplier/nation/region dims
    broadcast; the supply aggregate shuffles once on the part key.
    DECIMAL min keeps the cost-equality join exact."""
    supply = lineitem.groupBy(
        F.col("l_partkey").alias("sp_partkey"),
        F.col("l_suppkey").alias("sp_suppkey"),
    ).agg(F.min(_dec("l_extendedprice")).alias("supply_cost"))
    regional_supp = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == region_name)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    regional_cost = supply.join(
        F.broadcast(regional_supp), F.col("sp_suppkey") == F.col("s_suppkey")
    )
    min_cost = regional_cost.groupBy(F.col("sp_partkey").alias("mc_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    wanted = part.where(
        (F.col("p_type") == p_type) & (F.col("p_size") <= max_size)
    )
    return (
        regional_cost.join(
            min_cost,
            (F.col("sp_partkey") == F.col("mc_partkey"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(wanted), F.col("sp_partkey") == F.col("p_partkey"))
        .select(
            "s_name", "n_name", "p_partkey", "p_name",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
        .orderBy("supply_cost", "p_partkey", "s_name")
        .limit(100)
    )


Q2_SQL = """
WITH supply AS (
  SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
  FROM lineitem GROUP BY 1, 2
),
regional AS (
  SELECT sp_partkey, sp_suppkey, supply_cost, s_name, n_name
  FROM supply
  JOIN supplier ON sp_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_name, n_name, p_partkey, p_name,
       CAST(supply_cost AS DOUBLE) AS supply_cost
FROM regional
JOIN (SELECT sp_partkey AS mc_partkey, MIN(supply_cost) AS min_cost
      FROM regional GROUP BY 1) mc
  ON sp_partkey = mc_partkey AND supply_cost = min_cost
JOIN part ON sp_partkey = p_partkey
WHERE p_type = 'STANDARD' AND p_size <= 15
ORDER BY supply_cost, p_partkey, s_name
LIMIT 100
"""


def q8_market_share(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
    orders: DataFrame, customer: DataFrame, nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA", share_nation: str = "NATION_2",
    p_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a regional market, per
    year — conditional-sum ratio over a 6-way join. part filters first
    (broadcast), customer-side nation/region broadcast to scope the
    market, supplier-side nation broadcast to tag the share nation."""
    vol = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    cust_nation = (
        nation.join(F.broadcast(region.where(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        lineitem.join(F.broadcast(part.where(F.col("p_type") == p_type)),
                      F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
    )
    agg = j.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == share_nation, vol)).alias("nation_vol"),
        F.sum(vol).alias("total_vol"),
    )
    return agg.select(
        "o_year",
        F.bround(
            F.coalesce(F.col("nation_vol"), F.lit(0).cast("decimal(18,2)")).cast("double")
            / F.col("total_vol").cast("double"),
            6,
        ).alias("mkt_share"),
        F.col("total_vol").cast("double").alias("total_volume"),
    ).orderBy("o_year")


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round_even(
         CAST(COALESCE(SUM(CASE WHEN n2.n_name = 'NATION_2'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) END),
                  0) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
         6) AS mkt_share,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_volume
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO'
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
ORDER BY 1
"""


def q9_product_type_profit(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
    orders: DataFrame, nation: DataFrame,
    name_fragment: str = "bolt",
) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for parts
    whose name contains a fragment. (No partsupp -> profit is the
    discounted revenue term only; the join tree — fact ⋈ filtered
    part ⋈ supplier ⋈ nation ⋈ orders — is the original's.)"""
    profit = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        lineitem.join(
            F.broadcast(part.where(F.col("p_name").contains(name_fragment))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%bolt%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


def q11_important_part_values(
    supplier: DataFrame, lineitem: DataFrame, nation: DataFrame,
    nation_name: str = "NATION_3", ppm_threshold: int = 10000,
) -> DataFrame:
    """TPC-H Q11 shape: parts whose value (shipped by one nation's
    suppliers) exceeds a fraction of that nation's total — a grouped
    aggregate filtered against a broadcast 1-row global aggregate.
    Threshold compare is multiplicative in DECIMAL (value * N > total)
    so the cut is exact; sums are re-cast to DECIMAL(18,2) first to
    keep the product in range on both engines."""
    nation_supp = (
        supplier.join(
            F.broadcast(nation.where(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    per_part = (
        lineitem.join(F.broadcast(nation_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).cast("decimal(18,2)").alias("part_value"))
    )
    total = per_part.agg(
        F.sum("part_value").cast("decimal(18,2)").alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value") * F.lit(ppm_threshold) > F.col("total_value"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
)
SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM per_part,
     (SELECT CAST(SUM(part_value) AS DECIMAL(18,2)) AS total_value FROM per_part) t
WHERE part_value * 10000 > total_value
ORDER BY part_value DESC, l_partkey
"""


def q20_dominant_part_suppliers(
    supplier: DataFrame, lineitem: DataFrame, part: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_1", name_prefix: str = "small",
    year: int = 1996,
) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subquery chain planned as semi
    joins — suppliers in one nation who were the DOMINANT shipper
    (>50% of the year's quantity) of some qualifying part. The inner
    per-(part, supplier) aggregate reuses itself for the per-part
    total (one shuffle, two aggregation levels), then a semi join
    reduces suppliers. Multiplicative DECIMAL compare keeps the 50%
    cut exact."""
    qualifying = part.where(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    shipped = (
        lineitem.where(F.year("l_shipdate") == year)
        .join(F.broadcast(qualifying), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).cast("decimal(18,2)").alias("supp_qty"))
    )
    per_part = shipped.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        F.sum("supp_qty").cast("decimal(18,2)").alias("part_qty")
    )
    dominant = shipped.join(
        per_part, F.col("l_partkey") == F.col("pp_partkey")
    ).where(F.col("supp_qty") * F.lit(2) > F.col("part_qty"))
    return (
        supplier.join(
            F.broadcast(nation.where(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


Q20_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS supp_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = 1996 AND p_name LIKE 'small%'
  GROUP BY 1, 2
),
dominant AS (
  SELECT l_suppkey FROM shipped
  JOIN (SELECT l_partkey AS pp_partkey,
               CAST(SUM(supp_qty) AS DECIMAL(18,2)) AS part_qty
        FROM shipped GROUP BY 1) pp
    ON l_partkey = pp_partkey
  WHERE supp_qty * 2 > part_qty
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
"""

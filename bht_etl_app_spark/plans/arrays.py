"""Array/vector, lateral-explode, and statistics query surface.

None of these exist in the reference (SURVEY.md §2.4 — no array
types, no explode, no statistical aggregates); they are engine
extensions for the training-data-pipeline north star: vector math
over embedding columns, corpus token statistics, and numerically
deterministic moments.

Determinism: float32 embeddings are widened to double before any
arithmetic (exact); in-array sums are sequential in both engines;
moments are derived from EXACT decimal power sums cast to double at
the very end with the identical formula on both sides — no
order-dependent double accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bht_etl_app_spark.operators.text import tokens_expr


def embedding_norms(emb: DataFrame) -> DataFrame:
    """Per-vector L2 norm + dimensionality — pure projection over the
    array column (scan-speed at any scale, no shuffle)."""
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.bround(F.sqrt(sq_sum), 6).alias("l2_norm"),
    )


EMBEDDING_NORMS_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       round_even(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                               x -> x * x))), 6) AS l2_norm
FROM embeddings
"""


def token_frequencies(docs: DataFrame, min_count: int = 10) -> DataFrame:
    """Corpus token frequencies via explode (lateral view): the
    canonical word count. Explode + single groupBy shuffle; frequency
    floor keeps the output bounded."""
    return (
        docs.select(F.explode(tokens_expr("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )


TOKEN_FREQUENCIES_SQL = """
SELECT token, COUNT(*) AS n
FROM (
  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
)
GROUP BY 1
HAVING COUNT(*) >= 10
"""


def quantity_moments(lineitem: DataFrame) -> DataFrame:
    """Mean / sample variance / stddev per return flag derived from
    EXACT decimal power sums (sum x, sum x² never touch doubles until
    the final formula), so the result is order-independent and
    bit-identical across engines — the pattern for deterministic
    statistics over a 100 TB shuffle."""
    q = F.col("l_quantity").cast("decimal(18,2)")
    agg = lineitem.groupBy("l_returnflag").agg(
        F.count("l_quantity").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    var = (n * s2 - s1 * s1) / (n * (n - F.lit(1.0)))
    return agg.select(
        "l_returnflag",
        "n",
        F.bround(s1 / n, 6).alias("mean_qty"),
        F.bround(var, 6).alias("var_qty"),
        F.bround(F.sqrt(var), 6).alias("std_qty"),
    )


QUANTITY_MOMENTS_SQL = """
WITH a AS (
  SELECT l_returnflag,
         COUNT(l_quantity) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round_even(s1 / n, 6) AS mean_qty,
       round_even((n * s2 - s1 * s1) / (n * (n - 1.0)), 6) AS var_qty,
       round_even(sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))), 6) AS std_qty
FROM a
"""


def statuses_per_priority(orders: DataFrame) -> DataFrame:
    """Grouped string aggregation, made deterministic by sorting the
    collected set before concatenation (collect_set order is
    partition-dependent; array_sort pins it)."""
    return orders.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


STATUSES_PER_PRIORITY_SQL = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


def price_histogram(orders: DataFrame, bucket_width: float = 60000.0) -> DataFrame:
    """Numeric binning (grouped histogram) with fixed-width buckets via
    explicit floor division — the same double arithmetic on both
    engines (width_bucket exists in Spark but not DuckDB; an identical
    expression beats two 'equivalent' builtins for differential
    testing). One pass, map-side combinable."""
    b = F.floor(F.col("o_totalprice") / F.lit(bucket_width)).cast("long")
    return orders.groupBy(b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


PRICE_HISTOGRAM_SQL = """
SELECT CAST(floor(o_totalprice / 60000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


def qty_price_correlation(lineitem: DataFrame) -> DataFrame:
    """Pearson correlation per return flag derived from EXACT decimal
    power sums (like quantity_moments): built-in corr() accumulates
    doubles in partition order and is NOT reproducible across
    partitionings; this formulation is, at the cost of one extra
    product column in the map-side aggregate."""
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    agg = lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return agg.select("l_returnflag", "n", F.bround(corr, 6).alias("corr_qty_price"))


QTY_PRICE_CORRELATION_SQL = """
WITH a AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round_even((n * sxy - sx * sy)
                  / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
         AS corr_qty_price
FROM a
"""


def props_key_counts(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: pull ``$.k`` out of the JSON props
    column (get_json_object stays JVM-side) and count per value."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.groupBy(k.alias("k")).agg(F.count(F.lit(1)).alias("n_events"))


PROPS_KEY_COUNTS_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       COUNT(*) AS n_events
FROM events GROUP BY 1
"""

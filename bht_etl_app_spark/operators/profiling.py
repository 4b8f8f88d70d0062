"""Data-quality profiling and constraint checking (the Deequ /
Great-Expectations capability class, engine-native).

A 100 TB ingest needs cheap answers to "what does this table look
like" and "does this batch satisfy the contract" BEFORE expensive
downstream stages run. Both operators here are single-pass
aggregations built entirely from Column expressions over the
DataFrame's own schema — no sampling, no Python, no second scan per
column:

- :func:`profile_table` — per-column null counts, exact distincts,
  numeric min/max in ONE aggregate (Catalyst plans the multi-distinct
  via Expand; at 100 TB swap ``exact=False`` for
  ``approx_count_distinct``'s one-pass HLL — same call shape).
- :func:`check_constraints` — named boolean rules evaluated as
  conditional counts in one pass; output is the audit row a pipeline
  gate consumes (rule, violations, pass).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_NUMERIC_TYPES = {
    "byte", "short", "integer", "long", "float", "double", "decimal",
}

# Column and rule names get spliced into stack() SQL text and backtick
# aliases; a quote or backtick in a name would otherwise surface as an
# opaque parse error far from the caller.
_SAFE_IDENT = re.compile(r"^[A-Za-z0-9_ .\-]+$")


def _check_idents(names, what: str) -> None:
    bad = [n for n in names if not _SAFE_IDENT.match(n)]
    if bad:
        raise ValueError(
            f"unsafe {what} name(s) {bad}: only letters, digits, "
            "underscore, space, dot and dash are allowed"
        )


def _is_numeric(dt) -> bool:
    return dt.typeName().startswith("decimal") or dt.typeName() in _NUMERIC_TYPES


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """One-pass column profile. Output: one row per profiled column —
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``
    with min/max as doubles for numeric columns and NULL otherwise
    (engine-neutral: stringified min/max of dates/decimals format
    differently across engines and would poison a differential
    oracle).

    ``exact=True`` uses ``count(DISTINCT c)`` per column — Catalyst
    expands the multi-distinct into one pass over an Expand node; at
    100 TB set ``exact=False`` for the HLL sketch
    (``approx_count_distinct``), which drops the Expand multiplier at
    ~2 % error. The wide aggregate row is unpivoted driver-free via
    ``stack`` into the long audit shape.
    """
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in schema]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    _check_idents(cols, "column")
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"__nulls_{c}__")
        )
        if exact:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}__"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c)).alias(f"__dist_{c}__")
            )
        if _is_numeric(schema[c]):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}__"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}__"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__min_{c}__"))
            aggs.append(F.lit(None).cast("double").alias(f"__max_{c}__"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nulls_{c}__`, `__dist_{c}__`, `__min_{c}__`, `__max_{c}__`"
        for c in cols
    )
    return wide.select(
        F.col("__n__").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def check_constraints(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Evaluate named boolean constraints (SQL expression strings over
    the DataFrame's columns) in one pass. A NULL rule result counts as
    a violation — an unevaluable constraint is a failed constraint.
    Output: ``(rule, n_rows, n_violations, passed)`` per rule, ordered
    by rule name for deterministic comparison.
    """
    if not rules:
        raise ValueError("no rules given")
    _check_idents(rules, "rule")
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for name, expr in rules.items():
        ok = F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))
        aggs.append(
            F.count(F.when(~ok, F.lit(1))).alias(f"__viol_{name}__")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', `__viol_{name}__`" for name in rules)
    return (
        wide.select(
            F.col("__n__").alias("n_rows"),
            F.expr(
                f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
            ),
        )
        .select(
            "rule",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_violations").cast("long").alias("n_violations"),
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("rule")
    )


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Join/aggregation-key skew diagnostic — the pre-flight check for
    the engine's own scale levers (salting, AQE skew-join splitting,
    broadcast thresholds). One row:

    ``(n_rows, n_keys, avg_per_key, max_per_key, top1_share, cv)``

    where ``cv`` is the coefficient of variation of per-key row counts
    (population stddev / mean — 0 for perfectly uniform keys, large
    for power-law keys) and ``top1_share`` is the hottest key's row
    fraction: the number that decides whether ONE task inherits the
    key after a shuffle.

    Scale shape: one key-count aggregation (map-side combine) to a
    key-cardinality-sized table, then one global fold of INTEGER power
    sums (Σc, Σc², max) — mean/variance derive exactly from integers,
    so the doubles are partitioning-invariant without a fold
    discipline (the quantity_moments rule). The square-sum rides
    DECIMAL(38,0) (HUGEINT in the oracle): a 1e10-row hot key squares
    to 1e20, past int64, and the variance is clamped at zero against
    float cancellation on near-uniform huge counts. No percentiles on purpose:
    an exact percentile over per-key counts would sort the key table;
    max/top-share/cv answer the skew question without it.
    """
    _check_idents([key_col], "key")
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("c"))
    return counts.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.round(
            F.sum("c").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_per_key"),
        F.max("c").cast("long").alias("max_per_key"),
        F.round(F.max("c").cast("double") / F.sum("c").cast("double"), 6).alias(
            "top1_share"
        ),
        F.round(
            F.sqrt(
                F.greatest(
                    F.sum(
                        F.col("c").cast("decimal(38,0)")
                        * F.col("c").cast("decimal(38,0)")
                    ).cast("double")
                    / F.count(F.lit(1)).cast("double")
                    - F.pow(
                        F.sum("c").cast("double") / F.count(F.lit(1)).cast("double"),
                        F.lit(2.0),
                    ),
                    F.lit(0.0),
                )
            )
            / (F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")),
            6,
        ).alias("cv"),
    )


KEY_SKEW_REPORT_SQL_TEMPLATE = """
WITH counts AS (
  SELECT {key} AS k, count(*) AS c FROM {table} GROUP BY 1
)
SELECT CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       round(CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avg_per_key,
       CAST(max(c) AS BIGINT) AS max_per_key,
       round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top1_share,
       round(sqrt(greatest(
                    CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                    - pow(CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE), 2.0),
                    0.0))
             / (CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6) AS cv
FROM counts
"""


def fk_audit(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Cross-table referential-integrity audit — the batch-contract
    check between fact and dimension loads: one row
    ``(n_child, n_orphans, orphan_rate)`` where orphans are child
    rows (NULL keys included — a NULL FK joins nothing) whose key has
    no parent. ONE left join of the child keys against the distinct
    parent key set (broadcast when dim-sized) feeding ONE conditional
    aggregate — no anti-join + re-count double pass, no 1-row
    cross join.
    """
    _check_idents([child_key], "child key")
    _check_idents([parent_key], "parent key")
    c = child.select(F.col(child_key).alias("__k__"))
    p = (
        parent.select(F.col(parent_key).alias("__k__"))
        .distinct()
        .withColumn("__hit__", F.lit(1))
    )
    return c.join(p, "__k__", "left").agg(
        F.count(F.lit(1)).cast("long").alias("n_child"),
        F.sum(F.when(F.col("__hit__").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_orphans"),
        F.round(
            F.sum(F.when(F.col("__hit__").isNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("orphan_rate"),
    )


def value_outlier_report(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    min_n: int = 8,
    k_mad: float = 3.0,
) -> DataFrame:
    """Per-key robust outlier audit: median / MAD (median absolute
    deviation) per key and the count of values beyond
    ``k_mad * MAD`` of the median — the robust-statistics sibling of
    z-scores (mean/stddev break under the very outliers being hunted;
    the median/MAD pair has a 50% breakdown point). The per-entity
    anomaly screen a metrics pipeline runs before trusting per-user
    aggregates. Output: ``(key, n, med, mad, n_outliers)``, keys with
    fewer than ``min_n`` values suppressed (tiny samples make MAD
    meaningless).

    Exactness & parity: exact medians (interpolating, matching
    DuckDB's ``median``); every double here derives from input values
    by interpolation halving and subtraction only — no
    accumulation-order-dependent float fold anywhere, so results are
    partitioning-invariant without rounding.

    Scale shape: ONE hash exchange on the key; both median windows
    and the final aggregate reuse that partitioning (the plan shows a
    single Exchange — pinned in tests), and each window frame is
    bounded by the per-key row count. Exact grouped medians sort
    within partitions only. Skewed keys are AQE's problem, same as
    ``sessionize``.
    """
    _check_idents([key_col, value_col], "column")
    w = Window.partitionBy(key_col)
    base = (
        df.where(F.col(value_col).isNotNull())
        .select(key_col, F.col(value_col).cast("double").alias("__v__"))
        .withColumn("__med__", F.median("__v__").over(w))
        .withColumn("__ad__", F.abs(F.col("__v__") - F.col("__med__")))
        .withColumn("__mad__", F.median("__ad__").over(w))
    )
    return (
        base.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("__med__").alias("med"),
            F.min("__mad__").alias("mad"),
            F.sum(
                F.when(
                    F.col("__ad__") > F.lit(float(k_mad)) * F.col("__mad__"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .where(F.col("n") >= int(min_n))
    )


# one oracle scheme for every value_outlier_report carrier — a
# template so a quantization/threshold change can never drift
# between carriers (the chi2-template rule)
VALUE_OUTLIER_SQL_TEMPLATE = """
WITH base AS (
  SELECT {key}, CAST({value} AS DOUBLE) AS v
  FROM {table} WHERE {value} IS NOT NULL
),
med AS (
  SELECT {key}, median(v) AS med, count(*) AS n
  FROM base GROUP BY 1
),
ad AS (
  SELECT b.{key}, abs(b.v - m.med) AS ad, m.med, m.n
  FROM base b JOIN med m USING ({key})
),
mad AS (
  SELECT {key}, median(ad) AS mad FROM ad GROUP BY 1
)
SELECT a.{key},
       CAST(max(a.n) AS BIGINT) AS n,
       max(a.med) AS med,
       max(m.mad) AS mad,
       CAST(sum(CASE WHEN a.ad > CAST({k_mad} AS DOUBLE) * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM ad a JOIN mad m USING ({key})
GROUP BY a.{key}
HAVING max(a.n) >= {min_n}
"""

VALUE_OUTLIER_SQL = VALUE_OUTLIER_SQL_TEMPLATE.format(
    table="events", key="user_id", value="value", k_mad="3.0", min_n=8
)


# log10(1 + 1/d) for d = 1..9, precomputed so neither engine's log10
# is in the value path (only the exact literal is).
_BENFORD_EXPECTED = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_audit(
    df: DataFrame, amount_col: str = "o_totalprice"
) -> DataFrame:
    """First-digit (Benford's law) audit of an amount column — the
    classic fabricated-/corrupted-data screen: naturally occurring
    multi-scale amounts have first-digit share ~log10(1+1/d), while
    invented or truncated data do not. Output: one row per leading
    digit, ``(digit, n, obs_p, exp_p, excess)``, ``excess`` =
    observed minus expected share.

    Exactness: the digit is extracted via INTEGER floor + string
    head — no ``log10`` in the row path, whose rounding at exact
    powers of ten differs per libm and would misbucket boundary
    amounts; the expected shares are precomputed literals, identical
    in both engines; ``obs_p`` is one int/int division. Amounts
    below 1 are excluded (their leading digit needs the fractional
    expansion, a different audit).

    Scale shape: one map-side-combining aggregate to ≤ 9 rows; the
    share normalizer is a window over those 9 rows.
    """
    digit = F.substring(
        F.floor(F.col(amount_col)).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.where(F.col(amount_col) >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    exp_p = F.coalesce(
        *[
            F.when(F.col("digit") == d, F.lit(v))
            for d, v in _BENFORD_EXPECTED.items()
        ]
    )
    obs_p = F.col("n").cast("double") / F.sum("n").over(
        Window.partitionBy()
    ).cast("double")
    return counts.select(
        "digit",
        "n",
        obs_p.alias("obs_p"),
        exp_p.alias("exp_p"),
        (obs_p - exp_p).alias("excess"),
    )


# template (the chi2-template rule): every Benford carrier derives
# its oracle here so digit extraction can never drift per-carrier
BENFORD_AUDIT_SQL_TEMPLATE = """
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(floor({amount}) AS BIGINT) AS VARCHAR),
                     1, 1) AS INTEGER) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM {table}
  WHERE {amount} >= 1
  GROUP BY 1
),
exp AS (
  SELECT * FROM (VALUES
    (1, CAST(0.3010299956639812 AS DOUBLE)),
    (2, CAST(0.17609125905568124 AS DOUBLE)),
    (3, CAST(0.12493873660829992 AS DOUBLE)),
    (4, CAST(0.09691001300805642 AS DOUBLE)),
    (5, CAST(0.07918124604762482 AS DOUBLE)),
    (6, CAST(0.06694678963061322 AS DOUBLE)),
    (7, CAST(0.05799194697768673 AS DOUBLE)),
    (8, CAST(0.05115252244738129 AS DOUBLE)),
    (9, CAST(0.04575749056067514 AS DOUBLE))) AS t(digit, exp_p)
)
SELECT c.digit, c.n,
       CAST(c.n AS DOUBLE) / CAST(sum(c.n) OVER () AS DOUBLE) AS obs_p,
       e.exp_p,
       CAST(c.n AS DOUBLE) / CAST(sum(c.n) OVER () AS DOUBLE) - e.exp_p
         AS excess
FROM counts c JOIN exp e USING (digit)
"""

BENFORD_AUDIT_SQL = BENFORD_AUDIT_SQL_TEMPLATE.format(
    table="orders", amount="o_totalprice"
)


def price_drift_psi(
    df: DataFrame,
    value_col: str = "o_totalprice",
    date_col: str = "o_orderdate",
    pivot: str = "1996-01-01",
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference period
    (``date < pivot``) and a current period — THE standard drift
    metric for monitoring a feature/score distribution between
    training time and serving time:
    ``PSI = Σ_bins (p_cur - p_ref) · ln(p_cur / p_ref)`` over decile
    bins of the REFERENCE distribution (<0.1 stable, >0.25 drifted).
    Output: one row per bin — ``(bin, n_ref, n_cur, p_ref, p_cur,
    contrib, psi_total)`` (``psi_total`` repeated for convenience).

    Determinism: bin cut points are reference-percentiles quantized
    at 6dp in both engines — 6dp is DELIBERATE: for price-magnitude
    cuts (~1e5) a 12dp quantum sits BELOW one ulp (~1.5e-11) and
    rounds every double to itself, protecting nothing; 1e-6 is far
    above ulp spacing yet far below the bin widths, so a 1-ulp
    interpolation divergence between the engines can never move a
    cut. Proportions are Laplace-smoothed ``(n + 0.5) / (N + 0.5·B)``
    so an empty current bin stays finite — all exact-int-derived;
    each bin's ``ln`` contribution is 12dp-quantized (O(1) magnitude,
    where 12dp genuinely absorbs jitter), and the total rides the
    frame-ordered list fold (the KM rule), never a float window sum.

    Scale shape: one reference pass for the cuts (1-row broadcast) +
    ONE counting scan that bins both periods with conditional sums —
    no second scan, no outer join; everything after runs on
    ≤ ``n_bins`` rows.
    """
    fracs = ", ".join(
        f"{i / n_bins:.10f}D" for i in range(1, int(n_bins))
    )
    is_ref = F.col(date_col) < F.lit(pivot).cast("timestamp")
    cuts = (
        df.where(is_ref)
        .agg(
            F.expr(
                f"transform(percentile(CAST({value_col} AS DOUBLE),"
                f" array({fracs})), c -> bround(c, 6))"
            ).alias("__cuts__")
        )
    )
    joined = (
        df.select(
            F.col(value_col).cast("double").alias("__v__"),
            is_ref.alias("__is_ref__"),
        )
        .crossJoin(F.broadcast(cuts))
        .select(
            (
                F.lit(1)
                + F.size(
                    F.filter(F.col("__cuts__"), lambda c: F.col("__v__") > c)
                )
            ).alias("bin"),
            "__is_ref__",
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("__is_ref__"), 1).otherwise(0))
            .cast("long")
            .alias("n_ref"),
            F.sum(F.when(F.col("__is_ref__"), 0).otherwise(1))
            .cast("long")
            .alias("n_cur"),
        )
    )
    tot = Window.orderBy("bin").rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = float(n_bins)
    p_ref = (F.col("n_ref").cast("double") + F.lit(0.5)) / (
        F.sum("n_ref").over(tot).cast("double") + F.lit(0.5 * b)
    )
    p_cur = (F.col("n_cur").cast("double") + F.lit(0.5)) / (
        F.sum("n_cur").over(tot).cast("double") + F.lit(0.5 * b)
    )
    staged = joined.select(
        "bin",
        "n_ref",
        "n_cur",
        p_ref.alias("p_ref"),
        p_cur.alias("p_cur"),
        F.bround(
            (p_cur - p_ref) * F.log(p_cur / p_ref), 12
        ).alias("contrib"),
    )
    psi = F.bround(
        F.aggregate(
            F.collect_list("contrib").over(
                Window.orderBy("bin").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        12,
    )
    return staged.select("*", psi.alias("psi_total"))


PRICE_DRIFT_PSI_SQL = """
WITH cuts AS (
  SELECT list_transform(
           quantile_cont(CAST(o_totalprice AS DOUBLE),
                         [0.1000000000, 0.2000000000, 0.3000000000,
                          0.4000000000, 0.5000000000, 0.6000000000,
                          0.7000000000, 0.8000000000, 0.9000000000]),
           c -> round_even(c, 6)) AS cs
  FROM orders
  WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
),
joined AS (
  SELECT 1 + len(list_filter(cuts.cs,
                             c -> CAST(o_totalprice AS DOUBLE) > c)) AS bin,
         CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
  FROM orders, cuts
  GROUP BY 1
),
staged AS (
  SELECT bin, n_ref, n_cur,
         (CAST(n_ref AS DOUBLE) + CAST(0.5 AS DOUBLE))
           / (CAST(sum(n_ref) OVER () AS DOUBLE) + CAST(5.0 AS DOUBLE))
           AS p_ref,
         (CAST(n_cur AS DOUBLE) + CAST(0.5 AS DOUBLE))
           / (CAST(sum(n_cur) OVER () AS DOUBLE) + CAST(5.0 AS DOUBLE))
           AS p_cur
  FROM joined
),
contribs AS (
  SELECT bin, n_ref, n_cur, p_ref, p_cur,
         round_even((p_cur - p_ref) * ln(p_cur / p_ref), 12) AS contrib
  FROM staged
)
SELECT bin, n_ref, n_cur, p_ref, p_cur, contrib,
       round_even(list_sum(list(contrib) OVER (
         ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING)), 12) AS psi_total
FROM contribs
"""


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    privacy gate a dataset passes BEFORE release/training: every row
    should be indistinguishable from at least ``k-1`` others on the
    quasi-identifiers (Sweeney 2002); groups smaller than ``k`` are
    re-identification risks. One summary row: ``(n_rows, n_groups,
    min_group_size, groups_below_k, rows_below_k, k)`` — a release
    gate checks ``groups_below_k == 0``, and ``rows_below_k`` sizes
    the suppression/generalization work if it isn't.

    Pure integer derivation (two map-side-combining aggregates), so
    the audit is deterministic with no float discipline at all.
    Scale shape: one shuffle on the quasi-key to a group-cardinality
    table, then a 1-row fold.
    """
    if not quasi_cols:
        raise ValueError("at least one quasi-identifier column required")
    _check_idents(quasi_cols, "quasi-identifier")
    c = F.col("__c__")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("__c__"))
        .agg(
            F.sum(c).cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min(c).cast("long").alias("min_group_size"),
            F.sum(F.when(c < int(k), 1).otherwise(0))
            .cast("long")
            .alias("groups_below_k"),
            F.sum(F.when(c < int(k), c).otherwise(0))
            .cast("long")
            .alias("rows_below_k"),
            F.lit(int(k)).cast("long").alias("k"),
        )
    )


K_ANONYMITY_EVENTS_SQL = """
WITH g AS (
  SELECT event_type, hour(ts) AS hour_of_day, count(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(c) AS BIGINT) AS min_group_size,
       CAST(sum(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_k,
       CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT)
         AS rows_below_k,
       CAST(5 AS BIGINT) AS k
FROM g
"""


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_min: int = 3,
) -> DataFrame:
    """l-diversity audit — k-anonymity's necessary companion
    (Machanavajjhala 2007): a quasi-identifier group can be large
    (k-anonymous) yet still leak if everyone in it shares the same
    SENSITIVE value; each group must contain at least ``l`` distinct
    sensitive values. One summary row: ``(n_rows, n_groups, min_l,
    groups_below_l, rows_below_l, l)`` — release gate is
    ``groups_below_l == 0``.

    Pure integer derivation: one exact distinct-count aggregation on
    the (quasi, sensitive) key, then the group fold — deterministic,
    no float anywhere. Scale shape: the distinct is a two-level
    map-side-combining aggregate keyed on (quasi, sensitive), then a
    group-cardinality table, then a 1-row fold; for web-scale
    sensitive cardinalities swap the exact distinct for the HLL
    sketch path (the ``profile_orders_approx`` pattern) — the gate
    comparison tolerates sketch error at l ≫ rsd.
    """
    if not quasi_cols:
        raise ValueError("at least one quasi-identifier column required")
    _check_idents(quasi_cols + [sensitive_col], "audit")
    g = (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("__c__"),
            F.countDistinct(sensitive_col).alias("__l__"),
        )
    )
    c, lv = F.col("__c__"), F.col("__l__")
    return g.agg(
        F.sum(c).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min(lv).cast("long").alias("min_l"),
        F.sum(F.when(lv < int(l_min), 1).otherwise(0))
        .cast("long")
        .alias("groups_below_l"),
        F.sum(F.when(lv < int(l_min), c).otherwise(0))
        .cast("long")
        .alias("rows_below_l"),
        F.lit(int(l_min)).cast("long").alias("l"),
    )


L_DIVERSITY_EVENTS_SQL = """
WITH g AS (
  SELECT event_type, hour(ts) AS hour_of_day,
         count(*) AS c, count(DISTINCT user_id) AS l
  FROM events GROUP BY 1, 2
)
SELECT CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(l) AS BIGINT) AS min_l,
       CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_l,
       CAST(sum(CASE WHEN l < 3 THEN c ELSE 0 END) AS BIGINT)
         AS rows_below_l,
       CAST(3 AS BIGINT) AS l
FROM g
"""


def chi2_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson chi-square test of independence over the
    ``row_col × col_col`` contingency table — the categorical-drift /
    association audit behind "is event mix independent of hour?"
    (pairs with the crosstab operator the way ``ab_test_zstats``
    pairs with the funnel). One row: ``(chi2, dof, n, n_rows,
    n_cols)``; compare chi2 against the chi-square quantile at dof
    externally (no CDF in either engine).

    Exactness: expected counts are cleared to integers — the cell
    term ``(o−e)²/e`` with ``e=r·c/N`` becomes ``(o·N − r·c)² /
    (N·r·c)``; the difference is computed EXACTLY in DECIMAL(38,0)
    then cast once to double, so each term is one fixed-association
    double expression of exact ints. Terms are quantized at 6dp
    (magnitude-aware: terms reach O(N), where a 12dp quantum sits
    below ulp spacing and quantizes nothing) and summed as
    DECIMAL(38,6) — exact, order-free accumulation.

    Zero cells COUNT: the table is densified to the full
    |rows|·|cols| grid (an unobserved combination still contributes
    ``e = r·c/N`` to the statistic — dropping it would understate
    chi2 while dof assumes the full table).

    Scale shape: one map-side-combining aggregate to cell counts,
    densified by crossing the two marginal frames (both
    category-cardinality-sized, broadcast), observed counts left-
    joined back on — everything past the first aggregate is
    |rows|·|cols|-sized, NOT data-sized; 1-row fold.
    """
    _check_idents([row_col, col_col], "audit")
    obs = df.groupBy(row_col, col_col).agg(
        F.count(F.lit(1)).cast("long").alias("__o__")
    )
    rt = obs.groupBy(row_col).agg(F.sum("__o__").cast("long").alias("__r__"))
    ct = obs.groupBy(col_col).agg(F.sum("__o__").cast("long").alias("__c__"))
    tot = obs.agg(
        F.sum("__o__").cast("long").alias("__n__"),
        F.countDistinct(row_col).cast("long").alias("__nr__"),
        F.countDistinct(col_col).cast("long").alias("__nc__"),
    )
    grid = rt.crossJoin(F.broadcast(ct))
    j = (
        grid.join(obs, [row_col, col_col], "left")
        .withColumn("__o__", F.coalesce(F.col("__o__"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    diff = (dec("__o__") * dec("__n__") - dec("__r__") * dec("__c__")).cast(
        "double"
    )
    term = (diff * diff) / (
        F.col("__n__").cast("double")
        * F.col("__r__").cast("double")
        * F.col("__c__").cast("double")
    )
    return j.agg(
        F.bround(
            F.sum(F.bround(term, 6).cast("decimal(38,6)")).cast("double"), 6
        ).alias("chi2"),
        ((F.first("__nr__") - 1) * (F.first("__nc__") - 1))
        .cast("long")
        .alias("dof"),
        F.first("__n__").alias("n"),
        F.first("__nr__").alias("n_rows"),
        F.first("__nc__").alias("n_cols"),
    )


# the one chi2 oracle scheme (per-term 6dp round_even -> DECIMAL(38,6)
# sum -> 6dp final; HUGEINT overflow routing; densified grid) — every
# chi2 carrier derives from this template so the quantization tuning
# can never drift between carriers (review finding)
CHI2_SQL_TEMPLATE = """
WITH obs AS (
  SELECT {row_expr} AS rv, {col_expr} AS cv, CAST(count(*) AS BIGINT) AS o
  FROM {table} GROUP BY 1, 2
),
rt AS (SELECT rv, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
ct AS (SELECT cv, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n,
         CAST(count(DISTINCT rv) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT cv) AS BIGINT) AS n_cols
  FROM obs
),
cells AS (
  SELECT rt.rv, ct.cv, rt.r, ct.c, coalesce(obs.o, 0) AS o
  FROM rt CROSS JOIN ct
  LEFT JOIN obs ON obs.rv = rt.rv AND obs.cv = ct.cv
)
SELECT round_even(CAST(sum(CAST(round_even(
           (CAST(CAST(o AS HUGEINT) * CAST(n AS HUGEINT)
                 - CAST(r AS HUGEINT) * CAST(c AS HUGEINT) AS DOUBLE)
            * CAST(CAST(o AS HUGEINT) * CAST(n AS HUGEINT)
                 - CAST(r AS HUGEINT) * CAST(c AS HUGEINT) AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE)),
           6) AS DECIMAL(38,6))) AS DOUBLE), 6) AS chi2,
       CAST((any_value(n_rows) - 1) * (any_value(n_cols) - 1) AS BIGINT)
         AS dof,
       any_value(n) AS n, any_value(n_rows) AS n_rows,
       any_value(n_cols) AS n_cols
FROM cells CROSS JOIN tot
"""

CHI2_EVENTS_SQL = CHI2_SQL_TEMPLATE.format(
    table="events", row_expr="event_type", col_expr="hour(ts)"
)

"""A4 — weighted crosstab with percent blocks and margins
(reference app.py:118-156).

pandas semantics preserved exactly:

- ``pivot_table(index=rows, columns=cols, values=w, aggfunc=sum,
  fill_value=0)`` — NULL row/col keys are dropped (pandas groupby
  ``dropna=True``).
- percent base 'total' | 'row' | 'col'; zero denominators -> NULL.
- pct is rounded BEFORE margins are summed, so margins accumulate
  rounding drift — replicated, not "fixed".
- margin quirks: for percent='row' the Total *row* is hard-set to
  100.0 per column (so its own Total cell = 100 * n_value_cols); for
  percent='col' the Total *column* is hard-set to 100.0
  (app.py:148-149).
- count block and pct block are stacked with a ``__type__``
  discriminator ('count' vs '%_total'/'%_row'/'%_col').
- pandas ``sum(skipna=True)``: margin sums treat NULL as 0; an
  all-NULL slice sums to 0.0.

Scale notes: the pivot shuffles once on the row key with map-side
partial aggregation; pass ``col_values`` explicitly for a known column
domain to skip the distinct-values job Spark otherwise runs. The
margin arithmetic operates on the *post-pivot* aggregate (cardinality
= distinct row keys), so window/union tricks there are cheap at any
input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bht_etl_app_spark.functions.exprs import weight_expr


def crosstab_table(
    df: DataFrame,
    rows: str,
    cols: str,
    weight_col: str | None = None,
    percent: str = "total",
    include_totals: bool = True,
    decimals: int = 1,
    col_values: list[str] | None = None,
) -> DataFrame:
    """Build the stacked count+pct crosstab. Output schema:
    ``(<rows>: string, <v1>: double, ..., Total?: double, __type__)``.
    Row/col keys are stringified (pivot labels are strings; the Total
    margin label requires a string row key).
    """
    if percent not in ("total", "row", "col"):
        raise ValueError("percent must be 'total' | 'row' | 'col'")
    w = weight_expr(df, weight_col)
    base = (
        df.where(F.col(rows).isNotNull() & F.col(cols).isNotNull())
        .select(
            F.col(rows).cast("string").alias(rows),
            F.col(cols).cast("string").alias("__c__"),
            w.alias("__w__"),
        )
    )
    if col_values is None:
        col_values = sorted(
            r[0] for r in base.select("__c__").distinct().collect()
        )
    vals = list(col_values)

    piv = (
        base.groupBy(rows)
        .pivot("__c__", vals)
        .agg(F.sum("__w__"))
        .na.fill(0.0, vals)
    )

    row_sum = sum((F.col(v) for v in vals), F.lit(0.0))

    # ---- percent block (per data row, before margins) ----
    if percent == "row":
        denom = F.nullif(row_sum, F.lit(0.0))
        pct_cells = [
            F.bround(F.col(v) / denom * 100, decimals).alias(v) for v in vals
        ]
        pct = piv.select(rows, *pct_cells)
    elif percent == "col":
        col_sums = piv.agg(
            *[F.sum(v).alias(f"__s_{v}") for v in vals]
        )
        pct = piv.crossJoin(F.broadcast(col_sums)).select(
            rows,
            *[
                F.bround(
                    F.col(v) / F.nullif(F.col(f"__s_{v}"), F.lit(0.0)) * 100,
                    decimals,
                ).alias(v)
                for v in vals
            ],
        )
    else:  # total
        grand = piv.agg(
            F.nullif(
                sum((F.coalesce(F.sum(v), F.lit(0.0)) for v in vals), F.lit(0.0)),
                F.lit(0.0),
            ).alias("__g__")
        )
        pct = piv.crossJoin(F.broadcast(grand)).select(
            rows,
            *[
                F.bround(F.col(v) / F.col("__g__") * 100, decimals).alias(v)
                for v in vals
            ],
        )

    # pandas sum(skipna): NULL cells count as 0, all-NULL -> 0.0
    def _skipna_row_sum(cells):
        return sum((F.coalesce(c, F.lit(0.0)) for c in cells), F.lit(0.0))

    if include_totals:
        # count block: Total row = column sums; Total col = row sums
        # (Total row added first, so its Total cell = grand total).
        count_total_row = piv.agg(
            *[F.coalesce(F.sum(v), F.lit(0.0)).alias(v) for v in vals]
        ).select(F.lit("Total").alias(rows), *vals)
        counts = piv.unionByName(count_total_row).withColumn(
            "Total", _skipna_row_sum([F.col(v) for v in vals])
        )

        # pct block margins (drift-preserving: sums of ROUNDED cells)
        if percent == "row":
            pct_total_row = df.sparkSession.range(1).select(
                F.lit("Total").alias(rows),
                *[F.lit(100.0).alias(v) for v in vals],
            )
            pct_all = pct.unionByName(pct_total_row)
            pct_out = pct_all.withColumn(
                "Total", _skipna_row_sum([F.col(v) for v in vals])
            )
        elif percent == "col":
            pct_total_row = pct.agg(
                *[F.coalesce(F.sum(v), F.lit(0.0)).alias(v) for v in vals]
            ).select(F.lit("Total").alias(rows), *vals)
            pct_out = pct.unionByName(pct_total_row).withColumn(
                "Total", F.lit(100.0)
            )
        else:
            pct_total_row = pct.agg(
                *[F.coalesce(F.sum(v), F.lit(0.0)).alias(v) for v in vals]
            ).select(F.lit("Total").alias(rows), *vals)
            pct_out = pct.unionByName(pct_total_row).withColumn(
                "Total", _skipna_row_sum([F.col(v) for v in vals])
            )
    else:
        counts = piv
        pct_out = pct

    counts = counts.withColumn("__type__", F.lit("count"))
    pct_out = pct_out.withColumn("__type__", F.lit(f"%_{percent}"))
    return counts.unionByName(pct_out)

"""BhtPipeline — the programmatic replacement for the reference's
Streamlit "🚀 Transform Data" flow (app.py:462-615): one cached input
DataFrame + a mapping config in, a dict of lazily-defined aggregate
tables out.

Differences from the reference's execution model, by design:

- Lazy: every output table is a Spark DataFrame; nothing materializes
  until a sink (or the caller) forces it.
- Single-scan aggregates: the reference loops one full-column scan per
  mapped brand column (app.py:398-428); selected_counts collapses each
  family into one conditional aggregate pass.
- The one eager exception: the reference's NPS n==0 short form
  (app.py:455-456) is a data-dependent output *shape*; transform()
  stays lazy (5-row form with NULL nps) and ``nps_short_form`` is the
  explicit eager helper that reproduces the 2-row form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bht_etl_app_spark.config import MappingConfig
from bht_etl_app_spark.operators import (
    brand_dictionary,
    crosstab_table,
    full_tabulation,
    multi_dim_tabulation,
    nps_table,
    safe_value_counts,
    satisfaction_table,
    selected_counts,
)


class BhtPipeline:
    """Transform a wide respondent table into dashboard-ready
    aggregates per a MappingConfig (reference entry point 2, §3 of
    SURVEY.md)."""

    def __init__(self, config: MappingConfig | dict, weight_col: str | None = None):
        self.config = (
            config if isinstance(config, MappingConfig) else MappingConfig.from_dict(config)
        )
        self.weight_col = weight_col

    def transform(self, df: DataFrame, cache: bool = True) -> dict[str, DataFrame]:
        """Build every output table the mapping supports. Mirrors
        app.py:478-531 table naming exactly."""
        cfg = self.config
        if cache:
            df = df.cache()
        out: dict[str, DataFrame] = {}

        # awareness (app.py:385-417)
        if cfg.tom and cfg.tom in df.columns:
            out["awareness_tom"] = safe_value_counts(df, cfg.tom).withColumnRenamed(
                "option", "brand"
            )
        if any(c in df.columns for c in cfg.unaided):
            out["awareness_unaided"] = selected_counts(df, cfg.unaided)
        if any(c in df.columns for c in cfg.aided):
            out["awareness_aided"] = selected_counts(df, cfg.aided)

        # usage funnel (app.py:420-434)
        for cols, name in (
            (cfg.ever_used, "usage_ever_used"),
            (cfg.bumo, "usage_bumo"),
            (cfg.consider, "usage_consider"),
        ):
            if any(c in df.columns for c in cols):
                out[name] = selected_counts(df, cols)

        # satisfaction / NPS (app.py:437-459)
        if cfg.csat and cfg.csat in df.columns:
            out["satisfaction_summary"] = satisfaction_table(df, cfg.csat)
        if cfg.nps and cfg.nps in df.columns:
            out["nps_summary"] = nps_table(df, cfg.nps)

        # brand dictionary (app.py:464-476, 494-503)
        out["brand_dictionary"] = brand_dictionary(
            df,
            cfg.tom,
            {
                "Unaided": cfg.unaided,
                "Aided": cfg.aided,
                "Ever Used": cfg.ever_used,
                "BUMO": cfg.bumo,
                "Consideration": cfg.consider,
            },
        )

        # full tabulation (app.py:519-531)
        out["tabulation"] = full_tabulation(df)
        return out

    def crosstab(self, df: DataFrame, rows: str, cols: str, **kw) -> DataFrame:
        """6B advanced crosstab (app.py:555-561)."""
        return crosstab_table(df, rows, cols, weight_col=self.weight_col, **kw)

    def multi_tabulation(self, df: DataFrame, dims: list[str], **kw) -> DataFrame:
        """6C multi-level tabulation, capped at 3 dims (app.py:570-572)."""
        return multi_dim_tabulation(df, dims[:3], weight_col=self.weight_col, **kw)

    @staticmethod
    def nps_short_form(nps_df: DataFrame) -> DataFrame:
        """Eagerly reproduce the reference's n==0 2-row short form
        (app.py:455-456); pass the output of transform()["nps_summary"]."""
        rows = {r["metric"]: r["value"] for r in nps_df.collect()}
        spark = nps_df.sparkSession
        if rows.get("n") == 0.0:
            return spark.createDataFrame(
                [("nps", None), ("n", 0.0)], "metric string, value double"
            )
        return nps_df

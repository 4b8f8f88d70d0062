from bht_etl_app_spark.operators.aggregates import (
    safe_value_counts,
    freq_table,
    multi_dim_tabulation,
    selected_counts,
    satisfaction_table,
    nps_table,
    full_tabulation,
    brand_dictionary,
)
from bht_etl_app_spark.operators.crosstab import crosstab_table

__all__ = [
    "safe_value_counts",
    "freq_table",
    "multi_dim_tabulation",
    "selected_counts",
    "satisfaction_table",
    "nps_table",
    "full_tabulation",
    "brand_dictionary",
    "crosstab_table",
]

from bht_etl_app_spark.plans import analytics, arrays, tpch, windows

__all__ = ["analytics", "arrays", "tpch", "windows"]

from bht_etl_app_spark.plans import analytics, tpch, windows

__all__ = ["analytics", "tpch", "windows"]

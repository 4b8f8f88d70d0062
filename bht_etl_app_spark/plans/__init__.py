from bht_etl_app_spark.plans import analytics, tpch

__all__ = ["analytics", "tpch"]

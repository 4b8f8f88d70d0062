from bht_etl_app_spark.plans import tpch

__all__ = ["tpch"]

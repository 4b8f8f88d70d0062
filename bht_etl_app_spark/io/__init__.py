from bht_etl_app_spark.io.readers import apply_codebook, read_codebook, read_table
from bht_etl_app_spark.io.sinks import (
    write_excel_bundle,
    write_json_bundle,
    write_parquet_bundle,
)

__all__ = [
    "apply_codebook",
    "read_codebook",
    "read_table",
    "write_excel_bundle",
    "write_json_bundle",
    "write_parquet_bundle",
]

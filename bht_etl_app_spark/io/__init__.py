from bht_etl_app_spark.io.layout import (
    compact,
    read_bucketed,
    shard_manifest,
    write_bucketed,
    write_partitioned,
    write_range_sorted,
)
from bht_etl_app_spark.io.readers import (
    apply_codebook,
    read_binary_files,
    read_codebook,
    read_table,
)
from bht_etl_app_spark.io.sinks import (
    write_excel_bundle,
    write_json_bundle,
    write_parquet_bundle,
    write_table,
    write_training_shards,
)

__all__ = [
    "apply_codebook",
    "read_codebook",
    "read_table",
    "read_binary_files",
    "read_bucketed",
    "compact",
    "shard_manifest",
    "write_bucketed",
    "write_partitioned",
    "write_range_sorted",
    "write_excel_bundle",
    "write_json_bundle",
    "write_parquet_bundle",
    "write_table",
    "write_training_shards",
]

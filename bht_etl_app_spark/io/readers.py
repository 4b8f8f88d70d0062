"""Reader facade: the reference's ingest surface (CSV/XLSX upload,
app.py:74-81) plus the engine-native parquet path, and the codebook
recode (app.py:215-232) as a scalable broadcast join.

CSV/parquet are distributed Spark scans. XLSX has no native Spark
source: the documented path is a driver-side pandas/openpyxl read of
what is by definition a small file (survey exports), then
``createDataFrame`` (Arrow-accelerated). Gated behind a try-import
because this container ships no excel engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CODEBOOK_COLUMNS = {"column", "value", "label"}


def read_table(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Unified ingest (reference read_table, app.py:74-81): dispatch on
    extension, raise on unsupported types. Adds parquet (engine-native)
    to the reference's csv/xlsx surface."""
    name = path.lower()
    fmt = fmt or (
        "csv" if name.endswith(".csv")
        else "excel" if name.endswith((".xlsx", ".xls"))
        else "parquet" if name.endswith(".parquet")
        else None
    )
    if fmt == "csv":
        return (
            spark.read.option("header", True)
            .option("inferSchema", True)
            .csv(path)
        )
    if fmt == "parquet":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)
    if fmt == "excel":
        try:
            import pandas as pd

            pdf = pd.read_excel(path)
        except ImportError as e:
            raise ImportError(
                "XLSX ingest needs an excel engine (pip install openpyxl); "
                "driver-side read is the documented path for small survey "
                "exports"
            ) from e
        return spark.createDataFrame(pdf)
    raise ValueError("Unsupported file type. Please upload CSV or XLSX.")


def read_codebook(spark: SparkSession, path: str) -> DataFrame:
    """Codebook CSV scan with schema validation (app.py:218-220):
    requires columns {column, value, label}."""
    cb = spark.read.option("header", True).csv(path)
    missing = CODEBOOK_COLUMNS - set(cb.columns)
    if missing:
        raise ValueError(
            f"Codebook must have columns: column,value,label (missing {sorted(missing)})"
        )
    return cb.select(
        F.col("column").cast("string"),
        F.col("value").cast("string"),
        F.col("label").cast("string"),
    )


def apply_codebook(df: DataFrame, codebook: DataFrame) -> DataFrame:
    """Recode every matching column per the codebook (app.py:221-227):
    look up the stringified cell, fall back to the original value.

    One broadcast left join per mapped column — the codebook is a
    small dimension by construction, so each join is a broadcast hash
    join with no shuffle of the fact table, at any scale.
    """
    mapped_cols = [
        r["column"] for r in codebook.select("column").distinct().collect()
    ]
    out = df
    for colname in mapped_cols:
        if colname not in df.columns:
            continue
        sub = (
            codebook.where(F.col("column") == colname)
            .select(
                F.col("value").alias(f"__cb_value_{colname}"),
                F.col("label").alias(f"__cb_label_{colname}"),
            )
        )
        out = (
            out.join(
                F.broadcast(sub),
                out[colname].cast("string") == F.col(f"__cb_value_{colname}"),
                "left",
            )
            .withColumn(
                colname,
                F.coalesce(
                    F.col(f"__cb_label_{colname}"), out[colname].cast("string")
                ),
            )
            .drop(f"__cb_value_{colname}", f"__cb_label_{colname}")
        )
    return out

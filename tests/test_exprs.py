"""Unit tests for the expression builders (SURVEY.md §2.2 shims)."""

import pandas as pd
from pyspark.sql import functions as F

from bht_etl_app_spark.functions.exprs import (
    brands_from_binary_columns,
    extract_brand_from_column,
    norm,
    pandas_str,
    sel_predicate,
    non_empty,
    to_double,
    weight_expr,
)


def _col_vals(spark, values, expr_fn, dtype="string"):
    df = spark.createDataFrame([(v,) for v in values], f"x {dtype}")
    return [r[0] for r in df.select(expr_fn(F.col("x")).alias("y")).collect()]


def test_norm(spark):
    assert _col_vals(spark, ["  A B ", None, "", "Xy"], norm) == ["a b", "", "", "xy"]


def test_pandas_str_null_becomes_nan_literal(spark):
    assert _col_vals(spark, ["a", None], pandas_str) == ["a", "nan"]


def test_pandas_str_numeric_formatting(spark):
    # pandas astype(str): 1.0 -> "1.0", 1.5 -> "1.5"; Spark cast matches
    assert _col_vals(spark, [1.0, 1.5, None], pandas_str, "double") == ["1.0", "1.5", "nan"]


def test_sel_predicate_quirks(spark):
    # app.py:401 — "0.0", "no", "False" are selected; the "0" test is on
    # the UN-trimmed string so " 0" is selected too
    vals = ["1", "", None, "0", "0.0", " 0", "yes", "No", "  ", "0 "]
    got = _col_vals(spark, vals, sel_predicate)
    exp = [True, False, False, False, True, True, True, True, False, True]
    assert got == exp


def test_non_empty(spark):
    got = _col_vals(spark, ["a", "", "  ", None, "0"], non_empty)
    assert got == [True, False, False, False, True]


def test_to_double_coerces(spark):
    got = _col_vals(spark, ["1.5", "x", None, " 2 "], to_double)
    assert got == [1.5, None, None, 2.0]


def test_weight_expr(spark):
    df = spark.createDataFrame([("1.5",), ("x",), (None,)], "w string")
    got = [r[0] for r in df.select(weight_expr(df, "w").alias("y")).collect()]
    assert got == [1.5, 0.0, 0.0]
    got1 = [r[0] for r in df.select(weight_expr(df, None).alias("y")).collect()]
    assert got1 == [1.0, 1.0, 1.0]
    # missing column -> constant 1.0 (app.py:101-105)
    got2 = [r[0] for r in df.select(weight_expr(df, "nope").alias("y")).collect()]
    assert got2 == [1.0, 1.0, 1.0]


def test_extract_brand_from_column():
    assert extract_brand_from_column("UA_Indomie") == "Indomie"
    assert extract_brand_from_column("consider-sedaap") == "sedaap"
    assert extract_brand_from_column("UA_Mie_Gelas") == "Mie Gelas"
    assert extract_brand_from_column("aa_") == "aa_"  # empty after strip -> raw
    assert brands_from_binary_columns(["UA_Indomie", "aa_Indomie", "AA-Supermi"]) == [
        "Indomie", "Supermi",
    ]

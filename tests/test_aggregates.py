"""Differential tests: Spark operators vs pandas reference kernels
(tests/pandas_ref.py, semantics per /root/reference/app.py) on the
edge-case survey frame."""

import numpy as np
import pandas as pd
import pytest

from bht_etl_app_spark.operators import (
    freq_table,
    full_tabulation,
    multi_dim_tabulation,
    nps_table,
    safe_value_counts,
    satisfaction_table,
    selected_counts,
)
from tests import pandas_ref as ref
from tests.conftest import assert_frames_equal


def test_safe_value_counts(spark, survey_pdf, survey_sdf):
    exp = ref.safe_value_counts(survey_pdf["gender"])
    got = safe_value_counts(survey_sdf, "gender")
    assert_frames_equal(got, exp)


def test_freq_table_unweighted(spark, survey_pdf, survey_sdf):
    exp = ref.freq_table(survey_pdf, "age_group")
    got = freq_table(survey_sdf, "age_group")
    assert_frames_equal(got, exp)


def test_freq_table_weighted(spark, survey_pdf, survey_sdf):
    exp = ref.freq_table(survey_pdf, "gender", weight_col="weight", decimals=2)
    got = freq_table(survey_sdf, "gender", weight_col="weight", decimals=2)
    assert_frames_equal(got, exp)


def test_multi_dim_total(spark, survey_pdf, survey_sdf):
    exp = ref.multi_dim_tabulation(survey_pdf, ["gender", "age_group"], weight_col="weight")
    got = multi_dim_tabulation(survey_sdf, ["gender", "age_group"], weight_col="weight")
    assert_frames_equal(got, exp)


def test_multi_dim_level_pct(spark, survey_pdf, survey_sdf):
    exp = ref.multi_dim_tabulation(
        survey_pdf, ["gender", "age_group"], weight_col="weight", percent_by="gender"
    )
    got = multi_dim_tabulation(
        survey_sdf, ["gender", "age_group"], weight_col="weight", percent_by="gender"
    )
    assert_frames_equal(got, exp)


def test_selected_counts(spark, survey_pdf, survey_sdf):
    cols = ["UA_Indomie", "UA_Sedaap", "aa_Supermi", "missing_col"]
    exp = ref.selected_counts(survey_pdf, cols)
    got = selected_counts(survey_sdf, cols)
    assert_frames_equal(got, exp)


def test_satisfaction(spark, survey_pdf, survey_sdf):
    exp = ref.satisfaction_table(survey_pdf, "csat")
    got = satisfaction_table(survey_sdf, "csat")
    assert_frames_equal(got, exp, sort_by=["metric"])


def test_satisfaction_all_null(spark):
    pdf = pd.DataFrame({"csat": [None, None, "x"]})
    sdf = spark.createDataFrame(pdf)
    got = satisfaction_table(sdf, "csat").toPandas().set_index("metric")["value"]
    assert np.isnan(got["mean"]) or got["mean"] is None
    assert got["n"] == 0.0


def test_nps(spark, survey_pdf, survey_sdf):
    exp = ref.nps_table(survey_pdf, "nps_score")
    got = nps_table(survey_sdf, "nps_score")
    assert_frames_equal(got, exp, sort_by=["metric"])


def test_full_tabulation(spark, survey_pdf, survey_sdf):
    cols = ["gender", "age_group", "UA_Indomie", "tom_brand"]
    exp = ref.full_tabulation(survey_pdf[cols])
    got = full_tabulation(survey_sdf, cols)
    assert_frames_equal(got, exp)

"""Differential tests for the crosstab operator (A4) — the
round-before-margin drift and the percent-base margin quirks must
match the pandas reference exactly."""

import pytest

from bht_etl_app_spark.operators import crosstab_table
from tests import pandas_ref as ref
from tests.conftest import assert_frames_equal


@pytest.mark.parametrize("percent", ["total", "row", "col"])
def test_crosstab_matches_reference(spark, survey_pdf, survey_sdf, percent):
    exp = ref.crosstab_table(
        survey_pdf, rows="gender", cols="age_group",
        weight_col="weight", percent=percent,
    )
    # pandas pivot column labels are the raw values; normalize to str
    exp.columns = [str(c) for c in exp.columns]
    exp["gender"] = exp["gender"].astype(str)
    got = crosstab_table(
        survey_sdf, rows="gender", cols="age_group",
        weight_col="weight", percent=percent,
    )
    assert_frames_equal(got, exp, sort_by=["__type__", "gender"])


@pytest.mark.parametrize("percent", ["total", "row"])
def test_crosstab_no_totals(spark, survey_pdf, survey_sdf, percent):
    exp = ref.crosstab_table(
        survey_pdf, rows="age_group", cols="gender",
        weight_col=None, percent=percent, include_totals=False,
    )
    exp.columns = [str(c) for c in exp.columns]
    exp["age_group"] = exp["age_group"].astype(str)
    got = crosstab_table(
        survey_sdf, rows="age_group", cols="gender",
        weight_col=None, percent=percent, include_totals=False,
    )
    assert_frames_equal(got, exp, sort_by=["__type__", "age_group"])

"""Tests for text-analysis operators on small literal documents."""

import pandas as pd
import pytest

from bht_etl_app_spark.operators import (
    fingerprint,
    language_id,
    quality_scores,
    token_stats,
)

DOCS = [
    (0, "The quick brown fox, and the lazy dog!"),
    (1, "el perro y el gato de la casa"),
    (2, "yang dan di ini itu"),
    (3, "xyzzy plugh 42"),
    (4, "   "),
    (5, "one"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_stats(docs):
    got = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert got[0]["n_ws_tokens"] == 8
    # bpe-ish: words + punctuation marks: 8 words + ',' + '!'
    assert got[0]["n_bpe_tokens"] == 10
    assert got[4]["n_ws_tokens"] == 0
    assert got[5]["n_ws_tokens"] == 1
    assert got[3]["n_bpe_tokens"] == 3


def test_quality_scores(docs):
    got = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    r0 = got[0]
    assert r0["n_tokens"] == 8
    # stopwords lowercased: the, and, the -> 3/8
    assert r0["stopword_ratio"] == pytest.approx(3 / 8, abs=1e-6)
    # punct: ',' and '!' over 38 chars
    assert r0["punct_ratio"] == pytest.approx(2 / 38, abs=1e-6)
    assert got[4]["n_tokens"] == 0
    assert got[4]["mean_token_len"] is None
    assert got[3]["digit_ratio"] == pytest.approx(2 / len("xyzzy plugh 42"), abs=1e-6)


def test_language_id(docs):
    got = {r["doc_id"]: (r["lang_pred"], r["lang_score"]) for r in language_id(docs).collect()}
    assert got[0][0] == "en"
    assert got[1][0] == "es"
    assert got[2][0] == "id"
    assert got[3] == ("und", 0)
    assert got[4] == ("und", 0)


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "  HELLO\tWORLD "), (4, "different")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in fingerprint(df).collect()}
    assert fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[1]

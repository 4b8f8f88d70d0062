"""Tests for tfidf_top_terms and dedup_clusters on tiny hand-checked
inputs."""

import math

from bht_etl_app_spark.operators.dedup import dedup_clusters
from bht_etl_app_spark.operators.text import tfidf_top_terms


def test_tfidf_scores_and_ranks(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2).collect()
    got = {(r["doc_id"], r["term"]): (r["tfidf"], r["rank"]) for r in out}

    def idf(df):
        return math.log((3 + 1) / (df + 1)) + 1.0

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert got[(1, "apple")][0] == round(2 * idf(1), 6)
    assert got[(1, "apple")][1] == 1
    assert got[(1, "banana")][0] == round(1 * idf(2), 6)
    # doc 3: single term, rank 1, tf=3 df=2
    assert got[(3, "cherry")] == (round(3 * idf(2), 6), 1)
    # k=2 cap respected
    assert all(r["rank"] <= 2 for r in out)


def test_dedup_clusters_components(spark):
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (5, 3)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    # component {1,2,3,5} -> min id 1; component {10,11} -> 10
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 10: 10, 11: 10}


def test_dedup_clusters_long_chain(spark):
    # a 9-hop path exercises multi-round propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {i: 1 for i in range(1, 11)}

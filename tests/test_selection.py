"""Tests for operators/selection.py (DSIR importance resampling and
the hashed linear quality classifier) and clustering.cluster_top_terms.

The differential value check lives in the DuckDB oracle
(``dsir_doc_weights`` / ``dsir_selected`` / ``quality_classifier_scores``
/ ``cluster_top_terms`` in ``__spark_entry__.py``); these pytests pin
the SEMANTIC properties the oracle can't express: the method actually
prefers target-like documents, the classifier actually learns a
separable rule, selection is deterministic, and the hash twins agree
on everything but bucket identity.
"""

import hashlib
import math

from pyspark.sql import functions as F

from bht_etl_app_spark.operators.selection import (
    dsir_doc_weights,
    dsir_select,
    hashed_feature_counts,
    logreg_fit,
    logreg_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _md5_bucket(gram: str, num_buckets: int) -> int:
    u = int(hashlib.md5(gram.encode()).hexdigest()[:16], 16)
    if u >= 1 << 63:
        u -= 1 << 64
    return u % num_buckets


def test_hashed_feature_counts_match_reference_hash(spark):
    docs = _docs(spark, [(1, "alpha beta alpha")])
    got = {
        r["bucket"]: r["cnt"]
        for r in hashed_feature_counts(docs, num_buckets=32).collect()
    }
    # unigrams: alpha x2, beta; bigrams: "alpha beta", "beta alpha"
    exp: dict[int, int] = {}
    for g, c in [
        ("alpha", 2), ("beta", 1), ("alpha beta", 1), ("beta alpha", 1),
    ]:
        b = _md5_bucket(g, 32)
        exp[b] = exp.get(b, 0) + c
    assert got == exp


def test_hashed_features_empty_doc_emits_nothing(spark):
    docs = _docs(spark, [(1, "   "), (2, "one")])
    got = hashed_feature_counts(docs, num_buckets=8).collect()
    assert {r["doc_id"] for r in got} == {2}


def test_dsir_weights_prefer_target_like_docs(spark):
    # two disjoint vocabularies; the target sample is pure A-speak
    a = [(i, "alpha beta gamma alpha") for i in range(10)]
    b = [(i + 100, "delta epsilon zeta delta") for i in range(10)]
    raw = _docs(spark, a + b)
    target = _docs(spark, [(1000, "alpha beta gamma beta alpha")])
    w = {r["doc_id"]: r["logw"] for r in dsir_doc_weights(raw, target).collect()}
    assert min(w[i] for i, _ in a) > max(w[i + 0] for i, _ in b)


def test_dsir_select_is_deterministic_and_biased_to_target(spark):
    a = [(i, "alpha beta gamma") for i in range(20)]
    b = [(i + 100, "delta epsilon zeta") for i in range(20)]
    raw = _docs(spark, a + b)
    target = _docs(spark, [(1000, "alpha beta gamma")])
    s1 = sorted(r["doc_id"] for r in dsir_select(raw, target, k=10).collect())
    s2 = sorted(r["doc_id"] for r in dsir_select(raw, target, k=10).collect())
    assert s1 == s2 and len(s1) == 10
    # Gumbel top-k with a strong log-ratio gap: the A side dominates
    assert sum(1 for i in s1 if i < 100) >= 8
    # a different seed reshuffles the noise but stays deterministic
    s3 = sorted(
        r["doc_id"] for r in dsir_select(raw, target, k=10, seed=7).collect()
    )
    assert s3 == sorted(
        r["doc_id"] for r in dsir_select(raw, target, k=10, seed=7).collect()
    )


def test_logreg_learns_separable_rule(spark):
    rows = [(i, "good fine nice") for i in range(15)] + [
        (i + 50, "bad awful poor") for i in range(15)
    ]
    docs = _docs(spark, rows)
    label = F.array_contains(F.split("text", " "), "good")
    w = logreg_fit(docs, label, num_buckets=32, n_iter=10, lr=0.25)
    scored = {r["doc_id"]: r for r in logreg_score(docs, w, num_buckets=32).collect()}
    pos = [scored[i]["score"] for i in range(15)]
    neg = [scored[i + 50]["score"] for i in range(15)]
    assert min(pos) > max(neg)
    assert all(scored[i]["keep"] for i in range(15))
    assert not any(scored[i + 50]["keep"] for i in range(15))


def test_logreg_featureless_doc_scores_bias(spark):
    docs = _docs(spark, [(1, "good stuff"), (2, "bad stuff"), (3, "  ")])
    label = F.array_contains(F.split("text", " "), "good")
    w = logreg_fit(docs, label, num_buckets=16, n_iter=3, lr=0.2)
    got = {r["doc_id"]: r["score"] for r in logreg_score(docs, w, num_buckets=16).collect()}
    assert got[3] == round(1.0 / (1.0 + math.exp(-w[0])), 6)
    assert set(got) == {1, 2, 3}


def test_feature_hash_twin_same_histogram_mass(spark):
    """xxhash64 production twin: bucket IDs differ from the md5
    family but the histogram mass (per-doc total gram count) must be
    identical — the twin changes hash bits, never featurization."""
    docs = _docs(spark, [(1, "a b c a"), (2, "x y")])
    md5_tot = {
        r["doc_id"]: r["t"]
        for r in hashed_feature_counts(docs, num_buckets=64)
        .groupBy("doc_id").agg(F.sum("cnt").alias("t")).collect()
    }
    xx_tot = {
        r["doc_id"]: r["t"]
        for r in hashed_feature_counts(docs, num_buckets=64, hash_fn="xxhash64")
        .groupBy("doc_id").agg(F.sum("cnt").alias("t")).collect()
    }
    assert md5_tot == xx_tot == {1: 7, 2: 3}


def test_cluster_top_terms_formula_and_ranks(spark):
    from bht_etl_app_spark.operators.clustering import cluster_top_terms

    assign = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "vec_id long, list_id long"
    )
    docs = _docs(
        spark,
        [(1, "apple apple banana"), (2, "apple cherry"), (3, "banana banana")],
    )
    out = cluster_top_terms(assign, docs, top_k=2).collect()
    got = {(r["list_id"], r["term"]): (r["score"], r["rank"]) for r in out}
    # cluster 0: apple tf=3, banana 1, cherry 1; cluster 1: banana 2
    # A = 7 tokens / 2 clusters; f: apple 3, banana 3, cherry 1
    A = 7 / 2

    def s(tf, f):
        return round(tf * math.log(1.0 + A / f), 6)

    assert got[(0, "apple")] == (s(3, 3), 1)
    assert got[(1, "banana")] == (s(2, 3), 1)
    # cluster 0 rank 2: cherry beats banana — f=1 vs 3, higher idf
    assert got[(0, "cherry")] == (s(1, 1), 2)
    assert (0, "banana") not in got
    assert all(r["rank"] <= 2 for r in out)


def test_calibration_bins_hand_computed(spark):
    """calibration_bins on a hand-built scored frame: bin edges
    (clamp at 1.0, floor at edges), exact per-bin stats, and the
    abs_gap arithmetic — all against values computed by hand."""
    from bht_etl_app_spark.operators.selection import calibration_bins

    rows = [
        # (doc_id, score, label) — bins at n_bins=10
        (1, 0.05, 0),   # bin 0
        (2, 0.051, 1),  # bin 0
        (3, 0.55, 1),   # bin 5
        (4, 0.59, 1),   # bin 5
        (5, 1.0, 1),    # clamps into bin 9
        (6, 0.9, 0),    # bin 9 (edge lands exactly)
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, label long")
    got = {
        r["bin"]: (r["n"], r["avg_score"], r["pos_rate"], r["abs_gap"])
        for r in calibration_bins(df, n_bins=10).collect()
    }
    assert set(got) == {0, 5, 9}
    assert got[0] == (2, 0.0505, 0.5, 0.4495)
    assert got[5] == (2, 0.57, 1.0, 0.43)
    assert got[9] == (2, 0.95, 0.5, 0.45)


def test_calibration_bins_matches_oracle_shape(spark):
    """The contract key end-to-end at the small fixture: Spark ==
    DuckDB for the composed fit+score+bin chain (registration
    rehearsal for quality_calibration_bins)."""
    import importlib.util

    import duckdb

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r)
        for r in entry.queries()["quality_calibration_bins"](spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    exp = sorted(
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["quality_calibration_bins"]
        ).fetchall()
    )
    assert got == exp and len(got) > 0

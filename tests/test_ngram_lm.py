"""Interpolated Kneser-Ney trigram LM vs an independent pure-Python
reference (textbook Chen & Goodman interpolated estimator over dict
counts — no Spark). Staged-for-r7 operator: the differential pytest
IS its verification until contract window budget exists (VERDICT r5
items #3/#8)."""

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from bht_etl_app_spark.operators.ngram_lm import (
    BOS,
    doc_trigrams,
    kn_doc_logprob,
    kn_trigram_model,
)

TEXTS = [
    "the cat sat on the mat the cat sat",
    "the dog sat on the log the dog ran",
    "a cat and a dog and a bird",
    "the bird sat on the cat",
    "dogs and cats and birds sing",
    "",  # empty doc: 0 tokens, NULL scores
]


def _py_kn(texts, d=0.75):
    """Reference: trigram counts over BOS-padded docs, interpolated
    KN with all lower orders from trigram-type continuation counts.
    Returns (per-trigram P dict, per-doc (n_tokens, logprob))."""
    c3 = Counter()
    docs_grams = []
    for t in texts:
        toks = [x for x in t.lower().split() if x]
        grams = []
        padded = [BOS, BOS] + toks if toks else []
        for i in range(2, len(padded)):
            g = (padded[i - 2], padded[i - 1], padded[i])
            grams.append(g)
            c3[g] += 1
        docs_grams.append(grams)
    c2 = Counter()
    n1p_uv_ = Counter()
    n1p__vw = Counter()
    for (u, v, w), c in c3.items():
        c2[(u, v)] += c
        n1p_uv_[(u, v)] += 1
        n1p__vw[(v, w)] += 1
    n1p__v_ = Counter()
    n1p_v_ = Counter()
    n1p__w = Counter()
    for (v, w), c in n1p__vw.items():
        n1p__v_[v] += c
        n1p_v_[v] += 1
        n1p__w[w] += 1
    n1p___ = sum(n1p__vw.values())

    def p1(w):
        return n1p__w[w] / n1p___

    def p2(v, w):
        return (
            max(n1p__vw[(v, w)] - d, 0.0) / n1p__v_[v]
            + d * n1p_v_[v] / n1p__v_[v] * p1(w)
        )

    def p3(u, v, w):
        return (
            max(c3[(u, v, w)] - d, 0.0) / c2[(u, v)]
            + d * n1p_uv_[(u, v)] / c2[(u, v)] * p2(v, w)
        )

    probs = {g: p3(*g) for g in c3}
    per_doc = []
    for grams in docs_grams:
        lp = 0.0
        for g in grams:  # position order — matches the Spark fold
            lp += math.log(probs[g])
        per_doc.append((len(grams), lp if grams else None))
    return probs, per_doc


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_trigram_rows_match_reference(docs):
    got = sorted(
        (r["doc_id"], r["pos"], r["u"], r["v"], r["w"])
        for r in doc_trigrams(docs).collect()
    )
    exp = []
    for i, t in enumerate(TEXTS):
        toks = [x for x in t.lower().split() if x]
        padded = [BOS, BOS] + toks if toks else []
        for j in range(2, len(padded)):
            exp.append((i, j - 1, padded[j - 2], padded[j - 1], padded[j]))
    assert got == sorted(exp)


def test_model_probabilities_match_reference(docs):
    probs, _ = _py_kn(TEXTS)
    got = {
        (r["u"], r["v"], r["w"]): r["p"]
        for r in kn_trigram_model(docs).collect()
    }
    assert set(got) == set(probs)
    for g in probs:
        assert got[g] == pytest.approx(probs[g], abs=1e-12), g
    # every conditional distribution sums to ~1 over attested +
    # backoff mass; at minimum each p is a valid probability
    assert all(0.0 < p <= 1.0 for p in got.values())


def test_doc_logprob_matches_reference_and_handles_empty(docs):
    _, per_doc = _py_kn(TEXTS)
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob"], r["avg_logprob"])
        for r in kn_doc_logprob(docs).collect()
    }
    assert set(got) == set(range(len(TEXTS)))
    for i, (n, lp) in enumerate(per_doc):
        gn, glp, gavg = got[i]
        assert gn == n
        if lp is None:
            assert glp is None and gavg is None
        else:
            assert glp == pytest.approx(lp, abs=1e-9)
            assert gavg == pytest.approx(lp / n, abs=1e-9)


def test_control_byte_tokens_are_dropped(spark):
    df = spark.createDataFrame(
        [(0, f"good {BOS} also\x02bad fine")], "doc_id long, text string"
    )
    rows = doc_trigrams(df).collect()
    toks = {r["w"] for r in rows}
    assert toks == {"good", "fine"}


def test_training_pass_reads_corpus_once(docs):
    """Scale pin: the trigram count table is persisted (it has four
    consumers), so the corpus source appears AT MOST once in the
    optimized plan — every lower-order KN quantity derives from the
    cached count table, never from a re-read of the corpus."""
    model = kn_trigram_model(docs)
    plan = model._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") <= 1
    assert "InMemoryRelation" in plan
    from bht_etl_app_spark.functions.lifecycle import release

    model.count()
    release(model)  # unpersists the tracked c3 cache

"""Interpolated Kneser-Ney trigram LM vs an independent pure-Python
reference (textbook Chen & Goodman interpolated estimator with the
full backoff cascade — no Spark). Staged-for-r7 operator: the
differential pytest IS its verification until contract window
budget exists (VERDICT r5 items #3/#8)."""

import math
from collections import Counter

import pytest

from bht_etl_app_spark.operators.ngram_lm import (
    BOS,
    corpus_trigrams,
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

HELD_OUT = [
    "the cat ran",                      # seen words, some unseen grams
    "a zebra sat on the mat",           # zebra is OOV
    "zebra quagga okapi",               # fully OOV
    "the cat sat on the mat",           # fully attested
    "",
]


class _PyKN:
    """Reference implementation with the same backoff cascade."""

    def __init__(self, texts, d=0.75):
        self.d = d
        c3 = Counter()
        for t in texts:
            for g in self._grams(t):
                c3[g[1:]] += 1
        self.c3 = c3
        self.c2, self.n1p_uv_ = Counter(), Counter()
        self.n1p__vw = Counter()
        for (u, v, w), c in c3.items():
            self.c2[(u, v)] += c
            self.n1p_uv_[(u, v)] += 1
            self.n1p__vw[(v, w)] += 1
        self.n1p__v_, self.n1p_v_, self.n1p__w = Counter(), Counter(), Counter()
        for (v, w), c in self.n1p__vw.items():
            self.n1p__v_[v] += c
            self.n1p_v_[v] += 1
            self.n1p__w[w] += 1
        self.n1p___ = sum(self.n1p__vw.values())

    @staticmethod
    def _grams(text):
        toks = [
            x for x in text.lower().split()
            if x and "\x02" not in x and "\x03" not in x
        ]
        padded = [BOS, BOS] + toks if toks else []
        return [
            (i - 1, padded[i - 2], padded[i - 1], padded[i])
            for i in range(2, len(padded))
        ]

    def p1(self, w):
        if w in self.n1p__w:
            return self.n1p__w[w] / self.n1p___
        return self.d / self.n1p___  # OOV floor

    def p2(self, v, w):
        if (v, w) in self.n1p__vw:
            return (
                max(self.n1p__vw[(v, w)] - self.d, 0.0) / self.n1p__v_[v]
                + self.d * self.n1p_v_[v] / self.n1p__v_[v] * self.p1(w)
            )
        if v in self.n1p__v_:
            return self.d * self.n1p_v_[v] / self.n1p__v_[v] * self.p1(w)
        return self.p1(w)

    def p3(self, u, v, w):
        if (u, v, w) in self.c3:
            return (
                max(self.c3[(u, v, w)] - self.d, 0.0) / self.c2[(u, v)]
                + self.d * self.n1p_uv_[(u, v)] / self.c2[(u, v)] * self.p2(v, w)
            )
        if (u, v) in self.c2:
            return self.d * self.n1p_uv_[(u, v)] / self.c2[(u, v)] * self.p2(v, w)
        return self.p2(v, w)

    def doc_score(self, text):
        grams = self._grams(text)
        if not grams:
            return 0, None
        lp = 0.0
        for _, u, v, w in grams:  # position order — matches the fold
            lp += math.log(self.p3(u, v, w))
        return len(grams), lp


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
    exp = sorted(
        (i, pos, u, v, w)
        for i, t in enumerate(TEXTS)
        for pos, u, v, w in _PyKN._grams(t)
    )
    assert got == exp


def test_model_probabilities_match_reference(docs):
    ref = _PyKN(TEXTS)
    got = {
        (r["u"], r["v"], r["w"]): r["p"]
        for r in kn_trigram_model(docs).collect()
    }
    assert set(got) == set(ref.c3)
    for (u, v, w), p in got.items():
        assert p == pytest.approx(ref.p3(u, v, w), abs=1e-12), (u, v, w)
    assert all(0.0 < p <= 1.0 for p in got.values())


def test_self_scoring_matches_reference_and_handles_empty(docs):
    ref = _PyKN(TEXTS)
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob"], r["avg_logprob"])
        for r in kn_doc_logprob(docs).collect()
    }
    assert set(got) == set(range(len(TEXTS)))
    for i, t in enumerate(TEXTS):
        n, lp = ref.doc_score(t)
        gn, glp, gavg = got[i]
        assert gn == n
        if lp is None:
            assert glp is None and gavg is None
        else:
            assert glp == pytest.approx(lp, abs=1e-9)
            assert gavg == pytest.approx(lp / n, abs=1e-9)


def test_held_out_scoring_with_oov_matches_reference(spark, docs):
    """The CCNet mode: train on TEXTS, score HELD_OUT. Every token is
    scored — unseen trigrams route through lam3*P(w|v), unseen
    bigrams through lam2*P(w), OOV words through the D/N1p(..)
    floor — and n_tokens equals the doc's full token count."""
    held = spark.createDataFrame(
        [(i, t) for i, t in enumerate(HELD_OUT)], "doc_id long, text string"
    )
    ref = _PyKN(TEXTS)
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob"])
        for r in kn_doc_logprob(held, train_df=docs).collect()
    }
    for i, t in enumerate(HELD_OUT):
        n, lp = ref.doc_score(t)
        gn, glp = got[i]
        assert gn == n == len([x for x in t.split() if x])
        if lp is None:
            assert glp is None
        else:
            assert glp == pytest.approx(lp, abs=1e-9), t
    # sanity: the fully-attested doc outscores the fully-OOV one
    assert got[3][1] / got[3][0] > got[2][1] / got[2][0]


def test_training_needs_no_id_column(spark):
    """The model trains on any schema with a text column — document
    identity is never used (corpus_trigrams drops it)."""
    df = spark.createDataFrame(
        [("a b c a b",), ("b c a",)], "text string"
    )
    rows = kn_trigram_model(df).collect()
    assert len(rows) > 0
    assert corpus_trigrams(df).columns == ["u", "v", "w"]


def test_control_byte_tokens_are_dropped(spark):
    df = spark.createDataFrame(
        [(0, f"good {BOS} also\x02bad fine")], "doc_id long, text string"
    )
    rows = doc_trigrams(df).collect()
    assert {r["w"] for r in rows} == {"good", "fine"}


def _n_persistent(spark) -> int:
    # the repo-standard counter (tests/test_lifecycle.py): the
    # driver-side registry, updated synchronously on unpersist
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_training_pass_reads_corpus_once_and_release_frees_caches(docs, spark):
    """Scale pin: the trigram count table and its (v,w) rollup are
    persisted (multiple consumers each), so the corpus source appears
    at most once in the optimized plan; release() on a result frees
    the tracked caches through the carry chain (the rename in
    kn_trigram_model derives a new frame, so without carry the
    finalizer would fire on the temporary and unpersist mid-use)."""
    import gc

    from bht_etl_app_spark.functions.lifecycle import release

    gc.collect()  # settle earlier tests' tracked frames
    before = _n_persistent(spark)
    model = kn_trigram_model(docs)
    plan = model._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") <= 1
    assert "InMemoryRelation" in plan
    gc.collect()  # would fire the finalizer if carry were missing
    model.count()
    # registry fills at materialization: c3 + nvw
    assert _n_persistent(spark) == before + 2
    release(model)
    assert _n_persistent(spark) == before  # carry chain freed them

    # the scoring result owns its model's caches the same way
    out = kn_doc_logprob(docs)
    assert getattr(out, "_bht_keepalive", None)
    out.count()
    release(out)
    assert _n_persistent(spark) == before


def test_every_model_table_keeps_the_caches_alive(docs, spark):
    """Dropping the dict's p3 entry must NOT unpersist caches the
    other tables' plans still read — each returned table carries the
    tracked handle."""
    import gc

    from bht_etl_app_spark.functions.lifecycle import release

    from bht_etl_app_spark.operators.ngram_lm import kn_model_tables

    gc.collect()
    before = _n_persistent(spark)
    t = kn_model_tables(docs)
    p2 = t["p2"]
    del t
    gc.collect()  # would fire the finalizer if the carry were missing
    assert p2.count() > 0  # materializes via the still-live caches
    assert _n_persistent(spark) == before + 2  # still alive via p2
    release(p2)
    assert _n_persistent(spark) == before


def test_self_scoring_plan_skips_backoff_joins(spark, docs):
    """Self-scoring joins the p3 table only — the four backoff LEFT
    joins never enter the plan (the docstring's 'pure table lookup';
    lam/continuation names still appear inside p3's own training
    lineage, so the discriminator is the join type)."""
    plan = (
        kn_doc_logprob(docs)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    held_plan = (
        kn_doc_logprob(
            spark.createDataFrame([(0, "x")], "doc_id long, text string"),
            train_df=docs,
        )
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the only LeftOuter in self-scoring is the final all_docs join
    assert plan.count("LeftOuter") == 1
    assert held_plan.count("LeftOuter") == 1 + 5  # + the backoff cascade


def test_prebuilt_model_tables_score_identically(spark, docs):
    """Train-once/score-many: passing kn_model_tables output scores
    bit-identically to the train_df form (training cost paid once)."""
    from bht_etl_app_spark.operators.ngram_lm import kn_model_tables

    held = spark.createDataFrame(
        [(i, t) for i, t in enumerate(HELD_OUT)], "doc_id long, text string"
    )
    t = kn_model_tables(docs)
    a = sorted(map(tuple, kn_doc_logprob(held, model_tables=t).collect()))
    b = sorted(map(tuple, kn_doc_logprob(held, train_df=docs).collect()))
    assert a == b


def test_degenerate_inputs_fail_loudly(spark, docs):
    """d outside (0,1) raises at train time; a model trained on an
    empty corpus raises at scoring time instead of emitting all-NULL
    scores a perplexity threshold would silently mis-handle."""
    with pytest.raises(ValueError, match="discount"):
        kn_trigram_model(docs, d=0.0)
    with pytest.raises(ValueError, match="discount"):
        kn_trigram_model(docs, d=1.0)

    empty = spark.createDataFrame([], "doc_id long, text string")
    held = spark.createDataFrame([(0, "zebra ran")], "doc_id long, text string")
    from pyspark.errors import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="empty corpus"):
        kn_doc_logprob(held, train_df=empty).collect()


def test_model_tables_guards(spark, docs):
    """ADVICE r6: an empty model_tables dict must raise, not silently
    retrain on the scored df; a d conflicting with the discount the
    tables were trained with must raise, not silently mix discounts
    in the OOV floor; omitting d adopts the stashed training value."""
    from bht_etl_app_spark.functions.lifecycle import release
    from bht_etl_app_spark.operators.ngram_lm import kn_model_tables

    held = spark.createDataFrame(
        [(0, "alpha beta zebra")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="missing"):
        kn_doc_logprob(held, model_tables={})

    t = kn_model_tables(docs, d=0.6)
    assert t["d"] == 0.6
    with pytest.raises(ValueError, match="trained with d=0.6"):
        kn_doc_logprob(held, model_tables=t, d=0.75)
    # omitted d adopts the training discount: identical to train_df mode
    a = sorted(map(tuple, kn_doc_logprob(held, model_tables=t).collect()))
    b = sorted(map(tuple, kn_doc_logprob(held, train_df=docs, d=0.6).collect()))
    assert a == b
    release(t["p3"])


def test_moore_lewis_matches_two_reference_models(spark, docs):
    """Moore-Lewis contrast (STAGED r8): ce_in/ce_out/ml_score equal
    the two pure-Python KN references' held-out cross-entropies and
    their difference; unscorable docs carry NULL scores."""
    from bht_etl_app_spark.operators.ngram_lm import moore_lewis_scores

    out_texts = [
        "engines pipelines shuffle partitions broadcast join exchange",
        "the engine runs the pipeline and the shuffle runs the join",
        "partitions and exchanges and broadcasts",
    ]
    cand_texts = [
        "the cat sat on the mat",          # in-domain-ish
        "the engine runs the shuffle",     # out-domain-ish
        "zebra quagga okapi",              # OOV to both
        "",                                # unscorable
    ]
    out_ref = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(out_texts)],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(200 + i, t) for i, t in enumerate(cand_texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["ce_in"], r["ce_out"], r["ml_score"])
        for r in moore_lewis_scores(cand, docs, out_ref).collect()
    }
    ref_in, ref_out = _PyKN(TEXTS), _PyKN(out_texts)
    assert set(got) == {200, 201, 202, 203}
    for i, t in enumerate(cand_texts):
        n_in, lp_in = ref_in.doc_score(t)
        n_out, lp_out = ref_out.doc_score(t)
        gn, g_ci, g_co, g_ml = got[200 + i]
        assert gn == n_in == n_out
        if lp_in is None:
            assert g_ci is None and g_co is None and g_ml is None
            continue
        assert g_ci == pytest.approx(-lp_in / n_in, abs=1e-9)
        assert g_co == pytest.approx(-lp_out / n_out, abs=1e-9)
        assert g_ml == pytest.approx((-lp_in / n_in) - (-lp_out / n_out), abs=1e-9)
    # the contrast ranks the in-domain candidate below the out-domain
    # one (the selection property the operator exists for)
    assert got[200][3] < got[201][3]


def test_moore_lewis_oracle_matches_spark_on_fixture(spark):
    """STAGED r8 registration rehearsal: the two-model-chain DuckDB
    oracle (prefix-parameterized shared KN fragments) matches Spark
    bit for bit on the sf0.001 documents fixture, the same comparison
    the driver gate performs."""
    from bht_etl_app_spark.operators.ngram_lm import (
        moore_lewis_oracle_sql,
        moore_lewis_scores,
    )
    from bht_etl_app_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    got = moore_lewis_scores(
        docs.where("source NOT IN ('src0', 'src1')"),
        docs.where("source = 'src0'"),
        docs.where("source = 'src1'"),
        final_round=6,
    )

    from tests.conftest import duckdb_oracle_rows, norm_oracle_rows as norm

    ocols, orows = duckdb_oracle_rows(moore_lewis_oracle_sql(), sf)
    srows = [tuple(r) for r in got.collect()]
    assert sorted(got.columns) == sorted(ocols)
    assert len(srows) == len(orows) > 0
    a, b = norm(srows, got.columns), norm(orows, ocols)
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diffs, diffs[:3]


def test_moore_lewis_duplicate_ids_no_fanout(spark, docs):
    """Regression (r7 review): duplicate doc_ids must yield duplicate
    IDENTICAL rows (one per input row — the oracle's LEFT-join spine
    shape), never an inner-join n^2 fan-out; and the shared trigram
    frame means both chains see the same tokenization."""
    from bht_etl_app_spark.operators.ngram_lm import moore_lewis_scores

    out_ref = spark.createDataFrame(
        [(100, "engines pipelines shuffle partitions broadcast join")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(7, "the cat sat on the mat"), (7, "the cat sat on the mat"),
         (8, "")],
        "doc_id long, text string",
    )
    rows = moore_lewis_scores(cand, docs, out_ref).collect()
    assert len(rows) == 3  # one per INPUT row, not 4+1
    dup = [tuple(r) for r in rows if r["doc_id"] == 7]
    assert len(dup) == 2 and dup[0] == dup[1]
    # duplicate rows aggregate as one doc: n_tokens counts BOTH
    # copies' tokens (both engines group trigrams by id), scores
    # stay finite
    assert dup[0][1] == 12 and dup[0][2] is not None
    empty = [r for r in rows if r["doc_id"] == 8][0]
    assert empty["n_tokens"] == 0 and empty["ml_score"] is None


def test_kn_oracle_sql_hash_matches_spark_on_fixture(spark):
    """The r7 registration rehearsal: the DuckDB oracle replay of the
    self-scoring contract form (final_round=6 on the two per-doc
    scalars) matches
    Spark BIT FOR BIT on the real sf0.001 documents fixture — the
    same exact-value comparison the driver's gate performs (floats by
    repr, order-insensitive)."""
    from bht_etl_app_spark.operators.ngram_lm import kn_oracle_sql
    from bht_etl_app_spark.session import load_table
    from tests.conftest import duckdb_oracle_rows, norm_oracle_rows as norm

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    got = kn_doc_logprob(docs, final_round=6)

    ocols, orows = duckdb_oracle_rows(kn_oracle_sql(), sf)
    srows = [tuple(r) for r in got.collect()]
    assert sorted(got.columns) == sorted(ocols)
    assert len(srows) == len(orows) > 0
    a, b = norm(srows, got.columns), norm(orows, ocols)
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diffs, diffs[:3]


def test_kn_heldout_oracle_matches_reference_on_random_corpora():
    """Property sweep WITHOUT Spark in the loop (fast): the held-out
    DuckDB oracle replays the full backoff cascade + OOV floor to
    within the 6dp contract quantum of the pure-Python Chen-Goodman
    reference on random tiny-vocabulary corpora (heavy gram sharing,
    unseen contexts, fully-OOV docs). Spark==DuckDB is pinned on the
    fixtures, so this transitively hardens the Spark cascade too."""
    import duckdb
    from hypothesis import assume, given, settings, strategies as st

    from bht_etl_app_spark.operators.ngram_lm import kn_heldout_oracle_sql

    word = st.sampled_from(["w0", "w1", "w2", "oov1"])
    doc = st.lists(word, min_size=0, max_size=10).map(" ".join)

    @given(st.lists(doc, min_size=2, max_size=8))
    @settings(max_examples=40, deadline=None)
    def check(texts):
        train = [(i, t) for i, t in enumerate(texts) if i % 2 == 0]
        score = [(i, t) for i, t in enumerate(texts) if i % 2 == 1]
        # the empty-training-corpus structural failure is pinned by
        # test_degenerate_inputs_fail_loudly — skip it here
        assume(any(t.split() for _, t in train))
        assume(score)
        con = duckdb.connect()
        vals = ", ".join(f"({i}, '{t}')" for i, t in train + score)
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"(VALUES {vals}) t(doc_id, text)"
        )
        got = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(
                kn_heldout_oracle_sql(
                    train_pred="doc_id % 2 = 0",
                    score_pred="doc_id % 2 = 1",
                )
            ).fetchall()
        }
        ref = _PyKN([t for _, t in train])
        assert set(got) == {i for i, _ in score}
        for i, t in score:
            n, lp = ref.doc_score(t)
            gn, glp, gavg = got[i]
            assert gn == n, (i, texts)
            if lp is None:
                assert glp is None and gavg is None
            else:
                # 6dp contract rounding both sides; allow one quantum
                # of slack for values landing at a rounding boundary
                assert glp == pytest.approx(lp, abs=2e-6), (i, texts)
                assert gavg == pytest.approx(lp / n, abs=2e-6), (i, texts)

    check()


def test_kn_heldout_oracle_sql_hash_matches_spark_on_fixture(spark):
    """Held-out r7 carrier rehearsal: train on source<>'src0', score
    source='src0' — the full backoff cascade (unseen trigrams,
    bigrams, OOV words) replayed in DuckDB matches Spark exactly
    (floats by repr) on the sf0.001 documents fixture."""
    import duckdb

    from pyspark.sql import functions as F

    from bht_etl_app_spark.operators.ngram_lm import kn_heldout_oracle_sql
    from bht_etl_app_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    got = kn_doc_logprob(
        docs.where(F.col("source") == "src0"),
        train_df=docs.where(F.col("source") != "src0"),
        final_round=6,
    )
    srows = sorted(
        (
            r["doc_id"], r["n_tokens"],
            repr(r["logprob"]) if r["logprob"] is not None else None,
            repr(r["avg_logprob"]) if r["avg_logprob"] is not None else None,
        )
        for r in got.collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    orows = sorted(
        (
            r[0], r[1],
            repr(float(r[2])) if r[2] is not None else None,
            repr(float(r[3])) if r[3] is not None else None,
        )
        for r in con.execute(kn_heldout_oracle_sql()).fetchall()
    )
    assert len(srows) == len(orows) > 0
    diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not diffs, diffs[:3]


def test_kn_ppl_buckets_tercile_arithmetic_and_unscored(spark):
    """Integer-rank terciles: with 7 scored docs in one domain the
    split is head=2 / middle=2 / tail=3 (rank*3 <= n rule), bucket
    boundaries are the min/max of each bucket's avg_logprob under
    the (score desc, id) rank, and the empty doc lands in the
    explicit unscored bucket with NULL boundaries."""
    from pyspark.sql import functions as F

    from bht_etl_app_spark.operators.ngram_lm import (
        kn_doc_logprob,
        kn_ppl_buckets,
    )

    ref_text = (
        "the quick brown fox jumps over the lazy dog and runs far "
        "away into the green hills with great speed"
    )
    rows = [(i, f"doc {i} " + ref_text[: 20 + 7 * i]) for i in range(7)]
    rows.append((7, ""))  # unscored
    score = spark.createDataFrame(rows, "doc_id long, text string")
    score = score.withColumn("source", F.lit("crawl"))
    ref = spark.createDataFrame([(100, ref_text)], "doc_id long, text string")
    got = {
        (r["domain"], r["bucket"]): (
            r["n_docs"], r["min_avg_logprob"], r["max_avg_logprob"]
        )
        for r in kn_ppl_buckets(score, ref).collect()
    }
    assert got[("crawl", "head")][0] == 2
    assert got[("crawl", "middle")][0] == 2
    assert got[("crawl", "tail")][0] == 3
    assert got[("crawl", "unscored")] == (1, None, None)
    # replay the rank from the scoring operator directly
    sc = {
        r["doc_id"]: r["avg_logprob"]
        for r in kn_doc_logprob(score, train_df=ref, final_round=6).collect()
    }
    ranked = sorted(
        (i for i in sc if sc[i] is not None),
        key=lambda i: (-sc[i], i),
    )
    head = [sc[i] for i in ranked[:2]]
    tail = [sc[i] for i in ranked[4:]]
    assert got[("crawl", "head")][1] == min(head)
    assert got[("crawl", "head")][2] == max(head)
    assert got[("crawl", "tail")][1] == min(tail)
    assert got[("crawl", "tail")][2] == max(tail)

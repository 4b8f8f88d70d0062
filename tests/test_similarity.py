"""Tests for similarity search: exact knn, knn join, LSH bucketing."""

import math

import pytest
from pyspark.sql import functions as F

from bht_etl_app_spark.operators import (
    ann_lsh_topk,
    knn_for_query,
    knn_join,
    random_hyperplane_lsh,
)

VECS = [
    (0, [1.0, 0.0]),
    (1, [0.9, 0.1]),
    (2, [0.0, 1.0]),
    (3, [-1.0, 0.0]),
    (4, [0.7, 0.7]),
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_knn_for_query_exact(emb):
    got = knn_for_query(emb, [1.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in got] == [0, 1, 4]
    assert got[0]["cosine"] == 1.0
    assert got[1]["cosine"] == pytest.approx(_cos([1, 0], [0.9, 0.1]), abs=1e-6)


def test_knn_join_per_query_topk(spark, emb):
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0]), (200, [0.0, 1.0])],
        "q_id long, embedding array<float>",
    )
    got = knn_join(queries, emb, k=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"]))
    assert sorted(by_q[100]) == [(1, 0), (2, 1)]
    assert sorted(by_q[200])[0] == (1, 2)
    assert len(by_q[100]) == 2


def test_lsh_buckets_separate_opposites(emb):
    planes = [[1.0, 0.0], [0.0, 1.0]]
    got = {r["vec_id"]: r["bucket"] for r in random_hyperplane_lsh(emb, planes).collect()}
    # v0=[1,0]: bit0 (x>0) set, bit1 (y>0) unset -> bucket 1
    assert got[0] == 1
    assert got[2] == 2  # y>0 only
    assert got[3] == 0  # both non-positive
    assert got[4] == 3  # both positive


def test_ann_lsh_topk_contains_true_neighbors(emb):
    planes = [[1.0, 0.0], [0.0, 1.0]]
    got = [r["vec_id"] for r in ann_lsh_topk(emb, [1.0, 0.0], planes, k=3).collect()]
    # exact top-3 is [0, 1, 4]; multiprobe over 1-bit flips must find them
    assert got[0] == 0
    assert set(got) <= {0, 1, 4}


def test_ivf_assign_and_full_probe_equals_exact(spark, emb):
    from bht_etl_app_spark.operators.similarity import ann_ivf_topk, ivf_assign

    centroids = [[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]]
    got = {r["vec_id"]: r["list_id"] for r in ivf_assign(emb, centroids).collect()}
    assert got[0] == 0   # [1,0] -> centroid 0
    assert got[2] == 1   # [0,1]-ish -> centroid 1
    # probing ALL lists degenerates to exact search
    exact = [r["vec_id"] for r in knn_for_query(emb, [1.0, 0.0], k=3).collect()]
    full = [
        r["vec_id"]
        for r in ann_ivf_topk(emb, [1.0, 0.0], centroids, k=3, nprobe=3).collect()
    ]
    assert full == exact
    # probing 1 list returns only vectors from the query's own list
    one = {
        r["vec_id"]
        for r in ann_ivf_topk(emb, [1.0, 0.0], centroids, k=5, nprobe=1).collect()
    }
    assert one <= {v for v, lid in got.items() if lid == 0}


def test_ann_lsh_multiprobe_distance_two_reaches_bucket(spark):
    """multiprobe_bits=2 must probe ALL buckets within hamming
    distance 2 (ADVICE r1: only distance-1 probes were generated)."""
    # axis-aligned planes in 4d -> bucket bits are coordinate signs
    planes = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0]]
    q = [1.0, 1.0, 1.0, 1.0]            # bucket 1111
    emb2 = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 1.0]),      # same bucket
         (1, [-1.0, 1.0, 1.0, 1.0]),     # hamming 1
         (2, [-1.0, -1.0, 1.0, 1.0])],   # hamming 2
        "vec_id long, embedding array<float>",
    )
    got1 = {r["vec_id"] for r in ann_lsh_topk(emb2, q, planes, k=5, multiprobe_bits=1).collect()}
    got2 = {r["vec_id"] for r in ann_lsh_topk(emb2, q, planes, k=5, multiprobe_bits=2).collect()}
    assert got1 == {0, 1}
    assert got2 == {0, 1, 2}


def test_ann_knn_join_subset_of_exact_with_rank_contract(spark, emb):
    from bht_etl_app_spark.operators.similarity import ann_knn_join, lsh_planes

    q = emb.select(F.col("vec_id").alias("q_id"), "embedding").where("q_id <= 1")
    exact = {(r["q_id"], r["vec_id"]) for r in knn_join(q, emb, k=5).collect()}
    planes = lsh_planes(4, 2, seed=42)
    got = ann_knn_join(q, emb, planes, k=5, multiprobe_bits=1).collect()
    assert {(r["q_id"], r["vec_id"]) for r in got} <= exact
    # rank is dense 1..n per query and every query keeps itself (cos=1)
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(r)
    for qid, rows in by_q.items():
        assert sorted(x["rank"] for x in rows) == list(range(1, len(rows) + 1))
        assert any(x["vec_id"] == qid for x in rows)


def test_arrow_knn_matches_jvm_fold(spark):
    """The Arrow/numpy scale kernel must agree with the JVM fold
    within float tolerance on the same data (pairwise vs sequential
    summation differ only in the last ULPs)."""
    from bht_etl_app_spark.operators.similarity import (
        knn_for_query,
        knn_for_query_arrow,
    )
    from bht_etl_app_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    jvm = {r["vec_id"]: r["cosine"] for r in knn_for_query(emb, qv, k=10).collect()}
    arrow = {r["vec_id"]: r["cosine"] for r in knn_for_query_arrow(emb, qv, k=10).collect()}
    assert set(jvm) == set(arrow)
    for vid in jvm:
        assert abs(jvm[vid] - arrow[vid]) <= 1e-6


def test_quantize_embeddings_reconstruction_and_topk(spark):
    """int8 quantization: codes stay in [-127, 127], reconstruction
    error per component is bounded by scale/2, and dequantized kNN
    agrees with float kNN on the fixture (quantization noise ~1e-4
    cosine at 64 dims is far below the neighbor gaps)."""
    from bht_etl_app_spark.operators.similarity import (
        knn_for_query,
        knn_for_query_quantized,
        quantize_embeddings,
    )
    from bht_etl_app_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    raw = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    qz = {r["vec_id"]: (list(r["qvec"]), float(r["scale"]))
          for r in quantize_embeddings(emb).collect()}
    assert set(raw) == set(qz)
    for vid, (codes, scale) in qz.items():
        assert all(-127 <= c <= 127 for c in codes), vid
        err = max(abs(c * scale - v) for c, v in zip(codes, raw[vid]))
        assert err <= scale / 2 + 1e-12, (vid, err, scale)

    qv = raw[0]
    exact = [r["vec_id"] for r in knn_for_query(emb, qv, k=5).collect()]
    quant = [r["vec_id"] for r in knn_for_query_quantized(emb, qv, k=5).collect()]
    assert exact == quant


def test_knn_label_vote_majority_and_ties(spark):
    """Planted geometry: three tight label clusters; a query inside a
    cluster must take that cluster's label; vote ties break to the
    smallest label; self is excluded."""
    from bht_etl_app_spark.operators.similarity import knn_label_vote

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 6

    corpus = spark.createDataFrame(
        [(0, vec(10, 0), 1), (1, vec(10, 0.2), 1), (2, vec(10, -0.2), 1),
         (3, vec(0, 10), 2), (4, vec(0.2, 10), 2),
         (5, vec(-10, -10), 3)],
        "vec_id long, embedding array<double>, label int",
    )
    # query ids are DISJOINT from corpus ids: exclude_self only
    # removes a matching id (a query that IS a corpus row), never a
    # genuine neighbor
    q = spark.createDataFrame(
        [(100, vec(10, 0.1)),   # inside cluster 1
         (101, vec(0.1, 10))],  # near cluster 2
        "q_id long, embedding array<double>",
    )
    got = {r["q_id"]: (r["predicted_label"], r["votes"])
           for r in knn_label_vote(q, corpus, k=3).collect()}
    assert got[100] == (1, 3)
    # q=101: 3 nearest are the two label-2 vectors + one label-1 -> 2 votes
    assert got[101] == (2, 2)

    # self-exclusion: a query that IS corpus row 0 must not vote for
    # itself — its k=3 neighborhood is the remaining cluster-1 pair
    # plus one outsider
    q_self = spark.createDataFrame(
        [(0, vec(10, 0))], "q_id long, embedding array<double>"
    )
    got_self = {r["q_id"]: (r["predicted_label"], r["votes"])
                for r in knn_label_vote(q_self, corpus, k=3).collect()}
    assert got_self[0] == (1, 2)


# -- product quantization (operators/pq.py, r5) --------------------------


@pytest.fixture(scope="module")
def emb_sdf(spark):
    """64-dim fixture embeddings — PQ needs real dimensionality
    (the tiny 2-d VECS can't host m=2 x k=8 codebooks)."""
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_pq_encode_codes_bounded_and_deterministic(spark, emb_sdf):
    from bht_etl_app_spark.operators.pq import pq_encode, pq_train

    books = pq_train(emb_sdf, m=2, k=8, max_iter=2)
    assert len(books) == 2 and len(books[0]) == 8
    c1 = {r.vec_id: list(r.codes) for r in pq_encode(emb_sdf, books).collect()}
    c2 = {r.vec_id: list(r.codes) for r in pq_encode(emb_sdf, books).collect()}
    assert c1 == c2
    for codes in c1.values():
        assert len(codes) == 2
        assert all(0 <= c < 8 for c in codes)


def test_pq_adc_self_distance_is_minimal(spark, emb_sdf):
    """The query's own vector must score the SMALLEST possible ADC
    distance (its codes are the argmin codewords for its own
    subvectors), so the query point ranks first."""
    from bht_etl_app_spark.operators.pq import pq_encode, pq_topk, pq_train

    qv = [float(x) for x in emb_sdf.where("vec_id = 0").first()["embedding"]]
    books = pq_train(emb_sdf, m=2, k=8, max_iter=2)
    top = pq_topk(pq_encode(emb_sdf, books), qv, books, k=5).collect()
    assert top[0]["vec_id"] == 0


def test_pq_rerank_recovers_exact_topk(spark, emb_sdf):
    """The refine stage's contract: with a full-corpus shortlist the
    re-ranked top-k IS the exact L2 top-k (quantization error fully
    repaired), and at the production shortlist the result (a) is
    ordered by exact distance, (b) is a subset of the ADC shortlist,
    and (c) has recall@k >= the pure-ADC top-k against exact."""
    from bht_etl_app_spark.operators.pq import (
        l2_knn_join,
        pq_encode,
        pq_rerank_topk,
        pq_topk,
        pq_train,
    )

    qv = [float(x) for x in emb_sdf.where("vec_id = 0").first()["embedding"]]
    books = pq_train(emb_sdf, m=2, k=8, max_iter=2)
    n = emb_sdf.count()
    q = emb_sdf.where("vec_id = 0").selectExpr(
        "vec_id AS q_id", "embedding"
    )
    exact = [
        r["vec_id"]
        for r in l2_knn_join(q, emb_sdf, k=10).orderBy("rank").collect()
    ]
    full = pq_rerank_topk(emb_sdf, qv, books, k=10, shortlist=n).collect()
    assert [r["vec_id"] for r in full] == exact
    got = pq_rerank_topk(emb_sdf, qv, books, k=10, shortlist=50).collect()
    dists = [r["l2_dist"] for r in got]
    assert dists == sorted(dists)
    short_ids = {
        r["vec_id"]
        for r in pq_topk(pq_encode(emb_sdf, books), qv, books, k=50).collect()
    }
    assert {r["vec_id"] for r in got} <= short_ids
    adc10 = {
        r["vec_id"]
        for r in pq_topk(pq_encode(emb_sdf, books), qv, books, k=10).collect()
    }
    ex = set(exact)
    assert len({r["vec_id"] for r in got} & ex) >= len(adc10 & ex)


def test_rerank_knn_join_matches_single_and_gains_recall(spark, emb_sdf):
    """Batched-vs-single consistency is inherited from pq_knn_join
    (already pinned); here: (a) every rerank row's l2_dist is the
    true exact distance (replayed in Python), (b) rank orders by
    exact distance, (c) the report's rerank recall >= the pure-ADC
    recall and both fold through the verified recall_vs_exact."""
    from bht_etl_app_spark.operators.clustering import kmeans_fit
    from bht_etl_app_spark.operators.pq import (
        ann_recall_report_pq_rerank,
        pq_train,
        rerank_knn_join,
    )

    cents = kmeans_fit(emb_sdf, k=4, max_iter=2)
    books = pq_train(emb_sdf, m=2, k=8, max_iter=2)
    q = emb_sdf.where("vec_id < 4").selectExpr("vec_id AS q_id", "embedding")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb_sdf.collect()
    }
    rows = rerank_knn_join(
        q, emb_sdf, cents, books, k=3, shortlist=10, nprobe=2
    ).collect()
    assert rows and all(r["rank"] <= 3 for r in rows)
    by_q = {}
    for r in rows:
        qv, cv = vecs[r["q_id"]], vecs[r["vec_id"]]
        exp = round(sum((a - b) * (a - b) for a, b in zip(qv, cv)), 6)
        assert r["l2_dist"] == exp, (r, exp)
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["l2_dist"]))
    for q_id, rr in by_q.items():
        rr.sort()
        assert [d for _, d in rr] == sorted(d for _, d in rr)
    rep = ann_recall_report_pq_rerank(
        emb_sdf, cents, books, k=3, shortlist=30, n_queries=8, nprobe=2
    ).collect()[0]
    assert rep["avg_recall_rerank"] >= rep["avg_recall_pq"]
    assert rep["n_queries"] == 8 and rep["shortlist"] == 30


def test_pq_adc_matches_python_reference(spark, emb_sdf):
    """ADC distances replayed in pure Python from the SAME codebooks
    and codes — pins the LUT indexing and the fold order."""
    from bht_etl_app_spark.operators.pq import (
        pq_adc_lut,
        pq_encode,
        pq_topk,
        pq_train,
    )

    qv = [float(x) for x in emb_sdf.where("vec_id = 1").first()["embedding"]]
    books = pq_train(emb_sdf, m=2, k=8, max_iter=2)
    codes = {r.vec_id: list(r.codes) for r in pq_encode(emb_sdf, books).collect()}
    lut = pq_adc_lut(qv, books)
    k_cw = len(books[0])
    exp = {
        v: round(sum(lut[s * k_cw + c] for s, c in enumerate(cs)), 6)
        for v, cs in codes.items()
    }
    got = {
        r.vec_id: r.adc_dist
        for r in pq_topk(pq_encode(emb_sdf, books), qv, books, k=500).collect()
    }
    for v, d in got.items():
        assert d == exp[v], (v, d, exp[v])


def test_ivf_pq_probes_subset_of_full_adc_order(spark, emb_sdf):
    """IVF-PQ results must be consistent with full ADC over the
    probed lists: every returned id comes from a probed list, ranked
    by the same ADC distance; nprobe=all degenerates to full PQ."""
    from bht_etl_app_spark.operators.clustering import kmeans_fit
    from bht_etl_app_spark.operators.pq import (
        ann_ivf_pq_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    qv = [float(x) for x in emb_sdf.where("vec_id = 0").first()["embedding"]]
    books = pq_train(emb_sdf, m=2, k=8, max_iter=2)
    cents = kmeans_fit(emb_sdf, k=4, max_iter=2)
    full = [
        (r.vec_id, r.adc_dist)
        for r in pq_topk(pq_encode(emb_sdf, books), qv, books, k=10).collect()
    ]
    all_probe = [
        (r.vec_id, r.adc_dist)
        for r in ann_ivf_pq_topk(
            emb_sdf, qv, cents, books, k=10, nprobe=4
        ).collect()
    ]
    assert all_probe == full
    some = ann_ivf_pq_topk(emb_sdf, qv, cents, books, k=10, nprobe=1).collect()
    full_ids = dict(full)
    for r in some:
        # probed results carry the same ADC distance wherever they
        # also appear in the full ranking
        if r.vec_id in full_ids:
            assert r.adc_dist == full_ids[r.vec_id]


def test_pq_knn_join_matches_single_query_form(spark, emb_sdf):
    """The batched IVF-PQ join (per-query LUT as a projected column,
    in-array probe ranking) must reproduce the single-query form
    (driver-computed Python LUT + Python probe sort) query for query
    — same ids, same 6dp ADC distances, same (dist, id) order."""
    from bht_etl_app_spark.operators.clustering import kmeans_fit
    from bht_etl_app_spark.operators.pq import (
        ann_ivf_pq_topk,
        pq_knn_join,
        pq_train,
    )
    from pyspark.sql import functions as F

    books = pq_train(emb_sdf, m=2, k=8, max_iter=2)
    cents = kmeans_fit(emb_sdf, k=4, max_iter=2)
    q = emb_sdf.where("vec_id < 3").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    batched = {}
    for r in pq_knn_join(q, emb_sdf, cents, books, k=7, nprobe=2).collect():
        batched.setdefault(r["q_id"], []).append(
            (r["rank"], r["vec_id"], r["adc_dist"])
        )
    for q_id in (0, 1, 2):
        qv = [
            float(x)
            for x in emb_sdf.where(f"vec_id = {q_id}").first()["embedding"]
        ]
        single = [
            (i + 1, r["vec_id"], r["adc_dist"])
            for i, r in enumerate(
                ann_ivf_pq_topk(
                    emb_sdf, qv, cents, books, k=7, nprobe=2
                ).collect()
            )
        ]
        assert sorted(batched[q_id]) == single, q_id


def test_l2_knn_join_matches_python_reference(spark):
    """Exact squared-L2 baseline: distances, ranks, and (dist, id)
    tiebreaks against a brute-force Python reference with the same
    6dp half-even rounding."""
    from bht_etl_app_spark.operators.pq import l2_knn_join
    from pyspark.sql import functions as F

    vecs = [(i, [float((i * 3 + j) % 5) for j in range(4)]) for i in range(12)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = emb.where("vec_id < 2").select(F.col("vec_id").alias("q_id"), "embedding")
    got = {}
    for r in l2_knn_join(q, emb, k=4).collect():
        got.setdefault(r["q_id"], []).append(
            (r["rank"], r["vec_id"], r["l2_dist"])
        )
    by_id = dict(vecs)
    for q_id in (0, 1):
        dists = sorted(
            (
                round(sum((a - b) ** 2 for a, b in zip(by_id[q_id], v)), 6),
                i,
            )
            for i, v in vecs
        )
        ref = [(rk + 1, i, d) for rk, (d, i) in enumerate(dists[:4])]
        assert sorted(got[q_id]) == ref, q_id


def test_ann_recall_report_pq_bounds_and_full_probe_consistency(spark, emb_sdf):
    """The IVF-PQ recall report stays within [0, 1] with the declared
    shape, and with nprobe = kc (every list probed) the batched join
    degenerates to full PQ ADC — per-query results must equal
    pq_topk over the encoded corpus. (Recall is deliberately NOT
    asserted monotone in nprobe: a larger candidate set can surface
    a smaller-ADC non-neighbor that displaces the true NN from the
    approximate top-k — the dial's known non-monotonicity.)"""
    from bht_etl_app_spark.operators.clustering import kmeans_fit
    from bht_etl_app_spark.operators.pq import (
        ann_recall_report_pq,
        pq_encode,
        pq_knn_join,
        pq_topk,
        pq_train,
    )
    from pyspark.sql import functions as F

    books = pq_train(emb_sdf, m=2, k=8, max_iter=2)
    cents = kmeans_fit(emb_sdf, k=4, max_iter=2)
    r = ann_recall_report_pq(
        emb_sdf, cents, books, k=5, n_queries=8, nprobe=4
    ).collect()[0]
    assert (r["n_queries"], r["k"]) == (8, 5)
    assert 0.0 <= r["min_recall"] <= r["avg_recall"] <= 1.0
    # nprobe == kc: candidates = whole corpus -> per-query equality
    # with the full ADC ranking
    q = emb_sdf.where("vec_id < 2").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    batched = {}
    for row in pq_knn_join(q, emb_sdf, cents, books, k=6, nprobe=4).collect():
        batched.setdefault(row["q_id"], []).append(
            (row["rank"], row["vec_id"], row["adc_dist"])
        )
    codes = pq_encode(emb_sdf, books)
    for q_id in (0, 1):
        qv = [
            float(x)
            for x in emb_sdf.where(f"vec_id = {q_id}").first()["embedding"]
        ]
        full = [
            (i + 1, row["vec_id"], row["adc_dist"])
            for i, row in enumerate(pq_topk(codes, qv, books, k=6).collect())
        ]
        assert sorted(batched[q_id]) == full, q_id


def test_rpq_knn_join_matches_single_query_path(spark, emb_sdf):
    """The batched residual join (rpq_knn_join — the recall harness's
    deployment shape) equals the verified single-query
    ann_ivf_rpq_topk per query: same ids, same 6dp ADC distances,
    same (dist, id) order. Pins the column-side probe ranking
    (_probes_expr) and the per-(query, list) LUT fold against the
    driver-side literal path."""
    from pyspark.sql import functions as F

    from bht_etl_app_spark.operators.clustering import kmeans_fit
    from bht_etl_app_spark.operators.pq import (
        ann_ivf_rpq_topk,
        pq_train_residual,
        rpq_knn_join,
    )

    cents = kmeans_fit(emb_sdf, k=4, max_iter=2)
    books = pq_train_residual(emb_sdf, cents, m=2, k=8, max_iter=2)
    q = emb_sdf.where("vec_id < 3").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    batched = {}
    for row in rpq_knn_join(q, emb_sdf, cents, books, k=6, nprobe=2).collect():
        batched.setdefault(row["q_id"], []).append(
            (row["rank"], row["vec_id"], row["adc_dist"])
        )
    for q_id in (0, 1, 2):
        qv = [
            float(x)
            for x in emb_sdf.where(f"vec_id = {q_id}").first()["embedding"]
        ]
        single = [
            (i + 1, row["vec_id"], row["adc_dist"])
            for i, row in enumerate(
                ann_ivf_rpq_topk(
                    emb_sdf, qv, cents, books, k=6, nprobe=2
                ).collect()
            )
        ]
        assert sorted(batched[q_id]) == single, q_id


def test_rpq_vs_pq_recall_report_shape(spark, emb_sdf):
    """The side-by-side report: one row, both configurations bounded
    in [0, 1], n_queries/k as asked. (No recall ordering is asserted
    between the encodings — on tiny fixtures quantization noise can
    go either way; the point of the key is that the comparison is a
    MEASURED number.)"""
    from bht_etl_app_spark.operators.clustering import kmeans_fit
    from bht_etl_app_spark.operators.pq import (
        ann_recall_report_rpq_vs_pq,
        pq_train,
        pq_train_residual,
    )

    cents = kmeans_fit(emb_sdf, k=4, max_iter=2)
    pq_books = pq_train(emb_sdf, m=2, k=8, max_iter=2)
    rpq_books = pq_train_residual(emb_sdf, cents, m=2, k=8, max_iter=2)
    rows = ann_recall_report_rpq_vs_pq(
        emb_sdf, cents, pq_books, rpq_books, k=5, n_queries=8, nprobe=2
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_queries"], r["k"]) == (8, 5)
    assert 0.0 <= r["min_recall_pq"] <= r["avg_recall_pq"] <= 1.0
    assert 0.0 <= r["min_recall_rpq"] <= r["avg_recall_rpq"] <= 1.0


def test_ivf_rpq_zero_centroid_degenerates_to_classic_pq(spark, emb_sdf):
    """IVF-residual PQ degeneracy pin: with a single ZERO coarse
    centroid the residual IS the raw vector and nprobe=1 probes
    everything — ann_ivf_rpq_topk must equal classic full-scan
    pq_topk exactly (ids, 6dp ADC distances, order). This pins the
    residual plumbing (assignment, subtraction, per-list LUT
    indexing) against the verified classic path."""
    from bht_etl_app_spark.operators.pq import (
        ann_ivf_rpq_topk,
        pq_encode,
        pq_topk,
        pq_train,
        pq_train_residual,
    )

    qv = [float(x) for x in emb_sdf.where("vec_id = 0").first()["embedding"]]
    zero_cent = [[0.0] * len(qv)]
    books = pq_train(emb_sdf, m=2, k=8, max_iter=2)
    # residual training under the zero centroid is classic training
    rbooks = pq_train_residual(emb_sdf, zero_cent, m=2, k=8, max_iter=2)
    assert rbooks == books
    full = [
        (r["vec_id"], r["adc_dist"])
        for r in pq_topk(pq_encode(emb_sdf, books), qv, books, k=9).collect()
    ]
    rpq = [
        (r["vec_id"], r["adc_dist"])
        for r in ann_ivf_rpq_topk(
            emb_sdf, qv, zero_cent, rbooks, k=9, nprobe=1
        ).collect()
    ]
    assert rpq == full


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_ivf_rpq_oracle_matches_spark_on_fixture(spark, sf):
    """Registration rehearsal (r9 contract key ann_ivf_rpq_topk): the residual-encoding
    IVF-PQ oracle (coarse chain + residual table + subspace chains
    over residual slices + per-list LUTs) matches Spark exactly on
    the real fixtures — the same comparison the driver gate runs."""
    import duckdb

    from __spark_entry__ import _PQ_PARAMS, _ann_ivf_rpq_oracle_sql
    from bht_etl_app_spark.operators.clustering import kmeans_fit
    from bht_etl_app_spark.operators.pq import (
        ann_ivf_rpq_topk,
        pq_train_residual,
    )
    from bht_etl_app_spark.session import load_table

    emb = load_table(spark, sf, "embeddings")
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    cents = kmeans_fit(emb, k=8, max_iter=2)
    books = pq_train_residual(emb, cents, **_PQ_PARAMS)
    got = [
        (r["vec_id"], r["adc_dist"])
        for r in ann_ivf_rpq_topk(
            emb, qv, cents, books, k=10, nprobe=2
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    orows = [tuple(r) for r in con.execute(_ann_ivf_rpq_oracle_sql()).fetchall()]
    assert got == orows and len(got) == 10


def test_ann_recall_report_exact_vs_exact_is_one(spark):
    """With enough multiprobe coverage... simplest invariant: the
    report of the ANN path against itself-equivalent settings is
    bounded in [0, 1], and an exhaustive-probe run (flipping every
    bit combination = all buckets reachable) must reach recall 1.0
    on a tiny corpus where every vector lands in probe range."""
    from bht_etl_app_spark.operators.similarity import (
        ann_recall_report,
        lsh_planes,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float((i * 7) % 5), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    planes = lsh_planes(2, 3, seed=7)
    r = ann_recall_report(
        emb, planes, k=3, n_queries=5, multiprobe_bits=2
    ).collect()[0]
    # multiprobe_bits == n_planes flips every bucket bit combination:
    # candidates = whole corpus -> ANN == exact -> recall exactly 1.0
    assert (r["n_queries"], r["k"]) == (5, 3)
    assert r["avg_recall"] == 1.0 and r["min_recall"] == 1.0


def test_ann_recall_report_detects_lossy_settings(spark):
    """Zero probes on many planes must lose neighbors on a spread-out
    corpus — the report exists to SHOW that, so check it can go below
    1 while staying within [0, 1]."""
    import random

    from bht_etl_app_spark.operators.similarity import (
        ann_recall_report,
        lsh_planes,
    )

    rng = random.Random(3)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    planes = lsh_planes(6, 8, seed=11)
    r = ann_recall_report(
        emb, planes, k=5, n_queries=8, multiprobe_bits=0
    ).collect()[0]
    assert 0.0 <= r["min_recall"] <= r["avg_recall"] <= 1.0
    assert r["avg_recall"] < 1.0, "6 planes / 0 probes should lose neighbors"


def test_hard_negatives_excludes_same_label(spark):
    """Every mined negative must carry a different label than its
    anchor, and with exhaustive probes the result equals the exact
    label-filtered top-k."""
    from bht_etl_app_spark.operators.similarity import (
        hard_negatives,
        knn_join,
        lsh_planes,
    )
    from pyspark.sql import functions as F

    rows = [
        (i, [float(i % 4), float((i * 3) % 7), 1.0], i % 2) for i in range(30)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    planes = lsh_planes(2, 3, seed=5)
    got = hard_negatives(
        emb, planes, k=3, n_queries=4, multiprobe_bits=2
    ).collect()
    labels = {r[0]: r[2] for r in rows}
    for r in got:
        assert labels[r["q_id"]] != labels[r["vec_id"]]
    # exhaustive probes == exact: brute-force the label-filtered top-k
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), "embedding", F.col("label").alias("ql")
    )
    exact = (
        knn_join(q.select("q_id", "embedding"), emb, k=30)
        .join(q.select("q_id", "ql"), "q_id")
        .join(emb.select(F.col("vec_id"), F.col("label").alias("cl")), "vec_id")
        .where(F.col("ql") != F.col("cl"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    exact_top = (
        exact.withColumn("r2", F.row_number().over(w))
        .where(F.col("r2") <= 3)
        .select("q_id", "vec_id", "cosine")
    )
    assert {(r["q_id"], r["vec_id"], r["cosine"]) for r in got} == {
        (r["q_id"], r["vec_id"], r["cosine"]) for r in exact_top.collect()
    }


def test_rrf_fuse_hand_case(spark):
    from bht_etl_app_spark.operators.similarity import rrf_fuse

    l1 = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rank long")
    l2 = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, rank long")
    got = {r["doc_id"]: r for r in rrf_fuse([l1, l2], k=5).collect()}
    # doc 20 appears in both lists -> fused score 1/61 + 1/62 wins
    assert got[20]["rank"] == 1 and got[20]["n_lists"] == 2
    assert got[10]["rank"] == 2 and got[30]["rank"] == 3
    t61 = round(1.0 / 61.0, 12)
    t62 = round(1.0 / 62.0, 12)
    assert got[20]["rrf"] == round(t61 + t62, 12)
    assert got[10]["rrf"] == t61 and got[30]["rrf"] == t62


def test_truncated_dim_recall_full_dims_is_exact(spark, emb_sdf):
    """keep_dims == dim reproduces the baseline bit-for-bit (recall
    1.0); half dims on gaussian fixture vectors loses recall (no MRL
    dimension ordering in random embeddings — the report exists to
    measure exactly this before anyone truncates storage)."""
    from bht_etl_app_spark.operators.similarity import (
        ann_recall_report_truncated_dim,
    )

    full = ann_recall_report_truncated_dim(
        emb_sdf, keep_dims=64, k=3, n_queries=8
    ).collect()[0]
    assert full["avg_recall"] == 1.0 and full["min_recall"] == 1.0
    assert full["keep_dims"] == 64 and full["n_queries"] == 8
    half = ann_recall_report_truncated_dim(
        emb_sdf, keep_dims=32, k=3, n_queries=8
    ).collect()[0]
    assert half["avg_recall"] <= 1.0


def test_ann_recall_frontier_nprobe_rows_and_byte_widths(spark, emb_sdf):
    """r11 pins (VERDICT r10 #7 + ADVICE r10): the frontier emits the
    three PQ-family configs once per probe count with nprobe as its
    own column (NULL on the exhaustive truncation rows), and
    bytes_per_vec prices the coarse list id at its ACTUAL width
    (1 byte at <=256 coarse lists here; the width rule itself is
    checked at the 2-byte boundary)."""
    from bht_etl_app_spark.operators.clustering import kmeans_fit
    from bht_etl_app_spark.operators.pq import (
        ann_recall_frontier,
        pq_train,
        pq_train_residual,
    )

    cents = kmeans_fit(emb_sdf, k=4, max_iter=2)
    books = pq_train(emb_sdf, m=2, k=8, max_iter=2)
    rbooks = pq_train_residual(emb_sdf, cents, m=2, k=8, max_iter=2)
    rows = [
        r.asDict()
        for r in ann_recall_frontier(
            emb_sdf, cents, books, rbooks, k=3, n_queries=8,
            nprobes=(1, 2), shortlist=10, keep_dims_list=(16,),
        ).collect()
    ]
    assert len(rows) == 1 + 3 * 2
    n_corpus = emb_sdf.count()
    trunc = [r for r in rows if r["config"] == "trunc_d16"]
    assert len(trunc) == 1 and trunc[0]["nprobe"] is None
    assert trunc[0]["bytes_per_vec"] == 64
    assert trunc[0]["avg_scanned"] == float(n_corpus)  # exhaustive
    for cfg in ("ivf_pq_m2", "ivf_rpq_m2", "ivf_pq_m2_rerank10"):
        per = sorted(
            (r for r in rows if r["config"] == cfg),
            key=lambda r: r["nprobe"],
        )
        assert [r["nprobe"] for r in per] == [1, 2]
        assert all(r["bytes_per_vec"] == 3 for r in per)  # 2 codes + 1
        assert all(0.0 <= r["avg_recall"] <= 1.0 for r in per)
        # scan cost: positive, monotone in probes, bounded by the
        # corpus, identical across configs at one probe count
        assert 0 < per[0]["avg_scanned"] <= per[1]["avg_scanned"]
        assert per[1]["avg_scanned"] <= n_corpus
    by_np = {}
    for r in rows:
        if r["nprobe"] is not None:
            by_np.setdefault(r["nprobe"], set()).add(r["avg_scanned"])
    assert all(len(v) == 1 for v in by_np.values())
    # the re-rank arm's recall never decreases with more probes (its
    # exact refinement ranks a superset shortlist)
    rr = sorted(
        (r for r in rows if r["config"] == "ivf_pq_m2_rerank10"),
        key=lambda r: r["nprobe"],
    )
    assert rr[0]["avg_recall"] <= rr[1]["avg_recall"] + 1e-9
    # byte-width rule at the boundaries (pure arithmetic, no Spark)
    widths = {256: 1, 257: 2, 65536: 2, 65537: 4}
    for nc, want in widths.items():
        got = 1 if nc <= 256 else (2 if nc <= 65536 else 4)
        assert got == want


# --- OPQ rotation (r12 — VERDICT r11 #6) ----------------------------


def _planted_anisotropic(emb_sdf):
    """The _opq_bench_emb transform (geometric dim decay + 45-degree
    cross-subspace pair mixing) on the test fixture — deterministic
    correlation structure for the rotation to undo."""
    S = F.array(*[F.lit(0.93 ** i) for i in range(64)])
    c = F.lit(math.sqrt(0.5))
    sc = F.zip_with(
        F.col("embedding").cast("array<double>"), S, lambda a, s: a * s
    )
    return emb_sdf.select(
        "vec_id",
        F.concat(
            F.transform(
                F.sequence(F.lit(0), F.lit(31)),
                lambda i: c * (
                    F.element_at(sc, (i + 1).cast("int"))
                    - F.element_at(sc, (i + 33).cast("int"))
                ),
            ),
            F.transform(
                F.sequence(F.lit(0), F.lit(31)),
                lambda i: c * (
                    F.element_at(sc, (i + 1).cast("int"))
                    + F.element_at(sc, (i + 33).cast("int"))
                ),
            ),
        ).alias("embedding"),
    )


def test_opq_rotation_orthogonal_balanced_deterministic(spark, emb_sdf):
    """The rows-only parity pins (the embedding_pca_coords
    precedent): R is orthogonal to LAPACK precision, subspace groups
    are exactly d/m dims each, the greedy allocation balances
    log-eigenvalue load to within one dim's worth, and the whole
    construction is run-to-run deterministic."""
    import numpy as np

    from bht_etl_app_spark.operators.embstats import embedding_covariance
    from bht_etl_app_spark.operators.pq import opq_rotation

    rot = opq_rotation(emb_sdf, m=2)
    R = np.array(rot)
    assert R.shape == (64, 64)
    assert float(np.abs(R @ R.T - np.eye(64)).max()) < 1e-9
    # determinism: same input -> bit-identical basis
    assert opq_rotation(emb_sdf, m=2) == rot
    # balanced allocation: per-group log-eigenvalue loads differ by
    # at most the largest single log-eigenvalue spread (greedy bound)
    cov_rows = embedding_covariance(emb_sdf).collect()
    cov = np.zeros((64, 64))
    for r in cov_rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    vals = np.linalg.eigvalsh(cov)
    loads = []
    for g in range(2):
        block = R[g * 32:(g + 1) * 32]
        ev = [float(v.T @ cov @ v) for v in block]
        loads.append(sum(np.log(np.maximum(ev, 1e-12))))
    spread = float(np.log(vals.max()) - np.log(np.maximum(vals.min(), 1e-12)))
    assert abs(loads[0] - loads[1]) <= spread + 1e-6
    with pytest.raises(ValueError):
        opq_rotation(emb_sdf, m=3)  # 3 does not divide 64


def test_rotate_embeddings_preserves_exact_knn(spark, emb_sdf):
    """Rotation invariance — the property that makes the ORIGINAL
    space's exact neighbors the shared ground truth for both frontier
    arms: pairwise L2 is preserved to float tolerance and the exact
    kNN id sets are identical before/after rotation."""
    from bht_etl_app_spark.operators.pq import (
        l2_knn_join,
        opq_rotation,
        rotate_embeddings,
    )

    base = _planted_anisotropic(emb_sdf)
    rot = opq_rotation(base, m=2)
    rotated = rotate_embeddings(base, rot)
    q = base.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    rq = rotated.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact_o = {
        (r["q_id"], r["vec_id"])
        for r in l2_knn_join(q, base, k=3, c_id="vec_id").collect()
    }
    exact_r = {
        (r["q_id"], r["vec_id"])
        for r in l2_knn_join(rq, rotated, k=3, c_id="vec_id").collect()
    }
    assert exact_o == exact_r


def test_opq_frontier_beats_classic_on_planted_anisotropy(spark, emb_sdf):
    """The recall-gain pin: on the planted anisotropic fixture the
    rotated arm's summed recall strictly beats classic IVF-PQ at
    IDENTICAL bytes_per_vec and IDENTICAL avg_scanned (rotation
    equivariance of the smallest-id-seeded kmeans makes the coarse
    lists the rotated images of each other). Everything in the chain
    is deterministic, so this is an exact replay, not a statistical
    bet (0.5 vs 0.375 summed at this fixture)."""
    from bht_etl_app_spark.operators.clustering import kmeans_fit
    from bht_etl_app_spark.operators.pq import (
        ann_recall_frontier_opq,
        opq_rotation,
        pq_train,
        rotate_embeddings,
    )

    base = _planted_anisotropic(emb_sdf).persist()
    rot = opq_rotation(base, m=2)
    rotated = rotate_embeddings(base, rot)
    cents = kmeans_fit(base, k=4, max_iter=2)
    books = pq_train(base, m=2, k=8, max_iter=2)
    rcents = kmeans_fit(rotated, k=4, max_iter=2)
    rbooks = pq_train(rotated, m=2, k=8, max_iter=2)
    rows = [
        r.asDict()
        for r in ann_recall_frontier_opq(
            base, rotated, cents, books, rcents, rbooks,
            k=3, n_queries=8, nprobes=(1, 2),
        ).collect()
    ]
    base.unpersist()
    assert len(rows) == 4  # 2 configs x 2 probes
    assert {r["bytes_per_vec"] for r in rows} == {3}
    by_np = {}
    for r in rows:
        by_np.setdefault(r["nprobe"], set()).add(r["avg_scanned"])
    assert all(len(v) == 1 for v in by_np.values())  # equivariance
    tot = {}
    for r in rows:
        tot[r["config"]] = tot.get(r["config"], 0.0) + r["avg_recall"]
    assert tot["ivf_opq_m2"] > tot["ivf_pq_m2"]

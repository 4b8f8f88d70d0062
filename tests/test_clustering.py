"""k-means and SemDeDup semantic dedup on tiny literal embeddings."""

import pytest

from bht_etl_app_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)


@pytest.fixture(scope="module")
def emb(spark):
    # two tight blobs around (0,0) and (10,10); ids 0/1 land in
    # different blobs so the smallest-id init seeds both
    rows = [
        (0, [0.0, 0.1]),
        (1, [10.0, 10.0]),
        (2, [0.1, 0.0]),
        (3, [10.1, 9.9]),
        (4, [0.05, 0.05]),
        (5, [9.9, 10.1]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_fit_two_blobs(emb):
    cents = kmeans_fit(emb, k=2, max_iter=10)
    assert len(cents) == 2
    # one centroid near the origin blob, one near the (10,10) blob
    near0 = min(cents, key=lambda c: c[0] + c[1])
    near10 = max(cents, key=lambda c: c[0] + c[1])
    assert near0[0] == pytest.approx(0.05, abs=1e-6)
    assert near0[1] == pytest.approx(0.05, abs=1e-6)
    assert near10[0] == pytest.approx(10.0, abs=1e-6)
    assert near10[1] == pytest.approx(10.0, abs=1e-6)

    got = {r["vec_id"]: r["list_id"] for r in kmeans_assign(emb, cents).collect()}
    assert got[0] == got[2] == got[4]
    assert got[1] == got[3] == got[5]
    assert got[0] != got[1]


def test_kmeans_fit_validates_k(emb):
    with pytest.raises(ValueError, match="only 6"):
        kmeans_fit(emb, k=7)
    with pytest.raises(ValueError, match="positive"):
        kmeans_fit(emb, k=0)


def test_semantic_dedup_drops_within_cluster_duplicates(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.001]),   # near-dup of 0 (same blob)
        (3, [0.001, 1.0]),   # near-dup of 1
        (4, [-1.0, 0.02]),   # own direction, no dup
        (5, [1.0, 0.002]),   # second near-dup of 0
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(emb, k=2, threshold=0.999).collect()}
    assert len(out) == 6
    kept = {i for i, r in out.items() if r["kept"]}
    # min id survives each duplicate component
    assert 0 in kept and 1 in kept and 4 in kept
    assert 2 not in kept and 5 not in kept and 3 not in kept


def test_semantic_dedup_no_pairs_keeps_everything(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0]), (3, [0.0, -1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, k=2, threshold=0.999).collect()
    assert all(r["kept"] for r in out)
    assert len(out) == 4


def test_kcenter_greedy_matches_numpy_replay(spark):
    import numpy as np

    from bht_etl_app_spark.operators.clustering import kcenter_select
    from bht_etl_app_spark.operators.similarity import quantize_embeddings

    rng = np.random.default_rng(11)
    rows = [(int(i), [float(x) for x in rng.normal(size=6)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = np.array(
        [r["qvec"] for r in quantize_embeddings(df).orderBy("vec_id").collect()],
        dtype=np.int64,
    )
    # driver-side greedy replay: seed = min id, then farthest-first
    picked = [0]
    mind = ((q - q[0]) ** 2).sum(axis=1)
    want = [(1, 0, None)]
    for r in range(2, 6):
        nxt = int(np.lexsort((np.arange(len(q)), -mind))[0])
        want.append((r, nxt, int(mind[nxt])))
        picked.append(nxt)
        mind = np.minimum(mind, ((q - q[nxt]) ** 2).sum(axis=1))
    got = [
        (r["sel_rank"], r["vec_id"], r["dist_sq"])
        for r in kcenter_select(df, k=5).orderBy("sel_rank").collect()
    ]
    assert got == want


def test_kcenter_radius_non_increasing_and_k_gt_n(spark):
    from bht_etl_app_spark.operators.clustering import kcenter_select

    # 3 distinct points plus one exact duplicate of the seed: the run
    # must stop at 3 selections (coverage radius hits 0 — the
    # duplicate never gets picked), each vec_id once, radii
    # non-increasing
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = kcenter_select(df, k=10).orderBy("sel_rank").collect()
    assert [r["vec_id"] for r in got] == [0, 1, 2]
    dists = [r["dist_sq"] for r in got[1:]]
    assert all(d > 0 for d in dists)
    assert all(a >= b for a, b in zip(dists, dists[1:]))

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

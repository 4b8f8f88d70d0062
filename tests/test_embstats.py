"""Tests for the embedding-statistics family: covariance vs a
straight-numpy computation on the SAME quantized matrix, centroid
cosine vs numpy, and the PCA projection's parity/shape/ordering
pins (the rows-only key's accuracy contract)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bht_etl_app_spark.operators.embstats import (
    embedding_covariance,
    embedding_pca_coords,
    label_centroid_sim,
)
from bht_etl_app_spark.operators.similarity import quantize_embeddings


@pytest.fixture(scope="module")
def tiny_emb(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=8)], int(i % 3))
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _quantized_matrix(spark_df):
    rows = quantize_embeddings(spark_df).orderBy("vec_id").collect()
    return np.array([r["qvec"] for r in rows], dtype=np.float64)


def test_covariance_matches_numpy(spark, tiny_emb):
    q = _quantized_matrix(tiny_emb)
    want = np.cov(q, rowvar=False, ddof=1)
    got = embedding_covariance(tiny_emb).collect()
    assert len(got) == 8 * 9 // 2
    for r in got:
        assert r["n"] == 40
        assert r["cov"] == pytest.approx(want[r["i"], r["j"]], abs=1e-9)


def test_covariance_diagonal_is_variance(spark, tiny_emb):
    got = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(tiny_emb).collect()}
    q = _quantized_matrix(tiny_emb)
    for i in range(8):
        assert got[(i, i)] == pytest.approx(np.var(q[:, i], ddof=1), abs=1e-9)
        assert got[(i, i)] >= 0.0


def test_label_centroid_sim_matches_numpy(spark, tiny_emb):
    q = _quantized_matrix(tiny_emb)
    labels = np.array([i % 3 for i in range(40)])
    got = label_centroid_sim(tiny_emb).collect()
    assert len(got) == 3
    for r in got:
        sa = q[labels == r["label_a"]].sum(axis=0)
        sb = q[labels == r["label_b"]].sum(axis=0)
        want = float(sa @ sb) / (math.sqrt(sa @ sa) * math.sqrt(sb @ sb))
        assert r["cosine"] == pytest.approx(want, abs=1e-9)
        assert r["n_a"] == int((labels == r["label_a"]).sum())
        assert -1.0 <= r["cosine"] <= 1.0


def test_label_centroid_zero_norm_is_null(spark):
    rows = [(0, [0.0, 0.0], 0), (1, [0.0, 0.0], 0), (2, [1.0, 0.5], 1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = label_centroid_sim(df).collect()
    assert len(got) == 1
    assert got[0]["cosine"] is None


def test_pca_coords_parity_with_numpy(spark, tiny_emb):
    q = _quantized_matrix(tiny_emb)
    cov = np.cov(q, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    mean = q.mean(axis=0)
    want = {}
    for c in range(1, 3):
        v = vecs[:, -c]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        want[c] = (q - mean) @ v
    got = embedding_pca_coords(tiny_emb, n_components=2).orderBy("vec_id").collect()
    assert [r["vec_id"] for r in got] == list(range(40))
    for idx, r in enumerate(got):
        assert r["pc1"] == pytest.approx(want[1][idx], abs=1e-4)
        assert r["pc2"] == pytest.approx(want[2][idx], abs=1e-4)


def test_pca_component_variance_ordering(spark, tiny_emb):
    got = embedding_pca_coords(tiny_emb, n_components=2).collect()
    pc1 = np.array([r["pc1"] for r in got])
    pc2 = np.array([r["pc2"] for r in got])
    # pc1 captures at least as much variance, and both are centered
    assert pc1.var() >= pc2.var() - 1e-9
    assert abs(pc1.mean()) < 1e-3 and abs(pc2.mean()) < 1e-3
    # near-orthogonality of the projected coordinates
    denom = math.sqrt(float(pc1 @ pc1) * float(pc2 @ pc2))
    assert abs(float(pc1 @ pc2)) / denom < 1e-3


def test_embedding_dim_outliers_planted(spark):
    from bht_etl_app_spark.operators.embstats import embedding_dim_outliers

    # nine [1,1] rows and one [1,-1]: dim 0 is constant (flags
    # nothing structurally), dim 1 flags only the planted -1 row
    # under the exact integer gate (n*x - s)^2 > t^2 * (n*q - s^2)
    rows = [(i, [1.0, 1.0], 0) for i in range(9)] + [(99, [1.0, -1.0], 0)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = embedding_dim_outliers(emb, t=2).collect()
    assert len(out) == 1
    assert out[0]["vec_id"] == 99
    assert out[0]["n_outlier_dims"] == 1 and out[0]["rank"] == 1

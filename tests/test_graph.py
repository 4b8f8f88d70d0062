"""PageRank + cluster-representative selection vs a pure-Python
reference implementation."""

import collections
import random

import pytest

from bht_etl_app_spark.operators.graph import cluster_representatives, pagerank


def _python_pagerank(edges, num_iters=6, d=0.85):
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    n = len(adj)
    r = {v: 1.0 / n for v in adj}
    for _ in range(num_iters):
        r = {
            v: round((1 - d) / n + d * sum(r[u] / len(adj[u]) for u in adj[v]), 12)
            for v in adj
        }
    return {v: round(x, 6) for v, x in r.items()}


def test_pagerank_path_graph_hand_values(spark):
    # path 1-2-3: the middle vertex must out-rank the endpoints
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {r["id"]: r["rank"] for r in pagerank(pairs).collect()}
    exp = _python_pagerank([(1, 2), (2, 3)])
    assert got == exp
    assert got[2] > got[1] == got[3]


def test_pagerank_random_graph_matches_reference(spark):
    rng = random.Random(17)
    edges = sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(120)})
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["rank"] for r in pagerank(pairs).collect()}
    assert got == _python_pagerank(edges)


def test_pagerank_empty_graph(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert pagerank(pairs).count() == 0


def test_cluster_representatives_picks_center_not_min_id(spark):
    # star around vertex 9 (NOT the min id) + separate pair
    edges = [(1, 9), (2, 9), (3, 9), (4, 9), (20, 21)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["cluster_id"]: (r["rep_id"], r["size"])
        for r in cluster_representatives(pairs).collect()
    }
    # star cluster keyed by min label 1, kept doc is the HUB 9
    assert got[1] == (9, 5)
    # tie on rank in the isolated pair -> lowest id wins
    assert got[20] == (20, 2)


def test_pagerank_mass_conserved(spark):
    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    total = sum(r["rank"] for r in pagerank(pairs).collect())
    assert abs(total - 1.0) < 1e-4


def test_triangle_stats_k4_and_path(spark):
    from bht_etl_app_spark.operators.graph import triangle_stats

    # K4: C(4,3)=4 triangles, wedges = 4 * C(3,2) = 12, coeff = 1.0
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4, "id_a long, id_b long")
    row = triangle_stats(df).head()
    assert (row["n_nodes"], row["n_edges"]) == (4, 6)
    assert (row["n_triangles"], row["n_wedges"]) == (4, 12)
    assert row["global_clustering"] == 1.0

    # path 0-1-2-3: no triangles, 2 wedges, coeff 0
    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "id_a long, id_b long"
    )
    row = triangle_stats(path).head()
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 2
    assert row["global_clustering"] == 0.0


def test_triangle_stats_star_plus_triangle(spark):
    from bht_etl_app_spark.operators.graph import triangle_stats

    # hub 0 connected to 1..5, plus one closing edge (1,2):
    # exactly 1 triangle; wedges = C(5,2) at hub wait hub deg 5 ->
    # C(5,2)=10, spokes 1,2 have deg 2 -> 1 each, so 12 wedges
    edges = [(0, i) for i in range(1, 6)] + [(1, 2)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    row = triangle_stats(df).head()
    assert row["n_triangles"] == 1
    assert row["n_wedges"] == 12
    assert row["global_clustering"] == 3.0 * 1 / 12


def test_link_prediction_hand_case(spark):
    from bht_etl_app_spark.operators.graph import link_prediction_scores

    # path graph 3-2-1-4: wedge centers 1 {2,4} and 2 {1,3} predict
    # the two missing closures with cn=1, ra=1/deg(center)=0.5
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4)], "id_a long, id_b long"
    )
    rows = link_prediction_scores(pairs).collect()
    got = {(r["id_u"], r["id_v"]): r for r in rows}
    assert set(got) == {(1, 3), (2, 4)}
    for r in rows:
        assert r["common_neighbors"] == 1 and r["ra"] == 0.5
    assert got[(1, 3)]["rank"] == 1 and got[(2, 4)]["rank"] == 2
    # triangle edges are never predicted: connect 1-3 -> only (2,4)
    # remains (and 3-2-1 wedges no longer produce it)
    pairs2 = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (1, 3)], "id_a long, id_b long"
    )
    rows2 = link_prediction_scores(pairs2).collect()
    assert (1, 3) not in {(r["id_u"], r["id_v"]) for r in rows2}


def test_link_prediction_center_degree_cap(spark):
    from bht_etl_app_spark.operators.graph import link_prediction_scores

    # star center 1 with 4 leaves: every leaf pair is a candidate
    # through center 1 (deg 4); capping below 4 excludes the hub
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5)], "id_a long, id_b long"
    )
    assert link_prediction_scores(pairs).count() == 6
    assert link_prediction_scores(pairs, max_center_degree=3).count() == 0


def test_label_propagation_two_cliques(spark):
    from bht_etl_app_spark.operators.graph import (
        label_propagation_communities,
    )

    # two triangles bridged by 3-4: LPA must split along the sparse
    # cut that connected components would merge
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["community"]
        for r in label_propagation_communities(pairs).collect()
    }
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == got[6] == 3


def test_degree_histogram_hand_case(spark):
    from bht_etl_app_spark.operators.graph import degree_histogram

    # star 1-(2,3,4): degrees 3,1,1,1
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    got = {r["degree"]: r for r in degree_histogram(pairs).collect()}
    assert got[1]["n_nodes"] == 3 and got[3]["n_nodes"] == 1
    assert got[1]["share"] == 0.75 and got[3]["share"] == 0.25

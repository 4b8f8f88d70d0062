"""End-to-end similarity-search example over the ``embeddings``
fixture — the offline-index / online-probe split a production ANN
service runs, built entirely from this engine's operators:

    OFFLINE  k-means fit -> IVF list assignment -> parquet written
             PARTITIONED BY list_id (probes prune whole files)
    ONLINE   score query against centroids driver-side -> read only
             the nprobe nearest list partitions -> exact cosine ->
             top-k

The partition-pruned read is the point: at 100 TB of vectors a probe
touches ``nprobe / k`` of the index files and nothing else — the
`WHERE list_id IN (...)` clause becomes parquet partition pruning,
visible in the plan's PartitionFilters. Run:

    python examples/semantic_search.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bht_etl_app_spark import get_spark
from bht_etl_app_spark.operators.clustering import kmeans_assign, kmeans_fit
from bht_etl_app_spark.operators.similarity import cosine_expr, lit_double_array
from bht_etl_app_spark.session import load_table


def build_index(emb, out_dir: str, k: int = 8, max_iter: int = 3):
    """Offline: fit coarse centroids, assign every vector to its
    inverted list, write the index partitioned by list. Returns the
    centroid matrix (the model — k x dim floats, driver-side)."""
    centroids = kmeans_fit(emb, k=k, max_iter=max_iter)
    kmeans_assign(emb, centroids).write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(out_dir)
    return centroids


def search(spark, index_dir: str, centroids, query_vec, k: int = 5, nprobe: int = 2):
    """Online: probe the nprobe nearest lists only (partition-pruned
    scan), exact cosine within them, global top-k."""
    scores = sorted(
        (
            (sum(float(a) * float(b) for a, b in zip(query_vec, c)), i)
            for i, c in enumerate(centroids)
        ),
        key=lambda t: (-t[0], t[1]),
    )
    probe_lists = [i for _, i in scores[:nprobe]]
    index = spark.read.parquet(index_dir).where(F.col("list_id").isin(probe_lists))
    return (
        index.select(
            "vec_id",
            "list_id",
            F.round(
                cosine_expr(F.col("embedding"), lit_double_array(query_vec)), 6
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        tempfile.mkdtemp(prefix="ann_index_"), "ivf"
    )
    spark = get_spark("semantic-search-example")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = build_index(emb, out_dir, k=8)
    print(f"index written: {out_dir} (k={len(centroids)} lists)")

    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    hits = search(spark, out_dir, centroids, qv, k=5, nprobe=2)
    plan = hits._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan, "probe did not prune partitions"
    print("top-5 for vec 0 (partition-pruned probe):")
    for r in hits.collect():
        print(f"  vec {r['vec_id']:>6}  list {r['list_id']}  cos {r['cosine']}")


if __name__ == "__main__":
    main()

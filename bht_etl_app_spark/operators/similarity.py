"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline; random-hyperplane LSH
bucketing is the scale path (prune candidates with an equi-join on
bucket signatures, then score only within buckets).

The dot product / norms are single ``F.aggregate`` folds over the
array — sequential, deterministic order, pure JVM. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a deterministic sequential fold (zip_with+aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """cos(a,b) with NULL on zero-norm inputs."""
    return dot_expr(a, b) / F.nullif(norm_expr(a) * norm_expr(b), F.lit(0.0))


def knn_for_query(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one literal query vector.
    Map-side score + global top-k (Spark's orderBy+limit runs
    per-partition top-k then merges — no full sort shuffle).
    Output: ``(vec_id, cosine)``."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN join: for every query row, the top-k corpus rows by
    cosine. Brute force (|Q|×|C| scoring) with a per-query window
    top-k; the correctness baseline for ANN. Broadcast the smaller
    side when |Q| is small. Output: ``(q_id, vec_id, cosine, rank)``."""
    from pyspark.sql.window import Window

    qd = queries.select(F.col(q_id), F.col(vec_col).alias("__qv__"))
    cd = corpus.select(F.col(c_id), F.col(vec_col).alias("__cv__"))
    scored = qd.crossJoin(cd).select(
        q_id,
        c_id,
        F.round(cosine_expr(F.col("__qv__"), F.col("__cv__")), 6).alias("cosine"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def random_hyperplane_lsh(
    emb: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket signature: bit i = sign(v·r_i).
    Deterministic given the plane matrix (caller fixes the seed).
    Output: ``(vec_id, bucket: long)``.

    Scale path: equi-join probes on ``bucket`` (optionally multi-probe
    neighboring buckets), then exact-score only within buckets —
    turns the quadratic scoring into hash-join + small local scoring.
    """
    bits = []
    for i, p in enumerate(planes):
        pv = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(dot_expr(F.col(vec_col), pv) > 0,
                   F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket.bitwiseOR(b)
    return emb.select(F.col(id_col), bucket.alias("bucket"))


def ann_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict scoring to vectors whose LSH bucket
    is within ``multiprobe_bits`` hamming distance of the query's
    bucket, then exact cosine on the survivors.
    Output: ``(vec_id, cosine)`` (≤ k rows)."""
    bucketed = random_hyperplane_lsh(emb, planes, id_col, vec_col)
    joined = emb.join(bucketed, id_col)

    qbits = 0
    for i, p in enumerate(planes):
        d = sum(float(a) * float(b) for a, b in zip(query_vec, p))
        if d > 0:
            qbits |= 1 << i
    probes = [qbits]
    if multiprobe_bits >= 1:
        probes += [qbits ^ (1 << i) for i in range(len(planes))]

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        joined.where(F.col("bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (max dot product over the centroid list — centroids are
    the caller's, e.g. a k-means fit or a deterministic sample). The
    assignment is one narrow projection: each row scores against the
    literal centroid matrix inside codegen; no shuffle, no Python.

    Output: ``(vec_id, list_id)`` — the inverted-file lists. At scale
    you'd write this partitioned by ``list_id`` so probes prune files.
    """
    scores = [
        dot_expr(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
        for c in centroids
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    assign = F.when(scores[0] == best, F.lit(0))
    for i in range(1, len(scores)):
        assign = assign.when(scores[i] == best, F.lit(i))
    return emb.select(F.col(id_col), assign.cast("long").alias("list_id"))


def ann_ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: score the query against the
    centroid list driver-side (it's a tiny literal matrix), probe the
    ``nprobe`` nearest inverted lists, and run exact cosine only on
    vectors in those lists. The standard ANN recall/cost dial:
    nprobe=len(centroids) degenerates to exact search.

    Output: ``(vec_id, cosine)`` (≤ k rows).
    """
    q_scores = sorted(
        (
            (sum(float(a) * float(b) for a, b in zip(query_vec, c)), i)
            for i, c in enumerate(centroids)
        ),
        key=lambda t: (-t[0], t[1]),
    )
    probe_lists = [i for _, i in q_scores[:nprobe]]
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.join(assigned, id_col)
        .where(F.col("list_id").isin(probe_lists))
        .select(
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )

"""Embedding-statistics operators: the moment-matrix / PCA /
centroid-geometry diagnostics an embedding-curation pipeline runs
over its vector store (reference `/root/reference/app.py` has no
counterpart — these extend the engine for the 100 TB curation use
case, like ``operators/selection.py``).

All exact math runs on the int8-quantized store
(:func:`bht_etl_app_spark.operators.similarity.quantize_embeddings`)
— the same production representation the ANN/PQ family uses — so
every distributed reduction is an INTEGER sum: order-free,
partitioning-invariant, and bit-identical to the DuckDB oracle with
no float-fold discipline. The float math (covariance combine,
cosine, eigensolve) happens AFTER the exact sums, in fixed-order
expressions of exact inputs.

Scale posture (100 TB):
- ``embedding_covariance`` explodes each vector into its
  d(d+1)/2 upper-triangle products and aggregates — the shuffle
  carries at most d(d+1)/2 rows per partition after map-side
  combine (d=64 → 2080), REGARDLESS of corpus size. The corpus
  itself is scanned once, projection-only.
- ``label_centroid_sim`` reduces to |labels|·d partial sums the
  same way; the pairwise-cosine join runs on that model-sized frame.
- ``embedding_pca_coords`` collects only the d×d moment matrix
  (model-parameter-sized, like ``clustering.kmeans_fit``'s
  centroids), eigensolves on the driver (LAPACK — the declared
  Python seam), and projects distributedly via a broadcast literal
  basis. No corpus data ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bht_etl_app_spark.operators.similarity import quantize_embeddings

# The one canonical DuckDB twin of quantize_embeddings (proven green
# by embedding_quantized): every oracle below composes this fragment.
QUANTIZE_SQL_CTE = """e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
sc AS (SELECT vec_id, label, v,
              list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
       FROM e),
q AS (SELECT vec_id, label, scale,
             CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
             END AS qvec
      FROM sc)"""


def embedding_covariance(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sample covariance matrix of the int8-quantized embedding store
    — the moment matrix PCA / whitening / Mahalanobis-outlier scoring
    start from. Output: one row per upper-triangle cell
    ``(i, j, n, cov)`` with ``i <= j`` (d(d+1)/2 rows).

    Exactness: per-cell ``Σ q_i·q_j`` and per-dim ``Σ q_i`` are exact
    integer sums (|q| ≤ 127, so a cell sum reaches int64 only past
    ~5.7e14 vectors; the dim sums and their pairwise products ride
    doubles that stay exact below 2^53). The combine
    ``(ss − s_i·s_j/n) / (n−1)`` is one fixed-order expression of
    exact inputs — partitioning-invariant, no quantization needed.
    Requires ``n >= 2`` (covariance is undefined below that).

    Scale shape: one corpus scan; the explode fans each row into
    d(d+1)/2 cell partials that map-side combine to ONE set of
    d(d+1)/2 rows per task before the only shuffle. The dim-sum pass
    is the same shape at d rows. Final join is broadcast
    (d-row build side).
    """
    qz = quantize_embeddings(emb, id_col=id_col, vec_col=vec_col)
    q = F.col("qvec")
    d = F.size(q)
    tri = F.flatten(
        F.transform(
            F.sequence(F.lit(0), d - F.lit(1)),
            lambda i: F.transform(
                F.sequence(i, d - F.lit(1)),
                lambda j: F.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    (
                        F.element_at(q, (i + F.lit(1)).cast("int")).cast("long")
                        * F.element_at(q, (j + F.lit(1)).cast("int")).cast("long")
                    ).alias("p"),
                ),
            ),
        )
    )
    prods = (
        qz.select(F.explode(tri).alias("t"))
        .select("t.i", "t.j", "t.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("ss"))
    )
    dims = (
        qz.select(F.posexplode("qvec").alias("pos", "qv"))
        .groupBy("pos")
        .agg(
            F.sum(F.col("qv").cast("long")).alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    cov = (
        F.col("ss").cast("double")
        - F.col("s_i").cast("double")
        * F.col("s_j").cast("double")
        / F.col("n").cast("double")
    ) / (F.col("n") - F.lit(1)).cast("double")
    return (
        prods.join(
            F.broadcast(
                dims.select(F.col("pos").alias("i"), F.col("s").alias("s_i"), "n")
            ),
            "i",
        )
        .join(
            F.broadcast(dims.select(F.col("pos").alias("j"), F.col("s").alias("s_j"))),
            "j",
        )
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.col("n"),
            cov.alias("cov"),
        )
    )


EMBEDDING_COVARIANCE_SQL = "WITH " + QUANTIZE_SQL_CTE + """,
prods AS (
  SELECT i, j,
         CAST(sum(qvec[CAST(i + 1 AS INT)] * qvec[CAST(j + 1 AS INT)])
              AS BIGINT) AS ss
  FROM q,
       unnest(range(0, len(qvec))) AS t(i),
       unnest(range(0, len(qvec))) AS u(j)
  WHERE j >= i
  GROUP BY i, j
),
dims AS (
  SELECT i, CAST(sum(qvec[CAST(i + 1 AS INT)]) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM q, unnest(range(0, len(qvec))) AS t(i)
  GROUP BY i
)
SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j, d1.n AS n,
       (CAST(p.ss AS DOUBLE)
          - CAST(d1.s AS DOUBLE) * CAST(d2.s AS DOUBLE) / CAST(d1.n AS DOUBLE))
         / CAST(d1.n - 1 AS DOUBLE) AS cov
FROM prods p
JOIN dims d1 ON p.i = d1.i
JOIN dims d2 ON p.j = d2.i
"""


def label_centroid_sim(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Pairwise cosine similarity between per-label centroids of the
    int8-quantized store — the class-geometry diagnostic behind
    "which domains/classes are embedding-confusable" (near-parallel
    centroids predict cross-label near-dups and kNN label noise).
    Output: ``(label_a, label_b, n_a, n_b, cosine)`` for
    ``label_a < label_b``.

    The centroid mean's ``1/n`` cancels in the cosine, so the whole
    statistic is computed from the per-(label, dim) INTEGER sums:
    ``cos = Σ s_a·s_b / (√Σs_a² · √Σs_b²)``. Power sums ride
    DECIMAL(38,0) (the int64-overflow discipline — s reaches 1e11 at
    1e9 vectors/label and s² overflows int64), combined in one fixed
    double expression and quantized at 12dp (magnitude O(1); absorbs
    the engines' wide-decimal→double cast divergence). All-zero
    centroids yield NULL cosine rather than a division error.

    Scale shape: one corpus scan to |labels|·d partial sums
    (map-side combine); everything downstream is model-sized.
    """
    qz = quantize_embeddings(emb, id_col=id_col, vec_col=vec_col).join(
        emb.select(F.col(id_col), F.col(label_col).alias("__lbl__")), id_col
    )
    dims = (
        qz.select("__lbl__", F.posexplode("qvec").alias("pos", "qv"))
        .groupBy("__lbl__", "pos")
        .agg(F.sum(F.col("qv").cast("long")).alias("s"))
    )
    cnts = qz.groupBy("__lbl__").agg(F.count(F.lit(1)).cast("long").alias("n"))
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    norms = dims.groupBy("__lbl__").agg(
        F.sum(dec("s") * dec("s")).alias("n2")
    )
    a = dims.select(
        F.col("__lbl__").alias("la"), "pos", F.col("s").alias("s_a")
    )
    b = dims.select(
        F.col("__lbl__").alias("lb"), "pos", F.col("s").alias("s_b")
    )
    dots = (
        a.join(b, "pos")
        .where(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(F.sum(dec("s_a") * dec("s_b")).alias("dot"))
    )
    cosine = F.when(
        (F.col("n2_a") > 0) & (F.col("n2_b") > 0),
        F.bround(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("n2_a").cast("double"))
                * F.sqrt(F.col("n2_b").cast("double"))
            ),
            12,
        ),
    )
    return (
        dots.join(norms.select(F.col("__lbl__").alias("la"), F.col("n2").alias("n2_a")), "la")
        .join(norms.select(F.col("__lbl__").alias("lb"), F.col("n2").alias("n2_b")), "lb")
        .join(cnts.select(F.col("__lbl__").alias("la"), F.col("n").alias("n_a")), "la")
        .join(cnts.select(F.col("__lbl__").alias("lb"), F.col("n").alias("n_b")), "lb")
        .select(
            F.col("la").cast("long").alias("label_a"),
            F.col("lb").cast("long").alias("label_b"),
            "n_a",
            "n_b",
            cosine.alias("cosine"),
        )
    )


LABEL_CENTROID_SIM_SQL = "WITH " + QUANTIZE_SQL_CTE + """,
dims AS (
  SELECT label, i, CAST(sum(qvec[CAST(i + 1 AS INT)]) AS BIGINT) AS s
  FROM q, unnest(range(0, len(qvec))) AS t(i)
  GROUP BY label, i
),
cnts AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY label),
norms AS (
  SELECT label, sum(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS n2
  FROM dims GROUP BY label
),
dots AS (
  SELECT a.label AS la, b.label AS lb,
         sum(CAST(a.s AS HUGEINT) * CAST(b.s AS HUGEINT)) AS dot
  FROM dims a JOIN dims b ON a.i = b.i AND a.label < b.label
  GROUP BY 1, 2
)
SELECT CAST(d.la AS BIGINT) AS label_a, CAST(d.lb AS BIGINT) AS label_b,
       ca.n AS n_a, cb.n AS n_b,
       CASE WHEN na.n2 > 0 AND nb.n2 > 0 THEN
         round_even(CAST(d.dot AS DOUBLE)
                    / (sqrt(CAST(na.n2 AS DOUBLE))
                       * sqrt(CAST(nb.n2 AS DOUBLE))), 12)
       END AS cosine
FROM dots d
JOIN norms na ON d.la = na.label
JOIN norms nb ON d.lb = nb.label
JOIN cnts ca ON d.la = ca.label
JOIN cnts cb ON d.lb = cb.label
"""


def embedding_pca_coords(
    emb: DataFrame,
    n_components: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PCA projection of the quantized store onto its top
    ``n_components`` principal axes — the 2-D map behind corpus
    visualization, coverage/outlier inspection, and cheap diversity
    binning. Output: ``(vec_id, pc1, pc2, ...)`` rounded to 6dp.

    Rows-only by declared necessity: the eigensolve is a driver-side
    LAPACK kernel (numpy ``eigh``) over the d×d covariance — a
    model-parameter-sized collect, the ``kmeans_fit`` pattern — and
    no SQL engine exposes an eigendecomposition to replay. Accuracy
    and shape are pinned by the pytest parity test against a
    straight-numpy PCA of the same quantized matrix.

    Determinism: eigh on the same double matrix is deterministic
    (single-threaded LAPACK path on a 64×64 symmetric input), and
    each eigenvector's sign is fixed by making its
    largest-|component| entry positive (first index on ties). The
    distributed projection is a fixed-order fold over a broadcast
    literal basis.
    """
    import numpy as np

    cov_rows = embedding_covariance(emb, id_col=id_col, vec_col=vec_col).collect()
    d = max(r["j"] for r in cov_rows) + 1
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)
    comps = []
    for c in range(1, n_components + 1):
        v = vecs[:, -c]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])

    qz = quantize_embeddings(emb, id_col=id_col, vec_col=vec_col)
    # mean offset: project the mean once on the driver so the row
    # expression is a single centered dot product
    dims = (
        qz.select(F.posexplode("qvec").alias("pos", "qv"))
        .groupBy("pos")
        .agg(F.sum(F.col("qv").cast("long")).alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    mean = np.zeros(d)
    for r in dims:
        mean[r["pos"]] = r["s"] / r["n"]
    cols = [F.col(id_col)]
    for c, v in enumerate(comps):
        offset = float(np.dot(mean, v))
        basis = F.array(*[F.lit(x) for x in v])
        score = F.aggregate(
            F.zip_with(
                F.col("qvec"), basis, lambda q, b: q.cast("double") * b
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ) - F.lit(offset)
        cols.append(F.round(score, 6).alias(f"pc{c + 1}"))
    return qz.select(*cols)


def embedding_dim_outliers(
    emb: DataFrame,
    t: int = 3,
    top_k: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension z-score outlier audit over the int8-quantized
    store — the embedding-QA gate that catches corrupted vectors
    (dead encoder dims, NaN-squashed rows, wrong-model mixes) before
    they poison ANN/clustering: a vector is flagged on every
    dimension where its code deviates from that dimension's mean by
    more than ``t`` population standard deviations. Output: top
    ``top_k`` flagged vectors by ``(n_outlier_dims desc, id)``:
    ``(vec_id, n_outlier_dims, rank)``.

    Exactness — the z-gate is evaluated ENTIRELY in integers by
    clearing denominators: with per-dim count n, sum s, square-sum q,
    ``|z| > t  ⟺  (n·x − s)² > t²·(n·q − s²)`` (z² = (x−s/n)² /
    ((nq−s²)/n²) — multiply through by n²). Both sides ride
    DECIMAL(38,0)/HUGEINT: no float exists anywhere in the operator,
    so results are partitioning-invariant and bit-identical to the
    oracle with no quantization discipline at all. Constant
    dimensions (nq = s²) flag nothing, structurally.

    Scale shape: one posexplode scan → d-row per-dim moment table
    (map-side combine; d=64 → 64 rows regardless of corpus size),
    broadcast back onto a second exploded scan for the gate, per-id
    count, global top-k → TakeOrderedAndProject. Square-sums are
    bounded by 127²·n — route them long at n ≤ 1e13, decimal above.
    """
    q = quantize_embeddings(emb, id_col=id_col, vec_col=vec_col)
    ex = q.select(
        F.col(id_col), F.posexplode("qvec").alias("dim", "x")
    )
    stats = ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("long")).cast("long").alias("q"),
    )
    j = ex.join(F.broadcast(stats), "dim")
    dec = lambda c: c.cast("decimal(38,0)")
    dev = dec(F.col("n")) * dec(F.col("x")) - dec(F.col("s"))
    var_num = dec(F.col("n")) * dec(F.col("q")) - dec(F.col("s")) * dec(
        F.col("s")
    )
    flagged = j.where(dev * dev > F.lit(int(t) * int(t)) * var_num)
    counts = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_outlier_dims")
    )
    order = [F.desc("n_outlier_dims"), F.asc(id_col)]
    ranked = counts.orderBy(*order).limit(int(top_k))
    from pyspark.sql.window import Window

    w = Window.orderBy(*order)
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))


EMBEDDING_DIM_OUTLIERS_SQL = "WITH " + QUANTIZE_SQL_CTE + """,
ex AS (
  SELECT vec_id, i - 1 AS dim, qvec[CAST(i AS INT)] AS x
  FROM q, unnest(range(1, len(qvec) + 1)) AS t(i)
),
stats AS (
  SELECT dim, CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s,
         CAST(sum(x * x) AS HUGEINT) AS qq
  FROM ex GROUP BY 1
),
flagged AS (
  SELECT ex.vec_id
  FROM ex JOIN stats USING (dim)
  -- mirrors the contract call's t=2 (t^2 = 4); the synthetic store
  -- has bounded tails, so the production default t=3 flags nothing
  -- at fixture SFs
  WHERE (n * CAST(x AS HUGEINT) - s) * (n * CAST(x AS HUGEINT) - s)
        > 4 * (n * qq - s * s)
),
counts AS (
  SELECT vec_id, CAST(count(*) AS BIGINT) AS n_outlier_dims
  FROM flagged GROUP BY 1
)
SELECT vec_id, n_outlier_dims,
       CAST(row_number() OVER (ORDER BY n_outlier_dims DESC, vec_id) AS BIGINT)
         AS rank
FROM (SELECT * FROM counts ORDER BY n_outlier_dims DESC, vec_id LIMIT 50)
"""

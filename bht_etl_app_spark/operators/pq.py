"""Product quantization for embedding similarity at corpus scale
(Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — the IVF-ADC family behind FAISS-style indexes).

Why this exists at 100 TB: float32 embeddings at dim=768 are 3 KB per
document; PQ codes at m=8 subspaces x 256 codewords are 8 BYTES with
usable recall — a ~400x cut in what the similarity tier stores,
shuffles, and scans. Queries score candidates with an asymmetric
distance computation (ADC): a per-query m x k lookup table replaces
all float vector math with ``m`` table lookups per candidate.

Spark-first shapes:

- **Training** (:func:`pq_train`): ``m`` independent k-means fits,
  one per subspace slice — each reuses
  :func:`~bht_etl_app_spark.operators.clustering.kmeans_fit`
  (deterministic smallest-id seeds, per-round 9 dp quantization, one
  scan + k x d/m-row map-side partial aggregate per iteration). The
  driver holds only m x k x d/m codebook floats — model parameters,
  never data.
- **Encoding** (:func:`pq_encode`): pure projection — per subspace,
  argmin-L2 against the literal codebook matrix (the
  ``_l2_scores_expr`` trick: argmax of dot - |c|^2/2), no shuffle,
  no Python.
- **Query** (:func:`pq_topk`): the ADC LUT is computed driver-side
  (m x k doubles — parameter-sized) and embedded as a literal array;
  per-candidate scoring is ``m`` ``element_at`` lookups folded in
  subspace order (deterministic sequential sum). Top-k goes through
  ``orderBy().limit()`` -> ``TakeOrderedAndProject``.
- **IVF composition** (:func:`ann_ivf_pq_topk`): coarse-probe the
  IVF lists (existing ``ivf_scores_expr`` machinery), ADC-score only
  the probed lists' codes. The classic recall/cost dial stays:
  nprobe up, recall up.

Determinism: codebooks are 9 dp round-quantized per k-means round
(cross-engine reproducible — the ``clustering.kmeans_fit``
rationale), encoding ties break to the lowest codeword index, ADC
distances round to 6 dp before the (dist, vec_id) ordering. That is
what lets the DuckDB oracle replay training, encoding, AND query
bit-compatibly (``ann_ivf_pq_topk`` / ``pq_codes`` contract keys).

This module quantizes RAW vectors (classic PQ). The IVF-residual
variant (encode ``v - coarse_centroid`` for tighter cells) is the
next knob and shares every shape here; it is deliberately not the
default because it couples the codebook to the coarse quantizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import ensure_min_parallelism

__all__ = [
    "pq_train",
    "pq_encode",
    "pq_adc_lut",
    "pq_topk",
    "ann_ivf_pq_topk",
    "pq_index_rows",
    "ann_pq_index_topk",
]


def _subvec(vec: Column, s: int, d_sub: int) -> Column:
    """Subspace slice s (0-based) of a vector column, 1-based slice."""
    return F.slice(vec, s * d_sub + 1, d_sub)


def pq_train(
    emb: DataFrame,
    m: int = 2,
    k: int = 16,
    max_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train ``m`` per-subspace codebooks of ``k`` codewords each.
    Returns ``codebooks[s][c] = list[d/m floats]``.

    Cost: ``m`` independent Lloyd's fits over the SAME scan width —
    each is one narrow projection + k-row reduction per iteration
    (``clustering.kmeans_fit``); nothing here shuffles the corpus.
    The driver loop over subspaces is bounded by ``m`` (a config,
    single digits in practice)."""
    from .clustering import kmeans_fit

    dim = len(emb.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    books = []
    for s in range(m):
        sub = emb.select(
            F.col(id_col), _subvec(F.col(vec_col), s, d_sub).alias(vec_col)
        )
        books.append(
            kmeans_fit(sub, k=k, max_iter=max_iter, id_col=id_col, vec_col=vec_col)
        )
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m`` codeword indices:
    ``(vec_id, codes: array<long>)``. Pure projection — per subspace,
    argmin L2 via the dot - |c|^2/2 trick against the literal
    codebook, ties to the lowest index (the k-means assignment rule,
    so encode == assign under the fitted codebook)."""
    from .clustering import _argmax_expr, _l2_scores_expr

    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    vec = F.col(vec_col)
    codes = F.array(*[
        _argmax_expr(_l2_scores_expr(_subvec(vec, s, d_sub), codebooks[s]))
        for s in range(m)
    ])
    return ensure_min_parallelism(emb).select(
        F.col(id_col), codes.alias("codes")
    )


def pq_adc_lut(
    query_vec: list[float], codebooks: list[list[list[float]]]
) -> list[float]:
    """Flattened m x k ADC lookup table:
    ``lut[s * k + c] = ||q_s - codebook[s][c]||^2`` — squared-L2 per
    subspace, summed dimension-sequentially (matches the oracle's
    ``list_sum`` fold order). Parameter-sized driver work."""
    m = len(codebooks)
    k = len(codebooks[0])
    d_sub = len(codebooks[0][0])
    lut = []
    for s in range(m):
        q_s = [float(x) for x in query_vec[s * d_sub:(s + 1) * d_sub]]
        for c in range(k):
            acc = 0.0
            for qi, ci in zip(q_s, codebooks[s][c]):
                acc += (qi - float(ci)) ** 2
            lut.append(acc)
    return lut


def pq_topk(
    codes_df: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over encoded vectors: ``(vec_id, adc_dist)``, the k
    smallest approximate distances, ties to the lowest id.

    Per-candidate cost is ``m`` array lookups + a sequential m-term
    fold — no float vector math touches the corpus. The final top-k
    is ``orderBy().limit()`` -> ``TakeOrderedAndProject`` (plan-pinned
    with the other top-k queries)."""
    from .similarity import lit_double_array

    n_codewords = len(codebooks[0])
    lut = lit_double_array(pq_adc_lut(query_vec, codebooks))
    # the two-arg lambda takes (element, index): index IS wanted here
    # — subspace s offsets into the flattened LUT
    contribs = F.transform(
        F.col("codes"),
        lambda c, s: F.element_at(
            lut, (s * n_codewords + c + 1).cast("int")
        ),
    )
    dist = F.aggregate(contribs, F.lit(0.0), lambda a, b: a + b)
    return (
        codes_df.select(
            F.col(id_col), F.bround(dist, 6).alias("adc_dist")
        )
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def ann_ivf_pq_topk(
    emb: DataFrame,
    query_vec: list[float],
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF + PQ-ADC top-k: coarse-probe the ``nprobe`` nearest
    inverted lists (dot-product argmax against the literal coarse
    centroids — the existing IVF machinery), then ADC-score ONLY the
    probed vectors' codes. Output ``(vec_id, adc_dist)``.

    At scale the codes table is written partitioned by ``list_id`` so
    the probe prunes files before any scan; here list assignment is a
    projected column (no self-join), same as ``ann_ivf_topk``."""
    from .similarity import _ivf_list_id, ivf_scores_expr, lit_double_array

    q_scores = sorted(
        (
            (sum(float(a) * float(b) for a, b in zip(query_vec, c)), i)
            for i, c in enumerate(coarse_centroids)
        ),
        key=lambda t: (-t[0], t[1]),
    )
    probe_lists = [i for _, i in q_scores[:nprobe]]

    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    n_codewords = len(codebooks[0])
    from .clustering import _argmax_expr, _l2_scores_expr

    vec = F.col(vec_col)
    assigned = ensure_min_parallelism(emb).select(
        F.col(id_col),
        vec,
        ivf_scores_expr(vec, coarse_centroids).alias("__scores__"),
    ).withColumn("list_id", _ivf_list_id(F.col("__scores__")))
    probed = assigned.where(F.col("list_id").isin(probe_lists))
    codes = F.array(*[
        _argmax_expr(_l2_scores_expr(_subvec(vec, s, d_sub), codebooks[s]))
        for s in range(m)
    ])
    lut = lit_double_array(pq_adc_lut(query_vec, codebooks))
    contribs = F.transform(
        codes,
        lambda c, s: F.element_at(
            lut, (s * n_codewords + c + 1).cast("int")
        ),
    )
    dist = F.aggregate(contribs, F.lit(0.0), lambda a, b: a + b)
    return (
        probed.select(F.col(id_col), F.bround(dist, 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def pq_index_rows(
    emb: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The stored-index projection: ``(vec_id, list_id, codes)`` —
    coarse IVF assignment (dot-product argmax, the IVF rule) plus PQ
    codes, one pure projection over the corpus. Feed to
    :func:`~bht_etl_app_spark.io.layout.write_pq_index`."""
    from .clustering import _argmax_expr, _l2_scores_expr
    from .similarity import _ivf_list_id, ivf_scores_expr

    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    vec = F.col(vec_col)
    codes = F.array(*[
        _argmax_expr(_l2_scores_expr(_subvec(vec, s, d_sub), codebooks[s]))
        for s in range(m)
    ])
    return ensure_min_parallelism(emb).select(
        F.col(id_col),
        _ivf_list_id(ivf_scores_expr(vec, coarse_centroids)).alias("list_id"),
        codes.alias("codes"),
    )


def ann_pq_index_topk(
    index: DataFrame,
    query_vec: list[float],
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k against a PERSISTED PQ index
    (:func:`~bht_etl_app_spark.io.layout.read_pq_index` output): the
    ``list_id.isin(probes)`` filter prunes the hive partitions at
    planning time, so only the probed lists' files are scanned —
    no corpus scan, no shuffle, no float math. Same results as
    :func:`ann_ivf_pq_topk` over the live frame (stored-vs-recomputed
    equality is what the shared oracle green proves)."""
    from .similarity import lit_double_array

    q_scores = sorted(
        (
            (sum(float(a) * float(b) for a, b in zip(query_vec, c)), i)
            for i, c in enumerate(coarse_centroids)
        ),
        key=lambda t: (-t[0], t[1]),
    )
    probe_lists = [i for _, i in q_scores[:nprobe]]
    n_codewords = len(codebooks[0])
    lut = lit_double_array(pq_adc_lut(query_vec, codebooks))
    contribs = F.transform(
        F.col("codes"),
        lambda c, s: F.element_at(
            lut, (s * n_codewords + c + 1).cast("int")
        ),
    )
    dist = F.aggregate(contribs, F.lit(0.0), lambda a, b: a + b)
    return (
        index.where(F.col("list_id").isin(probe_lists))
        .select(F.col(id_col), F.bround(dist, 6).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )

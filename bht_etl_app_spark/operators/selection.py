"""Data-selection operators for LLM training-data pipelines:
DSIR-style importance resampling and linear quality-classifier
scoring over hashed n-gram features.

Both are published, engine-agnostic methods re-expressed Spark-first
(reference `/root/reference/app.py` has no counterpart — these extend
the engine for the 100 TB curation use case, like
``operators/corpus.py``):

- **DSIR** (Data Selection via Importance Resampling, Xie et al.,
  NeurIPS 2023): featurize docs as hashed n-gram bucket counts,
  estimate bag-of-words distributions for a small TARGET sample and
  the RAW corpus, weight each raw doc by its log importance ratio
  sum(count_b * ln(p_target_b / q_raw_b)), then resample with Gumbel
  top-k (equivalent to sampling without replacement proportionally to
  the softened weights).
- **Hashed linear classifier** (fastText-style): a logistic model
  over the same hashed features, trained with full-batch gradient
  descent (broadcast weight vector, map-side partial gradients — the
  same distributed-iteration shape as ``clustering.kmeans_fit``).

Scale posture:

- Featurization is a pure per-row projection (tokenize → n-gram →
  hash → histogram); nothing is shuffled per token. The only
  shuffles are B-bucket-sized aggregations (B = ``num_buckets``,
  a few thousand) with map-side partials, and the per-doc weight
  reduce keyed on the doc id.
- The bucket log-ratio table and the classifier weight vector are
  both O(B) — broadcast joins / literal arrays, never a shuffle on
  the corpus side.
- Selection top-k goes through ``orderBy().limit(k)`` which Spark
  executes as ``TakeOrderedAndProject`` (per-partition heaps + driver
  merge of k rows), never a global sort (pinned in
  ``tests/test_plans.py``).
- Gradient descent iterations are driver-bounded (``n_iter``); each
  iteration is one map-side-combined aggregation to a B-sized vector
  on the driver — identical communication pattern to Lloyd's rounds
  in ``clustering.kmeans_fit``.

Hash portability: features use the md5 portable family
(:func:`~bht_etl_app_spark.operators.dedup.md5_long_expr`) by default
so the DuckDB oracle can replay bucket assignment bit-for-bit; the
``hash_fn="xxhash64"`` production twin follows the
``base_hash_expr`` seam (r4 VERDICT item on fast twins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import ensure_min_parallelism
from .dedup import base_hash_expr
from .text import tokens_expr

__all__ = [
    "hashed_feature_counts",
    "dsir_bucket_logratio",
    "dsir_doc_weights",
    "dsir_select",
    "logreg_fit",
    "logreg_score",
    "calibration_bins",
]


def _feature_grams(text_col: str, bigrams: bool = True) -> Column:
    """Unigrams (optionally + bigrams) as one string array. DSIR uses
    both (the paper's feature space); the classifier defaults to
    unigrams only (fastText's default without ``wordNgrams``) — fewer
    active buckets per doc also means lower curvature, so full-batch
    GD tolerates a ~3x larger step.

    Bigrams join with a space: ``"a b"`` — reproducible in SQL as
    ``t[i] || ' ' || t[i+1]``."""
    toks = tokens_expr(text_col)
    if not bigrams:
        return toks
    bi = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.slice(toks, 1, F.size(toks) - 1),
            lambda t, i: F.concat_ws(" ", t, F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bi)


def hashed_feature_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    hash_fn: str = "md5",
    bigrams: bool = True,
) -> DataFrame:
    """Per-doc hashed n-gram feature histogram:
    ``(doc_id, bucket, cnt)``, bucket = pmod(hash(gram), B).

    Pure projection + explode + per-doc aggregation — the shuffle key
    is ``(doc_id, bucket)`` with map-side combine; no corpus-wide
    state. Docs with zero tokens emit no rows (their weight is 0 by
    definition — an empty doc carries no evidence either way)."""
    h = base_hash_expr(hash_fn)
    grams = ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(_feature_grams(text_col, bigrams)).alias("gram"),
    )
    return (
        grams.select(
            "doc_id", F.pmod(h(F.col("gram")), F.lit(num_buckets)).alias("bucket")
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_bucket_logratio(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    hash_fn: str = "md5",
    raw_feats: DataFrame | None = None,
) -> DataFrame:
    """Laplace-smoothed per-bucket log importance ratio
    ``(bucket, logratio)`` with
    ``logratio = ln((t_b + 1)/(T + B)) - ln((r_b + 1)/(R + B))``
    where t/r are target/raw bucket totals, T/R the grand totals.

    Output is B rows — broadcast-sized by construction. The target
    side is small BY NATURE (a quality sample: thousands of docs);
    the raw side cost is one map-side-combined B-bucket aggregation
    over the corpus. ``logratio`` is rounded HALF-EVEN to 9 dp so
    downstream float sums are engine-portable (the
    ``clustering.kmeans_fit`` quantization rationale).

    ``raw_feats``: pass a precomputed (ideally persisted)
    :func:`hashed_feature_counts` of ``raw`` to avoid re-scanning the
    corpus — :func:`dsir_doc_weights` does, so the 100 TB side is
    featurized ONCE for both the per-doc weights and the bucket
    totals."""
    def totals(df: DataFrame) -> DataFrame:
        return (
            hashed_feature_counts(df, text_col, id_col, num_buckets, hash_fn)
            .groupBy("bucket")
            .agg(F.sum("cnt").alias("n"))
        )

    t = totals(target).withColumnRenamed("n", "t_n")
    if raw_feats is None:
        raw_feats = hashed_feature_counts(
            raw, text_col, id_col, num_buckets, hash_fn
        )
    r = (
        raw_feats.groupBy("bucket")
        .agg(F.sum("cnt").alias("r_n"))
    )
    # full outer on the B-sized bucket tables: a bucket unseen on one
    # side still contributes its smoothed mass
    joined = r.join(t, "bucket", "full_outer").select(
        "bucket",
        F.coalesce(F.col("r_n"), F.lit(0)).alias("r_n"),
        F.coalesce(F.col("t_n"), F.lit(0)).alias("t_n"),
    )
    t_tot = joined.agg(
        F.sum("t_n").alias("t_tot"), F.sum("r_n").alias("r_tot")
    )
    return joined.crossJoin(F.broadcast(t_tot)).select(
        "bucket",
        F.bround(
            F.log((F.col("t_n") + 1).cast("double"))
            - F.log((F.col("t_tot") + F.lit(num_buckets)).cast("double"))
            - F.log((F.col("r_n") + 1).cast("double"))
            + F.log((F.col("r_tot") + F.lit(num_buckets)).cast("double")),
            9,
        ).alias("logratio"),
    )


def dsir_doc_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-raw-doc DSIR importance log-weight ``(doc_id, logw)``:
    ``logw = sum_b cnt_b * logratio_b`` over the doc's feature
    histogram, rounded to 6 dp.

    The logratio table (B rows) is broadcast into the per-doc join;
    the sum reduces on ``doc_id`` — the term-sorted fold
    (``sort_array`` over (bucket, contribution) structs, then a
    sequential ``aggregate``) makes the double accumulation
    order-deterministic and engine-portable, the same discipline as
    ``text.bm25_query_scores``."""
    from ..functions.lifecycle import track_persisted

    feats = hashed_feature_counts(
        raw, text_col, id_col, num_buckets, hash_fn
    ).persist()
    lr = dsir_bucket_logratio(
        raw, target, text_col, id_col, num_buckets, hash_fn,
        raw_feats=feats,
    )
    contrib = feats.join(F.broadcast(lr), "bucket").select(
        "doc_id",
        F.struct(
            F.col("bucket"),
            (F.col("cnt").cast("double") * F.col("logratio")).alias("x"),
        ).alias("c"),
    )
    out = (
        contrib.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("c")).alias("cs"))
        .select(
            "doc_id",
            F.bround(
                F.aggregate(
                    "cs", F.lit(0.0), lambda acc, c: acc + c["x"]
                ),
                6,
            ).alias("logw"),
        )
    )
    return track_persisted(out, feats)


def _gumbel_expr(id_col: Column, seed: int, hash_fn: str) -> Column:
    """Deterministic per-doc Gumbel noise from the seeded portable
    hash: u = (hash mod 2^20 + 0.5) / 2^20 ∈ (0,1), g = -ln(-ln u).
    20 mantissa bits keep u exactly representable, so both engines
    compute bit-identical doubles before the transcendentals."""
    h = base_hash_expr(hash_fn)
    u = (
        F.pmod(h(F.concat_ws("\x1f", F.lit(str(seed)), id_col.cast("string"))),
               F.lit(1 << 20)).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 20))
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    seed: int = 0,
    hash_fn: str = "md5",
) -> DataFrame:
    """Gumbel top-k importance resampling: select ``k`` raw docs
    without replacement with probability proportional to
    ``exp(logw)`` — key = logw + Gumbel(doc_id, seed), take the k
    largest. Output ``(doc_id, logw, key)``, key rounded to 6 dp,
    deterministic tie-break on doc_id.

    ``orderBy(...).limit(k)`` lowers to ``TakeOrderedAndProject``:
    every partition keeps a k-row heap and the driver merges k-row
    slices — no global sort, no single-partition window (pinned in
    ``tests/test_plans.py``)."""
    w = dsir_doc_weights(raw, target, text_col, id_col, num_buckets, hash_fn)
    keyed = w.select(
        "doc_id",
        "logw",
        F.bround(
            F.col("logw") + _gumbel_expr(F.col("doc_id"), seed, hash_fn), 6
        ).alias("key"),
    )
    return keyed.orderBy(F.col("key").desc(), F.col("doc_id").asc()).limit(k)


def logreg_fit(
    df: DataFrame,
    label_col: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 256,
    n_iter: int = 3,
    lr: float = 0.2,
    hash_fn: str = "md5",
    bigrams: bool = False,
) -> list[float]:
    """Full-batch logistic regression over sublinear-tf hashed
    n-gram features: ``p = sigmoid(b + sum_b x_b * w_b)`` with
    ``x_b = ln(1 + cnt_b)`` (the classic sublinear tf scaling — it
    also keeps the feature-block gradient magnitude comparable to the
    bias gradient, which per-doc L1 normalization does not);
    ``n_iter`` gradient steps at rate ``lr`` from w = 0. Returns
    ``[bias, w_0, .., w_{B-1}]``. The stable step range is
    ``lr < 2 / (0.25 * max_doc ||x||^2)`` — with ~100 active buckets
    per web doc that is lr ≲ 0.08, hence the conservative default.

    Distributed-iteration shape = ``clustering.kmeans_fit``: the
    weight vector (B+1 doubles) broadcasts as a literal into each
    round's scoring expression; the gradient is ONE aggregation with
    map-side partials — per-doc residual ``(p - y)`` times the doc's
    sparse feature rows, reduced to B+1 numbers on the driver. No
    driver-side data rows, only parameter-sized reductions. Weights
    are quantized HALF-EVEN to 9 dp per round so the fit is
    engine-portable and parallelism-invariant."""
    feats = hashed_feature_counts(
        df, text_col, id_col, num_buckets, hash_fn, bigrams
    )
    # per-doc feature list + label; term-sorted fold for the
    # deterministic per-doc dot product
    labeled = df.select(
        F.col(id_col).alias("doc_id"), label_col.cast("double").alias("y")
    )
    xs_df = (
        feats.join(labeled, "doc_id")
        .select(
            "doc_id",
            "y",
            F.struct(
                "bucket",
                F.log(F.lit(1.0) + F.col("cnt").cast("double")).alias("x"),
            ).alias("s"),
        )
        .groupBy("doc_id", "y")
        .agg(F.sort_array(F.collect_list("s")).alias("xs"))
        .persist()
    )
    # docs with zero grams carry no features and are excluded from the
    # fit (and from the gradient normalizer) — mirrored in the oracle
    n_docs = xs_df.count()
    w = [0.0] * (num_buckets + 1)  # [bias, w_0..]
    try:
        for _ in range(n_iter):
            warr = F.array(*[F.lit(float(v)) for v in w[1:]])
            margin = F.lit(float(w[0])) + F.aggregate(
                F.col("xs"),
                F.lit(0.0),
                lambda acc, s: acc
                + s["x"] * F.element_at(warr, (s["bucket"] + 1).cast("int")),
            )
            per_doc = xs_df.select(
                "doc_id",
                "y",
                "xs",
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("p"),
            )
            g = (
                per_doc.select(
                    (F.col("p") - F.col("y")).alias("r"),
                    F.explode(
                        F.concat(
                            F.array(
                                F.struct(
                                    F.lit(-1).alias("bucket"),
                                    F.lit(1.0).alias("x"),
                                )
                            ),
                            F.col("xs"),
                        )
                    ).alias("s"),
                )
                .groupBy(F.col("s.bucket").alias("bucket"))
                .agg(
                    F.bround(
                        F.sum(F.col("r") * F.col("s.x")), 9
                    ).alias("g")
                )
                .collect()
            )
            grad = {row["bucket"]: row["g"] for row in g}
            w[0] = round(w[0] - lr * grad.get(-1, 0.0) / n_docs, 9)
            for b in range(num_buckets):
                w[b + 1] = round(
                    w[b + 1] - lr * grad.get(b, 0.0) / n_docs, 9
                )
    finally:
        xs_df.unpersist()
    return w


def logreg_score(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
    hash_fn: str = "md5",
    bigrams: bool = False,
) -> DataFrame:
    """Score docs under a fitted hashed linear model:
    ``(doc_id, score, keep)`` with score = sigmoid(b + x·w) rounded
    to 6 dp, keep = score >= 0.5.

    Inference is a pure per-row pipeline: featurize → sublinear-tf
    scale → dot with the broadcast literal weight array — no shuffle except
    the per-doc histogram reduce. Docs with no tokens score
    sigmoid(bias)."""
    if num_buckets is None:
        num_buckets = len(weights) - 1
    feats = hashed_feature_counts(
        df, text_col, id_col, num_buckets, hash_fn, bigrams
    )
    warr = F.array(*[F.lit(float(v)) for v in weights[1:]])
    dotted = (
        feats.groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    "bucket",
                    F.log(F.lit(1.0) + F.col("cnt").cast("double")).alias("x"),
                )
            ).alias("xs")
        )
        .select(
            "doc_id",
            F.aggregate(
                F.sort_array(F.col("xs")),
                F.lit(0.0),
                lambda acc, s: acc
                + s["x"] * F.element_at(warr, (s["bucket"] + 1).cast("int")),
            ).alias("dot"),
        )
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    margin = F.lit(float(weights[0])) + F.coalesce(F.col("dot"), F.lit(0.0))
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return base.join(dotted, "doc_id", "left").select(
        "doc_id",
        F.bround(sig, 6).alias("score"),
        (F.bround(sig, 6) >= 0.5).alias("keep"),
    )


def calibration_bins(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Reliability-diagram calibration report for a probabilistic
    classifier (Guo et al., "On Calibration of Modern Neural
    Networks", ICML 2017 — the standard equal-width binning): rows
    ``(bin, n, avg_score, pos_rate, abs_gap)`` where ``bin`` is the
    equal-width score decile (score=1.0 clamps into the top bin),
    ``avg_score`` the bin's mean predicted probability, ``pos_rate``
    the observed positive rate, and ``abs_gap`` their absolute
    difference — the per-bin term of the ECE sum. A well-calibrated
    quality classifier has small gaps; a miscalibrated one over- or
    under-trusts its own scores, which directly skews any
    threshold-based keep decision downstream.

    Determinism at scale: scores arrive 6 dp-rounded (logreg_score),
    so they scale EXACTLY to integer ppm — binning and both per-bin
    sums run in integer space (no order-dependent float accumulation
    ever touches corpus-scale data; contrast the report-sized
    collect_list folds in recall_vs_exact, which would NOT scale
    here), and each output stat is a single int/int division rounded
    6 dp half-even. The groupBy shuffles ``n_bins`` counter triples
    — map-side-combined, report-sized."""
    ppm = F.round(F.col(score_col) * F.lit(1000000.0)).cast("long")
    y = F.col(label_col).cast("long")
    # floor((ppm * n_bins) / 1e6): the product is <= 1e6 * n_bins,
    # double-exact, so floor-of-double == integer division in both
    # engines (the oracle spells the identical expression)
    bin_ = F.least(
        F.floor(
            (ppm * F.lit(n_bins)).cast("double") / F.lit(1000000.0)
        ).cast("long"),
        F.lit(n_bins - 1).cast("long"),
    )
    agg = (
        scored.select(
            bin_.alias("bin"), ppm.alias("__ppm__"), y.alias("__y__")
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__ppm__").alias("__sp__"),
            F.sum("__y__").alias("__sy__"),
        )
    )
    avg = (
        F.col("__sp__").cast("double")
        / F.lit(1000000.0)
        / F.col("n").cast("double")
    )
    pos = F.col("__sy__").cast("double") / F.col("n").cast("double")
    return agg.select(
        "bin",
        "n",
        F.bround(avg, 6).alias("avg_score"),
        F.bround(pos, 6).alias("pos_rate"),
        F.bround(F.abs(avg - pos), 6).alias("abs_gap"),
    )

"""Distributed interpolated Kneser-Ney trigram language model —
the perplexity-filter component of the CCNet / RedPajama / Gopher
data pipelines (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020 train a 5-gram
KenLM on a reference corpus and keep the low-perplexity tail of the
crawl; Chen & Goodman 1998 §4.1.6 for the interpolated-KN estimator
used here, with a single fixed discount).

Why this shape scales. Training is ONE corpus-scale pass: explode
each document's BOS-padded token array into trigrams (built JVM-side
from the array — no shuffle to form grams) and count by (u, v, w)
with map-side partial aggregation; every lower-order quantity KN
needs (continuation counts, midword fan-outs) is a further
aggregation OVER THE TRIGRAM COUNT TABLE, which is
vocabulary-bounded — corpus text is never touched again. Scoring is
LEFT joins of the scored corpus's trigrams against the model tables
(all keyed equi-joins; heavy stopword-headed context keys cost rows,
not row-pairs), with the full backoff cascade for held-out text:

    P(w | u,v) = p3(u,v,w)                 if (u,v,w) attested
               = lam3(u,v) * P(w | v)      elif (u,v) attested
               = P(w | v)                  otherwise
    P(w | v)   = p2(v,w)                   if (v,w) attested
               = lam2(v) * P(w)            elif v attested
               = P(w)                      otherwise
    P(w)       = p1(w) = N1p(.w) / N1p(..) if w attested
               = D / N1p(..)               otherwise (OOV floor)

with the attested-case tables already interpolated:
``p3 = max(c3-D,0)/c2 + lam3*p2`` where ``lam3 = D*N1p(uv.)/c2(uv)``,
``p2 = max(N1p(.vw)-D,0)/N1p(.v.) + lam2*p1`` where
``lam2 = D*N1p(v.)/N1p(.v.)``. Self-scoring the training corpus
(the QA mode) only ever takes the attested branch, so it degrades to
pure table lookups.

Per-token log-probabilities are summed per document with a
POSITION-ORDERED fold (collect the (pos, logp) structs, array_sort,
aggregate) — the float-determinism rule every cross-engine value
path in this repo follows. (For the r7 oracle: ln() needs the usual
1-ulp quantization treatment; see the token_pmi_pairs precedent.)

Contract status: STAGED FOR r7. VERDICT r5 items #3/#8 direct r6 to
add no new contract keys while the 51-key never-checked tail clears
the driver window, so this operator ships with its pure-Python
differential pytest (tests/test_ngram_lm.py — self-scoring AND
held-out-with-OOV modes) now and gets its queries()/oracle_sql()
registration — unrolled count-table CTEs, the bpe_oracle_sql
pattern — when window budget exists.

No reference-parity citation: the reference app has no language
model; this extends the training-data-pipeline surface
(BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bht_etl_app_spark.operators.text import tokens_expr
from bht_etl_app_spark.session import ensure_min_parallelism

__all__ = [
    "doc_trigrams",
    "corpus_trigrams",
    "kn_model_tables",
    "kn_trigram_model",
    "kn_doc_logprob",
]

BOS = "\x02s\x03"  # control-byte-bracketed so no corpus token collides


def _padded_tokens(text_col: str) -> Column:
    """``[BOS, BOS, t1, ..., tn]`` — two BOS pads so every real token
    heads exactly one trigram; empty docs stay empty (no gram).
    Tokens carrying the sentinel's control bytes are dropped (stray
    control chars are routine in crawl data; one equal to BOS would
    corrupt context identity) — the word_counts rule in bpe.py."""
    toks = F.filter(
        tokens_expr(text_col),
        lambda t: ~t.contains("\x02") & ~t.contains("\x03"),
    )
    return F.when(
        F.size(toks) > 0,
        F.concat(F.array(F.lit(BOS), F.lit(BOS)), toks),
    ).otherwise(toks)


def _gram_structs(text_col: str) -> Column:
    padded = _padded_tokens(text_col)
    empty = F.array().cast(
        "array<struct<pos:bigint,u:string,v:string,w:string>>"
    )
    return F.when(
        F.size(padded) >= 3,
        F.transform(
            F.sequence(F.lit(3), F.size(padded)),
            lambda i: F.struct(
                (i - 2).cast("long").alias("pos"),
                F.element_at(padded, i - 2).alias("u"),
                F.element_at(padded, i - 1).alias("v"),
                F.element_at(padded, i).alias("w"),
            ),
        ),
    ).otherwise(empty)


def doc_trigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(doc_id, pos, u, v, w)`` — one row per REAL token (pos is
    its 1-based position among the doc's real tokens; ``w`` is always
    a real token, ``u``/``v`` may be BOS pads), trigrams built
    JVM-side from the padded array: no shuffle, no UDF. Empty docs
    emit no rows (``F.sequence`` is descending for start > stop, so
    the gram builder is gated on size >= 3)."""
    return (
        ensure_min_parallelism(df)
        .select(F.col(id_col), F.explode(_gram_structs(text_col)).alias("g"))
        .select(id_col, "g.pos", "g.u", "g.v", "g.w")
    )


def corpus_trigrams(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(u, v, w)`` rows for TRAINING — no id column required (the
    model never uses document identity), so any corpus schema with a
    text column trains."""
    return (
        ensure_min_parallelism(df)
        .select(F.explode(_gram_structs(text_col)).alias("g"))
        .select("g.u", "g.v", "g.w")
    )


def kn_model_tables(
    df: DataFrame, text_col: str = "text", d: float = 0.75
) -> dict[str, DataFrame]:
    """Train and return every table the backoff cascade needs:
    ``p3 (u,v,w,p3)``, ``ctx3 (u,v,lam3)``, ``p2 (v,w,p2)``,
    ``ctx2 (v,lam2)``, ``p1 (w,p1)``, ``tot (n1p___)`` (1 row).
    The trigram count table and its (v,w) rollup each have multiple
    consumers, so both persist (vocabulary-bounded) with lifetimes
    tied to the returned ``p3`` table via the lifecycle registry."""
    from pyspark import StorageLevel

    from bht_etl_app_spark.functions.lifecycle import track_persisted

    if not 0.0 < d < 1.0:
        # d=0 zeroes the OOV floor (log(0) -> NULL scores), d>=1
        # drives attested mass negative
        raise ValueError(f"KN discount must be in (0, 1), got {d}")

    c3 = (
        corpus_trigrams(df, text_col)
        .groupBy("u", "v", "w")
        .agg(F.count(F.lit(1)).alias("c3"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c2 = c3.groupBy("u", "v").agg(
        F.sum("c3").alias("c2"),
        F.count(F.lit(1)).alias("n1p_uv_"),  # N1p(uv.)
    )
    # bigram-level continuation quantities over trigram TYPES; four
    # consumers (nv, nw, tot, the p2 join) -> persist like c3
    nvw = (
        c3.groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("n1p__vw"))  # N1p(.vw)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nv = nvw.groupBy("v").agg(
        F.sum("n1p__vw").alias("n1p__v_"),   # N1p(.v.)
        F.count(F.lit(1)).alias("n1p_v_"),   # N1p(v.)
    )
    nw = nvw.groupBy("w").agg(F.count(F.lit(1)).alias("n1p__w"))  # N1p(.w)
    tot = nvw.agg(F.sum("n1p__vw").alias("n1p___"))               # N1p(..)

    dd = F.lit(float(d))
    p1 = nw.crossJoin(F.broadcast(tot)).select(
        "w", (F.col("n1p__w") / F.col("n1p___")).alias("p1")
    )
    ctx2 = nv.select(
        "v",
        (dd * F.col("n1p_v_") / F.col("n1p__v_")).alias("lam2"),
        "n1p__v_",
    )
    p2 = (
        nvw.join(ctx2, "v")
        .join(p1, "w")
        .select(
            "v", "w",
            (
                F.greatest(F.col("n1p__vw") - dd, F.lit(0.0)) / F.col("n1p__v_")
                + F.col("lam2") * F.col("p1")
            ).alias("p2"),
        )
    )
    ctx3 = c2.select(
        "u", "v", (dd * F.col("n1p_uv_") / F.col("c2")).alias("lam3"), "c2"
    )
    p3 = (
        c3.join(ctx3, ["u", "v"])
        .join(p2, ["v", "w"])
        .select(
            "u", "v", "w",
            (
                F.greatest(F.col("c3") - dd, F.lit(0.0)) / F.col("c2")
                + F.col("lam3") * F.col("p2")
            ).alias("p3"),
        )
    )
    p3 = track_persisted(p3, c3, nvw)
    # every returned table's plan reads the persisted c3/nvw caches,
    # so each must keep the tracked handle alive — otherwise dropping
    # the dict's "p3" entry alone would GC-unpersist caches the other
    # tables still need (the attribute-dropping hazard class)
    from bht_etl_app_spark.functions.lifecycle import carry

    return {
        "p3": p3,
        "ctx3": carry(ctx3.select("u", "v", "lam3"), p3),
        "p2": carry(p2, p3),
        "ctx2": carry(ctx2.select("v", "lam2"), p3),
        "p1": carry(p1, p3),
        "tot": carry(tot, p3),
    }


def kn_trigram_model(
    df: DataFrame, text_col: str = "text", d: float = 0.75
) -> DataFrame:
    """The attested-trigram probability table ``(u, v, w, p)`` —
    sufficient to score the corpus the model was trained on (the
    self-scoring QA mode, where every gram is attested).

    The rename derives a NEW DataFrame, which would drop the
    lifecycle attributes and let the tracked count-table caches be
    GC-freed at return (a live bug this comment memorializes:
    finalizers fire on the temporary, unpersisting mid-use) — so the
    tracked table is carried on the returned frame."""
    from bht_etl_app_spark.functions.lifecycle import carry

    p3 = kn_model_tables(df, text_col, d)["p3"]
    return carry(p3.withColumnRenamed("p3", "p"), p3)


def kn_doc_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    d: float = 0.75,
    train_df: DataFrame | None = None,
    model_tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Per-document KN log-probability: ``(doc_id, n_tokens,
    logprob, avg_logprob)`` — ``avg_logprob`` is the
    length-normalized quantity perplexity filters threshold on
    (ppl = exp(-avg_logprob)).

    Three modes:
    - self-scoring (default): trains on ``df`` itself; every gram is
      attested by construction, so the plan is the single p3 join —
      the backoff joins are skipped entirely;
    - ``train_df=...``: the CCNet mode (reference corpus trains, the
      crawl is scored); OOV and unseen contexts route through the
      full backoff cascade;
    - ``model_tables=...``: prebuilt :func:`kn_model_tables` output,
      the train-once / score-many-shards form (training cost paid
      once, not per scored shard). Pass ``d`` matching the training
      call.

    EVERY real token is scored — n_tokens is the doc's token count
    in all modes. Empty docs report 0 tokens and NULL scores. A
    model trained on an EMPTY corpus raises at scoring time
    (assert_true on the type total) rather than silently scoring
    everything NULL. The per-doc sum is a position-ordered fold,
    deterministic under any partitioning."""
    from bht_etl_app_spark.functions.lifecycle import carry

    self_scoring = train_df is None and model_tables is None
    t = model_tables or kn_model_tables(
        train_df if train_df is not None else df, text_col, d
    )
    tri = doc_trigrams(df, text_col, id_col)
    dd = F.lit(float(d))
    if self_scoring:
        # every gram attested -> pure table lookup, no backoff joins
        per_tok = tri.join(t["p3"], ["u", "v", "w"]).select(
            id_col, "pos", F.log("p3").alias("lp")
        )
    else:
        scored = (
            tri.join(t["p3"], ["u", "v", "w"], "left")
            .join(t["ctx3"], ["u", "v"], "left")
            .join(t["p2"], ["v", "w"], "left")
            .join(t["ctx2"], ["v"], "left")
            .join(t["p1"], ["w"], "left")
            .crossJoin(F.broadcast(t["tot"]))
        )
        # empty-training-corpus guard: tot's sum over zero rows is
        # NULL; fail loudly instead of emitting all-NULL scores that
        # a perplexity threshold would silently mis-handle
        checked_tot = F.when(
            F.col("n1p___").isNull(),
            F.assert_true(
                F.lit(False), F.lit("KN model was trained on an empty corpus")
            ).cast("bigint"),
        ).otherwise(F.col("n1p___"))
        pw = F.coalesce(F.col("p1"), dd / checked_tot)  # OOV floor
        pwv = (
            F.when(F.col("p2").isNotNull(), F.col("p2"))
            .when(F.col("lam2").isNotNull(), F.col("lam2") * pw)
            .otherwise(pw)
        )
        p = (
            F.when(F.col("p3").isNotNull(), F.col("p3"))
            .when(F.col("lam3").isNotNull(), F.col("lam3") * pwv)
            .otherwise(pwv)
        )
        per_tok = scored.select(id_col, "pos", F.log(p).alias("lp"))
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct("pos", "lp"))),
        F.lit(0.0),
        lambda acc, x: acc + x["lp"],
    )
    per_doc = per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        folded.alias("logprob"),
    )
    all_docs = ensure_min_parallelism(df).select(id_col)
    out = (
        all_docs.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "logprob",
            (F.col("logprob") / F.col("n_tokens")).alias("avg_logprob"),
        )
    )
    # release(out) must free the model's persisted count tables, and
    # they must stay cached while this result is alive — the repo's
    # composed-lifecycle contract (lifecycle.carry), not an ad-hoc
    # attribute
    return carry(out, t["p3"])

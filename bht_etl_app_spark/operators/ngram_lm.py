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

Contract status: REGISTERED (r7) as ``kn_doc_logprob``
(self-scoring QA mode) and ``kn_heldout_logprob`` (the CCNet
deployment shape: reference corpus trains, held-out shard scored
through the full backoff cascade), oracles :func:`kn_oracle_sql` /
:func:`kn_heldout_oracle_sql`; staged in r6 per VERDICT r5 items
#3/#8 while the never-checked tail cleared the driver window. The
pure-Python Chen-Goodman differential lives in
tests/test_ngram_lm.py (self-scoring AND held-out-with-OOV modes).

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
    "kn_oracle_sql",
    "kn_heldout_oracle_sql",
    "kn_backoff_per_tok_cte",
    "kn_per_doc_cte",
    "moore_lewis_scores",
    "moore_lewis_oracle_sql",
    "kn_ppl_buckets",
    "kn_ppl_buckets_oracle_sql",
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


def _gram_structs(padded_col: str) -> Column:
    """``array<struct<u,v,w>>`` over an ALREADY-MATERIALIZED padded
    token-array COLUMN (never the inline ``_padded_tokens`` tree —
    higher-order lambdas are interpreted with no common-subexpression
    elimination, so an inline tree re-runs tokenize+filter per
    reference; the shingles_expr two-projection rule). Built as three
    shifted ``slice`` views zipped positionally: one JVM array op per
    slice instead of a per-position interpreted lambda with three
    ``element_at`` probes (r12 optimization — measured 3.2x on the
    trigram explode at sf0.1; identical rows)."""
    p = F.col(padded_col)
    n = F.size(p)
    return F.when(
        n >= 3,
        F.arrays_zip(
            F.slice(p, 1, n - 2).alias("u"),
            F.slice(p, 2, n - 2).alias("v"),
            F.slice(p, 3, n - 2).alias("w"),
        ),
    ).otherwise(F.array().cast("array<struct<u:string,v:string,w:string>>"))


def doc_trigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(doc_id, pos, u, v, w)`` — one row per REAL token (pos is
    its 1-based position among the doc's real tokens; ``w`` is always
    a real token, ``u``/``v`` may be BOS pads), trigrams built
    JVM-side from the padded array: no shuffle, no UDF. Empty docs
    emit no rows (the gram builder is gated on size >= 3, and the
    padded array is empty exactly when the doc has no tokens). pos
    comes from ``posexplode`` over the position-ordered gram array —
    the same 1-based values the sequence-built structs carried."""
    return (
        ensure_min_parallelism(df)
        .select(F.col(id_col), _padded_tokens(text_col).alias("__pt__"))
        .select(
            F.col(id_col),
            F.posexplode(_gram_structs("__pt__")).alias("__p__", "g"),
        )
        .select(
            id_col,
            (F.col("__p__") + 1).cast("long").alias("pos"),
            "g.u", "g.v", "g.w",
        )
    )


def corpus_trigrams(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(u, v, w)`` rows for TRAINING — no id column required (the
    model never uses document identity), so any corpus schema with a
    text column trains."""
    return (
        ensure_min_parallelism(df)
        .select(_padded_tokens(text_col).alias("__pt__"))
        .select(F.explode(_gram_structs("__pt__")).alias("g"))
        .select("g.u", "g.v", "g.w")
    )


def kn_model_tables(
    df: DataFrame, text_col: str = "text", d: float = 0.75
) -> dict[str, DataFrame | float]:
    """Train and return every table the backoff cascade needs:
    ``p3 (u,v,w,p3)``, ``ctx3 (u,v,lam3)``, ``p2 (v,w,p2)``,
    ``ctx2 (v,lam2)``, ``p1 (w,p1)``, ``tot (n1p___)`` (1 row),
    plus ``"d"`` (the float discount the tables were built with, so
    :func:`kn_doc_logprob` can verify the OOV floor uses MATCHING
    discounts instead of silently mixing two d values).
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
        "d": float(d),
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


def _kn_per_doc(
    tri: DataFrame,
    t: dict[str, DataFrame | float],
    d: float,
    self_scoring: bool,
    id_col: str,
) -> DataFrame:
    """ONE row per DISTINCT doc id in ``tri``: ``(id, n_tokens,
    logprob)`` — the scoring core shared by :func:`kn_doc_logprob`
    and :func:`moore_lewis_scores` (which scores one shared trigram
    frame through two model-table sets, so tokenization is paid
    once and the per-doc frames join safely on their unique key)."""
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
    return per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        folded.alias("logprob"),
    )


def kn_doc_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    d: float | None = None,
    train_df: DataFrame | None = None,
    model_tables: dict[str, DataFrame | float] | None = None,
    final_round: int | None = None,
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
      once, not per scored shard). The tables carry the discount they
      were trained with (the ``"d"`` entry); passing a conflicting
      ``d`` here raises instead of silently computing the OOV floor
      with a discount the attested tables never used.

    EVERY real token is scored — n_tokens is the doc's token count
    in all modes. Empty docs report 0 tokens and NULL scores. A
    model trained on an EMPTY corpus raises at scoring time
    (assert_true on the type total) rather than silently scoring
    everything NULL. The per-doc sum is a position-ordered fold,
    deterministic under any partitioning.

    ``final_round``: bround the FINAL logprob and avg_logprob to
    this many decimals (the oracle-checked contract form uses 6).
    The probabilities are bit-identical cross-engine (integer counts
    through correctly-rounded +,*,/ with matched association), but
    ``ln`` differs by ~1 ulp between Java and DuckDB, so per-doc
    sums carry ~1e-12 accumulated jitter. Quantizing EACH per-token
    lp would expose thousands of independent rounding boundaries to
    that jitter (observed live: two same-value runs differing in a
    handful of 12dp-rounded tokens); rounding only the two final
    per-doc scalars at 6dp leaves five orders of magnitude between
    jitter (~1e-12) and half-quantum (5e-7) — the token_zipf_fit
    precedent (one coarsely-rounded output over a 1000-term ln
    fold, driver-green)."""
    from bht_etl_app_spark.functions.lifecycle import carry

    self_scoring = train_df is None and model_tables is None
    if model_tables is not None:
        # `is not None`, NOT truthiness: an (invalid) empty dict must
        # fail loudly here, never silently fall through to retraining
        # on the scored df (ADVICE r6)
        missing = {"p3", "ctx3", "p2", "ctx2", "p1", "tot"} - set(model_tables)
        if missing:
            raise ValueError(
                f"model_tables is missing {sorted(missing)} — pass the "
                "dict returned by kn_model_tables unchanged"
            )
        stashed = model_tables.get("d")
        if d is not None and stashed is not None and float(d) != float(stashed):
            raise ValueError(
                f"model_tables were trained with d={stashed} but scoring "
                f"was asked for d={d}: the OOV floor would mix discounts "
                "the attested tables never used. Omit d (it is taken "
                "from the tables) or pass the training value."
            )
        d = stashed if d is None else d
    if d is None:
        d = 0.75
    t = (
        model_tables
        if model_tables is not None
        else kn_model_tables(train_df if train_df is not None else df, text_col, d)
    )
    tri = doc_trigrams(df, text_col, id_col)
    per_doc = _kn_per_doc(tri, t, d, self_scoring, id_col)
    all_docs = ensure_min_parallelism(df).select(id_col)
    lp_out = F.col("logprob")
    avg_out = F.col("logprob") / F.col("n_tokens")
    if final_round is not None:
        lp_out = F.bround(lp_out, final_round)
        avg_out = F.bround(avg_out, final_round)
    out = (
        all_docs.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            lp_out.alias("logprob"),
            avg_out.alias("avg_logprob"),
        )
    )
    # release(out) must free the model's persisted count tables, and
    # they must stay cached while this result is alive — the repo's
    # composed-lifecycle contract (lifecycle.carry), not an ad-hoc
    # attribute
    return carry(out, t["p3"])


# --- DuckDB oracle builders (r7 contract registration) --------------
#
# One shared model-table fragment serves both oracles — a one-sided
# edit to the ~70 CTE lines cannot desynchronize them (the repo's
# one-template-per-family rule). The token regex spells out Java's
# non-unicode \\s class `[ \\t\\n\\x0B\\f\\r ]` explicitly because
# RE2's \\s EXCLUDES vertical tab: a crawl doc containing "a\\x0Bb"
# would tokenize differently per engine under '\\s+'.

from bht_etl_app_spark.operators.text import tokens_sql as _tokens_sql  # noqa: E402

_TOK_EXPR = _tokens_sql(
    "\n                          AND x NOT LIKE '%' || chr(2) || '%'"
    "\n                          AND x NOT LIKE '%' || chr(3) || '%'"
)

_BOS_SQL = "chr(2) || 's' || chr(3)"


def _kn_model_ctes(d: float, train_tri: str, prefix: str = "") -> str:
    """The model-table CTE chain over a (u, v, w) trigram CTE named
    ``train_tri`` — every multiplication associated exactly as the
    Spark column expressions in :func:`kn_model_tables` (lam2/lam3
    computed in their ctx CTEs, THEN multiplied). ``prefix``
    namespaces every CTE it defines (``{prefix}c3`` ... ``{prefix}p3``)
    so TWO model chains can coexist in one composed oracle (the
    Moore-Lewis contrast); ``prefix=""`` keeps the original CTE names
    (the table aliases are inert), so the kn/curated oracles keep
    their verified semantics — re-verified green after this refactor."""
    dd = f"CAST({d} AS DOUBLE)"
    p = prefix
    return f"""{p}c3 AS MATERIALIZED (
  SELECT u, v, w, count(*) AS c3 FROM {train_tri} GROUP BY 1, 2, 3
),
{p}c2 AS MATERIALIZED (
  SELECT u, v, CAST(sum(c3) AS BIGINT) AS c2, count(*) AS n1p_uv_
  FROM {p}c3 GROUP BY 1, 2
),
{p}nvw AS MATERIALIZED (
  SELECT v, w, count(*) AS n1p__vw FROM {p}c3 GROUP BY 1, 2
),
{p}nv AS MATERIALIZED (
  SELECT v, CAST(sum(n1p__vw) AS BIGINT) AS n1p__v_, count(*) AS n1p_v_
  FROM {p}nvw GROUP BY 1
),
{p}nw AS (SELECT w, count(*) AS n1p__w FROM {p}nvw GROUP BY 1),
{p}tot AS (SELECT CAST(sum(n1p__vw) AS BIGINT) AS n1p___ FROM {p}nvw),
{p}p1 AS (SELECT w, n1p__w / n1p___ AS p1 FROM {p}nw, {p}tot),
{p}ctx2 AS (SELECT v, ({dd} * n1p_v_) / n1p__v_ AS lam2, n1p__v_ FROM {p}nv),
{p}p2 AS MATERIALIZED (
  SELECT nvw.v, nvw.w,
         (greatest(nvw.n1p__vw - {dd}, CAST(0 AS DOUBLE)) / ctx2.n1p__v_)
         + (ctx2.lam2 * p1.p1) AS p2
  FROM {p}nvw nvw JOIN {p}ctx2 ctx2 ON nvw.v = ctx2.v JOIN {p}p1 p1 ON nvw.w = p1.w
),
{p}ctx3 AS (SELECT u, v, ({dd} * n1p_uv_) / c2 AS lam3, c2 FROM {p}c2),
{p}p3 AS MATERIALIZED (
  SELECT c3.u, c3.v, c3.w,
         (greatest(c3.c3 - {dd}, CAST(0 AS DOUBLE)) / ctx3.c2)
         + (ctx3.lam3 * p2.p2) AS p3
  FROM {p}c3 c3 JOIN {p}ctx3 ctx3 ON c3.u = ctx3.u AND c3.v = ctx3.v
          JOIN {p}p2 p2 ON c3.v = p2.v AND c3.w = p2.w
)"""


def _tri_cte(name: str, toks_cte: str, with_doc: bool) -> str:
    cols = "doc_id, i - 2 AS pos,\n         " if with_doc else ""
    sel = "doc_id, " if with_doc else ""
    return f"""{name} AS MATERIALIZED (
  SELECT {cols}padded[i - 2] AS u, padded[i - 1] AS v, padded[i] AS w
  FROM (
    SELECT {sel}list_concat([{_BOS_SQL}, {_BOS_SQL}], t) AS padded
    FROM {toks_cte} WHERE len(t) > 0
  ), unnest(range(3, len(padded) + 1)) AS r(i)
)"""


_FINAL_SELECT = """SELECT t.doc_id,
       CAST(coalesce(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
       round_even(pd.logprob, {fr}) AS logprob,
       round_even(pd.logprob / pd.n_tokens, {fr}) AS avg_logprob
FROM {toks} t LEFT JOIN per_doc pd USING (doc_id)"""

_PER_DOC_CTE = """per_doc AS (
  SELECT doc_id, count(*) AS n_tokens,
         list_sum(list(lp ORDER BY pos)) AS logprob
  FROM per_tok GROUP BY 1
)"""


def kn_per_doc_cte(prefix: str = "") -> str:
    """``{prefix}per_doc`` over ``{prefix}per_tok`` — the
    position-ordered per-doc fold (prefix-parameterized twin of
    ``_PER_DOC_CTE`` for composed oracles with two scoring chains)."""
    return _PER_DOC_CTE.replace("per_doc", f"{prefix}per_doc").replace(
        "per_tok", f"{prefix}per_tok"
    )


def kn_backoff_per_tok_cte(d: float, score_tri: str, prefix: str = "") -> str:
    """The held-out scoring CTE: ``score_tri`` (doc_id, pos, u, v, w)
    LEFT-joined through the model tables with the FULL backoff
    cascade — attested p3, else lam3*P(w|v), else P(w|v); attested
    p2, else lam2*P(w), else P(w); attested p1, else the D/N1p(..)
    OOV floor — every multiplication associated exactly as the Spark
    column expressions, and the SAME structural
    empty-training-corpus failure as Spark's assert_true (DuckDB
    ``error()`` in the floor's NULL-total branch). Shared verbatim by
    :func:`kn_heldout_oracle_sql` and the composed curation oracle
    (__spark_entry__ curated_verdicts_lm), so a one-sided edit cannot
    desynchronize the standalone key from the composition. ``prefix``
    namespaces the output CTE (``{prefix}per_tok``) and the model
    tables it joins (``{prefix}p3`` ...), pairing with
    ``_kn_model_ctes(prefix=...)`` for two-chain compositions (the
    Moore-Lewis contrast)."""
    dd = f"CAST({d} AS DOUBLE)"
    p = prefix
    floor = (
        "CASE WHEN tot.n1p___ IS NULL THEN "
        "CAST(error('KN model was trained on an empty corpus') AS DOUBLE) "
        f"ELSE {dd} / tot.n1p___ END"
    )
    pwv = f"""CASE WHEN p2.p2 IS NOT NULL THEN p2.p2
                       WHEN ctx2.lam2 IS NOT NULL
                         THEN ctx2.lam2 * (coalesce(p1.p1, {floor}))
                       ELSE coalesce(p1.p1, {floor}) END"""
    return f"""{p}per_tok AS (
  SELECT s.doc_id, s.pos,
         ln(
           CASE WHEN p3.p3 IS NOT NULL THEN p3.p3
                WHEN ctx3.lam3 IS NOT NULL THEN ctx3.lam3 * ({pwv})
                ELSE ({pwv}) END
         ) AS lp
  FROM {score_tri} s
  LEFT JOIN {p}p3 p3 ON s.u = p3.u AND s.v = p3.v AND s.w = p3.w
  LEFT JOIN {p}ctx3 ctx3 ON s.u = ctx3.u AND s.v = ctx3.v
  LEFT JOIN {p}p2 p2 ON s.v = p2.v AND s.w = p2.w
  LEFT JOIN {p}ctx2 ctx2 ON s.v = ctx2.v
  LEFT JOIN {p}p1 p1 ON s.w = p1.w
  CROSS JOIN {p}tot tot
)"""


def kn_oracle_sql(
    d: float = 0.75, table: str = "documents", final_round: int = 6
) -> str:
    """DuckDB replay of the SELF-SCORING ``kn_doc_logprob`` contract
    form (``final_round`` decimals on the two per-doc output scalars;
    everything upstream of the ln is integer counts through
    correctly-rounded +,*,/ with the SAME parenthesization as the
    Spark expressions, hence bit-identical, and the ~1e-12 per-doc
    ln-jitter is absorbed by the coarse final rounding — see the
    kn_doc_logprob docstring). Per-doc sum is the proven pairing:
    Spark ``aggregate(array_sort(collect_list(struct(pos,lp))))`` ↔
    DuckDB ``list_sum(list(lp ORDER BY pos))``. Exercised bit-for-bit
    against Spark by tests/test_ngram_lm.py on the parquet fixtures."""
    if not 0.0 < d < 1.0:
        raise ValueError(f"KN discount must be in (0, 1), got {d}")
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, {_TOK_EXPR} AS t FROM {table}
),
{_tri_cte("tri", "toks", with_doc=True)},
{_kn_model_ctes(d, "tri")},
per_tok AS (
  SELECT tri.doc_id, tri.pos, ln(p3.p3) AS lp
  FROM tri JOIN p3 ON tri.u = p3.u AND tri.v = p3.v AND tri.w = p3.w
),
per_doc AS (
  SELECT doc_id, count(*) AS n_tokens,
         list_sum(list(lp ORDER BY pos)) AS logprob
  FROM per_tok GROUP BY 1
)
{_FINAL_SELECT.format(fr=final_round, toks="toks")}
"""


def kn_heldout_oracle_sql(
    d: float = 0.75,
    table: str = "documents",
    train_pred: str = "source <> 'src0'",
    score_pred: str = "source = 'src0'",
    final_round: int = 6,
) -> str:
    """DuckDB replay of the HELD-OUT ``kn_doc_logprob`` contract form
    (the CCNet mode: train on ``train_pred`` rows, score
    ``score_pred`` rows): the full backoff cascade — attested p3,
    else lam3*P(w|v), else P(w|v); attested p2, else lam2*P(w), else
    P(w); attested p1, else the D/N1p(..) OOV floor — as LEFT joins +
    CASE with every multiplication associated exactly as the Spark
    column expressions, and the SAME structural empty-training-corpus
    failure as Spark's assert_true (DuckDB ``error()`` in the floor's
    NULL-total branch). Same final-round discipline as
    :func:`kn_oracle_sql`."""
    if not 0.0 < d < 1.0:
        raise ValueError(f"KN discount must be in (0, 1), got {d}")
    return f"""
WITH train_toks AS MATERIALIZED (
  SELECT doc_id, {_TOK_EXPR} AS t FROM {table} WHERE {train_pred}
),
score_toks AS MATERIALIZED (
  SELECT doc_id, {_TOK_EXPR} AS t FROM {table} WHERE {score_pred}
),
{_tri_cte("train_tri", "train_toks", with_doc=False)},
{_tri_cte("score_tri", "score_toks", with_doc=True)},
{_kn_model_ctes(d, "train_tri")},
{kn_backoff_per_tok_cte(d, "score_tri")},
{_PER_DOC_CTE}
{_FINAL_SELECT.format(fr=final_round, toks="score_toks")}
"""


# --- Moore-Lewis cross-entropy-difference selection (STAGED r7) ------
#
# Moore & Lewis, "Intelligent Selection of Language Model Training
# Data" (ACL 2010): score every candidate document by
# H_in(doc) - H_out(doc) — per-token cross-entropy under an IN-DOMAIN
# LM minus the same under a GENERAL/OUT-domain LM — and keep the
# low-score tail (text the in-domain model likes MORE than the
# general model does; thresholding on raw in-domain perplexity alone
# over-selects generically-frequent text). The distributed shape is
# two kn_doc_logprob passes over the same candidate corpus (each one
# corpus scan + vocabulary-bounded model joins) and an id-keyed join
# of the two score frames — nothing new shuffles at corpus scale.
#
# Contract status: REGISTERED r8 (`moore_lewis_scores`,
# oracle-checked; in=src0, out=src1, candidates=the rest,
# final_round=6). Staged r7 with the pure-Python differential pytest
# and the oracle builder exact-value-verified on the fixtures
# (tests/test_ngram_lm.py).


def moore_lewis_scores(
    df: DataFrame,
    in_ref: DataFrame,
    out_ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    d: float = 0.75,
    final_round: int | None = None,
) -> DataFrame:
    """Per-document Moore-Lewis contrast: ``(doc_id, n_tokens,
    ce_in, ce_out, ml_score)`` where ``ce_* = -avg_logprob`` under
    the respective KN model (nats/token) and
    ``ml_score = ce_in - ce_out`` — SELECT docs with LOW ml_score.

    Both cross-entropies come from the full backoff cascade (the
    shared :func:`_kn_per_doc` core in held-out mode), so OOV tokens
    price in through each model's own OOV floor rather than being
    skipped — skipping would bias ml_score toward docs whose OOV
    mass differs between the references. Docs the models cannot
    score (no tokens) carry NULL scores. The candidate corpus is
    tokenized and trigram-exploded ONCE (the shared frame persists
    and feeds both scoring chains), and the per-doc score frames —
    one row per DISTINCT id — join a one-row-per-input-row spine, so
    duplicate ids yield duplicate identical output rows exactly like
    :func:`kn_doc_logprob` (and the replaying oracle), never an
    inner-join fan-out. ``final_round`` rounds the three output
    scalars only (the summed-ln discipline documented on
    kn_doc_logprob); all three derive from the RAW per-doc folds,
    never from each other's rounded forms."""
    from pyspark import StorageLevel

    from bht_etl_app_spark.functions.lifecycle import carry, track_persisted

    t_in = kn_model_tables(in_ref, text_col, d)
    t_out = kn_model_tables(out_ref, text_col, d)
    tri = doc_trigrams(df, text_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = _kn_per_doc(tri, t_in, d, self_scoring=False, id_col=id_col)
    b = _kn_per_doc(tri, t_out, d, self_scoring=False, id_col=id_col)
    spine = ensure_min_parallelism(df).select(id_col)
    in_avg = F.col("__in_lp__") / F.col("__in_n__")
    out_avg = F.col("__out_lp__") / F.col("__out_n__")
    ce_in = -in_avg
    ce_out = -out_avg
    ml = out_avg - in_avg  # = ce_in - ce_out
    if final_round is not None:
        ce_in = F.bround(ce_in, final_round)
        ce_out = F.bround(ce_out, final_round)
        ml = F.bround(ml, final_round)
    out = (
        spine.join(
            a.select(
                id_col,
                F.col("n_tokens").alias("__in_n__"),
                F.col("logprob").alias("__in_lp__"),
            ),
            id_col,
            "left",
        )
        .join(
            b.select(
                id_col,
                F.col("n_tokens").alias("__out_n__"),
                F.col("logprob").alias("__out_lp__"),
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.coalesce("__in_n__", F.lit(0)).alias("n_tokens"),
            ce_in.alias("ce_in"),
            ce_out.alias("ce_out"),
            ml.alias("ml_score"),
        )
    )
    return carry(track_persisted(out, tri), t_in["p3"], t_out["p3"])


def moore_lewis_oracle_sql(
    d: float = 0.75,
    table: str = "documents",
    in_pred: str = "source = 'src0'",
    out_pred: str = "source = 'src1'",
    score_pred: str = "source NOT IN ('src0', 'src1')",
    final_round: int = 6,
) -> str:
    """DuckDB replay of the Moore-Lewis contrast: TWO full KN model
    chains (prefixes ``ind_``/``ood_`` via the prefix-parameterized
    shared builders — the same fragments every verified KN oracle
    uses) scoring the same candidate set, joined per doc.
    ``ml_score = (out_avg) - (in_avg)`` associated exactly as the
    Spark column expression; the three output scalars round at
    ``final_round`` from the raw folds."""
    if not 0.0 < d < 1.0:
        raise ValueError(f"KN discount must be in (0, 1), got {d}")
    fr = final_round
    return f"""
WITH ind_train_toks AS MATERIALIZED (
  SELECT doc_id, {_TOK_EXPR} AS t FROM {table} WHERE {in_pred}
),
ood_train_toks AS MATERIALIZED (
  SELECT doc_id, {_TOK_EXPR} AS t FROM {table} WHERE {out_pred}
),
score_toks AS MATERIALIZED (
  SELECT doc_id, {_TOK_EXPR} AS t FROM {table} WHERE {score_pred}
),
{_tri_cte("ind_train_tri", "ind_train_toks", with_doc=False)},
{_tri_cte("ood_train_tri", "ood_train_toks", with_doc=False)},
{_tri_cte("score_tri", "score_toks", with_doc=True)},
{_kn_model_ctes(d, "ind_train_tri", prefix="ind_")},
{_kn_model_ctes(d, "ood_train_tri", prefix="ood_")},
{kn_backoff_per_tok_cte(d, "score_tri", prefix="ind_")},
{kn_backoff_per_tok_cte(d, "score_tri", prefix="ood_")},
{kn_per_doc_cte("ind_")},
{kn_per_doc_cte("ood_")}
SELECT t.doc_id,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       round_even(-(a.logprob / a.n_tokens), {fr}) AS ce_in,
       round_even(-(b.logprob / b.n_tokens), {fr}) AS ce_out,
       round_even((b.logprob / b.n_tokens) - (a.logprob / a.n_tokens), {fr}) AS ml_score
FROM score_toks t
LEFT JOIN ind_per_doc a USING (doc_id)
LEFT JOIN ood_per_doc b USING (doc_id)
"""


def kn_ppl_buckets(
    df: DataFrame,
    train_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
    d: float = 0.75,
    final_round: int = 6,
) -> DataFrame:
    """CCNet's head/middle/tail perplexity terciles (Wenzek et al.,
    LREC 2020 §4.3 — the bucket split CCNet PUBLISHES per language
    and downstream work trains on): score ``df`` under the
    reference-trained KN model, rank per domain by perplexity
    (ascending ppl == descending avg_logprob, doc_id tiebreak), and
    cut into integer-rank terciles. Output one row per (domain,
    bucket): ``(domain, bucket, n_docs, min_avg_logprob,
    max_avg_logprob)`` — the min/max are the bucket BOUNDARIES, the
    cut points a production run would freeze as constants (exactly
    how CCNet deploys per-language cuts). Docs the LM cannot score
    (no tokens) land in an explicit ``unscored`` bucket with NULL
    boundaries rather than silently biasing the tail.

    Determinism: bucket membership is pure integer arithmetic
    (rank*3 vs n) over the 6 dp-rounded scores; min/max need no
    ordered folds. Scale posture: scoring is the kn_doc_logprob
    chain (corpus scan + vocabulary-bounded model joins); bucketing
    adds one per-DOMAIN rank window — CCNet's own per-language sort,
    the domain-partitioned cousin of domain_quantile_keep (whose
    approx-percentile twin is the documented 100 TB escape hatch if
    a single domain outgrows a sort partition)."""
    from pyspark.sql.window import Window

    from bht_etl_app_spark.functions.lifecycle import carry

    scores = kn_doc_logprob(
        df, text_col, id_col, d=d, train_df=train_df,
        final_round=final_round,
    )
    lab = scores.join(
        df.select(F.col(id_col), F.col(domain_col).alias("domain")), id_col
    )
    w = Window.partitionBy("domain").orderBy(
        F.desc("avg_logprob"), F.asc(id_col)
    )
    wn = Window.partitionBy("domain")
    ranked = (
        lab.where(F.col("avg_logprob").isNotNull())
        .withColumn("__rk__", F.row_number().over(w))
        .withColumn("__n__", F.count(F.lit(1)).over(wn))
        .withColumn(
            "bucket",
            F.when(F.col("__rk__") * 3 <= F.col("__n__"), F.lit("head"))
            .when(F.col("__rk__") * 3 <= F.col("__n__") * 2, F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .select("domain", "bucket", "avg_logprob")
    )
    unscored = lab.where(F.col("avg_logprob").isNull()).select(
        "domain", F.lit("unscored").alias("bucket"), F.col("avg_logprob")
    )
    out = (
        ranked.unionByName(unscored)
        .groupBy("domain", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("avg_logprob").alias("min_avg_logprob"),
            F.max("avg_logprob").alias("max_avg_logprob"),
        )
    )
    return carry(out, scores)


def kn_ppl_buckets_oracle_sql(
    d: float = 0.75,
    table: str = "documents",
    train_pred: str = "source = 'src0'",
    score_pred: str = "source <> 'src0'",
    final_round: int = 6,
) -> str:
    """Replay of :func:`kn_ppl_buckets` over the contract shape
    (train on the reference slice, score the crawl): the verified
    held-out scoring statement wrapped whole as a CTE (the
    kn_heldout_oracle_sql text with swapped predicates), then the
    per-domain integer-rank terciles + the explicit unscored leg."""
    return f"""
WITH scores AS MATERIALIZED (
{kn_heldout_oracle_sql(d, table, train_pred=train_pred, score_pred=score_pred, final_round=final_round)}
),
lab AS (
  SELECT s.doc_id, d.source AS domain, s.avg_logprob
  FROM scores s JOIN {table} d USING (doc_id)
),
ranked AS (
  SELECT domain,
         CASE WHEN rk * 3 <= n THEN 'head'
              WHEN rk * 3 <= n * 2 THEN 'middle'
              ELSE 'tail' END AS bucket,
         avg_logprob
  FROM (
    SELECT domain, avg_logprob,
           row_number() OVER (PARTITION BY domain
                              ORDER BY avg_logprob DESC, doc_id ASC) AS rk,
           count(*) OVER (PARTITION BY domain) AS n
    FROM lab WHERE avg_logprob IS NOT NULL
  )
),
unioned AS (
  SELECT domain, bucket, avg_logprob FROM ranked
  UNION ALL
  SELECT domain, 'unscored' AS bucket, avg_logprob
  FROM lab WHERE avg_logprob IS NULL
)
SELECT domain, bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(avg_logprob) AS min_avg_logprob,
       max(avg_logprob) AS max_avg_logprob
FROM unioned GROUP BY domain, bucket
"""

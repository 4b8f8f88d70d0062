"""ExactSubstr-style duplicated-span detection (STAGED r7 → r8).

Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL 2022) build a suffix array over the whole corpus and
remove every substring of ≥ 50 tokens that appears more than once.
A suffix array is a single-machine construction; the distributed
re-expression here is the standard gram-cover equivalence:

    a token span is part of a duplicated substring of length ≥ k
    iff it is covered by some k-gram that occurs ≥ 2 times in the
    corpus,

so (1) slide a k-token window over every document (JVM-side from the
token array — no shuffle to form grams), (2) count gram fingerprints
corpus-wide (a map-side-combined groupBy on a 16-byte hash —
"appears twice" needs a count, never pair joins), (3) keep positions
whose gram is duplicated via an fp-keyed left-semi probe — TWO
corpus-scale exchanges of the ``(id,pos,fp)`` frame total (count side
+ probe side; the probe is AQE-skew-splittable, which a window over
``fp`` would not be), with the tokenize+explode computed ONCE (the
grams frame persists; r7 ADVICE) — and (4) merge
overlapping/adjacent covered intervals per document into MAXIMAL
spans with the gaps-and-islands pattern (windows partitioned by
doc_id, bounded by document length — never a global window).

This differs from :func:`bht_etl_app_spark.operators.corpus.
dedup_spans` (CCNet-style FIXED chunk dedup): fixed chunks miss
duplicates at unaligned offsets; the sliding gram cover finds a
duplicated run at ANY alignment, which is exactly why the suffix
array method removes ~10x more text than paragraph dedup in the
paper.

Everything is integers and fingerprint hashes — no floats anywhere
in the span path, so the DuckDB oracle matches bit-for-bit with no
rounding discipline needed (the per-doc ``dup_frac`` is a single
int/int division: correctly rounded, engine-exact). The fingerprint
has the dedup family's production/portable seam (``hash_fn``):
md5 strings for the oracle-replayable contract keys, xxhash64 longs
for the ``_fast`` production twins (8 bytes on the wire instead of
~32 per token position — see :func:`_gram_fp_structs`).

Contract status: REGISTERED r8 (`exact_substr_spans` /
`exact_substr_stats` / `exact_substr_scrub`, all oracle-checked);
staged r7 with pure-Python differential pytests and the oracle
builders fixture-verified (tests/test_substr_dedup.py).

No reference-parity citation: the reference app has no dedup surface;
this extends the training-data-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bht_etl_app_spark.functions.lifecycle import carry, track_persisted
from bht_etl_app_spark.operators.text import tokens_expr, tokens_sql
from bht_etl_app_spark.session import ensure_min_parallelism

__all__ = [
    "exact_substr_spans",
    "exact_substr_stats",
    "exact_substr_scrub",
    "exact_substr_spans_oracle_sql",
    "exact_substr_stats_oracle_sql",
    "exact_substr_scrub_oracle_sql",
]

# the ONE shared DuckDB twin of tokens_expr (operators/text.py) — no
# private copy to drift from ngram_lm's (r7 review)
_TOK_SQL = tokens_sql()


def _gram_fp_structs(tok_col: str, k: int, hash_fn: str = "md5") -> Column:
    """``array<struct<pos,fp>>`` — 1-based start position and a hash
    of the space-joined k-token window (tokens cannot contain spaces,
    so the join is collision-free); docs shorter than k emit none.
    ``tok_col`` must be an ALREADY-MATERIALIZED token-array column,
    never the inline ``tokens_expr`` tree: higher-order lambdas are
    interpreted with no common-subexpression elimination, so an
    inline tree re-runs split+filter once per gram position (the
    shingles_expr two-projection rule; r12 optimization — the
    positions ride a zipped ``sequence`` instead of a per-position
    struct build).

    ``hash_fn`` is the family's production/portable seam (the dedup
    family's r5 pattern — the fp is equality-only, so any injective
    hash works):

    - ``"md5"`` — the engine-PORTABLE default the oracles replay
      (DuckDB has md5, not xxhash64): a 32-char hex string, i.e.
      ~32 bytes shuffled per token position.
    - ``"xxhash64"`` — the PRODUCTION twin: one JVM op, an 8-byte
      long on the wire — the shuffle-weight cut that matters when
      the (id,pos,fp) frame is corpus-token-sized (r7 VERDICT #4).
    """
    toks = F.col(tok_col)
    if hash_fn == "md5":
        fp_of = F.md5
        fp_type = "string"
    elif hash_fn == "xxhash64":
        fp_of = F.xxhash64
        fp_type = "bigint"
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    n = F.size(toks)
    return F.when(
        n >= k,
        F.arrays_zip(
            F.sequence(F.lit(1).cast("long"), (n - F.lit(k) + 1).cast("long")).alias("pos"),
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k) + 1),
                lambda i: fp_of(F.concat_ws(" ", F.slice(toks, i, k))),
            ).alias("fp"),
        ).cast(f"array<struct<pos:bigint,fp:{fp_type}>>"),
    ).otherwise(
        F.array().cast(f"array<struct<pos:bigint,fp:{fp_type}>>")
    )


def _dup_positions(
    df: DataFrame, k: int, text_col: str, id_col: str, hash_fn: str = "md5"
) -> tuple[DataFrame, DataFrame]:
    """``(doc_id, pos)`` for every k-gram start whose fingerprint
    occurs ≥ 2 times corpus-wide (including twice within one doc —
    ExactSubstr counts ANY second occurrence). Returns ``(positions,
    grams)``: the grams frame persists (MEMORY_AND_DISK) because both
    the fingerprint count and the probe side read it — without the
    cache the scan+tokenize+explode runs twice (ReusedExchange dedups
    only the post-shuffle exchange, not the work feeding each side);
    the caller ties its lifetime to the result frame (r7 ADVICE)."""
    from pyspark import StorageLevel

    grams = (
        ensure_min_parallelism(df)
        .select(F.col(id_col), tokens_expr(text_col).alias("__toks__"))
        .select(
            F.col(id_col),
            F.explode(_gram_fp_structs("__toks__", k, hash_fn)).alias("g"),
        )
        .select(id_col, "g.pos", "g.fp")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dup_fps = (
        grams.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__n__"))
        .where(F.col("__n__") >= 2)
        .select("fp")
    )
    return grams.join(dup_fps, "fp", "left_semi").select(id_col, "pos"), grams


def exact_substr_spans(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Maximal duplicated token spans: ``(doc_id, span_start,
    span_end, span_tokens)`` — 1-based inclusive token positions of
    every maximal run covered by corpus-duplicated k-grams. A doc
    with no duplicated k-gram emits no rows. ``k`` is the minimum
    duplicated-substring length (the paper uses 50 BPE tokens; the
    tiny-vocabulary fixtures exercise at 5)."""
    if k < 2:
        # k=1 degrades to "any token that appears twice" — that is a
        # stopword detector, not substring dedup; fail loudly
        raise ValueError(f"k must be >= 2, got {k}")
    d, grams = _dup_positions(df, k, text_col, id_col, hash_fn)
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k - 1).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    # a new maximal run starts only when the cover leaves a GAP
    # (pos > prev_end + 1): overlapping AND abutting covers merge, so
    # two distinct duplicated substrings that touch report as one
    # covered run — the "maximal covered run" contract (r7 review)
    flagged = d.select(
        id_col,
        "pos",
        F.when(
            prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
        ).otherwise(0).alias("__new__"),
    )
    islands = flagged.select(
        id_col, "pos", F.sum("__new__").over(w).alias("__island__")
    )
    out = (
        islands.groupBy(id_col, "__island__")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )
    return track_persisted(out, grams)


def exact_substr_stats(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-ROW duplication summary against the DOC-level maximal
    spans: ``(doc_id, n_tokens, dup_tokens, n_spans, dup_frac)`` — one
    row per input row. ``dup_tokens`` counts THIS ROW's token
    positions covered by the doc's spans (each span clamped to the
    row's own length), so it equals :func:`exact_substr_scrub`'s
    ``n_removed`` by construction and ``dup_frac`` can never exceed 1
    — under duplicate doc_ids the gram cover pools across the id (it
    is corpus-level by construction) but each row is measured against
    its own token range, the scrub's per-row discipline (r7 ADVICE:
    the previous doc-level-sum-onto-per-row-length join could report
    dup_frac > 1 on duplicate-id input). ``n_spans`` counts the doc
    spans intersecting this row. NULL text measures like the empty
    string (n_tokens 0, dup_frac NULL via the >0 guard — the
    structural empty-denominator rule), matching the scrub's coalesce
    convention. Everything stays int/int (``dup_frac`` is one
    correctly-rounded division — no quantization needed)."""
    spans = exact_substr_spans(df, k, text_col, id_col, hash_fn)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("__spans__")
    )
    spine = ensure_min_parallelism(df).select(
        F.col(id_col),
        F.size(
            F.coalesce(tokens_expr(text_col), F.array().cast("array<string>"))
        ).cast("long").alias("n_tokens"),
    )
    sp = F.coalesce(
        F.col("__spans__"),
        F.array().cast("array<struct<s:bigint,e:bigint>>"),
    )
    # spans are disjoint and non-abutting per doc (maximal runs), so
    # clamped overlap lengths sum without double-count
    hit = F.filter(sp, lambda r: r["s"] <= F.col("n_tokens"))
    dup = F.aggregate(
        hit,
        F.lit(0).cast("long"),
        lambda acc, r: acc
        + F.least(r["e"], F.col("n_tokens"))
        - r["s"]
        + F.lit(1).cast("long"),
    )
    out = (
        spine.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            dup.alias("dup_tokens"),
            F.size(hit).cast("long").alias("n_spans"),
            F.when(
                F.col("n_tokens") > 0, dup.cast("double") / F.col("n_tokens")
            ).alias("dup_frac"),
        )
    )
    return carry(out, spans)


def exact_substr_scrub(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """The REMOVER — what the paper actually does with the spans:
    drop every token inside a duplicated span and reassemble the
    document from the survivors (space-joined, the tokenizer's
    inverse). Output: ``(doc_id, scrubbed_text, n_kept, n_removed)``,
    one row per input row. Docs with nothing duplicated pass through
    re-joined (whitespace normalized); fully-duplicated docs scrub to
    the empty string; empty docs stay empty. Token filtering is
    array-native per document (no extra shuffle beyond the spans
    computation itself).

    The per-doc span table persists (r12 optimization): scrub output
    routinely has two consumers (curate_corpus reads it for the keep
    list AND for the decontamination input), and without the cache
    each consumer re-ran the whole spans pipeline — dup-fp count,
    semi-join, islands windows — per evaluation. The cached frame is
    ``(doc_id, span list)`` for docs with at least one duplicated
    run — doc-bounded and text-free, so the no-text-persists
    discipline holds; a re-evaluation now recomputes only the
    tokenize+join half."""
    from pyspark import StorageLevel

    spans = exact_substr_spans(df, k, text_col, id_col, hash_fn)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("__spans__")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # NULL text scrubs like the empty string ('' / 0 / 0) — without
    # the coalesce, size(NULL array) is NULL and n_kept/n_removed
    # diverge from the oracle's coalesced counts (r7 review)
    toks = ensure_min_parallelism(df).select(
        F.col(id_col),
        F.coalesce(
            tokens_expr(text_col), F.array().cast("array<string>")
        ).alias("__toks__"),
    )
    indexed = F.transform(
        F.col("__toks__"),
        lambda t, i: F.struct((i + 1).cast("long").alias("pos"), t.alias("t")),
    )
    sp = F.coalesce(
        F.col("__spans__"),
        F.array().cast("array<struct<s:bigint,e:bigint>>"),
    )
    kept = F.filter(
        indexed,
        lambda x: ~F.exists(
            sp, lambda r: (x["pos"] >= r["s"]) & (x["pos"] <= r["e"])
        ),
    )
    out = (
        toks.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.concat_ws(
                " ", F.transform(kept, lambda x: x["t"])
            ).alias("scrubbed_text"),
            F.size(kept).cast("long").alias("n_kept"),
            (F.size("__toks__") - F.size(kept)).cast("long").alias("n_removed"),
        )
    )
    return carry(track_persisted(out, per_doc), spans)


def _spans_ctes(k: int, table: str, prefix: str = "") -> str:
    """The shared CTE chain up to maximal spans (grams → duplicated
    fingerprints → covered positions → gaps-and-islands merge).
    ``prefix`` namespaces every CTE so the chain can embed VERBATIM
    into a composed oracle (curate_corpus' substr stage) without
    colliding with the host's CTEs — the prefix-parameterized-builder
    pattern every verified KN oracle uses; the default ``""`` keeps
    the standalone oracles byte-identical."""
    p = prefix
    return f"""{p}t AS MATERIALIZED (
  SELECT doc_id, {_TOK_SQL} AS tk FROM {table}
),
{p}g AS MATERIALIZED (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(list_slice(tk, i, i + {k} - 1), ' ')) AS fp
  FROM (
    SELECT doc_id, tk, unnest(range(1, len(tk) - {k} + 2)) AS i
    FROM {p}t WHERE len(tk) >= {k}
  )
),
{p}dupfp AS MATERIALIZED (
  SELECT fp FROM {p}g GROUP BY fp HAVING count(*) >= 2
),
{p}d AS MATERIALIZED (
  SELECT doc_id, pos FROM {p}g WHERE fp IN (SELECT fp FROM {p}dupfp)
),
{p}m AS (
  SELECT doc_id, pos,
         max(pos + {k} - 1) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_end
  FROM {p}d
),
{p}isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                  THEN 1 ELSE 0 END)
         OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM {p}m
),
{p}spans AS MATERIALIZED (
  SELECT doc_id,
         min(pos) AS span_start,
         max(pos) + {k} - 1 AS span_end
  FROM {p}isl GROUP BY doc_id, island
)"""


def exact_substr_spans_oracle_sql(k: int = 5, table: str = "documents") -> str:
    """DuckDB replay of :func:`exact_substr_spans` — integer-only, so
    the match is exact with no rounding discipline."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return f"""
WITH {_spans_ctes(k, table)}
SELECT doc_id, span_start, span_end,
       span_end - span_start + 1 AS span_tokens
FROM spans
"""


def exact_substr_stats_oracle_sql(k: int = 5, table: str = "documents") -> str:
    """DuckDB replay of :func:`exact_substr_stats` — per ROW against
    the doc-level spans (the scrub oracle's synthetic-rid discipline:
    duplicate doc_ids each measure their own token range, spans
    clamped to the row's length), NULL text coalesced to 0 tokens,
    ``dup_frac`` the same single int/int division."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return f"""
WITH {_spans_ctes(k, table)},
trow AS MATERIALIZED (
  SELECT doc_id, row_number() OVER () AS rid,
         CAST(coalesce(len(tk), 0) AS BIGINT) AS n
  FROM t
),
per_row AS (
  SELECT tr.rid,
         CAST(coalesce(sum(CASE WHEN sp.span_start <= tr.n
                  THEN least(sp.span_end, tr.n) - sp.span_start + 1
             END), 0) AS BIGINT) AS dup_tokens,
         CAST(count(CASE WHEN sp.span_start <= tr.n THEN 1 END)
              AS BIGINT) AS n_spans
  FROM trow tr LEFT JOIN spans sp USING (doc_id)
  GROUP BY tr.rid
)
SELECT tr.doc_id,
       tr.n AS n_tokens,
       pr.dup_tokens,
       pr.n_spans,
       CASE WHEN tr.n > 0
            THEN CAST(pr.dup_tokens AS DOUBLE) / tr.n
       END AS dup_frac
FROM trow tr JOIN per_row pr USING (rid)
"""


def _scrub_ctes(k: int, prefix: str = "") -> str:
    """The remover tail over the ``{prefix}spans`` chain — trow / cov
    / tokpos / keptagg; the final per-row SELECT stays with the
    caller. trow keys every INPUT ROW with a synthetic rid: the scrub
    is per-row (each row's own token array filtered against the
    DOC-level covered positions, Spark's join shape), so duplicate
    doc_ids must not pool their tokens into one interleaved string
    (r7 review — observed negative n_removed before the rid).
    ``prefix`` namespaces the CTEs for composed-oracle embedding,
    exactly like :func:`_spans_ctes`."""
    p = prefix
    return f"""{p}trow AS MATERIALIZED (
  SELECT doc_id, row_number() OVER () AS rid, tk FROM {p}t
),
{p}cov AS MATERIALIZED (
  SELECT DISTINCT doc_id, unnest(range(span_start, span_end + 1)) AS p
  FROM {p}spans
),
{p}tokpos AS (
  SELECT doc_id, rid, CAST(i AS BIGINT) AS p, tk[i] AS t
  FROM (SELECT doc_id, rid, tk, unnest(range(1, len(tk) + 1)) AS i FROM {p}trow)
),
{p}keptagg AS (
  SELECT tp.rid,
         array_to_string(list(tp.t ORDER BY tp.p), ' ') AS scrubbed_text,
         count(*) AS n_kept
  FROM {p}tokpos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM {p}cov WHERE {p}cov.doc_id = tp.doc_id AND {p}cov.p = tp.p
  )
  GROUP BY tp.rid
)"""


def exact_substr_scrub_oracle_sql(k: int = 5, table: str = "documents") -> str:
    """DuckDB replay of :func:`exact_substr_scrub` — covered token
    positions exploded from the spans, survivors reassembled in
    position order (``list(t ORDER BY p)`` is the engine-exact string
    twin of Spark's array-native filter, which never leaves document
    order); ``len()`` coalesces so NULL text scrubs like the empty
    string."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return f"""
WITH {_spans_ctes(k, table)},
{_scrub_ctes(k)}
SELECT tr.doc_id,
       coalesce(ka.scrubbed_text, '') AS scrubbed_text,
       CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(len(tr.tk), 0) - coalesce(ka.n_kept, 0) AS BIGINT)
         AS n_removed
FROM trow tr LEFT JOIN keptagg ka USING (rid)
"""

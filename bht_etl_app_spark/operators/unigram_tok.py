"""Distributed unigram-LM (SentencePiece-style) tokenizer trainer
(contract keys ``unigram_train`` / ``unigram_token_counts`` /
``unigram_encoded_docs`` since r9).

Kudo, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates" (ACL 2018) trains the
unigram tokenizer behind SentencePiece — the other tokenizer real
pretraining pipelines run besides BPE (operators/bpe.py, already
oracle-checked). This is the deterministic hard-EM (Viterbi) variant,
re-expressed Spark-first:

- ONE corpus pass builds the distinct-word count table; every EM
  quantity after that is an aggregation over the VOCABULARY-bounded
  word table (the kn_model_tables / bpe discipline — the E-step runs
  per DISTINCT word, never per token, so a 100 TB corpus prices the
  same E-step as its 10 GB sample once word counts exist).
- The per-word Viterbi segmentation is an ARRAY FOLD, not a UDF:
  candidate (start, end, cost) edges come from an equi-join of the
  word's substrings against the current piece table (broadcast —
  model-parameter-sized), and the DP over positions folds
  ``F.aggregate(sequence(1, n), ...)`` with an array-of-structs
  accumulator (documents are bounded by ``max_word_len``, so the
  fold is a compile-time-bounded expression, exactly like the
  substr_dedup gram windows).

Determinism / cross-engine discipline (what lets DuckDB replay it):

- EM counts are INTEGERS (path occurrences x word count) — exact.
- Piece probabilities are single int/int divisions — exact.
- The ONLY float in the dataflow is the per-piece Viterbi cost
  ``-ln(count/N)``, quantized to 9 dp half-even at model-build time
  (the kmeans per-round rule: both engines then fold IDENTICAL
  doubles in the identical left-to-right path order, so DP sums and
  argmin comparisons are bit-equal; the residual risk is the 1-ulp
  Java-vs-DuckDB ln divergence landing exactly on a 0.5e-9 rounding
  boundary — the same accepted class as every kmeans-family oracle).
- Viterbi ties break to the SMALLEST backpointer (prefer the longer
  final piece), then positions are unique — one canonical path per
  word, replayed in SQL as ``row_number() OVER (ORDER BY cost, j)``.

Algorithm (hard-EM, char-floor smoothing):

1. Words: distinct lowercase whitespace tokens with counts; words
   longer than ``max_word_len`` are EXCLUDED from training (a
   documented cap — it bounds the unrolled DP depth; set it to the
   p99.9 word length on real corpora and let the tail pass through
   as rare whole pieces at inference).
2. Seed model: every substring of length <= ``max_piece_len``,
   counted at every occurrence position weighted by word count;
   pieces keep their seed count if ``len == 1`` (chars ALWAYS stay —
   they guarantee every word stays segmentable) or
   ``count >= min_count``.
3. Each EM round: Viterbi-segment every distinct word under the
   current model; new piece count = path occurrences x word count,
   chars get a +1 floor (so their probability never hits the ln(0)
   edge), pieces with zero path count and len > 1 PRUNE.
4. Output: top ``vocab_size`` pieces by (count desc, piece asc) from
   the final round, with ``prob = count / N`` over the full
   pre-cap model (exact rational).

Contract status: REGISTERED r9 (staged r8 while the driver window
sat at its 46/50 budget) — queries()/oracle_sql() entries wired in
__spark_entry__.py, oracle builders below, pure-Python differential
in tests/test_unigram_tok.py.

No reference-parity citation: the reference app has no tokenizer
surface; this extends the training-data-pipeline north star beside
operators/bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bht_etl_app_spark.operators.text import tokens_expr, tokens_sql
from bht_etl_app_spark.session import ensure_min_parallelism

__all__ = [
    "unigram_train",
    "unigram_token_counts",
    "unigram_encode_docs",
    "unigram_train_oracle_sql",
    "unigram_token_counts_oracle_sql",
    "unigram_encode_docs_oracle_sql",
]

_TOK_SQL = tokens_sql()


def _check_params(max_piece_len: int, rounds: int, max_word_len: int) -> None:
    """Shared guard (r8 review #5): max_piece_len=0 would silently
    DIVERGE the engines — Spark's F.sequence(j, j-1) descends and
    fabricates zero-length pieces while DuckDB's range(j+1, j+1) is
    empty — so fail loudly like the rounds guard instead."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    if max_word_len < 1:
        raise ValueError(f"max_word_len must be >= 1, got {max_word_len}")


def _word_counts(df: DataFrame, text_col: str, max_word_len: int) -> DataFrame:
    """``(word, wc)`` — distinct lowercase whitespace words with
    corpus counts, capped at ``max_word_len`` (the ONE corpus-scale
    pass; everything downstream is vocabulary-bounded)."""
    return (
        ensure_min_parallelism(df)
        .select(F.explode(tokens_expr(text_col)).alias("word"))
        .where(F.length("word") <= max_word_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _seed_counts(words: DataFrame, max_piece_len: int, min_count: int) -> DataFrame:
    """Seed model ``(piece, cnt)``: every substring occurrence up to
    ``max_piece_len`` weighted by word count; single chars always
    kept, longer pieces need ``cnt >= min_count``."""
    n = F.length("word")
    # substrings w[j..i] for every start j and i in [j, min(j+L-1, n)]
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda j: F.transform(
                F.sequence(j, F.least(j + F.lit(max_piece_len) - 1, n)),
                lambda i: F.col("word").substr(j, i - j + 1),
            ),
        )
    )
    out = (
        words.select(F.explode(pieces).alias("piece"), "wc")
        .groupBy("piece")
        .agg(F.sum("wc").alias("cnt"))
    )
    return out.where(
        (F.length("piece") == 1) | (F.col("cnt") >= min_count)
    )


def _viterbi_paths(
    words: DataFrame, model: DataFrame, max_piece_len: int, max_word_len: int
) -> DataFrame:
    """``(word, wc, __path__)`` — the canonical Viterbi segmentation
    of each word under ``model (piece, cost)`` as an array of pieces
    in WORD order (the backtrace walks end->start; the array is
    reversed before returning). Edges come from an equi-join
    (broadcast model); the DP and the backtrace are bounded array
    folds — no UDF, no recursion. ``_viterbi_pieces`` explodes this
    for the order-free count consumers; ``unigram_encode_docs``
    consumes the order directly."""
    n = F.length("word")
    # candidate (j, i) edges: piece = word[j+1 .. i] (0-based j)
    cand = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda j: F.transform(
                F.sequence(j + 1, F.least(j + F.lit(max_piece_len), n)),
                lambda i: F.struct(
                    j.cast("int").alias("j"),
                    i.cast("int").alias("i"),
                    F.col("word").substr(j + 1, i - j).alias("piece"),
                ),
            ),
        )
    )
    edges = (
        words.select("word", "wc", F.explode(cand).alias("e"))
        .select("word", "wc", "e.j", "e.i", "e.piece")
        .join(F.broadcast(model), "piece", "inner")
        .groupBy("word", "wc")
        .agg(
            F.collect_list(F.struct("j", "i", "cost")).alias("__edges__")
        )
    )
    inf = F.lit(float("inf"))
    ed = F.col("__edges__")
    # INVARIANT (r8 ADVICE): the (inf, -1) fallback below is
    # structurally unreachable — _em_round's char floor (+1 on every
    # len==1 piece) guarantees single-char pieces never prune, so
    # every position of every trained word has at least its char edge
    # and the DP always completes. The DuckDB replay (_vit_ctes)
    # relies on this HARDER than we do: it simply has no b{i} row for
    # an unreachable position, so if char pruning were ever allowed
    # the engines would diverge silently (Spark emits an inf-cost
    # path, the oracle emits nothing) instead of failing loudly.
    # tests/test_unigram_tok.py::test_char_floor_invariant pins the
    # char-retention guarantee; keep it green before touching the
    # floor.

    # forward DP: acc[i+1] = struct(cost, bp) for prefix length i;
    # min over incoming edges by (cost, bp) — array_min's struct
    # ordering IS (cost asc, bp asc), the documented tiebreak
    def step(acc, i):
        cands = F.filter(ed, lambda e: e["i"] == i)
        scored = F.transform(
            cands,
            lambda e: F.struct(
                (F.element_at(acc, e["j"] + 1)["cost"] + e["cost"]).alias(
                    "cost"
                ),
                e["j"].alias("bp"),
            ),
        )
        best = F.coalesce(
            F.array_min(scored),
            F.struct(inf.alias("cost"), F.lit(-1).alias("bp")),
        )
        return F.concat(acc, F.array(best))

    init = F.array(F.struct(F.lit(0.0).alias("cost"), F.lit(-1).alias("bp")))
    # materialize the DP table as its own column so the backtrace
    # references it once instead of embedding max_word_len copies of
    # the whole fold expression
    with_best = edges.withColumn(
        "__best__", F.aggregate(F.sequence(F.lit(1), n), init, step)
    )
    bestc = F.col("__best__")

    # backtrace: at most max_word_len hops from pos = n back to 0;
    # each hop emits word[bp+1 .. pos]
    def hop(acc, _):
        pos = acc["pos"]
        bp = F.element_at(bestc, pos + 1)["bp"]
        return F.when(
            pos > 0,
            F.struct(
                bp.alias("pos"),
                F.concat(
                    acc["arr"],
                    F.array(F.col("word").substr(bp + 1, pos - bp)),
                ).alias("arr"),
            ),
        ).otherwise(acc)

    tr_init = F.struct(
        n.cast("int").alias("pos"),
        F.array().cast("array<string>").alias("arr"),
    )
    path = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_word_len)), tr_init, hop
    )["arr"]
    return with_best.select(
        "word", "wc", F.reverse(path).alias("__path__")
    )


def _viterbi_pieces(
    words: DataFrame, model: DataFrame, max_piece_len: int, max_word_len: int
) -> DataFrame:
    """``(word, wc, piece)`` — one row per piece OCCURRENCE on the
    word's canonical Viterbi path (order-free view of
    :func:`_viterbi_paths`, for the EM/count consumers)."""
    return _viterbi_paths(words, model, max_piece_len, max_word_len).select(
        "word", "wc", F.explode("__path__").alias("piece")
    )


def _model_from_counts(counts: DataFrame) -> DataFrame:
    """``(piece, cost)`` from ``(piece, cnt)`` — cost is the ONE
    quantized float: ``bround(-ln(cnt / N), 9)`` (N folded as an
    exact integer sum; the division and negation are exact, ln is the
    1-ulp risk the 9 dp quantum absorbs)."""
    n_tot = counts.agg(F.sum("cnt").cast("long").alias("__N__"))
    return counts.crossJoin(F.broadcast(n_tot)).select(
        "piece",
        F.bround(
            -F.log(F.col("cnt").cast("double") / F.col("__N__")), 9
        ).alias("cost"),
    )


def _em_round(
    words: DataFrame, counts: DataFrame, max_piece_len: int, max_word_len: int
) -> DataFrame:
    """One hard-EM round: Viterbi counts + the char floor; len>1
    pieces with no path occurrence prune."""
    model = _model_from_counts(counts)
    path_counts = (
        _viterbi_pieces(words, model, max_piece_len, max_word_len)
        .groupBy("piece")
        .agg(F.sum("wc").alias("__pc__"))
    )
    return (
        counts.select("piece")
        .join(path_counts, "piece", "left")
        .select(
            "piece",
            (
                F.coalesce("__pc__", F.lit(0))
                + F.when(F.length("piece") == 1, 1).otherwise(0)
            ).cast("long").alias("cnt"),
        )
        .where(F.col("cnt") > 0)
    )


def unigram_train(
    df: DataFrame,
    vocab_size: int = 48,
    max_piece_len: int = 4,
    rounds: int = 2,
    max_word_len: int = 8,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Train the unigram tokenizer; returns the top ``vocab_size``
    pieces as ``(piece, count, prob)`` — count is the final round's
    integer EM count, prob the exact rational ``count / N`` over the
    full pre-cap model. Ranking is (count desc, piece asc) — fully
    deterministic, replayed verbatim by the oracle. The word table
    and every round's count table persist (vocabulary-sized blocks,
    lifecycle tied to the result — the bpe word_counts discipline):
    each round reads its input counts three times (total, model,
    prune spine) and the words table once per round, so without the
    cache the corpus scan re-expands per reference."""
    _check_params(max_piece_len, rounds, max_word_len)
    from pyspark import StorageLevel

    from bht_etl_app_spark.functions.lifecycle import track_persisted

    words = _word_counts(df, text_col, max_word_len).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cached = [words]
    counts = _seed_counts(words, max_piece_len, min_count)
    for _ in range(rounds):
        counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(counts)
        counts = _em_round(words, counts, max_piece_len, max_word_len)
    counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
    cached.append(counts)
    n_tot = counts.agg(F.sum("cnt").cast("long").alias("__N__"))
    out = (
        counts.crossJoin(F.broadcast(n_tot))
        .select(
            "piece",
            F.col("cnt").cast("long").alias("count"),
            (F.col("cnt").cast("double") / F.col("__N__")).alias("prob"),
        )
        .orderBy(F.desc("count"), F.asc("piece"))
        .limit(vocab_size)
    )
    return track_persisted(out, *cached)


def unigram_token_counts(
    df: DataFrame,
    max_piece_len: int = 4,
    rounds: int = 2,
    max_word_len: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document subword counts under the trained model:
    ``(doc_id, piece, n)`` — the encode side. The corpus is touched
    twice (word counts for training, per-doc word counts for the
    join); segmentation itself runs once per DISTINCT word against
    the FULL final model (pre-cap — capping could drop a char and
    leave a word unsegmentable; the cap is a reporting view,
    documented)."""
    _check_params(max_piece_len, rounds, max_word_len)
    from pyspark import StorageLevel

    from bht_etl_app_spark.functions.lifecycle import track_persisted

    words = _word_counts(df, text_col, max_word_len).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cached = [words]
    counts = _seed_counts(words, max_piece_len, min_count)
    for _ in range(rounds):
        counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(counts)
        counts = _em_round(words, counts, max_piece_len, max_word_len)
    counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
    cached.append(counts)
    model = _model_from_counts(counts)
    per_word = (
        _viterbi_pieces(words, model, max_piece_len, max_word_len)
        .groupBy("word", "piece")
        .agg(F.count(F.lit(1)).alias("__k__"))
    )
    doc_words = (
        ensure_min_parallelism(df)
        .select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("word"))
        .where(F.length("word") <= max_word_len)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("__dw__"))
    )
    out = (
        doc_words.join(per_word, "word", "inner")
        .groupBy(id_col, "piece")
        .agg(F.sum(F.col("__dw__") * F.col("__k__")).cast("long").alias("n"))
    )
    return track_persisted(out, *cached)


def unigram_encode_docs(
    df: DataFrame,
    max_piece_len: int = 4,
    rounds: int = 2,
    max_word_len: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode every document into its unigram-LM subword sequence
    under a tokenizer trained on the same corpus: ``(doc_id,
    uni_tokens)`` with ``uni_tokens`` the space-joined Viterbi pieces
    in document order — the position-ordered encode surface beside
    the bag-of-pieces :func:`unigram_token_counts` (the
    ``bpe_encoded_docs`` precedent, operators/bpe.py).

    Vocabulary-first like every chain in this module: segmentation
    runs once per DISTINCT word (:func:`_viterbi_paths` keeps the
    path in word order), the word->pieces map is broadcast
    (model-parameter-sized), and per-doc reassembly folds the
    position-indexed word explode — the corpus never shuffles on
    anything wider than ``(doc_id, pos)``. Words longer than
    ``max_word_len`` are outside the trained vocabulary and are
    OMITTED from the sequence (the bpe_encode_docs untrainable-word
    rule; production would pass them through as rare whole pieces —
    a one-line coalesce — but contract parity with the oracle's
    ``words`` table is the deliberate default). Empty documents
    yield an empty string."""
    _check_params(max_piece_len, rounds, max_word_len)
    from pyspark import StorageLevel

    from bht_etl_app_spark.functions.lifecycle import track_persisted

    words = _word_counts(df, text_col, max_word_len).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cached = [words]
    counts = _seed_counts(words, max_piece_len, min_count)
    for _ in range(rounds):
        counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(counts)
        counts = _em_round(words, counts, max_piece_len, max_word_len)
    counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
    cached.append(counts)
    model = _model_from_counts(counts)
    word_pieces = _viterbi_paths(
        words, model, max_piece_len, max_word_len
    ).select("word", F.concat_ws(" ", "__path__").alias("pieces"))
    doc_words = (
        ensure_min_parallelism(df)
        .select(F.col(id_col), F.posexplode_outer(tokens_expr(text_col)))
        .select(id_col, F.col("pos"), F.col("col").alias("word"))
    )
    # concat_ws skips NULL elements, so out-of-vocabulary words
    # (len > max_word_len: LEFT join miss) and the empty-doc
    # posexplode_outer sentinel both drop out of the joined string
    ordered = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
            lambda x: x["pieces"],
        ),
    )
    out = (
        doc_words.join(F.broadcast(word_pieces), "word", "left")
        .groupBy(id_col)
        .agg(ordered.alias("uni_tokens"))
    )
    return track_persisted(out, *cached)


def _vit_ctes(p: str, counts_cte: str, L: int, maxlen: int) -> str:
    """CTE chain replaying one Viterbi pass under the model built
    from ``counts_cte``: ``{p}m`` (piece costs — the ONE quantized
    float), ``{p}e`` (candidate edges), the unrolled DP
    ``{p}b1..{p}b{maxlen}`` with cumulative ``{p}ball*`` (MATERIALIZED
    — b{i} and ball{i} each read ball{i-1}, the exponential-inlining
    trap), the unrolled backtrace ``{p}hop*``, and ``{p}pieces``
    (word, wc, piece — one row per path occurrence). The DP tiebreak
    is ``ORDER BY cost ASC, j ASC`` — Spark's array_min over
    struct(cost, bp)."""
    parts = [
        f"""{p}m AS MATERIALIZED (
  SELECT piece, round_even(-ln(CAST(cnt AS DOUBLE) /
           (SELECT CAST(sum(cnt) AS BIGINT) FROM {counts_cte})), 9) AS cost
  FROM {counts_cte}
)""",
        f"""{p}e AS MATERIALIZED (
  SELECT s.word, s.wc, s.j, s.i, m.cost
  FROM (
    SELECT word, wc, j,
           unnest(range(j + 1, least(j + {L}, len(word)) + 1)) AS i
    FROM (
      SELECT word, wc, unnest(range(0, len(word))) AS j FROM words
    )
  ) s JOIN {p}m m ON m.piece = substr(s.word, CAST(s.j AS INT) + 1,
                                      CAST(s.i - s.j AS INT))
)""",
        f"""{p}ball0 AS MATERIALIZED (
  SELECT word, wc, 0 AS pos, CAST(0.0 AS DOUBLE) AS cost, -1 AS bp
  FROM words
)""",
    ]
    for i in range(1, maxlen + 1):
        parts.append(
            f"""{p}b{i} AS MATERIALIZED (
  SELECT word, wc, pos, cost, bp FROM (
    SELECT e.word, e.wc, {i} AS pos, b.cost + e.cost AS cost,
           CAST(e.j AS INT) AS bp,
           row_number() OVER (PARTITION BY e.word
                              ORDER BY b.cost + e.cost ASC, e.j ASC) AS rn
    FROM {p}e e JOIN {p}ball{i - 1} b ON b.word = e.word AND b.pos = e.j
    WHERE e.i = {i}
  ) WHERE rn = 1
)""",
        )
        parts.append(
            f"""{p}ball{i} AS MATERIALIZED (
  SELECT * FROM {p}ball{i - 1} UNION ALL SELECT * FROM {p}b{i}
)""",
        )
    parts.append(
        f"""{p}pt{maxlen} AS (
  SELECT word, wc, CAST(len(word) AS INT) AS pos FROM words
)""",
    )
    hop_selects = []
    for k in range(maxlen, 0, -1):
        parts.append(
            f"""{p}hop{k} AS MATERIALIZED (
  SELECT pt.word, pt.wc, b.bp AS pos,
         substr(pt.word, b.bp + 1, pt.pos - b.bp) AS piece
  FROM {p}pt{k} pt
  JOIN {p}ball{maxlen} b ON b.word = pt.word AND b.pos = pt.pos
  WHERE pt.pos > 0
)""",
        )
        if k > 1:
            parts.append(
                f"{p}pt{k - 1} AS (SELECT word, wc, pos FROM {p}hop{k})"
            )
        hop_selects.append(f"SELECT word, wc, piece FROM {p}hop{k}")
    parts.append(
        f"{p}pieces AS MATERIALIZED (\n  "
        + "\n  UNION ALL ".join(hop_selects)
        + "\n)"
    )
    return ",\n".join(parts)


def _uni_train_ctes(
    max_piece_len: int, rounds: int, max_word_len: int, min_count: int,
    table: str,
) -> str:
    """Shared chain: corpus words → seed counts c0 → EM rounds
    c1..c{rounds} (Viterbi counts + char floor + prune)."""
    parts = [
        f"""words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS wc FROM (
    SELECT unnest({_TOK_SQL}) AS word FROM {table}
  ) WHERE len(word) <= {max_word_len} GROUP BY word
)""",
        f"""c0 AS MATERIALIZED (
  SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt FROM (
    SELECT substr(word, CAST(j AS INT) + 1, CAST(i - j AS INT)) AS piece, wc
    FROM (
      SELECT word, wc, j,
             unnest(range(j + 1, least(j + {max_piece_len}, len(word)) + 1)) AS i
      FROM (SELECT word, wc, unnest(range(0, len(word))) AS j FROM words)
    )
  ) GROUP BY piece
  HAVING len(piece) = 1 OR sum(wc) >= {min_count}
)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(_vit_ctes(f"r{r}_", f"c{r - 1}", max_piece_len, max_word_len))
        parts.append(
            f"""r{r}_pc AS (
  SELECT piece, CAST(sum(wc) AS BIGINT) AS pc FROM r{r}_pieces GROUP BY piece
),
c{r} AS MATERIALIZED (
  SELECT piece, cnt FROM (
    SELECT c.piece,
           CAST(coalesce(pc.pc, 0)
                + CASE WHEN len(c.piece) = 1 THEN 1 ELSE 0 END
             AS BIGINT) AS cnt
    FROM c{r - 1} c LEFT JOIN r{r}_pc pc USING (piece)
  ) WHERE cnt > 0
)""",
        )
    return ",\n".join(parts)


def unigram_train_oracle_sql(
    vocab_size: int = 48,
    max_piece_len: int = 4,
    rounds: int = 2,
    max_word_len: int = 8,
    min_count: int = 2,
    table: str = "documents",
) -> str:
    """DuckDB replay of :func:`unigram_train` — integer counts +
    exact-rational probs; the per-round piece cost is the one
    quantized float (9 dp half-even, the kmeans rule)."""
    _check_params(max_piece_len, rounds, max_word_len)
    return f"""
WITH {_uni_train_ctes(max_piece_len, rounds, max_word_len, min_count, table)}
SELECT piece, cnt AS count,
       CAST(cnt AS DOUBLE) /
         (SELECT CAST(sum(cnt) AS BIGINT) FROM c{rounds}) AS prob
FROM c{rounds}
ORDER BY count DESC, piece ASC
LIMIT {vocab_size}
"""


def unigram_token_counts_oracle_sql(
    max_piece_len: int = 4,
    rounds: int = 2,
    max_word_len: int = 8,
    min_count: int = 2,
    table: str = "documents",
) -> str:
    """DuckDB replay of :func:`unigram_token_counts`: the training
    chain, ONE more Viterbi pass under the final model (prefix
    ``enc_``), then per-doc word counts joined to per-word piece
    occurrences."""
    _check_params(max_piece_len, rounds, max_word_len)
    return f"""
WITH {_uni_train_ctes(max_piece_len, rounds, max_word_len, min_count, table)},
{_vit_ctes("enc_", f"c{rounds}", max_piece_len, max_word_len)},
per_word AS MATERIALIZED (
  SELECT word, piece, CAST(count(*) AS BIGINT) AS k
  FROM enc_pieces GROUP BY word, piece
),
doc_words AS MATERIALIZED (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS dw FROM (
    SELECT doc_id, unnest({_TOK_SQL}) AS word FROM {table}
  ) WHERE len(word) <= {max_word_len} GROUP BY doc_id, word
)
SELECT dw.doc_id, pw.piece, CAST(sum(dw.dw * pw.k) AS BIGINT) AS n
FROM doc_words dw JOIN per_word pw USING (word)
GROUP BY dw.doc_id, pw.piece
"""


def unigram_encode_docs_oracle_sql(
    max_piece_len: int = 4,
    rounds: int = 2,
    max_word_len: int = 8,
    min_count: int = 2,
    table: str = "documents",
) -> str:
    """DuckDB replay of :func:`unigram_encode_docs`: the training
    chain, one encode Viterbi pass (prefix ``enc_``), per-word piece
    strings rebuilt IN ORDER from the hop CTEs (each ``enc_hop{{k}}``
    row carries the piece's 0-based start position as ``pos``, so
    ``string_agg(.. ORDER BY pos)`` is the document-order path — the
    Spark side's reversed backtrace array), then the bpe_encode_docs
    index-explode reassembly over the [NULL]-padded empty-doc case."""
    _check_params(max_piece_len, rounds, max_word_len)
    hop_union = "\n    UNION ALL ".join(
        f"SELECT word, pos, piece FROM enc_hop{k}"
        for k in range(max_word_len, 0, -1)
    )
    return f"""
WITH {_uni_train_ctes(max_piece_len, rounds, max_word_len, min_count, table)},
{_vit_ctes("enc_", f"c{rounds}", max_piece_len, max_word_len)},
enc_seq AS MATERIALIZED (
  SELECT word, string_agg(piece, ' ' ORDER BY pos ASC) AS pieces FROM (
    {hop_union}
  ) GROUP BY word
),
dw AS (
  SELECT doc_id, i AS ord, toks2[i] AS word FROM (
    SELECT doc_id,
           CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END AS toks2
    FROM (SELECT doc_id, {_TOK_SQL} AS toks FROM {table})
  ), unnest(range(1, len(toks2) + 1)) AS t(i)
)
SELECT doc_id,
       coalesce(string_agg(pieces, ' ' ORDER BY ord), '') AS uni_tokens
FROM dw LEFT JOIN enc_seq USING (word)
GROUP BY doc_id
"""

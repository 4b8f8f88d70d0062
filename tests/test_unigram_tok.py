"""Unigram-LM (SentencePiece-style) tokenizer trainer vs an
independent pure-Python hard-EM reference, plus the DuckDB oracle
rehearsals on the real fixtures (contract keys unigram_train /
unigram_token_counts since r9; staged r8 under the r6 staging
convention)."""

import math
from collections import Counter

import pytest

from bht_etl_app_spark.operators.unigram_tok import (
    unigram_encode_docs,
    unigram_encode_docs_oracle_sql,
    unigram_token_counts,
    unigram_token_counts_oracle_sql,
    unigram_train,
    unigram_train_oracle_sql,
)

TOY = [
    (1, "hashing hash hash table tables"),
    (2, "hash table the the the a"),
]


def _py_unigram_counts(texts, L, rounds, maxlen, min_count):
    """Independent reference: returns the final (piece -> count) map
    after ``rounds`` hard-EM rounds — seed substring counts, 9 dp
    half-even cost quantization (python round IS half-even), Viterbi
    with (cost, j) tiebreak, char floor, len>1 zero-count prune."""
    words = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            if len(w) <= maxlen:
                words[w] += 1
    cnt = Counter()
    for w, wc in words.items():
        n = len(w)
        for j in range(n):
            for i in range(j + 1, min(j + L, n) + 1):
                cnt[w[j:i]] += wc
    counts = {p: c for p, c in cnt.items() if len(p) == 1 or c >= min_count}

    def em(counts):
        n_tot = sum(counts.values())
        cost = {p: round(-math.log(c / n_tot), 9) for p, c in counts.items()}
        pc = Counter()
        for w, wc in words.items():
            n = len(w)
            best = [(0.0, -1)] + [(math.inf, -1)] * n
            for i in range(1, n + 1):
                cands = [
                    (best[j][0] + cost[w[j:i]], j)
                    for j in range(max(0, i - L), i)
                    if w[j:i] in cost
                ]
                if cands:
                    best[i] = min(cands)
            pos = n
            while pos > 0:
                j = best[pos][1]
                pc[w[j:pos]] += wc
                pos = j
        out = {}
        for p in counts:
            c = pc.get(p, 0) + (1 if len(p) == 1 else 0)
            if c > 0:
                out[p] = c
        return out

    for _ in range(rounds):
        counts = em(counts)
    return counts


def _py_train(texts, vocab_size=48, L=4, rounds=2, maxlen=8, min_count=2):
    counts = _py_unigram_counts(texts, L, rounds, maxlen, min_count)
    n_tot = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(p, c, c / n_tot) for p, c in ranked[:vocab_size]]


def test_train_matches_python_reference_and_semantics(spark):
    docs = spark.createDataFrame(TOY, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in unigram_train(docs, vocab_size=12).collect()
    )
    ref = sorted(_py_train([t for _, t in TOY], vocab_size=12))
    assert got == ref
    by_piece = {p: c for p, c, _ in got}
    # the EM keeps whole frequent words as single pieces...
    assert by_piece["hash"] == 4 and by_piece["the"] == 3
    # ...and drops unused multi-char seed pieces ("tabl", "ash", ...)
    assert "tabl" not in by_piece and "ash" not in by_piece
    # char floor: chars never prune even when no path uses them alone
    assert by_piece["e"] == 1 and by_piece["h"] == 1


def test_token_counts_segments_by_final_model(spark):
    docs = spark.createDataFrame(TOY, "doc_id long, text string")
    got = {
        (r["doc_id"], r["piece"]): r["n"]
        for r in unigram_token_counts(docs).collect()
    }
    # "hashing" -> hash+i+n+g, "tables" -> t+able+s, "the" stays whole
    assert got[(1, "hash")] == 3          # hashing + hash + hash
    assert got[(1, "able")] == 2          # table + tables
    assert got[(2, "the")] == 3
    assert got[(1, "g")] == 1 and got[(1, "s")] == 1


def _py_encode(texts, L=4, rounds=2, maxlen=8, min_count=2):
    """Ordered-encode reference: final-model Viterbi per word with the
    (cost, j) tiebreak, pieces emitted start->end, words joined in
    document order; words longer than ``maxlen`` omitted."""
    counts = _py_unigram_counts(texts, L, rounds, maxlen, min_count)
    n_tot = sum(counts.values())
    cost = {p: round(-math.log(c / n_tot), 9) for p, c in counts.items()}

    def seg(w):
        n = len(w)
        best = [(0.0, -1)] + [(math.inf, -1)] * n
        for i in range(1, n + 1):
            cands = [
                (best[j][0] + cost[w[j:i]], j)
                for j in range(max(0, i - L), i)
                if w[j:i] in cost
            ]
            if cands:
                best[i] = min(cands)
        pieces, pos = [], n
        while pos > 0:
            j = best[pos][1]
            pieces.append(w[j:pos])
            pos = j
        return list(reversed(pieces))

    out = []
    for t in texts:
        pieces = []
        for w in (t or "").lower().split():
            if len(w) <= maxlen:
                pieces.extend(seg(w))
        out.append(" ".join(pieces))
    return out


def test_encode_docs_document_order_and_edges(spark):
    """The position-ordered encode surface: pieces appear in DOCUMENT
    order (not just the right multiset), out-of-vocabulary words
    (len > max_word_len) are omitted, and the empty/whitespace doc
    encodes to the empty string."""
    rows = TOY + [(3, ""), (4, "  "), (5, "hyperhashing table")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["uni_tokens"]
        for r in unigram_encode_docs(docs).collect()
    }
    ref = _py_encode([t for _, t in rows])
    assert got == {i: ref[n] for n, (i, _) in enumerate(rows)}
    assert len(got) == 5
    # order pinned explicitly, not just via the reference:
    # "hashing hash hash table tables" under the TOY model
    assert got[1] == "hash i n g hash hash t able t able s"
    assert got[3] == "" and got[4] == ""
    # "hyperhashing" (12 chars > max_word_len=8) is omitted; the
    # in-vocabulary neighbor still encodes
    assert got[5] == "t able"


def test_char_floor_invariant(spark):
    """Pins the invariant the Viterbi DP (and, harder, its DuckDB
    replay) relies on (r8 ADVICE): single-char pieces NEVER prune —
    every char of every trained word survives every EM round, so no
    DP position is ever unreachable. If this fails, the engines'
    unreachable-position encodings ((inf,-1) struct vs missing b{i}
    row) diverge silently; fix the floor before touching the DP."""
    docs = spark.createDataFrame(TOY, "doc_id long, text string")
    pieces = {
        r["piece"] for r in unigram_train(docs, vocab_size=10_000).collect()
    }
    chars = {
        ch
        for _, t in TOY
        for w in t.lower().split()
        if len(w) <= 8
        for ch in w
    }
    assert chars <= pieces
    # and the same invariant under the python reference across rounds
    for rounds in (1, 2, 3):
        counts = _py_unigram_counts(
            [t for _, t in TOY], L=4, rounds=rounds, maxlen=8, min_count=2
        )
        assert chars <= set(counts)


def test_param_guards():
    """rounds / max_piece_len / max_word_len all fail loudly —
    max_piece_len=0 would otherwise silently DIVERGE the engines
    (Spark's descending sequence fabricates zero-length pieces where
    DuckDB's range is empty; r8 review)."""
    with pytest.raises(ValueError, match="rounds"):
        unigram_train_oracle_sql(rounds=0)
    with pytest.raises(ValueError, match="rounds"):
        unigram_token_counts_oracle_sql(rounds=0)
    with pytest.raises(ValueError, match="max_piece_len"):
        unigram_train_oracle_sql(max_piece_len=0)
    with pytest.raises(ValueError, match="max_word_len"):
        unigram_token_counts_oracle_sql(max_word_len=0)


def _duck_con(rows):
    import duckdb

    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '" + t.replace("'", "''") + "')" for i, t in rows
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) t(doc_id, text)"
    )
    return con


def test_oracle_matches_reference_on_random_corpora():
    """Property sweep WITHOUT Spark in the loop (fast): the DuckDB
    oracle equals the pure-Python hard-EM reference on random
    small-alphabet corpora (heavy substring sharing exercises the DP
    tiebreaks, the prune, and the char floor); Spark==DuckDB is pinned
    on the toy corpus and the fixtures, so this transitively hardens
    the Spark fold too."""
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    doc = st.lists(word, min_size=1, max_size=6).map(" ".join)

    @given(st.lists(doc, min_size=1, max_size=4))
    @settings(max_examples=40, deadline=None)
    def check(texts):
        rows = list(enumerate(texts))
        con = _duck_con(rows)
        got = sorted(
            tuple(r)
            for r in con.execute(
                unigram_train_oracle_sql(
                    vocab_size=64, max_piece_len=3, rounds=2,
                    max_word_len=6, min_count=2,
                )
            ).fetchall()
        )
        ref = sorted(
            _py_train(texts, vocab_size=64, L=3, rounds=2, maxlen=6,
                      min_count=2)
        )
        assert got == ref, texts

    check()


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_oracles_match_spark_on_fixture(spark, sf):
    """Registration rehearsal (r9 contract keys): train AND token-counts oracles
    match Spark exactly on the real fixtures (the driver-gate
    comparison)."""
    import duckdb

    from bht_etl_app_spark.session import load_table

    docs = load_table(spark, sf, "documents")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    s = sorted(tuple(r) for r in unigram_train(docs).collect())
    o = sorted(
        tuple(r) for r in con.execute(unigram_train_oracle_sql()).fetchall()
    )
    assert s == o and len(s) > 0
    s2 = sorted(tuple(r) for r in unigram_token_counts(docs).collect())
    o2 = sorted(
        tuple(r)
        for r in con.execute(unigram_token_counts_oracle_sql()).fetchall()
    )
    assert s2 == o2 and len(s2) > 0
    s3 = sorted(tuple(r) for r in unigram_encode_docs(docs).collect())
    o3 = sorted(
        tuple(r)
        for r in con.execute(unigram_encode_docs_oracle_sql()).fetchall()
    )
    assert s3 == o3 and len(s3) > 0


def test_tokenizer_fertility_compare_matches_oracle(spark):
    """Contract rehearsal for tokenizer_fertility_compare at the
    small fixture: Spark == DuckDB for the composed BPE + unigram
    fertility report, plus sanity on the ratio direction (the
    48-piece unigram model keeps frequent words whole, so its
    fertility must undercut 12-merge BPE's on this corpus)."""
    import importlib.util

    import duckdb

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r)
        for r in entry.queries()["tokenizer_fertility_compare"](
            spark, sf
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    exp = sorted(
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["tokenizer_fertility_compare"]
        ).fetchall()
    )
    assert got == exp and len(got) == 20
    for row in got:
        assert row[5] > row[6] > 1.0  # bpe_per_word > uni_per_word

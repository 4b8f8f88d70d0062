"""BPE tokenizer training/encoding vs an independent pure-Python
reference implementation (textbook Sennrich merge loop over a word-
frequency dict — no Spark, no DuckDB)."""

import importlib.util
import os
from collections import Counter

import pytest

from bht_etl_app_spark.operators.bpe import bpe_token_counts, bpe_train


def _load_tool(filename, modname=None):
    """Import a tools/ script (they are standalone files, not package
    modules) under its own module name."""
    spec = importlib.util.spec_from_file_location(
        modname or filename.rsplit(".", 1)[0],
        os.path.join(os.path.dirname(__file__), "..", "tools", filename),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _python_bpe(texts, num_merges):
    """Reference BPE: word-freq dict, greedy most-frequent adjacent
    pair, ties broken by (pair) ascending; returns (merges, per-word
    token counts)."""
    wc = Counter(w for t in texts for w in t.lower().split() if w)
    segs = {w: tuple(w) for w in wc}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = Counter()
        for w, seg in segs.items():
            for i in range(len(seg) - 1):
                pairs[(seg[i], seg[i + 1])] += wc[w]
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, c))
        for w, seg in segs.items():
            out, i = [], 0
            while i < len(seg):
                if i + 1 < len(seg) and seg[i] == a and seg[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            segs[w] = tuple(out)
    return merges, {w: len(seg) for w, seg in segs.items()}


TEXTS = [
    "the cat sat on the mat the cat sat",
    "the dog sat on the log the dog ran",
    "lowest lower low lowering lowered",
    "newer newest new renew newness",
    "aaa aaaa aa aaa aaaa",  # overlapping-run merge semantics
    "abab ababab ab abab",   # re-pairing after merges
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


@pytest.mark.parametrize("k", [1, 5, 12])
def test_bpe_train_matches_python_reference(docs, k):
    merges_df, _ = bpe_train(docs, num_merges=k)
    got = [tuple(r) for r in merges_df.orderBy("rank").collect()]
    exp, _ = _python_bpe(TEXTS, k)
    assert got == exp


def test_bpe_vocab_token_counts_match_python_reference(docs):
    _, vocab = bpe_train(docs, num_merges=8)
    got = {r["word"]: r["n_tokens"] for r in vocab.collect()}
    _, exp = _python_bpe(TEXTS, 8)
    assert got == exp


def test_bpe_doc_counts_sum_word_counts(docs):
    rows = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs, num_merges=8).collect()
    }
    _, per_word = _python_bpe(TEXTS, 8)
    for i, t in enumerate(TEXTS):
        words = t.lower().split()
        assert rows[i] == (len(words), sum(per_word[w] for w in words))


def test_bpe_empty_docs_report_zero(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs, num_merges=2).collect()
    }
    assert rows[2] == (0, 0) and rows[3] == (0, 0)


def test_bpe_merge_supply_exhaustion_stops_early(spark):
    # vocabulary of single characters: after merging the only pair
    # supply dry-runs; the merge table must be shorter than requested
    docs = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    merges_df, vocab = bpe_train(docs, num_merges=10)
    got = [tuple(r) for r in merges_df.collect()]
    assert got == [(1, "a", "b", 3)]
    assert {r["word"]: r["n_tokens"] for r in vocab.collect()} == {"ab": 1}


def test_bpe_token_counts_broadcasts_vocab(docs):
    plan = (
        bpe_token_counts(docs, num_merges=2)
        ._jdf.queryExecution()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "broadcast" in plan.lower()
    assert "BatchEvalPython" not in plan, "BPE encode dropped to Python"


def test_bpe_sentinel_control_chars_in_text_are_dropped(spark):
    """Stray \\x01/\\x02 control bytes in crawl text must not corrupt
    segmentation: words carrying them are excluded from training and
    encoding (LEFT join -> they contribute no subword tokens)."""
    docs = spark.createDataFrame(
        [(1, "ab ab a\x01b a\x02b"), (2, "ab cd")],
        "doc_id long, text string",
    )
    merges_df, vocab = bpe_train(docs, num_merges=4)
    words = {r["word"] for r in vocab.collect()}
    assert words == {"ab", "cd"}
    got = [tuple(r) for r in merges_df.collect()]
    assert got[0] == (1, "a", "b", 3)  # 3 clean "ab" occurrences


def test_bpe_vocab_owns_word_count_cache(spark):
    """`_, vocab = bpe_train(...)` drops merges_df immediately; the
    persisted word-count cache must survive for vocab's evaluation
    (it is tracked on vocab, not on the driver-local merge table)."""
    import gc

    docs = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "ab cd cd")], "doc_id long, text string"
    )
    _, vocab = bpe_train(docs, num_merges=2)
    gc.collect()  # would fire merges_df's finalizer under the old wiring
    assert {r["word"]: r["n_tokens"] for r in vocab.collect()} == {
        "ab": 1, "cd": 1,
    }


def test_bpe_encode_docs_reassembles_in_document_order(spark):
    from bht_etl_app_spark.operators.bpe import bpe_encode_docs

    docs = spark.createDataFrame(
        [(1, "lower lowest low"), (2, ""), (3, "newer lower")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode_docs(docs, num_merges=3).collect()
    }
    # pieces concatenated per word, words in document order; the
    # trained merges must make identical words segment identically
    assert got[2] == ""
    w1 = got[1].split()
    assert "".join(w1) == "lowerlowestlow"
    seg = dict()
    for d, text in ((1, "lower lowest low"), (3, "newer lower")):
        pieces = got[d]
        # reconstruct word boundaries: pieces join back to the words
        rest = pieces.replace(" ", "")
        assert rest == text.replace(" ", "")


def test_bpe_encode_matches_token_counts(spark):
    """n_bpe_tokens from bpe_token_counts equals the piece count of
    bpe_encode_docs for every doc — the two views of one tokenizer."""
    from bht_etl_app_spark.operators.bpe import bpe_encode_docs, bpe_token_counts

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, num_merges=8).collect()
    }
    enc = {
        r["doc_id"]: len(r["bpe_tokens"].split())
        for r in bpe_encode_docs(docs, num_merges=8).collect()
    }
    assert counts == enc


# ---------------------------------------------------------------------------
# cross-engine tie canonicalization + driver-canonicalization pins
# (r5 driver red on bpe_merges: VERDICT r5 item #2)
# ---------------------------------------------------------------------------

# Constructed tie corpus: at round 1 the pairs (p,q), (u,v), (x,y)
# ALL have weighted frequency 3 — the shared total order (freq DESC,
# a ASC, b ASC) must pick (p,q) in both engines. Round 2 genuinely
# ties again ((u,v) vs (x,y), both 3) and must pick (u,v); round 3
# takes the leftover (x,y). Two real tie rounds, both rank-dependent.
TIE_TEXTS = [
    "xy xy xy pq pq pq uv uv uv",
]


def _duckdb_merges(texts, num_merges, tmpdir):
    """Run the DuckDB merges oracle over an ad-hoc documents table."""
    import duckdb
    import pandas as pd

    from bht_etl_app_spark.operators.bpe import bpe_oracle_sql

    path = os.path.join(str(tmpdir), "documents.parquet")
    pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    ).to_parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    return con.execute(bpe_oracle_sql(num_merges)["merges"])


def test_bpe_tie_break_agrees_across_engines(spark, tmp_path):
    """On a corpus with exact pair-frequency ties at multiple rounds,
    Spark, the pure-Python reference, and the DuckDB oracle must all
    produce the SAME merge table — the (freq DESC, lhs ASC, rhs ASC)
    total order is engine-independent (binary string collation both
    sides)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TIE_TEXTS)], "doc_id long, text string"
    )
    merges_df, _ = bpe_train(docs, num_merges=4)
    got = [tuple(r) for r in merges_df.orderBy("rank").collect()]
    exp, _ = _python_bpe(TIE_TEXTS, 4)
    assert got == exp
    # both tie rounds resolved lexicographically, in rank order
    assert [g[1:3] for g in got[:3]] == [("p", "q"), ("u", "v"), ("x", "y")]
    oracle = [tuple(r) for r in _duckdb_merges(TIE_TEXTS, 4, tmp_path).fetchall()]
    assert oracle == got


def test_bpe_fixture_corpus_merge_tables_identical_across_engines(
    spark, tmp_path
):
    """Full 12-round merge-table equality Spark vs DuckDB on the
    module fixture corpus — any tie the corpus happens to contain is
    covered by the shared total order."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges_df, _ = bpe_train(docs, num_merges=12)
    got = [tuple(r) for r in merges_df.orderBy("rank").collect()]
    oracle = [tuple(r) for r in _duckdb_merges(TEXTS, 12, tmp_path).fetchall()]
    assert oracle == got


def test_bpe_merges_oracle_is_driver_hashable(tmp_path):
    """Regression pin for the r5 driver red: the merges oracle's
    pandas conversion (the driver's canonicalization path) must yield
    int64 freq — sum(BIGINT) is HUGEINT in DuckDB and lands as
    float64 without the BIGINT cast, hash-diverging from Spark's
    int64 on equal values."""
    df = _duckdb_merges(TEXTS, 12, tmp_path).df()
    assert str(df["freq"].dtype) == "int64"


def test_contract_type_hazard_rules():
    """The lint hazard predicates catch exactly the r5 driver-red
    classes and pass the types every green oracle uses."""
    lint = _load_tool("lint_contract.py")

    assert lint.oracle_type_hazard("HUGEINT")
    assert lint.oracle_type_hazard("BIGINT[]")
    assert lint.oracle_type_hazard("BIGINT[3]")  # fixed-size arrays too
    assert lint.oracle_type_hazard("DOUBLE[64]")
    assert lint.oracle_type_hazard("STRUCT(a BIGINT)")
    assert lint.oracle_type_hazard("MAP(VARCHAR, BIGINT)")
    for ok in ("BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE",
               "TIMESTAMP", "BOOLEAN", "DECIMAL(38,4)"):
        assert not lint.oracle_type_hazard(ok)

    assert lint.spark_type_hazard("array<bigint>")
    assert lint.spark_type_hazard("struct<a:bigint>")
    assert lint.spark_type_hazard("map<string,bigint>")
    for ok in ("bigint", "int", "double", "string", "date",
               "timestamp", "boolean", "decimal(38,4)"):
        assert not lint.spark_type_hazard(ok)


def test_check_oracle_rejects_nested_cells():
    """check_oracle's normalizer must RAISE on list cells (driver-
    faithful) instead of stringifying them — r5's pq_codes was
    locally green via str() while driver-red unhashable."""
    import pytest as _pytest

    chk = _load_tool("check_oracle.py")

    with _pytest.raises(TypeError, match="nested cell"):
        chk._norm_val([1, 2])
    with _pytest.raises(TypeError):
        chk._norm_val({"a": 1})
    assert chk._norm_val(3) == ("i", 3)
    assert chk._norm_val("x") == ("s", "x")


def test_lint_type_class_rules():
    """The cross-engine type-class lint: same-class widths pass
    (driver-green precedent), class switches flag."""
    lint = _load_tool("lint_contract.py", "lint_contract2")

    tc = lint.type_class
    assert tc("bigint") == tc("INTEGER")       # width canonicalized
    assert tc("double") == tc("DOUBLE")
    assert tc("string") == tc("VARCHAR")
    assert tc("timestamp") == tc("TIMESTAMP")  # plain ts: green precedent
    assert tc("binary") == tc("BLOB")          # same class, no false flag
    assert tc("decimal(38,4)") != tc("DOUBLE")  # Decimal obj vs float64
    assert tc("date") != tc("TIMESTAMP")        # date obj vs datetime64
    assert tc("bigint") != tc("HUGEINT")        # int64 vs float64
    # tz-aware is its own class: duckdb TIMESTAMPTZ -> pandas tz-aware
    # datetime64, Spark timestamps arrive naive — no green precedent
    assert tc("timestamp") != tc("TIMESTAMP WITH TIME ZONE")
    assert tc("timestamp") != tc("TIMESTAMPTZ")
    # 32-bit float is NOT double's class: pandas canonicalizes a Spark
    # FloatType column to float32 vs the oracle DOUBLE's float64 and
    # the driver hash diverges on equal values (ADVICE r6)
    assert tc("float") != tc("DOUBLE")
    assert tc("real") != tc("double")
    assert tc("float") == tc("REAL")  # but the 32-bit pair is one class

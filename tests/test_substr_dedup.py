"""ExactSubstr duplicated-span detection vs an independent pure-Python
reference (gram-cover + interval merge — no Spark), plus the DuckDB
oracle rehearsals on the real fixtures. Staged-for-r8 operator: these
differentials ARE its verification until contract window budget
exists (the r6 staging convention)."""

from collections import Counter

import pytest

from bht_etl_app_spark.operators.substr_dedup import (
    exact_substr_scrub,
    exact_substr_scrub_oracle_sql,
    exact_substr_spans,
    exact_substr_spans_oracle_sql,
    exact_substr_stats,
    exact_substr_stats_oracle_sql,
)

TEXTS = [
    # docs 0/1 share an 8-token run at DIFFERENT offsets (1 vs 4) —
    # the unaligned case fixed-chunk dedup structurally misses
    (0, "one two three four five six seven eight tail0 tail1"),
    (1, "pre1 pre2 pre3 one two three four five six seven eight"),
    # doc 2 repeats a 5-gram WITHIN itself (any second occurrence
    # counts) and shares nothing with other docs
    (2, "aa bb cc dd ee zz aa bb cc dd ee"),
    # doc 3: unique content, no duplicated grams
    (3, "totally unique content with no repeats anywhere at all"),
    # doc 4: shorter than k -> no grams at all
    (4, "tiny doc"),
    # doc 5: empty -> 0 tokens, NULL dup_frac
    (5, ""),
    # docs 6/7/8: doc 6 carries TWO distinct duplicated substrings
    # that ABUT (A=[1,5] dup'd with doc 7, B=[6,10] dup'd with doc 8,
    # no duplicated gram spans the boundary) -> ONE maximal covered
    # run [1,10] (r7 review: abutting covers merge)
    (6, "a1 a2 a3 a4 a5 b1 b2 b3 b4 b5"),
    (7, "a1 a2 a3 a4 a5 xx"),
    (8, "yy b1 b2 b3 b4 b5"),
]
K = 5


def _py_spans(texts, k):
    toks = {i: t.lower().split() for i, t in texts}
    fps = Counter()
    for tk in toks.values():
        for i in range(len(tk) - k + 1):
            fps[" ".join(tk[i:i + k])] += 1
    out = {}
    for i, tk in toks.items():
        starts = [
            p + 1  # 1-based
            for p in range(len(tk) - k + 1)
            if fps[" ".join(tk[p:p + k])] >= 2
        ]
        spans = []
        for s in starts:
            if spans and s <= spans[-1][1] + 1:
                # overlapping OR abutting covers extend the running
                # span — the "maximal covered run" contract: two
                # distinct duplicated substrings that touch report as
                # one covered run
                spans[-1][1] = max(spans[-1][1], s + k - 1)
            else:
                spans.append([s, s + k - 1])
        out[i] = [tuple(sp) for sp in spans]
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_spans_match_reference_and_semantics(docs):
    got = {}
    for r in exact_substr_spans(docs, k=K).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_tokens"])
        )
    ref = _py_spans(TEXTS, K)
    for i in got:
        got[i].sort()
    # doc 0: the shared 8-token run starts at token 1 -> one maximal
    # span [1, 8] (4 overlapping duplicated 5-grams merged)
    assert got[0] == [(1, 8, 8)]
    # doc 1: same run at offset 4 -> [4, 11] (the UNALIGNED catch)
    assert got[1] == [(4, 11, 8)]
    # doc 2: "aa bb cc dd ee" occurs at 1 and 7 -> two spans (gap at
    # position 6 breaks the cover)
    assert got[2] == [(1, 5, 5), (7, 11, 5)]
    # docs 3-5: nothing duplicated / too short / empty
    assert 3 not in got and 4 not in got and 5 not in got
    # doc 6: two distinct ABUTTING duplicated substrings merge into
    # one maximal covered run (covers [1,5]+[6,10] -> [1,10])
    assert got[6] == [(1, 10, 10)]
    assert got[7] == [(1, 5, 5)] and got[8] == [(2, 6, 5)]
    # full differential against the reference merge
    for i, spans in ref.items():
        assert got.get(i, []) == [(s, e, e - s + 1) for s, e in spans]


def test_stats_spine_and_empty_docs(docs):
    rows = {r["doc_id"]: r for r in exact_substr_stats(docs, k=K).collect()}
    assert set(rows) == {0, 1, 2, 3, 4, 5, 6, 7, 8}
    assert (rows[0]["dup_tokens"], rows[0]["n_spans"]) == (8, 1)
    assert rows[0]["dup_frac"] == pytest.approx(8 / 10)
    assert (rows[2]["dup_tokens"], rows[2]["n_spans"]) == (10, 2)
    assert (rows[3]["dup_tokens"], rows[3]["n_spans"]) == (0, 0)
    assert rows[3]["dup_frac"] == 0.0
    # empty doc: structural NULL, never 0/0
    assert rows[5]["n_tokens"] == 0 and rows[5]["dup_frac"] is None


def test_stats_duplicate_ids_clamp_and_match_scrub(spark):
    """r7 ADVICE (all three items on this operator): stats are per-ROW
    against the doc-level spans — ``dup_tokens`` equals the scrub's
    ``n_removed`` by construction (each span clamped to the row's own
    length, so ``dup_frac`` can never exceed 1, where the old
    doc-level-sum join reported 3.0 on the 2-token row here), NULL
    text measures like the empty string, and the oracle replays the
    same per-row shape."""
    import duckdb

    rows = [
        # "p q r s t" duplicates between the first two rows -> the
        # pooled doc-1 cover merges to ONE span [1, 6]
        (1, "p q r s t u v w"),
        (1, "x p q r s t"),
        (1, "p q"),  # the doc-level span overflows this 2-token row
        (9, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = sorted(
        (tuple(r) for r in exact_substr_stats(df, k=K).collect()),
        key=lambda t: (t[0], t[1]),
    )
    assert stats == [
        (1, 2, 2, 1, 1.0),       # clamped: min(6, 2) - 1 + 1 = 2
        (1, 6, 6, 1, 1.0),
        (1, 8, 6, 1, 0.75),
        (9, 0, 0, 0, None),      # NULL text == empty string
    ]
    assert all(r[4] is None or r[4] <= 1.0 for r in stats)
    # the defining invariant: stats.dup_tokens == scrub.n_removed,
    # row for row (pair rows by doc_id + row token count)
    scrub = sorted(
        ((r["doc_id"], r["n_kept"] + r["n_removed"], r["n_removed"])
         for r in exact_substr_scrub(df, k=K).collect()),
        key=lambda t: (t[0], t[1]),
    )
    assert [(d, n, dup) for d, n, dup, _, _ in stats] == scrub
    # and the oracle replays it
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'p q r s t u v w'), (1, 'x p q r s t'), (1, 'p q'), "
        "(9, CAST(NULL AS VARCHAR))) t(doc_id, text)"
    )
    orows = sorted(
        (tuple(r) for r in con.execute(
            exact_substr_stats_oracle_sql(k=K)
        ).fetchall()),
        key=lambda t: (t[0], t[1]),
    )
    assert stats == orows


def test_scrub_removes_spans_and_reassembles(docs):
    """The remover: tokens inside duplicated spans drop, survivors
    rejoin in document order; clean docs pass through (whitespace
    normalized), empty docs stay empty."""
    rows = {r["doc_id"]: r for r in exact_substr_scrub(docs, k=K).collect()}
    assert set(rows) == {0, 1, 2, 3, 4, 5, 6, 7, 8}
    # doc 0: span [1,8] removed -> only the two tail tokens survive
    assert rows[0]["scrubbed_text"] == "tail0 tail1"
    assert (rows[0]["n_kept"], rows[0]["n_removed"]) == (2, 8)
    # doc 1: span [4,11] removed -> the three pre tokens survive
    assert rows[1]["scrubbed_text"] == "pre1 pre2 pre3"
    # doc 2: spans [1,5] and [7,11] removed -> the middle gap survives
    assert rows[2]["scrubbed_text"] == "zz"
    # doc 3: nothing duplicated -> full lowercased rejoin
    assert rows[3]["scrubbed_text"] == TEXTS[3][1]
    assert rows[3]["n_removed"] == 0
    # doc 6: the merged abutting run [1,10] scrubs the WHOLE doc
    assert rows[6]["scrubbed_text"] == "" and rows[6]["n_kept"] == 0
    # empty doc stays empty
    assert rows[5]["scrubbed_text"] == "" and rows[5]["n_removed"] == 0


def test_scrub_duplicate_ids_and_null_text_match_oracle(spark):
    """Regression (r7 review, observed live as interleaved text and
    NEGATIVE n_removed): duplicate doc_ids scrub PER ROW (each row's
    own array against the doc-level spans — never pooled into one
    interleaved string), and NULL text scrubs like the empty string,
    in Spark AND the oracle alike."""
    import duckdb

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (1, "red orange yellow green blue indigo violet"),
        (9, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (tuple(r) for r in exact_substr_scrub(df, k=K).collect()),
        key=lambda t: tuple(map(repr, t)),
    )
    assert got == sorted(
        [
            (1, "alpha beta gamma delta epsilon zeta", 6, 0),
            (1, "red orange yellow green blue indigo violet", 7, 0),
            (9, "", 0, 0),
        ],
        key=lambda t: tuple(map(repr, t)),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'alpha beta gamma delta epsilon zeta'), "
        "(1, 'red orange yellow green blue indigo violet'), "
        "(9, CAST(NULL AS VARCHAR))) t(doc_id, text)"
    )
    orows = sorted(
        (tuple(r) for r in con.execute(
            exact_substr_scrub_oracle_sql(k=K)
        ).fetchall()),
        key=lambda t: tuple(map(repr, t)),
    )
    assert got == orows


def test_hash_family_twins_agree_and_fixture_parity(spark, docs):
    """The xxhash64 production twin (8-byte longs on the wire instead
    of 32-char md5 strings) is value-IDENTICAL to the portable md5
    family on spans, stats, and scrub — the fp is equality-only, so
    any injective hash yields the same cover (the dedup family's
    hash_fn-seam contract). Checked on the semantics fixture and on
    the real sf0.001 documents table (the rows-only keys' evidence)."""
    from bht_etl_app_spark.session import load_table

    fixture_docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for frame in (docs, fixture_docs):
        for fn, sort_cols in (
            (exact_substr_spans, ["doc_id", "span_start"]),
            (exact_substr_stats, ["doc_id", "n_tokens"]),
            (exact_substr_scrub, ["doc_id", "scrubbed_text"]),
        ):
            md5_rows = [
                tuple(r)
                for r in fn(frame, k=K).orderBy(*sort_cols).collect()
            ]
            xx_rows = [
                tuple(r)
                for r in fn(frame, k=K, hash_fn="xxhash64")
                .orderBy(*sort_cols)
                .collect()
            ]
            assert md5_rows == xx_rows and len(md5_rows) > 0, fn.__name__
    with pytest.raises(ValueError, match="unknown hash_fn"):
        exact_substr_spans(docs, k=K, hash_fn="sha1")


def test_k_guard():
    with pytest.raises(ValueError, match="k must be"):
        exact_substr_spans_oracle_sql(k=1)
    with pytest.raises(ValueError, match="k must be"):
        exact_substr_stats_oracle_sql(k=0)
    with pytest.raises(ValueError, match="k must be"):
        exact_substr_scrub_oracle_sql(k=1)


from tests.conftest import duckdb_oracle_rows as _oracle_rows  # noqa: E402
from tests.conftest import norm_oracle_rows as _norm  # noqa: E402


def _duck_view(rows):
    import duckdb

    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, " + ("CAST(NULL AS VARCHAR)" if t is None else
                     "'" + t.replace("'", "''") + "'") + ")"
        for i, t in rows
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) "
        "t(doc_id, text)"
    )
    return con


def test_spans_oracle_matches_reference_on_random_corpora():
    """Property sweep WITHOUT Spark in the loop (fast): the DuckDB
    oracle equals the pure-Python gram-cover reference on random
    small-vocabulary corpora (small vocab forces heavy duplication,
    exercising merge/edge paths); Spark==DuckDB is already pinned on
    the fixtures, so this transitively hardens the Spark logic too."""
    from hypothesis import given, settings, strategies as st

    word = st.sampled_from(["w0", "w1", "w2"])
    doc = st.lists(word, min_size=0, max_size=14).map(" ".join)

    @given(st.lists(doc, min_size=1, max_size=6))
    @settings(max_examples=60, deadline=None)
    def check(texts):
        rows = list(enumerate(texts))
        con = _duck_view(rows)
        got = {}
        for d_id, s, e, n in con.execute(
            exact_substr_spans_oracle_sql(k=3)
        ).fetchall():
            got.setdefault(d_id, []).append((s, e))
            assert n == e - s + 1
        for spans in got.values():
            spans.sort()
        ref = _py_spans(rows, 3)
        for i, spans in ref.items():
            assert got.get(i, []) == [tuple(sp) for sp in spans], (
                i, texts
            )

    check()


def test_scrub_oracle_matches_reference_on_random_corpora():
    """Same no-Spark property sweep for the remover: scrubbed text ==
    the reference's survivors rejoined, n_kept+n_removed == the doc's
    token count, per input row."""
    from hypothesis import given, settings, strategies as st

    word = st.sampled_from(["w0", "w1", "w2"])
    doc = st.lists(word, min_size=0, max_size=14).map(" ".join)

    @given(st.lists(doc, min_size=1, max_size=6))
    @settings(max_examples=60, deadline=None)
    def check(texts):
        rows = list(enumerate(texts))
        con = _duck_view(rows)
        ref = _py_spans(rows, 3)
        got = con.execute(exact_substr_scrub_oracle_sql(k=3)).fetchall()
        assert len(got) == len(rows)
        by_id = {r[0]: r for r in got}
        # stats replay the same per-row shape: dup_tokens == n_removed
        st = {r[0]: r for r in con.execute(
            exact_substr_stats_oracle_sql(k=3)
        ).fetchall()}
        for i, t in rows:
            toks = t.lower().split()
            covered = set()
            for s, e in ref.get(i, []):
                covered.update(range(s, e + 1))
            kept = [tk for p, tk in enumerate(toks, 1) if p not in covered]
            d_id, text, n_kept, n_removed = by_id[i]
            assert text == " ".join(kept), (i, texts)
            assert n_kept == len(kept)
            assert n_kept + n_removed == len(toks)
            _, n, dup, n_spans, frac = st[i]
            assert (n, dup) == (len(toks), n_removed), (i, texts)
            assert n_spans == len(ref.get(i, []))
            assert frac is None or frac <= 1.0

    check()


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_oracles_match_spark_on_fixture(spark, sf):
    """r8 registration rehearsal: both oracles match Spark exactly on
    the real fixture (the driver-gate comparison)."""
    from bht_etl_app_spark.session import load_table

    docs = load_table(spark, sf, "documents")
    for fn, sql in (
        (exact_substr_spans, exact_substr_spans_oracle_sql(k=K)),
        (exact_substr_stats, exact_substr_stats_oracle_sql(k=K)),
        (exact_substr_scrub, exact_substr_scrub_oracle_sql(k=K)),
    ):
        got = fn(docs, k=K)
        ocols, orows = _oracle_rows(sql, sf)
        srows = [tuple(r) for r in got.collect()]
        assert sorted(got.columns) == sorted(ocols)
        assert len(srows) == len(orows) > 0
        a, b = _norm(srows, got.columns), _norm(orows, ocols)
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        assert not diffs, (fn.__name__, diffs[:3])

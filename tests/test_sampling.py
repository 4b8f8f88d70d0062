"""Tests for deterministic sampling/splitting/packing and winnowing
fingerprints on tiny hand-checked inputs."""

import hashlib

from pyspark.sql import functions as F

from bht_etl_app_spark.operators.sampling import (
    pack_sequences,
    split_counts,
    stratified_sample,
    train_test_split,
)
from bht_etl_app_spark.operators.text import winnow_fingerprints


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_train_test_split_matches_hash_rule(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["split"] for r in train_test_split(docs).collect()}
    for i in range(200):
        expected = "train" if _md5(str(i))[:4] < "cccc" else "test"
        assert got[i] == expected
    # deterministic under re-run
    again = {r["doc_id"]: r["split"] for r in train_test_split(docs).collect()}
    assert got == again


def test_split_counts_partition(spark):
    docs = spark.createDataFrame(
        [(i, "x") for i in range(500)], "doc_id long, text string"
    )
    counts = {r["split"]: r["n"] for r in split_counts(docs).collect()}
    assert counts["train"] + counts["test"] == 500
    # hash split should be near 80/20 (wide tolerance; deterministic)
    assert 320 <= counts["train"] <= 480


def test_stratified_sample_caps_per_stratum(spark):
    rows = [(i, "x", "en" if i % 3 else "es") for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = stratified_sample(docs, "lang", "doc_id", 10).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang["en"]) == 10 and len(by_lang["es"]) == 10
    # selection = smallest md5(id) per stratum
    en_ids = {i for i, _, lang in rows if lang == "en"}
    expected = set(sorted(en_ids, key=lambda i: (_md5(str(i)), i))[:10])
    assert {r["doc_id"] for r in by_lang["en"]} == expected


def test_pack_sequences_bins_and_offsets(spark):
    docs = spark.createDataFrame(
        [
            (1, "s1", "a b c"),        # 3 tokens, start 0, bin 0
            (2, "s1", "d e f g"),      # 4 tokens, start 3, bin 0
            (3, "s1", "h i"),          # 2 tokens, start 7, bin 1
            (4, "s2", "x y z"),        # other source packs independently
        ],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(docs, budget=5).collect()}
    assert (out[1]["start_offset"], out[1]["bin"]) == (0, 0)
    assert (out[2]["start_offset"], out[2]["bin"]) == (3, 0)
    assert (out[3]["start_offset"], out[3]["bin"]) == (7, 1)
    assert (out[4]["start_offset"], out[4]["bin"]) == (0, 0)


def test_winnow_shared_substring_shares_fingerprint(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, f"AAAA {shared} BBBB"),
            (2, f"CCCC {shared} DDDD"),
            (3, "completely different content here entirely"),
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(docs, k=8, window=4).collect()
    fps = {}
    for r in out:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    # winnowing guarantee: shared substring of len >= k+window-1 -> shared fp
    assert fps[1] & fps[2], "docs sharing a long substring must share a fingerprint"
    # distinct rows only
    assert len(out) == sum(len(v) for v in fps.values())


def test_winnow_short_doc_empty(spark):
    docs = spark.createDataFrame(
        [(1, "tiny")], "doc_id long, text string"
    )
    assert winnow_fingerprints(docs, k=8, window=4).count() == 0


def test_weighted_sample_exact_k_weight_bias_and_determinism(spark):
    from bht_etl_app_spark.operators.sampling import weighted_sample_k

    rows = [(i, "heavy" if i < 200 else "light", 1000 if i < 200 else 1)
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    picked = weighted_sample_k(df, k=100).collect()
    assert len(picked) == 100
    heavy = sum(1 for r in picked if r["source"] == "heavy")
    # 1000:1 weights -> the heavy half should dominate the sample
    assert heavy >= 90
    # pure function of content: same ids under a different partitioning
    again = weighted_sample_k(df.repartition(7), k=100).collect()
    assert sorted(r["doc_id"] for r in picked) == sorted(
        r["doc_id"] for r in again
    )


def test_weighted_sample_zero_weight_excluded_and_k_validated(spark):
    from bht_etl_app_spark.operators.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [(1, "a", 0), (2, "a", 5)], "doc_id long, source string, n_chars long"
    )
    out = weighted_sample_k(df, k=10).collect()
    assert [r["doc_id"] for r in out] == [2]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        weighted_sample_k(df, k=0)


def test_weighted_sample_topk_plan(spark):
    """The global top-k must lower to TakeOrderedAndProject (per-
    partition heaps), not a global Sort."""
    from bht_etl_app_spark.operators.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [(i, "s", i + 1) for i in range(100)],
        "doc_id long, source string, n_chars long",
    )
    qe = weighted_sample_k(df, k=5)._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = qe.explainString(mode)
    assert "TakeOrderedAndProject" in plan
    assert "Sort (" not in plan


def test_leakage_safe_split_groups_near_dups(spark):
    """The leakage guard: a near-dup pair whose ids would land in
    DIFFERENT splits under the per-id hash must land together (keyed
    by the min reachable id), while singletons keep exactly their
    train_test_split assignment."""
    import hashlib

    from bht_etl_app_spark.operators.sampling import leakage_safe_split

    def side(key):
        return (
            "train"
            if hashlib.md5(str(key).encode()).hexdigest()[:4] < "cccc"
            else "test"
        )

    # find two ids on opposite sides of the plain split
    a = 1
    b = next(i for i in range(2, 200) if side(i) != side(a))
    text_dup = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [
        (a, text_dup),
        (b, text_dup + " w11"),          # jaccard > 0.8 with a
        (50, "x1 x2 x3 x4 x5 x6"),       # singleton
        (51, "y1 y2 y3 y4 y5 y6"),       # singleton
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(a, b)], "id_a long, id_b long"
    ).withColumn("jaccard", F.lit(0.9))
    got = {
        r["doc_id"]: (r["split_key"], r["split"])
        for r in leakage_safe_split(docs, pairs).collect()
    }
    assert len(got) == 4
    # the pair shares the min-id key and therefore the split
    assert got[a] == (a, side(a)) and got[b] == (a, side(a))
    assert side(a) != side(b), "fixture must exercise the leak case"
    # singletons: exactly the per-id rule
    assert got[50] == (50, side(50)) and got[51] == (51, side(51))


def test_split_leakage_audit_counts(spark):
    """On the planted corpus: one near-dup pair that straddles the
    plain per-id split -> n_straddling_plain=1, the safe invariant 0,
    leak rate 1/1."""
    import hashlib

    from bht_etl_app_spark.operators.sampling import split_leakage_audit

    def side(key):
        return (
            "train"
            if hashlib.md5(str(key).encode()).hexdigest()[:4] < "cccc"
            else "test"
        )

    a = 1
    b = next(i for i in range(2, 200) if side(i) != side(a))
    rows = [(a, "w1 w2 w3"), (b, "w1 w2 w3 w4"), (50, "x1 x2 x3")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(a, b)], "id_a long, id_b long"
    ).withColumn("jaccard", F.lit(0.9))
    r = split_leakage_audit(docs, pairs).collect()[0]
    assert r["n_pairs"] == 1
    assert r["n_straddling_plain"] == 1
    assert r["n_straddling_safe"] == 0
    assert r["leak_rate_plain"] == 1.0


def test_split_leakage_audit_sampled_slice_semantics(spark):
    """The _sampled contract twin is the SAME audit over a
    deterministic md5 half-slice — pinned here at the operator level:
    running the audit on a pre-filtered corpus (with pairs recomputed
    on the slice) counts only pairs whose BOTH endpoints survive the
    slice, and the structural safe invariant still holds."""
    import hashlib

    from bht_etl_app_spark.operators.sampling import split_leakage_audit

    def in_slice(key):
        return hashlib.md5(str(key).encode()).hexdigest()[:1] < "8"

    # a pair fully inside the slice and a pair with one foot outside
    ins = [i for i in range(200) if in_slice(i)]
    outs = [i for i in range(200) if not in_slice(i)]
    a, b, c = ins[0], ins[1], outs[0]
    rows = [(a, "w1 w2 w3"), (b, "w1 w2 w3"), (c, "w1 w2 w3")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sliced = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"
    )
    pairs_all = spark.createDataFrame(
        [(min(a, b), max(a, b)), (min(a, c), max(a, c))],
        "id_a long, id_b long",
    )
    # pairs recomputed on the slice = only the in-slice pair survives
    sliced_ids = {r["doc_id"] for r in sliced.collect()}
    assert sliced_ids == {a, b}
    pairs_sliced = pairs_all.where(
        F.col("id_a").isin(*sliced_ids) & F.col("id_b").isin(*sliced_ids)
    )
    r = split_leakage_audit(sliced, pairs_sliced).collect()[0]
    assert r["n_pairs"] == 1
    assert r["n_straddling_safe"] == 0


def test_packing_bin_stats_hand_case(spark):
    """budget=10, one source, docs of 4/4/4/8 tokens laid end-to-end:
    doc 3 ([8,12)) spans the first boundary (8%10+4 > 10); doc 4
    ([12,20)) ENDS exactly on the second boundary — ending flush is
    NOT a cross (12%10+8 == 10) -> 1 of 4 crossing; bins 0 and 1."""
    from bht_etl_app_spark.operators.sampling import packing_bin_stats

    rows = [
        (1, "s", "a b c d"),
        (2, "s", "e f g h"),
        (3, "s", "i j k l"),
        (4, "s", "m n o p q r s t"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    r = packing_bin_stats(docs, budget=10).collect()[0]
    assert r["n_docs"] == 4 and r["total_tokens"] == 20
    assert r["n_bins"] == 2
    assert r["n_crossing"] == 1
    assert r["frac_crossing"] == 0.25
    assert r["avg_docs_per_bin"] == 2.0


def test_leakage_safe_split_string_ids(spark):
    """r9 ADVICE (low): string ids must hash exactly as
    train_test_split hashes them — the old cast("long") nulled the
    key, md5(NULL) was NULL, and every document landed in 'test'."""
    import hashlib

    from bht_etl_app_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(f"doc-{i}", "t") for i in range(40)], "doc_id string, text string"
    )
    pairs = spark.createDataFrame([], "id_a string, id_b string")
    got = {r["doc_id"]: r["split"] for r in leakage_safe_split(docs, pairs).collect()}
    want = {
        f"doc-{i}": (
            "train"
            if hashlib.md5(f"doc-{i}".encode()).hexdigest()[:4] < "cccc"
            else "test"
        )
        for i in range(40)
    }
    assert got == want
    assert "train" in set(got.values()), "fixture must exercise both sides"


def test_split_leakage_audit_forwards_threshold(spark):
    """r9 ADVICE (medium): a non-default threshold must apply to BOTH
    split rules. With threshold 'ffff' everything is 'train' on both
    sides, so a straddling-under-default pair reports 0 straddles."""
    import hashlib

    from bht_etl_app_spark.operators.sampling import split_leakage_audit

    def side(key):
        return (
            "train"
            if hashlib.md5(str(key).encode()).hexdigest()[:4] < "cccc"
            else "test"
        )

    a = 1
    b = next(i for i in range(2, 200) if side(i) != side(a))
    docs = spark.createDataFrame(
        [(a, "w1 w2 w3"), (b, "w1 w2 w3 w4")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(a, b)], "id_a long, id_b long"
    ).withColumn("jaccard", F.lit(0.9))
    r = split_leakage_audit(docs, pairs, test_hex_threshold="ffff").collect()[0]
    assert r["n_pairs"] == 1
    assert r["n_straddling_plain"] == 0, "plain side must honor the threshold"
    assert r["n_straddling_safe"] == 0


def test_packing_bin_stats_counts_trailing_bins(spark):
    """r9 ADVICE (low): n_bins is ceil(total/budget), so a long last
    document whose tail occupies bins no document STARTS in still
    counts them. budget=10, docs of 4 and 26 tokens: start-bins are
    {0}, but the layout spans 3 chunks -> n_bins=3."""
    from bht_etl_app_spark.operators.sampling import packing_bin_stats

    rows = [
        (1, "s", " ".join(f"a{i}" for i in range(4))),
        (2, "s", " ".join(f"b{i}" for i in range(26))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    r = packing_bin_stats(docs, budget=10).collect()[0]
    assert r["total_tokens"] == 30
    assert r["n_bins"] == 3
    assert r["n_crossing"] == 1
    assert r["avg_docs_per_bin"] == round(2 / 3, 6)


def test_pack_sequences_harmonic_hand_case(spark):
    """budget=10: docs of 6,6 (class 1 -> own bins), 4,4,4 (class 2 ->
    2 per bin), 25 (class 0 overflow -> 3 chunks). Every non-overflow
    bin's fill must respect the budget; bins are contiguous per
    source in class order."""
    from bht_etl_app_spark.operators.sampling import pack_sequences_harmonic

    rows = [
        (1, "s", " ".join(f"a{i}" for i in range(6))),
        (2, "s", " ".join(f"b{i}" for i in range(6))),
        (3, "s", " ".join(f"c{i}" for i in range(4))),
        (4, "s", " ".join(f"d{i}" for i in range(4))),
        (5, "s", " ".join(f"e{i}" for i in range(4))),
        (6, "s", " ".join(f"f{i}" for i in range(25))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["doc_id"]: r.asDict() for r in
           pack_sequences_harmonic(docs, budget=10).collect()}
    assert {r["size_class"] for r in got.values()} == {0, 1, 2}
    # class 0: the overflow doc, 3 chunks
    assert got[6]["size_class"] == 0 and got[6]["bins_used"] == 3
    # class 1: 6-token docs one per bin; class 2: 4-token docs 2 per bin
    assert got[1]["bin"] != got[2]["bin"]
    assert got[3]["bin"] == got[4]["bin"] != got[5]["bin"]
    # validity: per-bin fill <= budget for every fitting doc
    import collections
    fill = collections.Counter()
    for r in got.values():
        if r["size_class"] >= 1:
            fill[r["bin"]] += r["n_tokens"]
    assert all(v <= 10 for v in fill.values())
    # bins contiguous 0..max within the source
    bins = sorted({r["bin"] for r in got.values()})
    assert bins == list(range(len(bins)))
    assert all(r["bins_used"] == 1 for r in got.values() if r["size_class"] >= 1)


def test_pack_sequences_harmonic_chunks_explode_and_reconcile(spark):
    """VERDICT r10 #6 pins on the hand-case corpus (budget 10): the
    25-token overflow doc explodes into chunks (10, 10, 5) at starts
    (0, 10, 20); fitting docs are one whole-document chunk; per
    source count(chunks) == sum(bins_used) and sum(chunk_tokens) ==
    total_tokens, and slot count (max(bin)+1 + sum(bins_used-1))
    equals packing_compare_stats' harmonic n_bins."""
    from bht_etl_app_spark.operators.sampling import (
        pack_sequences_harmonic,
        pack_sequences_harmonic_chunks,
        packing_compare_stats,
    )

    rows = [
        (1, "s", " ".join(f"a{i}" for i in range(6))),
        (2, "s", " ".join(f"b{i}" for i in range(6))),
        (3, "s", " ".join(f"c{i}" for i in range(4))),
        (4, "s", " ".join(f"d{i}" for i in range(4))),
        (5, "s", " ".join(f"e{i}" for i in range(4))),
        (6, "s", " ".join(f"f{i}" for i in range(25))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    chunks = [r.asDict() for r in
              pack_sequences_harmonic_chunks(docs, budget=10).collect()]
    six = sorted(
        (c for c in chunks if c["doc_id"] == 6),
        key=lambda c: c["chunk_index"],
    )
    assert [(c["chunk_index"], c["chunk_start_tok"], c["chunk_tokens"])
            for c in six] == [(0, 0, 10), (1, 10, 10), (2, 20, 5)]
    assert all(c["bin"] == six[0]["bin"] for c in six)
    for c in chunks:
        if c["doc_id"] != 6:
            assert (c["chunk_index"], c["chunk_start_tok"]) == (0, 0)
            assert c["chunk_tokens"] == c["n_tokens"]
    packed = [r.asDict() for r in
              pack_sequences_harmonic(docs, budget=10).collect()]
    assert len(chunks) == sum(r["bins_used"] for r in packed)
    assert sum(c["chunk_tokens"] for c in chunks) == sum(
        r["n_tokens"] for r in packed
    )
    slots = max(r["bin"] for r in packed) + 1 + sum(
        r["bins_used"] - 1 for r in packed
    )
    stats = {
        r["packer"]: r.asDict()
        for r in packing_compare_stats(docs, budget=10).collect()
    }
    assert stats["harmonic"]["n_bins"] == slots


def test_packing_compare_stats_harmonic_kills_crossing(spark):
    """The report the packer exists for: harmonic frac_crossing is 0
    (no overflow docs here) while concat-and-chunk fragments, and
    both legs agree on totals."""
    from bht_etl_app_spark.operators.sampling import packing_compare_stats

    rows = [
        (i, "s", " ".join(f"w{i}_{j}" for j in range(7))) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    legs = {r["packer"]: r.asDict()
            for r in packing_compare_stats(docs, budget=10).collect()}
    assert legs["concat_chunk"]["n_crossing"] > 0
    assert legs["harmonic"]["n_crossing"] == 0
    assert legs["harmonic"]["frac_crossing"] == 0.0
    assert legs["concat_chunk"]["total_tokens"] == legs["harmonic"]["total_tokens"] == 70
    assert legs["concat_chunk"]["n_bins"] == 7   # ceil(70/10)
    assert legs["harmonic"]["n_bins"] == 10      # class 1: one 7-token doc per bin
    assert legs["harmonic"]["utilization"] == 0.7


def test_pack_sequences_harmonic_tail_class_capacity(spark):
    """Harmonic-K tail: budget=100, K=8 -> virtual budget 88. Twenty
    10-token docs (cap 10 -> clamped to class 8) lay end-to-end and
    cut every 88 tokens: starts 0..80 are bin 0 (9 docs, 90 tokens
    <= 100 — the slack absorbs the straddler whole), 90..170 bin 1,
    180/190 bin 2. Never a near-empty bin per length class."""
    from bht_etl_app_spark.operators.sampling import pack_sequences_harmonic

    rows = [
        (i, "s", " ".join(f"w{i}_{j}" for j in range(10))) for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = pack_sequences_harmonic(docs, budget=100, max_classes=8).collect()
    assert all(r["size_class"] == 8 for r in got)
    import collections
    fill = collections.Counter()
    for r in got:
        fill[r["bin"]] += r["n_tokens"]
    assert sorted(fill) == [0, 1, 2]
    assert all(v <= 100 for v in fill.values())
    assert fill[0] == 90 and fill[1] == 90 and fill[2] == 20


def test_pack_sequences_sql_constant_unchanged():
    """PACK_SEQUENCES_SQL became generated in r10 (budget param for
    the compare twin); the 2048 contract constant must stay
    byte-identical to the verified pre-r10 literal."""
    from bht_etl_app_spark.operators.sampling import (
        PACK_SEQUENCES_SQL,
        pack_sequences_sql,
    )

    assert PACK_SEQUENCES_SQL == pack_sequences_sql(2048)
    assert "/ 2048.0" in PACK_SEQUENCES_SQL
    assert "regexp_split_to_array(trim(lower(text)), '\\s+')" in PACK_SEQUENCES_SQL


def test_pack_sequences_harmonic_vs_bfd_gap(spark):
    """Quality bound vs the sequential baseline Harmonic-K trades
    away for distribution: on a deterministic mixed-length corpus,
    the distributed packer's bin count stays within the classic
    harmonic envelope of true best-fit-decreasing (<= 1.7x + K), and
    no bin overflows the budget."""
    import hashlib

    budget, K = 100, 8
    lengths = [
        5 + int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 90
        for i in range(200)
    ]
    rows = [
        (i, "s", " ".join(f"w{i}_{j}" for j in range(n)))
        for i, n in enumerate(lengths)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    from bht_etl_app_spark.operators.sampling import pack_sequences_harmonic

    got = pack_sequences_harmonic(docs, budget=budget, max_classes=K).collect()
    import collections
    fill = collections.Counter()
    for r in got:
        assert r["bins_used"] == 1  # nothing exceeds the budget here
        fill[r["bin"]] += r["n_tokens"]
    assert all(v <= budget for v in fill.values())
    harmonic_bins = len(fill)
    # sequential best-fit-decreasing baseline (driver-side, the
    # algorithm the distributed packer approximates)
    bins: list[int] = []
    for n in sorted(lengths, reverse=True):
        best = None
        for i, free in enumerate(bins):
            if free >= n and (best is None or free < bins[best]):
                best = i
        if best is None:
            bins.append(budget - n)
        else:
            bins[best] -= n
    bfd_bins = len(bins)
    assert harmonic_bins <= 1.7 * bfd_bins + K, (harmonic_bins, bfd_bins)
    # and the whole point of the trade: zero crossing where BFD's
    # sequential state would also give zero — parity on the invariant
    assert all(r["size_class"] >= 1 for r in got)


def test_harmonic_chunks_feed_training_shards(spark, tmp_path):
    """End-to-end consumption of the harmonic layout (the gap VERDICT
    r10 #6 names): chunk rows -> token-slice chunk text ->
    write_training_shards -> read back. Every landed chunk's text has
    exactly chunk_tokens tokens, no chunk exceeds the budget, and the
    overflow document reassembles byte-identically from its chunks in
    (bin, chunk_index) order."""
    from pyspark.sql import functions as F

    from bht_etl_app_spark.io.sinks import write_training_shards
    from bht_etl_app_spark.operators.sampling import (
        pack_sequences_harmonic_chunks,
    )
    from bht_etl_app_spark.operators.text import tokens_expr

    rows = [
        (1, "s", " ".join(f"a{i}" for i in range(6))),
        (2, "s", " ".join(f"b{i}" for i in range(4))),
        (6, "s", " ".join(f"f{i}" for i in range(25))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    chunks = pack_sequences_harmonic_chunks(docs, budget=10)
    with_text = chunks.join(docs.select("doc_id", "text"), "doc_id").select(
        "source", "doc_id", "bin", "chunk_index", "chunk_tokens",
        F.array_join(
            F.slice(
                tokens_expr("text"),
                (F.col("chunk_start_tok") + 1).cast("int"),
                F.col("chunk_tokens").cast("int"),
            ),
            " ",
        ).alias("chunk_text"),
    )
    out = str(tmp_path / "shards")
    write_training_shards(
        with_text, out, partition_by="source",
        order_by=["bin", "chunk_index"], max_records_per_file=2,
    )
    back = spark.read.parquet(out).collect()
    assert len(back) == chunks.count() == 5  # 2 whole docs + 3 chunks
    for r in back:
        toks = [t for t in r["chunk_text"].split(" ") if t]
        assert len(toks) == r["chunk_tokens"] <= 10
    six = sorted(
        (r for r in back if r["doc_id"] == 6),
        key=lambda r: (r["bin"], r["chunk_index"]),
    )
    assert " ".join(r["chunk_text"] for r in six) == rows[2][2]

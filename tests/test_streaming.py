"""Structured Streaming tests: file source -> windowed/stateful aggs
-> memory sink, validated against the batch equivalents."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from bht_etl_app_spark.session import load_table
from bht_etl_app_spark.streaming import (
    read_event_stream,
    sessionized_counts,
    sliding_event_counts,
    stateful_user_running_totals,
    stream_to_memory,
    tumbling_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Re-write the fixture events as proper-timestamp parquet files
    (two files -> two-ish micro-batches)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    events = load_table(spark, SF, "events")
    events.repartition(2).write.mode("overwrite").parquet(d)
    return d


def _run(spark, df, name, output_mode="update"):
    q = stream_to_memory(df, name, output_mode=output_mode)
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_matches_batch(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    got = _run(spark, tumbling_event_counts(stream), "t_tumbling")
    events = spark.read.parquet(stream_dir)
    exp = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    g = {(r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    e = {(r["window_start"], r["event_type"]): r["n_events"] for r in exp.collect()}
    # update-mode memory sink may emit a key several times; last wins
    assert g == e


def test_sliding_windows_overlap(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    got = _run(spark, sliding_event_counts(stream), "t_sliding")
    rows = got.collect()
    assert len(rows) > 0
    # one event contributes to window/slide = 4 overlapping windows:
    # total (window,type) rows must exceed the tumbling row count
    tumb = spark.sql("SELECT count(DISTINCT window_start) AS n FROM t_tumbling").head()["n"]
    slid = got.select("window_start").distinct().count()
    assert slid > tumb


def test_session_windows(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    # session-window aggregation only supports append/complete output
    got = _run(
        spark, sessionized_counts(stream, gap="30 minutes"), "t_sessions",
        output_mode="append",
    )
    rows = got.collect()
    assert len(rows) > 0
    r = rows[0]
    assert r["session_end"] > r["session_start"]
    assert r["n_events"] >= 1


def test_stateful_running_totals(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    got = _run(spark, stateful_user_running_totals(stream), "t_state")
    # in update mode the memory sink appends each emission; take the max
    # (running totals are monotone) and compare with the batch truth
    final = (
        spark.sql("SELECT user_id, max(n_events) AS n FROM t_state GROUP BY user_id")
        .collect()
    )
    events = spark.read.parquet(stream_dir)
    exp = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got_map = {r["user_id"]: r["n"] for r in final}
    assert got_map == exp


def test_foreach_batch_partials_fold_to_batch_totals(spark, stream_dir, tmp_path):
    from bht_etl_app_spark.streaming.events import (
        combine_partials,
        foreach_batch_partials,
    )

    src = stream_dir
    out = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")
    q = foreach_batch_partials(read_event_stream(spark, src), out, ckpt)
    q.awaitTermination(120)

    got = {
        r["event_type"]: (r["n_events"], r["total_value"])
        for r in combine_partials(spark, out).collect()
    }
    exp = {
        r["event_type"]: (r["n_events"], r["total_value"])
        for r in load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .collect()
    }
    assert got == exp


def test_stream_static_enrich_broadcasts_dim(spark, stream_dir):
    from bht_etl_app_spark.streaming.events import stream_static_enrich

    users = spark.createDataFrame(
        [(i, f"segment_{i % 3}") for i in range(200)], "user_id long, segment string"
    )
    stream = read_event_stream(spark, stream_dir)
    got = _run(
        spark, stream_static_enrich(stream, users), "t_enrich", output_mode="append"
    )
    rows = got.collect()
    events_n = spark.read.parquet(stream_dir).count()
    assert len(rows) == events_n  # left join preserves every event
    matched = [r for r in rows if r["segment"] is not None]
    assert matched and all(
        r["segment"] == f"segment_{r['user_id'] % 3}" for r in matched
    )


def test_streaming_dedup_removes_replayed_batch(spark, stream_dir, tmp_path):
    from bht_etl_app_spark.streaming.events import streaming_dedup

    # simulate an at-least-once source: the same file delivered twice
    src = str(tmp_path / "replayed")
    events = spark.read.parquet(stream_dir)
    events.coalesce(1).write.mode("overwrite").parquet(src)
    import glob, shutil as sh
    f = glob.glob(os.path.join(src, "part-*.parquet"))[0]
    sh.copy(f, os.path.join(src, "replay-copy.parquet"))

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    got = _run(spark, streaming_dedup(stream), "t_dedup", output_mode="append")
    n_distinct = events.select("event_id").distinct().count()
    assert got.select("event_id").distinct().count() == n_distinct
    # every key emitted exactly once despite the duplicate delivery
    assert got.count() == n_distinct


def test_streaming_dedup_drops_jittered_replay(spark, stream_dir, tmp_path):
    """A replayed event with the same event_id but a shifted timestamp
    must still be deduplicated (ADVICE r1: dropDuplicates([key, ts])
    let it through; dropDuplicatesWithinWatermark([key]) catches it)."""
    from bht_etl_app_spark.streaming.events import streaming_dedup

    src = str(tmp_path / "jittered")
    events = spark.read.parquet(stream_dir)
    events.coalesce(1).write.mode("overwrite").parquet(src)
    # replay the same events with +1 minute timestamp jitter (well
    # inside the 2h watermark) as a second source file
    events.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 MINUTE")) \
        .coalesce(1).write.mode("append").parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    got = _run(spark, streaming_dedup(stream), "t_dedup_jitter", output_mode="append")
    n_distinct = events.select("event_id").distinct().count()
    assert got.count() == n_distinct


def test_stream_stream_attribution_matches_batch(spark, stream_dir):
    from bht_etl_app_spark.streaming import stream_stream_attribution

    clicks = read_event_stream(spark, stream_dir).where(
        F.col("event_type") == "click"
    )
    purchases = read_event_stream(spark, stream_dir).where(
        F.col("event_type") == "purchase"
    )
    got = _run(
        spark,
        stream_stream_attribution(clicks, purchases, within="30 minutes"),
        "t_ss_attr",
        output_mode="append",
    )
    ev = spark.read.parquet(stream_dir)
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    exp = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") > F.col("purchase_ts") - F.expr("INTERVAL 30 minutes")),
    ).select("user_id", "purchase_id", "click_id")
    g = {(r["user_id"], r["purchase_id"], r["click_id"]) for r in got.collect()}
    e = {(r["user_id"], r["purchase_id"], r["click_id"]) for r in exp.collect()}
    # the streamed join may drop pairs whose click aged past the
    # watermark before the purchase arrived (micro-batch order), so
    # stream results must be a subset of batch — and non-trivial
    assert g <= e
    assert len(g) > 0


def test_streaming_corpus_ingest_matches_batch_gate(spark, tmp_path):
    """Stream-ingested shards must contain exactly the docs the BATCH
    quality gate keeps (same rules per micro-batch), partitioned by
    source, exactly once across multiple file drops."""
    import shutil

    from pyspark.sql import functions as F

    from bht_etl_app_spark.operators.corpus import quality_filter_decisions
    from bht_etl_app_spark.session import load_table
    from bht_etl_app_spark.streaming.events import (
        read_document_stream,
        streaming_corpus_ingest,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    land = tmp_path / "landing"
    land.mkdir()
    # two separate "drops" -> two micro-batches with maxFilesPerTrigger=1
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(land / "drop0")
    )
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(land / "drop1")
    )
    flat = tmp_path / "flat"
    flat.mkdir()
    i = 0
    for sub in sorted(land.iterdir()):
        for f in sub.glob("*.parquet"):
            shutil.copy(f, flat / f"drop{i}.parquet")
            i += 1

    out, ckpt = str(tmp_path / "shards"), str(tmp_path / "ckpt")
    stream = read_document_stream(spark, str(flat))
    q = streaming_corpus_ingest(stream, out, ckpt, min_tokens=5)
    q.awaitTermination(120)

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    keep = quality_filter_decisions(docs, min_tokens=5).where(F.col("keep"))
    exp = {r["doc_id"] for r in keep.collect()}
    assert got == exp
    # hive layout: batch partitions on top, source partitions inside
    import glob
    import os
    assert any(d.startswith("batch_id=") for d in os.listdir(out))
    assert glob.glob(out + "/batch_id=*/source=*"), "source dirs missing"

    # restart with the same checkpoint: no new batches, no duplicates
    q2 = streaming_corpus_ingest(
        read_document_stream(spark, str(flat)), out, ckpt, min_tokens=5
    )
    q2.awaitTermination(60)
    again = spark.read.parquet(out).count()
    assert again == len(exp)


def test_ingest_batch_replay_is_idempotent(spark, tmp_path):
    """A micro-batch replayed after a mid-write failure (checkpoint
    not committed) must REWRITE its batch partition, not duplicate
    surviving docs — the dynamic-partition-overwrite contract the
    docstring claims (r3 advisor finding)."""
    from pyspark.sql import functions as F

    from bht_etl_app_spark.operators.corpus import quality_filter_decisions
    from bht_etl_app_spark.session import load_table
    from bht_etl_app_spark.streaming.events import ingest_corpus_batch

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    b0 = docs.where(F.col("doc_id") % 2 == 0)
    b1 = docs.where(F.col("doc_id") % 2 == 1)
    out = str(tmp_path / "shards")

    ingest_corpus_batch(b0, 0, out, min_tokens=5)
    ingest_corpus_batch(b1, 1, out, min_tokens=5)
    first = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())

    # replay batch 0 (as after a failure before checkpoint commit)
    ingest_corpus_batch(b0, 0, out, min_tokens=5)
    again = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert again == first, "replay duplicated or dropped rows"
    # and batch 1 was untouched by batch 0's overwrite
    keep1 = quality_filter_decisions(b1, min_tokens=5).where(F.col("keep"))
    got1 = {
        r["doc_id"]
        for r in spark.read.parquet(out).where(F.col("batch_id") == 1).collect()
    }
    assert got1 == {r["doc_id"] for r in keep1.collect()}


def test_streaming_dedup_ingest_drops_cross_batch_near_dups(spark, tmp_path):
    """Continuous near-dup dedup: batch 2's dups of batch 1 survivors
    are dropped, in-batch groups keep their min id, and a replayed
    batch leaves the store unchanged."""
    from pyspark.sql import functions as F

    from bht_etl_app_spark.streaming.events import (
        ingest_dedup_batch,
        read_document_stream,
        streaming_dedup_ingest,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "entirely different content with no overlapping shingles anywhere"
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b0 = spark.createDataFrame(
        [(1, base, "en", "s", 1), (2, base + " tail", "en", "s", 1),
         (3, other, "en", "s", 1)],
        schema,
    )
    b1 = spark.createDataFrame(
        [(10, base, "en", "s", 1),               # dup of kept doc 1
         (11, "fresh unseen totally new words only here", "en", "s", 1)],
        schema,
    )
    land = tmp_path / "landing"
    land.mkdir()
    b0.coalesce(1).write.parquet(str(land / "d0"))
    b1.coalesce(1).write.parquet(str(land / "d1"))
    import shutil
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, sub in enumerate(sorted(land.iterdir())):
        for f in sub.glob("*.parquet"):
            shutil.copy(f, flat / f"drop{i}.parquet")

    out, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    q = streaming_dedup_ingest(read_document_stream(spark, str(flat)), out, ckpt)
    q.awaitTermination(120)

    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # batch 0: 1 kept (min of {1,2}), 3 kept; batch 1: 10 dropped
    # (near-dup of stored 1), 11 kept
    assert kept == {1, 3, 11}

    # replay the last batch directly: store unchanged
    ingest_dedup_batch(b1, 1, out)
    again = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert again == kept


def test_streaming_dedup_ingest_with_band_index_matches_rebanding(spark, tmp_path):
    """The persisted-band-index ingest path (r4 VERDICT item #5):
    identical kept set to the re-band-history path, the index holds
    exactly the survivors' band rows, and a replayed batch leaves
    BOTH the store and the probe result unchanged (its own appended
    index rows are excluded by the batch_id filter)."""
    from bht_etl_app_spark.streaming.events import ingest_dedup_batch

    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "entirely different content with no overlapping shingles anywhere"
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b0 = spark.createDataFrame(
        [(1, base, "en", "s", 1), (2, base + " tail", "en", "s", 1),
         (3, other, "en", "s", 1)],
        schema,
    )
    b1 = spark.createDataFrame(
        [(10, base, "en", "s", 1),
         (11, "fresh unseen totally new words only here", "en", "s", 1)],
        schema,
    )
    out = str(tmp_path / "store")
    tbl = "t_stream_band_idx"
    try:
        ingest_dedup_batch(b0, 0, out, band_index_table=tbl)
        ingest_dedup_batch(b1, 1, out, band_index_table=tbl)
        kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert kept == {1, 3, 11}  # same as the re-banding path's test
        idx_ids = {r["id"] for r in spark.table(tbl).collect()}
        assert idx_ids == {1, 3, 11}  # index holds survivors only

        # replay batch 1: store and index-derived result unchanged
        ingest_dedup_batch(b1, 1, out, band_index_table=tbl)
        again = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert again == kept
        # replay appended duplicate rows for batch 1 only — compaction
        # (covered in test_layout) reclaims them
        from bht_etl_app_spark.io.layout import compact_band_index

        compact_band_index(spark, tbl, num_buckets=8,
                           path=str(tmp_path / "idxc"))
        assert {r["id"] for r in spark.table(tbl).collect()} == {1, 3, 11}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_streaming_curate_ingest_full_chain(spark, tmp_path):
    """Streaming curation: every stage fires across batches — quality
    drops in-batch, exact dup vs the landed store drops, near-dup vs
    the store drops, decontamination vs the static benchmark drops —
    and a replayed batch leaves the store unchanged."""
    from bht_etl_app_spark.streaming.events import (
        ingest_curate_batch,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the green hills with great speed and joy today"
    )
    leaky = (
        "unique fresh wording all around here while quoting benchmark "
        "marker five gram match here now in the middle of it"
    )
    schema = "doc_id long, text string"
    bench = spark.createDataFrame(
        [(100, "benchmark marker five gram match here now indeed")], schema
    )
    out = str(tmp_path / "store")

    b0 = spark.createDataFrame(
        [(1, good), (2, "too short")], schema
    )
    ingest_curate_batch(b0, 0, out, bench)
    kept0 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept0 == {1}  # 2 fails the quality gate

    b1 = spark.createDataFrame(
        [
            (10, good),                       # exact dup of landed 1
            (11, good.replace("joy", "glee")),  # near-dup of landed 1
            (12, leaky),                      # contaminated
            (13, "completely different clean content about spark engines "
                 "running distributed pipelines across many machines while "
                 "landing curated survivor documents into partitioned stores"),
        ],
        schema,
    )
    ingest_curate_batch(b1, 1, out, bench)
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1, 13}

    # replay batch 1: store unchanged (dynamic-overwrite idempotency)
    ingest_curate_batch(b1, 1, out, bench)
    again = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert again == kept


def test_streaming_curate_ingest_extract_redact_pre_stages(spark, tmp_path):
    """The r10 pre-stages in the streaming chain: with
    extract_markup+redact on, a second-batch doc that differs from a
    landed doc only in markup and URL lands as an exact dup and is
    dropped; with the stages off it survives. Landed text is the
    transformed text (what the batch chain would emit)."""
    from bht_etl_app_spark.streaming.events import ingest_curate_batch

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the green hills with great speed and joy today"
    )
    schema = "doc_id long, text string"
    bench = spark.createDataFrame(
        [(100, "benchmark marker five gram match here now indeed")], schema
    )

    b0 = spark.createDataFrame(
        [(1, "<p>" + base + " see https://a.example/x </p>")], schema
    )
    b1 = spark.createDataFrame(
        [(2, "<div>" + base + " see https://b.example/y </div>")], schema
    )

    out_on = str(tmp_path / "on")
    ingest_curate_batch(b0, 0, out_on, bench, extract_markup=True, redact=True)
    ingest_curate_batch(b1, 1, out_on, bench, extract_markup=True, redact=True)
    landed = spark.read.parquet(out_on).collect()
    assert {r["doc_id"] for r in landed} == {1}
    assert landed[0]["text"] == base + " see <URL>"  # transformed text lands

    out_off = str(tmp_path / "off")
    ingest_curate_batch(b0, 0, out_off, bench)
    ingest_curate_batch(b1, 1, out_off, bench)
    # raw markup/URLs differ -> not an exact dup; near-dup may or may
    # not catch it depending on shingles, so only assert doc 2's text
    # landed untransformed if it survived
    rows = {r["doc_id"]: r["text"] for r in spark.read.parquet(out_off).collect()}
    assert rows[1].startswith("<p>")


def test_streaming_curate_redact_classes_matches_batch(spark, tmp_path):
    """ADVICE r10 pin: the streaming twin's redact_classes
    passthrough lands text byte-identical to the batch chain's
    widened-class redact stage — a batch chain configured with
    PII_REDACT_CLASSES now HAS a matching streaming configuration."""
    from bht_etl_app_spark.operators.text import (
        PII_REDACT_CLASSES,
        redact_expr,
    )
    from bht_etl_app_spark.streaming.events import ingest_curate_batch

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the green hills with great speed and joy today"
    )
    raw = base + " from 10.0.0.7 card 4111 1111 1111 1111 ssn 123-45-6789"
    schema = "doc_id long, text string"
    bench = spark.createDataFrame(
        [(100, "benchmark marker five gram match here now indeed")], schema
    )
    b0 = spark.createDataFrame([(1, raw)], schema)

    out = str(tmp_path / "pii")
    ingest_curate_batch(
        b0, 0, out, bench, redact=True, redact_classes=PII_REDACT_CLASSES
    )
    landed = spark.read.parquet(out).collect()
    want = (
        b0.select(redact_expr("text", PII_REDACT_CLASSES).alias("t"))
        .collect()[0]["t"]
    )
    assert landed[0]["text"] == want
    assert "<CC>" in want and "<SSN>" in want and "<IP>" in want

    # default (None) stays the URL+email set — the r9 byte contract
    out2 = str(tmp_path / "dflt")
    ingest_curate_batch(b0, 0, out2, bench, redact=True)
    assert spark.read.parquet(out2).collect()[0]["text"] == raw

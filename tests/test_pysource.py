"""Custom Python DataSource (Spark 4 API): partition planning,
default-mode reads, conf-gated filter pushdown, loud malformed-line
failure."""

import json
import os

import pytest


@pytest.fixture()
def shard_dir(tmp_path):
    for shard in range(3):
        with open(tmp_path / f"part-{shard}.jsonl", "w") as fh:
            for i in range(10):
                doc_id = shard * 10 + i
                fh.write(
                    json.dumps(
                        {"doc_id": doc_id, "text": f"doc {doc_id}",
                         "n_chars": 6 if doc_id % 2 == 0 else None}
                    )
                    + "\n"
                )
    return str(tmp_path)


def _register(spark):
    from bht_etl_app_spark.io.pysource import JsonlShardDataSource

    spark.dataSource.register(JsonlShardDataSource)


def test_pysource_partition_planning_and_read(spark, shard_dir):
    _register(spark)
    df = spark.read.format("bht_jsonl").option("path", shard_dir).load()
    # one partition per shard file — N-way parallel read
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 30
    got = sorted(r["doc_id"] for r in df.where("doc_id >= 25").collect())
    assert got == [25, 26, 27, 28, 29]
    # missing keys surface as NULLs, not drops
    assert df.where("n_chars IS NULL").count() == 15


def test_pysource_pushdown_mode_same_results(spark, shard_dir):
    _register(spark)
    key = "spark.sql.python.filterPushdown.enabled"
    spark.conf.set(key, "true")
    try:
        df = spark.read.format("bht_jsonl").option("path", shard_dir).load()
        got = sorted(
            r["doc_id"]
            for r in df.where(
                "doc_id > 4 AND doc_id <= 12 AND n_chars IS NOT NULL"
            ).collect()
        )
        assert got == [6, 8, 10, 12]
    finally:
        spark.conf.unset(key)


def test_pysource_pushfilters_partitions_supported_from_unsupported(spark):
    from pyspark.sql.datasource import EqualTo, Not
    from pyspark.sql.types import StructType

    from bht_etl_app_spark.io.pysource import JsonlShardPushdownReader

    schema = StructType.fromDDL("doc_id bigint, text string, n_chars bigint")
    rdr = JsonlShardPushdownReader({"path": "/nonexistent"}, schema)
    eq = EqualTo(("doc_id",), 3)
    nested = EqualTo(("props", "key"), "x")   # nested path: not pushable
    neg = Not(EqualTo(("doc_id",), 4))        # negation: not pushable
    unsupported = list(rdr.pushFilters([eq, nested, neg]))
    assert rdr.filters == [eq]
    assert unsupported == [nested, neg]


def test_pysource_malformed_line_fails_loudly(spark, tmp_path):
    _register(spark)
    with open(tmp_path / "bad.jsonl", "w") as fh:
        fh.write('{"doc_id": 1, "text": "ok", "n_chars": 2}\n')
        fh.write("this is not json\n")
    df = spark.read.format("bht_jsonl").option("path", str(tmp_path)).load()
    with pytest.raises(Exception, match="(?i)json|Expecting value"):
        df.collect()


def test_pysource_missing_path_or_empty_dir_raise(spark, tmp_path):
    _register(spark)
    with pytest.raises(Exception, match="path"):
        spark.read.format("bht_jsonl").load().collect()
    with pytest.raises(Exception, match="no .jsonl shards"):
        (
            spark.read.format("bht_jsonl")
            .option("path", str(tmp_path))
            .load()
            .collect()
        )


def test_pysource_streaming_incremental_and_exactly_once(spark, tmp_path):
    """The streaming half: new shards appended between availableNow
    runs arrive exactly once (shard-count offsets persisted in the
    checkpoint)."""
    import json as _json

    _register(spark)
    src = tmp_path / "shards"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_shard(idx, ids):
        with open(src / f"part-{idx:05d}.jsonl", "w") as fh:
            for i in ids:
                fh.write(
                    _json.dumps({"doc_id": i, "text": f"d{i}", "n_chars": 2})
                    + "\n"
                )

    def run_once():
        stream = (
            spark.readStream.format("bht_jsonl")
            .option("path", str(src))
            .schema("doc_id bigint, text string, n_chars bigint")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_shard(0, range(0, 5))
    write_shard(1, range(5, 10))
    run_once()
    got = sorted(r["doc_id"] for r in spark.read.parquet(str(sink)).collect())
    assert got == list(range(10))

    # producer appends one more shard; restart from the checkpoint —
    # ONLY the new shard lands (no replay of shards 0-1)
    write_shard(2, range(10, 13))
    run_once()
    got = sorted(r["doc_id"] for r in spark.read.parquet(str(sink)).collect())
    assert got == list(range(13))


def test_pysource_write_roundtrip_and_staging_cleanup(spark, tmp_path):
    """Write path: df.write.format('bht_jsonl') lands committed shards
    only (no _staging leftovers), and the batch reader round-trips the
    exact rows."""
    _register(spark)
    out = tmp_path / "out"
    out.mkdir()
    df = spark.createDataFrame(
        [(i, f"d{i}", i * 2) for i in range(25)],
        "doc_id long, text string, n_chars long",
    ).repartition(4)
    (
        df.write.format("bht_jsonl")
        .option("path", str(out))
        .mode("append")
        .save()
    )
    shards = [n for n in os.listdir(out) if n.endswith(".jsonl")]
    assert len(shards) == 4
    assert not (out / "_staging").exists()
    back = (
        spark.read.format("bht_jsonl").option("path", str(out)).load()
    )
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(25))
    # overwrite replaces the shard set rather than accumulating
    (
        df.limit(5).repartition(1).write.format("bht_jsonl")
        .option("path", str(out))
        .mode("overwrite")
        .save()
    )
    assert (
        spark.read.format("bht_jsonl").option("path", str(out)).load().count()
        == 5
    )


def test_pysource_failed_write_leaves_no_shards(spark, tmp_path):
    """Two-phase commit: a task failure aborts the job with ZERO
    committed shards visible to readers."""
    from pyspark.sql import functions as F

    _register(spark)
    out = tmp_path / "out"
    out.mkdir()
    df = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long"
    ).select(
        "doc_id",
        F.expr("CASE WHEN doc_id = 7 THEN raise_error('boom') "
               "ELSE 'ok' END").alias("text"),
        F.lit(2).alias("n_chars"),
    )
    with pytest.raises(Exception, match="boom"):
        (
            df.repartition(2).write.format("bht_jsonl")
            .option("path", str(out))
            .mode("append")
            .save()
        )
    assert [n for n in os.listdir(out) if n.endswith(".jsonl")] == []

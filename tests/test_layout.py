"""Layout tests: partition pruning, range-sorted files, and the
bucketed shuffle-free join — asserted on actual plans/files, not just
round-trips."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from bht_etl_app_spark.io.layout import (
    read_bucketed,
    write_bucketed,
    write_partitioned,
    write_range_sorted,
)
from bht_etl_app_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _formatted(spark, df):
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_partitioned_write_prunes(spark, tmp_path):
    events = load_table(spark, SF, "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(events, out, ["event_type"])

    # hive-style directories exist
    dirs = {os.path.basename(p) for p in glob.glob(out + "/event_type=*")}
    assert "event_type=click" in dirs

    back = spark.read.parquet(out).where(F.col("event_type") == "click")
    plan = _formatted(spark, back)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    exp = events.where(F.col("event_type") == "click").count()
    assert back.count() == exp


def test_range_sorted_write_stats(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    out = str(tmp_path / "orders_sorted")
    write_range_sorted(orders, out, ["o_orderkey"], num_files=4)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    # global range property: per-file key ranges do not overlap
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["o_orderkey"])["o_orderkey"].to_pylist()
        assert t == sorted(t), "rows not sorted within file"
        ranges.append((t[0], t[-1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file key ranges overlap"

    assert spark.read.parquet(out).count() == orders.count()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders.select("o_orderkey", "o_totalprice"),
                   "t_orders_b", "o_orderkey", 4, sort_cols=["o_orderkey"])
    write_bucketed(lineitem.select("l_orderkey", "l_quantity"),
                   "t_lineitem_b", "l_orderkey", 4, sort_cols=["l_orderkey"])
    try:
        a = read_bucketed(spark, "t_orders_b")
        b = read_bucketed(spark, "t_lineitem_b")
        # disable broadcast so the join would otherwise shuffle
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = a.join(b, F.col("o_orderkey") == F.col("l_orderkey"))
            plan = _formatted(spark, j)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, "bucketed join should not shuffle"
            # sanity: same result as the plain join
            plain = orders.join(
                lineitem, F.col("o_orderkey") == F.col("l_orderkey")
            )
            assert j.count() == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    from bht_etl_app_spark.io.layout import compact

    events = load_table(spark, SF, "events")
    shattered = str(tmp_path / "shattered")
    events.repartition(32).write.parquet(shattered)
    assert len(glob.glob(shattered + "/part-*.parquet")) == 32

    compacted = str(tmp_path / "compacted")
    n = compact(spark, shattered, compacted, target_file_mb=128)
    assert n == 1  # tiny dataset -> one file
    assert len(glob.glob(compacted + "/part-*.parquet")) == 1
    assert spark.read.parquet(compacted).count() == events.count()

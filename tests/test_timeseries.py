"""Unit tests for sessionize / session_stats / asof_join on tiny
literal frames covering the edge cases: gap exactly at the threshold,
ties on timestamp, no-match nulls, payload-type preservation."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from bht_etl_app_spark.operators.timeseries import asof_join, session_stats, sessionize


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tiny_events(spark):
    rows = [
        # user 1: 3 events, second gap exactly 1800s (same session —
        # threshold is strict '>'), third gap 1801s (new session)
        (1, 1, _ts("2024-01-01T00:00:00"), 10.0),
        (2, 1, _ts("2024-01-01T00:30:00"), 20.0),
        (3, 1, _ts("2024-01-01T01:00:01"), 30.0),
        # user 2: single event
        (4, 2, _ts("2024-01-01T05:00:00"), 5.0),
        # user 3: tie on ts -> event_id breaks the tie deterministically
        (5, 3, _ts("2024-01-01T00:00:00"), 1.0),
        (6, 3, _ts("2024-01-01T00:00:00"), 2.0),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")


def test_sessionize_gap_threshold_strict(spark, tiny_events):
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(tiny_events).collect()
    }
    assert got[1] == 1 and got[2] == 1  # 1800s gap stays in session
    assert got[3] == 2                   # 1801s gap opens a new one
    assert got[4] == 1
    assert got[5] == 1 and got[6] == 1   # tie: same session


def test_session_stats(spark, tiny_events):
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["total_value"])
        for r in session_stats(tiny_events, value_col="value").collect()
    }
    assert got[(1, 1)] == (2, 30.0)
    assert got[(1, 2)] == (1, 30.0)
    assert got[(2, 1)] == (1, 5.0)
    assert got[(3, 1)] == (2, 3.0)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T10:00:00")),
            (2, 100, _ts("2024-01-01T12:00:00")),
            (3, 200, _ts("2024-01-01T09:00:00")),  # before any right row
            (4, 300, _ts("2024-01-01T09:00:00")),  # key with no right rows
        ],
        "lid long, key long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T10:00:00"), 7, "a"),   # ties lid=1 exactly (inclusive)
            (100, _ts("2024-01-01T11:00:00"), 8, "b"),
            (100, _ts("2024-01-01T11:00:00"), 9, "c"),   # same ts: tiebreak keeps rid=9
            (200, _ts("2024-01-01T09:30:00"), 10, "d"),
        ],
        "rkey long, rt timestamp, rid long, tag string",
    )
    return left, right


def test_asof_backward_inclusive(spark, asof_frames):
    left, right = asof_frames
    got = {
        r["lid"]: (r["rid"], r["tag"])
        for r in asof_join(
            left, right,
            left_key="key", right_key="rkey",
            left_time="t", right_time="rt",
            payload=["rid", "tag"], right_tiebreak="rid",
        ).collect()
    }
    assert got[1] == (7, "a")        # equal timestamp matches (inclusive)
    assert got[2] == (9, "c")        # latest right row; tie resolved to max rid
    assert got[3] == (None, None)    # left precedes every right row
    assert got[4] == (None, None)    # key absent from right


def test_asof_payload_collision_raises(spark, asof_frames):
    left, right = asof_frames
    with pytest.raises(ValueError):
        asof_join(
            left, right.withColumnRenamed("rid", "lid"),
            left_key="key", right_key="rkey",
            left_time="t", right_time="rt",
            payload=["lid"], right_tiebreak="lid",
        )


def test_range_join_recent_boundaries(spark):
    from bht_etl_app_spark.operators.timeseries import range_join_recent

    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01T01:00:00"))], "lid long, key long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (5, _ts("2024-01-01T00:55:00"), 1),  # exactly -300s: EXCLUDED
            (5, _ts("2024-01-01T00:55:00.000001"), 2),  # just inside
            (5, _ts("2024-01-01T01:00:00"), 3),  # equal ts: included
            (5, _ts("2024-01-01T01:00:01"), 4),  # future: excluded
            (6, _ts("2024-01-01T00:59:00"), 5),  # other key
        ],
        "rkey long, rt timestamp, rid long",
    )
    got = range_join_recent(
        left, right,
        left_key="key", right_key="rkey",
        left_time="t", right_time="rt", before_seconds=300,
    )
    assert sorted(r["rid"] for r in got.collect() if r["rid"] is not None) == [2, 3]


def test_range_join_recent_no_match_survives(spark):
    from bht_etl_app_spark.operators.timeseries import range_join_recent

    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01T01:00:00"))], "lid long, key long, t timestamp"
    )
    right = spark.createDataFrame(
        [(5, _ts("2024-01-01T02:00:00"), 1)], "rkey long, rt timestamp, rid long"
    )
    rows = range_join_recent(
        left, right,
        left_key="key", right_key="rkey",
        left_time="t", right_time="rt", before_seconds=300,
    ).collect()
    assert len(rows) == 1 and rows[0]["rid"] is None


def test_ewma_per_key_matches_recurrence(spark):
    from bht_etl_app_spark.operators.timeseries import ewma_per_key

    rows = [
        (1, 10, "2024-01-01 00:00:00", 10.0),
        (1, 11, "2024-01-01 01:00:00", 20.0),
        (1, 12, "2024-01-01 02:00:00", 0.0),
        (2, 20, "2024-01-01 00:00:00", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["event_id"]: r["ewma"] for r in ewma_per_key(df, alpha=0.5).collect()}
    # hand recurrence, alpha=0.5, adjust=False: e0=v0; e_t=0.5 v_t+0.5 e_{t-1}
    assert got[10] == 10.0
    assert got[11] == 15.0
    assert got[12] == 7.5
    assert got[20] == 5.0


def test_ewma_null_values_treated_as_zero(spark):
    from bht_etl_app_spark.operators.timeseries import ewma_per_key

    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", None), (1, 2, "2024-01-01 01:00:00", 10.0)],
        "user_id long, event_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["event_id"]: r["ewma"] for r in ewma_per_key(df, alpha=0.5).collect()}
    assert got[1] == 0.0
    assert got[2] == 5.0


def test_range_join_small_buckets_span_full_window(spark):
    """bucket_seconds < before_seconds: matches several buckets back
    must still be found (ADVICE r1: the 2-bucket explode dropped them)."""
    from bht_etl_app_spark.operators.timeseries import range_join_recent

    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01T01:00:00"))], "lid long, key long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (5, _ts("2024-01-01T00:58:30"), 1),  # 90s back: 3 buckets of 30s
            (5, _ts("2024-01-01T00:55:00.000001"), 2),  # window edge, ~10 buckets
            (5, _ts("2024-01-01T00:55:00"), 3),  # exactly -300s: EXCLUDED
        ],
        "rkey long, rt timestamp, rid long",
    )
    got = range_join_recent(
        left, right,
        left_key="key", right_key="rkey",
        left_time="t", right_time="rt",
        before_seconds=300, bucket_seconds=30,
    )
    assert sorted(r["rid"] for r in got.collect() if r["rid"] is not None) == [1, 2]


def test_ewma_string_key_and_schema_follows_input(spark):
    """ADVICE r1: output schema must derive from the input, not a
    hardcoded long/long/timestamp/double string."""
    from bht_etl_app_spark.operators.timeseries import ewma_per_key

    df = spark.createDataFrame(
        [("u1", 1, "2024-01-01 00:00:00", 10.0), ("u1", 2, "2024-01-01 01:00:00", 20.0)],
        "user_id string, event_id int, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = ewma_per_key(df, alpha=0.5)
    assert dict(out.dtypes)["user_id"] == "string"
    assert dict(out.dtypes)["event_id"] == "int"
    got = {r["event_id"]: (r["user_id"], r["ewma"]) for r in out.collect()}
    assert got[1] == ("u1", 10.0) and got[2] == ("u1", 15.0)


def test_funnel_conversion_ordering_and_window(spark):
    """Planted sequences: the strict ordering rule (purchase before
    view doesn't convert) and the attribution window both pinned."""
    from datetime import datetime

    from bht_etl_app_spark.plans.analytics import funnel_conversion

    def t(h):
        return datetime(2024, 1, 1, h)

    rows = [
        # u1: clean view -> click -> purchase (converts all steps)
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: purchase BEFORE view -> stops after view
        (2, t(5), "purchase"), (2, t(6), "view"),
        # u3: view -> click, but purchase outside the 2h window
        (3, t(1), "view"), (3, t(2), "click"), (3, t(10), "purchase"),
        # u4: click only -> never enters the funnel
        (4, t(1), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["step"]: r["n_users"]
           for r in funnel_conversion(df, max_gap_s=7200).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}

    # without a window, u3's late purchase converts
    got2 = {r["step"]: r["n_users"] for r in funnel_conversion(df).collect()}
    assert got2 == {"view": 3, "click": 2, "purchase": 2}


def test_user_cohort_retention_offsets(spark):
    """Two cohorts, controlled return weeks."""
    from datetime import datetime

    from bht_etl_app_spark.plans.analytics import user_cohort_retention

    rows = [
        # u1: first week of Jan (cohort Mon 2024-01-01), returns wk1, wk3
        (1, datetime(2024, 1, 2), "view"),
        (1, datetime(2024, 1, 9), "view"),
        (1, datetime(2024, 1, 23), "view"),
        # u2: same cohort, never returns
        (2, datetime(2024, 1, 3), "view"),
        # u3: cohort of Jan 8, returns wk1
        (3, datetime(2024, 1, 10), "view"),
        (3, datetime(2024, 1, 16), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {(str(r["cohort_week"]), r["week_offset"]): r["n_users"]
           for r in user_cohort_retention(df).collect()}
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_interpolate_series_hand_computed(spark):
    from datetime import datetime

    from bht_etl_app_spark.operators.timeseries import interpolate_series

    rows = [
        # user 1: observed at hours 0, 1, 4 -> gaps at 2 and 3
        (1, datetime(2024, 1, 1, 0, 30), 10.0),
        (1, datetime(2024, 1, 1, 0, 45), 20.0),   # hour-0 mean = 15.0
        (1, datetime(2024, 1, 1, 1, 10), 30.0),
        (1, datetime(2024, 1, 1, 4, 5), 90.0),
        # user 2: single bucket -> spine of one observed row, no fill
        (2, datetime(2024, 1, 2, 7, 1), 5.5),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["bucket"].hour): (r["value"], r["filled"])
        for r in interpolate_series(df).collect()
    }
    assert got[(1, 0)] == (15.0, False)
    assert got[(1, 1)] == (30.0, False)
    # linear 30 -> 90 across 3 steps: 50 at hour 2, 70 at hour 3
    assert got[(1, 2)] == (50.0, True)
    assert got[(1, 3)] == (70.0, True)
    assert got[(1, 4)] == (90.0, False)
    assert got[(2, 7)] == (5.5, False)
    assert len(got) == 6


def test_interpolate_series_spine_is_distributed(spark):
    """The spine must come from a per-key sequence() explode, not a
    driver loop or a global range join — plan shows Generate, and no
    cartesian/nested-loop join anywhere."""
    from datetime import datetime

    from bht_etl_app_spark.operators.timeseries import interpolate_series

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    plan = interpolate_series(df)._jdf.queryExecution().toString()
    assert "Generate explode" in plan or "Generate" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_collapses_runs_and_versions_reopenings(spark):
    from datetime import datetime

    from bht_etl_app_spark.operators.timeseries import scd2_from_changelog

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), 1, "view"),
            (1, datetime(2024, 1, 2), 2, "view"),    # same run
            (1, datetime(2024, 1, 3), 3, "click"),
            (1, datetime(2024, 1, 4), 4, "view"),    # REOPENED view: new version
            (2, datetime(2024, 1, 1), 5, "purchase"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    rows = [
        (r["user_id"], r["state"], r["effective_from"].day,
         r["effective_to"].day if r["effective_to"] else None, r["is_current"])
        for r in scd2_from_changelog(ev).orderBy("user_id", "effective_from").collect()
    ]
    assert rows == [
        (1, "view", 1, 3, False),
        (1, "click", 3, 4, False),
        (1, "view", 4, None, True),
        (2, "purchase", 1, None, True),
    ]


def test_event_transitions_hand_computed(spark):
    from bht_etl_app_spark.operators.timeseries import event_transitions

    rows = [
        # user 1: A -> B -> A (ts tie between the two A's is broken by
        # event_id, so the sequence is deterministic)
        (1, 1, _ts("2024-01-01T00:00:00"), "A"),
        (2, 1, _ts("2024-01-01T00:10:00"), "B"),
        (3, 1, _ts("2024-01-01T00:10:00"), "A"),
        # user 2: A -> A
        (4, 2, _ts("2024-01-01T00:00:00"), "A"),
        (5, 2, _ts("2024-01-01T00:05:00"), "A"),
        # user 3: single event -> no transition
        (6, 3, _ts("2024-01-01T00:00:00"), "B"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(df).collect()
    }
    assert out == {
        ("A", "B"): (1, 0.5),
        ("A", "A"): (1, 0.5),
        ("B", "A"): (1, 1.0),
    }


def test_event_transitions_p_sums_to_one_per_source(spark):
    from bht_etl_app_spark.operators.timeseries import event_transitions

    rows = [
        (i, i % 5, _ts("2024-01-01T00:00:00").replace(minute=i % 60), t)
        for i, t in enumerate(["A", "B", "C", "A", "B"] * 20)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    per_src = (
        event_transitions(df)
        .groupBy("from_type")
        .agg(F.sum("p").alias("tot"))
        .collect()
    )
    assert per_src and all(abs(r["tot"] - 1.0) < 1e-12 for r in per_src)


def _hourly_events_frame(spark, counts):
    """events rows with counts[i] events inside hour i, one type."""
    rows, eid = [], 0
    for i, c in enumerate(counts):
        for j in range(c):
            eid += 1
            rows.append(
                (eid, 1, datetime(2024, 1, 1 + i // 24, i % 24, j % 60, 0), "X")
            )
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_hourly_anomalies_flags_spike_and_suppresses_cold_start(spark):
    from bht_etl_app_spark.operators.timeseries import hourly_count_anomalies

    counts = [2, 3] * 7 + [30]  # 14 alternating baseline hours, then a spike
    out = (
        hourly_count_anomalies(_hourly_events_frame(spark, counts))
        .orderBy("hour")
        .collect()
    )
    assert len(out) == 15
    # Cold start: fewer than min_trailing observed hours -> NULL z, no flag
    for r in out[:12]:
        assert r["z"] is None and r["anomaly"] is False
    # The spike hour is scored against 14 trailing hours of mean 2.5
    spike = out[-1]
    assert spike["n"] == 30
    assert spike["z"] is not None and spike["z"] > 3.0 and spike["anomaly"]
    # A baseline hour with a full window is scored but inside the band
    assert out[13]["z"] is not None and abs(out[13]["z"]) < 3.0
    assert not out[13]["anomaly"]


def test_hourly_anomalies_zero_variance_baseline_gives_null_z(spark):
    from bht_etl_app_spark.operators.timeseries import hourly_count_anomalies

    counts = [4] * 16  # constant counts: var == 0 -> no defensible score
    out = hourly_count_anomalies(_hourly_events_frame(spark, counts)).collect()
    assert all(r["z"] is None and r["anomaly"] is False for r in out)


def test_user_retention_curve_hand_computed_km(spark):
    from datetime import timedelta

    from bht_etl_app_spark.operators.timeseries import user_retention_curve

    d0 = _ts("2024-01-01T12:00:00")

    def ev(eid, uid, day):
        return (eid, uid, d0 + timedelta(days=day), "x")

    rows = [
        # corpus end = day 30 (u_anchor's last event)
        ev(1, 1, 0),                 # u1: t=0,  silent 30d -> churned
        ev(2, 2, 0), ev(3, 2, 10),   # u2: t=10, silent 20d -> churned
        ev(4, 3, 5), ev(5, 3, 28),   # u3: t=23, silent 2d  -> censored
        ev(6, 4, 0), ev(7, 4, 30),   # u4 anchors corpus end; t=30 censored
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r["t_days"]: r for r in user_retention_curve(df).collect()}
    assert set(out) == {0, 10, 23, 30}
    # KM: S(0) = 1 - 1/4; S(10) = 3/4 * (1 - 1/3) = 1/2; censoring
    # at t=23,30 leaves S flat
    assert out[0]["n_risk"] == 4 and out[0]["n_churned"] == 1
    assert abs(out[0]["survival"] - 0.75) < 1e-9
    assert out[10]["n_risk"] == 3 and abs(out[10]["survival"] - 0.5) < 1e-9
    assert out[23]["n_churned"] == 0 and out[23]["n_censored"] == 1
    assert abs(out[23]["survival"] - 0.5) < 1e-9
    assert abs(out[30]["survival"] - 0.5) < 1e-9
    # estimator invariants
    ts = sorted(out)
    surv = [out[t]["survival"] for t in ts]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))


def test_user_retention_curve_total_churn_at_max_lifetime(spark):
    """d == n at the maximum lifetime is ln(0): survival must drop to
    EXACTLY 0 (the review's failure case — a NULL log term silently
    skipped by a window sum would freeze it at the prior value)."""
    from datetime import timedelta

    from bht_etl_app_spark.operators.timeseries import user_retention_curve

    d0 = _ts("2024-01-01T12:00:00")
    rows = [
        (1, 1, d0, "x"),
        (2, 1, d0 + timedelta(days=50), "x"),   # u1: t=50, churned
        (3, 2, d0 + timedelta(days=55), "x"),
        (4, 2, d0 + timedelta(days=60), "x"),   # u2 anchors end; t=5 censored
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r["t_days"]: r for r in user_retention_curve(df).collect()}
    assert out[5]["n_censored"] == 1 and out[5]["survival"] == 1.0
    # at t=50: n_risk=1, n_churned=1 -> everyone at risk churned
    assert out[50]["n_risk"] == 1 and out[50]["n_churned"] == 1
    assert out[50]["survival"] == 0.0


def test_user_twap_hand_computed_and_null_gaps(spark):
    from datetime import timedelta

    from bht_etl_app_spark.operators.timeseries import user_twap

    t0 = _ts("2024-01-01T00:00:00")
    rows = [
        # user 1: 10.0 held for 3s, then 20.0 for 1s, last obs open
        (1, 1, t0, 10.0),
        (2, 1, t0 + timedelta(seconds=3), 20.0),
        (3, 1, t0 + timedelta(seconds=4), 99.0),
        # user 2: single event -> no interval -> no row
        (4, 2, t0, 5.0),
        # user 3: NULL value interval excluded from num AND den
        (5, 3, t0, 8.0),
        (6, 3, t0 + timedelta(seconds=2), None),
        (7, 3, t0 + timedelta(seconds=5), 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {r["user_id"]: r for r in user_twap(df).collect()}
    assert set(out) == {1, 3}
    r1 = out[1]
    # (10*3s + 20*1s) / 4s = 12.5
    assert (r1["n_intervals"], r1["span_us"]) == (2, 4_000_000)
    assert r1["twap"] == 12.5
    # user 3: only the 8.0->NULL interval has a value: 8.0 over 2s
    r3 = out[3]
    assert (r3["n_intervals"], r3["span_us"], r3["twap"]) == (1, 2_000_000, 8.0)


def test_user_twap_burst_does_not_dominate(spark):
    """The point of time-weighting: a 1-second burst of high readings
    cannot drag the average the way plain avg() lets it."""
    from datetime import timedelta

    from bht_etl_app_spark.operators.timeseries import user_twap

    t0 = _ts("2024-01-01T00:00:00")
    rows = [(i, 1, t0 + timedelta(seconds=i), 100.0) for i in range(10)]
    rows += [(100 + i, 1, t0 + timedelta(seconds=9, microseconds=100 + i), 0.0)
             for i in range(50)]
    rows.append((999, 1, t0 + timedelta(seconds=10), 100.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    r = user_twap(df).collect()[0]
    # time-weighted: ~9s at 100, ~1s at 0 -> ~90. The unweighted mean
    # is dragged to ~16 by the 50 burst rows; the gap is the operator.
    from pyspark.sql import functions as F

    plain = df.agg(F.avg("value")).collect()[0][0]
    assert abs(r["twap"] - 90.0) < 0.1
    assert plain < 20.0 and r["twap"] - plain > 70.0


def test_user_max_drawdown_hand_computed(spark):
    from datetime import timedelta

    from bht_etl_app_spark.operators.timeseries import user_max_drawdown

    t0 = _ts("2024-01-01T00:00:00")
    rows = [
        (i + 1, 1, t0 + timedelta(seconds=i), v)
        for i, v in enumerate([10.0, 5.0, 20.0, 7.0])
    ]
    rows.append((9, 2, t0, None))          # all-NULL user: no row
    rows.append((10, 3, t0, 4.0))          # single obs: drawdown 0
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {r["user_id"]: r for r in user_max_drawdown(df).collect()}
    assert set(out) == {1, 3}
    # cummax [10,10,20,20] -> drawdowns [0,5,0,13]
    assert (out[1]["n_obs"], out[1]["peak"], out[1]["max_drawdown"]) == (
        4, 20.0, 13.0
    )
    assert (out[3]["peak"], out[3]["max_drawdown"]) == (4.0, 0.0)


def test_user_active_streaks_hand_case(spark):
    from datetime import datetime

    from bht_etl_app_spark.operators.timeseries import user_active_streaks

    rows = [
        # user 1: days 1,2,3 then 5 -> longest streak 3
        (1, 1, datetime(2024, 1, 1)), (2, 1, datetime(2024, 1, 2)),
        (3, 1, datetime(2024, 1, 2, 12)), (4, 1, datetime(2024, 1, 3)),
        (5, 1, datetime(2024, 1, 5)),
        # user 2: one day -> streak 1
        (6, 2, datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    r = user_active_streaks(df).head()
    assert r["n_users"] == 2 and r["max_streak"] == 3
    assert r["n_users_ge_min"] == 1
    assert r["mean_max_streak"] == 2.0


def test_event_burstiness_hand_case(spark):
    from datetime import datetime

    from bht_etl_app_spark.operators.timeseries import event_burstiness

    rows = (
        # type "a": 4 events all in hour 0 of a 4-hour span ->
        # counts [4,0,0,0]: mean 1, var-ish num = 4*16-16=48,
        # D = 48/(4*4) = 3.0 (bursty)
        [(i, 1, datetime(2024, 1, 1, 0, i), "a") for i in range(4)]
        # type "b": one event each hour -> counts [1,1,1,1], D = 0
        + [(10 + h, 1, datetime(2024, 1, 1, h, 30), "b") for h in range(4)]
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r["event_type"]: r for r in event_burstiness(df).collect()}
    # span is global (hours 0-3) so both types see 4 spine hours
    assert got["a"]["n_hours"] == 4 and got["b"]["n_hours"] == 4
    assert got["a"]["mean_per_hour"] == 1.0
    assert got["a"]["dispersion"] == 3.0
    assert got["b"]["dispersion"] == 0.0

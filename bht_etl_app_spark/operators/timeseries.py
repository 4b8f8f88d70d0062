"""Time-series operators: sessionization and as-of join.

The reference app has no time-series surface (SURVEY.md §2.4 — no
window functions, no streams; reference `app.py` is survey tabulation
only), so these are engine extensions in the north-star direction:
the operations an event/training-data pipeline needs at scale.

Scale posture (100 TB):
- ``sessionize`` shuffles once on the user key and then does a linear
  in-partition window scan — no driver state, no collect. Skewed power
  users make one partition hot; AQE skew-split handles the shuffle
  side, and the window scan is O(events-per-user).
- ``asof_join`` uses the tagged-union + window trick: both inputs are
  shuffled ONCE on the join key, unioned, sorted within partitions by
  (time, side), and each left row picks up the most recent right
  payload with ``last(ignorenulls)``. This is one shuffle + one sort —
  no per-row range probe, no broadcast requirement, no O(n·m) blow-up;
  it scales to arbitrarily large sides (vs. DuckDB's ASOF JOIN which
  we use only as the small-scale oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str = "event_id",
    out_col: str = "session_id",
) -> DataFrame:
    """Assign per-user session ids: a new session starts when the gap
    since the user's previous event exceeds ``gap_seconds``.

    Gap arithmetic is done in integer microseconds (``unix_micros``)
    so sub-second timestamps are handled exactly and deterministically
    (the fixture ``events.ts`` has microsecond precision).
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return (
        events.withColumn("__new_session__", new_session)
        .withColumn(out_col, F.sum("__new_session__").over(run).cast("long"))
        .drop("__new_session__")
    )


def session_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    value_col: str | None = None,
) -> DataFrame:
    """Sessionize then aggregate one row per (user, session)."""
    s = sessionize(events, user_col=user_col, ts_col=ts_col, gap_seconds=gap_seconds)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value")
        )
    return s.groupBy(user_col, "session_id").agg(*aggs)


def range_join_recent(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    before_seconds: int,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Time-range left join: attach every right row with
    ``right_time`` in the half-open window
    ``(left_time - before_seconds, left_time]`` for the same key;
    left rows with no match survive with nulls.

    Spark has no native band/range-join optimization, so a naive
    theta-join would be a per-key cross product. This uses the
    standard bucketed equi-join: both sides are bucketed by
    ``bucket_seconds`` (default = the window width), the right side is
    exploded into the ``ceil(before_seconds / bucket_seconds) + 1``
    consecutive buckets a left match can fall in, and the exact range
    predicate rides along as a residual join condition. The join is
    then a plain shuffled equi-join on (key, bucket) — candidate
    fan-out is bounded by rows-per-bucket × bucket count, and the
    whole thing is one shuffle per side at any scale. Smaller
    ``bucket_seconds`` trades explode fan-out for tighter candidate
    sets on dense keys.

    Left/right column names must be disjoint (alias on the caller).
    """
    if set(left.columns) & set(right.columns):
        raise ValueError("left/right columns must be disjoint; alias the right side")
    bucket_seconds = bucket_seconds or before_seconds
    bw = bucket_seconds * 1_000_000
    before_us = before_seconds * 1_000_000
    # A right row at bucket rb can match left rows with lt in
    # (rt, rt + before], i.e. left buckets rb .. rb + ceil(before/bw).
    n_ahead = -(-before_seconds // bucket_seconds)

    l = left.withColumn("__lb__", F.floor(F.unix_micros(F.col(left_time)) / F.lit(bw)))
    r = right.withColumn(
        "__rb0__", F.floor(F.unix_micros(F.col(right_time)) / F.lit(bw))
    ).withColumn(
        "__rb__",
        F.explode(F.sequence(F.col("__rb0__"), F.col("__rb0__") + F.lit(n_ahead))),
    )
    lt = F.unix_micros(F.col(left_time))
    rt = F.unix_micros(F.col(right_time))
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col("__lb__") == F.col("__rb__"))
        & (rt <= lt)
        & (rt > lt - before_us)
    )
    return l.join(r, cond, "left").select(*left.columns, *right.columns)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    right_tiebreak: str,
) -> DataFrame:
    """Backward (inclusive) as-of join: for every left row, attach the
    ``payload`` columns of the right row with the greatest
    ``right_time`` <= ``left_time`` for the same key; nulls when no
    such row exists.

    Right rows sharing (key, time) are deduplicated first, keeping the
    row with the greatest ``right_tiebreak`` — this pins the result
    deterministically (DuckDB's ASOF JOIN is ambiguous on such ties).

    Implementation: tag both sides, union, and within each key take a
    running ``last(payload, ignorenulls=True)`` ordered by
    (time, side) with right rows (side=0) sorting before left rows
    (side=1) at equal timestamps, making the match inclusive. One
    shuffle per side, one sort — see module docstring for why this is
    the 100 TB-safe shape.
    """
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {overlap}")

    dedup_w = Window.partitionBy(right_key, right_time).orderBy(
        F.col(right_tiebreak).desc()
    )
    right_dedup = (
        right.withColumn("__rn__", F.row_number().over(dedup_w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )

    left_aug = left.select(
        "*",
        *[
            F.lit(None).cast(right_dedup.schema[p].dataType).alias(p)
            for p in payload
        ],
        F.col(left_time).alias("__t__"),
        F.lit(1).alias("__side__"),
    )
    # the right side contributes the key column (under the left key's
    # name), typed nulls for every other left column, and the payload
    right_aug = right_dedup.select(
        *[
            (
                F.col(right_key).cast(left.schema[c].dataType)
                if c == left_key
                else F.lit(None).cast(left.schema[c].dataType)
            ).alias(c)
            for c in left.columns
        ],
        *[F.col(p) for p in payload],
        F.col(right_time).alias("__t__"),
        F.lit(0).alias("__side__"),
    )

    combined = left_aug.unionByName(right_aug)
    w = (
        Window.partitionBy(left_key)
        .orderBy(F.col("__t__").asc(), F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    match_struct = F.last(
        F.when(F.col("__side__") == 0, F.struct(*[F.col(p) for p in payload])),
        ignorenulls=True,
    ).over(w)
    return (
        combined.withColumn("__match__", match_struct)
        .where(F.col("__side__") == 1)
        .select(
            *left.columns,
            *[F.col(f"__match__.{p}").alias(p) for p in payload],
        )
    )


def ewma_per_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """Per-key exponentially-weighted moving average over event time:
    ``ewma_t = alpha * v_t + (1 - alpha) * ewma_{t-1}``.

    The recurrence makes each row depend on ALL its predecessors —
    a running product no SQL window frame can express (a window sum
    of ``v_i * (1-a)^(t-i)`` via exp/log overflows for long series).
    This is the one legitimate use of the Python escape hatch:
    ``applyInPandas`` with a vectorized pandas ``ewm`` kernel per key.
    Arrow moves each group as a columnar batch; groups partition by
    the key, so the op scales horizontally like any grouped shuffle,
    and memory is bounded by the largest single key's history.

    Deterministic: rows ordered by (ts, id) within the key. Output:
    ``(key, id, ts, value, ewma)`` with ewma rounded to 6dp; the four
    input columns keep their incoming types (schema is derived from
    ``df.schema``, so string keys / non-long ids work unchanged).
    """
    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    in_schema = df.select(key_col, id_col, ts_col, val_col).schema
    out_schema = StructType(
        list(in_schema.fields) + [StructField("ewma", DoubleType())]
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col])
        ewma = pdf[val_col].fillna(0.0).ewm(alpha=alpha, adjust=False).mean()
        return pd.DataFrame({
            key_col: pdf[key_col],
            id_col: pdf[id_col],
            ts_col: pdf[ts_col],
            val_col: pdf[val_col],
            "ewma": ewma.round(6),
        })

    return (
        df.select(key_col, id_col, ts_col, val_col)
        .groupBy(key_col)
        .applyInPandas(_kernel, schema=out_schema)
    )


def interpolate_series(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    step: str = "hour",
) -> DataFrame:
    """Gap-fill + linear interpolation of a per-key time series — the
    resample/interpolate step of metric pipelines (pandas
    ``resample().interpolate()``, TimescaleDB ``time_bucket_gapfill``
    + ``interpolate``), distributed.

    Buckets events into ``step``-sized intervals per key, builds the
    COMPLETE bucket spine from each key's first to last bucket, and
    fills missing buckets by linear interpolation between the
    nearest observed neighbors (series edges fall back to the
    nearest observed value; spine endpoints are observed by
    construction). Output: ``(key, bucket, value, filled)`` where
    ``filled`` marks interpolated rows.

    Scale shape: one keyed aggregation to bucket granularity (map-side
    combine — the corpus never reaches the window), a spine explode
    that is per-key ``sequence()`` generation (distributed, bounded by
    span/step per key, never a driver loop), one co-partitioned left
    join (spine and observations share the (key, bucket) shuffle), and
    two per-key window scans (last/first ignorenulls) bounded by the
    key's spine length. Observed bucket means ride the DECIMAL(18,2)
    fold so the double values are partitioning-invariant.
    """
    interval = {"hour": "interval 1 hour", "day": "interval 1 day"}[step]
    obs = (
        df.groupBy(
            F.col(key_col), F.date_trunc(step, F.col(ts_col)).alias("bucket")
        )
        .agg(
            (
                F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
    )
    spans = obs.groupBy(key_col).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = spans.select(
        key_col,
        F.explode(F.sequence("lo", "hi", F.expr(interval))).alias("bucket"),
    )
    j = spine.join(obs, [key_col, "bucket"], "left")
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    observed_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    pv = F.last("v", ignorenulls=True).over(w_prev)
    pb = F.last(observed_bucket, ignorenulls=True).over(w_prev)
    nv = F.first("v", ignorenulls=True).over(w_next)
    nb = F.first(observed_bucket, ignorenulls=True).over(w_next)
    frac = (
        (F.unix_timestamp(F.col("bucket")) - F.unix_timestamp(pb)).cast("double")
        / (F.unix_timestamp(nb) - F.unix_timestamp(pb)).cast("double")
    )
    val = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * frac)
    )
    # no 6dp quantization here: interpolation fractions (1/gap_len)
    # produce exact decimal ties where engine round() tie-behavior on
    # near-tie doubles diverges; the unrounded doubles are themselves
    # deterministic (decimal-fold means, integer-second fractions,
    # fixed op order), so full precision is the portable choice
    return j.select(
        F.col(key_col),
        F.col("bucket"),
        val.alias("value"),
        F.col("v").isNull().alias("filled"),
    )


def scd2_from_changelog(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension build from a changelog — the
    canonical warehouse ETL operator: collapse each key's ordered
    state observations into VERSIONED VALIDITY PERIODS
    ``(key, state, effective_from, effective_to, is_current)``, one
    row per run of consecutive equal states (the gaps-and-islands
    pattern), with ``effective_to`` = the next run's start (open
    period -> NULL, ``is_current`` = true).

    Scale shape: one shuffle on the key, then two window passes
    bounded by per-key history length — change-point detection via
    ``lag(state)``, period close via ``lead(effective_from)`` over
    the change points only (runs, not raw rows). Deterministic under
    ts ties via the ``(ts, id)`` composite order.
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(id_col))
    # NULL-safe change detection (r5 review): `state != prev` is NULL
    # for NULL states, which both swallowed NULL observations and made
    # the following row a spurious change point. A lagged constant
    # marker distinguishes "first row" from "previous state was NULL".
    changes = (
        df.select(key_col, ts_col, id_col, state_col)
        .withColumn("__prev__", F.lag(state_col).over(w))
        .withColumn("__has_prev__", F.lag(F.lit(1)).over(w))
        .where(
            F.col("__has_prev__").isNull()
            | ~F.col(state_col).eqNullSafe(F.col("__prev__"))
        )
    )
    return changes.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w).alias("effective_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


SCD2_EVENT_TYPE_SQL = """
WITH changes AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS prev,
         lag(1) OVER (PARTITION BY user_id
                      ORDER BY ts ASC, event_id ASC) AS has_prev
  FROM events
),
runs AS (
  SELECT user_id, event_type AS state, ts AS effective_from, event_id
  FROM changes
  WHERE has_prev IS NULL OR event_type IS DISTINCT FROM prev
)
SELECT user_id, state, effective_from,
       lead(effective_from) OVER (PARTITION BY user_id
                                  ORDER BY effective_from ASC, event_id ASC)
         AS effective_to,
       (lead(effective_from) OVER (PARTITION BY user_id
                                   ORDER BY effective_from ASC, event_id ASC)
          IS NULL) AS is_current
FROM runs
"""


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every consecutive pair of events of one user,
    count ``(from_type, to_type)`` and normalize per source state —
    the behavioral model behind next-action prediction, funnel
    leak diagnosis, and bot detection (bots have degenerate
    transition rows). Output:
    ``(from_type, to_type, n, p)`` with ``sum(p) = 1`` per
    ``from_type``.

    Exactness: ``p`` is one integer-over-integer division — no float
    fold, partitioning-invariant unrounded. Ordering under ts ties is
    pinned by the ``(ts, id)`` composite, so the pair multiset is
    deterministic.

    Scale shape: one shuffle on the user key, a linear ``lead`` scan
    per user, then an aggregation to at most |types|² rows; the
    normalizing window runs over that tiny aggregate, not the events.
    """
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    pairs = (
        df.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(tot).cast("double")).alias("p"),
    )


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, count(*) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE)
         / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM c
"""


def hourly_count_anomalies(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    trailing: int = 24,
    z_thresh: float = 3.0,
    min_trailing: int = 12,
) -> DataFrame:
    """Rolling z-score anomaly detection on per-type hourly event
    counts: each observed hour is scored against the mean/stddev of
    the previous ``trailing`` OBSERVED hours of the same type (rows,
    not wall-hours — silent hours are absent rows, which is itself
    the gap-fill operator's job). The monitoring primitive behind
    "traffic for type X just tripled".

    Exactness: the rolling moments are INTEGER window sums (count,
    Σn, Σn² — hourly counts square well inside int64), converted to
    doubles through one fixed expression; ``sqrt`` and ``/`` are
    correctly-rounded IEEE single ops, so z is bit-identical across
    engines and partitionings with NO float fold anywhere — the
    ``quantity_moments`` discipline applied to a sliding frame.
    Rows without a defensible baseline (fewer than ``min_trailing``
    trailing hours, or zero variance) are emitted with NULL z and
    ``anomaly = false`` rather than dropped, so the output still
    covers every observed hour.

    Scale shape: the hourly rollup is a map-side-combining aggregate
    to |types|·|hours| rows; the three window sums share ONE
    partitioning and ONE frame. Per-type history lives in one
    partition — types are few by construction; for high-cardinality
    keys use the same pattern partitioned by (key, week-bucket).
    """
    hourly = (
        df.groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-int(trailing), -1)
    )
    cnt = F.count("n").over(w)
    s = F.sum("n").over(w)
    ss = F.sum(F.col("n") * F.col("n")).over(w)
    stats = hourly.select(
        "event_type",
        "hour",
        "n",
        cnt.alias("__cnt__"),
        s.cast("double").alias("__s__"),
        ss.cast("double").alias("__ss__"),
    )
    mean = F.col("__s__") / F.col("__cnt__").cast("double")
    var = (
        F.col("__ss__") - (F.col("__s__") * F.col("__s__")) / F.col("__cnt__").cast("double")
    ) / (F.col("__cnt__") - F.lit(1)).cast("double")
    ok = (F.col("__cnt__") >= int(min_trailing)) & (var > F.lit(0.0))
    z = F.when(ok, (F.col("n").cast("double") - mean) / F.sqrt(var))
    return stats.select(
        "event_type",
        "hour",
        "n",
        z.alias("z"),
        F.coalesce(F.abs(z) > F.lit(float(z_thresh)), F.lit(False)).alias("anomaly"),
    )


HOURLY_ANOMALIES_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, hour, CAST(n AS BIGINT) AS n,
         count(n) OVER w AS cnt,
         CAST(sum(n) OVER w AS DOUBLE) AS s,
         CAST(sum(n * n) OVER w AS DOUBLE) AS ss
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT event_type, hour, n,
         CASE WHEN cnt >= 12
                   AND (ss - (s * s) / CAST(cnt AS DOUBLE))
                       / CAST(cnt - 1 AS DOUBLE) > CAST(0.0 AS DOUBLE)
              THEN (CAST(n AS DOUBLE) - s / CAST(cnt AS DOUBLE))
                   / sqrt((ss - (s * s) / CAST(cnt AS DOUBLE))
                          / CAST(cnt - 1 AS DOUBLE))
         END AS z
  FROM stats
)
SELECT event_type, hour, n, z,
       coalesce(abs(z) > CAST(3.0 AS DOUBLE), false) AS anomaly
FROM scored
"""


# The ONE canonical sessionize oracle fragment (gap parameterized,
# strict '>' semantics, (ts, event_id) tiebreaks): every SQL oracle
# that replays sessionize composes this, so the session-boundary
# definition lives in exactly one string. (session_window_stats
# deliberately does NOT use it — native session windows close at
# gap >= , a different semantic.)
SESSIONIZE_SQL_CTE = """e AS (
  SELECT user_id, event_id, ts, event_type, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap} * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, event_id, ts, event_type, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
)"""


def purchase_attribution(
    df: DataFrame,
    purchase_type: str = "purchase",
    gap_seconds: int = 1800,
) -> DataFrame:
    """First-touch conversion attribution: for every purchase event,
    credit the event type that OPENED the purchase's session (the
    marketing-attribution primitive — "which entry behavior leads to
    conversion"). Output: ``(first_touch, n_purchases, share)``
    aggregated over all purchases; ``share`` is one int/int division.

    Composes :func:`sessionize` (same gap semantics and ``(ts, id)``
    tiebreaks); the first-touch window partitions by
    ``(user, session_id)`` — a SUBSET-keyed window, so Catalyst
    reuses the sessionize exchange on the user key rather than
    re-shuffling (clustered distribution on a superset of the
    existing hash keys). One shuffle total, then an aggregation to
    |event types| rows.
    """
    s = sessionize(df, gap_seconds=gap_seconds)
    w = Window.partitionBy("user_id", "session_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    attributed = (
        s.withColumn("first_touch", F.first("event_type").over(w))
        .where(F.col("event_type") == purchase_type)
        .groupBy("first_touch")
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
    )
    tot = Window.partitionBy()
    return attributed.select(
        "first_touch",
        "n_purchases",
        (
            F.col("n_purchases").cast("double")
            / F.sum("n_purchases").over(tot).cast("double")
        ).alias("share"),
    )


PURCHASE_ATTRIBUTION_SQL = "WITH " + SESSIONIZE_SQL_CTE.format(gap=1800) + """,
f AS (
  SELECT event_type,
         first_value(event_type) OVER (
           PARTITION BY user_id, sid ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS first_touch
  FROM s
),
c AS (
  SELECT first_touch, CAST(count(*) AS BIGINT) AS n_purchases
  FROM f WHERE event_type = 'purchase' GROUP BY 1
)
SELECT first_touch, n_purchases,
       CAST(n_purchases AS DOUBLE)
         / CAST(sum(n_purchases) OVER () AS DOUBLE) AS share
FROM c
"""


def user_retention_curve(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_gap_days: int = 7,
) -> DataFrame:
    """Kaplan–Meier survival estimate of user lifetime — the
    censoring-correct retention curve (naive "percent still active
    after t days" is biased because recently-arrived users haven't
    HAD t days yet). Per user: lifetime = days between first and last
    event; the observation is a CHURN EVENT if the user has been
    silent for at least ``censor_gap_days`` before the corpus end,
    otherwise it is right-censored (still alive). The estimator:
    ``S(t) = Π_{t_i ≤ t} (1 - d_i / n_i)`` over distinct event times,
    where ``n_i`` counts users still at risk. Output one row per
    distinct lifetime: ``(t_days, n_risk, n_churned, n_censored,
    survival)``.

    Exactness: ``d/n`` are int/int divisions; the running product
    rides ``exp(Σ ln(1 - d/n))`` with the sum ORDER-DEFINED by the
    cumulative window (both engines add in t order), and the result
    quantized 12dp against 1-ulp libm ln/exp divergence (the
    token_pmi lesson).

    Scale shape: one per-user aggregate (map-side combine), a 1-row
    broadcast corpus-end anchor, then ALL windows run over the
    per-distinct-lifetime aggregate — bounded by the observation
    span in days (a few thousand rows for a decade), not by users.
    """
    day = F.date_trunc("DAY", F.col(ts_col))
    per = df.groupBy(user_col).agg(
        F.min(day).alias("__first__"), F.max(day).alias("__last__")
    )
    end = df.agg(F.max(day).alias("__end__"))
    obs = per.crossJoin(F.broadcast(end)).select(
        F.datediff(F.col("__last__"), F.col("__first__"))
        .cast("long")
        .alias("t_days"),
        (
            F.datediff(F.col("__end__"), F.col("__last__"))
            >= int(censor_gap_days)
        ).alias("churned"),
    )
    per_t = obs.groupBy("t_days").agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0))
        .cast("long")
        .alias("n_churned"),
        F.sum(F.when(F.col("churned"), 0).otherwise(1))
        .cast("long")
        .alias("n_censored"),
        F.count(F.lit(1)).cast("long").alias("__n_t__"),
    )
    w_all = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_prev = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    n_total = F.sum("__n_t__").over(
        Window.orderBy("t_days").rangeBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    n_risk = n_total - F.coalesce(
        F.sum("__n_t__").over(w_prev), F.lit(0)
    )
    staged = per_t.select(
        "t_days",
        "n_churned",
        "n_censored",
        n_risk.cast("long").alias("n_risk"),
    )
    # d == n (every remaining user churns at this lifetime — only
    # possible at the maximum observed lifetime) would be ln(0):
    # Spark F.log returns NULL (silently SKIPPED by a window sum,
    # freezing survival at its previous value) and DuckDB ln raises.
    # Handle it structurally: the term stays 0 and a cumulative flag
    # hard-sets survival to 0 from that row on, in both engines.
    ln_term = F.when(
        (F.col("n_churned") > 0) & (F.col("n_churned") < F.col("n_risk")),
        F.log(
            F.lit(1.0)
            - F.col("n_churned").cast("double") / F.col("n_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    # cumulative SEQUENTIAL fold, not a float window sum: DuckDB
    # evaluates windowed sums via segment-tree combination while Spark
    # accumulates in frame order — float addition is non-associative,
    # so long curves could drift past the 12dp quantization. The
    # repo's sorted-fold idiom (aggregate over the frame-ordered list
    # <-> list_sum(list(...) OVER ...)) adds in the same order in
    # both engines.
    ln_sum = F.aggregate(
        F.collect_list(ln_term).over(w_all),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dead = F.max(
        F.when(F.col("n_churned") == F.col("n_risk"), 1).otherwise(0)
    ).over(w_all)
    surv = F.when(dead == 1, F.lit(0.0)).otherwise(F.exp(ln_sum))
    return staged.select(
        "t_days",
        "n_risk",
        "n_churned",
        "n_censored",
        F.bround(surv, 12).alias("survival"),
    )


USER_RETENTION_CURVE_SQL = """
WITH per AS (
  SELECT user_id,
         date_trunc('day', min(ts)) AS first_d,
         date_trunc('day', max(ts)) AS last_d
  FROM events GROUP BY 1
),
anchor AS (SELECT date_trunc('day', max(ts)) AS end_d FROM events),
obs AS (
  SELECT CAST(date_diff('day', first_d, last_d) AS BIGINT) AS t_days,
         date_diff('day', last_d, anchor.end_d) >= 7 AS churned
  FROM per, anchor
),
per_t AS (
  SELECT t_days,
         CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
           AS n_churned,
         CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
           AS n_censored,
         CAST(count(*) AS BIGINT) AS n_t
  FROM obs GROUP BY 1
),
staged AS (
  SELECT t_days, n_churned, n_censored,
         CAST(sum(n_t) OVER () - coalesce(sum(n_t) OVER (
                ORDER BY t_days
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM per_t
)
SELECT t_days, n_risk, n_churned, n_censored,
       round_even(CASE WHEN max(CASE WHEN n_churned = n_risk THEN 1 ELSE 0 END)
                         OVER w_cum = 1
                  THEN CAST(0.0 AS DOUBLE)
                  ELSE exp(list_sum(list(
                    CASE WHEN n_churned > 0 AND n_churned < n_risk
                         THEN ln(CAST(1.0 AS DOUBLE)
                                 - CAST(n_churned AS DOUBLE)
                                   / CAST(n_risk AS DOUBLE))
                         ELSE CAST(0.0 AS DOUBLE) END
                  ) OVER w_cum)) END, 12) AS survival
FROM staged
WINDOW w_cum AS (ORDER BY t_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def top_session_paths(
    df: DataFrame,
    gap_seconds: int = 1800,
    top_k: int = 20,
    max_len: int = 20,
) -> DataFrame:
    """Most common session event paths — full-sequence clickstream
    mining (the N-step generalization of the transition matrix):
    each session becomes the ordered string of its event types
    ("view>click>purchase"), truncated at ``max_len`` steps, and the
    global top ``top_k`` paths are ranked by frequency. The
    product-analytics primitive behind "what do converting sessions
    actually look like".

    Determinism: the per-session sequence is an ``array_sort`` over
    ``(ts, event_id, type)`` structs — total order, ties pinned.
    Scale shape: one shuffle on the user key (the per-session
    aggregate's ``(user, session)`` grouping is satisfied by the
    sessionize partitioning); ``max_len`` bounds the path string a
    marathon bot session could otherwise build; the path count
    aggregate is path-cardinality-sized with map-side combine, and
    the top-k lowers to TakeOrderedAndProject.
    """
    s = sessionize(df, gap_seconds=gap_seconds)
    paths = (
        s.groupBy("user_id", "session_id")
        .agg(
            F.concat_ws(
                ">",
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda x: x["event_type"],
                    ),
                    1,
                    int(max_len),
                ),
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    )
    ranked = paths.orderBy(F.desc("n_sessions"), F.asc("path")).limit(int(top_k))
    w = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))


TOP_SESSION_PATHS_SQL = "WITH " + SESSIONIZE_SQL_CTE.format(gap=1800) + """,
paths AS (
  SELECT array_to_string(
           (list(event_type ORDER BY ts, event_id))[1:20], '>') AS path
  FROM s GROUP BY user_id, sid
),
counts AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
  FROM paths GROUP BY 1
)
SELECT path, n_sessions,
       CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS BIGINT)
         AS rank
FROM (SELECT * FROM counts ORDER BY n_sessions DESC, path LIMIT 20)
"""


def user_twap(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average value per user — the irregular-sampling
    mean (finance's TWAP, metering's time-in-state average): each
    observation is weighted by how long it was current (microseconds
    until the user's next event), so a burst of identical readings
    doesn't dominate the way a plain ``avg`` lets it. The last
    observation of each user has no successor and is excluded (an
    open interval has no defined weight); users with fewer than two
    events yield no row. Output: ``(user, n_intervals, span_us,
    twap)``.

    Exactness: weights are INTEGER microsecond deltas and values ride
    DECIMAL(18,2) (the fixture's 2dp metric discipline), so
    ``Σ(v·dt)`` is an exact DECIMAL sum — order-free (verified
    bit-identical across engines). The final division is quantized at
    12dp: DuckDB's DECIMAL(38,2)→DOUBLE cast rounds in two steps
    (hugeint→double, then /100) and lands 1 ulp off Spark's
    correctly-rounded BigDecimal cast; at TWAP magnitude 12dp sits
    far above ulp spacing and absorbs it. NULL values are
    excluded from both numerator and denominator (their time belongs
    to no observation, mirroring "gap", not "zero").

    Scale shape: one shuffle on the user key, a ``lead`` window scan,
    one map-side-combining aggregate.
    """
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    us = F.unix_micros(F.col(ts_col))
    dt = F.lead(us).over(w) - us
    staged = (
        df.select(
            F.col(user_col),
            F.col(value_col).cast("decimal(18,2)").alias("__v__"),
            dt.alias("__dt__"),
        )
        .where(F.col("__dt__").isNotNull() & F.col("__v__").isNotNull())
    )
    return (
        staged.groupBy(user_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("__dt__").cast("long").alias("span_us"),
            F.sum(F.col("__v__") * F.col("__dt__").cast("decimal(20,0)")).alias(
                "__num__"
            ),
        )
        .where(F.col("span_us") > 0)
        .select(
            user_col,
            "n_intervals",
            "span_us",
            F.bround(
                F.col("__num__").cast("double")
                / F.col("span_us").cast("double"),
                12,
            ).alias("twap"),
        )
    )


USER_TWAP_SQL = """
WITH staged AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,2)) AS v,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC)
           - epoch_us(ts) AS dt
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(dt) AS BIGINT) AS span_us,
       round_even(CAST(sum(v * CAST(dt AS DECIMAL(20,0))) AS DOUBLE)
                  / CAST(CAST(sum(dt) AS BIGINT) AS DOUBLE), 12) AS twap
FROM staged
WHERE dt IS NOT NULL AND v IS NOT NULL
GROUP BY user_id
HAVING sum(dt) > 0
"""


def user_max_drawdown(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Maximum drawdown of each user's value series — the largest
    peak-to-trough drop ``max_t(running_max(v) - v_t)``, the
    risk/degradation metric from finance that reads just as well on
    engagement or quality series ("how far below their best has this
    user fallen"). Output: ``(user, n_obs, peak, max_drawdown)``.

    The recurrence is NOT a black-box state kernel (unlike EWMA):
    running-max is an associative window aggregate, so the whole
    thing is two exact passes — a cumulative ``max`` window then a
    grouped ``max`` of (cummax − v) — with values on DECIMAL(18,2)
    end-to-end; no floats anywhere, no quantization needed.

    Scale shape: one shuffle on the user key, per-user-bounded
    window scan, map-side-combining final aggregate.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.asc(ts_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col).cast("decimal(18,2)")
    staged = (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(user_col),
            v.alias("__v__"),
            F.max(v).over(w).alias("__peak__"),
        )
    )
    return staged.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.max("__peak__").cast("double").alias("peak"),
        F.max(F.col("__peak__") - F.col("__v__")).cast("double").alias(
            "max_drawdown"
        ),
    )


USER_MAX_DRAWDOWN_SQL = """
WITH staged AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,2)) AS v,
         max(CAST(value AS DECIMAL(18,2))) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM events
  WHERE value IS NOT NULL
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(max(peak) AS DOUBLE) AS peak,
       CAST(max(peak - v) AS DOUBLE) AS max_drawdown
FROM staged
GROUP BY user_id
"""


def conversion_lag_hist(
    df: DataFrame,
    first_type: str = "view",
    convert_type: str = "purchase",
    bucket_hours: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert distribution: for every user, the lag from
    their FIRST ``first_type`` event to their first ``convert_type``
    event at-or-after it, bucketed into ``bucket_hours`` bins — the
    funnel-velocity histogram behind "how long does view→purchase
    take" (medians hide the bimodality this exposes). Output:
    ``(lag_bucket, n_users, share)`` where ``lag_bucket`` is hours
    (floor), covering only converting users; ``share`` sums to 1.

    Exactness: lags are integer microseconds, buckets integer floor
    division, ``share`` one int/int double division — no float folds.

    Scale shape: the first-touch side shrinks to one row per user
    BEFORE the join; the conversion side stays event-granular into
    the user-keyed equi-join (the ``>= t0`` filter needs t0 first),
    bounded by the ``convert_type`` selectivity, and collapses to one
    row per user in the conditional-min aggregate immediately after —
    an equi-join plus filter, never a range join. The histogram
    aggregate is bucket-cardinality-sized; the normalizing window
    runs over the histogram.
    """
    us = F.unix_micros(F.col(ts_col))
    firsts = (
        df.where(F.col(type_col) == first_type)
        .groupBy(user_col)
        .agg(F.min(us).alias("__t0__"))
    )
    convs = df.where(F.col(type_col) == convert_type).select(
        F.col(user_col), us.alias("__tc__")
    )
    lag = (
        convs.join(firsts, user_col)
        .where(F.col("__tc__") >= F.col("__t0__"))
        .groupBy(user_col)
        .agg(
            (F.min("__tc__") - F.first("__t0__")).alias("__lag_us__")
        )
    )
    bucket_us = int(bucket_hours) * 3_600_000_000
    hist = (
        lag.select(
            F.floor(F.col("__lag_us__") / F.lit(bucket_us)).cast("long").alias(
                "lag_bucket"
            )
        )
        .groupBy("lag_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    tot = Window.rangeBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return hist.select(
        "lag_bucket",
        "n_users",
        (
            F.col("n_users").cast("double") / F.sum("n_users").over(tot).cast("double")
        ).alias("share"),
    )


CONVERSION_LAG_HIST_SQL = """
WITH firsts AS (
  SELECT user_id, min(epoch_us(ts)) AS t0
  FROM events WHERE event_type = 'view' GROUP BY 1
),
lag AS (
  SELECT e.user_id, min(epoch_us(e.ts)) - any_value(f.t0) AS lag_us
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= f.t0
  GROUP BY e.user_id
),
hist AS (
  SELECT CAST(lag_us // 3600000000 AS BIGINT) AS lag_bucket,
         CAST(count(*) AS BIGINT) AS n_users
  FROM lag GROUP BY 1
)
SELECT lag_bucket, n_users,
       CAST(n_users AS DOUBLE) / CAST(sum(n_users) OVER () AS DOUBLE) AS share
FROM hist
"""


def user_active_streaks(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_streak: int = 3,
) -> DataFrame:
    """Longest consecutive-active-day streak per user, reduced to one
    summary row — the engagement-habit metric (daily-streak mechanics)
    via the classic gaps-and-islands derivation: with active days
    ranked per user, ``day − rank`` is constant exactly along a
    consecutive run, so islands fall out of one group-by. Output:
    ``(n_users, max_streak, n_users_ge_min, mean_max_streak)``.

    Exactness: everything is integer (distinct days, ranks, island
    keys, streak lengths) until the one mean division, 12dp-quantized.

    Scale shape: distinct (user, day) with map-side combine; the
    ranking window partitions BY USER (bounded by a user's active
    days — never corpus-wide); islands and maxima are two more
    user-keyed aggregates; output is one row.
    """
    days = (
        df.select(F.col(user_col).alias("u"), F.to_date(ts_col).alias("d"))
        .distinct()
    )
    w = Window.partitionBy("u").orderBy("d")
    islands = days.select(
        "u", F.date_sub(F.col("d"), F.row_number().over(w)).alias("__isl__")
    )
    streaks = islands.groupBy("u", "__isl__").agg(
        F.count(F.lit(1)).cast("long").alias("__len__")
    )
    per_user = streaks.groupBy("u").agg(
        F.max("__len__").alias("__mx__")
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.max("__mx__").cast("long").alias("max_streak"),
        F.sum(F.when(F.col("__mx__") >= int(min_streak), 1).otherwise(0))
        .cast("long")
        .alias("n_users_ge_min"),
        F.bround(
            F.sum("__mx__").cast("double")
            / F.count(F.lit(1)).cast("double"),
            12,
        ).alias("mean_max_streak"),
    )


USER_ACTIVE_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
),
islands AS (
  SELECT u,
         d - CAST(row_number() OVER (PARTITION BY u ORDER BY d) AS INT)
           AS isl
  FROM days
),
streaks AS (
  SELECT u, isl, CAST(count(*) AS BIGINT) AS len
  FROM islands GROUP BY 1, 2
),
per_user AS (SELECT u, max(len) AS mx FROM streaks GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(max(mx) AS BIGINT) AS max_streak,
       CAST(sum(CASE WHEN mx >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_users_ge_min,
       round_even(CAST(sum(mx) AS DOUBLE) / CAST(count(*) AS DOUBLE), 12)
         AS mean_max_streak
FROM per_user
"""


def event_burstiness(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Index of dispersion (Fano factor) of hourly event counts per
    type — the point-process "is arrival traffic Poisson or bursty"
    diagnostic (D = variance/mean of per-hour counts; ≈1 Poisson,
    ≫1 bursty/flash-crowd, <1 metronomic). Output: ``(event_type,
    n_hours, n_events, mean_per_hour, dispersion)``.

    The hour spine is COMPLETE over the corpus span (a 1-row min/max
    broadcast explodes into every hour between them): zero-count
    hours are real observations — skipping them inflates the mean
    and buries the burstiness the statistic exists to catch.

    Exactness: dispersion is cleared to ``(n·Σc² − (Σc)²)/(n·Σc)`` —
    all-integer numerator/denominator on DECIMAL(38,0), one fixed
    double division 12dp-quantized; the mean likewise.

    Scale shape: one map-side-combining (type, hour) count, one
    spine explode bounded by span-hours × types, one type-keyed
    fold. Nothing data-sized past the first aggregate.
    """
    hour = F.date_trunc("HOUR", F.col(ts_col))
    counts = df.groupBy(
        F.col(type_col).alias("t"), hour.alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    # span derived FROM the counts frame (date_trunc is monotone, so
    # min/max of truncated hours == truncated min/max ts) — no second
    # scan of the fact table (review finding)
    span = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    types = counts.select("t").distinct()
    spine = types.crossJoin(F.broadcast(span)).select(
        "t",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    full = spine.join(counts, ["t", "h"], "left").select(
        "t", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    # square IN decimal before summing (the repo power-sum rule —
    # a long sum of c^2 overflows at ~1e8 events/hour; review finding)
    g = full.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("c").cast("long").alias("n_events"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")
        ).alias("__s2__"),
    )
    num = (dec("n_hours") * dec("__s2__") - dec("n_events") * dec("n_events")).cast(
        "double"
    )
    den = (dec("n_hours") * dec("n_events")).cast("double")
    return g.select(
        F.col("t").alias("event_type"),
        "n_hours",
        "n_events",
        F.bround(
            F.col("n_events").cast("double") / F.col("n_hours").cast("double"),
            12,
        ).alias("mean_per_hour"),
        F.when(F.col("n_events") > 0, F.bround(num / den, 12)).alias(
            "dispersion"
        ),
    )


EVENT_BURSTINESS_SQL = """
WITH counts AS (
  SELECT event_type AS t, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events
),
spine AS (
  SELECT t, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM (SELECT DISTINCT t FROM counts) CROSS JOIN span
),
filled AS (
  SELECT s.t, coalesce(c.c, 0) AS c
  FROM spine s LEFT JOIN counts c ON s.t = c.t AND s.h = c.h
),
g AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(c) AS BIGINT) AS n_events,
         sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2
  FROM filled GROUP BY 1
)
SELECT t AS event_type, n_hours, n_events,
       round_even(CAST(n_events AS DOUBLE) / CAST(n_hours AS DOUBLE), 12)
         AS mean_per_hour,
       CASE WHEN n_events > 0 THEN
         round_even(
           CAST(CAST(n_hours AS HUGEINT) * s2
                - CAST(n_events AS HUGEINT) * CAST(n_events AS HUGEINT)
                AS DOUBLE)
           / CAST(CAST(n_hours AS HUGEINT) * CAST(n_events AS HUGEINT)
                  AS DOUBLE),
           12)
       END AS dispersion
FROM g
"""

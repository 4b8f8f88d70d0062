"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet fixtures, then
compares row count, sorted column names, and an order-insensitive
exact value comparison (floats compared bit-for-bit — if they drift,
the query needs deterministic numerics, not a looser check here).

Usage: python tools/check_oracle.py [sf_dir] [query ...]

Timezone-hostile mode: ``ORACLE_TZ=America/New_York python
tools/check_oracle.py ...`` builds the Spark session with a non-UTC
(DST-varying) session timezone, simulating the driver calling
``queries()`` from its own session. The contract is expected to be
invariant: ``load_table`` pins ``spark.sql.session.timeZone=UTC`` at
query-build time, so results must match the oracle bit-for-bit
regardless of the caller's session timezone.

Vanilla-session mode: ``ORACLE_VANILLA=1`` builds a PLAIN
SparkSession (no package configs at all — Spark defaults: 200
shuffle partitions, 10 MB broadcast threshold, AQE defaults), which
is how the external driver actually calls ``queries()``. Different
partitioning changes plan shapes and float accumulation order, so a
query whose value path isn't order-stable (unsorted float fold)
passes the tuned-session gate and diverges here — the same class of
environment-dependence the driver would expose. Composes with
ORACLE_TZ.

No-sweep mode: ``ORACLE_NO_SWEEP=1`` skips the between-query
clearCache/checkpoint sweep, simulating a driver that runs its whole
window in one session without any cache hygiene. Catches operators
whose persisted intermediates are not released by their own plan
lifecycle (accumulating blocks -> memory pressure late in the
window). Composes with the other modes.
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_val(v):
    # driver-faithful: the driver canonicalizes through pandas, which
    # raises "unhashable type" on list/struct cells — reject instead
    # of stringifying so a driver-unhashable shape fails HERE first
    # (r5's pq_codes was locally green via str() and driver-red)
    if isinstance(v, (list, tuple, dict, set, bytearray)):
        raise TypeError(
            f"nested cell {type(v).__name__} in oracle-checked output — "
            "the driver cannot hash this; reshape to scalar columns"
        )
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (datetime, date)):
        return ("t", v.isoformat())
    return ("s", str(v))


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_val(r[i]) for i in order))
    out.sort()
    return out


def _env_flag(name: str) -> bool:
    """Env toggle honoring the =1/on vs =0/off convention (bare
    truthiness would read ORACLE_NO_SWEEP=0 as ON)."""
    return os.environ.get(name, "").strip().lower() not in ("", "0", "false", "no")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    no_sweep = _env_flag("ORACLE_NO_SWEEP")

    import __spark_entry__ as mod
    from bht_etl_app_spark import get_spark

    hostile_tz = os.environ.get("ORACLE_TZ")
    if no_sweep:
        print("no-sweep mode: between-query clearCache/checkpoint sweep OFF")
    if _env_flag("ORACLE_VANILLA"):
        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
        b = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master(f"local[{cpus}]")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_DRIVER_MEM", "16g"))
        )
        if hostile_tz:
            b = b.config("spark.sql.session.timeZone", hostile_tz)
        spark = b.getOrCreate()
        print("vanilla-session mode: Spark defaults "
              "(200 shuffle partitions, 10MB broadcast threshold)")
    else:
        extra = {"spark.sql.session.timeZone": hostile_tz} if hostile_tz else None
        spark = get_spark("oracle-check", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    if hostile_tz:
        print(f"tz-hostile mode: session timezone = {hostile_tz}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failures = []
    timings = {}
    from time import perf_counter

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        timings[name] = perf_counter() - t0
        # operators persist intermediates (banded signatures, gram
        # counts) for their own multi-consumer plans; drop them once
        # the query is collected so cached blocks don't accumulate
        # across the 234-query session (ORACLE_NO_SWEEP simulates a
        # driver that never does this)
        if not no_sweep:
            spark.catalog.clearCache()
            from bht_etl_app_spark.functions.lifecycle import sweep_checkpoints

            sweep_checkpoints(spark.sparkContext)
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows, {timings[name]:.2f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue

        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if not problems:
            try:
                a = normalize([tuple(r) for r in srows], scols)
                b = normalize(drows, dcols)
            except TypeError as e:
                failures.append(name)
                print(f"FAIL {name}: {e}")
                continue
            if a != b:
                diffs = [
                    (x, y) for x, y in zip(a, b) if x != y
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name} ({len(srows)} rows, {timings[name]:.2f}s)")

    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print("\nslowest (spark side):")
    for n, t in slow:
        print(f"  {t:6.2f}s {n}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

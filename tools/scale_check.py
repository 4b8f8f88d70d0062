"""Scaling evidence: run the bench headline queries at two scale
factors and report the wall-time ratio per query against the data
ratio.

Usage: python tools/scale_check.py [small_sf_dir] [big_sf_dir]
       (defaults sf0.01 -> sf0.1, a 10x data step)

Reading the ratio:
- ratio ≪ data ratio: the query is still fixed-overhead-bound at this
  size (scheduling, plan compile, session) — scaling headroom.
- ratio ≈ data ratio: linear data-bound — the expected steady state
  for scans/projections/shuffles.
- ratio ≫ data ratio: superlinear — a quadratic candidate set, a
  collapsing single partition, or a skewed key. These are the rows
  that would NOT survive 100x, which is exactly what this tool
  exists to catch before a cluster run does.

The driver-facing claim is in the plan shapes (tests/test_plans.py);
this is the measured cross-check at fixture sizes.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def run_set(sf_dir: str, names, qs, spark) -> dict[str, float]:
    times = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        times[name] = time.perf_counter() - t0
    return times


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("small", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("big", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--ratio", type=float, default=None,
        help="data ratio big/small (inferred from sfN dir names if omitted)",
    )
    ap.add_argument(
        "--queries", default=None,
        help="comma-separated query names (default: bench headline set)",
    )
    args = ap.parse_args()
    small, big = args.small, args.big

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    import __spark_entry__ as mod
    from bht_etl_app_spark import get_spark

    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")

    qs = mod.queries()
    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
    else:
        names = [n for n in bench.HEADLINE if n in qs]

    # warm both directories' footers + codegen once
    for d in (small, big):
        spark.read.parquet(os.path.join(d, "orders.parquet")).limit(100).count()

    t_small = run_set(small, names, qs, spark)
    t_big = run_set(big, names, qs, spark)

    if args.ratio is not None:
        data_ratio = args.ratio
    else:
        m = re.search(r"sf([0-9.]+)", small)
        m2 = re.search(r"sf([0-9.]+)", big)
        data_ratio = float(m2.group(1).rstrip(".")) / float(m.group(1).rstrip("."))

    rows = sorted(
        ((n, t_small[n], t_big[n], t_big[n] / t_small[n]) for n in names),
        key=lambda r: -r[3],
    )
    print(f"data ratio {data_ratio:.0f}x ({small} -> {big})")
    print(f"{'query':<32} {'small(s)':>9} {'big(s)':>8} {'wall ratio':>10}")
    flagged = []
    for n, s, b, r in rows:
        mark = " <== superlinear" if r > data_ratio * 1.2 and b > 1.0 else ""
        if mark:
            flagged.append(n)
        print(f"{n:<32} {s:>9.2f} {b:>8.2f} {r:>9.1f}x{mark}")
    print(json.dumps({"data_ratio": data_ratio, "superlinear": flagged}))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())

"""Per-query bench regression report between two driver bench files.

Usage: python tools/compare_bench.py BENCH_r1.json BENCH_r2.json

Reads the driver's recorded bench JSON (either the raw driver file
with a ``parsed`` field or a bare ``{"queries": ...}`` line), prints a
per-query delta table sorted by regression, and exits 1 when any
common query regressed more than ``--threshold`` (default 50% — wide
because single-run small-scale walls carry GC/session noise; see
PERFORMANCE.md).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d["queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="fail when a common query regresses more than this fraction")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    rows = [(n, old[n], new[n], (new[n] - old[n]) / old[n]) for n in common]
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':<32} {'old(s)':>8} {'new(s)':>8} {'delta':>7}")
    for n, o, w, d in rows:
        print(f"{n:<32} {o:>8.2f} {w:>8.2f} {d:>+6.0%}")
    if added:
        print("added:", ", ".join(f"{n} ({new[n]:.2f}s)" for n in added))
    if removed:
        print("removed:", ", ".join(removed))
    tot_old, tot_new = sum(old[n] for n in common), sum(new[n] for n in common)
    print(f"common-query total: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({(tot_new - tot_old) / tot_old:+.0%})")

    bad = [r for r in rows if r[3] > args.threshold]
    if bad:
        print(f"\nREGRESSIONS over {args.threshold:.0%}: "
              + ", ".join(f"{n} {d:+.0%}" for n, _, _, d in bad))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

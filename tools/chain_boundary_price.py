"""Price the curated_verdicts_full double-evaluation (r8 VERDICT
item #6): with BOTH optional stages on, the ExactSubstr scrub output
feeds two consumers (the substr keep-list and the decontamination
stage), and under the no-text-persists discipline the scrub plan
evaluates twice — the operator's persisted grams frame bounds the
recompute to the probe + gaps-and-islands half, but the price was an
argument, not a number.

This runs the COMPLETE chain (quality -> exact -> near-dup -> KN
perplexity -> ExactSubstr scrub -> decontamination-of-scrubbed-text,
xxhash64 production fingerprints, the curated_verdicts_full shape)
twice per scale point:

- recompute: persist_scrubbed=False (the shipping default)
- boundary:  persist_scrubbed=True (opt-in id+scrubbed_text persist,
  MEMORY_AND_DISK — document text blocks enter the cache)

and checks the verdict histograms match bit-for-bit before reporting
walls. Values forced through the groupBy(verdict) count (never a
bare count() — the column-pruning measurement trap).

Usage: python tools/chain_boundary_price.py [dir ...]
       (default: /root/testdata/sf0.1 /tmp/scale10 /tmp/scale30 —
       build /tmp/scale* with tools/make_scale_fixture.py)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

LM_MIN_AVG_LOGPROB = -4.2


def run(spark, sf_dir: str, tag: str) -> dict[str, float]:
    from bht_etl_app_spark.functions.lifecycle import release, sweep_checkpoints
    from bht_etl_app_spark.operators.corpus import curate_corpus

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    crawl = docs.where(F.col("source") != "src0")
    ref = docs.where(F.col("source") == "src0")
    walls: dict[str, float] = {}
    counts: dict[str, dict] = {}
    for key, persist in (("recompute", False), ("boundary", True)):
        t0 = time.perf_counter()
        verdicts = curate_corpus(
            crawl, ref, hash_fn="xxhash64", lm_ref=ref,
            lm_min_avg_logprob=LM_MIN_AVG_LOGPROB, substr_k=5,
            persist_scrubbed=persist,
        )
        counts[key] = {
            r["verdict"]: r["n"]
            for r in verdicts.groupBy("verdict")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        walls[key] = time.perf_counter() - t0
        release(verdicts)
        spark.catalog.clearCache()
        sweep_checkpoints(spark.sparkContext)
    assert counts["recompute"] == counts["boundary"], (
        tag, counts,
    )
    print(f"[{tag}] verdicts={counts['recompute']}")
    print(f"[{tag}] " + " ".join(f"{k}={v:.1f}s" for k, v in walls.items()))
    return walls


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale30",
    ]
    from bht_etl_app_spark import get_spark

    spark = get_spark("chain-boundary-price")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # warmup
    spark.read.parquet(
        os.path.join(dirs[0], "documents.parquet")
    ).limit(100).count()

    results = {d: run(spark, d, os.path.basename(d.rstrip("/"))) for d in dirs}
    print("\nconfig         " + "".join(
        f"{os.path.basename(d.rstrip('/')):>16s}" for d in dirs
    ))
    for k in ("recompute", "boundary"):
        row = f"{k:14s}"
        for d in dirs:
            row += f"  {results[d][k]:6.1f}s"
        print(row)
    return 0


if __name__ == "__main__":
    sys.exit(main())

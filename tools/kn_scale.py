"""KN LM scale step (VERDICT r6 item #4): the one-scan/vocab-bounded
claim was argued, not measured — measure it. Three stages at 1x
(sf0.1: 5k docs) and 10x/30x (/tmp/scale10, /tmp/scale30 from
tools/make_scale_fixture.py — built FROM sf0.1, so sf0.1 is the
small side; see the fixture-ratio trap note in PERFORMANCE.md):

- kn_train: kn_model_tables over the non-src0 corpus (training at
  30x data — the single corpus pass; every KN quantity downstream is
  an aggregation over the vocabulary-bounded trigram count table, so
  wall should track the corpus scan, and the model tables should NOT
  grow 30x: the fixture vocabulary is ~31 words + replica salts).
- kn_score: the CCNet direction — train on the src0 reference, score
  the non-src0 crawl through the full backoff cascade (scoring at
  30x: five keyed LEFT joins + the position-ordered fold).
- curate_lm: the COMPOSED chain (curate_corpus with lm_ref), the
  production xxhash64 family — comparable with the r6 chain table's
  curate_verdicts stage (quality -> exact -> minhash -> LM -> decon).

Usage: python tools/kn_scale.py [dir ...]
       (default: /root/testdata/sf0.1 /tmp/scale10 /tmp/scale30)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run(spark, sf_dir: str, tag: str) -> dict[str, float]:
    from bht_etl_app_spark.functions.lifecycle import release, sweep_checkpoints
    from bht_etl_app_spark.operators.corpus import curate_corpus
    from bht_etl_app_spark.operators.ngram_lm import (
        kn_doc_logprob,
        kn_model_tables,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    crawl = docs.where(F.col("source") != "src0")
    ref = docs.where(F.col("source") == "src0")
    walls: dict[str, float] = {}

    t0 = time.perf_counter()
    t = kn_model_tables(crawl)
    p3_rows = t["p3"].count()
    walls["kn_train"] = time.perf_counter() - t0
    release(t["p3"])
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    scored = kn_doc_logprob(crawl, train_df=ref, final_round=6)
    # force the VALUES, not just the row count — a bare count() lets
    # Catalyst prune the per-token fold and under-measures scoring
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"), F.sum("logprob").alias("s")
    ).collect()[0]
    n_scored = agg["n"]
    walls["kn_score"] = time.perf_counter() - t0
    release(scored)
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    verdicts = curate_corpus(crawl, ref, hash_fn="xxhash64", lm_ref=ref)
    counts = {
        r["verdict"]: r["n"]
        for r in verdicts.groupBy("verdict").agg(F.count("*").alias("n")).collect()
    }
    walls["curate_lm"] = time.perf_counter() - t0
    release(verdicts)
    spark.catalog.clearCache()
    sweep_checkpoints(spark.sparkContext)

    print(
        f"[{tag}] p3_types={p3_rows} scored={n_scored} verdicts={counts} "
        + " ".join(f"{k}={v:.1f}s" for k, v in walls.items())
    )
    return walls


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale30",
    ]
    from bht_etl_app_spark import get_spark

    spark = get_spark("kn-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # warmup
    spark.read.parquet(os.path.join(dirs[0], "documents.parquet")).limit(100).count()

    results = {d: run(spark, d, os.path.basename(d.rstrip("/"))) for d in dirs}
    base = results[dirs[0]]
    print("\nstage        " + "".join(f"{os.path.basename(d.rstrip('/')):>16s}" for d in dirs))
    for k in base:
        row = f"{k:12s}"
        for d in dirs:
            r = results[d][k] / base[k] if base[k] else float("inf")
            row += f"  {results[d][k]:6.1f}s ({r:4.1f}x)"
        print(row)
    return 0


if __name__ == "__main__":
    sys.exit(main())

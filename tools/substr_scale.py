"""ExactSubstr scale step (r7 VERDICT items #1/#3/#4): the staged
family's 1.9x-at-30x figure was measured on the md5 oracles; now that
the family is registered and composed into curate_corpus, measure the
PRODUCTION configuration (xxhash64 fingerprints) and the composed
chain's per-stage cost. Stages at 1x (sf0.1: 5k docs) and 10x/30x
(/tmp/scale10, /tmp/scale30 from tools/make_scale_fixture.py — built
FROM sf0.1, so sf0.1 is the small side; see the fixture-ratio trap
note in PERFORMANCE.md):

- substr_spans: the detection kernel over the full corpus — gram
  count + fp-keyed probe + gaps-and-islands merge (xxhash64: 8-byte
  fps on the two corpus-scale exchanges).
- substr_scrub: detection + the per-doc array-native remover +
  reassembly (what curate_corpus's substr stage actually runs).
- curate_base / curate_substr: the composed chain WITHOUT and WITH
  the substr stage (both xxhash64, lm off) — the difference is the
  stage's end-to-end price inside the chain, including the
  decontamination re-tokenize over scrubbed text.

Values are forced through sums (never bare count() — the Catalyst
column-pruning measurement trap, PERFORMANCE.md r7).

Usage: python tools/substr_scale.py [dir ...]
       (default: /root/testdata/sf0.1 /tmp/scale10 /tmp/scale30)

``SUBSTR_K=50 python tools/substr_scale.py`` measures the
paper-scale regime (Lee et al. deploy k=50 BYTES ~ tens of tokens;
our k counts tokens): on the ~31-word-vocabulary fixture k=5 marks
66% of survivor text as duplicated-run cover (a fixture artifact),
while k=50 requires 50-token verbatim runs — much sparser duplicate
mass, much smaller covered-position frames, the shape real crawl
data has (r8 VERDICT missing-item #5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run(spark, sf_dir: str, tag: str, k: int = 5) -> dict[str, float]:
    from bht_etl_app_spark.functions.lifecycle import release, sweep_checkpoints
    from bht_etl_app_spark.operators.corpus import curate_corpus
    from bht_etl_app_spark.operators.substr_dedup import (
        exact_substr_scrub,
        exact_substr_spans,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    crawl = docs.where(F.col("source") != "src0")
    ref = docs.where(F.col("source") == "src0")
    walls: dict[str, float] = {}
    stats: dict[str, object] = {}

    t0 = time.perf_counter()
    spans = exact_substr_spans(docs, k=k, hash_fn="xxhash64")
    agg = spans.agg(
        F.count(F.lit(1)).alias("n"), F.sum("span_tokens").alias("s")
    ).collect()[0]
    stats["spans"], stats["span_tokens"] = agg["n"], agg["s"]
    walls["substr_spans"] = time.perf_counter() - t0
    release(spans)
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    scrubbed = exact_substr_scrub(docs, k=k, hash_fn="xxhash64")
    agg = scrubbed.agg(
        F.sum("n_kept").alias("k"), F.sum("n_removed").alias("r")
    ).collect()[0]
    stats["kept_toks"], stats["removed_toks"] = agg["k"], agg["r"]
    walls["substr_scrub"] = time.perf_counter() - t0
    release(scrubbed)
    spark.catalog.clearCache()

    for key, substr_k in (("curate_base", None), ("curate_substr", k)):
        t0 = time.perf_counter()
        verdicts = curate_corpus(
            crawl, ref, hash_fn="xxhash64", substr_k=substr_k
        )
        counts = {
            r["verdict"]: r["n"]
            for r in verdicts.groupBy("verdict")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        walls[key] = time.perf_counter() - t0
        stats[key] = counts
        release(verdicts)
        spark.catalog.clearCache()
        sweep_checkpoints(spark.sparkContext)

    print(f"[{tag}] {stats}")
    print(f"[{tag}] " + " ".join(f"{k}={v:.1f}s" for k, v in walls.items()))
    return walls


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale30",
    ]
    from bht_etl_app_spark import get_spark

    spark = get_spark("substr-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # warmup
    spark.read.parquet(os.path.join(dirs[0], "documents.parquet")).limit(100).count()

    k = int(os.environ.get("SUBSTR_K", "5"))
    print(f"k={k} fingerprint=xxhash64")
    results = {
        d: run(spark, d, os.path.basename(d.rstrip("/")), k=k) for d in dirs
    }
    base = results[dirs[0]]
    print("\nstage          " + "".join(
        f"{os.path.basename(d.rstrip('/')):>16s}" for d in dirs
    ))
    for k in base:
        row = f"{k:14s}"
        for d in dirs:
            r = results[d][k] / base[k] if base[k] else float("inf")
            row += f"  {results[d][k]:6.1f}s ({r:4.1f}x)"
        print(row)
    return 0


if __name__ == "__main__":
    sys.exit(main())

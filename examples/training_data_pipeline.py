"""End-to-end training-data pipeline over the ``documents`` fixture —
the composition a 100 TB pretraining-data run would chain, built
entirely from this engine's operators:

    load -> markup/boilerplate extraction -> PII redaction (URL/
         email/IP/phone) -> quality filter -> language filter
         -> decontamination (Bloom at scale) -> dedup (exact + near
         + span-level boilerplate) -> deterministic train/test split
         -> sequence packing (concat-and-chunk or Harmonic-K
         doc-boundary) -> training-shard write

Every stage is a lazy DataFrame transformation; nothing materializes
until the final writes, so Catalyst plans the whole flow (filters
reach the scan, one shuffle per logical regroup). Run:

    python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bht_etl_app_spark import get_spark
from bht_etl_app_spark.io.sinks import write_training_shards
from bht_etl_app_spark.operators.corpus import (
    bloom_decontaminate,
    dedup_spans,
    domain_mixture_weights,
    quality_filter_decisions,
)
from bht_etl_app_spark.operators.dedup import dedup_corpus
from bht_etl_app_spark.operators.sampling import (
    pack_sequences,
    pack_sequences_harmonic,
    train_test_split,
)
from bht_etl_app_spark.operators.text import (
    PII_REDACT_CLASSES,
    extract_text_expr,
    redact_expr,
)
from bht_etl_app_spark.session import load_table


# Related one-call path: corpus.curate_corpus(docs, eval_docs) returns
# (doc_id, verdict) with the first dropping stage per document
# (contract query `curated_verdicts`; streaming twin:
# streaming_curate_ingest). NOTE it is a DIFFERENT policy than this
# script, not a drop-in: curate_corpus dedups BEFORE exact-n-gram
# decontamination (n=5), while this script Bloom-decontaminates
# (n=8) before dedup — so a contaminated cluster representative is
# dropped pre-dedup here (another member survives) but post-dedup
# there (the cluster is lost). Pick the order your contamination
# policy wants.


def build_training_set(
    docs,
    eval_docs=None,
    min_tokens: int = 20,
    langs: tuple[str, ...] = ("en", "und"),
    dedup_threshold: float = 0.8,
    pack_budget: int = 2048,
    packer: str = "chunk",
):
    """The full flow as one lazy composition; returns (train, test)
    DataFrames of ``(source, doc_id, n_tokens, start_offset, bin,
    split)``. ``eval_docs`` (optional) is a benchmark corpus to
    decontaminate against."""
    # 0. markup extraction then full-PII redaction, BEFORE anything
    # tokenizes, fingerprints, or trains (web-crawl order; both pure
    # per-row projections at scan speed). Extraction first — a
    # tag-split URL would otherwise dodge the redaction patterns.
    docs = docs.withColumn("text", extract_text_expr("text"))
    docs = docs.withColumn("text", redact_expr("text", PII_REDACT_CLASSES))

    # 1. composite quality gate: length + repetition + language rules
    keep = quality_filter_decisions(
        docs, min_tokens=min_tokens, allowed_langs=langs
    ).where(F.col("keep"))
    docs_q = docs.join(keep.select("doc_id"), "doc_id", "left_semi")

    # 2. benchmark decontamination: drop train docs sharing an n-gram
    # with the held-out eval corpus (Bloom variant: the benchmark set
    # ships as a broadcast bitmap, never as gram strings — no false
    # negatives, so nothing leaks past it)
    if eval_docs is not None:
        clean = bloom_decontaminate(docs_q, eval_docs).where(
            ~F.col("contaminated")
        )
        docs_q = docs_q.join(clean.select("doc_id"), "doc_id", "left_semi")

    # 3. dedup: exact + MinHash-LSH near-dup, one representative per
    # group; then drop docs dominated by high-copy spans (CCNet-style
    # boilerplate removal at span granularity)
    docs_d = dedup_corpus(docs_q, threshold=dedup_threshold)

    # 4. reproducible split, then pack each split independently
    split = train_test_split(docs_d)
    # packer="harmonic" keeps every document whole inside one bin
    # (zero boundary crossing, ~1-1/K fill) where "chunk" slices the
    # stream every pack_budget tokens (full bins, fragmented docs) —
    # the measured trade lives in packing_compare_stats
    pack = pack_sequences if packer == "chunk" else pack_sequences_harmonic
    packed = {
        name: pack(split.where(F.col("split") == name), budget=pack_budget)
        for name in ("train", "test")
    }
    # the packed frames read docs_d's checkpoint blocks (connected
    # components inside dedup_corpus) — transfer ownership so the
    # blocks outlive this function's locals (lifecycle contract)
    from bht_etl_app_spark.functions.lifecycle import carry

    return carry(packed["train"], docs_d), carry(packed["test"], docs_d)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="tdp_")

    spark = get_spark("training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    # report the domain mix the sampler would draw with temperature 0.7
    mix = domain_mixture_weights(docs, alpha=0.7).orderBy(F.desc("weight"))
    mix.show(5, truncate=False)

    # r12: realize a data-constrained epoch plan into the per-doc
    # training list — the water-filled budget split becomes actual
    # repeat counts (full epochs + an md5-ordered partial prefix)
    from bht_etl_app_spark.operators.corpus import mixture_plan_realize

    realized = mixture_plan_realize(docs, token_budget=50_000, alpha=0.7)
    realized.groupBy("domain").agg(
        F.sum(F.col("doc_tokens") * F.col("repeats")).alias("train_tokens"),
        F.max("repeats").alias("max_repeats"),
    ).orderBy("domain").show(truncate=False)

    # span-level boilerplate report feeding the curation loop
    spans = dedup_spans(docs, max_tokens=8)
    hot = spans.where(F.col("n_copies") >= 3)
    print(f"hot spans (>=3 copies): {hot.count()}")

    train, test = build_training_set(docs)
    # training-shard layout: hive-partitioned by packing bin (a
    # trainer reads one bin = one batch worth of sequential token
    # budget, pruned at the directory level), deterministic in-file
    # order, bounded shard sizes
    write_training_shards(
        train, f"{out_dir}/train", partition_by="bin",
        order_by=["source", "doc_id"], max_records_per_file=100_000,
    )
    write_training_shards(
        test, f"{out_dir}/test", partition_by="bin",
        order_by=["source", "doc_id"], max_records_per_file=100_000,
    )

    tr = spark.read.parquet(f"{out_dir}/train")
    te = spark.read.parquet(f"{out_dir}/test")
    print(
        f"input={docs.count()} train_docs={tr.count()} test_docs={te.count()} "
        f"train_bins={tr.select('bin').distinct().count()} out={out_dir}"
    )


if __name__ == "__main__":
    main()

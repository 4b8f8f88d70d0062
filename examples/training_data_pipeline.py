"""End-to-end training-data pipeline over the ``documents`` fixture —
the composition a 100 TB pretraining-data run would chain, built
entirely from this engine's operators:

    load -> quality filter -> language filter -> dedup (exact + near)
         -> deterministic train/test split -> sequence packing
         -> partitioned parquet write

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
from bht_etl_app_spark.operators.dedup import dedup_corpus
from bht_etl_app_spark.operators.sampling import pack_sequences, train_test_split
from bht_etl_app_spark.operators.text import language_id, quality_scores
from bht_etl_app_spark.session import load_table


def build_training_set(
    docs,
    min_tokens: int = 20,
    max_stopword_ratio: float = 0.9,
    langs: tuple[str, ...] = ("en", "und"),
    dedup_threshold: float = 0.8,
    pack_budget: int = 2048,
):
    """The full flow as one lazy composition; returns (train, test)
    DataFrames of ``(source, doc_id, n_tokens, start_offset, bin,
    split)``."""
    # 1. quality filter: drop short or degenerate documents
    quality = quality_scores(docs).where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
    )
    docs_q = docs.join(quality.select("doc_id"), "doc_id", "left_semi")

    # 2. language filter (n-gram-marker heuristic)
    lang = language_id(docs_q).where(F.col("lang_pred").isin(*langs))
    docs_l = docs_q.join(lang.select("doc_id"), "doc_id", "left_semi")

    # 3. dedup: exact + MinHash-LSH near-dup, one representative per group
    docs_d = dedup_corpus(docs_l, threshold=dedup_threshold)

    # 4. reproducible split, then pack each split independently
    split = train_test_split(docs_d)
    packed = {
        name: pack_sequences(
            split.where(F.col("split") == name), budget=pack_budget
        )
        for name in ("train", "test")
    }
    return packed["train"], packed["test"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="tdp_")

    spark = get_spark("training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    train, test = build_training_set(docs)
    # partitioned by packing bin: a trainer reads one bin = one batch
    # worth of sequential token budget, pruned at the directory level
    train.write.mode("overwrite").partitionBy("bin").parquet(f"{out_dir}/train")
    test.write.mode("overwrite").partitionBy("bin").parquet(f"{out_dir}/test")

    tr = spark.read.parquet(f"{out_dir}/train")
    te = spark.read.parquet(f"{out_dir}/test")
    print(
        f"input={docs.count()} train_docs={tr.count()} test_docs={te.count()} "
        f"train_bins={tr.select('bin').distinct().count()} out={out_dir}"
    )


if __name__ == "__main__":
    main()

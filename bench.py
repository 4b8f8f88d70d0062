"""Benchmark harness: runs the headline queries at the configured scale
factor and prints ONE JSON line with per-query and total wall times.

Env:
  SPARK_GRAFT_SF_DIR  fixture dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local parallelism (default all cores)

Usage: python bench.py [query ...]   (no args = full headline set)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


HEADLINE = [
    # reference-operator suite
    "freq_returnflag_weighted",
    "multidim_total_pct",
    "crosstab_row_pct",
    "selected_counts_events",
    "tabulation_nation",
    "csat_summary",
    "nps_summary",
    # general analytics / TPC-H shapes
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_nation_revenue",
    "q6_revenue_delta",
    "q12_priority_by_linestatus",
    "q14_promo_revenue",
    "q18_large_volume_orders",
    "rollup_region_nation",
    "top_parts_per_brand",
    "orders_by_year",
    "events_hourly",
    # windows / time-series
    "customer_order_ranks",
    "sessionized_event_stats",
    "purchase_asof_prior_view",
    "salted_user_event_totals",
    # training-data pipeline
    "doc_token_stats",
    "dedup_exact_docs",
    # r12: URL-level exact dedup (canonical-form groupBy — the
    # pre-text crawl gate)
    "url_canonical_dedup",
    "minhash_lsh_pairs",
    "simhash_docs",
    "knn_vec0",
    "tfidf_top_terms",
    "train_test_split_counts",
    "stratified_sample_docs",
    "pack_sequences_bins",
    "winnow_fingerprints",
    "winnow_fingerprints_fast",
    "near_dup_embeddings",
    "simhash_near_dup",
    "ann_knn_join",
    "doc_repetition",
    # r12: char-n-gram NB lang classifier distillation (a new kernel:
    # char-trigram explode + closed-form NB fit + broadcast-model
    # scoring in one pipeline)
    "lang_nb_scores",
    "semantic_dedup_survivors",
    # corpus curation
    "doc_decontaminate",
    # r12 post-close: span-level decontamination (broadcast hit set +
    # the gaps-and-islands remover — a distinct kernel from both the
    # doc-level gate and the substr count path)
    "doc_decontaminate_scrub",
    # r12: embedding-level decontamination (broadcast benchmark probe
    # over one corpus scan — a distinct kernel from the n-gram gate)
    "semantic_decontaminate",
    "doc_chunks",
    "vocab_coverage",
    "domain_mixture",
    "doc_filter_decisions",
    "dedup_incremental_docs",
    "near_dup_incremental_docs",
    "domain_token_sketch",
    "doc_span_dedup",
    "doc_bloom_decontaminate",
    "doc_upsert_snapshot",
    "winnow_overlap_pairs",
    "embedding_quantized",
    "knn_label_votes",
    # analytics (r3)
    "user_cohort_retention",
    "part_copurchase_pairs",
    "funnel_view_click_purchase",
    # r4: composite dedup now oracle-checked; real AVI decode path
    "dedup_corpus_survivors",
    "video_frames_demo",
    # r4 additions
    "bm25_query_scores",
    "doc_script_mix",
    "domain_heavy_hitters",
    "mixture_sample_docs",
    # r12: the realized training list (corpus scan + two-phase
    # per-domain prefix sums + broadcast plan join — a distinct
    # kernel from the |domains|-row plan keys)
    "mixture_plan_realize",
    "lang_token_fertility",
    "source_dedup_rates",
    # r5 additions: xxhash64 production twins of the md5 oracle family,
    # the persisted-band-index probe, and the count-min sketch twin
    "minhash_lsh_pairs_fast",
    "simhash_docs_fast",
    "near_dup_store_probe",
    "domain_heavy_hitters_cms",
    # r5: data selection + cluster labeling + product quantization
    "dsir_doc_weights",
    "dsir_selected",
    "quality_classifier_scores",
    "cluster_top_terms",
    "pq_codes",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "ann_pq_store_topk",
    "corpus_datacard",
    # r5: lossless PPJoin jaccard, distributed BPE, series gap-fill
    "near_dup_jaccard_ppjoin",
    "bpe_token_counts",
    "bpe_encoded_docs",
    "user_hourly_interpolated",
    "dedup_rep_docs",
    "rolling_7d_active_users",
    "token_zipf_fit",
    "token_fuzzy_pairs",
    "events_user_skew",
    "user_type_scd2",
    "events_customer_fk_audit",
    "doc_apply_cdc",
    "ann_recall_report",
    "curated_verdicts",
    "hard_negatives",
    "image_phash_near_dup",
    # r5 session 3: weighted sampling, robust outliers, Markov
    # transitions, rolling anomaly scoring
    "weighted_sample_docs",
    "user_value_outliers",
    "event_transitions",
    "hourly_count_anomalies",
    "customer_spend_trend",
    "orders_benford_audit",
    "customer_rfm_segments",
    "purchase_attribution",
    "token_pmi_pairs",
    "doc_containment_pairs",
    "source_overlap_matrix",
    "user_retention_curve",
    "part_cooccurrence_sim",
    "top_session_paths",
    "orders_price_drift_psi",
    "doc_readability",
    "ab_test_zstats",
    "jsonl_pysource_roundtrip",
    "sql_lateral_top_nations",
    "events_k_anonymity",
    "user_twap",
    "embedding_covariance",
    "label_centroid_sim",
    "embedding_pca_coords",
    "kcenter_selected",
    "copurchase_triangles",
    "daily_revenue_cusum",
    "revenue_dow_seasonality",
    "user_max_drawdown",
    "customer_gini",
    "part_association_rules",
    "conversion_lag_hist",
    "events_l_diversity",
    "copurchase_link_pred",
    "supplier_return_wilson",
    "embedding_dim_outliers",
    "events_chi2_independence",
    "weekend_revenue_welch",
    "copurchase_communities",
    "daily_revenue_decompose",
    "events_view_purchase_xcorr",
    "hybrid_rrf_topk",
    "cohort_ltv_matrix",
    "source_token_jsd",
    "doc_compression_ratio",
    "bm25_eval_metrics",
    "part_abc_classes",
    "nation_supplier_hhi",
    "copurchase_degree_hist",
    "user_event_entropy",
    "user_active_streaks",
    "event_burstiness",
    "nation_pct_of_parent",
    "brand_price_anova",
    "part_brand_type_chi2",
    "mktsegment_monthly_share",
    "daily_revenue_acf",
    "segment_migration_matrix",
    "topk_customer_overlap",
    "nation_acctbal_outliers",
    "part_key_skew",
    "price_benford_audit",
    # data QA
    "profile_orders",
    "orders_constraint_audit",
    # r7: Kneser-Ney trigram LM (CCNet perplexity filter) — self-
    # scoring QA mode, the held-out backoff-cascade deployment shape,
    # and the curation chain with the filter composed in position
    "kn_doc_logprob",
    "kn_heldout_logprob",
    "curated_verdicts_lm",
    # r8: ExactSubstr (Lee et al. ACL'22) gram-cover dedup — the
    # detection kernel and the remover (stats is the same kernel
    # minus reassembly -> cheap_sibling); Moore-Lewis two-model
    # cross-entropy-difference selection
    "exact_substr_spans",
    "exact_substr_scrub",
    "moore_lewis_scores",
    # r8: the curation chain with the ExactSubstr scrub composed in,
    # and the COMPLETE pipeline with every optional stage on
    "curated_verdicts_substr",
    "curated_verdicts_full",
    # r8: IVF-PQ recall harness (batched pq_knn_join vs exact L2)
    "ann_recall_report_ivf_pq",
    # r9: residual-encoding IVF-PQ (FAISS IndexIVFPQ's default) and
    # the unigram-LM (SentencePiece-style) tokenizer train/encode
    "ann_ivf_rpq_topk",
    "unigram_train",
    "unigram_token_counts",
    "unigram_encoded_docs",
    # r9: both IVF-PQ encodings' recall vs the shared exact-L2
    # baseline in one row (the residual gain at identical storage)
    "ann_recall_report_ivf_rpq",
    # r9: two-stage refine — ADC shortlist + exact re-rank (FAISS
    # IndexRefineFlat's production shape), and its recall gain as a
    # measured one-row report
    "ann_pq_rerank_topk",
    "ann_recall_report_pq_rerank",
    # r9: reliability-diagram calibration report for the hashed
    # quality classifier (integer-ppm binning)
    "quality_calibration_bins",
    # r9: BPE-vs-unigram fertility side-by-side (tokenizer selection)
    "tokenizer_fertility_compare",
    # r9: banded-MinHash miss rate vs the lossless PPJoin truth
    "near_dup_recall_report",
    # r9: near-dup-aware train/test split (components decide sides)
    "leakage_safe_split",
    "split_leakage_audit",
    # r9: CCNet head/middle/tail perplexity terciles per domain
    "kn_ppl_buckets",
    # r9: Matryoshka truncation recall (half-dim exact vs full exact)
    "ann_recall_report_truncated_dim",
    # r9: per-doc corpus-unique 5-gram fraction (novelty signal)
    "doc_ngram_novelty",
    # r9: sequence-boundary fragmentation report over the packing
    "packing_bin_stats",
    # r9: the curation chain with the URL/email redaction composed
    # in pre-quality (every later stage consumes redacted text)
    "curated_verdicts_redact",
    # r10: harmonic doc-boundary packing (the fragmentation knob —
    # new kernel shape: per-(source, class) layout window + class
    # offset prefix sum)
    "pack_sequences_harmonic",
    # r10: markup/boilerplate extraction kernel (regex chain + line
    # filter — the web-crawl first stage)
    "doc_extracted_text",
    # r10: per-(source, benchmark) contamination attribution (the
    # broadcast gram join aggregated to hit mass, not a semi-join)
    "contamination_attribution",
]

# HEADLINE inclusion rule (VERDICT r6 item #6 — previously implicit):
# one bench entry per distinct kernel / plan shape. A contract key is
# EXCLUDED only when it falls in one of these four classes, and the
# partition is TOTAL — tests/test_bench_contract.py asserts
# HEADLINE ∪ EXCLUDED == queries() with no overlap, so every new
# contract key must be placed on one side explicitly or the test
# fails:
#  - tpch_variant: 7 representative TPC-H shapes are headline
#    (q1/q3/q5/q6/q12/q14/q18 — scan-agg, join-topk, 5-way join,
#    selective scan, join-casewhen-pivot, broadcast ratio, having);
#    the other 15 re-exercise the same join/agg patterns.
#  - twin: a fast/approx/arrow/parameter twin whose exact counterpart
#    is already in the contract — the twin exists for parity evidence
#    and its wall is the same kernel minus work, so benching both
#    prices one kernel twice.
#  - demo: decode-seam demos over a handful of synthesized binaries
#    (they price the Python codec seam, not the engine; one decode
#    seam — video_frames_demo — stays headline as the family canary).
#  - cheap_sibling: same kernel family as a headline carrier (pct
#    variant, window-frame variant, single-scan per-row expression
#    over the same table) or a trivial single-scan lookup whose sf0.1
#    wall is dominated by job overhead, not plan work.
EXCLUDED = {
    "tpch_variant": [
        "q2_min_cost_supplier", "q4_order_priority", "q7_nation_volume",
        "q8_market_share", "q9_product_type_profit",
        "q10_returned_top_customers", "q11_important_part_values",
        "q13_order_count_distribution", "q15_top_supplier",
        "q16_supplier_counts", "q17_small_quantity_revenue",
        "q19_disjunctive_revenue", "q20_dominant_part_suppliers",
        "q21_sole_late_supplier", "q22_above_avg_suppliers",
    ],
    "twin": [
        "ann_recall_frontier",
        # r12: the OPQ addendum — same priced kernels as the parent
        # frontier plus the rotation projection, at 2x the model
        # training (both spaces)
        "ann_recall_frontier_opq",
        # r12: same broadcast probe as semantic_decontaminate minus
        # the per-doc legs, aggregated to |benchmarks| rows
        "semantic_contamination_attribution",
        # r12: wraps the lang_nb_scores chain whole and adds one
        # |langs|²-row aggregate on top
        "lang_id_confusion",
        # r12: composition twin of the headline curated chain (the
        # URL pre-stage adds per-row regexes + one small groupBy)
        "curated_verdicts_url",
        # r12: composition twin — the semantic stage adds the
        # survivor-bounded broadcast probe to the headline chain
        "curated_verdicts_semantic",
        # r12 placement decision (VERDICT r11 #4): the full audit
        # stays headline as the kernel carrier; the md5-slice twin
        # exists for the 100 TB deployment shape and its wall is the
        # same kernel at half the data
        "split_leakage_audit_sampled",
        "curated_verdicts_extract",
        "curated_verdicts_redact_pii",
        "near_dup_banding_frontier",
        "near_dup_recall_sampled",
        "exact_substr_spans_fast", "exact_substr_scrub_fast",
        "simhash_near_dup_fast", "simhash_near_dup_retuned",
        "simhash_near_dup_wide", "knn_vec0_arrow", "knn_vec0_quantized",
        "domain_quantile_keep_approx", "order_price_percentiles_approx",
        "profile_orders_approx", "approx_distinct_parts",
    ],
    "demo": ["image_features_demo", "audio_features_demo"],
    "cheap_sibling": [
        "active_order_customers", "ann_ivf_topk", "ann_lsh_topk",
        "bpe_merges", "brand_dictionary", "codebook_recode_counts",
        "corpus_snapshot_diff", "crosstab_col_pct", "crosstab_total_pct",
        "cube_order_stats", "customer_order_gaps",
        "customer_trailing_30d_spend", "customers_without_orders",
        "distinct_parts_per_supplier", "doc_bigram_surprise",
        "doc_char_entropy", "doc_fingerprint", "doc_lang_id",
        "doc_pagerank", "doc_quality_scores", "doc_scrubbed",
        "domain_blocklist_filter",
        "doc_scrubbed_pii",
        "domain_quantile_keep", "embedding_norms", "exact_substr_stats",
        "error_recent_click_counts", "ewma_user_values",
        "freq_orderpriority", "grouping_sets_order_stats",
        "high_value_customers", "kmeans_cluster_sizes",
        "latest_event_per_user", "monthly_order_stats",
        "mixture_alpha_frontier",
        "mixture_epoch_plan",
        "mixture_epoch_plan_realloc",
        "moving_avg_revenue", "multidim_level_pct", "near_dup_clusters",
        "near_dup_jaccard", "order_price_deciles", "packing_compare_stats",
        "packing_compare_stats_256",
        "order_price_percentiles", "orders_unpivot_metrics",
        "pack_sequences_harmonic_chunks",
        "price_histogram", "props_key_counts", "purchase_and_click_users",
        "purchase_asof_click", "qty_price_correlation", "quantity_moments",
        "running_monthly_revenue", "session_window_stats",
        "sql_orders_by_status", "statuses_per_priority",
        "token_frequencies", "training_order_docs",
        "value_counts_orderstatus", "view_not_purchase_user_days",
    ],
}


# the one place the metric labels are spelled — pick_metric and
# summary_line both key off these, so renaming can't desynchronize
# the full-run detection from the label
FULL_METRIC = "headline_queries_total_wall"
SUBSET_METRIC = "subset_queries_total_wall"


def pick_metric(is_full_run: bool) -> str:
    """Subset/debug invocations must never label partial totals as
    the headline metric — the driver parses the last JSON line it
    captures."""
    return FULL_METRIC if is_full_run else SUBSET_METRIC


def summary_line(times: dict[str, float], sf: float | None,
                 max_chars: int = 1900,
                 metric: str = FULL_METRIC) -> str:
    """The ONE stdout JSON line: total + slowest-N queries, with N
    shrunk until the line fits the driver's ~2000-char stdout capture
    (full per-query detail lives in BENCH_DETAILS.json). Raises when
    even the query-free line exceeds the budget — a silent oversize
    would scroll the JSON out of the capture window."""
    total = round(sum(times.values()), 3)
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    # BENCH_DETAILS.json is rewritten only on full headline runs, so a
    # subset/debug line must not point at it — the file on disk would
    # be a stale artifact from an earlier run with a different query
    # set (ADVICE r6)
    is_full = metric == FULL_METRIC
    for top in range(20, -1, -1):
        line = json.dumps({
            "metric": metric,
            "value": total,
            "unit": "sec",
            "n_queries": len(times),
            "queries": dict(ranked[:top]),
            "queries_file": "BENCH_DETAILS.json" if is_full else None,
            "sf": sf,
        })
        if len(line) < max_chars:
            return line
    raise ValueError(f"summary line exceeds {max_chars} chars even with no queries")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as mod
    from bht_etl_app_spark import get_spark

    spark = get_spark("bht-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = mod.queries()
    is_full_run = not sys.argv[1:]
    names = sys.argv[1:] or [n for n in HEADLINE if n in qs]

    # JVM/codegen + parquet-reader warmup on trivial jobs so the first
    # query isn't charged for session startup: a codegen'd aggregate,
    # a 5-row parquet scan (region), and a LIMITed scan+groupBy of the
    # fact table (touches the parquet footer + a few row groups, warms
    # the vectorized reader and hash-agg codegen paths; the LIMIT keeps
    # it O(1) in table size so this stays warmup, not precomputation)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .limit(1000)
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )

    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        rows = qs[name](spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 3)
        _ = len(rows)
        # drop per-query persisted intermediates (banded signatures,
        # gram counts) so cached blocks don't accumulate across the
        # run; sweep checkpoint blocks too (clearCache doesn't cover
        # them, and their lifecycle is explicit-release by design)
        spark.catalog.clearCache()
        from bht_etl_app_spark.functions.lifecycle import sweep_checkpoints

        sweep_checkpoints(spark.sparkContext)

    total = round(sum(times.values()), 3)
    # The driver captures only the final ~2000 chars of stdout and
    # parses a JSON line out of them; at 150+ headline queries the
    # full per-query dict outgrew that window (BENCH_r05 recorded
    # parsed: null). So: full detail goes to BENCH_DETAILS.json in
    # the repo root (committed — the judge reads per-query times
    # there), and stdout carries ONE compact line — total + the
    # slowest 20 queries — sized to always fit the capture window.
    detail = {
        "metric": FULL_METRIC,
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    if is_full_run:
        # full headline run only: a subset/debug invocation must not
        # overwrite the committed artifact with partial data labeled
        # as the headline metric
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_DETAILS.json"), "w") as f:
            json.dump(detail, f, indent=1)
    print(summary_line(times, sf, metric=pick_metric(is_full_run)))


if __name__ == "__main__":
    main()

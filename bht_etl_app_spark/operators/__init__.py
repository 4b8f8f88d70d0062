from bht_etl_app_spark.operators.aggregates import (
    safe_value_counts,
    freq_table,
    multi_dim_tabulation,
    selected_counts,
    satisfaction_table,
    nps_table,
    full_tabulation,
    brand_dictionary,
)
from bht_etl_app_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)
from bht_etl_app_spark.operators.corpus import (
    chunk_documents,
    decontaminate,
    domain_mixture_weights,
    domain_quantile_filter,
    quality_filter_decisions,
    vocab_coverage,
)
from bht_etl_app_spark.operators.crosstab import crosstab_table
from bht_etl_app_spark.operators.dedup import (
    dedup_clusters,
    dedup_exact,
    dedup_incremental,
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from bht_etl_app_spark.operators.similarity import (
    ann_lsh_topk,
    knn_for_query,
    knn_join,
    random_hyperplane_lsh,
)
from bht_etl_app_spark.operators.text import (
    fingerprint,
    tfidf_top_terms,
    language_id,
    quality_scores,
    repetition_signals,
    scrub_text,
    token_stats,
)
from bht_etl_app_spark.operators.multimodal import (
    image_features,
    synth_media_from_documents,
)
from bht_etl_app_spark.operators.timeseries import (
    asof_join,
    session_stats,
    sessionize,
)

__all__ = [
    "safe_value_counts",
    "freq_table",
    "multi_dim_tabulation",
    "selected_counts",
    "satisfaction_table",
    "nps_table",
    "full_tabulation",
    "brand_dictionary",
    "chunk_documents",
    "decontaminate",
    "domain_mixture_weights",
    "domain_quantile_filter",
    "quality_filter_decisions",
    "vocab_coverage",
    "dedup_incremental",
    "crosstab_table",
    "kmeans_assign",
    "kmeans_fit",
    "semantic_dedup",
    "dedup_clusters",
    "dedup_exact",
    "embedding_near_dup_pairs",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash64",
    "ann_lsh_topk",
    "knn_for_query",
    "knn_join",
    "random_hyperplane_lsh",
    "fingerprint",
    "tfidf_top_terms",
    "language_id",
    "quality_scores",
    "repetition_signals",
    "scrub_text",
    "token_stats",
    "image_features",
    "synth_media_from_documents",
    "asof_join",
    "session_stats",
    "sessionize",
]

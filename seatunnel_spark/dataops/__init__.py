"""Large-scale training-data pipeline operators.

These go beyond the reference's surface (which has no joins/aggregates
at all — SURVEY.md §2.7): deduplication, similarity search, text
analysis, multimodal columns. Every operator here is shuffle-aware and
designed for the 100 TB regime: blocking keys before pairwise work,
band-bucket joins instead of cross joins, no driver-side collects.
"""

from seatunnel_spark.dataops._cache import cache_scope, scoped_persist
from seatunnel_spark.dataops.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash64,
    simhash_near_dups,
    ngram_jaccard_pairs,
    embedding_near_dups,
    duplicate_clusters,
)
from seatunnel_spark.dataops.similarity import (
    with_cosine,
    brute_force_topk,
    lsh_bucketed_topk,
    ivf_topk,
    train_ivf_centroids,
    write_ivf_index,
    append_ivf_index,
    search_ivf_index,
    topk_recall,
    hard_negatives,
    hard_negatives_ivf,
)
from seatunnel_spark.dataops.sketches import (
    ddsketch_build,
    ddsketch_merge,
    ddsketch_quantiles,
)
from seatunnel_spark.dataops.skew import salted_join
from seatunnel_spark.dataops.text import (
    token_count,
    quality_signals,
    lang_id,
    fingerprint,
    html_clean,
    doc_chunks,
)
from seatunnel_spark.dataops.retrieval import bm25_topk
from seatunnel_spark.dataops.graph import pagerank
from seatunnel_spark.dataops.dedup import (
    incremental_minhash_matches,
    minhash_band_index,
    passage_dup_stats,
    passage_dedup_apply,
    substring_dup_spans,
    substring_dedup_apply,
    best_of_cluster,
    jaccard_dup_clusters,
)
from seatunnel_spark.dataops.sampling import (
    dsir_logweights,
    global_shuffle,
    group_sample_topk,
    temperature_sample,
    weighted_sample_topk,
)
from seatunnel_spark.dataops.text import (
    cms_build,
    collocations,
    cms_estimate,
    domain_kl_drift,
    heavy_hitters,
)
from seatunnel_spark.dataops.analytics import (
    association_rules,
    clustering_coefficient,
    copurchase_pairs,
    group_mad,
    equiwidth_histogram,
    event_pattern_match,
    rolling_distinct,
    triangle_count,
    zscore_outliers,
)
from seatunnel_spark.dataops.dedup import fuzzy_dup_pairs
from seatunnel_spark.dataops.profile import dq_checks
from seatunnel_spark.dataops.embeddings import (
    quantize_int8,
    dequant_error,
    emb_covariance,
    kmeans_fit,
    kmeans_assign,
    pca_fit,
    pca_project,
)

__all__ = [
    "cache_scope", "scoped_persist",
    "exact_dedup", "exact_dup_groups", "minhash_signatures", "minhash_lsh_pairs",
    "simhash64", "simhash_near_dups", "ngram_jaccard_pairs",
    "embedding_near_dups", "duplicate_clusters",
    "with_cosine", "brute_force_topk", "lsh_bucketed_topk",
    "ivf_topk", "train_ivf_centroids", "topk_recall", "salted_join",
    "write_ivf_index", "append_ivf_index", "search_ivf_index",
    "token_count", "quality_signals", "lang_id", "fingerprint",
    "html_clean", "passage_dup_stats", "global_shuffle",
    "minhash_band_index", "incremental_minhash_matches",
    "doc_chunks", "bm25_topk", "pagerank",
    "passage_dedup_apply", "temperature_sample", "dsir_logweights",
    "substring_dup_spans", "substring_dedup_apply",
    "best_of_cluster", "hard_negatives", "hard_negatives_ivf",
    "jaccard_dup_clusters",
    "ddsketch_build", "ddsketch_merge", "ddsketch_quantiles",
    "quantize_int8", "dequant_error", "kmeans_fit", "kmeans_assign",
    "group_sample_topk", "cms_build", "cms_estimate", "heavy_hitters",
    "domain_kl_drift", "equiwidth_histogram", "zscore_outliers",
    "fuzzy_dup_pairs", "weighted_sample_topk", "event_pattern_match",
    "copurchase_pairs", "triangle_count", "rolling_distinct",
    "emb_covariance", "pca_fit", "pca_project", "dq_checks",
    "collocations", "group_mad", "association_rules",
    "clustering_coefficient",
]

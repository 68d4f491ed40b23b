"""Registry: the queries()/oracle_sql() driver contract — split from the single-file catalogue (round 5, pure
mechanical move; see sievedata/queries/__init__.py for the contract)."""
from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from sievedata.kernels.normalize import desc_norm_array, invnum_norm_array
from sievedata.queries._shared import (_LUT_CACHE, _drop_empty_blocks,
                                       _join_parts, _rp)
from sievedata.queries.relational import SQL_CUSTOMER_BASELINE, SQL_RETURNFLAG_AGG, q_customer_baseline, q_returnflag_agg
from sievedata.queries.joins import SQL_ANTI_JOIN, SQL_JOIN_NATIVE, SQL_REGION_CUSTOMERS, SQL_SEGMENT_REVENUE, q_anti_join, q_join_native, q_region_customers, q_segment_revenue
from sievedata.queries.topk import SQL_DISTINCT_PARTS, SQL_TOPK_ORDERS, SQL_TOP_ORDER_PER_CUSTOMER, q_distinct_parts, q_top_order_per_customer, q_topk_orders
from sievedata.queries.dupflag import SQL_DUP_ORDERS, SQL_EXACT_DEDUP_DOCS, q_dup_orders, q_exact_dedup_docs
from sievedata.queries.outliers import SQL_PRICE_OUTLIERS, q_price_outliers
from sievedata.queries.normalize import SQL_DESC_NORM, SQL_INVNUM_NORM, SQL_MASK_HASH, q_desc_norm, q_invnum_norm, q_mask_hash
from sievedata.queries.textstats import SQL_BPE_TOKEN_COUNT, SQL_QUALITY_FILTER, SQL_TOKEN_STATS, q_bpe_token_count, q_quality_filter, q_token_stats
from sievedata.queries.events import SQL_EVENTS_HOURLY, SQL_EVENTS_SESSIONS, SQL_WINDOW_DRIFT, q_events_hourly, q_events_sessions, q_window_drift
from sievedata.queries.embeddings import SQL_ANN_TOPK, q_ann_topk
from sievedata.queries.similarity import SQL_ANN_IVF_TOPK, SQL_ANN_LSH_TOPK, SQL_ASOF_JOIN, SQL_DEDUP_SURVIVORS, SQL_EMBEDDING_NEAR_DUPS, SQL_EMBEDDING_NORMS, SQL_KNN_CLASSIFY, SQL_LANG_ID, SQL_LINE_SUM_CHECK, SQL_MEDIAN_PRICE, SQL_MINHASH_NEAR_DUPS, SQL_NGRAM_JACCARD_PAIRS, SQL_RANGE_JOIN, SQL_ROW_FINGERPRINT, SQL_RUNNING_TOTAL, SQL_SLIDING_WINDOW, SQL_SYSTEMATIC_SAMPLE, SQL_TEXT_BLOB, q_ann_ivf_topk, q_ann_lsh_topk, q_asof_join, q_dedup_survivors, q_embedding_near_dups, q_embedding_norms, q_fingerprint, q_frame_sample, q_knn_classify, q_lang_id, q_line_sum_check, q_media_audio, q_media_features, q_media_resize, q_median_price, q_minhash_near_dups, q_ngram_jaccard_pairs, q_profile_incremental, q_range_join, q_row_fingerprint, q_running_total, q_score_flagship, q_score_incremental, q_simhash, q_simhash_near_dups, q_sliding_window, q_systematic_sample, q_text_blob, q_validate_flagship, q_validate_incremental
from sievedata.queries.analytics import SQL_APPROX_QUANTILES, SQL_CHUNK_DEDUP, SQL_CUBE_ORDERS, SQL_DECONTAMINATE, SQL_DEDUP_COMPONENTS, SQL_DEDUP_CORPUS, SQL_DENSE_RANK, SQL_EXCEPT_USERS, SQL_FULL_OUTER_JOIN, SQL_GLOBAL_RANK, SQL_HEAVY_HITTERS, SQL_INTERSECT_USERS, SQL_LEFT_JOIN_COUNTS, SQL_MODE_EVENT_TYPE, SQL_MULTI_DISTINCT, SQL_ORDER_GAP_DAYS, SQL_PII_SCAN, SQL_PIVOT_STATUS, SQL_POSTING_LISTS, SQL_PRIORITY_TOPK, SQL_QUALITY_BUCKETS, SQL_REPETITION_FILTER, SQL_ROLLUP_ORDERS, SQL_SEMI_JOIN, SQL_SHIPPING_PRIORITY, SQL_STRATIFIED_SAMPLE, SQL_STRING_AGG_STATUSES, SQL_SUPPLIER_QUANTILES, SQL_TERM_DOC_FREQ, SQL_TFIDF_TOP_TERMS, SQL_TOKEN_RARITY, SQL_TOKEN_SHARDS, SQL_UNION_IDS, SQL_VALUE_HISTOGRAM, SQL_WINNOW_FINGERPRINTS, SQL_WORD_COUNT, q_approx_quantiles, q_chunk_dedup, q_cube_orders, q_decontaminate, q_dedup_components, q_dedup_corpus, q_dense_rank, q_except_users, q_full_outer_join, q_global_rank, q_heavy_hitters, q_image_phash_dups, q_intersect_users, q_kmeans_clusters, q_left_join_counts, q_mode_event_type, q_multi_distinct, q_order_gap_days, q_pii_scan, q_pivot_status, q_posting_lists, q_priority_topk, q_quality_buckets, q_repetition_filter, q_rollup_orders, q_semi_join, q_shipping_priority, q_stratified_sample, q_string_agg_statuses, q_supplier_quantiles, q_term_doc_freq, q_tfidf_top_terms, q_token_rarity, q_token_shards, q_union_ids, q_value_histogram, q_winnow_fingerprints, q_word_count
from sievedata.queries.corpus import SQL_DOMAIN_MIXTURE, SQL_LABEL_CENTROIDS, SQL_NGRAM_DIVERSITY, SQL_WEIGHTED_SAMPLE, q_domain_mixture, q_label_centroids, q_ngram_diversity, q_weighted_sample
from sievedata.queries.curation import SQL_ABOVE_AVG_ORDERS, SQL_BPE_MERGE_CANDIDATES, SQL_CHAR_CONCENTRATION, SQL_DEGREE_HISTOGRAM, SQL_DOMAIN_CAPS, SQL_DUP_RATIO_BY_SOURCE, SQL_EMBEDDING_QUANTIZE, SQL_EVENT_FUNNEL, SQL_HASH_SPLIT, SQL_JSON_PROPS_SUM, SQL_LENGTH_FILTER, SQL_NULL_PROFILE, SQL_ORDERS_PER_WEEKDAY, SQL_PACK_WINDOWS, SQL_RETENTION_COHORTS, SQL_TOKENIZER_COVERAGE, q_above_avg_orders, q_bpe_merge_candidates, q_char_concentration, q_degree_histogram, q_domain_caps, q_dup_ratio_by_source, q_embedding_quantize, q_event_funnel, q_hash_split, q_json_props_sum, q_length_filter, q_null_profile, q_orders_per_weekday, q_pack_windows, q_retention_cohorts, q_tokenizer_coverage

# Registry
# --------------------------------------------------------------------------

_ORACLE = {
    "returnflag_agg": SQL_RETURNFLAG_AGG,
    "customer_baseline": SQL_CUSTOMER_BASELINE,
    "segment_revenue": SQL_SEGMENT_REVENUE,
    "region_customers": SQL_REGION_CUSTOMERS,
    "anti_join": SQL_ANTI_JOIN,
    "join_native": SQL_JOIN_NATIVE,
    "topk_orders": SQL_TOPK_ORDERS,
    "top_order_per_customer": SQL_TOP_ORDER_PER_CUSTOMER,
    "distinct_parts": SQL_DISTINCT_PARTS,
    "dup_orders": SQL_DUP_ORDERS,
    "exact_dedup_docs": SQL_EXACT_DEDUP_DOCS,
    "price_outliers": SQL_PRICE_OUTLIERS,
    "invnum_norm": SQL_INVNUM_NORM,
    "desc_norm": SQL_DESC_NORM,
    "mask_hash": SQL_MASK_HASH,
    "token_stats": SQL_TOKEN_STATS,
    "quality_filter": SQL_QUALITY_FILTER,
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_sessions": SQL_EVENTS_SESSIONS,
    "window_drift": SQL_WINDOW_DRIFT,
    "ann_topk": SQL_ANN_TOPK,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
    "embedding_norms": SQL_EMBEDDING_NORMS,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
    "line_sum_check": SQL_LINE_SUM_CHECK,
    "knn_classify": SQL_KNN_CLASSIFY,
    "systematic_sample": SQL_SYSTEMATIC_SAMPLE,
    "text_blob": SQL_TEXT_BLOB,
    "row_fingerprint": SQL_ROW_FINGERPRINT,
    "dedup_survivors": SQL_DEDUP_SURVIVORS,
    "median_price": SQL_MEDIAN_PRICE,
    "running_total": SQL_RUNNING_TOTAL,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "sliding_window": SQL_SLIDING_WINDOW,
    "asof_join": SQL_ASOF_JOIN,
    "range_join": SQL_RANGE_JOIN,
    "bpe_token_count": SQL_BPE_TOKEN_COUNT,
    "word_count": SQL_WORD_COUNT,
    "heavy_hitters": SQL_HEAVY_HITTERS,
    "semi_join": SQL_SEMI_JOIN,
    "pivot_status": SQL_PIVOT_STATUS,
    "rollup_orders": SQL_ROLLUP_ORDERS,
    "value_histogram": SQL_VALUE_HISTOGRAM,
    "supplier_quantiles": SQL_SUPPLIER_QUANTILES,
    "dedup_components": SQL_DEDUP_COMPONENTS,
    "left_join_counts": SQL_LEFT_JOIN_COUNTS,
    "priority_topk": SQL_PRIORITY_TOPK,
    "order_gap_days": SQL_ORDER_GAP_DAYS,
    "cube_orders": SQL_CUBE_ORDERS,
    "full_outer_join": SQL_FULL_OUTER_JOIN,
    "string_agg_statuses": SQL_STRING_AGG_STATUSES,
    "intersect_users": SQL_INTERSECT_USERS,
    "mode_event_type": SQL_MODE_EVENT_TYPE,
    "global_rank": SQL_GLOBAL_RANK,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "except_users": SQL_EXCEPT_USERS,
    "dense_rank": SQL_DENSE_RANK,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "token_shards": SQL_TOKEN_SHARDS,
    "term_doc_freq": SQL_TERM_DOC_FREQ,
    "repetition_filter": SQL_REPETITION_FILTER,
    "union_ids": SQL_UNION_IDS,
    "approx_quantiles": SQL_APPROX_QUANTILES,
    "decontaminate": SQL_DECONTAMINATE,
    "dedup_corpus": SQL_DEDUP_CORPUS,
    "pii_scan": SQL_PII_SCAN,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "multi_distinct": SQL_MULTI_DISTINCT,
    "chunk_dedup": SQL_CHUNK_DEDUP,
    "token_rarity": SQL_TOKEN_RARITY,
    "winnow_fingerprints": SQL_WINNOW_FINGERPRINTS,
    "posting_lists": SQL_POSTING_LISTS,
    "quality_buckets": SQL_QUALITY_BUCKETS,
    "domain_mixture": SQL_DOMAIN_MIXTURE,
    "label_centroids": SQL_LABEL_CENTROIDS,
    "ngram_diversity": SQL_NGRAM_DIVERSITY,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "domain_caps": SQL_DOMAIN_CAPS,
    "hash_split": SQL_HASH_SPLIT,
    "pack_windows": SQL_PACK_WINDOWS,
    "length_filter": SQL_LENGTH_FILTER,
    "embedding_quantize": SQL_EMBEDDING_QUANTIZE,
    "bpe_merge_candidates": SQL_BPE_MERGE_CANDIDATES,
    "dup_ratio_by_source": SQL_DUP_RATIO_BY_SOURCE,
    "event_funnel": SQL_EVENT_FUNNEL,
    "json_props_sum": SQL_JSON_PROPS_SUM,
    "retention_cohorts": SQL_RETENTION_COHORTS,
    "degree_histogram": SQL_DEGREE_HISTOGRAM,
    "tokenizer_coverage": SQL_TOKENIZER_COVERAGE,
    "above_avg_orders": SQL_ABOVE_AVG_ORDERS,
    "orders_per_weekday": SQL_ORDERS_PER_WEEKDAY,
    "char_concentration": SQL_CHAR_CONCENTRATION,
    "null_profile": SQL_NULL_PROFILE,
    # round-5 conversions from rows-only to oracle-bearing
    "lang_id": SQL_LANG_ID,
    "minhash_near_dups": SQL_MINHASH_NEAR_DUPS,
}

_QUERIES = {
    "returnflag_agg": q_returnflag_agg,
    "customer_baseline": q_customer_baseline,
    "segment_revenue": q_segment_revenue,
    "region_customers": q_region_customers,
    "anti_join": q_anti_join,
    "join_native": q_join_native,
    "topk_orders": q_topk_orders,
    "top_order_per_customer": q_top_order_per_customer,
    "distinct_parts": q_distinct_parts,
    "dup_orders": q_dup_orders,
    "exact_dedup_docs": q_exact_dedup_docs,
    "price_outliers": q_price_outliers,
    "invnum_norm": q_invnum_norm,
    "desc_norm": q_desc_norm,
    "mask_hash": q_mask_hash,
    "token_stats": q_token_stats,
    "quality_filter": q_quality_filter,
    "events_hourly": q_events_hourly,
    "events_sessions": q_events_sessions,
    "window_drift": q_window_drift,
    "ann_topk": q_ann_topk,
    "embedding_norms": q_embedding_norms,
    "embedding_near_dups": q_embedding_near_dups,
    "line_sum_check": q_line_sum_check,
    "knn_classify": q_knn_classify,
    "systematic_sample": q_systematic_sample,
    "text_blob": q_text_blob,
    "row_fingerprint": q_row_fingerprint,
    "dedup_survivors": q_dedup_survivors,
    "median_price": q_median_price,
    "running_total": q_running_total,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "sliding_window": q_sliding_window,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "bpe_token_count": q_bpe_token_count,
    "word_count": q_word_count,
    "heavy_hitters": q_heavy_hitters,
    "semi_join": q_semi_join,
    "pivot_status": q_pivot_status,
    "rollup_orders": q_rollup_orders,
    "value_histogram": q_value_histogram,
    "supplier_quantiles": q_supplier_quantiles,
    "dedup_components": q_dedup_components,
    "left_join_counts": q_left_join_counts,
    "priority_topk": q_priority_topk,
    "order_gap_days": q_order_gap_days,
    "cube_orders": q_cube_orders,
    "full_outer_join": q_full_outer_join,
    "string_agg_statuses": q_string_agg_statuses,
    "intersect_users": q_intersect_users,
    "mode_event_type": q_mode_event_type,
    "global_rank": q_global_rank,
    "shipping_priority": q_shipping_priority,
    "except_users": q_except_users,
    "dense_rank": q_dense_rank,
    "stratified_sample": q_stratified_sample,
    "token_shards": q_token_shards,
    "term_doc_freq": q_term_doc_freq,
    "repetition_filter": q_repetition_filter,
    "union_ids": q_union_ids,
    "approx_quantiles": q_approx_quantiles,
    "decontaminate": q_decontaminate,
    "dedup_corpus": q_dedup_corpus,
    "pii_scan": q_pii_scan,
    "tfidf_top_terms": q_tfidf_top_terms,
    "multi_distinct": q_multi_distinct,
    "chunk_dedup": q_chunk_dedup,
    "token_rarity": q_token_rarity,
    "winnow_fingerprints": q_winnow_fingerprints,
    "posting_lists": q_posting_lists,
    "quality_buckets": q_quality_buckets,
    "domain_mixture": q_domain_mixture,
    "label_centroids": q_label_centroids,
    "ngram_diversity": q_ngram_diversity,
    "weighted_sample": q_weighted_sample,
    "domain_caps": q_domain_caps,
    "hash_split": q_hash_split,
    "pack_windows": q_pack_windows,
    "length_filter": q_length_filter,
    "embedding_quantize": q_embedding_quantize,
    "bpe_merge_candidates": q_bpe_merge_candidates,
    "dup_ratio_by_source": q_dup_ratio_by_source,
    "event_funnel": q_event_funnel,
    "json_props_sum": q_json_props_sum,
    "retention_cohorts": q_retention_cohorts,
    "degree_histogram": q_degree_histogram,
    "tokenizer_coverage": q_tokenizer_coverage,
    "above_avg_orders": q_above_avg_orders,
    "orders_per_weekday": q_orders_per_weekday,
    "char_concentration": q_char_concentration,
    "null_profile": q_null_profile,
    # rows-only (no SQL equivalent)
    "kmeans_clusters": q_kmeans_clusters,
    "image_phash_dups": q_image_phash_dups,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "simhash": q_simhash,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_near_dups": q_simhash_near_dups,
    "media_features": q_media_features,
    "media_audio": q_media_audio,
    "media_resize": q_media_resize,
    "frame_sample": q_frame_sample,
    "validate_flagship": q_validate_flagship,
    "score_flagship": q_score_flagship,
    "validate_incremental": q_validate_incremental,
    "score_incremental": q_score_incremental,
    "profile_incremental": q_profile_incremental,
}


# The external correctness driver samples the FIRST 50 entries of queries()
# insertion order.  Rounds 1-4 always led with the round-1 relational set, so
# the 44 oracle-bearing operators added in rounds 3-4 never got a driver row
# (VERDICT.md round 4, "Next round #1").  Lead with those 44, then 6
# long-green round-1 sentinels to fill the 50-slot window; everything else
# (already captured in CORRECTNESS_r01..r04) follows in original order.
_DRIVER_PRIORITY = [
    # never-driver-checked, oracle-bearing (rounds 2-4)
    "full_outer_join",
    "string_agg_statuses",
    "intersect_users",
    "mode_event_type",
    "global_rank",
    "shipping_priority",
    "except_users",
    "dense_rank",
    "stratified_sample",
    "token_shards",
    "term_doc_freq",
    "repetition_filter",
    "union_ids",
    "approx_quantiles",
    "decontaminate",
    "dedup_corpus",
    "pii_scan",
    "tfidf_top_terms",
    "multi_distinct",
    "chunk_dedup",
    "token_rarity",
    "winnow_fingerprints",
    "posting_lists",
    "quality_buckets",
    "domain_mixture",
    "label_centroids",
    "ngram_diversity",
    "weighted_sample",
    "domain_caps",
    "hash_split",
    "pack_windows",
    "length_filter",
    "embedding_quantize",
    "bpe_merge_candidates",
    "dup_ratio_by_source",
    "event_funnel",
    "json_props_sum",
    "retention_cohorts",
    "degree_histogram",
    "tokenizer_coverage",
    "above_avg_orders",
    "orders_per_weekday",
    "char_concentration",
    "null_profile",
    # round-5 oracle conversions (first driver capture this round)
    "lang_id",
    "minhash_near_dups",
    # long-green sentinels (driver-checked every prior round)
    "returnflag_agg",
    "customer_baseline",
    "anti_join",
    "topk_orders",
]


def _reorder(d):
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries():
    return _reorder(_QUERIES)


def oracle_sql():
    return _reorder(_ORACLE)

"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a
(name, spark_fn, oracle_sql) triple. ``__spark_entry__.queries()`` and
``oracle_sql()`` are thin views over this registry, and the local parity
test (tests/test_oracle_parity.py) replays the driver's check — Spark vs
DuckDB, row-count + schema + order-insensitive values — at sf0.001.

Conventions (required for the driver's value-hash to match):
- Alias every computed column identically in Spark and SQL.
- Round non-integer-valued doubles to a fixed scale on BOTH sides
  (accumulation order differs between engines). Float outputs must be
  BIT-identical across engines (tests compare hex, not rounded values);
  if a rounded value can be negative-near-zero, add `+ 0.0` on both
  sides — DuckDB's ROUND emits -0.0 where Spark's emits +0.0, equal by
  == but different bits under a bit-sensitive driver hash.
- Any query with LIMIT must order by a tie-broken (unique) key set.
- oracle=None → driver does a weaker rows-only check (used for ML /
  streaming ops that ANSI SQL can't express).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver verifies a fixed window of 50 queries per round, in the order
# queries() yields them (every completed round truncated at exactly 50).
DRIVER_WINDOW = 50

# R7_WINDOW — historical record of round 7's driver window: the last 50
# never-driver-checked names, burned oldest-addition-first and verified
# 50/50 hash-green in CORRECTNESS_r07. Kept as data because the r8 pin
# rule excludes these freshest-row names
# (tests/test_plans.py::test_r8_window_pin recomputes the rule).
R7_WINDOW: tuple[str, ...] = (
    "histogram_quantile_sketch",
    "weighted_reservoir_sample",
    "target_encoding_oof",
    "record_linkage_blocked",
    "event_transition_probs",
    "ab_test_zscore",
    "chi_square_independence",
    "source_lang_kl_divergence",
    "compaction_bin_packing",
    "source_shingle_containment",
    "event_spike_detection",
    "frequent_event_paths",
    "variant_json_extract",
    "rec_diversity_metrics",
    "streaming_stream_stream_left_join",
    "ppr_seeded_items",
    "decayed_popularity_topk",
    "phrase_retrieval_topdocs",
    "embedding_label_drift",
    "ks_test_source_drift",
    "bootstrap_mean_ci",
    "streaming_dedup_within_watermark",
    "linear_regression_closed_form",
    "preagg_join_rollup",
    "dynamic_partition_pruning_join",
    "parquet_agg_pushdown_stats",
    "null_semantics_suite",
    "collation_case_insensitive_group",
    "sql_udf_revenue",
    "lateral_join_top_orders",
    "observed_metrics_audit",
    "file_metadata_columns",
    "ansi_try_functions_suite",
    "scd2_point_in_time_join",
    "join_size_estimation_audit",
    "asof_join_next_order",
    "schema_evolution_merge_read",
    "csv_corrupt_record_audit",
    "zipf_law_fit",
    "mutual_information_type_hour",
    "benford_law_audit",
    "theil_sen_slope_robust",
    "data_expectations_audit",
    "column_entropy_profile",
    "prefix_filter_jaccard_join",
    "cms_user_frequency",
    "item_adamic_adar_topk",
    "item_knn_graph",
    "kmv_intersection_estimate",
    "class_tfidf_top_terms",
)

# The EXACT round-8 window, pinned in round 7 (VERDICT r6 #5) so the r8
# rotation is mechanical: set DRIVER_CHECK_FIRST = R8_WINDOW (dropping
# the R8 names from DRIVER_CHECK_LAST) at the start of round 8. Rule,
# recomputed and asserted by tests/test_plans.py::test_r8_window_pin:
# (a) every query whose implementation or oracle changed in round 7
# (R8_PRIORITY_RECHECK head: the re-anchored band joins, the
# Spark-plan-rounded streaming interest pair, the 11 rows-only->band
# conversions, the 3 band-verdict HLL conversions, the 2 data-derived
# LSH oracles), then (b) the 3 r6 band oracles no driver has executed,
# then (c) oldest-green-first (last driver round ascending, NAME as the
# tie-break — registry insertion order varies with module import order,
# so it cannot anchor a pinned list — r7-window names excluded since
# their rows are freshest) up to the 50-slot window.
R8_PRIORITY_RECHECK: tuple[str, ...] = (
    "range_join_events_orders",
    "interval_overlap_join",
    "streaming_interest_fold",
    "streaming_recommend_emit",
    "als_recommend_topk",
    "als_precision_recall_at_k",
    "kmeans_embedding_clusters",
    "als_rmse",
    "pipeline_classifier_eval",
    "embedding_pca_top_component",
    "als_cross_validation",
    "als_hyperparam_search",
    "als_implicit_topk",
    "als_fixture_rmse_band",
    "hll_distinct_rollup",
    "hll_sliding_distinct",
    "streaming_hll_distinct",
    "ann_lsh_topk",
    "embedding_near_dup_pairs",
    "random_split_counts",
    "stratified_sample_counts",
    "approx_aggregates",
)
R8_WINDOW: tuple[str, ...] = R8_PRIORITY_RECHECK + (
    "ann_ivf_topk",
    "array_functions_suite",
    "binary_file_source_scan",
    "bucketed_join_agg",
    "cdc_latest_state",
    "cogroup_user_order_stats",
    "cohort_retention",
    "content_based_recommend",
    "cosine_topk",
    "dedup_exact",
    "doc_chunk_overlap",
    "doc_chunk_udtf",
    "doc_fingerprint",
    "dot_product_topk",
    "feature_engineering_suite",
    "full_outer_reconciliation",
    "funnel_conversion",
    "grouped_map_zscore",
    "grouping_sets_suite",
    "image_source_metadata_scan",
    "json_source_roundtrip",
    "lang_distribution",
    "lang_id_heuristic",
    "minhash_lsh_dedup",
    "multimodal_decode_features",
    "ngram_jaccard_pairs",
    "orc_sink_roundtrip",
    "partitioned_write_pruned_read",
)

# r9 fill — the EXACT round-9 window, pinned in r8 (VERDICT r7 #3) and
# CORRECTED at the start of round 9 per VERDICT r8 #1: the r8 pin's
# rationale wrongly claimed record_linkage_blocked was the only
# changed-outside-window entry; simhash_near_dup_pairs was also
# re-planned in r8 (streaming pair enumeration + REPARTITION_BY_NUM
# fan-outs, commits a295ed8/3a726bd/2567867) while carrying a stale r5
# driver row, so it joins the changed head and the fill shrinks by one
# (zorder_layout_stats, the last r4-alphabetical name, rotates to r10).
# Rule, recomputed and asserted by tests/test_plans.py::test_r9_window_pin:
# (a) queries whose implementation or oracle changed in round 8 and sit
# OUTSIDE the r8 window (whose rows would otherwise go stale):
# record_linkage_blocked (data-derived hashed blocking, forced
# F.broadcast(supplier) hint dropped per ADVICE r7) and
# simhash_near_dup_pairs (streaming pair enumeration re-plan). Round 8's
# other changes need no r9 slot: the span_d GREATEST guard (ADVICE r7)
# touches range_join_events_orders + interval_overlap_join, the
# band_tol_x100 tolerance columns (VERDICT r7 #4) touch the HLL trio +
# approx_aggregates — all six are in R8_WINDOW, so their driver rows
# refreshed in r8 under the new form; the io_sinks per-PID scratch
# cleanup (ADVICE r7) is path-infra only, result-neutral for every
# sink-backed query.
# (b) oldest-green-first re-confirmations (last driver round ascending
# over CORRECTNESS_r01..r07, NAME as the tie-break — registry insertion
# order varies with module import order, so it cannot anchor a pinned
# list — R8_WINDOW names excluded since their r8 rows are freshest) up
# to the 50-slot window: the 13 remaining r3 rows, then r4 rows
# alphabetically through "write_recommendations_table".
R9_WINDOW: tuple[str, ...] = (
    "record_linkage_blocked",
    "simhash_near_dup_pairs",
    "pii_redaction",
    "python_datasource_scan",
    "python_datasource_stream",
    "regex_token_count",
    "repetition_stats",
    "sequence_pack_assignments",
    "streaming_session_window",
    "text_quality_score",
    "tfidf_top_terms",
    "token_stats",
    "udaf_weighted_mean",
    "unpivot_doc_metrics",
    "wordcount_documents",
    "bm25_topk",
    "bpr_negative_sampling",
    "contamination_check",
    "dedup_canonical_docs",
    "dedup_components",
    "dedup_components_lss",
    "dedup_pipeline_summary",
    "dup_rate_by_source",
    "duplicate_passage_detection",
    "embedding_centroid_by_label",
    "graph_embedding_propagation",
    "hash_split_assign",
    "key_distribution_histogram",
    "lang_id_confusion",
    "minhash_jaccard_estimate",
    "mixture_sample_by_source",
    "multi_hot_encode",
    "multimodal_frame_sample",
    "ndcg_at_k_popularity",
    "parquet_sink_roundtrip",
    "quality_filter_funnel",
    "reservoir_sample_per_key",
    "rolling_time_window_features",
    "shuffle_tokens_multiset",
    "simhash_fingerprint",
    "skew_key_diagnostics",
    "streaming_console_emit",
    "streaming_hash_split_counts",
    "streaming_watermarked_counts",
    "text_normalize",
    "unigram_logprob_score",
    "vector_argmax",
    "vector_serde_roundtrip",
    "vocab_build",
    "write_recommendations_table",
)

# r10 fill — the EXACT round-10 window, pinned at the start of round 10
# (VERDICT r9 #1 — r9 shipped no pin, so without this the r9 window
# would burn again and starve the 44 r5-latest rows). Rule, recomputed
# and asserted by tests/test_plans.py::test_r10_window_pin:
# (a) queries whose implementation or oracle changed in round 9 OUTSIDE
# the r9 window, whose latest green driver rows therefore no longer
# describe the shipped queries (VERDICT r9 "What's missing" #1):
# approx_aggregates first (its driver-hashed OUTPUT SCHEMA changed:
# p40_r/p60_r doubles -> p40_idx/p60_idx bigints), then
# ngram_jaccard_pairs (engine-side df-cap derivation changed),
# minhash_lsh_dedup (inherits the chunked _bucket_pairs), and the four
# result-neutral forced-broadcast drops stream_static_enrich,
# join_star_2hop, preagg_join_rollup, streaming_static_join; plus
# rollup_nation_brand, whose customer/part hints drop in round 10
# itself (VERDICT r9 "What's wrong" #1).
# (b) oldest-green-first re-confirmations (last driver round ascending
# over CORRECTNESS_r01..r09, NAME as the tie-break — registry insertion
# order varies with module import order, so it cannot anchor a pinned
# list — R9_WINDOW names excluded since their r9 rows are freshest) up
# to the 50-slot window: zorder_layout_stats (the last r4 row, promised
# this rotation since the r9 pin correction), the r5 rows
# alphabetically, then the first r6 row (ann_ivf_multiprobe_topk).
# Never-driver-checked (registered mid-round-10, after this pin froze;
# r11 head candidates via CHANGED_THIS_ROUND): streaming_simhash_dedup.
R10_CHANGED_HEAD: tuple[str, ...] = (
    "approx_aggregates",
    "ngram_jaccard_pairs",
    "minhash_lsh_dedup",
    "stream_static_enrich",
    "join_star_2hop",
    "preagg_join_rollup",
    "streaming_static_join",
    "rollup_nation_brand",
)
R10_WINDOW: tuple[str, ...] = R10_CHANGED_HEAD + (
    "zorder_layout_stats",
    "anti_join_unseen_items",
    "asof_join_last_order",
    "cold_start_new_items",
    "cold_start_popular_items",
    "cross_join_scoring",
    "cube_lang_source",
    "date_functions_suite",
    "distinct_user_event_pairs",
    "filter_notnull_range",
    "filter_point_lookup",
    "gap_fill_forward",
    "global_stats",
    "group_count_having_events",
    "image_decode_pixel_stats",
    "json_extract_props",
    "last_touch_attribution",
    "map_functions_suite",
    "nested_struct_history",
    "orderby_limit_topk",
    "percentile_stats",
    "pivot_event_type",
    "project_cast_rename",
    "roundtrip_delimited_parse",
    "salted_join_segment_counts",
    "semi_join_active_customers",
    "sessionize_events",
    "set_ops_except",
    "set_ops_intersect",
    "set_ops_union_distinct",
    "stats_agg_suite",
    "streaming_dedup_events",
    "streaming_parse_records",
    "streaming_stream_stream_join",
    "streaming_window_counts",
    "streaming_wordcount",
    "string_functions_suite",
    "top1_per_user_maxby",
    "topk_avg_rating_items",
    "topk_per_user_window",
    "window_functions_suite",
    "ann_ivf_multiprobe_topk",
)

# r11 fill — the EXACT round-11 window, pinned at the start of round 11
# from the round-10 manifest (VERDICT r10 #1). Rule, recomputed and
# asserted by tests/test_plans.py::test_r11_window_pin:
# (a) head = the r10 CHANGED_THIS_ROUND tuple minus R10_WINDOW names
# (in-window names got fresh r10 rows at round end), in tuple order:
# streaming_simhash_dedup first (registered mid-round-10, NEVER
# driver-checked), then ann_ivf_topk and ivf_pq_topk (re-planned onto
# the map-side centroid assignment in r10, stale rows r08/r06),
# quality_filter_funnel (sorted run-length fold rewrite, stale row
# r09), and the nine names touched by the shared shuffle_partitions
# helper / chunked _bucket_pairs: dedup_canonical_docs,
# dedup_components, dedup_components_lss, dedup_pipeline_summary,
# minhash_jaccard_estimate, record_linkage_blocked,
# simhash_near_dup_pairs, vocab_build, zipf_law_fit.
# (b) oldest-green-first re-confirmations (last driver round ascending
# over CORRECTNESS_r01..r10, NAME as the tie-break — registry insertion
# order varies with module import order, so it cannot anchor a pinned
# list — R10_WINDOW names excluded since their r10 rows are freshest)
# up to the 50-slot window: 37 r6-latest rows alphabetically, from
# approx_topk_parts through streaming_approx_topk.
# Never-driver-checked outside this window: none.
R11_CHANGED_HEAD: tuple[str, ...] = (
    "streaming_simhash_dedup",
    "ann_ivf_topk",
    "ivf_pq_topk",
    "quality_filter_funnel",
    "dedup_canonical_docs",
    "dedup_components",
    "dedup_components_lss",
    "dedup_pipeline_summary",
    "minhash_jaccard_estimate",
    "record_linkage_blocked",
    "simhash_near_dup_pairs",
    "vocab_build",
    "zipf_law_fit",
)
R11_WINDOW: tuple[str, ...] = R11_CHANGED_HEAD + (
    "approx_topk_parts",
    "arrow_vector_norms",
    "auc_rank_sum",
    "bigram_logprob_score",
    "bloom_semi_join_prune",
    "boolean_retrieval_and",
    "bucketed_ratings_join",
    "calibration_bins",
    "correlation_matrix",
    "covisitation_matrix",
    "data_profile_summary",
    "embedding_quantize_int8",
    "eval_candidate_sampling",
    "ewma_by_type",
    "gap_fill_linear",
    "gdpr_erasure_audit",
    "graph_triangle_count",
    "image_resize_stats",
    "incremental_agg_merge",
    "item_cooccurrence_jaccard",
    "item_cooccurrence_topk",
    "kcore_membership",
    "lpa_communities",
    "mad_outlier_counts",
    "merge_upsert_snapshot",
    "mixture_rebalance_weights",
    "nearest_centroid_classify",
    "next_item_training_pairs",
    "ohlc_resample",
    "pagerank_bipartite",
    "quality_quartile_stats",
    "random_walk_training_paths",
    "rank_normalize_features",
    "referential_integrity_audit",
    "rfm_segmentation",
    "scd2_priority_history",
    "streaming_approx_topk",
)

# r12 fill — the EXACT round-12 window, pinned at the start of round 12
# from the round-11 manifest (VERDICT r11 #2). Rule, recomputed and
# asserted by tests/test_plans.py::test_r12_window_pin:
# (a) head = the r11 CHANGED_THIS_ROUND tuple minus R11_WINDOW names
# (in-window names got fresh r11 rows at round end), in tuple order:
# ann_ivf_multiprobe_topk (broadcast-centroid _ivf_assign_cells swap,
# row predates it at r10) and ppr_seeded_items (serialized-checkpoint
# storage-level change, latest row r07).
# (b) oldest-green-first re-confirmations (last driver round ascending
# over CORRECTNESS_r01..r11, NAME as the tie-break — registry insertion
# order varies with module import order, so it cannot anchor a pinned
# list — R11_WINDOW names excluded since their r11 rows are freshest)
# up to the 50-slot window: the four remaining r6-latest rows
# (streaming_socket_parse_records, streaming_upsert_merge,
# temporal_holdout_split, two_phase_topk), then the first 44 r7-latest
# rows alphabetically, from ab_test_zscore through
# theil_sen_slope_robust.
# Never-driver-checked outside this window:
# streaming_recommend_candidates (registered mid-round-12 — the
# candidate-pruned ST6 loop), als_user_fold_in (registered
# mid-round-12 — closed-form ALS user fold-in), and
# streaming_online_ridge (registered mid-round-12 — per-user
# sufficient-statistics model state), and als_item_fold_in
# (registered mid-round-12 — symmetric item-side fold-in); all named
# in CHANGED_THIS_ROUND, so they head the r13 window first by the r11
# rule: never-checked precedes changed.
R12_CHANGED_HEAD: tuple[str, ...] = (
    "ann_ivf_multiprobe_topk",
    "ppr_seeded_items",
)
R12_WINDOW: tuple[str, ...] = R12_CHANGED_HEAD + (
    "streaming_socket_parse_records",
    "streaming_upsert_merge",
    "temporal_holdout_split",
    "two_phase_topk",
    "ab_test_zscore",
    "ansi_try_functions_suite",
    "asof_join_next_order",
    "benford_law_audit",
    "bootstrap_mean_ci",
    "chi_square_independence",
    "class_tfidf_top_terms",
    "cms_user_frequency",
    "collation_case_insensitive_group",
    "column_entropy_profile",
    "compaction_bin_packing",
    "csv_corrupt_record_audit",
    "data_expectations_audit",
    "decayed_popularity_topk",
    "dynamic_partition_pruning_join",
    "embedding_label_drift",
    "event_spike_detection",
    "event_transition_probs",
    "file_metadata_columns",
    "frequent_event_paths",
    "histogram_quantile_sketch",
    "item_adamic_adar_topk",
    "item_knn_graph",
    "join_size_estimation_audit",
    "kmv_intersection_estimate",
    "ks_test_source_drift",
    "lateral_join_top_orders",
    "linear_regression_closed_form",
    "mutual_information_type_hour",
    "null_semantics_suite",
    "observed_metrics_audit",
    "parquet_agg_pushdown_stats",
    "phrase_retrieval_topdocs",
    "prefix_filter_jaccard_join",
    "rec_diversity_metrics",
    "scd2_point_in_time_join",
    "schema_evolution_merge_read",
    "source_lang_kl_divergence",
    "source_shingle_containment",
    "sql_udf_revenue",
    "streaming_dedup_within_watermark",
    "streaming_stream_stream_left_join",
    "target_encoding_oof",
    "theil_sen_slope_robust",
)

# r13 fill — the EXACT round-13 window, pinned at the start of round 13
# from the round-12 manifest (VERDICT r12 #1). Rule, recomputed and
# asserted by tests/test_plans.py::test_r13_window_pin:
# (a) head = the r12 CHANGED_THIS_ROUND tuple minus R12_WINDOW names
# (none were in-window), ordered never-driver-checked FIRST (the
# standing r11 rule: never-checked precedes changed), i.e. the four
# operators registered mid-round-12 with no driver row ever
# (streaming_recommend_candidates, als_user_fold_in, als_item_fold_in,
# streaming_online_ridge — VERDICT r12 #1's exact order), then the
# three whose green rows predate a result-neutral r12 re-plan
# (streaming_interest_fold and streaming_recommend_emit — state
# sharding; streaming_simhash_dedup — readStream schema built from a
# copy).
# (b) oldest-green-first re-confirmations (last driver round ascending
# over CORRECTNESS_r01..r12, NAME as the tie-break — registry insertion
# order varies with module import order, so it cannot anchor a pinned
# list — R12_WINDOW names excluded since their r12 rows are freshest)
# up to the 50-slot window: the two remaining r7-latest rows
# (variant_json_extract, weighted_reservoir_sample), then the first 41
# r8-latest rows alphabetically, from als_cross_validation through
# random_split_counts.
# Never-driver-checked outside this window:
# streaming_ann_index_update (registered mid-round-13, after this pin
# froze — incremental IVF index maintenance, streaming/ann_index.py);
# named in CHANGED_THIS_ROUND, so it heads the r14 window first by the
# standing rule: never-checked precedes changed.
R13_CHANGED_HEAD: tuple[str, ...] = (
    "streaming_recommend_candidates",
    "als_user_fold_in",
    "als_item_fold_in",
    "streaming_online_ridge",
    "streaming_interest_fold",
    "streaming_recommend_emit",
    "streaming_simhash_dedup",
)
R13_WINDOW: tuple[str, ...] = R13_CHANGED_HEAD + (
    "variant_json_extract",
    "weighted_reservoir_sample",
    "als_cross_validation",
    "als_fixture_rmse_band",
    "als_hyperparam_search",
    "als_implicit_topk",
    "als_precision_recall_at_k",
    "als_recommend_topk",
    "als_rmse",
    "ann_lsh_topk",
    "array_functions_suite",
    "binary_file_source_scan",
    "bucketed_join_agg",
    "cdc_latest_state",
    "cogroup_user_order_stats",
    "cohort_retention",
    "content_based_recommend",
    "cosine_topk",
    "dedup_exact",
    "doc_chunk_overlap",
    "doc_chunk_udtf",
    "doc_fingerprint",
    "dot_product_topk",
    "embedding_near_dup_pairs",
    "embedding_pca_top_component",
    "feature_engineering_suite",
    "full_outer_reconciliation",
    "funnel_conversion",
    "grouped_map_zscore",
    "grouping_sets_suite",
    "hll_distinct_rollup",
    "hll_sliding_distinct",
    "image_source_metadata_scan",
    "interval_overlap_join",
    "json_source_roundtrip",
    "kmeans_embedding_clusters",
    "lang_distribution",
    "lang_id_heuristic",
    "multimodal_decode_features",
    "orc_sink_roundtrip",
    "partitioned_write_pruned_read",
    "pipeline_classifier_eval",
    "random_split_counts",
)

# r14 fill — the EXACT round-14 window, pinned at the start of round 14
# from the round-13 manifest (VERDICT r13 #1). Rule, recomputed and
# asserted by tests/test_plans.py::test_r14_window_pin:
# (a) head = the r13 CHANGED_THIS_ROUND tuple minus R13_WINDOW names
# (in-window names got fresh r13 rows at round end), ordered
# never-driver-checked FIRST (the standing r11 rule: never-checked
# precedes changed): streaming_ann_index_update (registered
# mid-round-13, no driver row in any CORRECTNESS_r* file — VERDICT r13
# #2's exact ask: the driver hash-checks incremental-equals-rebuild),
# then the three whose green rows predate the result-neutral r13
# derive_state_partitions re-plan, in tuple order
# (streaming_window_counts, streaming_stream_stream_join,
# streaming_stream_stream_left_join — the last also carries the r13
# bench flag, so its driver row doubles as the correctness half of the
# isolation protocol).
# (b) oldest-green-first re-confirmations (last driver round ascending
# over CORRECTNESS_r01..r13, NAME as the tie-break — registry insertion
# order varies with module import order, so it cannot anchor a pinned
# list — R13_WINDOW names excluded since their r13 rows are freshest)
# up to the 50-slot window: the three remaining r8-latest rows
# (range_join_events_orders, stratified_sample_counts,
# streaming_hll_distinct), all 41 r9-latest rows alphabetically from
# bm25_topk through write_recommendations_table, then the first two
# r10-latest rows alphabetically (anti_join_unseen_items,
# approx_aggregates).
# Never-driver-checked outside this window:
# streaming_ann_index_compact (registered mid-round-14, after this pin
# froze — the ANN index lifecycle query: compaction every
# ANN_COMPACT_EVERY appends bounds the live file count,
# streaming/ann_index.py), streaming_ann_index_upsert (also
# mid-round-14 — the re-embedding path: last-writer-wins on a
# data-derived version column, purging compaction), and
# streaming_ann_index_delete (also mid-round-14 — the removal path:
# keyed tombstones in a delete-marker side table, applied physically
# at compaction), and streaming_ann_search (also mid-round-14 — the
# serving path: streaming query vectors answered from the maintained
# cell-bucketed index, exact-checked pruned top-k); all named in
# CHANGED_THIS_ROUND, so they head the r15 window first by the
# standing rule: never-checked precedes changed.
R14_CHANGED_HEAD: tuple[str, ...] = (
    "streaming_ann_index_update",
    "streaming_window_counts",
    "streaming_stream_stream_join",
    "streaming_stream_stream_left_join",
)
R14_WINDOW: tuple[str, ...] = R14_CHANGED_HEAD + (
    "range_join_events_orders",
    "stratified_sample_counts",
    "streaming_hll_distinct",
    "bm25_topk",
    "bpr_negative_sampling",
    "contamination_check",
    "dup_rate_by_source",
    "duplicate_passage_detection",
    "embedding_centroid_by_label",
    "graph_embedding_propagation",
    "hash_split_assign",
    "key_distribution_histogram",
    "lang_id_confusion",
    "mixture_sample_by_source",
    "multi_hot_encode",
    "multimodal_frame_sample",
    "ndcg_at_k_popularity",
    "parquet_sink_roundtrip",
    "pii_redaction",
    "python_datasource_scan",
    "python_datasource_stream",
    "regex_token_count",
    "repetition_stats",
    "reservoir_sample_per_key",
    "rolling_time_window_features",
    "sequence_pack_assignments",
    "shuffle_tokens_multiset",
    "simhash_fingerprint",
    "skew_key_diagnostics",
    "streaming_console_emit",
    "streaming_hash_split_counts",
    "streaming_session_window",
    "streaming_watermarked_counts",
    "text_normalize",
    "text_quality_score",
    "tfidf_top_terms",
    "token_stats",
    "udaf_weighted_mean",
    "unigram_logprob_score",
    "unpivot_doc_metrics",
    "vector_argmax",
    "vector_serde_roundtrip",
    "wordcount_documents",
    "write_recommendations_table",
    "anti_join_unseen_items",
    "approx_aggregates",
)

# r15 fill — the EXACT round-15 window, pinned at the start of round 15
# from the round-14 manifest (VERDICT r14 #1). Rule, recomputed and
# asserted by tests/test_plans.py::test_r15_window_pin:
# (a) head = the r14 CHANGED_THIS_ROUND tuple minus R14_WINDOW names
# (in-window names got fresh r14 rows at round end), ordered
# never-driver-checked FIRST (the standing r11 rule: never-checked
# precedes changed): the four ANN lifecycle/serving queries registered
# mid-round-14 with no driver row in any CORRECTNESS_r* file
# (streaming_ann_search, streaming_ann_index_delete,
# streaming_ann_index_upsert, streaming_ann_index_compact — VERDICT r14
# #1's exact ask: the driver hash-confirms the served answer,
# delete-equals-rebuild, upsert-equals-rebuild and compaction
# neutrality), then the three whose green rows predate result-neutral
# r14 re-plans, in tuple order (streaming_simhash_dedup,
# streaming_online_ridge — the pyarrow-inside-try _parquet_rows change
# reached their closures; streaming_recommend_candidates — REC_NPROBE
# became the documented env dial).
# (b) oldest-green-first re-confirmations (last driver round ascending
# over CORRECTNESS_r01..r14, NAME as the tie-break — registry insertion
# order varies with module import order, so it cannot anchor a pinned
# list — R14_WINDOW names excluded since their r14 rows are freshest)
# up to the 50-slot window: the first 43 r10-latest rows alphabetically,
# from asof_join_last_order through topk_per_user_window.
# Never-driver-checked outside this window:
# streaming_ann_index_requantize (registered mid-round-15, after this
# pin froze — the staleness alarm's actuator: a drifted arrival slice
# trips the per-batch cell-skew detector, the quantizer re-seeds from
# the index's own stored vectors, and the index migrates one generation
# under the new seeds, streaming/ann_requantize.py) and
# ann_two_level_assign and ann_two_level_search (also mid-round-15 —
# the hierarchical coarse quantizer's ingest and serving sides: the
# scale path past the flat fold's width cap, streaming/ann_index.py);
# all named in CHANGED_THIS_ROUND, so they head the r16 window first by
# the standing rule: never-checked precedes changed.
R15_CHANGED_HEAD: tuple[str, ...] = (
    "streaming_ann_search",
    "streaming_ann_index_delete",
    "streaming_ann_index_upsert",
    "streaming_ann_index_compact",
    "streaming_simhash_dedup",
    "streaming_online_ridge",
    "streaming_recommend_candidates",
)
R15_WINDOW: tuple[str, ...] = R15_CHANGED_HEAD + (
    "asof_join_last_order",
    "cold_start_new_items",
    "cold_start_popular_items",
    "cross_join_scoring",
    "cube_lang_source",
    "date_functions_suite",
    "distinct_user_event_pairs",
    "filter_notnull_range",
    "filter_point_lookup",
    "gap_fill_forward",
    "global_stats",
    "group_count_having_events",
    "image_decode_pixel_stats",
    "join_star_2hop",
    "json_extract_props",
    "last_touch_attribution",
    "map_functions_suite",
    "minhash_lsh_dedup",
    "nested_struct_history",
    "ngram_jaccard_pairs",
    "orderby_limit_topk",
    "percentile_stats",
    "pivot_event_type",
    "preagg_join_rollup",
    "project_cast_rename",
    "rollup_nation_brand",
    "roundtrip_delimited_parse",
    "salted_join_segment_counts",
    "semi_join_active_customers",
    "sessionize_events",
    "set_ops_except",
    "set_ops_intersect",
    "set_ops_union_distinct",
    "stats_agg_suite",
    "stream_static_enrich",
    "streaming_dedup_events",
    "streaming_parse_records",
    "streaming_static_join",
    "streaming_wordcount",
    "string_functions_suite",
    "top1_per_user_maxby",
    "topk_avg_rating_items",
    "topk_per_user_window",
)

# r16 fill — the EXACT round-16 window, pinned at the start of round 16
# from the round-15 manifest (VERDICT r15 #1). Rule, recomputed and
# asserted by tests/test_plans.py::test_r16_window_pin:
# (a) head = the r15 CHANGED_THIS_ROUND tuple minus R15_WINDOW names
# (in-window names got fresh r15 rows at round end), ordered
# never-driver-checked FIRST (the standing r11 rule: never-checked
# precedes changed): the three queries registered mid-round-15 with no
# driver row in any CORRECTNESS_r* file (ann_two_level_search,
# ann_two_level_assign, streaming_ann_index_requantize — VERDICT r15
# #1's exact ask: the driver hash-confirms the hierarchical
# assignment/serving answers and post-migration-equals-rebuild), then
# the one changed-but-previously-green name (streaming_ann_index_update
# — its closure took the r15 derive_ann_cells/carry_vectors/rename-aside
# re-plan but R15_WINDOW had no slot for it).
# (b) oldest-green-first re-confirmations (last driver round ascending
# over CORRECTNESS_r01..r15, NAME as the tie-break, R15_WINDOW names
# excluded since their r15 rows are freshest) up to the 50-slot window:
# the two remaining r10-latest rows (window_functions_suite,
# zorder_layout_stats) then the first 44 r11-latest rows alphabetically,
# from ann_ivf_topk through rfm_segmentation.
# Never-driver-checked outside this window:
# streaming_ann_requantize_two_level (registered mid-round-16, after
# this pin froze — the WIDE lifecycle end to end: two-level appends at
# the uncapped sqrt-corpus width, the cell-skew alarm, the two-level
# refresh from the index's own stored vectors, and the two-level
# migration rewrite, streaming/ann_requantize.py); named in
# CHANGED_THIS_ROUND, so it heads the r17 window by the standing rule
# (never-checked precedes changed).
R16_CHANGED_HEAD: tuple[str, ...] = (
    "ann_two_level_search",
    "ann_two_level_assign",
    "streaming_ann_index_requantize",
    "streaming_ann_index_update",
)
R16_WINDOW: tuple[str, ...] = R16_CHANGED_HEAD + (
    "window_functions_suite",
    "zorder_layout_stats",
    "ann_ivf_topk",
    "approx_topk_parts",
    "arrow_vector_norms",
    "auc_rank_sum",
    "bigram_logprob_score",
    "bloom_semi_join_prune",
    "boolean_retrieval_and",
    "bucketed_ratings_join",
    "calibration_bins",
    "correlation_matrix",
    "covisitation_matrix",
    "data_profile_summary",
    "dedup_canonical_docs",
    "dedup_components",
    "dedup_components_lss",
    "dedup_pipeline_summary",
    "embedding_quantize_int8",
    "eval_candidate_sampling",
    "ewma_by_type",
    "gap_fill_linear",
    "gdpr_erasure_audit",
    "graph_triangle_count",
    "image_resize_stats",
    "incremental_agg_merge",
    "item_cooccurrence_jaccard",
    "item_cooccurrence_topk",
    "ivf_pq_topk",
    "kcore_membership",
    "lpa_communities",
    "mad_outlier_counts",
    "merge_upsert_snapshot",
    "minhash_jaccard_estimate",
    "mixture_rebalance_weights",
    "nearest_centroid_classify",
    "next_item_training_pairs",
    "ohlc_resample",
    "pagerank_bipartite",
    "quality_filter_funnel",
    "quality_quartile_stats",
    "random_walk_training_paths",
    "rank_normalize_features",
    "record_linkage_blocked",
    "referential_integrity_audit",
    "rfm_segmentation",
)

# r17 fill — the EXACT round-17 window, pinned at the start of round 17
# from the round-16 manifest (VERDICT r16 #9). Rule, recomputed and
# asserted by tests/test_plans.py::test_r17_window_pin:
# (a) head = the r16 CHANGED_THIS_ROUND tuple minus R16_WINDOW names
# (in-window names got fresh r16 rows at round end), ordered
# never-driver-checked FIRST (the standing r11 rule): the one query
# registered mid-round-16 with no driver row in any CORRECTNESS_r*
# file (streaming_ann_requantize_two_level — the WIDE two-level drift
# lifecycle end to end, VERDICT r16 #9's exact ask), then the nineteen
# changed-but-previously-green names in CHANGED_THIS_ROUND order (the
# r16 optimization closures: the Arrow-vectorized assignment family,
# the folded-norm pair scorers, the scan-fanout dedup/text family, and
# the lead()-paired Theil–Sen).
# (b) oldest-green-first re-confirmations (last driver round ascending
# over CORRECTNESS_r01..r16, NAME as the tie-break, R16_WINDOW names
# excluded since their r16 rows are freshest) up to the 50-slot window:
# the four remaining r11-latest rows (scd2_priority_history,
# streaming_approx_topk, vocab_build, zipf_law_fit) then the first 26
# r12-latest rows alphabetically, from ab_test_zscore through
# lateral_join_top_orders.
R17_CHANGED_HEAD: tuple[str, ...] = (
    "streaming_ann_requantize_two_level",
    "streaming_ann_index_compact",
    "streaming_ann_index_upsert",
    "streaming_ann_index_delete",
    "streaming_ann_search",
    "ann_ivf_multiprobe_topk",
    "streaming_recommend_candidates",
    "ann_lsh_topk",
    "embedding_near_dup_pairs",
    "streaming_recommend_emit",
    "streaming_simhash_dedup",
    "contamination_check",
    "minhash_lsh_dedup",
    "ngram_jaccard_pairs",
    "prefix_filter_jaccard_join",
    "simhash_fingerprint",
    "simhash_near_dup_pairs",
    "source_shingle_containment",
    "bootstrap_mean_ci",
    "theil_sen_slope_robust",
)
R17_WINDOW: tuple[str, ...] = R17_CHANGED_HEAD + (
    "scd2_priority_history",
    "streaming_approx_topk",
    "vocab_build",
    "zipf_law_fit",
    "ab_test_zscore",
    "ansi_try_functions_suite",
    "asof_join_next_order",
    "benford_law_audit",
    "chi_square_independence",
    "class_tfidf_top_terms",
    "cms_user_frequency",
    "collation_case_insensitive_group",
    "column_entropy_profile",
    "compaction_bin_packing",
    "csv_corrupt_record_audit",
    "data_expectations_audit",
    "decayed_popularity_topk",
    "dynamic_partition_pruning_join",
    "embedding_label_drift",
    "event_spike_detection",
    "event_transition_probs",
    "file_metadata_columns",
    "frequent_event_paths",
    "histogram_quantile_sketch",
    "item_adamic_adar_topk",
    "item_knn_graph",
    "join_size_estimation_audit",
    "kmv_intersection_estimate",
    "ks_test_source_drift",
    "lateral_join_top_orders",
)

# Round 17 rotation (VERDICT r16 #9): burn the pinned window.
DRIVER_CHECK_FIRST: tuple[str, ...] = R17_WINDOW
DRIVER_CHECK_LAST: tuple[str, ...] = ()

# Queries whose implementation hash (transitive in-package closure, see
# plans/manifest.py) changed since the round-17 start tree (the tree the
# r16 driver verified; plans/query_manifest.json is frozen there).
# VERDICT r9 #3: this tuple is appended IN THE SAME COMMIT as any
# query/oracle/helper change — enforced by
# tests/test_plans.py::test_changed_queries_are_manifested, which fails
# on any hash drift not named here. The r18 window head is derived from
# it mechanically: CHANGED_THIS_ROUND minus R17_WINDOW (in-window names
# get fresh r17 rows at round end and need no r18 slot). At the start of
# round 18: refresh the manifest (python -m
# cqu_bigdata_recommender_system_for_movies_spark.plans.manifest
# refresh), pin R18_WINDOW, reset this tuple to ().
# r17 changes so far (ADVICE r16 + VERDICT r16 #4 hygiene on the shared
# ANN/IVF assignment helpers — results unchanged, re-proven vs DuckDB):
# nearcell's sort keys now replicate Spark's ==-based double comparator
# exactly (signed zeros normalized before the total-order key — the raw
# key ranked -0.0 < +0.0, divergent only in an unreachable
# configuration); two_level_cell_udf masks the -1 unfilled sentinel to
# NULL (the array variant's c >= 0 filter); derive_fold_parts never
# returns 1 (a repartition(1) paid an exchange to SERIALIZE the
# assignment — the 20k-40k-row band now skips the exchange).
CHANGED_THIS_ROUND: tuple[str, ...] = (
    "ann_ivf_multiprobe_topk",
    "ann_ivf_topk",
    "ann_two_level_assign",
    "ann_two_level_search",
    "ivf_pq_topk",
    "streaming_ann_index_compact",
    "streaming_ann_index_delete",
    "streaming_ann_index_requantize",
    "streaming_ann_index_update",
    "streaming_ann_index_upsert",
    "streaming_ann_requantize_two_level",
    "streaming_ann_search",
    "streaming_recommend_candidates",
    # r17 OPTIMIZATION (VERDICT r16 #5, guide §5): the seeded 80/20
    # split is materialized ONCE (serialized localCheckpoint) instead of
    # re-running the ratings join + sample per action (fit, two
    # conservation counts, RMSE evaluation); randomSplit is seeded and
    # partition-deterministic, so every consumer reads the same rows —
    # results bit-identical, the conservation anchor still real.
    "als_rmse",
    "als_precision_recall_at_k",
    # r17 OPTIMIZATION (VERDICT r16 #2): the versioned upsert/delete
    # staging writes all slices in ONE partitionBy("ver") job (was
    # n_slices sequential jobs re-evaluating the union per slice), and
    # a batch with no tombstone rows skips the delete-marker append
    # (LIMIT-1 emptiness probe; marker-before-append ordering intact
    # for batches that DO delete). Replay order stays version order
    # (path order); winners are data-derived either way. Delete warm
    # floor 11.2 -> ~6.0 s; results identical (oracle re-proven).
    # r17 OPTIMIZATION (guide §2.5 — the r16 scan_fanout class): the
    # bigram generation + checkpoint materialization ran on the suite's
    # ONE documents scan task; fanned to machine width, None at scale.
    # Warm isolation floor 2.27 -> 0.94 s. Results identical (re-proven
    # vs DuckDB at three sfs). The same fan-out was TRIALLED on
    # text_normalize and bigram_logprob_score and reverted — their
    # one-task work is cheaper than the exchange (cold-session floors
    # regressed ~0.1-0.2 s), so their hashes are back at baseline.
    "phrase_retrieval_topdocs",
    # r17 OPTIMIZATION (guide §2.3): the 7-column profile's multi-
    # distinct no longer plans an 8x Expand of the whole fact table —
    # it is a UNION of per-column aggregate branches, each scanning
    # exactly its own column (same total bytes under columnar pruning,
    # nothing row-multiplied). 3.9 -> 1.1 s warm at sf0.1; results
    # identical (parity re-proven at sf0.001/0.1 and a 10x lineitem
    # replica — the ROUND(4) double-sum means hold).
    "data_profile_summary",
    # r17 OPTIMIZATION (guide §2.3): the seen-pair dedup + anti-join
    # shuffle now carries only pairs involving the broadcast candidate
    # pool (semi-join prefilter) instead of every (user, item) pair —
    # 2.28 -> 1.59 s warm; results identical (parity at two sfs).
    "rec_diversity_metrics",
)


def _driver_order(names) -> list[str]:
    listed = DRIVER_CHECK_FIRST + DRIVER_CHECK_LAST
    assert len(DRIVER_CHECK_FIRST) <= DRIVER_WINDOW, (
        f"DRIVER_CHECK_FIRST has {len(DRIVER_CHECK_FIRST)} names for a "
        f"{DRIVER_WINDOW}-slot window; the overflow would silently never run"
    )
    assert len(set(listed)) == len(listed), "duplicate name in driver lists"
    unknown = [n for n in listed if n not in names]
    assert not unknown, f"driver lists name unregistered queries: {unknown}"
    first = [n for n in DRIVER_CHECK_FIRST if n in names]
    last = [n for n in DRIVER_CHECK_LAST if n in names]
    middle = [n for n in names if n not in set(first) | set(last)]
    return first + middle + last


def all_queries() -> dict[str, SparkQuery]:
    _load_operator_modules()
    return {name: QUERIES[name].fn for name in _driver_order(list(QUERIES))}


def all_oracles() -> dict[str, str]:
    _load_operator_modules()
    return {name: ORACLES[name] for name in _driver_order(list(QUERIES)) if name in ORACLES}


_LOADED = False


def _load_operator_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Driver check order is set by DRIVER_CHECK_FIRST/LAST (not module import
    # order); imports here only populate the registry.
    import cqu_bigdata_recommender_system_for_movies_spark.operators.relational  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.ml.als  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.streaming.queries  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.topk  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.windows  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.olap  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.features  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.sampling  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.io_sinks  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.multimodal  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.sources.binary_files  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.sources.crawl_source  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.ml.pipeline  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.dedup  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.vectors  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.text  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.itemcf  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.sketches  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.graph  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.operators.stattests  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.streaming.candidates  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.ml.foldin  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.streaming.ridge  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.streaming.ann_index  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.streaming.ann_search  # noqa: F401
    import cqu_bigdata_recommender_system_for_movies_spark.streaming.ann_requantize  # noqa: F401

    _LOADED = True

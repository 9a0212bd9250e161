"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a
(name, spark_fn, oracle_sql) triple. ``__spark_entry__.queries()`` and
``oracle_sql()`` are thin views over this registry, and the local parity
test (tests/test_oracle_parity.py) replays the driver's check — Spark vs
DuckDB, row-count + schema + order-insensitive values — at sf0.001.

Conventions (required for the driver's value-hash to match):
- Alias every computed column identically in Spark and SQL.
- Round non-integer-valued doubles to a fixed scale on BOTH sides
  (accumulation order differs between engines).
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
# This list pins that window for round 5 — exactly DRIVER_WINDOW names.
# Priority order: (a) entries whose implementation or oracle changed this
# round (simhash_near_dup_pairs: fingerprint-collapse rewrite;
# map_functions_suite: oracle now derives first_key/n_entries from the
# JSON; embedding_pca_top_component: Gramian re-plan), (b) the round-4
# additions that have never had a driver row (VERDICT r4 #1), (c) the new
# round-5 entry (image_decode_pixel_stats — real PNG decode), then (d) the
# FULL set of queries whose latest green row is round 2 — 44 of them, so
# no green row ages past 2 rounds (VERDICT r4 #7)... minus one:
# als_recommend_topk is ceded (51 names for 50 slots). It is the weakest
# marginal evidence in the set — rows-only (no oracle), costs a full ALS
# fit, and its semantics are pytest-gated every run — and it goes FIRST
# into the r6 window.
#
# r6 fill — EXACT math (counted against CORRECTNESS_r01..r04 + this
# window): round 5 registered 30 queries after this window was pinned,
# every one driver_sim-green at sf0.01 but with no driver row:
# ohlc_resample, scd2_priority_history, gap_fill_linear, ewma_by_type,
# interval_overlap_join, streaming_socket_parse_records,
# streaming_hll_distinct, streaming_approx_topk, auc_rank_sum,
# calibration_bins, data_profile_summary, incremental_agg_merge,
# gdpr_erasure_audit, mad_outlier_counts, correlation_matrix,
# temporal_holdout_split, eval_candidate_sampling,
# bucketed_ratings_join, merge_upsert_snapshot, image_resize_stats,
# ivf_pq_topk, nearest_centroid_classify, boolean_retrieval_and,
# hll_distinct_rollup, approx_topk_parts, hll_sliding_distinct,
# pagerank_bipartite, random_walk_training_paths, lpa_communities,
# kcore_membership, plus those added after this count:
# arrow_vector_norms, streaming_upsert_merge, two_phase_topk,
# next_item_training_pairs, ann_ivf_multiprobe_topk,
# mixture_rebalance_weights, rank_normalize_features,
# referential_integrity_audit, bloom_semi_join_prune,
# histogram_quantile_sketch, weighted_reservoir_sample,
# target_encoding_oof, record_linkage_blocked, event_transition_probs,
# ab_test_zscore, chi_square_independence, source_lang_kl_divergence,
# compaction_bin_packing, source_shingle_containment,
# event_spike_detection, frequent_event_paths, variant_json_extract,
# rec_diversity_metrics, streaming_stream_stream_left_join,
# ppr_seeded_items, decayed_popularity_topk, phrase_retrieval_topdocs,
# embedding_label_drift, ks_test_source_drift, bootstrap_mean_ci,
# streaming_dedup_within_watermark, linear_regression_closed_form,
# preagg_join_rollup, dynamic_partition_pruning_join,
# parquet_agg_pushdown_stats, null_semantics_suite,
# collation_case_insensitive_group, sql_udf_revenue,
# lateral_join_top_orders, observed_metrics_audit,
# file_metadata_columns, ansi_try_functions_suite,
# scd2_point_in_time_join, join_size_estimation_audit,
# asof_join_next_order, schema_evolution_merge_read,
# csv_corrupt_record_audit, zipf_law_fit,
# mutual_information_type_hour, benford_law_audit,
# theil_sen_slope_robust, data_expectations_audit,
# column_entropy_profile, prefix_filter_jaccard_join,
# cms_user_frequency, item_adamic_adar_topk, item_knn_graph,
# bigram_logprob_score, kmv_intersection_estimate,
# covisitation_matrix, class_tfidf_top_terms.
# Those (88 never-checked as of end of round 5 — the exactness of this
# list vs CORRECTNESS_r*.json is asserted by
# tests/test_plans.py::test_next_window_plan_comment_is_exact), plus
# als_recommend_topk (ceded above), plus the three entries whose
# co-occurrence base changed in round 5 (item_cooccurrence_topk,
# item_cooccurrence_jaccard, graph_triangle_count — outputs
# hash-identical locally, still must re-verify) = 92 priority names for
# 50 slots: the r6 window takes the 50 in the order listed above
# (never-checked first, oldest additions first), the overflow leads r7
# together with the oldest r3-latest greens — every never-checked name
# outranks every re-confirmation.
DRIVER_WINDOW = 50

DRIVER_CHECK_FIRST: tuple[str, ...] = (
    # -- changed this round: must re-verify --------------------------------
    "simhash_near_dup_pairs",  # identical-fingerprint collapse before banding
    "map_functions_suite",  # never-checked + oracle now data-derived
    "embedding_pca_top_component",  # never-checked + Gramian re-plan (rows-only)
    # -- never driver-checked (late round-4 additions) ---------------------
    "rfm_segmentation",
    "last_touch_attribution",
    "embedding_quantize_int8",
    # -- new this round ----------------------------------------------------
    "image_decode_pixel_stats",  # S8 real PNG decode, byte-exact vs oracle
    # -- latest green is round 2: full rotation so max green-row age <= 2 --
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
    "join_star_2hop",
    "json_extract_props",
    "nested_struct_history",
    "orderby_limit_topk",
    "percentile_stats",
    "pivot_event_type",
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
    "string_functions_suite",
    "top1_per_user_maxby",
    "topk_avg_rating_items",
    "topk_per_user_window",
    "window_functions_suite",
    # -- r2-latest streaming re-confirms (file-source twins; cheap first) --
    "streaming_parse_records",
    "streaming_wordcount",
    "streaming_window_counts",
    "streaming_static_join",
    "streaming_dedup_events",
    # -- expensive stateful/streaming tail so a failure can't starve the
    # -- cheap checks (all three are r2-latest: must re-confirm) -----------
    "streaming_interest_fold",
    "streaming_recommend_emit",
    "streaming_stream_stream_join",
)

# Expensive, many-times-verified entries parked at the very end of the
# registration order. als_recommend_topk leads the r6 window (ceded from
# r5's 51-for-50 crunch); the rest are r4-green ALS fits.
DRIVER_CHECK_LAST: tuple[str, ...] = (
    "als_recommend_topk",
    "als_rmse",
    "als_precision_recall_at_k",
    "als_cross_validation",
    "als_hyperparam_search",
    "als_implicit_topk",
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

    _LOADED = True

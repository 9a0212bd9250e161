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
# This list pins that window for round 6 — exactly DRIVER_WINDOW names.
# Round 6 is the consolidation round VERDICT r5 called for: 91 registered
# queries had never had a driver row at end of round 5, so this window is
# (a) the entries whose implementation or oracle changed THIS round and
# must (re-)verify — embedding_quantize_int8 (r5's only driver error:
# nested array<int> output column now ships as a CSV string),
# rfm_segmentation + quality_quartile_stats (unpartitioned-NTILE
# scale-killers re-planned to broadcast-boundary bucketing),
# streaming_interest_fold + streaming_recommend_emit (rows-only ->
# real DuckDB list_reduce oracles), covisitation_matrix (oracle
# epoch-rounding fix, ADVICE r5) and bigram_logprob_score (oracle
# back-off-constant ULP fix, ADVICE r5 — both also never-checked);
# (b) the three entries whose co-occurrence base re-planned in round 5
# (item_cooccurrence_topk, item_cooccurrence_jaccard,
# graph_triangle_count); (c) als_recommend_topk (ceded from r5's
# 51-for-50 crunch; oldest evidence in the SURVEY §2 table, r2); and
# (d) the 39 OLDEST never-checked names, oldest additions first.
# Expensive streaming entries sit at the window's tail so a failure
# cannot starve the cheap checks; the full-ALS-fit entry goes last.
#
# r7 fill — EXACT remainder (counted against CORRECTNESS_r01..r05 + this
# window; exactness asserted by
# tests/test_plans.py::test_next_window_plan_comment_is_exact): the 50
# never-checked names left after this window, in priority order
# (oldest additions first — they are the entire r7 window):
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
# kmv_intersection_estimate, class_tfidf_top_terms.
# 50 names for 50 slots: with zero new registrations the never-checked
# backlog is fully burned by end of round 7; re-confirmations of old
# greens resume in round 8 (oldest green row first).
DRIVER_WINDOW = 50

DRIVER_CHECK_FIRST: tuple[str, ...] = (
    # -- changed this round: must (re-)verify ------------------------------
    "embedding_quantize_int8",  # r5 driver ERROR: q now ships as q_csv
    "rfm_segmentation",  # NTILE -> broadcast exact-percentile bucketing
    "quality_quartile_stats",  # NTILE -> histogram-boundary bucketing
    "covisitation_matrix",  # oracle: floor(epoch(ts)) truncation fix
    "bigram_logprob_score",  # oracle: exact 1-lambda double on both sides
    # -- re-planned in round 5, green row predates the re-plan -------------
    "item_cooccurrence_topk",
    "item_cooccurrence_jaccard",
    "graph_triangle_count",
    # -- never driver-checked: oldest additions first ----------------------
    "ohlc_resample",
    "scd2_priority_history",
    "gap_fill_linear",
    "ewma_by_type",
    "interval_overlap_join",
    "auc_rank_sum",
    "calibration_bins",
    "data_profile_summary",
    "incremental_agg_merge",
    "gdpr_erasure_audit",
    "mad_outlier_counts",
    "correlation_matrix",
    "temporal_holdout_split",
    "eval_candidate_sampling",
    "bucketed_ratings_join",
    "merge_upsert_snapshot",
    "image_resize_stats",
    "ivf_pq_topk",
    "nearest_centroid_classify",
    "boolean_retrieval_and",
    "hll_distinct_rollup",
    "approx_topk_parts",
    "hll_sliding_distinct",
    "pagerank_bipartite",
    "random_walk_training_paths",
    "lpa_communities",
    "kcore_membership",
    "arrow_vector_norms",
    "two_phase_topk",
    "next_item_training_pairs",
    "ann_ivf_multiprobe_topk",
    "mixture_rebalance_weights",
    "rank_normalize_features",
    "referential_integrity_audit",
    "bloom_semi_join_prune",
    # -- streaming tail: micro-batch loops are the expensive checks, so a
    # -- failure here cannot starve the cheap ones -------------------------
    "streaming_socket_parse_records",  # S4 live loopback socket (never checked)
    "streaming_hll_distinct",
    "streaming_approx_topk",
    "streaming_upsert_merge",
    "streaming_interest_fold",  # new list_reduce oracle this round
    "streaming_recommend_emit",  # new batch-twin oracle this round
    # -- full ALS fit last (ceded from r5; oldest §2 evidence, r2) ---------
    "als_recommend_topk",
)

# Expensive, many-times-verified entries parked at the very end of the
# registration order (all r4-green ALS fits; rows-only by design).
DRIVER_CHECK_LAST: tuple[str, ...] = (
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

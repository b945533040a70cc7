"""Query registry: name -> (DataFrame builder, DuckDB oracle SQL).

Every operator in SURVEY.md §2 registers here.  The driver contract
(__spark_entry__.py) is a thin view over this registry:

  - ``fn(spark, sf_dir)`` builds the Spark DataFrame for the operator.
  - ``oracle`` is the equivalent ANSI SQL DuckDB runs on the same parquet
    views; ``None`` marks a non-SQL-expressible operator (rows-only check).

Column names are aliased identically on both sides; floating aggregates go
through exact decimal arithmetic (functions/exact.py) so value hashes are
order-insensitive-deterministic across engines.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]
    tier: str  # "A" reference-derived, "Q" derived relational surface, "B" north-star
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, *, oracle: Optional[str] = None, tier: str = "A", doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name, fn, oracle, tier, doc or (fn.__doc__ or "").strip())
        return fn

    return deco


_LOADED = False

# The driver's correctness gate checks the first 50 entries of ``queries()``
# in registration order.  With 141+ registered queries, ordering decides
# which get a driver row each round.  Rounds 1+2 proved 94 green / 1 red /
# 3 rows-only (CORRECTNESS_r01/r02.json).  The round-3 window holds, per
# VERDICT.md's mandate, EVERY query that has never had a driver row:
#   - embedding_quantize: r2 red (driver canonicalizer crash on an
#     ArrayType column) — reshaped long-form via posexplode, re-proved here;
#   - pivot_wide: displaced from the window in r1 (ordering) and r2
#     (pipeline_user_activity) — the only Q-surface query with no row;
#   - the 42 remaining parity*-only queries (all judge-re-verified 43/43
#     at sf0.01 via tools/parity.py, but the driver gate is the bar);
#   - round-3 additions fill the remaining slots.
# After this round every registered query has had a driver verdict.
# array_advanced_funcs / map_advanced_funcs / text_inverted_index were
# reshaped to atomic output columns (same canonicalizer hazard as
# embedding_quantize, caught pre-emptively by
# tests/test_registry.py::test_oracled_queries_emit_atomic_columns_only).
# Queries proven green by a prior round fall past position 50 safely.
DRIVER_PRIORITY = [
    # red in r2 — fixed (long-form output), re-prove first
    "embedding_quantize",
    # twice-displaced Q17 member
    "pivot_wide",
    # warehouse-analytics tier (added mid-r2, never driver-checked)
    "tpch_q5_local_supplier",
    "events_retention_cohort",
    "agg_histogram_fixed_width",
    "window_topk_per_group",
    "dedup_source_priority",
    "events_transition_counts",
    "events_anomaly_mad",
    "dedup_incremental_batch",
    "stream_topk_trending",
    "join_bloom_prefilter",
    "events_funnel_rates",
    "dedup_cluster_cc_star",
    "window_value_functions",
    "array_advanced_funcs",
    "map_advanced_funcs",
    "agg_mode_per_group",
    "string_fuzzy_levenshtein",
    "join_asof_forward",
    "agg_corr_exact",
    "agg_approx_percentile",
    # scd2 / cdc / storage tier
    "dim_scd2_point_in_time",
    "cdc_apply_changes",
    "multimodal_resize",
    "storage_zorder_cluster",
    "storage_dpp_join",
    "storage_bucketed_join",
    "stream_interval_join_outer",
    # similarity / sketch tier (rows-only by construction where noted)
    "sim_ann_lsh",
    "sim_ann_ivf",
    "embedding_centroid_per_label",
    "sim_rerank_mmr",
    "hybrid_search_rrf",
    "agg_hll_mergeable",
    "agg_cms_term_counts",
    # SQL-surface + text tier
    "agg_grouping_sets_explicit",
    "scalar_subquery_correlated",
    "scalar_try_safe",
    "text_collocation_pmi",
    "text_inverted_index",
    "text_chunk_sliding",
    "text_lang_confusion",
    "timeseries_multi_rollup",
    # --- round-3 additions (slots 45-50) ---
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "join_asof_nearest",
    "agg_weighted_median",
    "text_bm25_rank",
    "mix_temperature_sampling",
]

# ROUND-4 ROTATION CANDIDATES (registered in round 3 AFTER the window
# above was frozen; every one passes tools/parity.py at sf0.001+sf0.01
# AND the 7-way partitioning re-check, but has no driver row yet.  55
# candidates for 50 slots — rotate the 5 overflow (suggest: the two
# rows-only entries agg_kmv_distinct / quantile_bucket_approx plus
# three single-row TPC-H scalars, all already value- or bound-checked
# by the local harness) into round 5):
#   tpch.py (17): tpch_q2_min_cost_supplier tpch_q4_priority_check
#     tpch_q6_forecast_revenue tpch_q7_volume_shipping tpch_q8_market_share
#     tpch_q9_product_profit tpch_q10_returned_items tpch_q11_important_parts
#     tpch_q12_late_lines tpch_q13_customer_distribution tpch_q14_promo_revenue
#     tpch_q15_top_supplier tpch_q16_supplier_count tpch_q17_small_qty_revenue
#     tpch_q19_disjunctive_filter tpch_q20_promotion_suppliers
#     tpch_q22_dormant_customers
#   mlprep.py (8): profile_table_stats dq_expectation_checks
#     feature_scale_standard feature_onehot_encode feature_decay_rolling
#     sample_reservoir_hash privacy_k_anonymity graph_pagerank_trade
#   advanced.py (6): skyline_pareto_frontier agg_linear_regression
#     events_attribution_last_touch quantile_bucket_equidepth
#     agg_gini_concentration join_theta_band
#   behavior.py (7): events_path_topk market_basket_pairs
#     stream_late_data_accounting text_containment_dedup
#     events_sequence_match agg_share_of_parent orders_interpurchase_gaps
#   warehouse.py (6): dim_date_generate orders_rfm_segmentation
#     orders_abc_classification pipeline_customer_features
#     orders_open_backlog_daily lineitem_yoy_growth
#   timeseries.py (2): events_active_users_rolling
#     timeseries_seasonal_decompose
#   advanced.py (+2): hierarchy_flatten_paths quantile_bucket_approx (rows-only)
#   behavior.py (+5): events_ab_test_zscore events_burst_detection
#     events_user_entropy agg_bitwise_flags events_survival_curve
#   udfs.py: udaf_grouped_agg   sketches.py: agg_kmv_distinct (rows-only)
#
# ROUND-5 ROTATION CANDIDATES (late round-3 additions, same contract —
# local parity green at sf0.001+sf0.01, no driver row yet; 17 queries):
#   mlprep.py (3): agg_benford_first_digit feature_target_encode
#     privacy_l_diversity
#   behavior.py (2): events_funnel_windowed events_cohort_ltv
#   timeseries.py (4): timeseries_autocorrelation
#     timeseries_cusum_changepoint timeseries_rolling_median
#     events_stickiness_weekly
#   warehouse.py (1): orders_active_episodes
#   text.py (2): text_lexical_diversity text_zipf_rank_fit
#   storage_io.py (1): storage_gdpr_delete
#   graph.py (2): graph_triangle_count graph_bfs_distance
#   multimodal.py (1): multimodal_phash_dedup (rows-only; banding
#     completeness pinned in tests)
#   similarity.py (1): sim_ann_pq (rows-only; recall pinned in tests)
#   warehouse.py (+1): lineitem_otif_rate
#   training.py (+1): split_group_aware
#   mlprep.py (+1): feature_trailing_windows
#   advanced.py (+1): agg_theil_inequality
#   merge.py (+1): dim_scd2_apply_changes (oracle = full rebuild)
#   sketches.py (+1): agg_hll_intersection (rows-only; error in BOUNDS)
#   mlprep.py (+2): agg_mutual_information feature_woe_iv
#   behavior.py (+1): market_basket_lift
#   multimodal.py (+1): multimodal_dedup_exact
#   text.py (+1): text_keyphrase_topk
#   graph.py (+1): graph_jaccard_link_prediction
#   advanced.py (+2): agg_ks_test_bucketed agg_winsorized_mean
#   behavior.py (+1): events_funnel_any_order
#   storage_io.py (+1): io_csv_malformed_quarantine (VALUES oracle)
#   extras.py (+2): join_asof_tolerance window_running_distinct
#   storage_io.py (+1): storage_time_travel (operators/txlog.py)
#   storage_io.py (+1): storage_stats_pruned_read (manifest skipping)
#   multimodal.py (+1): pipeline_media_prepare (capstone composite)
#   warehouse.py (+2): supplier_concentration_hhi orders_repeat_purchase_rate
#   text.py (+1): text_unigram_logprob
#   curation.py (+1): pipeline_corpus_health
#   udfs.py (+1): udf_cogrouped_map (cogroup applyInPandas surface)
#   relational.py (+1): stat_crosstab_segments (df.stat surface)
#   warehouse.py (+2): pipeline_churn_training_set orders_backlog_aging
#   behavior.py (+2): events_impact_diff_in_diff events_dow_hour_heatmap
#   warehouse.py (+1): nation_trade_balance
#   advanced.py (+1): join_spatial_grid
#   streaming_batch.py (+1): stream_static_enrich (readStream twin tested)
#   mlprep.py (+1): dq_schema_contract (VALUES oracle)
#   behavior.py (+1): events_bounce_rate
#   behavior.py (+1): events_new_vs_returning
#   warehouse.py (+1): orders_lines_per_order_hist


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration), returned with
    DRIVER_PRIORITY entries first so they land inside the driver's window."""
    global _LOADED
    if not _LOADED:
        from ub_etl_spark.queries import (  # noqa: F401
            advanced,
            analytics,
            behavior,
            curation,
            dedup,
            extras,
            flagship,
            graph,
            manifest,
            merge,
            mlprep,
            multimodal,
            nested,
            pipeline,
            relational,
            similarity,
            sketches,
            sql_surface,
            storage_io,
            streaming_batch,
            text,
            timeseries,
            tpch,
            training,
            udfs,
            udtf_ops,
            warehouse,
        )

        _LOADED = True
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered

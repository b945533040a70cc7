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
# in registration order, so ordering decides which queries get a driver row
# each round.  Registry is FROZEN at 257 queries (round-3 verdict task 4)
# until the verdict backlog clears; rounds now rotate evidence, not growth.
#
# ROUND-4 WINDOW (this list): the three r03 hash-fails first — root cause
# was DuckDB HUGEINT (SUM(integer)) outputs landing in the driver's pandas
# canonicalizer as float64 vs Spark's int64; fixed by CAST(.. AS BIGINT)
# and pinned by tests/test_schema_audit.py — then the 15 other queries the
# same sweep re-oracled (changed SQL ⇒ they need driver rows most), then
# 32 never-checked rotation candidates, hazard-prone (division/ln/sqrt
# outputs) first.  All 50 pass tools/parity.py at sf0.001+sf0.01 and the
# cross-engine schema audit.
DRIVER_PRIORITY = [
    # r03 reds, re-proof (HUGEINT root cause fixed)
    "events_anomaly_mad",
    "events_funnel_rates",
    "agg_weighted_median",
    # sweep-touched in round 4 (oracle text changed: CAST .. AS BIGINT)
    "agg_ks_test_bucketed",
    "stream_late_data_accounting",
    "events_sequence_match",
    "orders_interpurchase_gaps",
    "events_ab_test_zscore",
    "agg_bitwise_flags",
    "pipeline_corpus_health",
    "window_running_distinct",
    "dq_expectation_checks",
    "agg_mutual_information",
    "stat_crosstab_segments",
    "events_stickiness_weekly",
    "tpch_q12_late_lines",
    "orders_open_backlog_daily",
    "orders_active_episodes",
    # never-checked rotation candidates (hazard-prone first)
    "events_user_entropy",
    "graph_pagerank_trade",
    "feature_scale_standard",
    "agg_linear_regression",
    "agg_gini_concentration",
    "join_theta_band",
    "udaf_grouped_agg",
    "market_basket_pairs",
    "agg_share_of_parent",
    "lineitem_yoy_growth",
    "timeseries_seasonal_decompose",
    "events_burst_detection",
    "quantile_bucket_equidepth",
    "hierarchy_flatten_paths",
    "events_path_topk",
    "text_containment_dedup",
    "events_active_users_rolling",
    "profile_table_stats",
    "feature_onehot_encode",
    "feature_decay_rolling",
    "sample_reservoir_hash",
    "privacy_k_anonymity",
    "orders_rfm_segmentation",
    "orders_abc_classification",
    "pipeline_customer_features",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q22_dormant_customers",
]

# ROUND-5 ROTATION CANDIDATES (the 63 remaining queries with no driver row;
# all parity-green locally at sf0.001+sf0.01 and schema-audit clean.  50 fit
# the round-5 window; the ~13 single-row TPC-H scalars / rows-only sketches
# at the end of this list carry the least driver-row information and absorb
# the round-6 residue):
#   behavior.py: events_survival_curve events_funnel_windowed
#     events_cohort_ltv market_basket_lift events_funnel_any_order
#     events_impact_diff_in_diff events_dow_hour_heatmap events_bounce_rate
#     events_new_vs_returning
#   advanced.py: skyline_pareto_frontier events_attribution_last_touch
#     agg_theil_inequality agg_winsorized_mean join_spatial_grid
#     quantile_bucket_approx (rows-only)
#   graph.py: graph_triangle_count graph_bfs_distance
#     graph_jaccard_link_prediction
#   mlprep.py: agg_benford_first_digit feature_target_encode
#     privacy_l_diversity feature_trailing_windows feature_woe_iv
#     dq_schema_contract
#   multimodal.py: multimodal_phash_dedup (rows-only) multimodal_dedup_exact
#     pipeline_media_prepare
#   similarity/sketches: sim_ann_pq (rows-only) agg_kmv_distinct (rows-only)
#     agg_hll_intersection (rows-only)
#   storage_io.py: storage_gdpr_delete io_csv_malformed_quarantine
#     storage_time_travel storage_stats_pruned_read
#   streaming_batch.py: stream_static_enrich
#   text.py: text_lexical_diversity text_zipf_rank_fit text_keyphrase_topk
#     text_unigram_logprob
#   timeseries.py: timeseries_autocorrelation timeseries_cusum_changepoint
#     timeseries_rolling_median
#   merge.py: dim_scd2_apply_changes   extras.py: join_asof_tolerance
#   training.py: split_group_aware   udfs.py: udf_cogrouped_map
#   warehouse.py: dim_date_generate lineitem_otif_rate
#     supplier_concentration_hhi orders_repeat_purchase_rate
#     pipeline_churn_training_set orders_backlog_aging nation_trade_balance
#     orders_lines_per_order_hist
#   tpch.py (scalar tail): tpch_q4_priority_check tpch_q6_forecast_revenue
#     tpch_q13_customer_distribution tpch_q14_promo_revenue
#     tpch_q15_top_supplier tpch_q16_supplier_count
#     tpch_q17_small_qty_revenue tpch_q19_disjunctive_filter
#     tpch_q20_promotion_suppliers


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

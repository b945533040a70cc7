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
# ROUND-5 WINDOW (this list): 50 of the 63 queries that have never had a
# driver verdict (r4 verdict task 1).  All 63 pass tools/parity.py at
# sf0.001+sf0.01, the cross-engine schema audit, and the round-4 judge's
# independent oracle re-run (63/63), so rotation is low-risk and no repeat
# slots are spent — there are zero reds to re-prove.  Hazard-prone outputs
# (division/ln/sqrt-derived values, float-adjacent casts) lead the window.
# The 13 deferred to round 6 carry the least driver-row information: the
# 8 single-row TPC-H scalar aggregates and the 5 rows-only sketch/ANN
# queries (driver runs only a row-count check on those by construction).
DRIVER_PRIORITY = [
    # never-checked: value-hazard-prone first (ratios, ln, sqrt, doubles)
    "agg_theil_inequality",
    "agg_winsorized_mean",
    "timeseries_autocorrelation",
    "timeseries_cusum_changepoint",
    "timeseries_rolling_median",
    "agg_benford_first_digit",
    "feature_target_encode",
    "feature_woe_iv",
    "feature_trailing_windows",
    "text_lexical_diversity",
    "text_zipf_rank_fit",
    "text_unigram_logprob",
    "text_keyphrase_topk",
    "events_survival_curve",
    "events_cohort_ltv",
    "events_impact_diff_in_diff",
    "events_bounce_rate",
    "supplier_concentration_hhi",
    "orders_repeat_purchase_rate",
    "lineitem_otif_rate",
    "graph_jaccard_link_prediction",
    "market_basket_lift",
    # never-checked: multi-stage pipelines and stateful merges
    "dim_scd2_apply_changes",
    "pipeline_churn_training_set",
    "pipeline_media_prepare",
    "storage_gdpr_delete",
    "storage_time_travel",
    "storage_stats_pruned_read",
    "io_csv_malformed_quarantine",
    "stream_static_enrich",
    "udf_cogrouped_map",
    "split_group_aware",
    "privacy_l_diversity",
    "dq_schema_contract",
    # never-checked: joins / graph / window shapes
    "join_spatial_grid",
    "join_asof_tolerance",
    "graph_triangle_count",
    "graph_bfs_distance",
    "skyline_pareto_frontier",
    "events_attribution_last_touch",
    "events_funnel_windowed",
    "events_funnel_any_order",
    "events_dow_hour_heatmap",
    "events_new_vs_returning",
    "orders_backlog_aging",
    "orders_lines_per_order_hist",
    "nation_trade_balance",
    "multimodal_dedup_exact",
    "dim_date_generate",
    "tpch_q15_top_supplier",
]

# ROUND-6 RESIDUE (the 13 never-checked queries deferred from this window;
# all parity-green at sf0.001+sf0.01 — single-row TPC-H scalars and
# rows-only sketches, the weakest driver-row information):
#   tpch.py scalar tail: tpch_q4_priority_check tpch_q6_forecast_revenue
#     tpch_q13_customer_distribution tpch_q14_promo_revenue
#     tpch_q16_supplier_count tpch_q17_small_qty_revenue
#     tpch_q19_disjunctive_filter tpch_q20_promotion_suppliers
#   rows-only (driver records row-count only by construction):
#     quantile_bucket_approx multimodal_phash_dedup sim_ann_pq
#     agg_kmv_distinct agg_hll_intersection


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

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
# each round.
#
# REGISTRY UNFREEZE (r7 verdict task 1): the freeze (r3 verdict task 4,
# held at 257 through r7 for evidence depth) ends this round with exactly
# the two named growth candidates — the global-order scale levers now
# registered as driver-hash-checked queries with oracles by construction
# (their outputs equal the existing registered forms'):
#   quantile_bucket_equidepth_2phase  (ntile_two_phase,
#       operators/selection.py — 4.9x@100x vs the windowed 111x@100x)
#   orders_active_episodes_arrow      (coalesce_intervals_arrow,
#       operators/intervals.py — 15.3x@100x vs the windowed 112x@100x)
# Registry: 259.  Further growth stays gated on the same principle that
# motivated the freeze: a new query must carry either a new operator
# family or a scale lever, never a near-duplicate plan shape, because
# every added query dilutes the 50-slot evidence window.
#
# REGISTRY DECISION (r10, per the r8 verdict task 5 ask): HOLD at 259.
# The one measured registration candidate is session_window_arrow
# (coalesce_intervals_arrow over [ts, ts+30min] event intervals — 6.2x
# @100x vs session_window_keyed's 19.1x in SCALING.md, equality with
# stream_session_window pinned row-for-row in tests/test_intervals.py).
# It is NOT registered this round because the r10 window has zero slack:
# all 50 slots go to the staleness backlog (10 r3 + 40 r4 below), and a
# rule-(a) registration would claim two of them for a plan shape whose
# scale behavior is already certified by its SCALING cell and pinned
# equality test.  Revisit when the oldest-evidence age drops back under
# 3 rounds and a window has free slots.
#
# ROTATION POLICY (r7 verdict task 6 — the arithmetic for r9+): with 259
# registered queries and a 50-slot window, full staleness rotation takes
# ceil(259/50) = 6 rounds, so steady-state evidence age is bounded at 6
# rounds IF every window spends its slots on the globally stalest
# queries.  Standing rules:
#   (a) NEWLY registered or REWORKED queries get TWO consecutive windows
#       (registration/rework round + the next), then join the staleness
#       rotation — changed code never coasts on one lucky pass;
#   (b) all remaining slots go to the stalest evidence, oldest driver
#       round first; ties broken toward modules this round's perf work
#       touched (their plans changed most recently);
#   (c) the deferred residue is NAMED here each round so the next window
#       is decidable without re-deriving the evidence map.
#
# ROUND-10 WINDOW (this list): the round-9 window never rotated (r9 landed
# zero builder commits), so this executes the rotation two verdicts have
# named.  (a) no rule-a slots: the two lever queries completed their two
# consecutive windows at r8+r9 (both hash-green both rounds) and join the
# staleness rotation; sim_ann_pq's r10 work is re-MEASUREMENT only (no
# code change), so it claims no rule-a slot.  (b) the 10 r3-evidence
# Catalyst-surface single-shapes, now four rounds stale and judge-parity
# pre-verified three times (r8, r9 judge x2: 10/10 each); (c) 40 of the 50
# r4-evidence queries, oldest-first.  The 10 r4 queries deferred to ROUND
# 11 (rule c, named residue): the 8 TPC-H multi-join shapes whose plan
# family was just re-evidenced at r9 via q1/q3/q5/q18/q21 —
# tpch_q2_min_cost_supplier tpch_q7_volume_shipping tpch_q8_market_share
# tpch_q9_product_profit tpch_q10_returned_items tpch_q11_important_parts
# tpch_q12_late_lines tpch_q22_dormant_customers — plus two stable
# single-aggregate shapes: agg_bitwise_flags stat_crosstab_segments.
# Projected r11 window: those 10 + 40 oldest-r5 refreshes.
DRIVER_PRIORITY = [
    # --- rule (b): the 10 r3-evidence Catalyst-surface queries (4 rounds stale)
    "agg_corr_exact",
    "agg_grouping_sets_explicit",
    "agg_mode_per_group",
    "array_advanced_funcs",
    "map_advanced_funcs",
    "pivot_wide",
    "scalar_subquery_correlated",
    "scalar_try_safe",
    "string_fuzzy_levenshtein",
    "window_value_functions",
    # --- rule (b): 40 of the 50 r4-evidence queries (10 named above defer to r11)
    "agg_gini_concentration",
    "agg_ks_test_bucketed",
    "agg_linear_regression",
    "agg_mutual_information",
    "agg_share_of_parent",
    "agg_weighted_median",
    "dq_expectation_checks",
    "events_ab_test_zscore",
    "events_active_users_rolling",
    "events_anomaly_mad",
    "events_burst_detection",
    "events_funnel_rates",
    "events_path_topk",
    "events_sequence_match",
    "events_stickiness_weekly",
    "events_user_entropy",
    "feature_decay_rolling",
    "feature_onehot_encode",
    "feature_scale_standard",
    "graph_pagerank_trade",
    "hierarchy_flatten_paths",
    "join_theta_band",
    "lineitem_yoy_growth",
    "market_basket_pairs",
    "orders_abc_classification",
    "orders_active_episodes",
    "orders_interpurchase_gaps",
    "orders_open_backlog_daily",
    "orders_rfm_segmentation",
    "pipeline_corpus_health",
    "pipeline_customer_features",
    "privacy_k_anonymity",
    "profile_table_stats",
    "quantile_bucket_equidepth",
    "sample_reservoir_hash",
    "stream_late_data_accounting",
    "text_containment_dedup",
    "timeseries_seasonal_decompose",
    "udaf_grouped_agg",
    "window_running_distinct",
]

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

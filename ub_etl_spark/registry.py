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
# REGISTRY DECISION (r11, executing the r10 verdict task 5): REGISTER
# session_window_arrow — 259 -> 260.  It carries a scale lever (the
# Arrow gaps-and-islands sessionizer at 6.2x@100x vs the keyed windowed
# form's 19.1x, SCALING.md session_window_arrow cell), satisfying the
# growth principle above, and its oracle is by construction: row-for-row
# equality with stream_session_window, pinned in tests/test_intervals.py
# and now ALSO registered with the same DuckDB oracle SQL so the driver
# hash-checks it independently.  Its rule-(a) two consecutive windows
# are r12+r13 (see the r11 window note below — r11's 50 slots are all
# owed to the staleness backlog the r10 verdict names byte-for-byte).
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
# ROUND-10 WINDOW (rotated; see git history for the list): 10 r3-evidence
# Catalyst-surface single-shapes + 40 oldest-r4 — came back 50/50 green
# (CORRECTNESS_r10), oldest evidence then r4.
#
# ROUND-11 WINDOW (this list — r10 verdict task 1, byte-for-byte the set
# `python tools/evidence_map.py --window 50` prints): (a) no rule-a
# slots consumed by the window — session_window_arrow registers THIS
# round (see the r11 registry decision above) but its two consecutive
# windows are scheduled r12+r13: rule (a)'s purpose is two consecutive
# windows of evidence for changed code, and its first window starts the
# round after registration when the registration round's window has
# zero slack, which r11's does (all 50 slots owed to the staleness
# backlog the r10 verdict names).  evidence_map ranks a never-checked
# query first, so the r12 window picks it up automatically.  (b) the 10
# r4-evidence queries deferred from r10 (8 TPC-H multi-join shapes + 2
# single-aggregate shapes); (c) 40 of the 50 r5-evidence queries,
# oldest-first alphabetical.  The 10 r5 queries deferred to ROUND 12
# (rule c, named residue): supplier_concentration_hhi text_keyphrase_topk
# text_lexical_diversity text_unigram_logprob text_zipf_rank_fit
# timeseries_autocorrelation timeseries_cusum_changepoint
# timeseries_rolling_median tpch_q15_top_supplier udf_cogrouped_map.
# Projected r12 window: session_window_arrow (rule a, window 1 of 2) +
# market_basket_pairs (rule a: REWORKED r11 — pair counts now one
# vectorized Arrow pass, operators/selection.basket_pair_counts_arrow;
# equality + carry + fallback pinned in tests/test_behavior.py) +
# text_containment_dedup (rule a: REWORKED r11 — xxhash64 gram keys +
# persisted gram frame; its r10 evidence predates the plan change, and
# the r11 window had no slack left; sf0.001+sf0.01 parity re-run green
# at rework time) + those 10 r5 + 37 oldest-r6 refreshes.  The other
# two r11-reworked queries (graph_jaccard_link_prediction,
# graph_triangle_count) get their first post-rework window THIS round
# — both sit in the rule-(c) list below.
DRIVER_PRIORITY = [
    # --- rule (b): the 10 r4-evidence queries deferred from the r10 window
    "agg_bitwise_flags",
    "stat_crosstab_segments",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_lines",
    "tpch_q22_dormant_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    # --- rule (c): 40 of the 50 r5-evidence queries (10 named above defer to r12)
    "agg_benford_first_digit",
    "agg_theil_inequality",
    "agg_winsorized_mean",
    "dim_date_generate",
    "dim_scd2_apply_changes",
    "dq_schema_contract",
    "events_attribution_last_touch",
    "events_bounce_rate",
    "events_cohort_ltv",
    "events_dow_hour_heatmap",
    "events_funnel_any_order",
    "events_funnel_windowed",
    "events_impact_diff_in_diff",
    "events_new_vs_returning",
    "events_survival_curve",
    "feature_target_encode",
    "feature_trailing_windows",
    "feature_woe_iv",
    "graph_bfs_distance",
    "graph_jaccard_link_prediction",
    "graph_triangle_count",
    "io_csv_malformed_quarantine",
    "join_asof_tolerance",
    "join_spatial_grid",
    "lineitem_otif_rate",
    "market_basket_lift",
    "multimodal_dedup_exact",
    "nation_trade_balance",
    "orders_backlog_aging",
    "orders_lines_per_order_hist",
    "orders_repeat_purchase_rate",
    "pipeline_churn_training_set",
    "pipeline_media_prepare",
    "privacy_l_diversity",
    "skyline_pareto_frontier",
    "split_group_aware",
    "storage_gdpr_delete",
    "storage_stats_pruned_read",
    "storage_time_travel",
    "stream_static_enrich",
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

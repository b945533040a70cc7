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
# REGISTRY DECISION (r12, executing the r11 verdict task 2): REGISTER
# text_containment_banded — 260 -> 261.  It IS a scale lever (the
# banded corpus-scale twin of text_containment_dedup: minhash-banded
# candidate generation + exact containment verify, 8.3x@10x and
# absolutely faster than the exact form at both measured scales —
# SCALING.md containment_banded cell), satisfying the growth principle.
# Rows-only by construction (xxhash64 band seeds have no portable
# oracle; recall is probabilistic): the quantitative claim is recall
# 1.0 vs the registered exact form in BOUNDS.json plus the pinned
# skew-limitation fixtures in tests/test_behavior.py.  Its rule-(a)
# two consecutive windows are r13+r14 (the r12 window was rotated and
# fully owed before registration).
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
# ROUND-11 WINDOW (rotated; see git history for the list): 10 r4-evidence
# TPC-H/aggregate deferrals + 40 oldest-r5 — came back 50/50 green
# (CORRECTNESS_r11), oldest evidence then r5.
#
# ROUND-12 WINDOW (rotated; see git history for the list — r11 verdict
# task 1): 3 rule-a (session_window_arrow w1/2 + the two r11-reworked
# plans) + 10 r5 deferrals + 37 oldest-r6 — came back 50/50 green
# (CORRECTNESS_r12, key set verified by the r12 judge), oldest evidence
# then r6 (the 12 named deferrals below).
#
# ROUND-13 WINDOW (rotated; see git history for the list — r12 verdict
# task 1, exactly the projection the r12 registry note named): 5 rule-a
# (session_window_arrow w2/2 + text_containment_banded w1/2 + the three
# r12-changed plans) + 12 r6 deferrals + alphabetically-first 33
# oldest-r7 — came back 50/50 green (CORRECTNESS_r13, key set verified
# by the r13 judge), oldest evidence then r7 (the 17 named deferrals
# below).
#
# ROUND-14 WINDOW (rotated; see git history for the list — r13 verdict
# task 1, exactly the projection the r13 registry note named): 1 rule-a
# (text_containment_banded w2/2) + the 17 r7 deferrals + the
# alphabetically-first 32 oldest-r9 — came back 50/50 green
# (CORRECTNESS_r14, key set verified programmatically by the r14 judge),
# oldest evidence then r9 (the 18 named deferrals below).
#
# REGISTRY DECISION (r15, executing the r14 verdict task 5): REGISTER
# dedup_substring_span — 261 -> 262.  It carries a NEW operator family
# (exact-substring span dedup, Lee et al. 2022 — the standard
# LLM-pretraining dedup the surface lacked; cross-document repeated
# k-token span detection with interval-union span merge), satisfying the
# growth principle.  Stronger than the rows-only+BOUNDS shape the verdict
# anticipated: the two-pass plan (xxhash64 candidate filter -> string
# verify, operators/dedup.substring_spans) is EXACT by construction, so
# it registers with a full DuckDB oracle (group the k-gram strings
# directly) and the driver hash-checks values; the brute-force twin is
# additionally pinned in tests/test_dedup.py.  Its rule-(a) two
# consecutive windows are r15+r16.
#
# ROUND-15 WINDOW (this list — r14 verdict task 1 plus the rule-a slots
# r15 accrues): (a) THREE rule-a slots: dedup_substring_span (window 1
# of 2, registered this round), orders_active_episodes (REWORKED this
# round: the sf1 value-parity notch caught the cumulative-sum window's
# tie ambiguity under exact duplicate intervals — both windows now
# totalize on (iv_start, iv_end, o_orderkey), and the shared
# _EPISODES_ORACLE repeats the same total order; see the query
# docstring), and orders_active_episodes_arrow (its plan is unchanged
# but it registers against that same rewritten oracle, so its evidence
# must refresh under the new SQL).  (b) the 18 r9-evidence deferrals
# named in the r14 residue note.  (c) the alphabetically-first 29 of
# the 48 oldest-r10 refreshes (tools/evidence_map.py;
# orders_active_episodes counts under (a)).  The 18 r10 queries
# deferred to ROUND 16 (rule c, named residue):
# orders_interpurchase_gaps orders_open_backlog_daily
# orders_rfm_segmentation pipeline_corpus_health
# pipeline_customer_features pivot_wide privacy_k_anonymity
# profile_table_stats quantile_bucket_equidepth sample_reservoir_hash
# scalar_subquery_correlated scalar_try_safe stream_late_data_accounting
# string_fuzzy_levenshtein timeseries_seasonal_decompose
# udaf_grouped_agg window_running_distinct window_value_functions.
# Projected r16 window: dedup_substring_span, orders_active_episodes,
# orders_active_episodes_arrow (rule-a w2/2) + any plans changed in r16
# + those 18 r10 + the oldest-r11 refreshes.
DRIVER_PRIORITY = [
    # --- rule (a): registered/reworked r15, window 1 of 2 each
    "dedup_substring_span",
    "orders_active_episodes",
    "orders_active_episodes_arrow",
    # --- rule (b): the 18 r9-evidence deferrals named in the r14 residue
    "stream_interval_join_outer",
    "stream_topk_trending",
    "text_bm25_rank",
    "text_chunk_sliding",
    "text_collocation_pmi",
    "text_fingerprint",
    "text_inverted_index",
    "text_lang_confusion",
    "text_lang_id",
    "text_quality_score",
    "timeseries_multi_rollup",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "tpch_q5_local_supplier",
    "udf_grouped_map",
    "udf_surface",
    "udtf_tokenize",
    "window_topk_per_group",
    # --- rule (c): alphabetically-first 29 oldest-r10 (18 named defer to
    # r16; orders_active_episodes counts under rule (a) above)
    "agg_corr_exact",
    "agg_gini_concentration",
    "agg_grouping_sets_explicit",
    "agg_ks_test_bucketed",
    "agg_linear_regression",
    "agg_mode_per_group",
    "agg_mutual_information",
    "agg_share_of_parent",
    "agg_weighted_median",
    "array_advanced_funcs",
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
    "map_advanced_funcs",
    "orders_abc_classification",
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

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
# ROUND-13 WINDOW (this list — r12 verdict task 1, exactly the
# projection the r12 registry note named): (a) five rule-a slots:
# session_window_arrow (window 2 of 2, closing its registration
# obligation) + text_containment_banded (window 1 of 2 — REGISTERED
# r12, FIRST-EVER driver check; window 2 of 2 is r14) + rule-a
# refreshes for the three plans that changed in r12 —
# text_containment_dedup (2x64-bit composite gram key),
# market_basket_pairs and market_basket_lift (shared Arrow kernel's
# flush check moved inside the per-length-group loop).  (b) the 12
# r6-evidence deferrals named in the r12 residue note (7 TPC-H shapes +
# upsert_merge + the 4 window_* queries).  (c) the alphabetically-first
# 33 of the 50 oldest-r7 refreshes (tools/evidence_map.py --window 62;
# the alphabetical order already includes the similarity module this
# round's perf work touches — sim_ann_pq/sim_ann_lsh/sim_knn_exact).
# The 17 r7 queries deferred to ROUND 14 (rule c, named residue):
# stream_dedup_upsert stream_interval_join stream_session_native
# stream_session_window stream_sliding_agg stream_tumbling_agg
# table_diff_reconcile text_ngram_vocab text_pii_redact
# text_quality_gopher text_tfidf text_tokenize_stats timeseries_gapfill
# tpch_q1_pricing tpch_q3_priority udf_map_in_pandas unpivot_stack.
# Projected r14 window: text_containment_banded (rule a, window 2 of 2)
# + any plans changed in r13 + those 17 r7 + the oldest-r9 refreshes.
DRIVER_PRIORITY = [
    # --- rule (a): w2/2 + first-ever check + the three r12-changed plans
    "session_window_arrow",
    "text_containment_banded",
    "text_containment_dedup",
    "market_basket_pairs",
    "market_basket_lift",
    # --- rule (b): the 12 r6-evidence deferrals named in the r12 residue
    "tpch_q14_promo_revenue",
    "tpch_q16_supplier_count",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_filter",
    "tpch_q20_promotion_suppliers",
    "tpch_q4_priority_check",
    "tpch_q6_forecast_revenue",
    "upsert_merge",
    "window_analytic",
    "window_ntile_dist",
    "window_range_frame",
    "window_rank",
    # --- rule (c): alphabetically-first 33 oldest-r7 (17 named defer to r14)
    "agg_approx_distinct",
    "agg_incremental_refresh",
    "agg_skew_salted",
    "contamination_ngram_check",
    "dedup_apply_canonical",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_normalized_exact",
    "dedup_simhash",
    "dim_scd2_history",
    "events_funnel",
    "io_schema_evolution",
    "join_asof",
    "join_interval_overlap",
    "join_range_bucket",
    "join_skew_salted",
    "json_schema_drift",
    "mix_weighted_sources",
    "multimodal_columns",
    "multimodal_decode",
    "multimodal_frame_sample",
    "pack_sequences",
    "pipeline_corpus_prepare",
    "pipeline_course_normalize",
    "pipeline_training_manifest",
    "pipeline_user_activity",
    "sample_stratified_exact",
    "sim_ann_lsh",
    "sim_ann_pq",
    "sim_knn_exact",
    "split_train_val_test",
    "storage_bucketed_merge",
    "storage_compact_small_files",
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

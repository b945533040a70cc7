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
# ROUND-8 WINDOW (this list): (a) the two NEW lever queries (rule a: they
# also claim r9 slots); (b) the 12 r2-stale queries named by the r7
# window comment and verdict task 2 (the r7 judge's independent parity
# run passed all 12); (c) 36 of the 46 r3-evidence queries, oldest-first
# rule b.  The 10 r3 queries deferred to ROUND 9 are the pure
# Catalyst-surface single-shapes whose modules nothing has touched since
# r3: agg_corr_exact agg_grouping_sets_explicit agg_mode_per_group
# array_advanced_funcs map_advanced_funcs pivot_wide
# scalar_subquery_correlated scalar_try_safe string_fuzzy_levenshtein
# window_value_functions.  Projected r9 window: those 10 + the 2 lever
# queries (rule a, second window) + 38 r4-evidence refreshes.
DRIVER_PRIORITY = [
    # --- rule (a): registered this round — the global-order scale levers
    "quantile_bucket_equidepth_2phase",
    "orders_active_episodes_arrow",
    # --- rule (b): the 12 r2-stale queries (deferred from the r7 window)
    "cast_timestamp",
    "cast_types",
    "rest_source_scan",
    "io_multiformat_roundtrip",
    "io_binary_files",
    "storage_partitioned_write",
    "text_lang_id",
    "text_fingerprint",
    "text_quality_score",
    "udf_surface",
    "udf_grouped_map",
    "udtf_tokenize",
    # --- rule (b): 36 of the 46 r3-evidence queries (10 named above defer to r9)
    "agg_approx_percentile",
    "agg_cms_term_counts",
    "agg_histogram_fixed_width",
    "agg_hll_mergeable",
    "cdc_apply_changes",
    "dedup_cluster_cc_star",
    "dedup_incremental_batch",
    "dedup_source_priority",
    "dim_scd2_point_in_time",
    "embedding_centroid_per_label",
    "embedding_quantize",
    "events_retention_cohort",
    "events_transition_counts",
    "hybrid_search_rrf",
    "join_asof_forward",
    "join_asof_nearest",
    "join_bloom_prefilter",
    "mix_temperature_sampling",
    "multimodal_resize",
    "sim_ann_ivf",
    "sim_rerank_mmr",
    "storage_bucketed_join",
    "storage_dpp_join",
    "storage_zorder_cluster",
    "stream_interval_join_outer",
    "stream_topk_trending",
    "text_bm25_rank",
    "text_chunk_sliding",
    "text_collocation_pmi",
    "text_inverted_index",
    "text_lang_confusion",
    "timeseries_multi_rollup",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "tpch_q5_local_supplier",
    "window_topk_per_group",
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

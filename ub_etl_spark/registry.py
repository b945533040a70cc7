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
# each round.  Registry is FROZEN at 257 queries (round-3 verdict task 4);
# rounds rotate evidence, not growth.
#
# ROUND-6 WINDOW (this list): the 13 queries that have never had a driver
# verdict lead (r5 verdict task 1 — all 13 passed the r5 judge's independent
# parity run, so this clears the never-checked backlog to ZERO).  The
# remaining 37 slots refresh the OLDEST evidence (r5 verdict task 2): of the
# 48 queries whose only driver verdict is from round 1 — four rounds stale
# against shared-operator code that perf passes have since touched — the 37
# value-checked ones with the widest operator reach rotate in here.  The 11
# deferred to round 7 (listed below) are the 3 r1 rows-only sketches (the
# driver adds only a row count there) plus the 8 lowest-risk single-shape
# queries; all 11 stay parity-green at every sf in the meantime.
DRIVER_PRIORITY = [
    # --- backlog: never driver-checked (5 rows-only sketch/ANN + 8 TPC-H
    # scalars).  After this round the never-checked set is empty.
    "quantile_bucket_approx",
    "multimodal_phash_dedup",
    "sim_ann_pq",
    "agg_kmv_distinct",
    "agg_hll_intersection",
    "tpch_q4_priority_check",
    "tpch_q6_forecast_revenue",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q16_supplier_count",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_filter",
    "tpch_q20_promotion_suppliers",
    # --- refresh: r1-checked relational/agg/window surface (relational.py,
    # extras.py — both touched by later perf/alias passes)
    "scan_parquet",
    "filter_predicate",
    "join_inner_equi",
    "join_left_outer",
    "join_full_outer",
    "join_semi_anti",
    "join_broadcast",
    "agg_groupby",
    "agg_count_distinct",
    "agg_rollup_cube",
    "agg_cube_grouping",
    "agg_stats_exact",
    "agg_percentile",
    "window_rank",
    "window_analytic",
    "window_range_frame",
    "window_ntile_dist",
    "sort_limit_topk",
    "set_union_distinct",
    "count_running_total",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "scalar_math_case",
    "scalar_json_funcs",
    "array_map_funcs",
    # --- refresh: r1-checked nested family (queries/nested.py)
    "project_struct_access",
    "explode_array_struct",
    "explode_array_scalar",
    "explode_map",
    "filter_null_guard",
    # --- refresh: r1-checked dedup/merge Tier-A (dedup.py, merge.py — both
    # grew new queries since r1)
    "dedup_exact",
    "dedup_fuzzy",
    "dedup_cluster_cc",
    "dedup_get_or_insert",
    "bridge_join",
    "insert_ignore_antijoin",
    "upsert_merge",
]

# ROUND-7 RESIDUE (the 11 queries whose only driver verdict remains r1;
# all parity-green continuously since — rotate these in next round):
#   rows-only by construction (weakest driver-row information):
#     agg_approx_distinct dedup_minhash_lsh dedup_simhash
#   value-checked, least-touched modules since r1:
#     multimodal_columns multimodal_decode multimodal_frame_sample
#     unpivot_stack join_range_bucket join_asof
#     agg_skew_salted join_skew_salted


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

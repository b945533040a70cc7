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
# in registration order.  With 105 registered queries, ordering decides which
# get a driver row each round.  Round 1 checked the first 50 in import order;
# this round's window holds every query with no CORRECTNESS_r01.json row that
# has a value-checkable oracle, plus the two whose implementation changed
# (cast_types: decimal-hash fix; pipeline_course_normalize: 13-table oracle).
# Deferred to round 3 — their driver row would add the least this round:
#   sim_ann_lsh, sim_ann_ivf, agg_hll_mergeable, agg_cms_term_counts,
#   agg_approx_percentile  (no oracle -> rows-only row; recall/error bounds
#   are pinned quantitatively in pytest instead),
#   stream_interval_join_outer (twin of in-window stream_interval_join,
#   same operator + eviction machinery), storage_zorder_cluster (identity
#   under the driver hash; clustering effect pinned in tests/test_storage),
#   sim_rerank_mmr (rows-only; pinned against a python reference in
#   tests/test_similarity.py),
#   and the warehouse-analytics tier added mid-round-2 after the window
#   was already full of never-driver-checked queries (all parity PASS at
#   sf0.01 locally): tpch_q5_local_supplier, events_retention_cohort,
#   agg_histogram_fixed_width, window_topk_per_group,
#   dedup_source_priority, timeseries_multi_rollup,
#   events_transition_counts, events_anomaly_mad,
#   embedding_centroid_per_label, dedup_incremental_batch,
#   stream_topk_trending, storage_dpp_join, multimodal_resize,
#   timeseries_multi_rollup, storage_bucketed_join, dim_scd2_point_in_time,
#   text_collocation_pmi, agg_grouping_sets_explicit,
#   scalar_subquery_correlated, scalar_try_safe, text_inverted_index,
#   join_bloom_prefilter, cdc_apply_changes, window_value_functions,
#   array_advanced_funcs, map_advanced_funcs, text_chunk_sliding,
#   text_lang_confusion, hybrid_search_rrf, dedup_cluster_cc_star,
#   agg_mode_per_group, string_fuzzy_levenshtein, events_funnel_rates,
#   join_asof_forward, agg_corr_exact, and pivot_wide (displaced
#   from this round's window by pipeline_user_activity — its Q17 family
#   holds two green r1 rows, but it still needs its own row).  Rotate
#   these into the round-3 window in place of whatever CORRECTNESS_r02
#   proves green.
# Queries proven green by a prior round fall past position 50 safely.
DRIVER_PRIORITY = [
    # changed since their round-1 row — re-prove under the driver gate
    "cast_types",
    "pipeline_course_normalize",
    # reference entry point 2 end-to-end (new this round; displaces
    # pivot_wide, whose Q17 family already has two green r1 rows)
    "pipeline_user_activity",
    # unchecked in round 1 (registration positions 51-74)
    "cast_timestamp",
    "sim_knn_exact",
    "dedup_embedding_cosine",
    "storage_bucketed_merge",
    "rest_source_scan",
    "storage_partitioned_write",
    "io_multiformat_roundtrip",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup_upsert",
    "stream_session_native",
    "text_tokenize_stats",
    "text_tfidf",
    "text_lang_id",
    "text_quality_score",
    "text_fingerprint",
    "udf_surface",
    "udf_grouped_map",
    "udf_map_in_pandas",
    "udtf_tokenize",
    # new this round (training-pipeline tier)
    "split_train_val_test",
    "dedup_normalized_exact",
    "text_ngram_vocab",
    "embedding_quantize",
    "dedup_apply_canonical",
    "io_binary_files",
    "pipeline_corpus_prepare",
    "sample_stratified_exact",
    # new this round (curation + flagship tier)
    "text_pii_redact",
    "text_quality_gopher",
    "contamination_ngram_check",
    "pack_sequences",
    "mix_weighted_sources",
    "tpch_q1_pricing",
    "tpch_q3_priority",
    "events_funnel",
    "pipeline_training_manifest",
    "join_interval_overlap",
    "json_schema_drift",
    "dim_scd2_history",
    "io_schema_evolution",
    # new this round (storage / time-series / incremental tier)
    "table_diff_reconcile",
    "agg_incremental_refresh",
    "storage_compact_small_files",
    "stream_interval_join",
    "timeseries_gapfill",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration), returned with
    DRIVER_PRIORITY entries first so they land inside the driver's window."""
    global _LOADED
    if not _LOADED:
        from ub_etl_spark.queries import (  # noqa: F401
            analytics,
            curation,
            dedup,
            extras,
            flagship,
            manifest,
            merge,
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
            training,
            udfs,
            udtf_ops,
        )

        _LOADED = True
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered

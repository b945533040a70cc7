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
# ROUND-7 WINDOW (this list): evidence-depth rotation — the registry stays
# FROZEN at 257 (see the freeze-decision note below).  Slots: (a) the 11
# ROUND-7 RESIDUE queries whose only driver verdict is still r1 (r6 verdict
# task 2; the r6 judge's independent parity run passed all 11); (b)
# ``sim_ann_pq`` and ``sim_ann_lsh`` again — both operators were REWORKED
# this round (PQ: fused encode+ADC, broadcast re-rank; LSH: single-Arrow
# bucket pass, score-before-dedup; operators/vectors.py) and changed code
# should never coast on a prior verdict; (c) 37 of the 49 queries whose
# latest driver verdict is r2, preferring modules later perf passes touched
# (similarity/curation/pipeline r6-r7 reworks, streaming, storage, the
# text build chain).  The 12 r2 queries deferred to round 8 are the
# least-touched single-shape ones: cast_timestamp cast_types
# rest_source_scan io_multiformat_roundtrip io_binary_files
# storage_partitioned_write text_lang_id text_fingerprint
# text_quality_score udf_surface udf_grouped_map udtf_tokenize.
#
# REGISTRY FREEZE DECISION (r6 verdict task 4): the unfreeze condition
# (never-checked backlog <= 10) is met at 0, but the registry STAYS frozen
# at 257 for round 7 — the surface already exceeds SURVEY §2 (215/215 rows
# covered), and new queries would spend the 50-slot driver window on growth
# while 60 queries still carry pre-r3 evidence.  Revisit once the oldest
# evidence is r3+ (projected round 9).  If/when unfrozen, the first
# growth candidates are the r7 scale levers that already have oracles by
# construction (their outputs equal existing registered queries'):
# equidepth-by-ntile_two_phase and episodes-by-coalesce_intervals_arrow
# (operators/selection.py, operators/intervals.py) — registering them
# would put driver hash evidence on the levers themselves, not just
# pytest equality pins.
DRIVER_PRIORITY = [
    # --- residue: the 11 r1-only queries (rows-only sketches + least-touched value-checked)
    "agg_approx_distinct",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "multimodal_columns",
    "multimodal_decode",
    "multimodal_frame_sample",
    "unpivot_stack",
    "join_range_bucket",
    "join_asof",
    "agg_skew_salted",
    "join_skew_salted",
    # --- reworked this round (r7 PQ fusion; LSH single-Arrow bucket pass) — re-verify
    "sim_ann_pq",
    "sim_ann_lsh",
    # --- refresh: r2-evidence queries, touched-module-first
    "sim_knn_exact",
    "dedup_embedding_cosine",
    "text_quality_gopher",
    "pipeline_training_manifest",
    "pipeline_corpus_prepare",
    "pipeline_course_normalize",
    "pipeline_user_activity",
    "contamination_ngram_check",
    "dedup_apply_canonical",
    "dedup_normalized_exact",
    "pack_sequences",
    "mix_weighted_sources",
    "sample_stratified_exact",
    "split_train_val_test",
    "text_ngram_vocab",
    "text_pii_redact",
    "text_tfidf",
    "text_tokenize_stats",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_session_native",
    "stream_dedup_upsert",
    "stream_interval_join",
    "storage_bucketed_merge",
    "storage_compact_small_files",
    "io_schema_evolution",
    "dim_scd2_history",
    "agg_incremental_refresh",
    "table_diff_reconcile",
    "join_interval_overlap",
    "json_schema_drift",
    "timeseries_gapfill",
    "events_funnel",
    "tpch_q1_pricing",
    "tpch_q3_priority",
    "udf_map_in_pandas",
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

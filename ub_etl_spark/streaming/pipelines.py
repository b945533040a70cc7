"""Structured Streaming pipelines (SURVEY.md B8/B9, A15-A18 semantics).

The reference is a hand-rolled incremental micro-batch stream: paginated
unbounded source, per-page commit, upsert keyed state, refresh contract
(README.md:156-163).  Here that contract is expressed natively:

  - windowed_event_counts: tumbling/sliding window aggregation with a
    watermark for late data (B8)
  - dedup_stream: watermark-scoped exact dedup (B9)
  - upsert_stream_foreach_batch: exactly-once-style sink — every micro-batch
    is merged latest-wins into a parquet-backed state dir via an idempotent
    batch function (the streaming twin of operators/merge.upsert_latest_wins;
    per-page commit -> per-micro-batch atomic merge, A17)

All take ready-made streaming DataFrames so tests can drive them with a
file source + availableNow trigger (deterministic replay), and production
can pass a Kafka/rate source unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ub_etl_spark.operators.merge import upsert_latest_wins


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling (or sliding) windowed counts with late-data watermark."""
    win = (
        F.window(ts_col, window) if slide is None else F.window(ts_col, window, slide)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str],
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup, state bounded by the watermark
    (dropDuplicatesWithinWatermark — B9 first half)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))


def stateful_running_counts(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key running
    event count + running value sum, surviving across micro-batches through
    the state store (and across restarts through the checkpoint).

    This is the escape hatch for stateful logic that watermarked windows /
    dropDuplicates can't express; state is one tiny row per key.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key_tuple, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key_tuple[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(key).applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def upsert_stream_foreach_batch(
    events: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    order_by: Sequence[str],
):
    """Streaming upsert: each micro-batch merges latest-wins into a parquet
    state table.  The merge itself is idempotent on replay (same batch
    merged twice is a fixpoint), which together with the checkpoint gives
    effective exactly-once (A11 + A17 in streaming form).

    Returns the started StreamingQuery (caller awaits/stops).
    """

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            existing = spark.read.parquet(state_dir)
        except Exception:  # first batch: no state yet
            existing = None
        deduped = upsert_latest_wins(
            batch_df.sparkSession.createDataFrame([], batch_df.schema)
            if existing is None
            else existing,
            batch_df,
            keys,
            order_by=order_by,
        )
        # stage-then-swap write keeps the state dir readable on failure
        deduped.write.mode("overwrite").parquet(state_dir + ".staging")
        spark.read.parquet(state_dir + ".staging").write.mode("overwrite").parquet(state_dir)

    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

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


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "left_ts",
    right_ts: str = "right_ts",
    max_lag: str = "2 hours",
    watermark: str = "1 hour",
    right_cols: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on ``key`` within a time range: a right row
    matches a left row when right_ts in [left_ts, left_ts + max_lag].

    Both sides carry watermarks and the join condition bounds right_ts
    against left_ts, so the state store can evict: a buffered left row is
    droppable once the right watermark passes left_ts + max_lag, and vice
    versa — without the time bound the join state would grow forever.
    ``how="left_outer"`` additionally emits a null-padded row for a left
    row once the watermark proves no match can still arrive (Spark defers
    outer results exactly until state eviction — correctness depends on
    the same time bound).  Works identically in batch mode (same Catalyst
    operator), which is what the oracle-checked twins
    `stream_interval_join` / `stream_interval_join_outer` value-check.
    """
    if how not in ("inner", "left_outer", "leftOuter"):
        # right/full outer would need the mirrored bound on left_ts to
        # evict right-side state; not needed by any caller yet
        raise ValueError(f"unsupported interval-join type: {how!r}")
    # plan-level aliases: both sides may derive from the same source
    # (self-join twin), where bare df[col] references are ambiguous
    lhs = left.withWatermark(left_ts, watermark).alias("__ij_l")
    rhs = right.withWatermark(right_ts, watermark).alias("__ij_r")
    lcol = lambda c: F.col(f"__ij_l.{c}")  # noqa: E731
    rcol = lambda c: F.col(f"__ij_r.{c}")  # noqa: E731
    cond = (
        (lcol(key) == rcol(key))
        & (rcol(right_ts) >= lcol(left_ts))
        & (rcol(right_ts) <= lcol(left_ts) + F.expr(f"INTERVAL {max_lag}"))
    )
    return lhs.join(rhs, cond, how).select(
        lcol(key).alias(key),
        lcol(left_ts).alias(left_ts),
        rcol(right_ts).alias(right_ts),
        *[rcol(c).alias(c) for c in right_cols],
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
    n_buckets: int = 16,
):
    """Streaming upsert: each micro-batch merges latest-wins into a
    hash-BUCKETED parquet state table (operators/storage.py), rewriting
    only the buckets the batch touches — O(|batch| x table/N) per batch,
    not O(|table|), so the state table can be arbitrarily large relative
    to the batch.

    Exactly-once story: the merge is idempotent on replay (same batch
    merged twice is a latest-wins fixpoint), so a crash mid-merge — which
    can leave touched buckets at mixed generations — heals when the
    checkpoint replays the batch (A11 + A17 in streaming form).

    Returns the started StreamingQuery (caller awaits/stops).
    """
    from ub_etl_spark.operators.storage import merge_into_bucketed, write_bucketed

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ub_etl_spark.operators.storage import table_exists

        spark = batch_df.sparkSession
        # real FS existence check: a transient read error on an existing
        # state dir must fail the batch (checkpoint replays it), not be
        # mistaken for "first batch" and overwrite the state
        has_state = table_exists(spark, state_dir)
        if not has_state:
            first = upsert_latest_wins(
                spark.createDataFrame([], batch_df.schema), batch_df, keys, order_by=order_by
            )
            write_bucketed(first, state_dir, keys, n_buckets=n_buckets)
        else:
            merge_into_bucketed(
                spark, state_dir, batch_df, keys, order_by=order_by, n_buckets=n_buckets
            )

    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def corpus_ingest_stream(
    docs: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
    min_tokens: int = 5,
    max_dup_word_ratio: float = 0.8,
    n_buckets: int = 16,
):
    """Streaming corpus ingestion — the training-data twin of the event
    pipelines: per-row quality gate -> PII redaction -> watermark-scoped
    near-exact dedup -> cross-batch first-writer-wins append into a
    bucketed parquet corpus store.

    Stage discipline for unbounded input: the quality gate uses ONLY
    per-row expressions (token count, duplicate-word ratio — no per-doc
    aggregation), so the stream stays stateless until the dedup; dedup
    state is keyed on xxhash64(normalized redacted text) and bounded by
    the watermark; dedup against the WHOLE historical corpus is the
    anti-join inside the batch sink (touched buckets only), which is
    idempotent on crash-replay — together: exactly-once corpus growth.

    Returns the started StreamingQuery (availableNow trigger).
    """
    from ub_etl_spark.operators.curation import redact_pii
    from ub_etl_spark.operators.storage import (
        insert_ignore_into_bucketed,
        write_bucketed,
    )
    from ub_etl_spark.operators.training import normalize_text

    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("bigint")
    gated = (
        docs.withColumn("n_tokens", n_tok)
        .withColumn(
            "dup_word_ratio",
            F.lit(1.0) - F.size(F.array_distinct(toks)).cast("bigint") / F.col("n_tokens"),
        )
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("dup_word_ratio") <= max_dup_word_ratio)
        )
        .withColumn("text", redact_pii(F.col("text")))
        .withColumn("__nh", F.xxhash64(normalize_text(F.col("text"))))
        .drop("dup_word_ratio")
    )
    deduped = gated.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["__nh"])

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ub_etl_spark.operators.storage import table_exists

        spark = batch_df.sparkSession
        # FS existence check, not try/except-read: a transient read error
        # on an existing corpus must fail the batch (replayed from the
        # checkpoint), never trigger the mode('overwrite') first-load path
        has_state = table_exists(spark, state_dir)
        batch = batch_df.dropDuplicates(["__nh"])
        if not has_state:
            write_bucketed(batch, state_dir, ["__nh"], n_buckets=n_buckets)
        else:
            insert_ignore_into_bucketed(spark, state_dir, batch, ["__nh"], n_buckets=n_buckets)

    return (
        deduped.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def running_totals_tws(events: DataFrame, key: str = "user_id") -> DataFrame:
    """stateful_running_counts on the Spark 4 transformWithStateInPandas
    API — typed per-key ValueState instead of the legacy GroupState blob.
    Same semantics as stateful_running_counts; kept side-by-side because
    transformWithState is the forward path (typed state variables, timers,
    state TTL) while applyInPandasWithState remains the stable one.

    RUNTIME REQUIREMENT: transformWithState's state server speaks protobuf;
    environments without a working google.protobuf cannot run this pipeline
    (the test suite skips it there) — use stateful_running_counts instead.
    """
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n long, total double")

        def handleInputRows(self, key_tuple, rows, timerValues):
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key_tuple[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy(key).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def scd2_stream_foreach_batch(
    changes: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    tracked: Sequence[str],
    order_by: Sequence[str],
    valid_from_col: str,
):
    """Streaming SCD2 dimension maintenance: each micro-batch of change
    rows stitches into the persisted history via the incremental
    operator (operators/merge.scd2_apply_changes) — the streaming form
    of nightly dimension maintenance, contracted to equal a full
    rebuild over everything ingested so far (the dim_scd2_apply_changes
    oracle, here re-checked across MICRO-BATCH boundaries in
    tests/test_streaming.py).

    Per batch: read history parquet -> compress + stitch the batch ->
    commit.  The commit is ONE atomic filesystem operation: each batch's
    history is written to a versioned directory ``history.v<batch_id>``
    and ``history`` is a symlink to the current version, replaced with a
    single os.replace.  The version number IS the last-applied batch id,
    so data and replay cursor can never disagree: a crash before the
    link flip leaves the old link (checkpoint replays the batch against
    the old history); a crash after it leaves only a stale version
    directory, swept on the next commit.  Replay safety: the stitch is
    NOT blindly idempotent (re-applying an already-stitched batch could
    re-close rows), so replays of batch ids at or below the committed
    version SKIP — the transactional-sink pattern (A17) keyed on
    batch_id.

    Cost per batch is proportional to the batch + touched keys' current
    rows, not accumulated history length.  Returns the started query.
    (POSIX symlink semantics assumed — the local/dbfs-fuse layout; on an
    object store use a manifest-file pointer with the same one-commit
    rule.)
    """
    import os
    import shutil

    from ub_etl_spark.operators.merge import scd2_apply_changes, scd2_history

    data_path = os.path.join(state_dir, "history")

    def committed_batch_id() -> int | None:
        """The batch id encoded in the current history symlink target."""
        if not os.path.islink(data_path):
            return None
        target = os.path.basename(os.readlink(data_path))
        return int(target.rsplit(".v", 1)[-1])

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = committed_batch_id()
        if last is not None:
            if batch_id <= last:
                return  # committed replay: skip (exactly-once)
            history = spark.read.parquet(data_path)
            updated = scd2_apply_changes(
                history, batch_df, keys, tracked, order_by, valid_from_col
            )
        else:
            updated = scd2_history(batch_df, keys, tracked, order_by, valid_from_col)
        os.makedirs(state_dir, exist_ok=True)
        vname = f"history.v{batch_id}"
        vdir = os.path.join(state_dir, vname)
        shutil.rmtree(vdir, ignore_errors=True)  # uncommitted crash leftover
        updated.write.mode("overwrite").parquet(vdir)
        # single-operation commit: flip the symlink to the new version
        tmp_link = os.path.join(state_dir, f".history.lnk.{batch_id}")
        if os.path.lexists(tmp_link):
            os.unlink(tmp_link)
        os.symlink(vname, tmp_link)
        os.replace(tmp_link, data_path)
        # best-effort sweep of superseded versions (correctness does not
        # depend on it — the link names the only live version)
        for entry in os.listdir(state_dir):
            if entry.startswith("history.v") and entry != vname:
                shutil.rmtree(os.path.join(state_dir, entry), ignore_errors=True)

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join — the most common streaming pattern:
    each micro-batch of the stream joins a STATIC dimension (no
    watermark, no state store; the dim is re-resolvable per batch, so a
    catalog-backed dim picks up slowly-changing updates between
    batches).  The planner broadcasts the dim while it fits — the
    streaming twin of the A9 bridge join — and the aggregate after it
    is a plain stateful streaming agg keyed on the enriched column.

    `events`: streaming frame with user_id/value; `dim`: static
    (user_id, tier).  Returns per-tier running totals (complete-mode
    shape; the caller picks the sink/outputMode).
    """
    enriched = events.join(F.broadcast(dim), "user_id", "left_outer").withColumn(
        "tier", F.coalesce(F.col("tier"), F.lit("unknown"))
    )
    return enriched.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )

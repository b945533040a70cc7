"""Streaming-semantics tier in batch mode (SURVEY.md B8/B9).

Spark's F.window/session_window produce identical results in batch and
streaming (same Catalyst operator); these batch queries are the
oracle-checkable twins of the Structured Streaming pipelines in
ub_etl_spark/streaming/, which tests/test_streaming.py replays with real
readStream + watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ub_etl_spark.functions.exact import csum, sql_csum
from ub_etl_spark.operators.dedup import dedup_keyed_latest
from ub_etl_spark.registry import register
from ub_etl_spark.sources.tables import load_table as T


# B8: tumbling window aggregation
@register(
    "stream_tumbling_agg",
    tier="B",
    oracle=f"""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS window_end,
           event_type,
           COUNT(*) AS n,
           SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            csum("value", "total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


# B8: sliding window aggregation (each event lands in size/slide windows)
@register(
    "stream_sliding_agg",
    tier="B",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS window_start, value
      FROM events
    )
    SELECT window_start,
           window_start + INTERVAL '10 minutes' AS window_end,
           COUNT(*) AS n,
           SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
    FROM assigned GROUP BY 1, 2
    """,
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            csum("value", "total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "total_value",
        )
    )


# Sessionization: 30-minute-gap sessions via lag + cumulative session ids —
# the batch formulation of session_window (guide: "Sessionization")
@register(
    "stream_session_window",
    tier="B",
    oracle="""
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         <= INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS is_new
        FROM events
      ) g
    ) s
    GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # gap as a day-time INTERVAL (ts - lag(ts)), exactly the oracle's
    # formulation: wall-clock arithmetic on the NTZ values, independent of
    # the session timezone.  (An NTZ->LTZ cast + unix_micros would be
    # DST-dependent in non-UTC sessions: two wall-clock times 25 min apart
    # straddling a fall-back transition are 85 epoch-minutes apart.)
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    with_new = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap <= F.expr("INTERVAL 30 MINUTES"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("is_new"),
    )
    with_sid = with_new.select(
        "user_id",
        "ts",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("session_id"),
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# B9: streaming dedup/upsert — batch twin: latest event per (user_id,
# event_type).  The streaming version (dropDuplicatesWithinWatermark +
# foreachBatch merge) lives in ub_etl_spark/streaming/pipelines.py.
@register(
    "stream_dedup_upsert",
    tier="B",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value FROM (
      SELECT e.*, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      FROM events e
    ) t WHERE rn = 1
    """,
)
def stream_dedup_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return dedup_keyed_latest(e, ["user_id", "event_type"], ["ts", "event_id"]).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )


# Native session_window operator (same Catalyst SessionWindow node in
# batch and streaming) — twin of the manual lag-based sessionization
# above; window.end is last-event + gap, so subtracting the gap yields
# the oracle's max(ts).
@register(
    "stream_session_native",
    tier="B",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         <= INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS is_new
        FROM events
      ) g
    ) s
    GROUP BY user_id, session_id
    """,
)
def stream_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
        )
    )


# Scale lever twin of stream_session_window (registered r11; SCALING.md
# cell session_window_arrow 6.2x@100x vs session_window_keyed 19.1x):
# sessions ARE coalesced [ts, ts+gap] intervals — equal-length intervals
# make the running max the previous end, so "touching or overlapping"
# coalescing merges exactly the gap<=30min pairs.  Zero new operator
# code: coalesce_intervals_arrow (operators/intervals.py — hash exchange
# by user + ONE in-partition sort + ONE O(n) Arrow scan, vs the windowed
# form's TWO WindowExec passes over the same exchange).  Oracle is the
# same SQL as stream_session_window (row-for-row equality also pinned in
# tests/test_intervals.py::test_session_window_as_interval_coalescing).
@register(
    "session_window_arrow",
    tier="B",
    oracle="""
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         <= INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS is_new
        FROM events
      ) g
    ) s
    GROUP BY user_id, session_id
    """,
)
def session_window_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ub_etl_spark.operators.intervals import coalesce_intervals_arrow

    e = T(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("iv_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("iv_end"),
    )
    eps = coalesce_intervals_arrow(e, "user_id", "iv_start", "iv_end")
    return eps.select(
        "user_id",
        F.col("episode").alias("session_id"),
        F.col("n_orders").alias("n_events"),
        F.col("episode_start").alias("session_start"),
        (F.col("episode_end") - F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
    )


# B35: stream-stream interval join (signup -> purchase within 2 h).  The
# batch twin of streaming/pipelines.interval_join_stream — same join
# operator, and the time bound in the join condition is what lets the
# streaming state store evict buffered rows (tests/test_streaming.py
# replays it with real watermarks).  Equi-join on user_id carries the
# shuffle; the range predicate rides along as a join-condition filter,
# never a nested loop.
@register(
    "stream_interval_join",
    tier="B",
    oracle="""
    SELECT s.user_id,
           s.ts AS left_ts,
           p.ts AS right_ts,
           p.value AS purchase_value
    FROM events s
    JOIN events p
      ON s.user_id = p.user_id
     AND p.ts >= s.ts
     AND p.ts <= s.ts + INTERVAL '2 hours'
    WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ub_etl_spark.streaming.pipelines import interval_join_stream

    e = T(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("left_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("right_ts"),
        F.col("value").alias("purchase_value"),
    )
    return interval_join_stream(
        signups,
        purchases,
        key="user_id",
        left_ts="left_ts",
        right_ts="right_ts",
        max_lag="2 hours",
        right_cols=["purchase_value"],
    )


# B35 outer variant: signups with NO purchase inside the window survive
# null-padded — in streaming mode Spark holds those rows back until the
# watermark proves no match can arrive, then emits them on eviction; the
# batch twin value-checks the join semantics that state machinery must
# reproduce.
@register(
    "stream_interval_join_outer",
    tier="B",
    oracle="""
    SELECT s.user_id,
           s.ts AS left_ts,
           p.ts AS right_ts,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON s.user_id = p.user_id
     AND p.ts >= s.ts
     AND p.ts <= s.ts + INTERVAL '2 hours'
    """,
)
def stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ub_etl_spark.streaming.pipelines import interval_join_stream

    e = T(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("left_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("right_ts"),
        F.col("value").alias("purchase_value"),
    )
    return interval_join_stream(
        signups,
        purchases,
        key="user_id",
        left_ts="left_ts",
        right_ts="right_ts",
        max_lag="2 hours",
        right_cols=["purchase_value"],
        how="left_outer",
    )


# Stream-static enrichment: the batch twin runs the SAME frame-level
# logic (streaming/pipelines.enrich_stream) over the batch events table;
# the readStream twin with per-batch dim resolution is replayed in
# tests/test_streaming.py.  Dim = deterministic hash-derived user tiers
# (no tier table in the fixtures; the derivation is engine-shared
# integer arithmetic, so the whole enrichment is value-checked).
@register(
    "stream_static_enrich",
    tier="B",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT user_id,
             CASE ((user_id * 2654435761) % 4294967296) % 3
               WHEN 0 THEN 'gold' WHEN 1 THEN 'silver' ELSE 'bronze' END AS tier
      FROM events WHERE user_id % 5 <> 0
    )
    SELECT COALESCE(d.tier, 'unknown') AS tier,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e LEFT JOIN dim d ON e.user_id = d.user_id
    GROUP BY COALESCE(d.tier, 'unknown')
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join, batch twin: events LEFT-join a
    static user-tier dimension (broadcast — the A9 bridge join in
    streaming form) with unknown-tier fallback for users absent from
    the dim (every 5th user here: the left join + coalesce keeps them,
    an inner join would silently drop their traffic — the
    pipeline_customer_features lesson at streaming speed), then a
    per-tier aggregate.  The streaming twin (enrich_stream) runs the
    identical frame logic per micro-batch with the dim re-resolved
    between batches; replayed in tests/test_streaming.py."""
    from ub_etl_spark.streaming.pipelines import enrich_stream

    e = T(spark, sf_dir, "events")
    tier = (
        F.when(
            F.pmod((F.col("user_id") * F.lit(2654435761)) % F.lit(2**32), F.lit(3)) == 0,
            "gold",
        )
        .when(
            F.pmod((F.col("user_id") * F.lit(2654435761)) % F.lit(2**32), F.lit(3)) == 1,
            "silver",
        )
        .otherwise("bronze")
    )
    dim = (
        e.filter(F.col("user_id") % 5 != 0)
        .select("user_id")
        .distinct()
        .withColumn("tier", tier)
    )
    return enrich_stream(e, dim)

"""Time-series maintenance queries (SURVEY.md §2 B38).

timeseries_gapfill: per-key daily resample + forward fill — the standard
"make an irregular event stream a dense daily series" ETL step (billing,
activity rollups, feature backfills).  Spark-first shape: the date grid is
generated DISTRIBUTED per key with sequence()+explode (never a driver
loop), the observed days aggregate exactly (decimal sums), and the fill is
one window pass partitioned on the key — so the whole thing is two hash
shuffles on user_id regardless of span length, and at 100 TB the grid
explode parallelizes with the keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ub_etl_spark.functions.exact import cents, dsum, sql_cents
from ub_etl_spark.registry import register
from ub_etl_spark.sources.tables import load_table as T


@register(
    "timeseries_gapfill",
    tier="B",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1
    ), grid AS (
      SELECT user_id, CAST(g AS DATE) AS d
      FROM spans,
           UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                  CAST(d1 AS TIMESTAMP),
                                  INTERVAL 1 DAY)) AS t(g)
    )
    SELECT g.user_id, g.d,
           last_value(dy.day_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           dy.day_value IS NULL AS is_gap
    FROM grid g
    LEFT JOIN daily dy ON g.user_id = dy.user_id AND g.d = dy.d
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per user over [first event day, last event day]:
    observed days carry their exact daily sum, missing days are flagged and
    forward-filled from the last observed value.  The fill window is
    partitioned on user_id (no global sort); the first grid day is always
    observed by construction, so filled_value is never NULL."""
    e = T(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d"), "value"
    )
    daily = e.groupBy("user_id", "d").agg(dsum("value", "day_value"))
    spans = daily.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d"),
    )
    fill = W.partitionBy("user_id").orderBy("d").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        grid.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            "d",
            F.last("day_value", ignorenulls=True).over(fill).alias("filled_value"),
            F.col("day_value").isNull().alias("is_gap"),
        )
    )


# B46: hypertable-style continuous-aggregate rollup — hour AND day
# granularities materialized from ONE event scan via ROLLUP on the two
# truncations (day is functionally determined by hour, so the rollup
# lattice (day, hour) -> (day) -> () is exactly the hour/day/total
# hierarchy).  Catalyst plans a single Expand + one hash aggregation:
# the scan is never repeated per granularity, and map-side partials keep
# the shuffle at |buckets| rows — the Spark-native shape of a
# TimescaleDB continuous aggregate refresh.
@register(
    "timeseries_multi_rollup",
    tier="B",
    oracle="""
    SELECT CAST(2 * grouping(bucket_day) + grouping(bucket_hour) AS BIGINT)
             AS gid,
           bucket_day, bucket_hour, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
             date_trunc('hour', ts) AS bucket_hour, value
      FROM events
    ) t
    GROUP BY ROLLUP(bucket_day, bucket_hour)
    """,
)
def timeseries_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour + day + grand-total event rollup from a single scan.  gid
    disambiguates granularity levels (0 = hourly row, 1 = daily subtotal,
    3 = grand total) the same way both engines number grouping bits."""
    e = T(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("bucket_day"),
        F.date_trunc("hour", "ts").alias("bucket_hour"),
        "value",
    )
    return (
        e.rollup("bucket_day", "bucket_hour")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
        .select("gid", "bucket_day", "bucket_hour", "n_events", "sum_value")
    )


@register(
    "events_active_users_rolling",
    tier="B",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), contrib AS (
      SELECT CAST(UNNEST(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY))
                  AS DATE) AS wd,
             user_id
      FROM daily
    ), spine AS (
      SELECT DISTINCT d FROM daily
    )
    SELECT s.d,
           (SELECT COUNT(DISTINCT da.user_id) FROM daily da WHERE da.d = s.d)
             AS dau,
           COUNT(DISTINCT c.user_id) AS wau
    FROM spine s JOIN contrib c ON c.wd = s.d
    GROUP BY s.d
    """,
)
def events_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct active users (DAU + trailing-7-day WAU): the
    sliding-window COUNT DISTINCT no window frame can express (distinct
    doesn't decompose over frames).  The scale shape is contribution
    explosion: each (day, user) activity row contributes itself to the
    7 window-end days it falls inside, then one exact distinct count per
    end day — O(activity x window/step), shuffled on the day key, never
    a per-day correlated re-scan (the oracle keeps that textbook form).
    Day grain dedups first so the explosion is bounded by active
    (day, user) pairs, not raw events.  Only days with activity appear
    (join, not left join, onto the spine — matching the oracle)."""
    e = T(spark, sf_dir, "events")
    daily = e.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    contrib = daily.select(
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), 6), F.expr("INTERVAL 1 DAY")
            )
        ).alias("wd"),
        "user_id",
    )
    dau = daily.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    wau = (
        contrib.join(daily.select("d").distinct(), contrib.wd == F.col("d"), "inner")
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "d").select("d", "dau", "wau")


@register(
    "timeseries_seasonal_decompose",
    tier="B",
    oracle=f"""
    WITH monthly AS (
      SELECT YEAR(l_shipdate) AS y, MONTH(l_shipdate) AS m,
             SUM({sql_cents("l_extendedprice")}) AS rev_c
      FROM lineitem GROUP BY YEAR(l_shipdate), MONTH(l_shipdate)
    ), trended AS (
      SELECT y, m, rev_c,
             SUM(rev_c) OVER (ORDER BY y, m
                              ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS tsum,
             COUNT(*) OVER (ORDER BY y, m
                            ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS tn
      FROM monthly
    ), ratios AS (
      SELECT y, m, rev_c, tsum, tn,
             CAST(FLOOR(CAST(rev_c AS DOUBLE)
                          / (CAST(tsum AS DOUBLE) / tn) * 1000000000.0)
                  AS BIGINT) AS ratio_u
      FROM trended WHERE tn = 12
    )
    SELECT m, SUM(ratio_u) / 1000000000.0 / COUNT(*) AS seasonal_index,
           COUNT(*) AS n_years
    FROM ratios GROUP BY m
    """,
)
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative seasonal indices (classical decomposition step):
    monthly revenue over a centered 12-month trend, ratios averaged per
    calendar month.  Exactness discipline: monthly revenues are exact
    longs, the trend is one canonical double division, and each ratio
    QUANTIZES to integer nano-units before the per-month average — a
    raw double SUM of ratios would be order-dependent across engines
    and partitionings.  Edge months without a full 12-month window are
    excluded (tn = 12), not padded.  The month spine is ~84 rows, so
    the global-order window is trivially cheap after the fact
    aggregates."""
    li = T(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.year("l_shipdate").alias("y"), F.month("l_shipdate").alias("m")
    ).agg(F.sum(cents("l_extendedprice")).alias("rev_c"))
    w = W.orderBy("y", "m").rowsBetween(-6, 5)
    trended = monthly.select(
        "y",
        "m",
        "rev_c",
        F.sum("rev_c").over(w).alias("tsum"),
        F.count(F.lit(1)).over(w).alias("tn"),
    ).filter(F.col("tn") == 12)
    ratio_u = F.floor(
        F.col("rev_c").cast("double")
        / (F.col("tsum").cast("double") / F.col("tn"))
        * 1e9
    ).cast("long")
    return (
        trended.withColumn("ratio_u", ratio_u)
        .groupBy("m")
        .agg(
            (F.sum("ratio_u") / 1e9 / F.count(F.lit(1))).alias("seasonal_index"),
            F.count(F.lit(1)).alias("n_years"),
        )
    )

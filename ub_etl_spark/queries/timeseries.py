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

from ub_etl_spark.functions.exact import dsum
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

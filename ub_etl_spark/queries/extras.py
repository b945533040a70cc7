"""Extended relational surface: as-of join, range join, unpivot,
percentiles — operators a warehouse consumer of the reference's schema
reaches for next (guide: "Common OLAP patterns")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ub_etl_spark.functions.exact import cents, csum, sql_csum
from ub_etl_spark.operators.asof import asof_join
from ub_etl_spark.registry import register
from ub_etl_spark.sources.tables import load_table as T


# As-of join: each purchase matched to the user's most recent
# prior-or-equal signup event (backward-inclusive, NULL when none).
# DuckDB has a native ASOF JOIN — ideal oracle for our window formulation.
@register(
    "join_asof",
    tier="B",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    ), signups AS (
      -- dedupe to one row per (user_id, ts) for deterministic ties
      SELECT user_id, ts AS signup_ts, max(event_id) AS signup_event_id
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    )
    SELECT p.user_id, p.ts, p.event_id, p.value, s.signup_ts, s.signup_event_id
    FROM purchases p
    ASOF LEFT JOIN signups s
      ON p.user_id = s.user_id AND s.signup_ts <= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event_id"))
        .select(
            "user_id",
            F.col("ts").alias("signup_ts0"),
            # duplicate the right-side ts as a payload column so the join
            # output can report *which* signup matched
            F.col("ts").alias("signup_ts"),
            "signup_event_id",
        )
    )
    return asof_join(
        purchases,
        signups,
        key=["user_id"],
        left_ts="ts",
        right_ts="signup_ts0",
        value_cols=["signup_ts", "signup_event_id"],
    )


# Range join via bucketization: explode the range dim into covered buckets,
# equi-join on bucket, then exact BETWEEN filter — the scale pattern for
# interval joins (no BroadcastNestedLoop over the fact table).
@register(
    "join_range_bucket",
    tier="B",
    oracle=f"""
    WITH ranges(lo, hi, label) AS (
      VALUES (1.0, 9.0, 'low'), (10.0, 24.0, 'mid'), (25.0, 39.0, 'high'),
             (40.0, 50.0, 'top')
    )
    SELECT label, COUNT(*) AS n,
           {sql_csum("l_quantity", "total_qty")}
    FROM lineitem JOIN ranges ON l_quantity BETWEEN lo AND hi
    GROUP BY label
    """,
)
def join_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    ranges = spark.createDataFrame(
        [(1.0, 9.0, "low"), (10.0, 24.0, "mid"), (25.0, 39.0, "high"), (40.0, 50.0, "top")],
        "lo double, hi double, label string",
    )
    bucket_width = 10
    exploded = ranges.select(
        "lo",
        "hi",
        "label",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / bucket_width), F.floor(F.col("hi") / bucket_width)
            )
        ).alias("bucket"),
    )
    facts = li.withColumn("bucket", F.floor(F.col("l_quantity") / bucket_width))
    return (
        facts.join(F.broadcast(exploded), "bucket")
        .filter(F.col("l_quantity").between(F.col("lo"), F.col("hi")))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            csum("l_quantity", "total_qty"),
        )
    )


# Unpivot / melt: wide metrics -> long (metric, value) rows
@register(
    "unpivot_stack",
    tier="Q",
    oracle=f"""
    SELECT l_returnflag, 'quantity' AS metric,
           {sql_csum("l_quantity", "total")}
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'extendedprice' AS metric,
           {sql_csum("l_extendedprice", "total")}
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'tax' AS metric,
           {sql_csum("l_tax", "total")}
    FROM lineitem GROUP BY l_returnflag
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        [
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_tax").alias("tax"),
        ],
        "metric",
        "v",
    )
    return long.groupBy("l_returnflag", "metric").agg(csum("v", "total"))


# Exact percentiles (linear interpolation — identical algorithm in DuckDB's
# quantile_cont) + approx twin kept rows-only in agg_approx_distinct style
@register(
    "agg_percentile",
    tier="Q",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.9).alias("p90"),
    )

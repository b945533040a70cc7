"""Extended relational surface: as-of join, range join, unpivot,
percentiles — operators a warehouse consumer of the reference's schema
reaches for next (guide: "Common OLAP patterns")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ub_etl_spark.functions.exact import cents, csum, sql_cents, sql_csum
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


# Full outer join: union of matched + left-only + right-only keys — the
# missing member of the join family (inner/left/semi/anti/broadcast/asof/
# range are covered elsewhere)
@register(
    "join_full_outer",
    tier="Q",
    oracle="""
    SELECT COALESCE(o.o_orderkey, li.l_orderkey) AS orderkey,
           o.o_totalprice AS totalprice, li.n_big AS n_big
    FROM (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0) o
    FULL JOIN (SELECT l_orderkey, COUNT(*) AS n_big FROM lineitem
               WHERE l_quantity >= 45 GROUP BY l_orderkey) li
      ON o.o_orderkey = li.l_orderkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    li = (
        T(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return o.join(li, o.o_orderkey == li.l_orderkey, "full").select(
        F.coalesce("o_orderkey", "l_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
        "n_big",
    )


# CUBE + GROUPING_ID: all 4 grouping sets of (status, priority), with the
# grouping_id bitmask distinguishing subtotal levels (rollup twin is
# agg_rollup_cube)
@register(
    "agg_cube_grouping",
    tier="Q",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n,
           {sql_csum("o_totalprice", "total")}
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            csum("o_totalprice", "total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n",
            "total",
        )
    )


# RANGE window frame: per-customer trailing-30-day spend — value-based
# (not row-based) frame bounds, ordered on a day-integer so both engines
# share the same RANGE arithmetic
@register(
    "window_range_frame",
    tier="Q",
    oracle=f"""
    SELECT o_custkey, o_orderkey, date_int,
           SUM({sql_cents("o_totalprice")}) OVER (
             PARTITION BY o_custkey ORDER BY date_int
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) / 100.0 AS trailing_30d,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY date_int
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_30d
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS date_int
      FROM orders
    ) t
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").withColumn(
        "date_int",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("bigint"),
    )
    w = W.partitionBy("o_custkey").orderBy("date_int").rangeBetween(-30, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "date_int",
        (F.sum(cents("o_totalprice")).over(w) / 100.0).alias("trailing_30d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_30d"),
    )


# Distribution windows: ntile / percent_rank / cume_dist (ratios of integer
# ranks — deterministic across engines); ties broken by orderkey
@register(
    "window_ntile_dist",
    tier="Q",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS cheapest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
    )


# Exact second-moment statistics: mean/variance/stddev from exact integer
# sums (s1 = sum of whole-unit values, s2 = sum of squares), combined with
# the SAME double expression on both engines.  Shows how order-independent
# moments are built without decimal aggregation.
#
# Envelope: values ~1e6 give c*c ~1e12 per row, so the long s2 sum is
# exact to ~9e6 rows PER GROUP — far tighter than the ~1e12-row s1
# envelope, and Spark's non-ANSI long sum wraps silently beyond it.  Past
# that, swap s2 to F.sum((c*c).cast("decimal(38,0)")) (exact at any
# scale, ~2.5x slower) — the point of the query is the technique, the
# envelope math decides which carrier type.
@register(
    "agg_stats_exact",
    tier="Q",
    oracle="""
    SELECT o_orderstatus, n,
           CAST(s1 AS DOUBLE) / n AS mean_price,
           CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             AS var_pop,
           sqrt(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             AS std_pop
    FROM (
      SELECT o_orderstatus, COUNT(*) AS n,
             SUM(CAST(FLOOR((o_totalprice) * 1 + 0.5) AS BIGINT)) AS s1,
             SUM(CAST(FLOOR((o_totalprice) * 1 + 0.5) AS BIGINT)
                 * CAST(FLOOR((o_totalprice) * 1 + 0.5) AS BIGINT)) AS s2
      FROM orders GROUP BY o_orderstatus
    ) t
    """,
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    c = cents("o_totalprice", scale=0)
    agg = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    return agg.select(
        "o_orderstatus",
        "n",
        mean.alias("mean_price"),
        var.alias("var_pop"),
        F.sqrt(var).alias("std_pop"),
    )


# Skew-aware join: salted equi-join of the (skewed) fact side against a
# replicated dim — result identical to the plain join, which is exactly
# what the oracle checks.  l_returnflag has 3 hot values, the worst-case
# key distribution for a reduce-side join.
@register(
    "join_skew_salted",
    tier="B",
    oracle="""
    WITH dim(flag, label) AS (VALUES ('A', 'accepted'), ('N', 'none'), ('R', 'returned'))
    SELECT l_orderkey, l_linenumber, label
    FROM lineitem JOIN dim ON l_returnflag = flag
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ub_etl_spark.operators.skew import salted_join

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_returnflag")
    dim = spark.createDataFrame(
        [("A", "accepted"), ("N", "none"), ("R", "returned")],
        "l_returnflag string, label string",
    )
    return salted_join(li, dim, ["l_returnflag"], salt=8).select(
        "l_orderkey", "l_linenumber", "label"
    )


# Skew-aware aggregation: two-phase salted count on a 3-value hot key;
# identical totals to the plain GROUP BY (the oracle).
@register(
    "agg_skew_salted",
    tier="B",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ub_etl_spark.operators.skew import salted_group_count

    li = T(spark, sf_dir, "lineitem").select("l_returnflag")
    return salted_group_count(li, ["l_returnflag"], salt=8)


# Schema-drift-tolerant JSON ingest (SURVEY §1.3: the reference tolerates
# missing/odd fields with .get(); Spark-side that is PERMISSIVE parsing
# with null-through).  A deterministic subset of props is corrupted by
# truncation (both Jackson and DuckDB's json parser reject an unclosed
# object), and the query must classify + extract without failing the
# scan — from_json returns null on malformed input exactly where
# DuckDB's json_valid says invalid, so validity and payload are
# value-checked cross-engine.
@register(
    "json_schema_drift",
    tier="Q",
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(c) THEN CAST(json_extract_string(c, '$.k') AS INT) END AS k,
           json_valid(c) AS is_valid
    FROM (
      SELECT event_id,
             CASE WHEN event_id % 37 = 0
                  THEN substr(props, 1, CAST(length(props) AS INT) - 2)
                  ELSE props END AS c
      FROM events
    )
    """,
)
def json_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    corrupt = F.when(
        F.col("event_id") % 37 == 0,
        F.expr("substring(props, 1, length(props) - 2)"),
    ).otherwise(F.col("props"))
    # PERMISSIVE from_json yields a struct of nulls (not a null struct)
    # on malformed input; the corrupt-record column is the reliable
    # malformed-row classifier.  Parse into a named struct first, THEN
    # project fields: referencing from_json(...)['field'] twice in one
    # projection plans two parses per row (JsonToStructs is
    # CodegenFallback, so no codegen subexpression elimination saves it),
    # while the two-step form keeps a single parse — CollapseProject
    # declines to duplicate the non-cheap expression.
    parsed = F.from_json(
        corrupt,
        "k INT, _corrupt_record STRING",
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    return e.select("event_id", parsed.alias("p")).select(
        "event_id",
        F.col("p")["k"].alias("k"),
        F.col("p")["_corrupt_record"].isNull().alias("is_valid"),
    )


# B64: value-positional window functions — first/last/nth over a full
# frame, completing the window family (rank Q9, analytic/lag Q10,
# frames/ntile in extras).  Partitioned on o_custkey (|customers|
# groups, each bounded by one customer's orders) — NOT on a low-
# cardinality status column, which would funnel the table into a handful
# of unsplittable WindowExec partitions at scale.  Raw doubles pass
# through unaggregated, so values are engine-identical without
# quantization.
@register(
    "window_value_functions",
    tier="Q",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_total,
           last_value(o_totalprice) OVER w AS last_total,
           nth_value(o_totalprice, 3) OVER w AS third_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_total"),
        F.last("o_totalprice").over(w).alias("last_total"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_total"),
    )


# B65: advanced array functions — sequence generation, element-wise
# transform/zip_with, flatten, position — the remaining members of the
# Q17 array family.  All interpreted HOFs, acceptable for a map-only
# projection (the corpus-scale operators use codegen formulations; this
# query is the API-surface proof, and its cost is one narrow pass).
# Array outputs are serialized to ","-joined strings on BOTH sides: the
# driver's pandas canonicalizer cannot sort list cells (the r2
# embedding_quantize red row), so every oracle'd query emits atomic
# columns only (pinned by tests/test_registry.py).
@register(
    "array_advanced_funcs",
    tier="Q",
    oracle="""
    SELECT o_orderkey,
           array_to_string(seq, ',') AS seq,
           array_to_string(list_transform(seq, x -> x * 2), ',') AS doubled,
           array_to_string(flatten([seq, list_transform(seq, x -> x * 2)]), ',')
             AS flat,
           CAST(list_position(flatten([seq, list_transform(seq, x -> x * 2)]), 2)
                AS BIGINT) AS pos2,
           array_to_string(list_transform(generate_series(1, len(seq)),
                          i -> seq[i] + 2 * seq[i]), ',') AS zsum
    FROM (
      SELECT o_orderkey, generate_series(1, CAST(o_orderkey % 5 + 1 AS INT)) AS seq
      FROM orders
    ) t
    """,
)
def array_advanced_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    seq = F.sequence(F.lit(1), (F.col("o_orderkey") % 5 + 1).cast("int"))
    base = o.select("o_orderkey", seq.alias("seq"))
    doubled = F.transform(F.col("seq"), lambda x: x * 2)
    flat = F.flatten(F.array(F.col("seq"), doubled))

    def as_str(c):
        return F.array_join(F.transform(c, lambda x: x.cast("string")), ",")

    return base.select(
        "o_orderkey",
        as_str(F.col("seq")).alias("seq"),
        as_str(doubled).alias("doubled"),
        as_str(flat).alias("flat"),
        F.array_position(flat, 2).alias("pos2"),
        as_str(F.zip_with(F.col("seq"), doubled, lambda x, y: x + y)).alias("zsum"),
    )


# B66: map higher-order functions — create/transform_values/map_filter/
# map_concat, the MapType side of the HOF surface (arrays: B65).  Map
# outputs are emitted as SORTED "k=v" entry lists joined to one string:
# map column order is engine-dependent, sorted entry strings are not, so
# the hash stays stable AND the column is atomic for the driver's pandas
# canonicalizer (see array_advanced_funcs note).  The oracle computes
# the same final strings directly — it checks VALUES, not Spark's map
# representation.
@register(
    "map_advanced_funcs",
    tier="Q",
    oracle="""
    SELECT o_orderkey,
           array_to_string(list_sort(['s=' || o_orderstatus,
                                      'p=' || o_orderpriority]), ',')
             AS entries,
           array_to_string(list_sort(['s=' || upper(o_orderstatus),
                      'p=' || upper(o_orderpriority)]), ',') AS upper_entries,
           's=' || o_orderstatus AS filtered_entries,
           array_to_string(list_sort(['s=' || o_orderstatus,
                                      'p=' || o_orderpriority, 'x=y']), ',')
             AS merged_entries
    FROM orders
    """,
)
def map_advanced_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("s"), F.col("o_orderstatus"), F.lit("p"), F.col("o_orderpriority")
    )

    def entries(mm):
        return F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(mm),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"]),
                )
            ),
            ",",
        )

    return o.select(
        "o_orderkey",
        entries(m).alias("entries"),
        entries(F.transform_values(m, lambda k, v: F.upper(v))).alias("upper_entries"),
        entries(F.map_filter(m, lambda k, v: k == F.lit("s"))).alias(
            "filtered_entries"
        ),
        entries(F.map_concat(m, F.create_map(F.lit("x"), F.lit("y")))).alias(
            "merged_entries"
        ),
    )


# B72: exact per-group mode with deterministic tie-break.  Spark's
# built-in mode() is tie-nondeterministic, so the portable formulation
# is count + rank — two map-side-combined aggs whose shuffles carry
# |group x value| then |group| rows.
@register(
    "agg_mode_per_group",
    tier="Q",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
      FROM orders GROUP BY 1, 2
    ) t WHERE rn = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n")
    )


# B73: edit-distance fuzzy string matching — levenshtein pairs over a
# dimension's natural keys, the character-level complement of the
# token/shingle dedup family (catches typos n-gram Jaccard misses on
# short strings).  Self-join is fine for dimension-sized inputs; at
# corpus scale the blocking comes first (length bucket / first-char /
# q-gram prefilter), named here — edit distance only runs on candidate
# pairs, exactly like the LSH verify stage.
@register(
    "string_fuzzy_levenshtein",
    tier="B",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b ON a.n_name < b.n_name
    WHERE levenshtein(a.n_name, b.n_name) <= 6
    """,
)
def string_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = T(spark, sf_dir, "nation")
    a = n.select(F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_name").alias("name_b"))
    return (
        a.join(b, F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 6)
    )


# B75: forward as-of join — time-to-next-event: each signup matched to
# the user's earliest at-or-after purchase (NULLs when none).  Same
# one-window-pass operator as the backward as-of, traversal reversed;
# right side pre-deduped per (key, ts) for determinism.  DuckDB's ASOF
# JOIN is backward-only, so the oracle ranks candidates explicitly.
@register(
    "join_asof_forward",
    tier="B",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts AS signup_ts FROM events
      WHERE event_type = 'signup'
    ), p AS (
      SELECT user_id, ts AS rts,
             MIN(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) / 100.0 AS pval
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), m AS (
      SELECT s.event_id, p.rts, p.pval,
             ROW_NUMBER() OVER (PARTITION BY s.event_id ORDER BY p.rts) AS rn
      FROM s JOIN p ON s.user_id = p.user_id AND p.rts >= s.signup_ts
    )
    SELECT s.event_id, s.user_id, s.signup_ts,
           m.rts AS next_purchase_ts, m.pval AS purchase_value
    FROM s LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", F.col("ts").alias("signup_ts")
    )
    # pre-dedupe per (user, ts) with MIN cents — mirrors the oracle and
    # makes the as-of pick deterministic under duplicate timestamps
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("rts"))
        .agg((F.min(cents("value")) / 100.0).alias("pval"))
        .select(
            "user_id",
            "rts",
            F.col("rts").alias("next_purchase_ts"),
            F.col("pval").alias("purchase_value"),
        )
    )
    return asof_join(
        signups,
        purchases,
        key=["user_id"],
        left_ts="signup_ts",
        right_ts="rts",
        value_cols=["next_purchase_ts", "purchase_value"],
        direction="forward",
    )


# B80: nearest-direction as-of join — each signup matched to the CLOSEST
# purchase in either direction (ties prefer the at-or-before match,
# pd.merge_asof(direction='nearest') semantics).  One union + one key
# shuffle with two in-partition sorts (operators/asof._asof_nearest);
# the oracle ranks candidates by absolute microsecond distance with the
# backward-preferring tie-break.
@register(
    "join_asof_nearest",
    tier="B",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts AS signup_ts FROM events
      WHERE event_type = 'signup'
    ), p AS (
      SELECT user_id, ts AS rts,
             MIN(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) / 100.0 AS pval
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), m AS (
      SELECT s.event_id, p.rts, p.pval,
             ROW_NUMBER() OVER (
               PARTITION BY s.event_id
               ORDER BY ABS(date_diff('microsecond', p.rts, s.signup_ts)),
                        CASE WHEN p.rts <= s.signup_ts THEN 0 ELSE 1 END,
                        p.rts) AS rn
      FROM s JOIN p ON s.user_id = p.user_id
    )
    SELECT s.event_id, s.user_id, s.signup_ts,
           m.rts AS nearest_purchase_ts, m.pval AS purchase_value
    FROM s LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", F.col("ts").alias("signup_ts")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("rts"))
        .agg((F.min(cents("value")) / 100.0).alias("pval"))
        .select(
            "user_id",
            "rts",
            F.col("rts").alias("nearest_purchase_ts"),
            F.col("pval").alias("purchase_value"),
        )
    )
    return asof_join(
        signups,
        purchases,
        key=["user_id"],
        left_ts="signup_ts",
        right_ts="rts",
        value_cols=["nearest_purchase_ts", "purchase_value"],
        direction="nearest",
    )


# B76: correlation + covariance from exact integer sums.  Built-in
# corr()/covar_pop() accumulate doubles order-dependently (hash-unstable
# across partitionings and engines); the portable exact form aggregates
# the five power sums in longs (quantity <= 50, price cents-at-scale-0
# <= 1e7: all five sums stay far under long range at any group size the
# testdata reaches) and evaluates the closed forms in doubles with ONE
# canonical operation order — the same discipline agg_stats_exact
# established for variance.
@register(
    "agg_corr_exact",
    tier="Q",
    oracle="""
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE)) AS covar_pop,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             AS corr
    FROM (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(CAST(FLOOR((l_quantity) * 1 + 0.5) AS BIGINT)) AS sx,
             SUM(CAST(FLOOR((l_extendedprice) * 1 + 0.5) AS BIGINT)) AS sy,
             SUM(CAST(FLOOR((l_quantity) * 1 + 0.5) AS BIGINT)
                 * CAST(FLOOR((l_quantity) * 1 + 0.5) AS BIGINT)) AS sxx,
             SUM(CAST(FLOOR((l_extendedprice) * 1 + 0.5) AS BIGINT)
                 * CAST(FLOOR((l_extendedprice) * 1 + 0.5) AS BIGINT)) AS syy,
             SUM(CAST(FLOOR((l_quantity) * 1 + 0.5) AS BIGINT)
                 * CAST(FLOOR((l_extendedprice) * 1 + 0.5) AS BIGINT)) AS sxy
      FROM lineitem GROUP BY l_returnflag
    ) t
    """,
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    x = cents("l_quantity", scale=0)
    y = cents("l_extendedprice", scale=0)
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    covar = num / nd / nd
    corr = num / F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return agg.select("l_returnflag", "n", covar.alias("covar_pop"), corr.alias("corr"))


# ---------------------------------------------------------------------------
# As-of join with tolerance (pd.merge_asof tolerance=...)
# ---------------------------------------------------------------------------


@register(
    "join_asof_tolerance",
    tier="B",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    ), signups AS (
      SELECT user_id, ts AS signup_ts, max(event_id) AS signup_event_id
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    ), matched AS (
      SELECT p.user_id, p.ts, p.event_id, p.value, s.signup_ts, s.signup_event_id
      FROM purchases p
      ASOF LEFT JOIN signups s
        ON p.user_id = s.user_id AND s.signup_ts <= p.ts
    )
    SELECT user_id, ts, event_id, value,
           CASE WHEN ts - signup_ts <= INTERVAL 2 DAY THEN signup_ts END
             AS signup_ts,
           CASE WHEN ts - signup_ts <= INTERVAL 2 DAY THEN signup_event_id END
             AS signup_event_id
    FROM matched
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a TOLERANCE bound (pd.merge_asof's
    tolerance=2d): a match older than the bound is nulled out rather
    than carried — the staleness guard every feature-lookup as-of wants
    (a price quote from last month should not enrich today's trade).
    Shape: the tolerance rides as a post-join conditional on the SAME
    single window pass as join_asof — no extra shuffle, no re-join;
    NULLing (not filtering) keeps every left row, preserving the LEFT
    as-of contract.  Completes the as-of family: backward / forward /
    nearest / tolerance."""
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
            F.col("ts").alias("signup_ts"),
            "signup_event_id",
        )
    )
    joined = asof_join(
        purchases,
        signups,
        key=["user_id"],
        left_ts="ts",
        right_ts="signup_ts0",
        value_cols=["signup_ts", "signup_event_id"],
    )
    fresh = F.col("ts") - F.col("signup_ts") <= F.expr("INTERVAL 2 DAY")
    return joined.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(fresh, F.col("signup_ts")).alias("signup_ts"),
        F.when(fresh, F.col("signup_event_id")).alias("signup_event_id"),
    )


# ---------------------------------------------------------------------------
# Running distinct count (expanding window)
# ---------------------------------------------------------------------------


@register(
    "window_running_distinct",
    tier="B",
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, ts, event_id,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS distinct_types_so_far
    FROM firsts
    """,
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user (how many distinct event types
    each user has touched as of each event) — the expanding-distinct
    shape no window frame can express directly (COUNT(DISTINCT) OVER is
    unsupported in every engine): mark each (user, type)'s FIRST
    occurrence with one ranking window, then a cumulative SUM of the
    first-seen flags — the standard two-window rewrite.  Two keyed
    exchanges ((user, type) ranking, then user cumulation) — the
    irreducible cost of distinct-over-history; both partition on fact
    keys, nothing global.  Exact integers throughout."""
    e = T(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_cum = W.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = e.select(
        "user_id",
        "ts",
        "event_id",
        (F.row_number().over(w_first) == 1).cast("int").alias("is_first"),
    )
    return firsts.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("is_first").over(w_cum).alias("distinct_types_so_far"),
    )

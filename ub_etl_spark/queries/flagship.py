"""Flagship composite queries (SURVEY.md §2 B26-B29): TPC-H-shaped
pricing-summary and shipping-priority analytics over the full star
schema, a sequential event funnel, and sketch-based percentiles.

These exercise multi-operator composition — scan + pushdown filter +
broadcast join + exact-cents aggregation + top-k — through one Catalyst
plan each, the way a warehouse user actually queries the tables the
reference pipeline produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ub_etl_spark.functions.exact import (
    cavg,
    cents,
    cents_disc,
    csum,
    sql_cavg,
    sql_cents,
    sql_cents_disc,
    sql_csum,
)
from ub_etl_spark.registry import register
from ub_etl_spark.sources.tables import load_table as T


@register(
    "tpch_q1_pricing",
    tier="B",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_csum("l_quantity", "sum_qty")},
           {sql_csum("l_extendedprice", "sum_base_price")},
           SUM({sql_cents_disc("l_extendedprice", "l_discount")}) / 10000.0
             AS sum_disc_price,
           SUM({sql_cents("l_extendedprice")} * (100 - {sql_cents("l_discount")})
               * (100 + {sql_cents("l_tax")})) / 1000000.0 AS sum_charge,
           {sql_cavg("l_quantity", "avg_qty")},
           {sql_cavg("l_extendedprice", "avg_price")},
           {sql_cavg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) with exact long-cents arithmetic:
    one scan with a pushed shipdate filter into a 6-way aggregate.  The
    charge product (price x (1-disc) x (1+tax)) stays in scale-6 longs —
    exact to ~9e12 rows/group (functions/exact.py envelope)."""
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    charge = cents("l_extendedprice") * (F.lit(100) - cents("l_discount")) * (
        F.lit(100) + cents("l_tax")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        csum("l_quantity", "sum_qty"),
        csum("l_extendedprice", "sum_base_price"),
        (F.sum(cents_disc("l_extendedprice", "l_discount")) / 10000.0).alias(
            "sum_disc_price"
        ),
        (F.sum(charge) / 1000000.0).alias("sum_charge"),
        cavg("l_quantity", "avg_qty"),
        cavg("l_extendedprice", "avg_price"),
        cavg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "tpch_q3_priority",
    tier="B",
    oracle=f"""
    SELECT l.l_orderkey,
           SUM({sql_cents_disc("l.l_extendedprice", "l.l_discount")}) / 10000.0
             AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): filtered customer dim broadcasts into
    orders, joins lineitem on the shuffle key l_orderkey, exact-cents
    revenue, deterministic top-10 (revenue desc, orderkey tiebreak) via
    TakeOrderedAndProject."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (F.sum(cents_disc("l_extendedprice", "l_discount")) / 10000.0).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "events_funnel",
    tier="B",
    oracle="""
    WITH s AS (
      SELECT user_id, t_signup FROM (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup
        FROM events GROUP BY user_id
      ) WHERE t_signup IS NOT NULL
    ), v AS (
      SELECT e.user_id, s.t_signup, MIN(e.ts) AS t_first_view
      FROM events e
      JOIN s ON e.user_id = s.user_id
            AND e.event_type = 'view' AND e.ts > s.t_signup
      GROUP BY e.user_id, s.t_signup
    )
    SELECT e.user_id, v.t_signup, v.t_first_view,
           MIN(e.ts) AS t_first_purchase
    FROM events e
    JOIN v ON e.user_id = v.user_id
          AND e.event_type = 'purchase' AND e.ts > v.t_first_view
    GROUP BY e.user_id, v.t_signup, v.t_first_view
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel (signup -> first view after -> first purchase
    after): per-stage conditional MIN aggregation re-joined to the event
    stream.  Stage outputs are per-user (small relative to events, but
    proportional to user count), so join strategy is left to AQE: it
    broadcasts them at this scale and falls back to a shuffle join when
    the user dimension outgrows the broadcast threshold — a forced
    broadcast hint here would OOM at 1e9 users."""
    e = T(spark, sf_dir, "events")
    # Stage outputs rename their user column so the repeated event-scan
    # joins stay unambiguous (e appears in every stage's lineage).
    s = (
        e.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"))
        .filter(F.col("t_signup").isNotNull())
        .select(F.col("user_id").alias("s_user"), "t_signup")
    )
    v = (
        e.join(
            s,
            (F.col("user_id") == F.col("s_user"))
            & (F.col("event_type") == "view")
            & (F.col("ts") > F.col("t_signup")),
        )
        .groupBy("s_user", "t_signup")
        .agg(F.min("ts").alias("t_first_view"))
        .select(F.col("s_user").alias("v_user"), "t_signup", "t_first_view")
    )
    return (
        e.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t_first_view")),
        )
        .groupBy("v_user", "t_signup", "t_first_view")
        .agg(F.min("ts").alias("t_first_purchase"))
        .select(
            F.col("v_user").alias("user_id"),
            "t_signup",
            "t_first_view",
            "t_first_purchase",
        )
    )


@register(
    "tpch_q18_large_orders",
    tier="B",
    oracle=f"""
    SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {sql_csum("l.l_quantity", "sum_qty")}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING SUM({sql_cents("l.l_quantity")}) / 100.0 > 250
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume orders): the large-group semi-join shape.

    Spark-first formulation aggregates lineitem BEFORE the joins — the
    shuffle carries one row per orderkey instead of one per lineitem, and
    the HAVING filter prunes to the rare heavy orders before any join
    runs, so the orders/customer joins see only the qualifying keys (the
    semantics of Q18's IN-subquery without scanning lineitem twice).
    Equivalent to the oracle's join-then-group because o_orderkey is
    unique in orders (1:1 join preserves groups).  Deterministic top-100
    via (o_totalprice desc, o_orderkey) -> TakeOrderedAndProject."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(csum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        heavy.join(o, heavy.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q21_waiting_suppliers",
    tier="B",
    oracle="""
    SELECT s.s_name, n.n_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_nationkey < 5
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s.s_name, n.n_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) — the multi-self-join
    EXISTS/NOT-EXISTS anti pattern, adapted to this schema: "late" is
    l_shipdate > o_orderdate + 90 days (the testdata carries no
    commit/receipt dates).

    The oracle keeps the textbook correlated EXISTS shape; the Spark plan
    deliberately does NOT self-join lineitem three times.  One pass over
    lineitem+orders computes per-order (distinct suppliers, distinct LATE
    suppliers); a late lineitem qualifies iff its order has >=2 suppliers
    but exactly 1 late one (necessarily this row's).  That turns two
    correlated subqueries into one groupBy on the key the join already
    shuffles on — at 100 TB the classic formulation's l2/l3 self-joins
    re-shuffle the fact table twice; this shape shuffles it once and
    joins the per-order summary back broadcast-or-shuffle as AQE picks.
    Supplier and nation dims broadcast."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)

    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "__late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
    )
    # per-order supplier stats as WINDOW aggregates over the join's own
    # key: the window reuses the join shuffle's partitioning (one fact
    # shuffle total), where a groupBy+re-join would materialize the
    # lineitem-orders join twice — the self-join trap this query exists
    # to avoid
    w = Window.partitionBy("l_orderkey")
    staged = lo.select(
        "l_orderkey",
        "l_suppkey",
        "__late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("__n_supp"),
        F.size(
            F.collect_set(F.when(F.col("__late"), F.col("l_suppkey"))).over(w)
        ).alias("__n_late_supp"),
    )
    return (
        staged.filter(
            F.col("__late") & (F.col("__n_supp") >= 2) & (F.col("__n_late_supp") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


# GK-sketch percentiles: mergeable, bounded-memory, one pass — the scale
# path when exact percentiles (agg_percentile) would sort 100 TB.  No
# cross-engine oracle by construction (DuckDB's approx_quantile is a
# t-digest; sketch internals differ) — the rank-error bound vs the exact
# quantile is pinned in tests/test_curation.py instead.
@register("agg_approx_percentile", tier="B", oracle=None)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna) p50/p95/p99 of event value per
    type; accuracy 10000 bounds rank error at n/10000 per group."""
    e = T(spark, sf_dir, "events")
    pcts = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    return (
        e.groupBy("event_type")
        .agg(pcts.alias("__p"))
        .select(
            "event_type",
            F.element_at("__p", 1).alias("p50"),
            F.element_at("__p", 2).alias("p95"),
            F.element_at("__p", 3).alias("p99"),
        )
    )

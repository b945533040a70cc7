"""Full TPC-H query-shape suite (the 17 shapes flagship.py/analytics.py
don't already cover) adapted to the driver's reduced star schema.

With tpch_q1/q3/q5/q18/q21 (flagship.py, analytics.py) this module
completes all 22 classic TPC-H shapes — the canonical relational
completeness benchmark a warehouse user of the reference's schema
(course_catalog_database.sql star-ish layout, SURVEY.md §1.1) would
expect to run.  Schema adaptations (the testdata has no partsupp,
l_commitdate/l_receiptdate/l_shipmode, or c_phone):

- "supply cost" (Q2/Q11/Q16/Q20) derives from lineitem itself — the
  (l_partkey, l_suppkey) pairs with unit price l_extendedprice /
  l_quantity stand in for partsupp;
- "late" (Q4/Q12) is l_shipdate > o_orderdate + N days, matching the
  Q21 adaptation already proven;
- Q22's country code is c_nationkey % 10 in place of substr(c_phone).

Every money aggregate uses the exact long-cents helpers
(functions/exact.py) so value hashes are order- and engine-independent;
MIN/MAX/COUNT and single double divisions are IEEE-deterministic as-is.

Scale notes are per-query in the docstrings: dims broadcast, facts
shuffle once on their join key, selective dims prune the fact before it
moves, scalar subqueries broadcast instead of collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ub_etl_spark.functions.exact import (
    cents,
    cents_disc,
    csum,
    sql_cents,
    sql_cents_disc,
)
from ub_etl_spark.registry import register
from ub_etl_spark.sources.tables import load_table as T


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated MIN subquery)
# ---------------------------------------------------------------------------


@register(
    "tpch_q2_min_cost_supplier",
    tier="B",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
           sup.unit_cost
    FROM part p
    JOIN supply sup ON p.p_partkey = sup.l_partkey
    JOIN eu e ON sup.l_suppkey = e.s_suppkey
    WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
      AND sup.unit_cost = (
        SELECT MIN(sup2.unit_cost)
        FROM supply sup2 JOIN eu e2 ON sup2.l_suppkey = e2.s_suppkey
        WHERE sup2.l_partkey = p.p_partkey
      )
    ORDER BY e.s_acctbal DESC, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): the correlated-MIN-subquery shape.

    partsupp is derived from lineitem: per (partkey, suppkey) the minimum
    unit price (MIN of a double division — IEEE-deterministic, no sum).
    The Spark plan inverts the oracle's correlation: the tiny filtered
    part dim broadcasts INTO the lineitem scan first, so the supply
    aggregation only ever sees the qualifying parts' lines — at 100 TB
    the correlated form would aggregate the whole fact table; this form
    aggregates ~size/330th of it.  The per-part MIN then rides a window
    over the (already tiny) supply rows instead of a self-join, and the
    EU supplier dim broadcasts."""
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = T(spark, sf_dir, "lineitem")
    # The part dim semi-joins the fact BEFORE the supply aggregation (the
    # agg keys stay narrow; p_name re-joins broadcast after the filter).
    supply = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = (
        supply.join(F.broadcast(eu), supply.l_suppkey == eu.s_suppkey)
        .withColumn("__min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("__min_cost"))
    )
    return (
        best.join(F.broadcast(p.select("p_partkey", "p_name")), best.l_partkey == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi-join)
# ---------------------------------------------------------------------------


@register(
    "tpch_q4_priority_check",
    tier="B",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): EXISTS over the fact becomes a
    LEFT SEMI join — dedups matches without a distinct, never widens the
    orders side.  The date filter prunes orders before the shuffle; both
    sides exchange once on the natural key l_orderkey ("late" adapted to
    shipdate > orderdate + 45d, as in Q21)."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    li = T(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 45 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change (pure scan-filter-agg)
# ---------------------------------------------------------------------------


@register(
    "tpch_q6_forecast_revenue",
    tier="B",
    oracle=f"""
    SELECT SUM({sql_cents("l_extendedprice")} * {sql_cents("l_discount")})
             / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the pure scan-filter-aggregate
    — every predicate pushes into the parquet scan (shipdate, discount,
    quantity are all plain comparisons) and the single global sum is a
    partial-agg + 1-row final, so the only exchange carries one row per
    partition.  Revenue = price x discount in exact scale-4 cents."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        (F.sum(cents("l_extendedprice") * cents("l_discount")) / 10000.0).alias(
            "revenue"
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


@register(
    "tpch_q7_volume_shipping",
    tier="B",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, SUM(vol) / 10000.0 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             YEAR(l.l_shipdate) AS l_year,
             {sql_cents_disc("l.l_extendedprice", "l.l_discount")} AS vol
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bidirectional nation-pair revenue by
    ship year.  The supplier side resolves entirely broadcast-side
    (supplier JOIN nation, pre-filtered to the two nations — that filter
    shrinks the fact to ~2/25ths before the orders join); the fact then
    shuffles once on l_orderkey, and the customer-nation leg joins on
    o_custkey with AQE choosing broadcast vs shuffle (customer count
    scales with the data; forcing broadcast would OOM at 1e9 rows).
    The disjunctive pair predicate lands after both nations are known."""
    n = T(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    s = (
        T(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.filter(F.col("n_name").isin(pair))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        T(spark, sf_dir, "customer")
        .join(
            F.broadcast(n.filter(F.col("n_name").isin(pair))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = T(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            (F.sum(cents_disc("l_extendedprice", "l_discount")) / 10000.0).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------


@register(
    "tpch_q8_market_share",
    tier="B",
    oracle=f"""
    SELECT o_year,
           SUM(CASE WHEN supp_nation = 'NATION_2' THEN vol ELSE 0 END)
             / SUM(vol) AS mkt_share
    FROM (
      SELECT YEAR(o.o_orderdate) AS o_year,
             {sql_cents_disc("l.l_extendedprice", "l.l_discount")} AS vol,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_2's share of ECONOMY-part
    revenue sold into ASIA, by order year.  The two selective dims prune
    the fact before it moves — the filtered part dim broadcasts into the
    lineitem scan (1/6th selectivity), the ASIA customer+nation+region
    chain resolves broadcast-side, and the fact shuffles once on
    l_orderkey.  The share divides two exact long sums of the same rows,
    so the conditional-aggregate form is one pass (the naive per-nation
    subquery would scan twice)."""
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_cust = (
        T(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = T(spark, sf_dir, "lineitem")
    vol = cents_disc("l_extendedprice", "l_discount")
    return (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0)))
                / F.sum(vol)
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit
# ---------------------------------------------------------------------------


@register(
    "tpch_q9_product_profit",
    tier="B",
    oracle=f"""
    SELECT nation, o_year, SUM(amount) / 10000.0 AS sum_profit
    FROM (
      SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
             {sql_cents_disc("l.l_extendedprice", "l.l_discount")}
               - {sql_cents("p.p_retailprice")} * {sql_cents("l.l_quantity")}
               AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%gizmo%'
    )
    GROUP BY nation, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit per supplier nation per
    year for parts matching a name pattern, cost adapted to
    p_retailprice x quantity (no partsupp).  Both profit terms stay in
    exact scale-4 longs so the subtraction and sum are order-free.  The
    name-filtered part dim broadcasts into the fact scan; supplier+nation
    resolve broadcast-side; one fact shuffle on l_orderkey."""
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("%gizmo%"))
    supp = (
        T(spark, sf_dir, "supplier")
        .join(
            F.broadcast(T(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    amount = cents_disc("l_extendedprice", "l_discount") - cents(
        "p_retailprice"
    ) * cents("l_quantity")
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(amount) / 10000.0).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting
# ---------------------------------------------------------------------------


@register(
    "tpch_q10_returned_items",
    tier="B",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           SUM({sql_cents_disc("l.l_extendedprice", "l.l_discount")}) / 10000.0
             AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): top-20 customers by returned revenue
    in a half-year window.  Returnflag and date filters push into both
    fact scans; lineitem pre-aggregates per orderkey BEFORE joining
    orders (the shuffle carries one row per qualifying order, not one
    per line — same agg-before-join trick as Q18); the customer leg then
    aggregates on c_custkey and the nation dim broadcasts.  Deterministic
    top-20 via (revenue desc, custkey)."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(cents_disc("l_extendedprice", "l_discount")).alias("__rev_c")
    )
    return (
        per_order.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("__rev_c").alias("__rev_cust"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            (F.col("__rev_cust") / 10000.0).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 — important parts (scalar-subquery HAVING)
# ---------------------------------------------------------------------------


@register(
    "tpch_q11_important_parts",
    tier="B",
    oracle=f"""
    WITH scoped AS (
      SELECT l.l_partkey,
             {sql_cents_disc("l.l_extendedprice", "l.l_discount")} AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
    )
    SELECT l_partkey, SUM(v) / 10000.0 AS part_value
    FROM scoped
    GROUP BY l_partkey
    HAVING SUM(v) > (SELECT 0.001 * SUM(v) FROM scoped)
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): parts whose EU-supplied value exceeds
    0.1% of the total — the scalar-subquery-in-HAVING shape.  The EU
    supplier set resolves broadcast-side and semi-joins the fact (no
    row widening); the per-part aggregate shuffles once on l_partkey;
    the grand total is a second aggregation OVER THE PER-PART RESULTS
    (not a second fact scan) broadcast back as a 1-row cross join.
    Exact long sums make the threshold comparison engine-stable."""
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    li = T(spark, sf_dir, "lineitem")
    per_part = (
        li.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(cents_disc("l_extendedprice", "l_discount")).alias("__v"))
    )
    total = per_part.agg(F.sum("__v").alias("__tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("__v") > 0.001 * F.col("__tot"))
        .select("l_partkey", (F.col("__v") / 10000.0).alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q12 — late-shipment priority split (Q12's conditional agg shape)
# ---------------------------------------------------------------------------


@register(
    "tpch_q12_late_lines",
    tier="B",
    oracle="""
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
                THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY ship_class
    """,
)
def tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), shipmode adapted to
    a LATE/ONTIME class (shipdate vs orderdate + 30d): the
    conditional-aggregate-after-join shape.  Date filter prunes the fact
    scan; one shuffle on the join key; the two priority counters are
    single-pass conditional sums (the naive form would join twice)."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = T(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "ship_class",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
                F.lit("LATE"),
            ).otherwise(F.lit("ONTIME")),
        )
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double agg)
# ---------------------------------------------------------------------------


@register(
    "tpch_q13_customer_distribution",
    tier="B",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of per-customer order
    counts including zero-order customers — the filter must live in the
    LEFT JOIN's ON clause (in WHERE it would silently drop the zero
    bucket).  The per-customer count rides the join's own c_custkey
    shuffle; the second aggregate is over ~one row per customer and its
    key space (distinct counts) is tiny, so the final exchange is
    negligible."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q14 — promotion-effect revenue share
# ---------------------------------------------------------------------------


@register(
    "tpch_q14_promo_revenue",
    tier="B",
    oracle=f"""
    SELECT 100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                            THEN {sql_cents_disc("l.l_extendedprice", "l.l_discount")}
                            ELSE 0 END)
             / SUM({sql_cents_disc("l.l_extendedprice", "l.l_discount")})
             AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO-part share of one month's
    revenue.  Part dim broadcasts (only p_partkey/p_type read — column
    pruning reaches the scan); the month filter prunes the fact; numerator
    and denominator are exact long sums of the same single pass, divided
    once at the end in the oracle's exact textual order."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    p = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = cents_disc("l_extendedprice", "l_discount")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)))
                / F.sum(vol)
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (scalar MAX subquery)
# ---------------------------------------------------------------------------


@register(
    "tpch_q15_top_supplier",
    tier="B",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             SUM({sql_cents_disc("l_extendedprice", "l_discount")}) / 10000.0
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) achieving the quarter's
    maximum revenue — the scalar-MAX-subquery shape.  Per-supplier
    revenue aggregates in one fact shuffle on l_suppkey; the max is an
    aggregate over that (tiny) result broadcast back as a 1-row cross
    join — no second fact scan, no collect.  Exact cents sums make the
    double equality engine-safe."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        (F.sum(cents_disc("l_extendedprice", "l_discount")) / 10000.0).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    s = T(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (NOT IN + count distinct)
# ---------------------------------------------------------------------------


@register(
    "tpch_q16_supplier_count",
    tier="B",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
      AND l.l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct supplier count
    per (brand, type, size), excluding flagged suppliers (negative
    acctbal stands in for the complaints comment scan).  The NOT IN
    becomes a LEFT ANTI broadcast join (s_suppkey is never NULL here —
    the NOT IN NULL trap doesn't bite, and anti-join is the 100 TB form);
    the filtered part dim broadcasts into the fact scan; count distinct
    expands to a two-phase exact aggregation on Spark's side."""
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = T(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated AVG subquery)
# ---------------------------------------------------------------------------


@register(
    "tpch_q17_small_qty_revenue",
    tier="B",
    oracle=f"""
    SELECT SUM({sql_cents("l.l_extendedprice")}) / 100.0 / 5.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND l.l_quantity < (
        SELECT 0.5 * (SUM({sql_cents("l2.l_quantity")}) / 100.0
                        / COUNT(l2.l_quantity))
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines below half their
    part's average quantity — the correlated-AVG shape.  The filtered
    part dim broadcasts into the fact scan FIRST, so the correlated
    average is computed only for qualifying parts' lines (lines of a part
    all share its brand, so the restriction is exact); the average then
    rides a window over l_partkey instead of a self-join — one fact
    shuffle total.  The avg reproduces the oracle's exact float order:
    (cents sum / 100.0) / count, halved."""
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    li = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(cents("l_quantity")).over(w) / 100.0 / F.count("l_quantity").over(w)
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("__avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.5 * F.col("__avg_qty"))
        .agg((F.sum(cents("l_extendedprice")) / 100.0 / 5.0).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive-predicate revenue
# ---------------------------------------------------------------------------


@register(
    "tpch_q19_disjunctive_filter",
    tier="B",
    oracle=f"""
    SELECT SUM({sql_cents_disc("l.l_extendedprice", "l.l_discount")}) / 10000.0
             AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
             AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
             AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
             AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): the disjunctive cross-table
    predicate that defeats naive pushdown.  The equi-join on p_partkey
    stays a broadcast hash join (the OR lands as a post-join filter, not
    in the join condition, so join detection is unaffected); the
    part-only disjuncts' union (brand IN + size <= 15) is additionally
    pre-applied to the broadcast side — a hand-derived implied filter
    that shrinks the build side ~10x, which Catalyst does not infer from
    an OR across tables."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    disj = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(disj)
        .agg(
            (F.sum(cents_disc("l_extendedprice", "l_discount")) / 10000.0).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested semi-join chain)
# ---------------------------------------------------------------------------


@register(
    "tpch_q20_promotion_suppliers",
    tier="B",
    oracle=f"""
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey,
             SUM({sql_cents("l.l_quantity")}) AS qty_c
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_partkey, l.l_suppkey
    ), tot AS (
      SELECT l_partkey, SUM(qty_c) AS tot_c FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM shipped sh
    JOIN tot t ON sh.l_partkey = t.l_partkey
    JOIN part p ON p.p_partkey = sh.l_partkey AND p.p_name LIKE 'red%'
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    WHERE sh.qty_c > 0.3 * t.tot_c
    """,
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): EU suppliers who shipped
    >30% of a red part's yearly volume (availqty adapted to shipped
    share — no partsupp).  The name-filtered part dim broadcasts into
    the fact scan before aggregation; per-(part, supplier) quantities
    aggregate in one fact shuffle; the per-part total is a window over
    the aggregated rows (reusing their partitioning, no self-join); the
    supplier/nation/region chain broadcasts; DISTINCT dedups the final
    ~supplier-sized result."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    shipped = (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(cents("l_quantity")).alias("qty_c"))
    )
    w = Window.partitionBy("l_partkey")
    qualified = shipped.withColumn("tot_c", F.sum("qty_c").over(w)).filter(
        F.col("qty_c") > 0.3 * F.col("tot_c")
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        qualified.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", "n_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers (anti-join + scalar AVG)
# ---------------------------------------------------------------------------


@register(
    "tpch_q22_dormant_customers",
    tier="B",
    oracle=f"""
    WITH pool AS (
      SELECT c_nationkey % 10 AS cntrycode, c_custkey, c_acctbal
      FROM customer
      WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)
    ), thresh AS (
      SELECT SUM({sql_cents("c_acctbal")}) / 100.0 / COUNT(c_acctbal) AS avg_bal
      FROM pool WHERE c_acctbal > 0.0
    )
    SELECT pool.cntrycode, COUNT(*) AS numcust,
           SUM({sql_cents("pool.c_acctbal")}) / 100.0 AS totacctbal
    FROM pool, thresh
    WHERE pool.c_acctbal > thresh.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = pool.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY pool.cntrycode
    """,
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): high-balance customers with
    no orders, grouped by country code (c_nationkey % 10 stands in for
    the phone prefix; "dormant" = no order since 2000 so the check is
    non-vacuous at every sf).  The positive-balance average is a 1-row
    aggregate broadcast back (scalar subquery, no collect); NOT EXISTS
    becomes a LEFT ANTI join against the date-filtered orders — at scale
    both sides hash-exchange on custkey, and the anti side carries only
    o_custkey after pruning.  Exact cents sums for both the threshold
    and the output balance."""
    c = T(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.col("c_nationkey") % 10
    )
    pool = c.filter(F.col("cntrycode").isin(1, 2, 3, 4, 5)).select(
        "cntrycode", "c_custkey", "c_acctbal"
    )
    thresh = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(cents("c_acctbal")) / 100.0 / F.count("c_acctbal")).alias("avg_bal")
    )
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01"))
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents("c_acctbal")) / 100.0).alias("totacctbal"),
        )
    )

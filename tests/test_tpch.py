"""Full-TPC-H-suite semantic invariants (queries/tpch.py): properties the
oracle hash alone doesn't pin — correlated-subquery minimality, histogram
completeness, scalar-threshold scoping, disjunct exclusivity."""

from __future__ import annotations

from pyspark.sql import functions as F

from ub_etl_spark.queries.tpch import (
    tpch_q2_min_cost_supplier,
    tpch_q11_important_parts,
    tpch_q12_late_lines,
    tpch_q13_customer_distribution,
    tpch_q14_promo_revenue,
    tpch_q15_top_supplier,
    tpch_q22_dormant_customers,
)
from ub_etl_spark.sources.tables import load_table


def test_q2_winner_is_the_minimum_eu_cost(spark, sf_dir):
    """Every returned (part, supplier) pair must carry that part's minimum
    EU unit cost — two suppliers for one part may tie, but no returned
    cost may exceed another returned cost for the same part."""
    rows = tpch_q2_min_cost_supplier(spark, sf_dir).collect()
    by_part: dict[int, set[float]] = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.unit_cost)
    # all winners for one part share a single (minimal) cost
    assert by_part and all(len(costs) == 1 for costs in by_part.values())


def test_q11_every_part_clears_the_threshold(spark, sf_dir):
    """Each returned part's value must exceed 0.1% of the sum of ALL
    per-part values (recomputed independently from the full scoped set,
    not just the returned rows)."""
    out = tpch_q11_important_parts(spark, sf_dir)
    rows = out.collect()
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    total = (
        li.join(eu, li.l_suppkey == eu.s_suppkey, "left_semi")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
                * (100 - F.floor(F.col("l_discount") * 100 + 0.5).cast("long"))
            )
        )
        .collect()[0][0]
    )
    threshold = 0.001 * total / 10000.0
    assert rows and all(row.part_value > threshold for row in rows)


def test_q12_line_counts_partition_the_joined_window(spark, sf_dir):
    """high + low line counts across both ship classes must equal the
    number of 1997-shipped lineitem rows (every joined line lands in
    exactly one class and one priority bucket)."""
    rows = tpch_q12_late_lines(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    assert sum(r.high_line_count + r.low_line_count for r in rows) == li.count()
    assert {r.ship_class for r in rows} <= {"LATE", "ONTIME"}


def test_q13_histogram_covers_every_customer_including_zero(spark, sf_dir):
    """custdist sums to the customer count, and customers whose only
    orders are 5-LOW (or who have none) land in the 0 bucket rather than
    vanishing — the ON-clause-filter property Q13 exists to test."""
    rows = tpch_q13_customer_distribution(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust
    assert all(r.c_count >= 0 for r in rows)


def test_q14_share_is_a_percentage(spark, sf_dir):
    val = tpch_q14_promo_revenue(spark, sf_dir).collect()[0].promo_revenue
    assert 0.0 <= val <= 100.0


def test_q15_winner_matches_independent_max(spark, sf_dir):
    """The returned supplier revenue equals the maximum over an
    independently computed per-supplier revenue table."""
    rows = tpch_q15_top_supplier(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    mx = (
        li.groupBy("l_suppkey")
        .agg(
            (
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
                    * (100 - F.floor(F.col("l_discount") * 100 + 0.5).cast("long"))
                )
                / 10000.0
            ).alias("rev")
        )
        .agg(F.max("rev"))
        .collect()[0][0]
    )
    assert rows and all(r.total_revenue == mx for r in rows)


def test_q22_dormant_customers_have_no_recent_orders(spark, sf_dir):
    """Returned country codes stay within the filtered set, and the
    groups are non-empty (the 2000-01-01 dormancy cutoff guarantees
    matches at every sf — a 0-row result would make the oracle check
    vacuous)."""
    rows = tpch_q22_dormant_customers(spark, sf_dir).collect()
    assert rows
    assert {r.cntrycode for r in rows} <= {1, 2, 3, 4, 5}
    assert all(r.numcust > 0 for r in rows)

"""Warehouse-modeling invariants (queries/warehouse.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ub_etl_spark.queries.warehouse import (
    dim_date_generate,
    orders_abc_classification,
    orders_rfm_segmentation,
)
from ub_etl_spark.sources.tables import load_table


def test_date_dim_is_gapless_and_accounts_every_order(spark, sf_dir):
    """One row per calendar day over the observed range (no gaps, no
    dups), and per-day counts sum to the order count — including
    zero-order days staying present."""
    rows = dim_date_generate(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    n_orders = o.count()
    days = sorted(r.d for r in rows)
    assert len(days) == len(set(days))
    assert (days[-1] - days[0]).days + 1 == len(days)
    assert sum(r.n_orders for r in rows) == n_orders
    assert any(r.n_orders == 0 for r in rows) or len(days) == o.select(
        F.col("o_orderdate").cast("date")
    ).distinct().count()
    for r in rows[:50]:
        assert (r.dow in (0, 6)) == r.is_weekend


def test_rfm_quintiles_are_balanced_and_consistent(spark, sf_dir):
    """Each quintile column splits customers into 5 near-equal groups;
    segment string mirrors the three scores; quintile 1 of monetary has
    a higher minimum spend than quintile 5's maximum."""
    rows = orders_rfm_segmentation(spark, sf_dir).collect()
    n = len(rows)
    for col in ("r_q", "f_q", "m_q"):
        sizes = {}
        for r in rows:
            sizes[r[col]] = sizes.get(r[col], 0) + 1
        assert set(sizes) == {1, 2, 3, 4, 5}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (col, sizes)
    assert all(r.segment == f"{r.r_q}{r.f_q}{r.m_q}" for r in rows)
    m1 = min(r.monetary for r in rows if r.m_q == 1)
    m5 = max(r.monetary for r in rows if r.m_q == 5)
    assert m1 >= m5
    assert n == load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()


def test_abc_classes_respect_cumulative_cuts(spark, sf_dir):
    """Revenue-descending traversal: class A rows all precede B, B
    precede C; A's cumulative share <= 20%, A+B's <= 50% + one row
    (the boundary row that crosses the cut belongs to the next class)."""
    rows = orders_abc_classification(spark, sf_dir).collect()
    rows.sort(key=lambda r: (-r.revenue, r.l_partkey))
    seen = [r.abc_class for r in rows]
    # class sequence must be monotone A* B* C*
    assert "".join(seen).lstrip("A").lstrip("B").strip("C") == ""
    total = sum(r.revenue for r in rows)
    cum = 0.0
    for r in rows:
        cum += r.revenue
        if r.abc_class == "A":
            assert cum <= 0.2 * total * (1 + 1e-9)
        elif r.abc_class == "B":
            assert cum <= 0.5 * total * (1 + 1e-9)


def test_customer_features_covers_every_ordering_customer(spark, sf_dir):
    """One feature row per customer WITH orders; single-order customers
    keep avg_gap_days 0 (the LEFT join property); centered balances sum
    to ~0 within each segment by construction."""
    from ub_etl_spark.queries.warehouse import pipeline_customer_features

    rows = pipeline_customer_features(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    n_ordering = o.select("o_custkey").distinct().count()
    assert len(rows) == n_ordering
    single = [r for r in rows if r.frequency == 1]
    assert all(r.avg_gap_days == 0.0 for r in single)
    assert all((r.frequency >= 10) == (r.is_frequent == 1) for r in rows)


def test_backlog_never_negative_and_drains_to_zero(spark, sf_dir):
    """Backlog is non-negative everywhere and returns to exactly zero at
    the last close date (every +1 has its -1)."""
    from ub_etl_spark.queries.warehouse import orders_open_backlog_daily

    rows = sorted(orders_open_backlog_daily(spark, sf_dir).collect(), key=lambda r: r.d)
    assert all(r.open_orders >= 0 for r in rows)
    assert rows[-1].open_orders == 0
    assert max(r.open_orders for r in rows) > 0


def test_yoy_growth_null_first_year_then_matches_ratio(spark, sf_dir):
    from ub_etl_spark.queries.warehouse import lineitem_yoy_growth

    rows = sorted(lineitem_yoy_growth(spark, sf_dir).collect(), key=lambda r: (r.y, r.m))
    assert all(r.yoy_growth is None for r in rows[:12])
    by_key = {(r.y, r.m): r for r in rows}
    for r in rows[12:]:
        prev = by_key.get((r.y - 1, r.m))
        if prev is not None:
            assert abs((1 + r.yoy_growth) * prev.revenue - r.revenue) < 1e-6

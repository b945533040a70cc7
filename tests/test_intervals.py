"""Agg-shaped interval coalescing must equal the windowed episode stitch
(operators/intervals.py vs queries/warehouse.orders_active_episodes)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ub_etl_spark.operators.intervals import coalesce_intervals_agg


def _rows(df):
    return sorted(
        (
            r[0],
            r.episode,
            r.episode_start,
            r.episode_end,
            r.n_orders,
        )
        for r in df.collect()
    )


def test_matches_windowed_episodes_on_corpus(spark, sf_dir):
    from ub_etl_spark.registry import load_all

    windowed = _rows(load_all()["orders_active_episodes"].fn(spark, sf_dir))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    last_ship = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.max("l_shipdate").alias("iv_end")
    )
    iv = o.select(
        "o_custkey", F.col("o_orderdate").alias("iv_start"), "o_orderkey"
    ).join(last_ship, "o_orderkey")
    agg = _rows(coalesce_intervals_agg(iv, "o_custkey", "iv_start", "iv_end"))
    assert agg == windowed


def test_cross_month_chain_and_gap(spark):
    """An episode chaining across three month buckets must come out as ONE
    episode (the phase-2 merge), and a true gap must split."""
    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    df = spark.createDataFrame(
        [
            # key 1: [Jan10, Feb05] -> [Feb01, Mar03] -> [Mar03, Mar20] chain
            (1, ts("2024-01-10"), ts("2024-02-05")),
            (1, ts("2024-02-01"), ts("2024-03-03")),
            (1, ts("2024-03-03"), ts("2024-03-20")),
            # key 1: gap, then a second episode
            (1, ts("2024-06-01"), ts("2024-06-02")),
            # key 2: long first interval COVERS a later short one (running
            # max, not lag — the case a prev-end lag gets wrong)
            (2, ts("2024-01-01"), ts("2024-05-01")),
            (2, ts("2024-02-01"), ts("2024-02-02")),
            (2, ts("2024-07-01"), ts("2024-07-02")),
        ],
        "k bigint, s timestamp, e timestamp",
    )
    got = _rows(coalesce_intervals_agg(df, "k", "s", "e"))
    assert got == [
        (1, 1, ts("2024-01-10"), ts("2024-03-20"), 3),
        (1, 2, ts("2024-06-01"), ts("2024-06-02"), 1),
        (2, 1, ts("2024-01-01"), ts("2024-05-01"), 2),
        (2, 2, ts("2024-07-01"), ts("2024-07-02"), 1),
    ]

"""Two-phase global row_number / NTILE (operators/selection.py) must equal
the windowed forms row-for-row — the global-order scale levers beside the
`equidepth_ntile_global` watch item in SCALING.md."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ub_etl_spark.operators.selection import (
    global_row_number_two_phase,
    ntile_two_phase,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_row_number_matches_windowed(spark, sf_dir):
    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    order = ["o_totalprice", "o_orderkey"]
    win = o.select(
        "o_orderkey",
        F.row_number().over(W.orderBy(*order)).alias("rn"),
    )
    two = global_row_number_two_phase(o, order, out="rn", num_partitions=8)
    mism = (
        two.select("o_orderkey", "rn")
        .join(win.withColumnRenamed("rn", "rn_w"), "o_orderkey")
        .filter(F.col("rn") != F.col("rn_w"))
        .count()
    )
    assert mism == 0


def test_row_number_total_and_determinism(spark, sf_dir):
    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    order = ["o_totalprice", "o_orderkey"]
    two = global_row_number_two_phase(
        o, order, out="rn", num_partitions=8, total_out="n"
    )
    n_rows = o.count()
    # rn is a permutation of 1..n and the attached total is the row count
    agg = two.agg(
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
        F.countDistinct("rn").alias("nd"),
        F.min("n").alias("n1"),
        F.max("n").alias("n2"),
    ).collect()[0]
    assert (agg.lo, agg.hi, agg.nd) == (1, n_rows, n_rows)
    assert agg.n1 == agg.n2 == n_rows
    # two independent executions assign identical numbers (the
    # mono-id-after-local-sort step is deterministic, not merely valid)
    a = {r.o_orderkey: r.rn for r in two.collect()}
    b = {
        r.o_orderkey: r.rn
        for r in global_row_number_two_phase(
            o, order, out="rn", num_partitions=8
        ).collect()
    }
    assert a == b


def test_ntile_matches_windowed_on_corpus(spark, sf_dir):
    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    order = ["o_totalprice", "o_orderkey"]
    for k in (10, 7):
        win = o.select(
            "o_orderkey", F.ntile(k).over(W.orderBy(*order)).alias("b_w")
        )
        two = ntile_two_phase(o, k, order, out="b", num_partitions=8)
        mism = (
            two.select("o_orderkey", "b")
            .join(win, "o_orderkey")
            .filter(F.col("b") != F.col("b_w"))
            .count()
        )
        assert mism == 0


def test_ntile_small_n_and_ties(spark):
    # n < k (every bucket gets one row) and duplicate first-order-col
    # values broken by the unique tiebreak — both forms must agree
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0), (4, 1.0)], "id bigint, v double"
    )
    order = ["v", "id"]
    win = df.select("id", F.ntile(10).over(W.orderBy(*order)).alias("b_w"))
    two = ntile_two_phase(df, 10, order, out="b", num_partitions=3)
    got = {r.id: r.b for r in two.collect()}
    want = {r.id: r.b_w for r in win.collect()}
    assert got == want


def test_empty_input(spark):
    df = spark.createDataFrame([], "id bigint, v double")
    assert ntile_two_phase(df, 4, ["v", "id"]).count() == 0
    assert (
        global_row_number_two_phase(df, ["v", "id"], total_out="n").count()
        == 0
    )


def test_mid_consecutiveness_invariant_is_loud(spark, monkeypatch):
    """r7 ADVICE: global_row_number_two_phase leans on an implementation
    detail (mid consecutive within a partition); the operator's stats
    frame must RAISE if the id layout ever changes, not mis-number.
    Simulate the layout change by patching the id generator to stride by
    2 — the REAL operator path must then fail loudly (the invariant
    holding on legitimate calls is exercised by every equality test
    above)."""
    import pytest
    from pyspark.sql import functions as F

    from ub_etl_spark.operators import selection as sel

    real = F.monotonically_increasing_id
    monkeypatch.setattr(
        sel.F, "monotonically_increasing_id", lambda: real() * 2
    )
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    with pytest.raises(Exception, match="not consecutive"):
        global_row_number_two_phase(
            df, ["v", "id"], out="rn", num_partitions=4
        ).collect()

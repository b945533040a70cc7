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


def test_arrow_form_matches_windowed_on_corpus(spark, sf_dir):
    from ub_etl_spark.operators.intervals import coalesce_intervals_arrow
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
    got = _rows(coalesce_intervals_arrow(iv, "o_custkey", "iv_start", "iv_end"))
    assert got == windowed


def test_arrow_cross_batch_carry(spark):
    """Force multi-batch partitions (maxRecordsPerBatch=2) so episodes
    span Arrow batches and keys change at batch boundaries — the carry
    path must produce exactly the agg form's answer."""
    from datetime import datetime

    from ub_etl_spark.operators.intervals import (
        coalesce_intervals_agg,
        coalesce_intervals_arrow,
    )

    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    rows = []
    # key 1: one long chain of 7 touching intervals -> ONE episode that
    # must survive several batch carries, then a gap episode
    for d in range(7):
        rows.append((1, ts(f"2024-01-{10+d:02d}"), ts(f"2024-01-{11+d:02d}")))
    rows.append((1, ts("2024-05-01"), ts("2024-05-02")))
    # key 2: starts mid-batch; covering interval then far gap
    rows.append((2, ts("2024-01-01"), ts("2024-04-01")))
    rows.append((2, ts("2024-02-01"), ts("2024-02-02")))
    rows.append((2, ts("2024-06-01"), ts("2024-06-02")))
    # key 3: single row (open episode flushed at iterator end)
    rows.append((3, ts("2024-03-01"), ts("2024-03-05")))
    df = spark.createDataFrame(rows, "k bigint, s timestamp, e timestamp")
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "2")
    try:
        # num_partitions=1 puts every key in ONE partition stream: the
        # hardest carry case (key changes always inside a partition)
        got = _rows(coalesce_intervals_arrow(df, "k", "s", "e", num_partitions=1))
    finally:
        spark.conf.set(conf, prev)
    want = _rows(coalesce_intervals_agg(df, "k", "s", "e"))
    assert got == want
    assert len(want) == 5  # 2 + 2 + 1 episodes


def test_null_precondition_raises_in_both_forms(spark):
    """r7 ADVICE: a NULL key/start/end must fail loudly and identically in
    the agg and Arrow forms, never silently mis-stitch."""
    import pytest

    from ub_etl_spark.operators.intervals import (
        coalesce_intervals_agg,
        coalesce_intervals_arrow,
    )

    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01"), ts("2024-01-05")),
            (1, None, ts("2024-02-05")),
        ],
        "k bigint, s timestamp, e timestamp",
    )
    for form in (coalesce_intervals_agg, coalesce_intervals_arrow):
        with pytest.raises(Exception, match="non-null precondition"):
            form(df, "k", "s", "e").collect()
    # the guard passes clean frames through untouched
    clean = df.filter(F.col("s").isNotNull())
    assert coalesce_intervals_agg(clean, "k", "s", "e").count() == 1
    assert coalesce_intervals_arrow(clean, "k", "s", "e").count() == 1


def test_session_gap_boundary_synthetic(spark):
    """r8 ADVICE: pin the 30-minute session-gap boundary with a synthetic
    frame instead of relying on the fixture corpus containing exact
    30-minute ties.  An EXACT 30-minute gap merges (touching intervals;
    the lag form's ``gap <= INTERVAL 30 MINUTES``); 30min+1s splits."""
    from datetime import timedelta

    from pyspark.sql import Window as W

    from ub_etl_spark.operators.intervals import (
        coalesce_intervals_agg,
        coalesce_intervals_arrow,
    )

    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    gap = timedelta(minutes=30)
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00:00")),
            (1, ts("2024-01-01 00:30:00")),  # exactly 30 min -> same session
            (2, ts("2024-01-01 00:00:00")),
            (2, ts("2024-01-01 00:30:01")),  # 30 min + 1 s -> new session
        ],
        "k bigint, ts timestamp",
    )
    iv = df.select(
        "k",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    want = [
        (1, 1, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), 2),
        (2, 1, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00"), 1),
        (2, 2, ts("2024-01-01 00:30:01"), ts("2024-01-01 01:00:01"), 1),
    ]
    for form in (coalesce_intervals_agg, coalesce_intervals_arrow):
        assert _rows(form(iv, "k", "s", "e")) == want, form.__name__
    # ... and the lag-based sessionization (stream_session_window's exact
    # shape) agrees at both boundaries: session_end == episode_end - gap.
    w = W.partitionBy("k").orderBy("ts")
    lag_gap = F.col("ts") - F.lag("ts").over(w)
    sess = (
        df.select(
            "k",
            "ts",
            F.when(lag_gap <= F.expr("INTERVAL 30 MINUTES"), F.lit(0))
            .otherwise(F.lit(1))
            .alias("is_new"),
        )
        .select(
            "k",
            "ts",
            F.sum("is_new")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("sid"),
        )
        .groupBy("k", "sid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("s0"),
            F.max("ts").alias("e0"),
        )
    )
    got_sessions = sorted((r.k, r.sid, r.s0, r.e0, r.n) for r in sess.collect())
    want_sessions = [(k, ep, s0, e0 - gap, n) for (k, ep, s0, e0, n) in want]
    assert got_sessions == want_sessions


def test_session_window_as_interval_coalescing(spark, sf_dir):
    """Sessions ARE coalesced [ts, ts+gap] intervals (scale_smoke's
    session_window_arrow lever): equal-length intervals make the running
    max the previous end, so 'touching or overlapping' == gap <= 30 min —
    the Arrow interval scan must reproduce stream_session_window
    row-for-row."""
    from ub_etl_spark.operators.intervals import coalesce_intervals_arrow
    from ub_etl_spark.registry import load_all
    from ub_etl_spark.sources.tables import load_table

    windowed = sorted(
        (r.user_id, r.session_id, r.n_events, r.session_start, r.session_end)
        for r in load_all()["stream_session_window"].fn(spark, sf_dir).collect()
    )
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("iv_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("iv_end"),
    )
    eps = coalesce_intervals_arrow(e, "user_id", "iv_start", "iv_end")
    arrow = sorted(
        (
            r.user_id,
            r.episode,
            r.n_orders,
            r.episode_start,
            r.episode_end - __import__("datetime").timedelta(minutes=30),
        )
        for r in eps.collect()
    )
    assert arrow == windowed


def test_duplicate_interval_ties_stable_across_forms(spark):
    """Exact duplicate intervals per key — the tie shape that broke
    orders_active_episodes at sf1 (r15): the cumulative-sum window's
    order must repeat the flag window's FULL total order, or a tie swap
    re-partitions episode membership.  Pin the windowed form against the
    order-free agg union on a fixture built entirely of such ties,
    across several physical orderings."""
    from datetime import date

    from ub_etl_spark.registry import load_all

    rows = [
        # custkey, orderkey, orderdate, shipdate: dup intervals back to back
        (1, 101, date(2024, 1, 1), date(2024, 1, 5)),
        (1, 102, date(2024, 1, 1), date(2024, 1, 5)),  # exact dup of 101
        (1, 103, date(2024, 1, 10), date(2024, 1, 12)),
        (1, 104, date(2024, 1, 10), date(2024, 1, 12)),  # exact dup of 103
        (1, 105, date(2024, 1, 11), date(2024, 1, 20)),
        (2, 201, date(2024, 2, 1), date(2024, 2, 2)),
        (2, 202, date(2024, 2, 1), date(2024, 2, 2)),  # dup, singleton episode
    ]
    expected = [
        (1, 1, date(2024, 1, 1), date(2024, 1, 5), 2),
        (1, 2, date(2024, 1, 10), date(2024, 1, 20), 3),
        (2, 1, date(2024, 2, 1), date(2024, 2, 2), 2),
    ]
    import tempfile

    for order in (rows, rows[::-1], rows[3:] + rows[:3]):
        with tempfile.TemporaryDirectory(prefix="ub_etl_tie_") as d:
            spark.createDataFrame(
                [(c, k, od) for c, k, od, _ in order],
                "o_custkey long, o_orderkey long, o_orderdate date",
            ).repartition(4).write.parquet(f"{d}/orders.parquet")
            spark.createDataFrame(
                [(k, sd) for _, k, _, sd in order],
                "l_orderkey long, l_shipdate date",
            ).repartition(4).write.parquet(f"{d}/lineitem.parquet")
            got = _rows(load_all()["orders_active_episodes"].fn(spark, d))
            assert got == expected, f"ordering {order[0]}: {got}"

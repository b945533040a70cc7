"""As-of join semantics tests: backward-inclusive, NULL on no-match,
window and applyInPandas variants agree."""

from __future__ import annotations

from datetime import datetime

from ub_etl_spark.operators.asof import asof_join, asof_join_grouped


def ts(m):
    return datetime(2024, 1, 1, 0, m)


def fixtures(spark):
    left = spark.createDataFrame(
        [(1, ts(5), "p1"), (1, ts(10), "p2"), (2, ts(3), "p3"), (3, ts(1), "p4")],
        "user_id long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, ts(5), 100), (1, ts(8), 101), (2, ts(2), 102), (2, ts(9), 103)],
        "user_id long, rts timestamp, rid int",
    )
    return left, right


EXPECTED = {
    ("p1", 100),  # equal ts matches (inclusive)
    ("p2", 101),  # latest <= 00:10 is 00:08
    ("p3", 102),  # 00:09 is in the future -> 00:02 wins
    ("p4", None),  # user 3 has no right rows
}


def test_asof_window_variant(spark):
    left, right = fixtures(spark)
    out = asof_join(left, right, ["user_id"], "ts", "rts", ["rid"])
    assert {(r.pid, r.rid) for r in out.collect()} == EXPECTED
    assert out.count() == left.count()


def test_asof_grouped_variant_agrees(spark):
    left, right = fixtures(spark)
    a = asof_join(left, right, ["user_id"], "ts", "rts", ["rid"])
    b = asof_join_grouped(left, right, ["user_id"], "ts", "rts", ["rid"])
    assert {(r.pid, r.rid) for r in b.collect()} == {(r.pid, r.rid) for r in a.collect()}


def test_asof_forward_picks_earliest_at_or_after(spark):
    """Forward direction: inclusive on equal ts, earliest match wins,
    NULL when no right row at-or-after."""
    from ub_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40)], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c")], "k long, rts long, v string"
    )
    out = {
        r.lts: r.v
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["v"], direction="forward"
        ).collect()
    }
    assert out == {10: "a", 25: "c", 40: None}


def test_asof_null_left_ts_yields_null_both_directions(spark):
    """A NULL left timestamp matches nothing in either direction (ADVICE
    r2: desc's default nulls-last made forward mode hand a NULL-ts row
    the smallest right ts)."""
    left = spark.createDataFrame([(1, None), (1, 25)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "c")], "k long, rts long, v string"
    )
    for direction in ("backward", "forward"):
        rows = asof_join(
            left, right, ["k"], "lts", "rts", ["v"], direction=direction
        ).collect()
        got = {r.lts: r.v for r in rows}
        assert got[None] is None, direction
        assert got[25] == ("a" if direction == "backward" else "c")

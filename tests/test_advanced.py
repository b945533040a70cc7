"""Advanced-analytics semantic invariants (queries/advanced.py):
frontier minimality/completeness, regression vs closed-form reference,
attribution accounting, bucket depth, Gini bounds, band completeness."""

from __future__ import annotations

from pyspark.sql import functions as F

from ub_etl_spark.queries.advanced import (
    agg_gini_concentration,
    agg_linear_regression,
    events_attribution_last_touch,
    join_theta_band,
    quantile_bucket_equidepth,
    skyline_pareto_frontier,
)
from ub_etl_spark.sources.tables import load_table


def test_skyline_matches_bruteforce(spark, sf_dir):
    """The two-phase frontier must equal the O(n^2) domination check run
    in plain python over the collected dimension."""
    got = {
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in skyline_pareto_frontier(spark, sf_dir).collect()
    }
    parts = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    expect = {
        p
        for p in parts
        if not any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in parts
        )
    }
    assert got == expect and got


def test_regression_matches_python_closed_form(spark, sf_dir):
    """Slope/intercept must match the same closed form computed in exact
    python integers from the raw rows."""
    rows = {r.l_returnflag: r for r in agg_linear_regression(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    groups: dict[str, list] = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(r)
    import math

    for flag, grp in groups.items():
        xs = [math.floor(r.l_quantity * 100 + 0.5) for r in grp]
        ys = [math.floor(r.l_extendedprice * 100 + 0.5) for r in grp]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        den = float(n * sxx - sx * sx)
        assert rows[flag].slope == float(n * sxy - sx * sy) / den
        assert rows[flag].intercept == float(sy * sxx - sx * sxy) / den / 100.0


def test_attribution_purchases_fully_accounted(spark, sf_dir):
    """Every purchase lands in exactly one channel: per-channel counts
    sum to the purchase count, and channels never include 'purchase'."""
    rows = events_attribution_last_touch(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    n_purch = e.filter(F.col("event_type") == "purchase").count()
    assert sum(r.n_purchases for r in rows) == n_purch
    assert "purchase" not in {r.channel for r in rows}


def test_equidepth_buckets_are_balanced_and_ordered(spark, sf_dir):
    """Bucket sizes differ by at most 1 (NTILE's defining property),
    cover the whole table, and bucket value ranges don't overlap out of
    order (hi of bucket k <= lo of bucket k+1)."""
    rows = sorted(quantile_bucket_equidepth(spark, sf_dir).collect(), key=lambda r: r.bucket)
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == total
    sizes = [r.n_orders for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_gini_within_bounds_and_scale_invariant(spark, sf_dir):
    row = agg_gini_concentration(spark, sf_dir).collect()[0]
    assert 0.0 <= row.gini < 1.0
    assert row.n_customers > 0


def test_theta_band_complete_and_minimal(spark, sf_dir):
    """The bucketed candidate join must return EXACTLY the brute-force
    band pairs — no duplicate from multi-bucket candidacy, no pair lost
    at a bucket boundary."""
    got = sorted(
        (r.suppkey_a, r.suppkey_b) for r in join_theta_band(spark, sf_dir).collect()
    )
    sup = [
        (r.s_suppkey, round(r.s_acctbal * 100))
        for r in load_table(spark, sf_dir, "supplier").collect()
    ]
    expect = sorted(
        (a, b)
        for a, ba in sup
        for b, bb in sup
        if a < b and abs(ba - bb) <= 500
    )
    assert got == expect


def test_hierarchy_covers_every_node_once_with_consistent_paths(spark, sf_dir):
    """Every customer appears exactly once; path starts at root, ends at
    the node, and has depth+1 hops; parent relation holds along paths."""
    from ub_etl_spark.queries.advanced import hierarchy_flatten_paths

    rows = hierarchy_flatten_paths(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "customer").count()
    assert len(rows) == n
    assert len({r.k for r in rows}) == n
    for r in rows[:200]:
        hops = [int(x) for x in r.path.split(">")]
        assert hops[0] == r.root and hops[-1] == r.k
        assert len(hops) == r.depth + 1
        for parent, child in zip(hops, hops[1:]):
            assert child // 10 == parent


def test_approx_equidepth_balanced_and_complete(spark, sf_dir):
    """Approximate buckets partition the table (counts sum to total, 10
    buckets, ordered non-overlapping ranges) and each depth stays within
    5% of the ideal n/10 (GK accuracy 1e-4 makes boundaries near-exact
    at test scale)."""
    from ub_etl_spark.queries.advanced import quantile_bucket_approx

    rows = sorted(quantile_bucket_approx(spark, sf_dir).collect(), key=lambda r: r.bucket)
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == total
    assert [r.bucket for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
    ideal = total / len(rows)
    # each bucket within 2% of the table size of its ideal depth
    assert all(abs(r.n_orders - ideal) <= 0.02 * total for r in rows)


def test_interval_coalesce_covers_exact_union(spark):
    """Property (orders_active_episodes' core): merged episodes cover
    exactly the union of input intervals and never overlap each other —
    on randomized variable-length intervals per key, checked against a
    pure-python sweep."""
    import random

    from pyspark.sql import Window, functions as F

    rng = random.Random(41)
    rows = []
    for key in range(5):
        for i in range(40):
            s = rng.randrange(0, 300)
            rows.append((key, i, s, s + rng.randrange(0, 40)))
    df = spark.createDataFrame(rows, "k int, oid int, s int, e int")
    w_prev = (
        Window.partitionBy("k")
        .orderBy("s", "e", "oid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("e").over(w_prev)
    flagged = df.select(
        "k", "s", "e",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0).alias("ne"),
    )
    w_cum = (
        Window.partitionBy("k").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    eps = (
        flagged.select("k", "s", "e", F.sum("ne").over(w_cum).alias("ep"))
        .groupBy("k", "ep")
        .agg(F.min("s").alias("es"), F.max("e").alias("ee"))
        .collect()
    )
    # python reference: merge per key (touching intervals merge — the
    # prev_max rule treats s == prev_max as overlapping)
    by_key = {}
    for k, oid, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, ivs in by_key.items():
        merged = []
        for s, e in sorted(ivs):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        got = sorted((r.es, r.ee) for r in eps if r.k == k)
        assert got == merged, f"key {k}: {got} != {merged}"
        # episodes never overlap
        for (s1, e1), (s2, e2) in zip(got, got[1:]):
            assert e1 < s2


def test_quantile_disc_two_phase_matches_rank_rule(spark):
    """The two-phase bucketed selection must pick exactly the value at
    rank ceil(q*n) in sorted order (type-1 discrete quantile) — checked
    against a python sort over adversarial inputs: duplicates straddling
    bucket boundaries, a value exactly on a bucket edge, and n chosen so
    one target rank lands ON a tie run and one just after it."""
    from math import ceil

    from ub_etl_spark.operators.selection import quantile_disc_two_phase

    vals = (
        [100] * 7            # tie run in bucket 0 (width 50: bucket 100)
        + [149, 150, 151]    # straddle the 150 bucket edge
        + [150] * 5          # tie run ON the edge value
        + [298, 299, 300, 9_999]  # sparse tail, huge outlier
    )
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    got = quantile_disc_two_phase(
        df, "c", [("lo", 1, 20), ("mid", 1, 2), ("hi", 19, 20)], bucket_width=50
    ).collect()[0]
    ref = sorted(vals)
    n = len(ref)
    assert got.lo == ref[ceil(n * 1 / 20) - 1]
    assert got.mid == ref[ceil(n * 1 / 2) - 1]
    assert got.hi == ref[ceil(n * 19 / 20) - 1]


def test_quantile_disc_two_phase_bucket_width_invariance(spark):
    """The result is a data value selected by an integer rank rule, so it
    must not depend on the bucketing parameter."""
    from ub_etl_spark.operators.selection import quantile_disc_two_phase

    df = spark.range(1, 1001).select((F.col("id") * 37 % 4001).alias("c"))
    outs = [
        tuple(
            quantile_disc_two_phase(
                df, "c", [("lo", 1, 20), ("hi", 19, 20)], bucket_width=w
            ).collect()[0]
        )
        for w in (7, 100, 10_000, 1_000_000)
    ]
    assert len(set(outs)) == 1, outs


def test_quantile_disc_two_phase_generic_contract(spark):
    """The operator is generic: caller columns that shadow its internal
    working names must not break the phase-2 join (internals are
    __q-prefixed), and an empty input must yield exactly ONE all-NULL
    row so .collect()[0] is stable either way."""
    from ub_etl_spark.operators.selection import quantile_disc_two_phase

    # caller schema deliberately reuses the old internal names
    df = spark.range(1, 101).select(
        F.col("id").alias("c"),
        F.lit(7).alias("prior"),
        F.lit(3).alias("n"),
        F.lit("x").alias("qname"),
    )
    row = quantile_disc_two_phase(df, "c", [("mid", 1, 2)]).collect()[0]
    assert row.mid == 50

    empty = df.filter(F.lit(False))
    rows = quantile_disc_two_phase(empty, "c", [("lo", 1, 20), ("hi", 19, 20)]).collect()
    assert len(rows) == 1
    assert rows[0].lo is None and rows[0].hi is None

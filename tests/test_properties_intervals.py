"""Randomized property test for interval coalescing: both distributed
forms (agg fold, Arrow scan) against a pure-Python sweep-line model —
cross-impl, so a mistake shared by the two Spark formulations can't hide
(deterministic seeds; one Spark job per form, the test_properties_*
convention).  The generator is biased toward the hard cases: touching
boundaries (end == next start merges), equal starts, containment chains
(a long interval covering several later ones — the running-max case a
previous-end lag gets wrong), and single-row keys."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np

from ub_etl_spark.operators.intervals import (
    coalesce_intervals_agg,
    coalesce_intervals_arrow,
)

_T0 = datetime(2024, 1, 1)


def _py_model(rows):
    """Sweep per key in (start, end) order; merge while start <= running
    max end; episodes numbered 1-based per key."""
    out = []
    by_key: dict[int, list[tuple[datetime, datetime]]] = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, ivs in by_key.items():
        ep = 0
        cur_s = cur_e = None
        n = 0
        for s, e in sorted(ivs):
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    out.append((k, ep, cur_s, cur_e, n))
                ep += 1
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        out.append((k, ep, cur_s, cur_e, n))
    return sorted(out)


def _gen(rng: np.random.RandomState, n_rows: int):
    """Hard-case-biased intervals: hour-granular starts so touching and
    equal starts actually occur; geometric lengths so some intervals
    contain many successors."""
    rows = []
    for _ in range(n_rows):
        k = int(rng.randint(0, 12))
        start_h = int(rng.randint(0, 200))
        # 30% long covering intervals, else short
        length_h = int(rng.choice([1, 2, 3, 50, 120], p=[0.3, 0.2, 0.2, 0.2, 0.1]))
        s = _T0 + timedelta(hours=start_h)
        rows.append((k, s, s + timedelta(hours=length_h)))
    return rows


def test_both_forms_match_python_model_random(spark):
    rng = np.random.RandomState(29)
    rows = _gen(rng, 600)
    df = spark.createDataFrame(rows, "k bigint, s timestamp, e timestamp")
    want = _py_model(rows)

    def got(form, **kw):
        return sorted(
            (r.k, r.episode, r.episode_start, r.episode_end, r.n_orders)
            for r in form(df, "k", "s", "e", **kw).collect()
        )

    assert got(coalesce_intervals_agg) == want
    assert got(coalesce_intervals_arrow) == want
    # the carry path under adversarial batching must agree too
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "3")
    try:
        assert got(coalesce_intervals_arrow, num_partitions=1) == want
    finally:
        spark.conf.set(conf, prev)

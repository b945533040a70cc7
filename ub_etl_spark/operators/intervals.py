"""Interval coalescing (gaps-and-islands) as pure HASH AGGREGATION.

The windowed form (queries/warehouse.orders_active_episodes, re-expressing
the reference's session-consolidation semantics) is exact and keyed, but
WindowExec sorts every physical partition by (key, start) — n log n, and
the SCALING.md cell measures it riding exactly its computed sort envelope
(100*ln(100n)/ln(n) = 138.6x predicted, 144.9x measured @100x).  This
module is the agg-shaped scale path for the same semantics:

  phase 1: bucket intervals by START month and stitch each (key, bucket)
           group locally — array_sort over a BOUNDED per-group array +
           one aggregate() fold; no partition-wide sort anywhere.
  phase 2: per key, concatenate the bucket episode lists in bucket order
           (starts in month m all precede month m+1, so the concatenation
           is globally start-sorted) and run the SAME fold once more over
           the far smaller episode list.

Interval union is associative over CONTIGUOUS slices of the per-key start
order — bucketing by start keeps each phase-1 group contiguous, which is
the whole correctness argument; tests/test_intervals.py pins equality
against the windowed form row-for-row.  Cost: two hash-agg shuffles
(map-side partial), per-group array sorts bounded by the bucket width,
zero WindowExec.  Skew bound: a key's phase-1 array holds one month of
its intervals; its phase-2 array holds its episode count (<= months
spanned), so neither array scales with total data volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _stitch_fold(eps: Column) -> Column:
    """Fold a start-sorted array<struct<s,e,n>> into coalesced episodes.

    Merge rule matches the windowed query exactly: an element whose start
    is > the running max end (the last accumulated episode's ``e``, which
    greatest() keeps as the running max) opens a new episode; anything
    else merges, extending the end and summing ``n``.  slice(eps, 1, 0)
    supplies a type-correct empty accumulator without naming the
    timestamp/date element type."""
    last = lambda acc: F.element_at(acc, -1)  # noqa: E731
    return F.aggregate(
        eps,
        F.slice(eps, 1, 0),
        lambda acc, x: F.when(
            (F.size(acc) == 0) | (x["s"] > last(acc)["e"]),
            F.concat(acc, F.array(x)),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc)["s"].alias("s"),
                        F.greatest(last(acc)["e"], x["e"]).alias("e"),
                        (last(acc)["n"] + x["n"]).alias("n"),
                    )
                ),
            )
        ),
    )


def coalesce_intervals_agg(
    df: DataFrame,
    key: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping-or-touching [start, end] intervals per key
    into numbered episodes — agg-shaped (see module docstring).

    Output matches orders_active_episodes' schema contract: (<key>,
    episode 1-based in start order, episode_start, episode_end, n_orders).
    """
    iv = df.select(
        F.col(key).alias("k"),
        F.trunc(F.col(start_col), "month").alias("bk"),
        F.struct(
            F.col(start_col).alias("s"),
            F.col(end_col).alias("e"),
            F.lit(1).cast("bigint").alias("n"),
        ).alias("iv"),
    )
    local = iv.groupBy("k", "bk").agg(
        _stitch_fold(F.array_sort(F.collect_list("iv"))).alias("eps")
    )
    # bk is unique within each key group, so the struct sort never reaches
    # the array field; flatten preserves global start order by bucket.
    merged = local.groupBy("k").agg(
        _stitch_fold(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bk", "eps"))),
                    lambda t: t["eps"],
                )
            )
        ).alias("eps")
    )
    ep = F.posexplode("eps")
    return merged.select(F.col("k").alias(key), ep.alias("pos", "ep")).select(
        key,
        (F.col("pos") + 1).cast("bigint").alias("episode"),
        F.col("ep.s").alias("episode_start"),
        F.col("ep.e").alias("episode_end"),
        F.col("ep.n").alias("n_orders"),
    )

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


def _require_non_null(df: DataFrame, cols: list[str]) -> DataFrame:
    """Loud shared precondition (r7 ADVICE): a NULL key/start/end would
    degrade DIFFERENTLY per form — the windowed running max treats NULL
    as vacuous, the agg fold's struct sort moves it, and the Arrow scan's
    numpy compares go all-False — silently breaking both the episode
    boundaries and the pinned three-way equality.  Enforce identically
    in every operator form: a codegen filter whose failing branch raises
    (a filter, not a dropped assert_true projection, so Catalyst cannot
    prune it).  Cost: one null-check per row inside the existing scan
    stage — no extra exchange."""
    ok = None
    for c in cols:
        cond = F.col(c).isNotNull()
        ok = cond if ok is None else (ok & cond)
    return df.filter(
        F.when(ok, F.lit(True)).otherwise(
            F.raise_error(
                F.lit(
                    "coalesce_intervals: NULL in one of ("
                    + ", ".join(cols)
                    + ") violates the documented non-null precondition; "
                    "filter nulls upstream"
                )
            )
        )
    )


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
    iv = _require_non_null(df, [key, start_col, end_col]).select(
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


def coalesce_token_spans(
    df: DataFrame,
    key: str,
    pos_col: str,
    k: int,
) -> DataFrame:
    """Merge equal-length [pos, pos+k) integer offset intervals per key.

    The substring-span dedup shape (operators/dedup.substring_spans):
    every matched token offset contributes the interval [pos, pos+k);
    overlapping-or-touching intervals union into maximal duplicated
    spans.  Reuses _stitch_fold — one hash-agg shuffle on the key, fold
    over the per-key sorted offset array (bounded by the key's token
    count, never total data volume), zero WindowExec.  With equal
    lengths and sorted starts the running-max end the fold keeps is
    just prev_pos + k, so the merge rule degenerates to "gap <= k" —
    the property the SQL oracle's lag() formulation relies on.

    Output: (<key>, span_start, span_end, span_tokens, n_grams) with
    span_end exclusive and n_grams = number of k-gram hits merged.
    """
    iv = _require_non_null(df, [key, pos_col]).select(
        F.col(key).alias("k"),
        F.struct(
            F.col(pos_col).cast("bigint").alias("s"),
            (F.col(pos_col) + k).cast("bigint").alias("e"),
            F.lit(1).cast("bigint").alias("n"),
        ).alias("iv"),
    )
    merged = iv.groupBy("k").agg(
        _stitch_fold(F.array_sort(F.collect_list("iv"))).alias("eps")
    )
    return merged.select(F.col("k").alias(key), F.explode("eps").alias("ep")).select(
        key,
        F.col("ep.s").alias("span_start"),
        F.col("ep.e").alias("span_end"),
        (F.col("ep.e") - F.col("ep.s")).alias("span_tokens"),
        F.col("ep.n").alias("n_grams"),
    )


def coalesce_intervals_arrow(
    df: DataFrame,
    key: str,
    start_col: str,
    end_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Same contract as coalesce_intervals_agg, as ONE vectorized Arrow
    pass — the 100TB shape for interval coalescing.

    Why a third form: _stitch_fold is an interpreted higher-order
    aggregate whose accumulator copy makes each group's fold O(g^2), and
    per-group interval counts g grow linearly with fact volume (keys do
    not amplify) — the agg lever's growth term.  Here the heavy lifting
    is hash-partition by key + sortWithinPartitions (exactly the
    exchange+local-sort a keyed WindowExec pays, nothing more), then a
    single mapInPandas scan: numpy maximum.accumulate finds the running
    max end, episode boundaries are one vector compare, and
    maximum.reduceat/diff aggregate each episode — O(n) per partition
    after the sort, no per-row JVM window machinery, no O(g^2) folds.
    Arrow moves only (key, start, end).

    Precondition (all three forms share it): key/start/end are non-null
    — the windowed stitch's running max and this scan's numpy compares
    both treat NULL/NaT as vacuous, so callers filter nulls upstream
    (the registered episode query builds intervals from inner joins,
    which cannot produce them).  ENFORCED, not just documented (r7
    ADVICE): _require_non_null raises loudly — and identically in the
    agg form — instead of letting a NULL produce silently wrong episode
    boundaries.

    Cross-batch state: a partition streams in as multiple Arrow batches
    (same key may span batches — batch size is a config, not a grouping
    guarantee), so the scan carries the last OPEN episode and the key's
    emitted-episode count across batches and flushes on iterator end.
    Equality against both other forms is pinned in tests/test_intervals.py
    (including a tiny maxRecordsPerBatch so the carry path actually runs).
    """
    in_types = dict(df.dtypes)
    out_schema = (
        f"{key} {in_types[key]}, episode bigint, "
        f"episode_start {in_types[start_col]}, "
        f"episode_end {in_types[end_col]}, n_orders bigint"
    )

    def stitch(batches):
        import numpy as np
        import pandas as pd

        carry = None  # (key, ep_start, ep_end, n, episodes_already_emitted)

        def emit(k, s, e, n, ep_idx):
            return pd.DataFrame(
                {
                    key: k,
                    "episode": ep_idx,
                    "episode_start": s,
                    "episode_end": e,
                    "n_orders": n,
                }
            )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            k = pdf[key].to_numpy()
            s = pdf[start_col].to_numpy()
            e = pdf[end_col].to_numpy()
            n = np.ones(len(pdf), dtype="int64")
            base = np.zeros(len(pdf), dtype="int64")  # episodes emitted before
            if carry is not None:
                ck, cs, ce, cn, cemitted = carry
                if ck == k[0]:
                    # prepend the open episode as one pre-merged interval
                    k = np.concatenate(([ck], k))
                    s = np.concatenate(([cs], s))
                    e = np.concatenate(([ce], e))
                    n = np.concatenate(([cn], n))
                    base = np.concatenate(([0], base))
                    base[k == ck] = cemitted
                else:
                    yield emit([ck], [cs], [ce], [cn], [cemitted + 1])
                carry = None
            new_key = np.empty(len(k), dtype=bool)
            new_key[0] = True
            new_key[1:] = k[1:] != k[:-1]
            # boundary mask: a new episode opens on a new key, or where
            # start exceeds the key's running max end.  numpy has no
            # RESETTING cummax, so run the accumulate per key RUN — one
            # python iteration per distinct key in the batch, each fully
            # vectorized (sorted input makes runs contiguous; a batch
            # holds few runs when keys carry many rows, and tiny numpy
            # slices when they don't)
            boundary = new_key.copy()
            run_starts = np.flatnonzero(new_key)
            run_ends = np.append(run_starts[1:], len(k))
            for a, b in zip(run_starts, run_ends):
                if b - a > 1:
                    cm = np.maximum.accumulate(e[a:b])
                    boundary[a + 1 : b] = s[a + 1 : b] > cm[: b - a - 1]
            idx = np.flatnonzero(boundary)
            ep_s = s[idx]
            ep_e = np.maximum.reduceat(e, idx)
            ep_n_rows = np.diff(np.append(idx, len(k)))
            # n may exceed 1 for the carried pre-merged interval: sum n
            # per episode, not count rows
            ep_n = np.add.reduceat(n, idx)
            ep_k = k[idx]
            ep_base = base[idx]
            # episode index within key: 1-based cumulative position among
            # this batch's episodes of the same key, offset by base
            key_start = np.empty(len(idx), dtype=bool)
            key_start[0] = True
            key_start[1:] = ep_k[1:] != ep_k[:-1]
            pos = np.arange(len(idx), dtype="int64")
            run_start = np.maximum.accumulate(np.where(key_start, pos, 0))
            ep_idx = pos - run_start + 1 + ep_base
            # hold back the LAST episode — the next batch may extend it
            carry = (
                ep_k[-1],
                ep_s[-1],
                ep_e[-1],
                int(ep_n[-1]),
                int(ep_idx[-1] - 1),
            )
            if len(idx) > 1:
                yield emit(
                    ep_k[:-1], ep_s[:-1], ep_e[:-1], ep_n[:-1], ep_idx[:-1]
                )
        if carry is not None:
            ck, cs, ce, cn, cemitted = carry
            yield emit([ck], [cs], [ce], [cn], [cemitted + 1])

    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    return (
        _require_non_null(
            df.select(F.col(key), F.col(start_col), F.col(end_col)),
            [key, start_col, end_col],
        )
        .repartition(n_parts, F.col(key))
        .sortWithinPartitions(key, start_col, end_col)
        .mapInPandas(stitch, out_schema)
    )

"""Distributed Bloom-filter build + probe (SURVEY.md §2 B62).

The runtime-filter pattern made explicit from public primitives (Spark's
internal bloom_filter_agg is not exposed to the Python function
registry): the build side's keys hash to k bit positions, ONE bit_or
aggregation folds them into a (m/64)-word bitmap — the exchange carries
per-map-task partials, n_map_tasks x m/64 word rows at most — and the
driver collects only that KB-sized bitmap
(metadata, like IVF centroids) to inline it as a literal probe
expression on the big side.  The probe is pure codegen (element_at +
getbit), prunes before any join shuffle, and can never produce a false
negative; the exact join afterwards removes false positives, so
end-to-end results are exact.

At 100 TB this is the explicit form of what AQE's runtime row-level
filtering does for selective joins: ship KBs of bitmap instead of
shuffling TBs of non-matching fact rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # non-negative modulo of xxhash64 with per-hash seed
    return [
        (F.xxhash64(F.lit(i), key) % m_bits + m_bits) % m_bits for i in range(k)
    ]


def bloom_build(df: DataFrame, key: Column, m_bits: int = 1 << 16, k: int = 5) -> list[int]:
    """One aggregation -> dense bitmap as a Python list of m_bits/64 longs.

    Shuffle volume: map-side partial bit_or emits at most m_bits/64 rows
    PER MAP TASK, so the exchange carries up to n_map_partitions x
    m_bits/64 word rows (8 KB per task at the default m) — still
    metadata-sized next to the data it prunes; the collect moves only
    the final bitmap.
    """
    n_words = m_bits // 64
    words = (
        df.select(F.explode(F.array(*_positions(key, m_bits, k))).alias("p"))
        .select(
            F.expr("p DIV 64").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r.word] = r.bits
    return bitmap


def bloom_might_contain(bitmap: list[int], key: Column, k: int = 5) -> Column:
    """Codegen probe: AND over the k bit tests against the literal bitmap.
    Guaranteed no false negatives as long as k matches the build: m_bits
    is DERIVED from the bitmap length (a separately-passed m that
    disagreed with the build would hash positions modulo the wrong m and
    silently drop true matches — the one mismatch the exact join after
    the probe could never repair)."""
    m_bits = len(bitmap) * 64
    lit_map = F.array(*[F.lit(w) for w in bitmap])
    cond = F.lit(True)
    for p in _positions(key, m_bits, k):
        word_val = F.element_at(lit_map, (p / 64).cast("int") + F.lit(1))
        bit = F.call_function("getbit", word_val, (p % 64).cast("int"))
        cond = cond & (bit == F.lit(1))
    return cond

"""Skew-aware join: key salting (SURVEY.md §4 scale levers).

AQE's skew-join splitting handles sort-merge skew automatically; salting
is the explicit fallback for aggregations and for joins AQE can't split
(e.g. a hot key against a non-broadcastable build side).  The pattern:
replicate the small side R times, scatter the big side's hot keys across
R salt values, join on (key, salt).

At 100 TB this turns one straggler task holding the hot key into R evenly
loaded tasks at the cost of R copies of the matching small-side rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to skewed key distribution in ``big``.

    The big side gets a deterministic pseudo-random salt derived from a
    row-unique hash of all its columns (no RNG: reproducible); the small
    side is exploded across all salt values.

    Only big-side-preserving joins are valid under this rewrite: the small
    side is replicated ``salt`` times, so any join that can emit unmatched
    small-side rows (right/full outer, or semi/anti FROM the small side)
    would return them once per salt value.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not big-side-preserving; the "
            f"exploded small side would duplicate its unmatched rows "
            f"{salt}x. Use one of {sorted(allowed)}, or AQE skew-join "
            "splitting for outer joins."
        )
    keys = list(keys)
    # salt must vary per ROW, not per key — deriving it from column values
    # would collapse to one salt per hot key when the frame carries only the
    # key columns, silently un-splitting the skew.  monotonically_increasing_id
    # varies within every partition; its exact values never affect the join
    # result (each salt matches a replicated small-side row).
    big_s = big.withColumn(_SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    return big_s.join(small_s, keys + [_SALT], how).drop(_SALT)


def salted_group_count(df: DataFrame, keys: Sequence[str], salt: int = 8) -> DataFrame:
    """Two-phase aggregation for skewed group keys: pre-aggregate on
    (key, salt), then final-aggregate on key.  Spark already does partial
    aggregation map-side; explicit salting additionally splits a hot key
    across *reduce* tasks, which partial agg alone cannot."""
    keys = list(keys)
    # per-ROW salt (see salted_join): a value-derived salt would be constant
    # within a hot key when df holds only the key columns, leaving the hot
    # reduce task un-split.  Counts are salt-invariant, so the id values
    # don't affect the result.
    salted = df.withColumn(_SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    partial = salted.groupBy(*keys, _SALT).agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("n"))

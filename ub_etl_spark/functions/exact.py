"""Exact (order-independent) aggregate arithmetic helpers.

Double-precision SUM is order-dependent: a shuffle re-orders partial sums,
so the same query can hash differently run-to-run and engine-to-engine.
The fix is classic warehouse practice: aggregate money-like doubles in
DECIMAL (exact, associative, commutative), then cast the final value back
to double.  Both Spark and DuckDB implement decimal arithmetic exactly,
so the value is bit-identical across engines AND across partitionings —
which is exactly what a 1000-executor cluster needs for reproducible
results, not just what the oracle diff needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2 decimal digits covers every money/ratio column in the testdata and in
# the reference DDL (FLOAT ratio columns, user_course_activity_database.sql:11-13).
DEC = "decimal(18,2)"
# Products of two DEC values (e.g. price * (1 - discount)) need more scale.
DEC4 = "decimal(24,4)"


def to_dec(c: Column | str, typ: str = DEC) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(typ)


def dsum(c: Column | str, alias: str, typ: str = DEC) -> Column:
    """Exact sum of a double column, returned as double."""
    return F.sum(to_dec(c, typ)).cast("double").alias(alias)


def davg(c: Column | str, alias: str, typ: str = DEC) -> Column:
    """Exact-sum average: decimal sum, double division by count.

    Matches the oracle formulation CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE)
    / COUNT(x): both engines divide the identical double by the identical
    count, so the result is bit-identical.
    """
    c2 = F.col(c) if isinstance(c, str) else c
    return (F.sum(to_dec(c2, typ)).cast("double") / F.count(c2)).alias(alias)


def dmul(a: Column | str, b: Column | str) -> Column:
    """Exact product of two 2-dp doubles (decimal(18,2) x decimal(18,2))."""
    return to_dec(a) * to_dec(b)


def sql_dsum(expr: str, alias: str, typ: str = DEC) -> str:
    """DuckDB-side rendering of dsum for oracle strings."""
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, typ: str = DEC) -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) / COUNT({expr}) AS {alias}"

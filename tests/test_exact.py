"""Contract tests for functions/exact.py — the arithmetic every oracle
hash rests on: cents sums must be exact, partitioning-invariant, and
bit-identical to DuckDB's rendering of the same expression."""

from __future__ import annotations

import random
from decimal import Decimal

import duckdb
import pytest

from pyspark.sql import functions as F

from ub_etl_spark.functions.exact import cents_disc, csum, sql_cents_disc, sql_csum


def _money(rng: random.Random, n: int) -> list[float]:
    """Random 2-dp money-like doubles, signed, wide magnitude."""
    return [rng.randint(-10_000_000, 10_000_000) / 100.0 for _ in range(n)]


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_csum_partitioning_invariant_and_exact(spark, seed):
    vals = _money(random.Random(seed), 500)
    exact = float(sum(Decimal(str(round(v * 100))) for v in vals) / 100)
    got = set()
    for parts in (1, 7, 32):
        df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(parts)
        got.add(df.agg(csum("v", "s")).first().s)
    assert got == {exact}, f"cents sum must not depend on partitioning: {got}"


@pytest.mark.parametrize("seed", [3, 11])
def test_csum_matches_duckdb_bitwise(spark, seed):
    vals = _money(random.Random(seed), 300)
    spark_val = (
        spark.createDataFrame([(v,) for v in vals], "v double")
        .agg(csum("v", "s"))
        .first()
        .s
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    duck_val = con.execute(f"SELECT {sql_csum('v', 's')} FROM t").fetchone()[0]
    assert spark_val == duck_val, "engines must agree bit-for-bit"


def test_cents_disc_matches_duckdb_bitwise(spark):
    rng = random.Random(5)
    rows = [
        (rng.randint(100, 10_000_000) / 100.0, rng.randint(0, 10) / 100.0)
        for _ in range(300)
    ]
    spark_val = (
        spark.createDataFrame(rows, "p double, d double")
        .agg((F.sum(cents_disc("p", "d")) / 10000.0).alias("r"))
        .first()
        .r
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(p DOUBLE, d DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck_val = con.execute(
        f"SELECT SUM({sql_cents_disc('p', 'd')}) / 10000.0 FROM t"
    ).fetchone()[0]
    assert spark_val == duck_val

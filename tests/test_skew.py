"""Salted-join/aggregation equivalence tests (skew levers, SURVEY.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ub_etl_spark.operators.skew import salted_group_count, salted_join


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    # skew it: everything mapped onto a handful of keys
    big = li.withColumn("k", (F.col("l_orderkey") % 3).cast("long"))
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, v string")
    plain = big.join(small, "k").groupBy("v").count()
    salted = salted_join(big, small, ["k"], salt=8).groupBy("v").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_group_count_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        tuple(r) for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {tuple(r) for r in salted_group_count(li, ["l_returnflag"], salt=16).collect()}
    assert plain == salted

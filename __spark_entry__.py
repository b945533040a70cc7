"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ub_etl_spark.registry: every operator in SURVEY.md §2
registers a (spark, sf_dir) -> DataFrame builder and (when the operator is
SQL-expressible) a DuckDB oracle SQL string with identically-aliased
columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ub_etl_spark.functions.exact import cavg, cents_disc, csum
from ub_etl_spark.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7 minimum slice):
    scan -> filter -> join -> hash agg -> sort through the full Catalyst
    lifecycle."""
    sf_dir = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            csum("l_quantity", "sum_qty"),
            (F.sum(cents_disc("l_extendedprice", "l_discount")) / 10000.0).alias(
                "sum_disc_price"
            ),
            cavg("o_totalprice", "avg_order_total"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted -> rows-only check)."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle}

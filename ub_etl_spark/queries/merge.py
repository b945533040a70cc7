"""Merge tier (SURVEY.md A11): latest-wins upsert emulated Spark-natively.

The reference's per-row ``ON CONFLICT (user_id, course_id) DO UPDATE``
(scripts/user_course_activity.py:81-102) becomes a set-oriented union +
ranking window (operators/merge.py).  Fixpoint/idempotence properties are
asserted in tests/test_merge.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ub_etl_spark.operators import merge as M
from ub_etl_spark.registry import register
from ub_etl_spark.sources.tables import load_table as T


@register(
    "upsert_merge",
    tier="A",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, gen FROM (
      SELECT t.*, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY gen DESC) AS rn
      FROM (
        SELECT o_orderkey, o_custkey, o_totalprice, 1 AS gen FROM orders
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice, 2 AS gen
        FROM orders WHERE o_orderkey % 5 = 0
      ) t
    ) ranked WHERE rn = 1
    """,
)
def upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    existing = o.withColumn("gen", F.lit(1))
    updates = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("gen", F.lit(2))
    )
    return M.upsert_latest_wins(existing, updates, keys=["o_orderkey"], order_by=["gen"])


# SCD Type-2 dimension history (SURVEY.md B33): the audit-history
# extension of the reference's latest-wins upsert — each customer's
# order-priority timeline compressed to distinct runs with
# [valid_from, valid_to) intervals and an is_current flag.
@register(
    "dim_scd2_history",
    tier="B",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
             LAG(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev
      FROM orders
    ), changes AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority
      FROM ranked WHERE prev IS NULL OR prev <> o_orderpriority
    )
    SELECT o_custkey,
           o_orderpriority,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS valid_to,
           LEAD(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) IS NULL AS is_current
    FROM changes
    """,
)
def dim_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    return M.scd2_history(
        o,
        keys=["o_custkey"],
        tracked=["o_orderpriority"],
        order_by=["o_orderdate", "o_orderkey"],
        valid_from_col="o_orderdate",
    )

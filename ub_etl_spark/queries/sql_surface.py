"""Spark SQL API surface (SURVEY.md §2 B57-B58): queries expressed as
`spark.sql(...)` over registered temp views — the same Catalyst plans as
the DataFrame API, proving the engine's SQL front door works end-to-end.

Two shapes the DataFrame-API inventory doesn't already cover:
  - explicit GROUPING SETS (non-hierarchical — rollup/cube only express
    nested lattices),
  - a correlated scalar subquery, which Catalyst decorrelates into an
    aggregate + left outer join (never a per-row re-execution — the
    RewriteCorrelatedScalarSubquery rule; audited: no nested loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ub_etl_spark.registry import register
from ub_etl_spark.sources.tables import register_views


# B57: arbitrary grouping sets — (status) and (priority) side by side,
# which ROLLUP/CUBE cannot express (they generate nested/full lattices).
# One Expand + one hash aggregation, same physical shape as rollup.
@register(
    "agg_grouping_sets_explicit",
    tier="B",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR((o_totalprice) * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# B58: correlated scalar subquery — "orders whose total is more than 3x
# the exact average line price of their own lineitems".  Catalyst
# rewrites the per-row subquery into a grouped aggregate joined back on
# the correlation key; the audit pins the decorrelated HashAggregate +
# join and the absence of any nested-loop execution.
@register(
    "scalar_subquery_correlated",
    tier="B",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 3 * (
      SELECT CAST(SUM(CAST(FLOOR((l.l_extendedprice) * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 / COUNT(l.l_extendedprice)
      FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
    )
    """,
)
def scalar_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 3 * (
          SELECT CAST(SUM(CAST(FLOOR((l.l_extendedprice) * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100.0 / COUNT(l.l_extendedprice)
          FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
        )
        """
    )


# B60: ANSI fail-soft arithmetic — this engine runs ANSI mode (division
# by zero / bad casts ERROR, matching the reference's psycopg2 type
# strictness, SURVEY A13); try_cast / try_divide are the per-expression
# opt-outs that turn corrupt cells into NULLs instead of failing a
# 100 TB job at row 9 billion.  Oracle mirrors with TRY_CAST and
# NULLIF-guarded division (identical semantics).
@register(
    "scalar_try_safe",
    tier="B",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           TRY_CAST(event_type AS INTEGER) AS bad_int,
           value / NULLIF(event_id % 5, 0) AS safe_ratio
    FROM events
    """,
)
def scalar_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bad_int guards TRY_CAST behind a numeric-shape RLIKE: an
    always-failing try-cast pays a JVM exception PER ROW (measured 8x the
    whole scan at sf0.1 — exceptions are control flow inside TryEval), so
    the scale formulation rejects impossible strings with a cheap regex
    and lets the real TRY_CAST handle only plausible ones (overflow etc.).
    Semantics identical: the guard only skips strings no INT cast accepts.
    k_int stays a bare TRY_CAST — its inputs are digit strings, the
    no-exception fast path."""
    register_views(spark, sf_dir)
    return spark.sql(
        r"""
        SELECT event_id,
               TRY_CAST(get_json_object(props, '$.k') AS INT) AS k_int,
               CASE WHEN event_type RLIKE '^\\s*[+-]?[0-9]+\\s*$'
                    THEN TRY_CAST(event_type AS INT) END AS bad_int,
               TRY_DIVIDE(value, event_id % 5) AS safe_ratio
        FROM events
        """
    )

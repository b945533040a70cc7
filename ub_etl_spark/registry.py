"""Query registry: name -> (DataFrame builder, DuckDB oracle SQL).

Every operator in SURVEY.md §2 registers here.  The driver contract
(__spark_entry__.py) is a thin view over this registry:

  - ``fn(spark, sf_dir)`` builds the Spark DataFrame for the operator.
  - ``oracle`` is the equivalent ANSI SQL DuckDB runs on the same parquet
    views; ``None`` marks a non-SQL-expressible operator (rows-only check).

Column names are aliased identically on both sides; floating aggregates go
through exact decimal arithmetic (functions/exact.py) so value hashes are
order-insensitive-deterministic across engines.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]
    tier: str  # "A" reference-derived, "Q" derived relational surface, "B" north-star
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, *, oracle: Optional[str] = None, tier: str = "A", doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name, fn, oracle, tier, doc or (fn.__doc__ or "").strip())
        return fn

    return deco


_LOADED = False


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration)."""
    global _LOADED
    if not _LOADED:
        from ub_etl_spark.queries import (  # noqa: F401
            dedup,
            extras,
            merge,
            multimodal,
            nested,
            pipeline,
            relational,
            similarity,
            storage_io,
            streaming_batch,
            text,
            udfs,
            udtf_ops,
        )

        _LOADED = True
    return REGISTRY

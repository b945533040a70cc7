"""Format round-trip IO (SURVEY.md A2 generalization): the engine reads
and writes every mainstream warehouse format with explicit schemas —
never inference in production paths (§1.3).

Parquet is the default interchange (columnar, pushdown, splittable);
JSON covers the reference's native source shape; CSV for interchange;
ORC as the second columnar option.  Writers partition by an optional
column list (partition pruning on read is the first 100 TB lever).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "json", "csv")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(path)


def read_table_fmt(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType | str
) -> DataFrame:
    """Schema-explicit read (PERMISSIVE for the semi-structured formats, with
    a corrupt-record column, mirroring the reference's tolerant `.get()`
    source handling — SURVEY.md §1.3)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read.schema(schema)
    if fmt in ("json", "csv"):
        r = r.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    if fmt == "csv":
        r = r.option("header", "true")
    return r.format(fmt).load(path)

"""UDF/UDTF surface tests (SURVEY.md B7): oracle-differential checks for
the four Python-extension queries — pandas_udf scalar, applyInPandas
grouped map, mapInPandas iterator, and the Spark 4 UDTF — mirroring the
driver's row-count/schema/multiset comparison so the family has repo-side
coverage beyond the parity CLI."""

from __future__ import annotations

import math

import duckdb
import pytest

from ub_etl_spark.registry import load_all
from ub_etl_spark.sources.tables import TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        return repr(v)

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize(
    "name", ["udf_surface", "udf_grouped_map", "udf_map_in_pandas", "udtf_tokenize"]
)
def test_udf_query_matches_oracle(spark, sf_dir, duck, name):
    spec = load_all()[name]
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    ores = duck.execute(spec.oracle)
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _normalize(srows, sdf.columns) == _normalize(orows, ocols)


def test_udf_surface_is_arrow_vectorized(spark, sf_dir):
    """The pandas_udf must run through ArrowEvalPython (vectorized batch
    transfer), never row-at-a-time BatchEvalPython."""
    spec = load_all()["udf_surface"]
    plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_udtf_null_text_emits_nothing(spark):
    """The UDTF's null guard: a NULL input row expands to zero output rows
    (matching the lateral-join-over-empty-table semantics)."""
    from ub_etl_spark.queries.udtf_ops import TokenizeUDTF

    spark.udtf.register("tokenize_udtf_t", TokenizeUDTF)
    spark.createDataFrame(
        [(1, "a b"), (2, None)], "id int, text string"
    ).createOrReplaceTempView("udtf_null_in")
    rows = spark.sql(
        "SELECT i.id, t.token FROM udtf_null_in i, LATERAL tokenize_udtf_t(i.text) t"
    ).collect()
    assert {(r.id, r.token) for r in rows} == {(1, "a"), (1, "b")}

"""Python UDTF surface (SURVEY.md B7, Spark 4): a table function that
lazily expands each input row into multiple output rows — the sanctioned
escape hatch for row-expanding custom operators that aren't expressible
as explode/posexplode compositions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ub_etl_spark.registry import register
from ub_etl_spark.sources.tables import load_table as T


@udtf(returnType="pos int, token string, token_len int", useArrow=True)
class TokenizeUDTF:
    """Emit (position, token, length) per whitespace token of the input.

    useArrow=True plans ArrowEvalPythonUDTF — input rows cross to the
    Python worker in Arrow batches instead of pickled one-at-a-time
    (BatchEvalPythonUDTF), the same batched-crossing rule every other
    Python touchpoint in this repo follows."""

    def eval(self, text: str):  # noqa: A002
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok, len(tok)


@register(
    "udtf_tokenize",
    tier="B",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, t[i] AS token,
           CAST(length(t[i]) AS INTEGER) AS token_len
    FROM (SELECT doc_id, string_split(text, ' ') AS t
          FROM documents WHERE doc_id < 50) d,
         UNNEST(generate_series(1, len(t))) AS g(i)
    """,
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.token_len
        FROM udtf_docs_in d, LATERAL tokenize_udtf(d.text) t
        """
    )

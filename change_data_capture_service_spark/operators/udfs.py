"""UDF surface (SURVEY.md §2.2 X17): the engine's escape hatches, in
preference order (pyspark_guide): built-ins first; Arrow-batched Pandas
UDFs when Python is unavoidable; row-at-a-time UDFs only to prove the tier
exists. Each is oracle-checked by re-expressing the same math in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import register


@register(
    "udf_scalar",
    tags=("udf",),
    oracle="""
    SELECT event_id,
           CASE WHEN value >= 150 THEN 'high'
                WHEN value >= 50  THEN 'mid'
                ELSE 'low' END AS band
    FROM events
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path: pickled per row, breaks
    codegen -- shown for surface completeness; production code uses the
    CASE built-in, see the oracle)."""

    @F.udf(T.StringType())
    def band(v: float) -> str:
        if v is None:
            return None
        if v >= 150:
            return "high"
        if v >= 50:
            return "mid"
        return "low"

    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", band("value").alias("band"))


@register(
    "udf_pandas",
    tags=("udf",),
    oracle="""
    SELECT event_id, round(ln(1 + value), 6) AS log1p_value
    FROM events
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Pandas UDF: one Arrow batch per ~10k rows instead of one
    pickle round-trip per row (~10-100x over udf_scalar)."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def log1p6(v: pd.Series) -> pd.Series:
        return np.round(np.log1p(v), 6)

    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", log1p6("value").alias("log1p_value"))


@register(
    "udaf_pandas",
    tags=("udf",),
    oracle="""
    SELECT user_id,
           round(median(value), 6) AS median_value,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id
    """,
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate via applyInPandas: per-group pandas frame in, one
    row out (median has no shuffle-free built-in; the group is the
    parallelism unit, so this scales with key cardinality)."""

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "median_value": [round(float(pdf["value"].median()), 6)],
                "n": [len(pdf)],
            }
        )

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(agg, "user_id long, median_value double, n long")


@register(
    "udtf",
    tags=("udf",),
    oracle="""
    SELECT d.doc_id, t.i - 1 AS pos,
           string_split(coalesce(d.text, ''), ' ')[CAST(t.i AS INT)] AS word
    FROM documents d
    CROSS JOIN range(1, 4096) AS t(i)
    WHERE d.doc_id < 5 AND t.i <= len(string_split(coalesce(d.text, ''), ' '))
    """,
)
def udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row -> many output rows
    (word + position). The built-in equivalent is posexplode(split());
    registered to prove the UDTF tier works end-to-end."""

    @F.udtf(returnType="doc_id: long, pos: long, word: string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):  # noqa: D102
            for i, w in enumerate((text or "").split(" ")):
                yield doc_id, i, w

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    d.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.word
        FROM udtf_docs_in, LATERAL tokenize_udtf(doc_id, text) t
        """
    )


@register(
    "map_in_pandas",
    tags=("udf",),
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS total_cost
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: partition-batch iterator transform (the shape used for
    custom scans/decoders, e.g. the multimodal decode stub). Arithmetic
    mirrors the oracle exactly."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["l_orderkey", "l_linenumber"]].copy()
            out["total_cost"] = (
                pdf.l_extendedprice * (1 - pdf.l_discount) * (1 + pdf.l_tax)
            ).round(6)
            yield out

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return li.mapInPandas(op, "l_orderkey long, l_linenumber int, total_cost double")

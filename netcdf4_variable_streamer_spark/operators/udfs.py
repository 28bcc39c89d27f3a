"""B-9 UDF / UDAF / UDTF surface (SURVEY.md §2 Table B).

The reference's "UDF story" is that the caller is already in Python and
applies NumPy to streamed blocks (SURVEY §2 Table A). The engine keeps
that escape hatch but in Spark's vectorized forms: Arrow-batched pandas
UDFs and `mapInArrow` (whole-partition NumPy — the direct analogue of
the reference's block generator A9, where a user gets a NumPy block per
chunk). Row-at-a-time Python UDFs exist for completeness but are the
documented slow path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from netcdf4_variable_streamer_spark.registry import register
from netcdf4_variable_streamer_spark.tables import load_table


@register(
    "q_udf_row",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 3000 THEN 'low'
            WHEN c_acctbal < 7000 THEN 'mid'
            ELSE 'high' END AS tier
FROM customer
""",
    doc="Row-at-a-time Python UDF (the slow path — oracle shows the same "
        "logic is expressible natively; kept for surface completeness).",
)
def q_udf_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(returnType=StringType())
    def tier(bal: float) -> str:
        if bal < 0:
            return "negative"
        if bal < 3000:
            return "low"
        if bal < 7000:
            return "mid"
        return "high"

    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", tier("c_acctbal").alias("tier"))


@register(
    "q_udf_pandas",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
FROM lineitem
""",
    doc="Vectorized scalar pandas UDF (Arrow batches; ~10-100x the row UDF).",
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def charge(
        price: pd.Series, disc: pd.Series, tax: pd.Series
    ) -> pd.Series:
        # no .round() here: pandas rounds half-even, Spark/DuckDB half-up
        return price * (1 - disc) * (1 + tax)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(charge("l_extendedprice", "l_discount", "l_tax"), 6).alias(
            "charge"
        ),
    )


@register(
    "q_udaf_pandas",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
         AS wavg_price
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Grouped-agg pandas UDF: quantity-weighted average price per flag.",
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        # unrounded: Python round() is half-even, F.round outside is half-up
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


@register(
    "q_udtf_split",
    oracle="""
SELECT d.doc_id, t.token
FROM documents d, UNNEST(STRING_SPLIT(d.text, ' ')) AS t(token)
WHERE d.doc_id < 20 AND t.token <> ''
""",
    doc="Python UDTF: one document row → one row per token "
        "(lateral-join expansion).",
)
def q_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string")
    class Tokenize:
        def eval(self, text: str):
            for tok in text.split(" "):
                if tok:
                    yield (tok,)

    spark.udtf.register("nvss_tokenize", Tokenize)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.token "
        "FROM udtf_docs d, LATERAL nvss_tokenize(d.text) t"
    )


@register(
    "q_map_in_arrow",
    oracle="""
SELECT vec_id,
       ROUND(SQRT(LIST_SUM(
         LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
       )), 4) AS l2_norm
FROM embeddings
""",
    doc="Whole-partition Arrow transform with NumPy kernels — the engine's "
        "escape hatch (reference A9 block-generator analogue): one Arrow "
        "batch in, one out, no per-row Python.",
)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pyarrow as pa

    from netcdf4_variable_streamer_spark.functions.arrow_np import (
        column_i64,
        list_matrix_f64,
    )

    def l2_batches(batches):
        for batch in batches:
            mat = list_matrix_f64(batch, "embedding")
            norms = np.round(np.sqrt((mat * mat).sum(axis=1)), 4)
            yield pa.RecordBatch.from_pydict(
                {"vec_id": column_i64(batch, "vec_id"), "l2_norm": norms}
            )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInArrow(l2_batches, "vec_id long, l2_norm double")

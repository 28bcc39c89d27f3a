"""B-1 projection / filter / predicate operators (SURVEY.md §2 Table B).

The reference's only projection/predicate surface is the positional
hyperslab slice `var[a:b, c:d]` (Table A A11); value predicates don't
exist there. Here both are declarative `select`/`filter` so Catalyst
pushes them into the parquet scan (PushedFilters + pruned ReadSchema —
checked in tests via explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import register, ts_str
from netcdf4_variable_streamer_spark.tables import load_table


@register(
    "src_parquet_scan",
    oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       CAST(MIN(l_linenumber) AS BIGINT) AS min_line,
       CAST(MAX(l_linenumber) AS BIGINT) AS max_line
FROM lineitem
""",
    doc="Raw parquet scan + count projection — the baseline source path "
        "(column pruning: only 2 columns reach the scan).",
)
def src_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_linenumber").cast("long").alias("min_line"),
        F.max("l_linenumber").cast("long").alias("max_line"),
    )


@register(
    "q_project_rename_cast",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_int,
       ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
       l_returnflag || '/' || l_linestatus AS flag_status,
       STRFTIME(l_shipdate, '%Y-%m-%d') AS ship_day
FROM lineitem
WHERE l_linenumber <= 3
""",
    doc="Projection with rename, cast, computed columns (whole-stage "
        "codegen, no shuffle).",
)
def q_project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") <= 3).select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_quantity").cast("long").alias("qty_int"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_price"
        ),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
        ts_str("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
    )


@register(
    "q_filter_predicates",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority,
       ROUND(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE o_orderstatus <> 'P'
  AND o_totalprice BETWEEN 50000 AND 300000
  AND o_orderpriority IN ('1-URGENT', '2-HIGH', '5-LOW')
  AND (o_orderpriority LIKE '1%' OR NOT o_orderpriority LIKE '5%')
  AND NULLIF(o_orderstatus, 'X') IS NOT NULL
""",
    doc="Predicate algebra: <>, BETWEEN, IN, LIKE, IS NULL, AND/OR/NOT — "
        "all pushed to the parquet scan by Catalyst.",
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") != "P")
        & F.col("o_totalprice").between(50000, 300000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "5-LOW")
        & (
            F.col("o_orderpriority").like("1%")
            | ~F.col("o_orderpriority").like("5%")
        )
        & F.nullif("o_orderstatus", F.lit("X")).isNotNull()
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )

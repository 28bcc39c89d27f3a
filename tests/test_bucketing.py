"""Bucketed co-located join (SCALE.md joins section): persisting both
sides bucketed on the join key lets Catalyst plan the join with ZERO
Exchange nodes — the shuffle happens once at write time and is amortized
over every subsequent join. This is the 100 TB fact-fact join strategy;
the test proves the engine's layout produces the shuffle-free plan and
the identical result."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark import plans
from netcdf4_variable_streamer_spark.tables import load_table
from tests.conftest import SF_DIR

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark):
    wh = tempfile.mkdtemp(prefix="nvss_wh_", dir=os.environ.get(
        "SPARK_GRAFT_SCRATCH", "/tmp"))
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS nvss_bucket_test LOCATION '{wh}'"
    )
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    (
        o.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(wh, "orders_b"))
        .mode("overwrite")
        .saveAsTable("nvss_bucket_test.orders_b")
    )
    (
        li.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", os.path.join(wh, "lineitem_b"))
        .mode("overwrite")
        .saveAsTable("nvss_bucket_test.lineitem_b")
    )
    yield spark
    spark.sql("DROP DATABASE IF EXISTS nvss_bucket_test CASCADE")
    shutil.rmtree(wh, ignore_errors=True)


def test_bucketed_join_zero_shuffle(bucketed):
    spark = bucketed
    # disable broadcast so the join strategy decision is bucket-driven
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table("nvss_bucket_test.orders_b")
        lb = spark.table("nvss_bucket_test.lineitem_b")
        j = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = plans.plan_string(j)
        # the join itself must not shuffle either side: the only Exchange
        # allowed is the one for the final aggregation
        assert plans.count_nodes(plan, "Exchange") <= 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_unbucketed(bucketed):
    spark = bucketed
    ob = spark.table("nvss_bucket_test.orders_b")
    lb = spark.table("nvss_bucket_test.lineitem_b")
    got = (
        ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    want = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    assert got.equals(want)

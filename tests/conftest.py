"""Shared fixtures: one SparkSession (≈6 s startup, SURVEY §7.1) + DuckDB
oracle connection + a comparator mirroring the driver's correctness gate."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import netcdf4_variable_streamer_spark.operators  # noqa: F401  (fills REGISTRY)
import netcdf4_variable_streamer_spark.sources  # noqa: F401  (src_*/snk_* keys)
import netcdf4_variable_streamer_spark.streaming  # noqa: F401  (q_stream_* keys)
from netcdf4_variable_streamer_spark import oracle as oracle_mod
from netcdf4_variable_streamer_spark.registry import REGISTRY
from netcdf4_variable_streamer_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nvss-tests")
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    con = oracle_mod.connect(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def check(spark, oracle_con):
    """check(key): run registry query + oracle on SF_DIR, assert match."""

    def _check(key: str):
        spec = REGISTRY[key]
        sdf = spec.builder(spark, SF_DIR)
        spdf = sdf.toPandas()
        if spec.oracle is None:
            assert len(spdf) >= 0  # rows-only contract; presence is the check
            return spdf
        opdf = oracle_con.execute(spec.oracle).fetchdf()
        oracle_mod.compare_frames(spdf, opdf, key)
        return spdf

    return _check

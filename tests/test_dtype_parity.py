"""Permanent dtype-parity gate over ALL registry keys (VERDICT r3 #3).

Round 3 lost 19 of 20 driver window checks to ONE bug class: DuckDB
returns HUGEINT for ``SUM(BIGINT)``, ``fetchdf()`` converts it to
float64, and the driver's value-hash then sees ``20123.0 != 20123``
against Spark's int64. This test makes the class unrepresentable:

for every oracle-backed key, the Spark builder's DECLARED column types
(plan-only — no job beyond what the builder itself runs) must agree in
kind (int / float / bool) with the dtypes DuckDB's ``fetchdf()`` hands
the driver at sf0.001, and no output column may be array/struct-typed
(the driver's pandas canonicalizer cannot hash ndarray cells — round
3's ``q_text_inverted_index`` error).

Genuine NULL widening is tolerated: when the oracle column actually
contains NULLs, pandas widens int→float64 on BOTH engines' paths and
the driver cannot distinguish them.
"""

from __future__ import annotations

import pytest

import netcdf4_variable_streamer_spark.sources  # noqa: F401
import netcdf4_variable_streamer_spark.streaming  # noqa: F401
from netcdf4_variable_streamer_spark import oracle as oracle_mod
from netcdf4_variable_streamer_spark.registry import ordered_registry
from tools.dtype_parity import key_mismatches

PARITY_SF_DIR = "/root/testdata/sf0.001"

_KEYS = [k for k, s in ordered_registry().items() if s.oracle is not None]


@pytest.fixture(scope="module")
def parity_con():
    con = oracle_mod.connect(PARITY_SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("key", _KEYS)
def test_dtype_parity(key, spark, parity_con):
    spec = ordered_registry()[key]
    problems = key_mismatches(spec, spark, parity_con, PARITY_SF_DIR)
    assert not problems, f"{key}: {problems}"

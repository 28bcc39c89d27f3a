"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real content lives in ``netcdf4_variable_streamer_spark``: every
operator from SURVEY.md §2 Table B registers itself (builder + oracle
SQL) in ``registry.REGISTRY``; this module only adapts that registry to
the driver's contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import netcdf4_variable_streamer_spark.operators  # noqa: F401  (fills REGISTRY)

try:  # streaming + source modules register more keys; tolerate partial builds
    import netcdf4_variable_streamer_spark.streaming  # noqa: F401
except Exception:
    pass
try:
    import netcdf4_variable_streamer_spark.sources  # noqa: F401
except Exception:
    pass

from netcdf4_variable_streamer_spark.registry import REGISTRY, ordered_registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5-shape broadcast star join) on sf0.001."""
    return REGISTRY["q_join_broadcast_star"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # canonical contract order — the driver verifies a bounded prefix per
    # round, so committed SURVEY §2 keys come first (registry.py policy)
    return {k: spec.builder for k, spec in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        k: spec.oracle
        for k, spec in ordered_registry().items()
        if spec.oracle is not None
    }

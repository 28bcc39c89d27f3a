"""Canonical table loading — the engine's scan layer for the test tables.

Applies the ns-timestamp shim (SURVEY.md §7.4): `events.ts` arrives as a
raw INT64 nanosecond epoch (because of `nanosAsLong`) and is rebuilt into
a proper microsecond TimestampType with *integer* division (``ts div
1000`` — float division would lose precision at 1.7e18 ns magnitudes and
disagree with DuckDB's ns→µs truncation).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.session import apply_runtime_confs

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Scan-reuse cache: session -> {(sf_dir, name) -> analyzed DataFrame}.
# Reading a parquet footer + analysis costs ~50-150 ms per call; operators
# that touch 6 tables (star join) pay it 6x per build without this. The
# cache holds lazy plans only (no data is pinned), so it is safe at any
# scale. Keyed WEAKLY on the live session object — id(spark) would alias
# after GC (CPython reuses ids), handing out DataFrames bound to a
# stopped session; a WeakKeyDictionary entry dies with its session.
_SCAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = _SCAN_CACHE.get(spark)
    if per_session is None:
        per_session = _SCAN_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") in ("bigint", "long"):
        # ns epoch → µs TimestampType; truncating integer division matches
        # DuckDB's TIMESTAMP_NS → TIMESTAMP cast for post-1970 data.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    per_session[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so `spark.sql` queries run too."""
    for n, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(n)

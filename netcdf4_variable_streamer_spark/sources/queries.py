"""B-0 source/sink queries (SURVEY.md §2 Table B) over the grid fixture.

The grid fixture (FIXTURES.md §3) is generated deterministically through
the reference-parity write path itself (StreamedDataset/StreamedVariable
— so every scan query also exercises A1-A7), then scanned through the
custom DataSource. DuckDB has no view of the generated store, so these
are rows-only checks; exact round-trip equality is asserted in
tests/test_chunk_source.py instead (SURVEY §5.2 layer 2).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import dsum, register
from netcdf4_variable_streamer_spark.sources.chunkstore import StreamedDataset
from netcdf4_variable_streamer_spark.sources.netcdf_source import (
    FORMAT_NAME,
    NetCDFChunkDataSource,
)

SCRATCH = os.environ.get(
    "SPARK_GRAFT_SCRATCH", os.path.join(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch")
)
GRID_T, GRID_Y, GRID_X = 128, 32, 32


def grid_values(t0: int, n: int) -> dict[str, np.ndarray]:
    """Deterministic (seedless, closed-form) grid block [t0, t0+n)."""
    t = np.arange(t0, t0 + n, dtype=np.float64)[:, None, None]
    y = np.arange(GRID_Y, dtype=np.float64)[None, :, None]
    x = np.arange(GRID_X, dtype=np.float64)[None, None, :]
    temperature = (280 + 10 * np.sin(t * 0.1) + y * 0.01 + x * 0.001).astype(
        np.float32
    )
    humidity = (50 + 20 * np.cos(t * 0.05) - y * 0.02 + x * 0.002).astype(
        np.float32
    )
    return {"temperature": temperature, "humidity": humidity}


def ensure_grid(path: str | None = None, t_total: int = GRID_T) -> str:
    """Materialize the grid store through the reference-parity write path
    (A1-A7): DDL, block-streamed writes, flush-on-close."""
    path = path or os.path.join(SCRATCH, f"grid_{t_total}")
    meta = os.path.join(path, "meta.json")
    if os.path.exists(meta):
        return path
    os.makedirs(path, exist_ok=True)
    ds = StreamedDataset(path, "w")
    ds.create_dimension("time", None)  # UNLIMITED (A2)
    ds.create_dimension("y", GRID_Y)
    ds.create_dimension("x", GRID_X)
    var = ds.create_streamed_variables(
        {"temperature": "float32", "humidity": "float32"},
        ("time", "y", "x"),
        chunk_size_mb=0.125,  # → 16 lines/chunk at 32x32 f32 x2 vars
        attrs={"temperature:units": "K", "humidity:units": "%"},
    )
    step = 48  # deliberately NOT a multiple of chunk_lines (A6 remainder)
    for t0 in range(0, t_total, step):
        n = min(step, t_total - t0)
        var.stream_block(grid_values(t0, n))
    ds.close()  # A7: flush remainder
    return path


def _register_and_load(spark: SparkSession, path: str) -> DataFrame:
    spark.dataSource.register(NetCDFChunkDataSource)
    return spark.read.format(FORMAT_NAME).option("path", path).load()


@register(
    "src_netcdf_chunked_scan",
    oracle=None,  # generated store not visible to DuckDB → rows-only
    doc="Chunk-partitioned scan through the custom DataSource (reference "
        "A1/A8/A9 as a Spark source): full-grid aggregate over one "
        "partition per storage chunk.",
)
def src_netcdf_chunked_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _register_and_load(spark, ensure_grid())
    return df.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("time_idx").alias("n_lines"),
        dsum(F.col("temperature").cast("double")).alias("sum_temp"),
        dsum(F.col("humidity").cast("double")).alias("sum_hum"),
    )


@register(
    "q_filter_hyperslab",
    oracle=None,
    doc="Hyperslab box filter (reference A11) as automatic pushdown: the "
        "streamed-dim range reaches pushFilters and prunes whole chunks; "
        "the y/x box is evaluated post-scan by Spark.",
)
def q_filter_hyperslab(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _register_and_load(spark, ensure_grid())
    box = df.filter(
        (F.col("time_idx") >= 17)
        & (F.col("time_idx") < 93)
        & (F.col("y_idx") < 8)
        & (F.col("x_idx").between(4, 11))
    )
    return box.groupBy("y_idx").agg(
        F.count(F.lit(1)).alias("n_cells"),
        dsum(F.col("temperature").cast("double")).alias("sum_temp"),
        F.min("time_idx").alias("t_min"),
        F.max("time_idx").alias("t_max"),
    )


@register(
    "snk_chunked_write",
    oracle=None,
    doc="Buffered chunk-aligned append sink (reference A4-A7 as a Spark "
        "sink): write a grid slice through the DataSource writer, read "
        "it back through the DataSource reader, compare aggregates.",
)
def snk_chunked_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import uuid as _uuid

    src = ensure_grid()
    dst = os.path.join(SCRATCH, f"grid_sink_{_uuid.uuid4().hex[:8]}")
    from netcdf4_variable_streamer_spark.sources.chunkstore import ChunkStore

    ChunkStore.create(
        dst,
        {"time": None, "y": GRID_Y, "x": GRID_X},
        "time",
        16,
        {"temperature": "float32", "humidity": "float32"},
    )
    spark.dataSource.register(NetCDFChunkDataSource)
    df = spark.read.format(FORMAT_NAME).option("path", src).load()
    slice_df = (
        df.filter(F.col("time_idx") < 32)
        .orderBy("time_idx", "y_idx", "x_idx")
        .coalesce(1)  # single writer task → deterministic line order
    )
    slice_df.write.format(FORMAT_NAME).option("path", dst).mode(
        "append"
    ).save()
    back = spark.read.format(FORMAT_NAME).option("path", dst).load()
    out = back.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("time_idx").alias("n_lines"),
        dsum(F.col("temperature").cast("double")).alias("sum_temp"),
    )
    result = out.collect()[0]
    shutil.rmtree(dst, ignore_errors=True)
    return spark.createDataFrame(
        [result], "n_cells long, n_lines long, sum_temp double"
    )


@register(
    "src_netcdf_stream_tail",
    oracle=None,
    doc="Tail-follow of the growing streamed dim (reference A14) as a "
        "Structured Streaming source: offset = UNLIMITED-dim extent; "
        "availableNow run drains the current extent into a memory sink.",
)
def src_netcdf_stream_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    from netcdf4_variable_streamer_spark.streaming.queries import (
        run_to_completion,
    )

    path = ensure_grid()
    spark.dataSource.register(NetCDFChunkDataSource)
    stream = (
        spark.readStream.format(FORMAT_NAME).option("path", path).load()
    )
    agg = stream.groupBy("time_idx").agg(
        F.count(F.lit(1)).alias("n_cells"),
        dsum(F.col("temperature").cast("double")).alias("sum_temp"),
    )
    return run_to_completion(agg, output_mode="complete")


@register(
    "snk_parquet_partitioned",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Hive-partitioned parquet sink: write lineitem partitionBy "
        "(l_returnflag) with sortWithinPartitions on the filter column "
        "(row-group stats become selective), read the layout back, count "
        "per partition. The re-read per-partition counts must equal the "
        "source's — i.e. the partitioned write loses/duplicates nothing. "
        "At 100 TB this layout is what makes partition pruning free for "
        "every downstream query filtering on the partition column.",
)
def snk_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import uuid as _uuid

    from netcdf4_variable_streamer_spark.tables import load_table

    dst = os.path.join(SCRATCH, f"pq_part_{_uuid.uuid4().hex[:8]}")
    li = load_table(spark, sf_dir, "lineitem")
    (
        li.repartition("l_returnflag")  # one task per partition value bundle
        .sortWithinPartitions("l_shipdate")
        .write.partitionBy("l_returnflag")
        .mode("overwrite")
        .parquet(dst)
    )
    back = spark.read.parquet(dst)
    out = (
        back.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .collect()
    )
    shutil.rmtree(dst, ignore_errors=True)
    return spark.createDataFrame(out, "l_returnflag string, n_rows long")

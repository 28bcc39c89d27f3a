"""M3 tests: reference-parity round trips (SURVEY §5.2 layer 2, the
reference's own test strategy upgraded with hypothesis) + DataSource
scan/pushdown/write/stream behavior."""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from netcdf4_variable_streamer_spark.sources.chunkstore import (
    ChunkStore,
    StreamedDataset,
)
from netcdf4_variable_streamer_spark.sources.netcdf_source import (
    FORMAT_NAME,
    NetCDFChunkDataSource,
    NetCDFChunkReader,
)
from netcdf4_variable_streamer_spark.sources import queries as srcq

SCRATCH = srcq.SCRATCH


def _tmp():
    p = os.path.join(SCRATCH, f"t_{uuid.uuid4().hex[:8]}")
    os.makedirs(p, exist_ok=True)
    return p


# ---------------------------------------------------------------------------
# Layer 2: property-based round trips through the pure-Python store
# (write line-by-line and block-wise → read back → exact equality;
# non-dividing buffer sizes, both axis orders, append-reopen).
# ---------------------------------------------------------------------------

@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    t=st.integers(0, 17),
    ny=st.integers(1, 5),
    nx=st.integers(1, 4),
    chunk_lines=st.integers(1, 7),
    dtype=st.sampled_from(["float32", "float64", "int32", "int64"]),
    streamed_first=st.booleans(),
    by_line=st.booleans(),
)
def test_roundtrip_property(t, ny, nx, chunk_lines, dtype, streamed_first,
                            by_line):
    path = _tmp()
    try:
        store = ChunkStore.create(
            path, {"time": None, "y": ny, "x": nx}, "time", chunk_lines,
            {"v": dtype},
        )
        dims = ("time", "y", "x") if streamed_first else ("y", "x", "time")
        from netcdf4_variable_streamer_spark.sources.chunkstore import (
            StreamedVariable,
        )

        var = StreamedVariable(store, dims)
        rng = np.random.RandomState(42)
        logical_shape = (
            (t, ny, nx) if streamed_first else (ny, nx, t)
        )
        data = (rng.rand(*logical_shape) * 100).astype(dtype)
        if by_line:
            for i in range(t):
                line = np.take(data, i, axis=dims.index("time"))
                var.streamline({"v": line})
        else:
            var.stream_block({"v": data})
        var.flush()

        # read back (new handle = A14 append-reopen semantics for reads)
        store2 = ChunkStore.open(path)
        var2 = StreamedVariable(store2, dims)
        if t == 0:
            assert store2.extent == 0
            return
        got = np.concatenate(
            [b["v"] for _, b in var2.yield_blocks()],
            axis=dims.index("time"),
        )
        np.testing.assert_array_equal(got, data)

        # line generator agrees too
        lines = list(var2.yield_lines())
        assert len(lines) == t
        np.testing.assert_array_equal(
            lines[3][1]["v"] if t > 3 else lines[0][1]["v"],
            np.take(data, 3 if t > 3 else 0, axis=dims.index("time")),
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_append_reopen_continues_extent():
    path = _tmp()
    try:
        ds = StreamedDataset(path, "w")
        ds.create_dimension("time", None)
        ds.create_dimension("y", 3)
        var = ds.create_streamed_variables(
            {"v": "float64"}, ("time", "y"), chunk_size_mb=0.0001
        )
        var.stream_block({"v": np.arange(12.0).reshape(4, 3)})
        ds.close()

        ds2 = StreamedDataset(path, "a")
        assert ds2.store.extent == 4  # cursor = UNLIMITED extent (A14)
        var2 = ds2.variable(("time", "y"))
        var2.stream_block({"v": np.arange(12.0, 18.0).reshape(2, 3)})
        ds2.close()

        store = ChunkStore.open(path)
        assert store.extent == 6
        got = np.concatenate(
            [b["v"] for _, b in
             __import__("netcdf4_variable_streamer_spark.sources.chunkstore",
                        fromlist=["StreamedVariable"])
             .StreamedVariable(store, ("time", "y")).yield_blocks()]
        )
        np.testing.assert_array_equal(got, np.arange(18.0).reshape(6, 3))
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_attrs_roundtrip():
    path = _tmp()
    try:
        ds = StreamedDataset(path, "w")
        ds.create_dimension("time", None)
        ds.create_dimension("y", 2)
        ds.create_streamed_variables(
            {"v": "float32"}, ("time", "y"),
            attrs={"v:units": "K"},
        )
        ds.set_attr("title", "test grid")
        ds.close()
        ds2 = StreamedDataset(path, "r")
        assert ds2.get_attr("title") == "test grid"
        assert ds2.get_attr("v:units") == "K"
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# DataSource: scan equality, pushdown pruning, write path, stream tail.
# ---------------------------------------------------------------------------

def test_scan_matches_store(spark):
    path = srcq.ensure_grid()
    spark.dataSource.register(NetCDFChunkDataSource)
    df = spark.read.format(FORMAT_NAME).option("path", path).load()
    assert df.count() == srcq.GRID_T * srcq.GRID_Y * srcq.GRID_X
    # exact cell check against the closed-form generator
    row = df.filter(
        (df.time_idx == 57) & (df.y_idx == 3) & (df.x_idx == 21)
    ).collect()[0]
    expect = srcq.grid_values(57, 1)
    assert row.temperature == pytest.approx(
        float(expect["temperature"][0, 3, 21]), abs=0
    )


def test_pushdown_prunes_chunks(spark):
    path = srcq.ensure_grid()
    store = ChunkStore.open(path)
    n_chunks = len(store.list_chunks())
    from pyspark.sql.types import StructType

    schema = spark.read.format(FORMAT_NAME).option("path", path).load().schema
    r = NetCDFChunkReader(path, schema)
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    unhandled = list(
        r.pushFilters(
            [GreaterThanOrEqual(("time_idx",), 17), LessThan(("time_idx",), 33),
             LessThan(("y_idx",), 8)]
        )
    )
    # all filters come back (pruning is chunk-granular, rows re-checked)
    assert len(unhandled) == 3
    parts = r.partitions()
    assert 0 < len(parts) < n_chunks  # pruning actually happened
    assert all(p.start + p.n_lines > 17 and p.start < 33 for p in parts)

    # and the full plan returns correct data under pushdown
    df = spark.read.format(FORMAT_NAME).option("path", path).load()
    got = df.filter((df.time_idx >= 17) & (df.time_idx < 33)).count()
    assert got == 16 * srcq.GRID_Y * srcq.GRID_X


def test_native_read_matches_datasource(spark):
    """The native JVM parquet batch path must be row-identical to the
    Python DataSource scan, and must honor commit visibility: a chunk
    file on disk but absent from the meta sidecar (aborted job debris)
    is invisible to both paths."""
    from netcdf4_variable_streamer_spark.sources.netcdf_source import (
        read_native,
    )

    src = srcq.ensure_grid()
    # copy the store so the orphan we plant can't pollute other tests
    path = _tmp()
    shutil.rmtree(path)
    shutil.copytree(src, path)
    spark.dataSource.register(NetCDFChunkDataSource)

    ds = spark.read.format(FORMAT_NAME).option("path", path).load()
    nat = read_native(spark, path)
    assert nat.schema == ds.schema
    cols = ["time_idx", "y_idx", "x_idx", "temperature", "humidity"]
    a = ds.orderBy(*cols[:3]).collect()
    b = nat.orderBy(*cols[:3]).collect()
    assert a == b

    # plant an orphan chunk file NOT referenced by meta.json
    store = ChunkStore.open(path)
    donor = store.list_chunks()[0].file
    shutil.copy(
        os.path.join(path, donor), os.path.join(path, "chunk-99999-orphan.parquet")
    )
    n_expected = srcq.GRID_T * srcq.GRID_Y * srcq.GRID_X
    assert read_native(spark, path).count() == n_expected
    assert (
        spark.read.format(FORMAT_NAME).option("path", path).load().count()
        == n_expected
    )
    shutil.rmtree(path, ignore_errors=True)


def test_sink_roundtrip(check):
    pdf = check("snk_chunked_write")
    assert pdf.loc[0, "n_cells"] == 32 * srcq.GRID_Y * srcq.GRID_X
    assert pdf.loc[0, "n_lines"] == 32


def test_scan_queries(check):
    pdf = check("src_netcdf_chunked_scan")
    assert pdf.loc[0, "n_cells"] == srcq.GRID_T * srcq.GRID_Y * srcq.GRID_X
    box = check("q_filter_hyperslab")
    assert len(box) == 8  # y_idx 0..7
    assert (box["n_cells"] == (93 - 17) * 8).all()  # x 4..11 → 8 cols
    assert (box["t_min"] == 17).all() and (box["t_max"] == 92).all()


def test_stream_tail(check):
    pdf = check("src_netcdf_stream_tail")
    assert len(pdf) == srcq.GRID_T
    assert (pdf["n_cells"] == srcq.GRID_Y * srcq.GRID_X).all()


def test_stream_tail_picks_up_appends(spark):
    """True tail-follow: a second microbatch sees only appended lines."""
    path = _tmp()
    try:
        ChunkStore.create(
            path, {"time": None, "y": 2, "x": 2}, "time", 4,
            {"temperature": "float32", "humidity": "float32"},
        )
        store = ChunkStore.open(path)
        store.append_block(
            {"temperature": np.ones((3, 2, 2), np.float32),
             "humidity": np.zeros((3, 2, 2), np.float32)}
        )
        from pyspark.sql.types import StructType
        spark.dataSource.register(NetCDFChunkDataSource)
        schema = (
            spark.read.format(FORMAT_NAME).option("path", path).load().schema
        )
        r = NetCDFChunkStreamReaderForTest = None
        from netcdf4_variable_streamer_spark.sources.netcdf_source import (
            NetCDFChunkStreamReader,
        )

        sr = NetCDFChunkStreamReader(path, schema)
        rows1, off1 = sr.read(sr.initialOffset())
        assert off1 == {"line": 3} and len(list(rows1)) == 12
        store2 = ChunkStore.open(path)
        store2.append_block(
            {"temperature": np.full((2, 2, 2), 2, np.float32),
             "humidity": np.ones((2, 2, 2), np.float32)}
        )
        rows2, off2 = sr.read(off1)
        rows2 = list(rows2)
        assert off2 == {"line": 5} and len(rows2) == 8
        # replay between offsets returns the same rows (exactly-once)
        replay = list(sr.readBetweenOffsets(off1, off2))
        assert sorted(replay) == sorted(rows2)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_partitioned_parquet_sink(check):
    """Partitioned write round-trip: per-partition counts oracle-match the
    source table (nothing lost/duplicated by the layout rewrite)."""
    pdf = check("snk_parquet_partitioned")
    assert len(pdf) == 3  # l_returnflag in {A, N, R}


def test_partition_overwrite_dynamic(check):
    """Dynamic partition overwrite: only the partition present in the
    incoming frame is replaced; siblings survive byte-for-byte."""
    pdf = check("snk_partition_overwrite").set_index("l_returnflag")
    assert pdf.loc["A", "n_rows"] < pdf.loc["N", "n_rows"]  # A was shrunk
    assert pdf.loc["N", "n_rows"] > 10000  # N untouched (full count)


def test_sink_overwrite_mode(spark):
    """mode('overwrite') must REPLACE the store's chunks, not silently
    append duplicates; the reset happens at job commit so a failed job
    leaves the old data intact."""
    src = srcq.ensure_grid()
    dst = _tmp()
    ChunkStore.create(
        dst,
        {"time": None, "y": srcq.GRID_Y, "x": srcq.GRID_X},
        "time",
        16,
        {"temperature": "float32", "humidity": "float32"},
    )
    spark.dataSource.register(NetCDFChunkDataSource)
    sl = (
        spark.read.format(FORMAT_NAME).option("path", src).load()
        .filter("time_idx < 32")
        .orderBy("time_idx", "y_idx", "x_idx")
        .coalesce(1)
    )
    for mode in ("append", "append"):  # 2 appends -> 64 lines
        sl.write.format(FORMAT_NAME).option("path", dst).mode(mode).save()
    assert ChunkStore.open(dst).extent == 64
    # overwrite drops both prior appends and leaves exactly one copy
    sl.write.format(FORMAT_NAME).option("path", dst).mode("overwrite").save()
    store = ChunkStore.open(dst)
    assert store.extent == 32
    back = spark.read.format(FORMAT_NAME).option("path", dst).load()
    assert back.count() == 32 * srcq.GRID_Y * srcq.GRID_X
    # every chunk file the meta references exists; no orphan chunk files
    files = {c.file for c in store.list_chunks()}
    on_disk = {f for f in os.listdir(dst) if f.startswith("chunk-")}
    assert files == on_disk
    shutil.rmtree(dst, ignore_errors=True)


def test_stream_write_foreachbatch_roundtrip(spark):
    """The reference's primary use case in streaming form: lines arriving
    as an unbounded stream are appended into the chunked store through
    the engine's own sink (readStream tail -> foreachBatch -> DataSource
    writer), and the result equals the source exactly."""
    import tempfile

    src = srcq.ensure_grid()
    dst = _tmp()
    ChunkStore.create(
        dst,
        {"time": None, "y": srcq.GRID_Y, "x": srcq.GRID_X},
        "time",
        16,
        {"temperature": "float32", "humidity": "float32"},
    )
    spark.dataSource.register(NetCDFChunkDataSource)

    def append_batch(batch_df, batch_id):
        (
            batch_df.orderBy("time_idx", "y_idx", "x_idx")
            .coalesce(1)
            .write.format(FORMAT_NAME)
            .option("path", dst)
            .mode("append")
            .save()
        )

    stream = spark.readStream.format(FORMAT_NAME).option("path", src).load()
    ckpt = tempfile.mkdtemp(prefix="ckpt_sw_", dir=SCRATCH)
    q = (
        stream.writeStream.foreachBatch(append_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()

    src_df = (
        spark.read.format(FORMAT_NAME).option("path", src).load().toPandas()
        .sort_values(["time_idx", "y_idx", "x_idx"]).reset_index(drop=True)
    )
    dst_df = (
        spark.read.format(FORMAT_NAME).option("path", dst).load().toPandas()
        .sort_values(["time_idx", "y_idx", "x_idx"]).reset_index(drop=True)
    )
    assert len(dst_df) == len(src_df) == srcq.GRID_T * srcq.GRID_Y * srcq.GRID_X
    assert np.array_equal(
        src_df["temperature"].to_numpy(), dst_df["temperature"].to_numpy()
    )
    assert np.array_equal(
        src_df["humidity"].to_numpy(), dst_df["humidity"].to_numpy()
    )
    shutil.rmtree(dst, ignore_errors=True)


def test_compression_passthrough():
    """Reference A15: codec settings forwarded to storage and recorded in
    the meta sidecar; round-trip is byte-identical across codecs."""
    import pyarrow.parquet as pq

    for codec, level in (("zstd", 7), ("gzip", 6), ("snappy", None)):
        path = _tmp()
        try:
            store = ChunkStore.create(
                path, {"time": None, "y": 3, "x": 4}, "time", 4,
                {"v": "float64"}, compression=codec, compression_level=level,
            )
            block = np.arange(2 * 3 * 4, dtype=np.float64).reshape(2, 3, 4)
            store.append_block({"v": block})
            re = ChunkStore.open(path)
            assert re.compression == codec
            got = re.read_chunk(re.list_chunks()[0]).column("v").to_numpy()
            assert np.array_equal(got, block.reshape(-1))
            meta = pq.ParquetFile(
                os.path.join(path, re.list_chunks()[0].file)
            ).metadata
            assert meta.row_group(0).column(0).compression.lower() == (
                "uncompressed" if codec == "none" else codec
            )
        finally:
            shutil.rmtree(path, ignore_errors=True)


def test_compact_small_files(check):
    """Compaction: 64 fragments -> <=4 files, rows and exact value sums
    preserved (oracle-matched against the source table)."""
    pdf = check("snk_compact_small_files")
    assert bool(pdf["compacted_ok"].iloc[0]) is True


def test_a10_transposed_axis_roundtrip(tmp_path):
    """Reference A10: the streamed dim sits at LOGICAL axis 1 of the
    variable ((y, time, x)); writes arrive in logical order, storage is
    streamed-first, and reads come back transposed to logical order.
    Never previously covered by a test — any transpose slip shears the
    grid and this round-trip catches it."""
    import numpy as np

    from netcdf4_variable_streamer_spark.sources.chunkstore import (
        StreamedDataset,
    )

    path = str(tmp_path / "transposed")
    T, Y, X = 24, 4, 5
    ds = StreamedDataset(path, "w")
    ds.create_dimension("time", None)
    ds.create_dimension("y", Y)
    ds.create_dimension("x", X)
    var = ds.create_streamed_variables(
        {"v": "float32"}, ("y", "time", "x"), chunk_size_mb=0.0005
    )
    rng = np.random.RandomState(11)
    logical = rng.rand(Y, T, X).astype(np.float32)  # (y, time, x)
    # stream a block with the streamed dim at its logical axis (1),
    # deliberately split at a non-chunk-aligned boundary
    var.stream_block({"v": logical[:, :17, :]})
    var.stream_block({"v": logical[:, 17:, :]})
    ds.close()

    back = StreamedDataset(path, "r")
    rv = back.variable(("y", "time", "x"))
    got_blocks = []
    for _start, block in rv.yield_blocks():
        assert block["v"].shape[0] == Y and block["v"].shape[2] == X
        got_blocks.append(block["v"])
    got = np.concatenate(got_blocks, axis=1)  # re-join along time
    np.testing.assert_array_equal(got, logical)

    # single-line path: streamline takes a logical (y, x) line
    ds2 = StreamedDataset(path, "a")
    var2 = ds2.variable(("y", "time", "x"))
    extra = rng.rand(Y, X).astype(np.float32)
    var2.streamline({"v": extra})
    ds2.close()
    back2 = StreamedDataset(path, "r")
    rv2 = back2.variable(("y", "time", "x"))
    total = np.concatenate(
        [b["v"] for _s, b in rv2.yield_blocks()], axis=1
    )
    assert total.shape == (Y, T + 1, X)
    np.testing.assert_array_equal(total[:, -1, :], extra)


def test_arrow_stream_tail_protocol(spark):
    """Chunk-store Arrow tail (tail_reader=arrow): extent offsets,
    chunk-bundled partitions, Arrow rows masked to the offset window —
    value-identical to the Simple reader, including a microbatch whose
    window splits a chunk."""
    path = _tmp()
    try:
        ChunkStore.create(
            path, {"time": None, "y": 2, "x": 2}, "time", 4,
            {"temperature": "float32", "humidity": "float32"},
        )
        store = ChunkStore.open(path)
        store.append_block(
            {"temperature": np.ones((6, 2, 2), np.float32),
             "humidity": np.zeros((6, 2, 2), np.float32)}
        )
        spark.dataSource.register(NetCDFChunkDataSource)
        schema = (
            spark.read.format(FORMAT_NAME).option("path", path).load().schema
        )
        from netcdf4_variable_streamer_spark.sources.netcdf_source import (
            NetCDFChunkArrowStreamReader,
            NetCDFChunkStreamReader,
        )

        ar = NetCDFChunkArrowStreamReader(path, schema, target_partitions=2)
        assert ar.initialOffset() == {"line": 0}
        off1 = ar.latestOffset()
        assert off1 == {"line": 6}

        def rows(start, end):
            out = []
            for p in ar.partitions(start, end):
                for rb in ar.read(p):
                    out.extend(
                        tuple(r[c] for c in ar.columns)
                        for r in rb.to_pylist()
                    )
            return out

        got = rows(ar.initialOffset(), off1)
        sr = NetCDFChunkStreamReader(path, schema)
        want, off_s = sr.read(sr.initialOffset())
        assert off_s == off1
        assert sorted(got) == sorted(list(want))
        assert ar.partitions(off1, off1) == []

        # append 3 more lines: the delta window [6, 9) splits the
        # chunk holding lines 4..7 — masking must trim it exactly
        ChunkStore.open(path).append_block(
            {"temperature": np.full((3, 2, 2), 2, np.float32),
             "humidity": np.ones((3, 2, 2), np.float32)}
        )
        off2 = ar.latestOffset()
        assert off2 == {"line": 9}
        got2 = rows(off1, off2)
        assert len(got2) == 12  # 3 lines x 4 cells
        assert {r[0] for r in got2} == {6, 7, 8}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_src_netcdf_arrow_tail_oracle(check):
    pdf = check("src_netcdf_arrow_tail")
    assert len(pdf) == srcq.GRID_T
    assert (pdf["n_cells"] == srcq.GRID_Y * srcq.GRID_X).all()


def test_in_filter_prunes_record_range(spark):
    """time_idx.isin(...) pushes an In filter whose value is a LIST —
    the readers must prune the record range to the value envelope
    instead of crashing on int(list) (round 12, found by the
    points-v2 scan key), and the full plan stays row-correct."""
    from pyspark.sql.datasource import In

    from netcdf4_variable_streamer_spark.sources.netcdf3_source import (
        NetCDF3Reader,
    )
    from netcdf4_variable_streamer_spark.sources.netcdf4_source import (
        FORMAT4_NAME,
        NetCDF4DataSource,
        NetCDF4Reader,
    )

    from netcdf4_variable_streamer_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    spark.dataSource.register(NetCDF4DataSource)
    p4 = srcq.ensure_nc4()
    schema4 = (
        spark.read.format(FORMAT4_NAME).option("path", p4).load().schema
    )
    r = NetCDF4Reader(p4, schema4)
    out = list(r.pushFilters([In(("time_idx",), (9, 4, 30))]))
    assert len(out) == 1  # returned for row-level re-check
    assert (r.lo, r.hi) == (4, 31)

    p3 = srcq.ensure_nc3()
    from netcdf4_variable_streamer_spark.sources.netcdf3_source import (
        FORMAT3_NAME,
        NetCDF3DataSource,
    )

    apply_runtime_confs(spark)
    spark.dataSource.register(NetCDF3DataSource)
    schema3 = (
        spark.read.format(FORMAT3_NAME).option("path", p3).load().schema
    )
    r3 = NetCDF3Reader(p3, schema3)
    assert len(list(r3.pushFilters([In(("time_idx",), (12, 7))]))) == 1
    assert (r3.lo, r3.hi) == (7, 13)

    df = spark.read.format(FORMAT4_NAME).option("path", p4).load()
    got = df.filter(df.time_idx.isin([4, 9, 30])).count()
    assert got == 3 * srcq.GRID_Y * srcq.GRID_X

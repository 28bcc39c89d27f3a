"""NetCDF-3 classic codec tests (VERDICT r2 "Next round" #4).

Three layers: (1) a GOLDEN-BYTES check against a hand-assembled minimal
file straight from the public classic-format spec (so the codec is
validated against the format, not against itself); (2) write→read
round-trips covering fixed+record variables, multi-record-var padding,
attributes, and record-range reads; (3) the Spark DataSource: long-form
scan equality with the source arrays, record-range partition planning,
and pushdown pruning.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from netcdf4_variable_streamer_spark.sources.netcdf3 import (
    NetCDF3File,
    write_netcdf3,
)


def _golden_minimal() -> bytes:
    """Hand-assembled per the spec: dims time(record), x=2; one int16
    record var v(time, x); numrecs=2; data [[1,2],[3,4]].

    Layout: magic(4) numrecs(4) dim_list(8 + 12 + 12) gatt ABSENT(8)
    var_list(8 + [name 8, ndims 4, dimids 8, vatt 8, type 4, vsize 4,
    begin 4]) = 96 bytes of header; begin = 96."""
    h = b"CDF\x01"
    h += struct.pack(">i", 2)  # numrecs
    h += struct.pack(">ii", 0x0A, 2)  # NC_DIMENSION, 2 dims
    h += struct.pack(">i", 4) + b"time"  # name 'time' (4 bytes, no pad)
    h += struct.pack(">i", 0)  # record dim: length 0
    h += struct.pack(">i", 1) + b"x\x00\x00\x00"  # name 'x' padded
    h += struct.pack(">i", 2)  # x = 2
    h += struct.pack(">ii", 0, 0)  # gatt ABSENT
    h += struct.pack(">ii", 0x0B, 1)  # NC_VARIABLE, 1 var
    h += struct.pack(">i", 1) + b"v\x00\x00\x00"  # name 'v'
    h += struct.pack(">i", 2)  # ndims
    h += struct.pack(">ii", 0, 1)  # dimids: time, x
    h += struct.pack(">ii", 0, 0)  # vatt ABSENT
    h += struct.pack(">ii", 3, 4)  # NC_SHORT, vsize = 4 (one record)
    h += struct.pack(">i", 96)  # begin
    data = struct.pack(">4h", 1, 2, 3, 4)  # rec0: 1,2 ; rec1: 3,4
    return h + data


def test_writer_matches_golden_bytes(tmp_path):
    path = os.path.join(tmp_path, "g.nc")
    write_netcdf3(
        path,
        dims={"time": None, "x": 2},
        variables={"v": ("int16", ("time", "x"))},
        data={"v": np.array([[1, 2], [3, 4]], dtype=np.int16)},
    )
    assert open(path, "rb").read() == _golden_minimal()


def test_reader_parses_golden_bytes(tmp_path):
    path = os.path.join(tmp_path, "g.nc")
    with open(path, "wb") as f:
        f.write(_golden_minimal())
    nc = NetCDF3File(path)
    assert nc.version == 1
    assert nc.numrecs == 2
    assert nc.dims == {"time": None, "x": 2}
    assert nc.record_dim == "time"
    v = nc.variables["v"]
    assert v.is_record and v.shape == (2,) and v.nc_type == 3
    np.testing.assert_array_equal(
        nc.read_records("v"), np.array([[1, 2], [3, 4]], dtype=np.int16)
    )


def test_roundtrip_fixed_and_record_vars(tmp_path):
    path = os.path.join(tmp_path, "rt.nc")
    rng = np.random.RandomState(7)
    lat = np.linspace(-90, 90, 5)
    temp = rng.randn(6, 5, 3).astype(np.float32)
    hum = (rng.rand(6, 5, 3) * 100).astype(np.float64)
    flag = rng.randint(-100, 100, size=(6, 5, 3), dtype=np.int8)
    write_netcdf3(
        path,
        dims={"time": None, "lat": 5, "lon": 3},
        variables={
            "lat": ("float64", ("lat",)),
            "temperature": ("float32", ("time", "lat", "lon")),
            "humidity": ("float64", ("time", "lat", "lon")),
            "flag": ("int8", ("time", "lat", "lon")),
        },
        data={
            "lat": lat,
            "temperature": temp,
            "humidity": hum,
            "flag": flag,
        },
        attrs={"title": "roundtrip", "level": 3},
        var_attrs={"temperature": {"units": "K", "scale": 1.5}},
    )
    nc = NetCDF3File(path)
    assert nc.numrecs == 6
    assert nc.attrs["title"] == "roundtrip"
    assert int(nc.attrs["level"]) == 3
    assert nc.variables["temperature"].attrs["units"] == "K"
    assert float(nc.variables["temperature"].attrs["scale"]) == 1.5
    np.testing.assert_array_equal(nc.read_fixed("lat"), lat)
    np.testing.assert_array_equal(nc.read_records("temperature"), temp)
    np.testing.assert_array_equal(nc.read_records("humidity"), hum)
    # flag's 15-byte record slab forces the multi-record-var 4-byte
    # padding rule; any padding error skews every later record
    np.testing.assert_array_equal(nc.read_records("flag"), flag)


def test_record_range_read_is_a_slice(tmp_path):
    path = os.path.join(tmp_path, "slice.nc")
    data = np.arange(40, dtype=np.int32).reshape(10, 4)
    write_netcdf3(
        path,
        dims={"t": None, "x": 4},
        variables={"v": ("int32", ("t", "x"))},
        data={"v": data},
    )
    nc = NetCDF3File(path)
    np.testing.assert_array_equal(nc.read_records("v", 3, 7), data[3:7])
    np.testing.assert_array_equal(nc.read_records("v", 8, 99), data[8:])
    assert nc.read_records("v", 7, 3).shape == (0, 4)


def test_single_record_var_is_unpadded(tmp_path):
    # spec special case: exactly one record variable -> slabs unpadded;
    # an int8 x3 slab (3 bytes) exposes any wrongly-applied padding
    path = os.path.join(tmp_path, "pad.nc")
    data = np.arange(12, dtype=np.int8).reshape(4, 3)
    write_netcdf3(
        path,
        dims={"t": None, "x": 3},
        variables={"v": ("int8", ("t", "x"))},
        data={"v": data},
    )
    nc = NetCDF3File(path)
    assert nc.recsize == 3  # not 4
    np.testing.assert_array_equal(nc.read_records("v"), data)
    # file size = header + numrecs * recsize exactly
    begin = nc.variables["v"].begin
    assert os.path.getsize(path) == begin + 4 * 3


@pytest.fixture(scope="module")
def nc3_grid(tmp_path_factory):
    """A 48-record grid .nc written by the codec, plus its arrays."""
    path = os.path.join(tmp_path_factory.mktemp("nc3"), "grid.nc")
    from netcdf4_variable_streamer_spark.sources.queries import grid_values

    vals = grid_values(0, 48)
    write_netcdf3(
        path,
        dims={"time": None, "y": 32, "x": 32},
        variables={
            "temperature": ("float32", ("time", "y", "x")),
            "humidity": ("float32", ("time", "y", "x")),
        },
        data=vals,
        attrs={"source": "closed-form grid"},
    )
    return path, vals


def test_spark_scan_matches_source_arrays(spark, nc3_grid):
    from pyspark.sql import functions as F

    from netcdf4_variable_streamer_spark.sources.netcdf3_source import (
        FORMAT3_NAME,
        NetCDF3DataSource,
    )

    path, vals = nc3_grid
    spark.dataSource.register(NetCDF3DataSource)
    df = spark.read.format(FORMAT3_NAME).option("path", path).load()
    assert df.count() == 48 * 32 * 32
    got = (
        df.filter(F.col("time_idx") == 17)
        .orderBy("y_idx", "x_idx")
        .select("temperature")
        .toPandas()["temperature"]
        .to_numpy()
        .astype(np.float32)
    )
    np.testing.assert_array_equal(
        got, vals["temperature"][17].reshape(-1)
    )


def test_spark_scan_pushdown_prunes_records(spark, nc3_grid):
    from netcdf4_variable_streamer_spark.sources.netcdf3_source import (
        FORMAT3_NAME,
        NetCDF3DataSource,
    )

    path, _ = nc3_grid
    spark.dataSource.register(NetCDF3DataSource)
    base = spark.read.format(FORMAT3_NAME).option("path", path).load()
    full = base.rdd.getNumPartitions()
    pruned = base.filter(
        (base.time_idx >= 40) & (base.time_idx < 44)
    ).rdd.getNumPartitions()
    assert pruned < full, (full, pruned)


def test_src_netcdf3_scan_oracle(check):
    from netcdf4_variable_streamer_spark.sources import queries as srcq

    pdf = check("src_netcdf3_scan")
    assert pdf.loc[0, "n_cells"] == 96 * srcq.GRID_Y * srcq.GRID_X
    assert pdf.loc[0, "n_lines"] == 96


def test_snk_netcdf3_write_oracle(check):
    from netcdf4_variable_streamer_spark.sources import queries as srcq

    pdf = check("snk_netcdf3_write")
    assert pdf.loc[0, "n_cells"] == 32 * srcq.GRID_Y * srcq.GRID_X
    assert pdf.loc[0, "n_lines"] == 32


def test_nc3_append_and_tail(spark, tmp_path):
    """A14 on a real file: append_records grows the record region and
    patches numrecs last; a second microbatch sees ONLY the appended
    records, and offset replay is exactly-once."""
    from netcdf4_variable_streamer_spark.sources.netcdf3 import (
        append_records,
    )
    from netcdf4_variable_streamer_spark.sources.netcdf3_source import (
        FORMAT3_NAME,
        NetCDF3DataSource,
        NetCDF3StreamReader,
    )

    path = os.path.join(tmp_path, "tail.nc")
    write_netcdf3(
        path,
        dims={"t": None, "x": 2},
        variables={"v": ("float32", ("t", "x"))},
        data={"v": np.arange(6, dtype=np.float32).reshape(3, 2)},
    )
    spark.dataSource.register(NetCDF3DataSource)
    schema = spark.read.format(FORMAT3_NAME).option("path", path).load().schema
    sr = NetCDF3StreamReader(path, schema)
    rows1, off1 = sr.read(sr.initialOffset())
    assert off1 == {"rec": 3} and len(list(rows1)) == 6
    new_total = append_records(
        path, {"v": np.full((2, 2), 9, dtype=np.float32)}
    )
    assert new_total == 5
    assert NetCDF3File(path).numrecs == 5
    rows2, off2 = sr.read(off1)
    rows2 = list(rows2)
    assert off2 == {"rec": 5} and len(rows2) == 4
    assert all(r[-1] == 9.0 for r in rows2)
    replay = list(sr.readBetweenOffsets(off1, off2))
    assert sorted(replay) == sorted(rows2)
    # batch rescan sees the grown extent too
    assert (
        spark.read.format(FORMAT3_NAME).option("path", path).load().count()
        == 10
    )


def test_multifile_prunes_whole_files(spark):
    """A global streamed-dim range that misses a member file must prune
    that file's partitions entirely (it is never opened for data)."""
    from netcdf4_variable_streamer_spark.sources import queries as srcq
    from netcdf4_variable_streamer_spark.sources.netcdf3_source import (
        FORMAT3_NAME,
        NetCDF3DataSource,
    )

    path = srcq.ensure_nc3_multifile()
    spark.dataSource.register(NetCDF3DataSource)
    base = spark.read.format(FORMAT3_NAME).option("path", path).load()
    assert base.count() == 128 * 32 * 32
    full = base.rdd.getNumPartitions()
    pruned = base.filter(
        (base.time_idx >= 90) & (base.time_idx < 100)
    ).rdd.getNumPartitions()
    assert pruned < full, (full, pruned)
    # cross-boundary global indexing: records 30..40 span files 1 and 2
    span = base.filter((base.time_idx >= 30) & (base.time_idx < 40))
    assert span.select("time_idx").distinct().count() == 10

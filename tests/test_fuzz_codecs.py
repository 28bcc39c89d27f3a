"""Property-based round-trip fuzzing for the round-3 pure-NumPy codecs
(NetCDF-3 classic, WAV PCM16, PNG): encode(decode(x)) == x over random
shapes, dtypes, record counts, and values — the format spec is exercised
far beyond the hand-picked cases of tests/test_netcdf3.py, including the
padding special cases (single-record-var unpadded slabs, odd slab sizes,
char attrs, fixed+record mixes).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from netcdf4_variable_streamer_spark.functions.multimodal import (
    decode_png,
    decode_wav_pcm16,
    encode_png,
    encode_wav_pcm16,
)
from netcdf4_variable_streamer_spark.sources.netcdf3 import (
    NetCDF3File,
    append_records,
    write_netcdf3,
)

_SETTINGS = settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_NC_DTYPES = ["int8", "int16", "int32", "float32", "float64"]
# CDF-5-only dtypes — drawing any of these makes the writer emit a
# version-5 file, so the fuzz walks the 64-bit header grammar too
_CDF5_DTYPES = _NC_DTYPES + ["uint8", "uint16", "uint32", "int64", "uint64"]


@st.composite
def _nc_case(draw):
    numrecs = draw(st.integers(0, 12))
    fixed_dims = draw(
        st.lists(st.integers(1, 5), min_size=0, max_size=2)
    )
    n_rec_vars = draw(st.integers(1, 3))
    n_fixed_vars = draw(st.integers(0, 2))
    dtype_pool = _CDF5_DTYPES if draw(st.booleans()) else _NC_DTYPES
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    dims = {"t": None}
    for i, n in enumerate(fixed_dims):
        dims[f"d{i}"] = n
    fixed_names = tuple(f"d{i}" for i in range(len(fixed_dims)))
    variables, data = {}, {}
    for i in range(n_rec_vars):
        dt = draw(st.sampled_from(dtype_pool))
        variables[f"rv{i}"] = (dt, ("t",) + fixed_names)
        shape = (numrecs, *fixed_dims)
        raw = rng.randint(-100, 100, size=shape)
        data[f"rv{i}"] = raw.astype(dt)
    for i in range(n_fixed_vars):
        dt = draw(st.sampled_from(dtype_pool))
        variables[f"fv{i}"] = (dt, fixed_names)
        data[f"fv{i}"] = rng.randint(-100, 100, size=tuple(fixed_dims)).astype(dt)
    return dims, variables, data, numrecs


@_SETTINGS
@given(case=_nc_case())
def test_netcdf3_roundtrip_fuzz(tmp_path_factory, case):
    dims, variables, data, numrecs = case
    path = os.path.join(str(tmp_path_factory.mktemp("ncfuzz")), "f.nc")
    write_netcdf3(
        path, dims, variables, data, attrs={"title": "fuzz", "k": 7}
    )
    nc = NetCDF3File(path)
    assert nc.numrecs == numrecs
    assert nc.attrs["title"] == "fuzz"
    for name, (dt, vdims) in variables.items():
        v = nc.variables[name]
        if vdims and vdims[0] == "t":
            got = nc.read_records(name)
        else:
            got = nc.read_fixed(name)
        assert got.dtype.newbyteorder("=") == np.dtype(dt)
        np.testing.assert_array_equal(
            got.astype(dt), data[name], err_msg=name
        )


@_SETTINGS
@given(
    n_extra=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
    fixed=st.integers(1, 4),
    dt=st.sampled_from(_CDF5_DTYPES),
)
def test_netcdf3_append_fuzz(tmp_path_factory, n_extra, seed, fixed, dt):
    rng = np.random.RandomState(seed)
    base = rng.randint(-50, 50, size=(3, fixed)).astype(dt)
    extra = rng.randint(-50, 50, size=(n_extra, fixed)).astype(dt)
    path = os.path.join(str(tmp_path_factory.mktemp("ncapp")), "a.nc")
    write_netcdf3(
        path,
        dims={"t": None, "x": fixed},
        variables={"v": (dt, ("t", "x"))},
        data={"v": base},
    )
    assert append_records(path, {"v": extra}) == 3 + n_extra
    got = NetCDF3File(path).read_records("v")
    np.testing.assert_array_equal(
        got.astype(dt), np.concatenate([base, extra])
    )


@_SETTINGS
@given(
    n=st.integers(0, 3000),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_fuzz(n, rate, seed):
    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32768, size=n).astype(np.int16)
    out, got_rate = decode_wav_pcm16(encode_wav_pcm16(s, rate))
    assert got_rate == rate
    np.testing.assert_array_equal(out, s)


@_SETTINGS
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_fuzz(h, w, c, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(a)), a)


@st.composite
def _h5_case(draw):
    ndims = draw(st.integers(1, 3))
    shape = tuple(draw(st.integers(1, 9)) for _ in range(ndims))
    dt = draw(st.sampled_from(_CDF5_DTYPES))
    layout = draw(st.sampled_from(["contiguous", "chunked", "filtered"]))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    arr = rng.randint(-100, 100, size=shape).astype(dt)
    opts = {}
    if layout != "contiguous":
        opts["chunk"] = tuple(
            draw(st.integers(1, max(1, s))) for s in shape
        )
    if layout == "filtered":
        opts["compress"] = draw(st.integers(0, 9))
        opts["shuffle"] = draw(st.booleans())
    if draw(st.booleans()):
        opts["maxshape"] = (None,) + shape[1:]
        opts.setdefault("chunk", tuple(max(1, s) for s in shape))
    return arr, opts


@_SETTINGS
@given(
    case=_h5_case(),
    lo=st.integers(0, 10),
    n=st.integers(0, 10),
    libver=st.sampled_from(["earliest", "latest"]),
)
def test_hdf5_roundtrip_fuzz(tmp_path_factory, case, lo, n, libver):
    """Roundtrip across both encoding families: v0 superblock + v1
    headers + v1 B-trees, and the latest encodings (v2 superblock,
    OHDR, layout v4 with Single Chunk / Fixed Array / Extensible
    Array indexes picked by the same shape/maxshape the library
    would)."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    arr, opts = case
    path = os.path.join(str(tmp_path_factory.mktemp("h5fuzz")), "f.h5")
    write_hdf5(path, {"v": arr}, {"v": opts}, attrs={"k": 7}, libver=libver)
    h = HDF5File(path)
    assert int(h.attrs["k"]) == 7
    got = h.read("v")
    assert got.dtype == arr.dtype
    np.testing.assert_array_equal(got, arr)
    np.testing.assert_array_equal(
        h.read_slab0("v", lo, lo + n), arr[lo : lo + n]
    )


@_SETTINGS
@given(
    n_objs=st.integers(9, 24),
    n_attrs=st.integers(9, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_hdf5_dense_storage_fuzz(tmp_path_factory, n_objs, n_attrs, seed):
    """Dense links (>8 children) and dense attributes (>8 attrs) under
    libver='latest' round-trip for arbitrary counts and names."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    rng = np.random.RandomState(seed)
    data = {
        f"ds_{rng.randint(1 << 30)}_{i}": rng.randint(
            -50, 50, size=rng.randint(1, 9), dtype=np.int32
        )
        for i in range(n_objs)
    }
    attrs = {f"a{i}": float(i) * 0.5 for i in range(n_attrs)}
    path = os.path.join(str(tmp_path_factory.mktemp("dense")), "f.h5")
    write_hdf5(
        path,
        data,
        {next(iter(data)): {"attrs": attrs}},
        attrs=attrs,
        libver="latest",
    )
    h = HDF5File(path)
    assert sorted(h.datasets) == sorted(data)
    for k, v in data.items():
        np.testing.assert_array_equal(h.read(k), v)
    assert len(h.attrs) == n_attrs
    assert len(h.datasets[next(iter(data))].attrs) == n_attrs


@_SETTINGS
@given(seed=st.integers(0, 2**31 - 1), nflips=st.integers(1, 6))
def test_hdf5_corruption_fails_controlled(tmp_path_factory, seed, nflips):
    """Random byte flips in a valid file must surface as ValueError
    (or parse clean when the flip hits data bytes) — never a bare
    struct.error/IndexError/TypeError, and never a petabyte
    allocation from a corrupted shape (round-5 corruption fuzzing
    found all of those classes leaking)."""
    import random

    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    d = np.arange(160, dtype=np.int64).reshape(40, 4)
    root = str(tmp_path_factory.mktemp("h5corrupt"))
    base_path = os.path.join(root, "base.h5")
    write_hdf5(
        base_path,
        {"v": d, "grp/w": d[:5]},
        {"v": {"chunk": (8, 4), "compress": 4, "shuffle": True,
               "attrs": {"units": "m"}}},
        attrs={"title": "x"},
    )
    buf = bytearray(open(base_path, "rb").read())
    rng = random.Random(seed)
    for _ in range(nflips):
        buf[rng.randrange(len(buf))] = rng.randrange(256)
    path = os.path.join(root, "t.h5")
    with open(path, "wb") as f:
        f.write(bytes(buf))
    try:
        h = HDF5File(path)
        for n in list(h.datasets):
            h.read(n)
    except ValueError:
        pass  # loud, contextual refusal — the contract


@_SETTINGS
@given(seed=st.integers(0, 2**31 - 1), nflips=st.integers(1, 6))
def test_netcdf3_corruption_fails_controlled(
    tmp_path_factory, seed, nflips
):
    """Same contract for the classic codec — in particular a corrupted
    begin offset must raise, not stretch the memmap view past EOF and
    SIGBUS the executor process (found by round-5 corruption fuzzing)."""
    import random

    from netcdf4_variable_streamer_spark.sources.netcdf3 import (
        NetCDF3File,
        write_netcdf3,
    )

    root = str(tmp_path_factory.mktemp("nc3corrupt"))
    base_path = os.path.join(root, "base.nc")
    write_netcdf3(
        base_path,
        dims={"t": None, "x": 4},
        variables={
            "v": ("int32", ("t", "x")),
            "w": ("float64", ("t", "x")),
        },
        data={
            "v": np.arange(40, dtype=np.int32).reshape(10, 4),
            "w": np.arange(40, dtype=np.float64).reshape(10, 4),
        },
        attrs={"title": "x"},
    )
    buf = bytearray(open(base_path, "rb").read())
    rng = random.Random(seed)
    for _ in range(nflips):
        buf[rng.randrange(len(buf))] = rng.randrange(256)
    path = os.path.join(root, "t.nc")
    with open(path, "wb") as f:
        f.write(bytes(buf))
    try:
        nc = NetCDF3File(path)
        for n in list(nc.variables):
            var = nc.variables[n]
            (nc.read_records(n) if var.is_record else nc.read_fixed(n))
    except ValueError:
        pass  # loud, contextual refusal — the contract


@st.composite
def _vlen_case(draw):
    n = draw(st.integers(1, 40))
    kind = draw(st.sampled_from(["str", "f4", "i2", "i8"]))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    cells = np.empty((n,), dtype=object)
    for i in range(n):
        k = int(rng.randint(0, 7))
        if kind == "str":
            cells[i] = "".join(
                rng.choice(list("abĉ日-𝄞"), size=k)
            )
        else:
            cells[i] = rng.randint(-1000, 1000, size=k).astype(kind)
    opts = {}
    if draw(st.booleans()):
        opts["chunk"] = (draw(st.integers(1, n)),)
        if draw(st.booleans()):
            opts["compress"] = draw(st.integers(0, 9))
            opts["shuffle"] = draw(st.booleans())
    return cells, kind, opts


@_SETTINGS
@given(
    case=_vlen_case(),
    lo=st.integers(0, 10),
    m=st.integers(0, 10),
    libver=st.sampled_from(["earliest", "latest"]),
)
def test_vlen_roundtrip_fuzz(tmp_path_factory, case, lo, m, libver):
    """vlen strings AND vlen numeric sequences round-trip across
    layouts, filters, and both encoding families — including slab
    reads, multi-byte UTF-8 (astral plane), empties, and the 4 KiB
    multi-collection heap split."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    cells, kind, opts = case
    path = os.path.join(str(tmp_path_factory.mktemp("vlfuzz")), "f.h5")
    write_hdf5(path, {"v": cells}, {"v": opts} if opts else None,
               libver=libver)
    h = HDF5File(path)
    got = h.read("v")
    slab = h.read_slab0("v", lo, lo + m)
    n = len(cells)
    for i in range(n):
        if kind == "str":
            assert got[i] == cells[i]
        else:
            np.testing.assert_array_equal(got[i], cells[i])
            assert got[i].dtype == np.dtype(kind)
    for j, i in enumerate(range(lo, min(lo + m, n))):
        if kind == "str":
            assert slab[j] == cells[i]
        else:
            np.testing.assert_array_equal(slab[j], cells[i])


@_SETTINGS
@given(
    t=st.integers(1, 24),
    y=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
    cut=st.integers(0, 24),
    libver=st.sampled_from(["earliest", "latest"]),
)
def test_two_phase_compressed_write_fuzz(
    tmp_path_factory, t, y, seed, cut, libver
):
    """The two-phase compressed write round-trips for arbitrary record
    counts, per-record shapes, split points (phase 1 and phase 2b may
    split differently), and both chunk-index families."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        NetCDF4View,
        compressed_chunk_sizes_nc4,
        create_netcdf4_compressed,
        pwrite_compressed_records_nc4,
    )

    rng = np.random.RandomState(seed)
    v = rng.randn(t, y).astype(np.float32)
    k = min(cut, t)
    sizes = (
        compressed_chunk_sizes_nc4(v[:k])
        + compressed_chunk_sizes_nc4(v[k:])
    )
    p = os.path.join(
        str(tmp_path_factory.mktemp("tpz")), "z.nc4"
    )
    create_netcdf4_compressed(
        p,
        dims={"t": None, "y": y},
        variables={"v": ("float32", ("t", "y"))},
        chunk_sizes={"v": sizes},
        libver=libver,
    )
    m = (t * 2) // 3
    pwrite_compressed_records_nc4(p, {"v": v[:m]}, 0)
    if m < t:
        pwrite_compressed_records_nc4(p, {"v": v[m:]}, m)
    view = NetCDF4View(p)
    np.testing.assert_array_equal(view.read_records("v"), v)


# ---------------------------------------------------------------------------
# Round-9 reader-breadth cases (VERDICT r8 #8): heap layouts OUR writer
# never emits but libhdf5 legitimately does — the mitigation path for
# "no external interop validation possible in this container".
# ---------------------------------------------------------------------------


def _foreign_gcol_file(tmp_path, name, payloads_with_idx, build_gcol):
    """Write a real vlen-string file, append a FOREIGN-layout "GCOL"
    collection built by ``build_gcol``, and patch the dataset's
    contiguous descriptor stream to point into it. Returns the path.
    ``payloads_with_idx`` is [(object_index, payload_bytes)] in
    DESCRIPTOR order (cell i -> i-th entry)."""
    import struct as _s

    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    p = os.path.join(tmp_path, f"{name}.h5")
    vals = np.array(
        [f"v{i}" for i in range(len(payloads_with_idx))], dtype=object
    )
    write_hdf5(p, {"s": vals})
    h = HDF5File(p)
    daddr = h.datasets["s"].data_addr
    raw = bytearray(open(p, "rb").read())
    gaddr = len(raw)
    raw += build_gcol(payloads_with_idx)
    for i, (gidx, payload) in enumerate(payloads_with_idx):
        raw[daddr + 16 * i : daddr + 16 * (i + 1)] = _s.pack(
            "<IQI", len(payload), gaddr, gidx
        )
    open(p, "wb").write(bytes(raw))
    return p


def test_gcol_foreign_layouts(tmp_path):
    """The heap reader accepts layouts the writer never emits:
    (a) collections smaller than 4096 bytes (pre-round-9 files, other
    writers' heaps), (b) objects stored out of index order,
    (c) INTERIOR index-0 free-space objects between live objects (what
    libhdf5 leaves behind after heap deletions — the walk must skip
    the span and continue, not stop)."""
    import struct as _s

    from netcdf4_variable_streamer_spark.sources.hdf5lite import HDF5File

    def obj(idx, payload):
        pad = -len(payload) % 8
        return (
            _s.pack("<HH4xQ", idx, 1, len(payload))
            + payload + b"\x00" * pad
        )

    def free(span):  # size includes the 16-byte header
        return _s.pack("<HH4xQ", 0, 0, span) + b"\x00" * (span - 16)

    cells = [(1, b"alpha"), (2, b"beta"), (3, b"gamma-long-payload")]

    # (a) tiny (non-4096) collection, in-order
    def tiny(pw):
        body = b"".join(obj(i, p) for i, p in pw)
        body += _s.pack("<HH4xQ", 0, 0, 16)
        return b"GCOL" + _s.pack("<B3xQ", 1, 16 + len(body)) + body

    p = _foreign_gcol_file(tmp_path, "tiny", cells, tiny)
    assert HDF5File(p).read("s").tolist() == [
        "alpha", "beta", "gamma-long-payload"
    ]

    # (b) objects stored OUT of index order on disk
    def shuffled(pw):
        body = b"".join(obj(i, p) for i, p in [pw[2], pw[0], pw[1]])
        body += _s.pack("<HH4xQ", 0, 0, 16)
        return b"GCOL" + _s.pack("<B3xQ", 1, 16 + len(body)) + body

    p = _foreign_gcol_file(tmp_path, "shuffled", cells, shuffled)
    assert HDF5File(p).read("s").tolist() == [
        "alpha", "beta", "gamma-long-payload"
    ]

    # (c) interior free-space spans BETWEEN live objects (deleted heap
    # objects) — and index numbering with gaps
    gap_cells = [(2, b"left"), (7, b"right"), (9, b"tail")]

    def holey(pw):
        body = obj(*pw[0]) + free(48) + obj(*pw[1]) + free(32) + obj(
            *pw[2]
        )
        body += _s.pack("<HH4xQ", 0, 0, 16)
        return b"GCOL" + _s.pack("<B3xQ", 1, 16 + len(body)) + body

    p = _foreign_gcol_file(tmp_path, "holey", gap_cells, holey)
    assert HDF5File(p).read("s").tolist() == ["left", "right", "tail"]


@_SETTINGS
@given(
    n=st.integers(1, 70),
    cap=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_ea_chunk_count_boundaries_fuzz(tmp_path_factory, n, cap, seed):
    """Extensible-Array chunk-index boundary sweep (libver-latest
    unlimited dims): record counts crossing index-block/data-block
    boundaries at many chunk sizes round-trip exactly, including slab
    reads that prune to a single chunk."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    tmp = tmp_path_factory.mktemp("ea")
    rng = np.random.RandomState(seed)
    v = rng.randint(-999, 999, size=(n, 3)).astype(np.int32)
    p = os.path.join(tmp, f"ea_{n}_{cap}.h5")
    write_hdf5(
        p,
        {"v": v},
        {"v": {"chunk": (cap, 3), "maxshape": (None, 3)}},
        libver="latest",
    )
    h = HDF5File(p)
    assert h.datasets["v"].chunk_index == "ea"  # really the EA path
    np.testing.assert_array_equal(h.read("v"), v)
    lo = min(n - 1, cap)
    hi = min(n, lo + cap)
    np.testing.assert_array_equal(h.read_slab0("v", lo, hi), v[lo:hi])


def test_ea_writer_secondary_blocks(tmp_path):
    """The EA writer emits unpaged "EASB" secondary blocks past the
    244-chunk direct range (round 9): chunk counts crossing the direct
    boundary and several superblock boundaries round-trip (including
    filtered chunks, whose sizes ride the 20-byte client-1 elements),
    and slab reads across the boundary prune correctly. The former
    131,060-chunk paged-data-block ceiling is covered by
    test_ea_writer_paged_data_blocks."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    for n in (244, 245, 500, 2500):
        v = (np.arange(n * 2, dtype=np.int32) % 10007).reshape(n, 2)
        p = os.path.join(tmp_path, f"ea{n}.h5")
        write_hdf5(
            p, {"v": v}, {"v": {"chunk": (1, 2), "maxshape": (None, 2)}},
            libver="latest",
        )
        h = HDF5File(p)
        assert h.datasets["v"].chunk_index == "ea"
        np.testing.assert_array_equal(h.read("v"), v)
        np.testing.assert_array_equal(h.read_slab0("v", n - 3, n), v[n - 3:])
        np.testing.assert_array_equal(
            h.read_slab0("v", 240, 250), v[240:250]
        )
    # filtered chunks across the direct boundary
    v = (np.arange(600 * 3, dtype=np.float32) * 0.25).reshape(600, 3)
    p = os.path.join(tmp_path, "ea_filt.h5")
    write_hdf5(
        p, {"v": v},
        {"v": {"chunk": (1, 3), "maxshape": (None, 3), "compress": 5,
               "shuffle": True}},
        libver="latest",
    )
    np.testing.assert_array_equal(HDF5File(p).read("v"), v)


def test_ea_writer_paged_data_blocks(tmp_path):
    """Round 10 (VERDICT r9 #5): the EA writer emits PAGED data blocks
    under secondary blocks — prefix-checksummed EADB header, 1024-
    element pages each with its own checksum, page-init bitmap in the
    EASB — removing the round-9 131,060-chunk ceiling. A dataset past
    the old ceiling round-trips, slab reads prune into the paged
    range, trailing never-written pages are honestly uninitialized
    (bitmap 0), and a flipped byte inside one PAGE fails that page's
    checksum loudly while the block prefix still parses."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    n = 131_100  # 40 chunks past the old unpaged ceiling
    v = (np.arange(n, dtype=np.int32) % 9973).reshape(n, 1)
    p = os.path.join(tmp_path, "ea_paged.h5")
    write_hdf5(
        p, {"v": v}, {"v": {"chunk": (1, 1), "maxshape": (None, 1)}},
        libver="latest",
    )
    h = HDF5File(p)
    assert h.datasets["v"].chunk_index == "ea"
    np.testing.assert_array_equal(h.read("v"), v)
    # slab read that prunes to chunks inside the paged superblock
    np.testing.assert_array_equal(
        h.read_slab0("v", 131_050, 131_090), v[131_050:131_090]
    )
    # corrupt one byte of an element PAGE (not the block prefix): find
    # the EASB whose bitmap has initialized pages, then flip inside
    # the first initialized page of its first data block
    buf = bytearray(open(p, "rb").read())
    info = h.datasets["v"]
    # last allocated chunk's index entry points into the paged range;
    # locate its EADB by scanning for the signature after the EA header
    chunks = list(h._iter_chunks(info))
    assert len(chunks) == n
    last_addr = chunks[-1][2]
    del h
    # the chunk data itself is NOT checksummed; flip a byte in the
    # page that STORES the final chunk addresses instead. Find the
    # EADB containing the encoding of last_addr (8-byte LE) after the
    # EA header.
    needle = struct.pack("<Q", last_addr)
    hit = buf.rfind(needle)
    assert hit > 0
    buf[hit + 2] ^= 0x40
    p2 = os.path.join(tmp_path, "ea_paged_corrupt.h5")
    open(p2, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="page checksum mismatch"):
        HDF5File(p2).read("v")


@st.composite
def _compound_case(draw):
    n_members = draw(st.integers(1, 6))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    fields = []
    for i in range(n_members):
        kind = draw(st.sampled_from(["num", "str", "sub"]))
        if kind == "num":
            fields.append((f"m{i}", draw(st.sampled_from(
                ["<i1", "<i2", "<i4", "<i8", "<u1", "<u2", "<f4", "<f8"]
            ))))
        elif kind == "str":
            fields.append((f"m{i}", f"S{draw(st.integers(1, 9))}"))
        else:
            fields.append((
                f"m{i}",
                draw(st.sampled_from(["<i4", "<f4"])),
                (draw(st.integers(1, 4)),),
            ))
    dt = np.dtype(fields)
    n = draw(st.integers(1, 40))
    arr = np.zeros(n, dtype=dt)
    for name in dt.names:
        fdt = dt.fields[name][0]
        base = fdt.subdtype[0] if fdt.subdtype else fdt
        shape = (n, *fdt.subdtype[1]) if fdt.subdtype else (n,)
        if base.kind == "S":
            arr[name] = rng.randint(0, 1 << 30, size=shape).astype(
                f"S{base.itemsize}"
            )
        else:
            arr[name] = rng.randint(-100, 100, size=shape).astype(base)
    return arr


@_SETTINGS
@given(
    case=_compound_case(),
    lo=st.integers(0, 12),
    m=st.integers(0, 12),
    layout=st.sampled_from(["contig", "chunked", "filtered"]),
    libver=st.sampled_from(["earliest", "latest"]),
)
def test_compound_roundtrip_fuzz(
    tmp_path_factory, case, lo, m, layout, libver
):
    """Compound datasets with random member sets (numerics, fixed
    strings, subarray members), record counts, layouts, and libvers
    round-trip exactly, including slab reads — the class-6 grammar is
    exercised far beyond the hand-picked tests."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    arr = case
    opts = {}
    if layout != "contig":
        opts["chunk"] = (min(7, arr.shape[0]),)
    if layout == "filtered":
        opts["compress"] = 5
        opts["shuffle"] = True
    path = os.path.join(
        str(tmp_path_factory.mktemp("compfuzz")), "f.h5"
    )
    write_hdf5(path, {"v": arr}, {"v": opts} if opts else None,
               libver=libver)
    h = HDF5File(path)
    got = h.read("v")
    assert got.dtype.names == arr.dtype.names
    np.testing.assert_array_equal(got, arr.astype(got.dtype))
    np.testing.assert_array_equal(
        h.read_slab0("v", lo, lo + m), arr[lo : lo + m]
    )


@_SETTINGS
@given(
    n=st.integers(1, 4000),
    node_size=st.sampled_from([128, 256, 512]),
    seed=st.integers(0, 2**31 - 1),
)
def test_bt2_bulk_load_depth_fuzz(tmp_path_factory, n, node_size, seed):
    """The v2 B-tree bulk loader and the any-depth walker agree for
    every depth these record counts force (0 through 4 at a 128-byte
    node): records come back exactly and in key order through
    spec-layout nodes (records block then child-pointer block,
    per-depth pointer field widths from the shared capacity table),
    and the header's depth field is the minimal depth that fits."""
    import mmap as _mmap
    import struct

    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        _bt2_node_info,
        _write_bt2,
    )

    rng = np.random.RandomState(seed)
    rec_size = 12
    recs = [
        struct.pack("<I", i) + rng.bytes(rec_size - 4) for i in range(n)
    ]
    out = bytearray(b"\x00" * 48)  # B-tree need not start at offset 0
    bt2_addr = _write_bt2(out, recs, 5, node_size=node_size)
    depth = struct.unpack_from("<H", out, bt2_addr + 12)[0]
    want_depth = 0
    while _bt2_node_info(node_size, rec_size, want_depth)[3][
        want_depth
    ] < n:
        want_depth += 1
    assert depth == want_depth
    path = os.path.join(str(tmp_path_factory.mktemp("bt2")), "t.bin")
    with open(path, "wb") as f:
        f.write(bytes(out))
    h = HDF5File.__new__(HDF5File)
    h.path = path
    with open(path, "rb") as f:
        h._buf = _mmap.mmap(f.fileno(), 0, access=_mmap.ACCESS_READ)
    assert h._bt2_records(bt2_addr, 5) == recs


@_SETTINGS
@given(seed=st.integers(0, 2**31 - 1), nflips=st.integers(1, 8))
def test_deep_btree_corruption_fails_controlled(
    tmp_path_factory, seed, nflips
):
    """Byte flips in a file whose metadata includes a MULTI-NODE v2
    B-tree (dense 220-link group, depth-1 name index) and a
    multi-block fractal heap must fail as ValueError or parse clean —
    the new deep walks must not leak struct errors, infinite
    recursions, or huge allocations."""
    import random

    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    root = str(tmp_path_factory.mktemp("deepcorrupt"))
    base_path = os.path.join(root, "base.h5")
    data = {
        f"v{i:03d}": np.arange(3, dtype=np.int32) + i
        for i in range(220)
    }
    write_hdf5(base_path, data, libver="latest")
    buf = bytearray(open(base_path, "rb").read())
    rng = random.Random(seed)
    # bias half the flips into the first 64 KiB, where the group
    # metadata (heap blocks + B-tree nodes) lives
    for i in range(nflips):
        hi = min(len(buf), 65536) if i % 2 == 0 else len(buf)
        buf[rng.randrange(hi)] = rng.randrange(256)
    path = os.path.join(root, "t.h5")
    with open(path, "wb") as f:
        f.write(bytes(buf))
    try:
        h = HDF5File(path)
        for n in list(h.datasets)[:8]:
            h.read(n)
    except ValueError:
        pass  # loud, contextual refusal — the contract


@_SETTINGS
@given(
    n_objs=st.integers(1, 160),
    size_hi=st.integers(1, 6000),
    level=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
)
def test_filtered_fractal_heap_fuzz(n_objs, size_hi, level, seed):
    """FILTERED fractal heaps round-trip for arbitrary object sets and
    deflate levels across both layouts (root-direct when the bodies
    fit one doubled block, multi-block root-indirect past it);
    incompressible payloads (random bytes) and highly-compressible
    ones both honor the stored-size/mask entries."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        _write_fractal_heap,
    )

    rng = np.random.RandomState(seed)
    objs, total = {}, 0
    for i in range(n_objs):
        sz = int(rng.randint(1, size_hi + 1))
        total += sz
        if total > 200_000:  # stay inside the writer's managed span
            break
        body = (
            rng.bytes(sz)
            if rng.rand() < 0.5
            else bytes([i % 251 or 1]) * sz
        )
        objs[f"o{i:03d}"] = body
    if not objs:
        objs["o000"] = b"x"
    out = bytearray(b"\x00" * 40)
    addr, ids = _write_fractal_heap(out, objs, 8, deflate=level)
    h = HDF5File.__new__(HDF5File)
    h.path = "<mem>"
    h._buf = bytes(out)
    heap = h._fractal_heap(addr)
    assert heap["filters"] == [(1, [level])]
    for nm, body in objs.items():
        assert h._fheap_object(heap, ids[nm]) == body


# ---------------------------------------------------------------------------
# Interop fuzz round 3 (VERDICT r9 "Next round" #6): reader-side layouts
# libhdf5 emits that our writer never does.
# ---------------------------------------------------------------------------


def test_userblock_offset_files(tmp_path):
    """libhdf5 places the signature at 512 << n when the file carries a
    userblock, with every stored address relative to that base. The
    reader must find the shifted superblock and read identically for
    several userblock sizes — including a userblock whose bytes are
    arbitrary (only the signature scan positions matter)."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    v = (np.arange(60, dtype=np.int32) * 3).reshape(20, 3)
    base = os.path.join(tmp_path, "plain.h5")
    write_hdf5(
        base, {"v": v},
        {"v": {"chunk": (4, 3), "compress": 3, "shuffle": True}},
        attrs={"k": 7},
    )
    orig = open(base, "rb").read()
    rng = np.random.RandomState(7)
    for ub in (512, 1024, 4096):
        blob = rng.bytes(ub)
        # a userblock must not itself start with the signature
        assert blob[:8] != b"\x89HDF\r\n\x1a\n"
        p = os.path.join(tmp_path, f"ub{ub}.h5")
        with open(p, "wb") as f:
            f.write(blob + orig)
        h = HDF5File(p)
        assert int(h.attrs["k"]) == 7
        np.testing.assert_array_equal(h.read("v"), v)
        np.testing.assert_array_equal(h.read_slab0("v", 5, 13), v[5:13])
    # the latest-encoding family through the shifted view too: v2
    # superblock, OHDR headers, dense attributes (fractal heap + v2
    # B-tree), vlen strings via the global heap, EA chunk index
    vs = np.array(["alpha", "", "useriblock", None, "z"], dtype=object)
    base2 = os.path.join(tmp_path, "latest.h5")
    write_hdf5(
        base2,
        {"v": v, "s": vs},
        {
            "v": {
                "chunk": (4, 3),
                "maxshape": (None, 3),
                "attrs": {f"a{i}": i for i in range(10)},
            }
        },
        libver="latest",
    )
    orig2 = open(base2, "rb").read()
    p = os.path.join(tmp_path, "ub_latest.h5")
    with open(p, "wb") as f:
        f.write(rng.bytes(1024) + orig2)
    h = HDF5File(p)
    np.testing.assert_array_equal(h.read("v"), v)
    assert list(h.read("s")) == ["alpha", "", "useriblock", "", "z"]
    assert int(h.datasets["v"].attrs["a9"]) == 9

    # garbage of userblock-looking length with no signature anywhere
    p = os.path.join(tmp_path, "junk.h5")
    with open(p, "wb") as f:
        f.write(rng.bytes(2048))
    with pytest.raises(ValueError, match="not an HDF5 file"):
        HDF5File(p)


def test_superblock_v1_nondefault_btree_k(tmp_path):
    """Superblock VERSION 1 — what libhdf5 emits when the chunk
    B-tree's internal-node K is non-default (H5Pset_istore_k): the 4
    extra bytes (indexed-storage K + reserved) shift the root symbol
    entry from 56 to 60. Crafted by rewriting a v0 file's superblock
    in place — the v1 superblock's trailing scratch bytes overlap the
    first object header's first 4 bytes, which is legal because
    cache-type-0 scratch is ignored. The K values themselves (leaf 3,
    internal 11, istore 17 — all non-default) must not perturb the
    walk: every v1 B-tree node self-describes its entry count."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    v = (np.arange(210, dtype=np.int16) % 101).reshape(70, 3)
    p0 = os.path.join(tmp_path, "v0.h5")
    # chunk (4, 3) -> 18 chunks: the v1 B-tree chunk index is exercised
    write_hdf5(p0, {"v": v}, {"v": {"chunk": (4, 3)}}, attrs={"q": 2.5})
    orig = bytearray(open(p0, "rb").read())
    root_header = struct.unpack_from("<Q", orig, 56 + 8)[0]
    sb = bytearray(100)
    sb[0:8] = b"\x89HDF\r\n\x1a\n"
    sb[8] = 1  # superblock version 1
    sb[13] = 8  # sizeof offsets
    sb[14] = 8  # sizeof lengths
    struct.pack_into("<HH", sb, 16, 3, 11)  # non-default group K's
    struct.pack_into("<HH", sb, 24, 17, 0)  # non-default istore K
    struct.pack_into("<QQQQ", sb, 28, 0, 0xFFFFFFFFFFFFFFFF,
                     len(orig), 0xFFFFFFFFFFFFFFFF)
    # root symbol table entry at 60: name offset 0, header address,
    # cache type 0 (scratch ignored -> may overlap orig[96:100])
    struct.pack_into("<QQII", sb, 60, 0, root_header, 0, 0)
    sb[96:100] = orig[96:100]
    p1 = os.path.join(tmp_path, "v1.h5")
    with open(p1, "wb") as f:
        f.write(bytes(sb) + bytes(orig[100:]))
    h = HDF5File(p1)
    assert float(h.attrs["q"]) == 2.5
    np.testing.assert_array_equal(h.read("v"), v)
    np.testing.assert_array_equal(h.read_slab0("v", 60, 70), v[60:70])


def test_fill_value_messages_all_versions(tmp_path):
    """Fill-value messages (libhdf5 writes one per dataset; our writer
    only under the explicit fillvalue opt): a defined fill must
    surface from UNALLOCATED storage instead of zeros, across message
    versions 3 (as written), 1, and 2 (patched over the v3 body in
    place — v1 headers carry no checksums)."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    v = np.full((6, 2), 4.0, dtype=np.float32)
    p = os.path.join(tmp_path, "fill.h5")
    write_hdf5(p, {"v": v}, {"v": {"fillvalue": np.float32(-9.5)}})
    # allocated storage: fill value irrelevant
    np.testing.assert_array_equal(HDF5File(p).read("v"), v)

    # patch the contiguous layout's data address to UNDEF -> the
    # dataset reads as pure fill
    h = HDF5File(p)
    buf = bytearray(open(p, "rb").read())
    msgs = h._messages_at(h._header_addr["v"])
    layout_off = next(off for t, b, off in msgs if t == 0x0008)
    fill_off = next(off for t, b, off in msgs if t == 0x0005)
    struct.pack_into("<Q", buf, layout_off + 2, 0xFFFFFFFFFFFFFFFF)
    with open(p, "wb") as f:
        f.write(bytes(buf))
    got = HDF5File(p).read("v")
    np.testing.assert_array_equal(
        got, np.full((6, 2), -9.5, dtype=np.float32)
    )
    np.testing.assert_array_equal(
        HDF5File(p).read_slab0("v", 2, 5),
        np.full((3, 2), -9.5, dtype=np.float32),
    )

    # v1 body over the same bytes: ver, alloc, write time, defined,
    # size, data (v1 always carries size+data)
    fb = np.float32(2.25).tobytes()
    buf[fill_off : fill_off + 8 + 4] = (
        struct.pack("<BBBBI", 1, 2, 0, 1, 4) + fb
    )
    with open(p, "wb") as f:
        f.write(bytes(buf))
    np.testing.assert_array_equal(
        HDF5File(p).read("v"), np.full((6, 2), 2.25, dtype=np.float32)
    )

    # v2 body, defined=1: same layout as v1
    buf[fill_off] = 2
    with open(p, "wb") as f:
        f.write(bytes(buf))
    np.testing.assert_array_equal(
        HDF5File(p).read("v"), np.full((6, 2), 2.25, dtype=np.float32)
    )

    # v2 with defined=0: no fill -> zeros
    buf[fill_off + 3] = 0
    with open(p, "wb") as f:
        f.write(bytes(buf))
    np.testing.assert_array_equal(
        HDF5File(p).read("v"), np.zeros((6, 2), dtype=np.float32)
    )

    # corrupt size: loud, names the defect
    buf[fill_off : fill_off + 8 + 4] = (
        struct.pack("<BBBBI", 1, 2, 0, 1, 3) + fb[:3] + b"\0"
    )
    with open(p, "wb") as f:
        f.write(bytes(buf))
    with pytest.raises(ValueError, match="fill value is 3 bytes"):
        HDF5File(p).read("v")


def test_fill_value_chunked_unallocated(tmp_path):
    """Chunked dataset with a defined fill: chunks the index never
    allocated read as the FILL value, allocated chunks as data — the
    the netcdf-c _FillValue-at-HDF5-level posture (libhdf5's v1-B-tree
    chunk index simply carries NO entry for an unallocated chunk).
    Crafted by deleting the middle leaf entry in place — decrement
    "entries used", shift the rest left; v1 B-trees carry no
    checksums."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    v = (np.arange(24, dtype=np.int32) + 1).reshape(12, 2)
    p = os.path.join(tmp_path, "cfill.h5")
    write_hdf5(
        p, {"v": v},
        {"v": {"chunk": (4, 2), "fillvalue": np.int32(-7)}},
    )
    h = HDF5File(p)
    info = h.datasets["v"]
    assert info.fill is not None
    chunks = list(h._iter_chunks(info))
    assert len(chunks) == 3
    bt = info.btree_addr
    buf = bytearray(open(p, "rb").read())
    used = struct.unpack_from("<H", buf, bt + 6)[0]
    assert used == 3
    keysize = 8 + 8 * (2 + 1)  # ndims=2 (+1 element-size key slot)
    entry = keysize + 8
    e1 = bt + 24 + entry  # middle entry start
    # delete entry 1: shift entry 2 over it, decrement "entries used"
    buf[e1 : e1 + entry] = buf[e1 + entry : e1 + 2 * entry]
    struct.pack_into("<H", buf, bt + 6, used - 1)
    with open(p, "wb") as f:
        f.write(bytes(buf))
    got = HDF5File(p).read("v")
    exp = v.copy()
    exp[4:8] = -7
    np.testing.assert_array_equal(got, exp)


def test_creation_order_tracked_dense_storage(tmp_path):
    """Attribute-info and link-info messages with creation-order
    TRACKING (flags bit 0: +max-creation-index field) and INDEXING
    (flags bit 1: +creation-order B-tree address after the name
    B-tree) — libhdf5 emits these under H5Pset_attr/link_creation_
    order; our writer never tracks. The parsers must step over both
    optional fields and land on the same heap/B-tree addresses."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    # dense attributes (>8) force the fractal-heap + v2-B-tree path
    attrs = {f"a{i}": np.float64(i) / 4 for i in range(12)}
    p = os.path.join(tmp_path, "dense.h5")
    write_hdf5(
        p,
        {"v": np.arange(4, dtype=np.int32)},
        {"v": {"attrs": attrs}},
        libver="latest",
    )
    h = HDF5File(p)
    ai = next(
        b
        for t, b in h._messages(h._header_addr["v"])
        if t == 0x0015
    )
    assert ai[1] == 0  # writer emits untracked
    fheap, bt2 = struct.unpack_from("<QQ", ai, 2)
    base = dict(h._attr_info(ai))
    assert {k: float(v) for k, v in base.items()} == {
        k: float(v) for k, v in attrs.items()
    }
    # tracked: version, flags=1, max creation index (2), addrs
    tracked = bytes([ai[0], 1]) + struct.pack("<H", 12) + ai[2:]
    assert dict(h._attr_info(tracked)) == base
    # tracked + indexed: creation-order B-tree address appended AFTER
    # the name B-tree address (the parser must not read past it)
    both = (
        bytes([ai[0], 3])
        + struct.pack("<H", 12)
        + struct.pack("<QQ", fheap, bt2)
        + struct.pack("<Q", 0xFFFFFFFFFFFFFFFF)
    )
    assert dict(h._attr_info(both)) == base

    # link info: same flag grammar on the group side — dense links
    # (>8 children) force the fractal-heap group storage
    data = {
        f"g/ds{i:02d}": np.arange(3, dtype=np.int32) + i
        for i in range(10)
    }
    p2 = os.path.join(tmp_path, "dlinks.h5")
    write_hdf5(p2, data, libver="latest")
    h2 = HDF5File(p2)
    gaddr = next(
        a for n, a in h2._header_addr.items() if n.startswith("g/")
    )
    # rebuild the group's own header address via the root walk: craft
    # link-info bodies directly instead (the group header is not kept)
    root_msgs = None
    # find the subgroup header by scanning any dataset's parent: use
    # the root group object header from the superblock
    import netcdf4_variable_streamer_spark.sources.hdf5lite as hl

    b = h2._buf
    root_header = struct.unpack_from("<Q", b, 36)[0]
    sub = dict(h2._group_children(h2._messages(root_header)))["g"]
    li = next(
        bb for t, bb in h2._messages(sub) if t == 0x0002
    )
    assert li[1] == 0
    fheap2, bt22 = struct.unpack_from("<QQ", li, 2)
    expect = sorted(data)
    got_base = sorted(
        "g/" + n for n, _ in h2._dense_links(fheap2, bt22)
    )
    assert got_base == expect
    tracked_li = bytes([li[0], 1]) + struct.pack("<Q", 10) + li[2:]
    both_li = (
        bytes([li[0], 3])
        + struct.pack("<Q", 10)
        + struct.pack("<QQ", fheap2, bt22)
        + struct.pack("<Q", 0xFFFFFFFFFFFFFFFF)
    )
    for crafted in (tracked_li, both_li):
        msgs = [(0x0002, crafted)]
        links = h2._group_children(msgs)
        assert sorted(n for n, _ in links) == [
            f"ds{i:02d}" for i in range(10)
        ]


@_SETTINGS
@given(
    size=st.integers(600, 40_000),
    level=st.integers(1, 9),
    compressible=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_filtered_huge_objects_crafted(size, level, compressible, seed):
    """FILTERED huge fractal-heap objects (VERDICT r9 #8, reader side;
    the writer keeps its loud refusal): hand-crafted type-2 v2-B-tree
    records (address, stored length, filter mask, memory size, id)
    behind a patched FRHP, plus the directly-accessed variant where a
    wide id carries the same four fields. Deflate applies per the
    mask; a memory-size mismatch and an id too narrow for the fields
    both fail loudly."""
    import zlib

    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        _write_bt2,
        _write_fractal_heap,
        lookup3,
    )

    rng = np.random.RandomState(seed)
    payload = (
        bytes([seed % 251 or 1]) * size
        if compressible
        else rng.bytes(size)
    )
    out = bytearray(b"\x00" * 40)
    heap_addr, _ids = _write_fractal_heap(
        out, {"m0": b"managed"}, 8, deflate=level
    )

    def patch_header(field_off, value_bytes):
        out[heap_addr + field_off : heap_addr + field_off
            + len(value_bytes)] = value_bytes
        filter_len = struct.unpack_from("<H", out, heap_addr + 7)[0]
        cur_rows = struct.unpack_from("<H", out, heap_addr + 140)[0]
        pos = heap_addr + 142
        if filter_len and cur_rows == 0:
            pos += 12
        pos += filter_len
        struct.pack_into(
            "<I", out, pos, lookup3(bytes(out[heap_addr:pos]))
        )

    stored = zlib.compress(payload, level)
    paddr = len(out)
    out += stored
    # also a mask-skipped object: stored raw, deflate bit masked off
    raw_addr = len(out)
    out += payload
    recs = [
        struct.pack("<QQIQQ", paddr, len(stored), 0, len(payload), 0),
        struct.pack(
            "<QQIQQ", raw_addr, len(payload), 1, len(payload), 1
        ),
        # memory-size lie for the loud-mismatch case
        struct.pack(
            "<QQIQQ", paddr, len(stored), 0, len(payload) + 1, 2
        ),
    ]
    bt2_addr = _write_bt2(out, recs, 2)
    patch_header(22, struct.pack("<Q", bt2_addr))

    h = HDF5File.__new__(HDF5File)
    h.path = "<mem>"
    h._buf = bytes(out)
    heap = h._fractal_heap(heap_addr)
    assert heap["filters"] == [(1, [level])]

    def hid(huge_id):
        return bytes([0x10]) + huge_id.to_bytes(7, "little")

    assert h._fheap_object(heap, hid(0)) == payload
    assert h._fheap_object(heap, hid(1)) == payload  # deflate masked
    with pytest.raises(ValueError, match="decoded to"):
        h._fheap_object(heap, hid(2))
    with pytest.raises(ValueError, match="missing from the huge"):
        h._fheap_object(heap, hid(9))

    # directly-accessed filtered variant: widen id_len to 29 so the id
    # itself carries (address, stored length, mask, memory size)
    patch_header(5, struct.pack("<H", 29))
    h._buf = bytes(out)
    heap29 = h._fractal_heap(heap_addr)
    did = bytes([0x10]) + struct.pack(
        "<QQIQ", paddr, len(stored), 0, len(payload)
    )
    assert h._fheap_object(heap29, did) == payload
    did_raw = bytes([0x10]) + struct.pack(
        "<QQIQ", raw_addr, len(payload), 1, len(payload)
    )
    assert h._fheap_object(heap29, did_raw) == payload

    # filtered id in the 17-28 band: too narrow for the four inline
    # fields, so per H5HFhuge.c it stays INDIRECT — the zero-padded
    # counter resolves through the type-2 B-tree (round 11, closing
    # the old loud refusal here)
    patch_header(5, struct.pack("<H", 20))
    h._buf = bytes(out)
    heap20 = h._fractal_heap(heap_addr)
    wide_hid = bytes([0x10]) + (0).to_bytes(19, "little")
    assert h._fheap_object(heap20, wide_hid) == payload


def _fletcher32_reference(data: bytes) -> int:
    """Literal transcription of HDF5's H5_checksum_fletcher32 C loop
    (public algorithm) — the differential oracle for the vectorized
    implementation."""
    n = len(data) // 2
    sum1 = sum2 = 0
    pos = 0
    left = n
    while left:
        tlen = min(left, 360)
        left -= tlen
        for _ in range(tlen):
            sum1 += (data[pos] << 8) | data[pos + 1]
            pos += 2
            sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    if len(data) % 2:
        sum1 += data[-1] << 8
        sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    return (sum2 << 16) | sum1


@_SETTINGS
@given(data=st.binary(min_size=0, max_size=4096))
def test_fletcher32_matches_c_reference(data):
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        hdf5_fletcher32,
    )

    assert hdf5_fletcher32(data) == _fletcher32_reference(data)


def test_fletcher32_zero_and_fold_edges():
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        hdf5_fletcher32,
    )

    assert hdf5_fletcher32(b"") == 0
    assert hdf5_fletcher32(b"\x00" * 64) == 0
    # a word sum congruent to 0 mod 65535 but nonzero must fold to
    # 65535, not 0 (the C reduction never zeroes a nonzero sum)
    data = b"\xff\xff"  # one word 0xFFFF == 65535
    assert hdf5_fletcher32(data) == _fletcher32_reference(data)
    assert hdf5_fletcher32(data) & 0xFFFF == 65535


@_SETTINGS
@given(
    shape0=st.integers(1, 40),
    shuffle=st.booleans(),
    level=st.sampled_from([None, 1, 6]),
    dt=st.sampled_from(["int16", "int32", "float64"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_fletcher32_roundtrip_fuzz(
    tmp_path_factory, shape0, shuffle, level, dt, seed
):
    """Fletcher-32 filter (netcdf-c nc_def_var_fletcher32) round-trips
    alone and composed with shuffle/deflate — the composed case
    exercises the H5Zshuffle leftover rule (the 4 checksum bytes do
    not fill an element and stay unshuffled in place)."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    rng = np.random.RandomState(seed)
    v = rng.randint(-1000, 1000, size=(shape0, 3)).astype(dt)
    p = os.path.join(str(tmp_path_factory.mktemp("f32")), "f.h5")
    write_hdf5(
        p,
        {"v": v},
        {
            "v": {
                "chunk": (4, 3),
                "fletcher": True,
                "shuffle": shuffle,
                "compress": level,
            }
        },
    )
    h = HDF5File(p)
    assert any(fid == 3 for fid, _ in h.datasets["v"].filters)
    np.testing.assert_array_equal(h.read("v"), v)
    np.testing.assert_array_equal(
        h.read_slab0("v", 1, shape0), v[1:shape0]
    )


def test_fletcher32_detects_corruption(tmp_path):
    """A flipped chunk byte fails the checksum loudly — the exact
    failure mode the filter exists for (deflate would also notice
    most flips, so the fletcher-only layout is the probe)."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    v = (np.arange(36, dtype=np.int32) + 1).reshape(12, 3)
    p = os.path.join(tmp_path, "f.h5")
    write_hdf5(p, {"v": v}, {"v": {"chunk": (4, 3), "fletcher": True}})
    h = HDF5File(p)
    chunks = list(h._iter_chunks(h.datasets["v"]))
    buf = bytearray(open(p, "rb").read())
    buf[chunks[1][2] + 5] ^= 0x04  # flip a data byte of chunk 1
    with open(p, "wb") as f:
        f.write(bytes(buf))
    with pytest.raises(ValueError, match="fletcher32 checksum mismatch"):
        HDF5File(p).read("v")


@_SETTINGS
@given(
    seed=st.integers(0, 2**31 - 1),
    n_members=st.integers(2, 5),
    n_vars=st.integers(1, 4),
)
def test_union_schema_fuzz(tmp_path_factory, seed, n_members, n_vars):
    """Union-schema directory datasets over RANDOM member variable
    subsets: the NetCDF3Reader's union read must equal a manual
    per-member union (name-aligned, NULL-filled) for arbitrary
    evolution patterns — including variables that appear, disappear,
    and reappear across members."""
    from netcdf4_variable_streamer_spark.sources.netcdf3_source import (
        _spark_schema_union,
        _arrow_batches,
        _resolve_members,
    )

    rng = np.random.RandomState(seed)
    d = str(tmp_path_factory.mktemp("uf"))
    names = [f"v{i}" for i in range(n_vars)]
    expected: dict[str, list] = {nm: [] for nm in names}
    ever: set[str] = set()
    off = 0
    for m in range(n_members):
        n = int(rng.randint(1, 5))
        # every member keeps v0 (a dataset needs >= 1 record var);
        # others appear at random
        present = ["v0"] + [nm for nm in names[1:] if rng.rand() < 0.6]
        ever.update(present)
        variables = {
            nm: ("int32", ("t", "x")) for nm in present
        }
        data = {
            nm: rng.randint(-50, 50, size=(n, 2)).astype(np.int32)
            for nm in present
        }
        write_netcdf3(
            os.path.join(d, f"p{m:02d}.nc"),
            dims={"t": None, "x": 2},
            variables=variables,
            data=data,
        )
        for nm in names:
            if nm in present:
                expected[nm].extend(data[nm].reshape(-1).tolist())
            else:
                expected[nm].extend([None] * (n * 2))
        off += n
    members = _resolve_members(d)
    ddl = _spark_schema_union(members)
    cols = [p.split(" ")[0] for p in ddl.split(", ")]
    col_types = dict(p.split(" ", 1) for p in ddl.split(", "))
    got: dict[str, list] = {nm: [] for nm in sorted(ever)}
    for path, n, o in members:
        for batch in _arrow_batches(
            path, cols, 0, n, o, col_types=col_types
        ):
            tbl = batch.to_pydict()
            for nm in got:
                got[nm].extend(tbl[nm])
    assert got == {nm: expected[nm] for nm in got}


def test_combined_interop_layout(tmp_path):
    """All round-10 interop features in ONE file: a v1 superblock
    (non-default K) with a defined fill value and Fletcher-32 +
    shuffle + deflate chunks, the whole thing behind a 2048-byte
    userblock — each feature must compose, not just pass its own
    test."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    v = (np.arange(60, dtype=np.float32) * 0.5).reshape(20, 3)
    p0 = os.path.join(tmp_path, "base.h5")
    write_hdf5(
        p0,
        {"v": v},
        {
            "v": {
                "chunk": (4, 3),
                "fletcher": True,
                "shuffle": True,
                "compress": 5,
                "fillvalue": np.float32(-1.25),
            }
        },
    )
    orig = bytearray(open(p0, "rb").read())
    # rewrite the superblock as v1 (scratch overlap trick, see
    # test_superblock_v1_nondefault_btree_k)
    root_header = struct.unpack_from("<Q", orig, 56 + 8)[0]
    sb = bytearray(100)
    sb[0:8] = b"\x89HDF\r\n\x1a\n"
    sb[8] = 1
    sb[13] = sb[14] = 8
    struct.pack_into("<HH", sb, 16, 5, 9)
    struct.pack_into("<HH", sb, 24, 13, 0)
    struct.pack_into(
        "<QQQQ", sb, 28, 0, 0xFFFFFFFFFFFFFFFF, len(orig),
        0xFFFFFFFFFFFFFFFF,
    )
    struct.pack_into("<QQII", sb, 60, 0, root_header, 0, 0)
    sb[96:100] = orig[96:100]
    body = bytes(sb) + bytes(orig[100:])
    p1 = os.path.join(tmp_path, "combined.h5")
    with open(p1, "wb") as f:
        f.write(b"\x55" * 2048 + body)
    h = HDF5File(p1)
    info = h.datasets["v"]
    assert [fid for fid, _ in info.filters] == [3, 2, 1]
    assert info.fill is not None
    np.testing.assert_array_equal(h.read("v"), v)
    np.testing.assert_array_equal(h.read_slab0("v", 6, 17), v[6:17])
    # a flipped CHUNK byte still fails fletcher through the whole
    # stack (deflate notices most flips; flip inside the stored
    # deflate stream so SOME corruption path fires loudly)
    chunks = list(h._iter_chunks(info))
    buf = bytearray(open(p1, "rb").read())
    buf[2048 + chunks[0][2] + 3] ^= 0x20
    with open(p1, "wb") as f:
        f.write(bytes(buf))
    with pytest.raises(Exception):
        HDF5File(p1).read("v")


def test_ohdr_message_creation_order_bytes(tmp_path):
    """OHDR v2 headers with flag 0x04 — libhdf5 writes 2 creation-order
    bytes per MESSAGE header when attribute creation order is tracked;
    the walker must step the 6-byte message-header stride (our writer
    always emits the 4-byte untracked form). Crafted header, real
    checksum."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        lookup3,
    )

    # two NIL-ish messages with distinct types and bodies
    msgs = [
        (0x0C, b"\x01" + b"\x00" * 7),  # pseudo attribute body
        (0x00, b"\x00" * 4),  # NIL
    ]
    body = b""
    for order, (mt, mb) in enumerate(msgs):
        body += (
            bytes([mt])
            + struct.pack("<H", len(mb))
            + b"\x00"  # msg flags
            + struct.pack("<H", order)  # creation order (flag 0x04)
            + mb
        )
    flags = 0x04 | 0x00  # tracked creation order, 1-byte chunk0 size
    hdr = b"OHDR" + bytes([2, flags]) + bytes([len(body)])
    img = hdr + body
    img += struct.pack("<I", lookup3(img))
    h = HDF5File.__new__(HDF5File)
    h.path = "<mem>"
    h._buf = img
    out = h._messages_at(0)
    assert [(t, bytes(b)) for t, b, _off in out] == msgs
    # corrupt checksum: loud
    bad = bytearray(img)
    bad[-1] ^= 0xFF
    h._buf = bytes(bad)
    with pytest.raises(ValueError, match="checksum mismatch"):
        h._messages_at(0)


def test_fill_value_compound_dataset(tmp_path):
    """A compound dataset's defined fill (whole-struct bytes) must
    surface from unallocated storage — _fill_alloc's structured-dtype
    broadcast path."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    dt = np.dtype([("a", "<i4"), ("b", "<f8")])
    v = np.zeros(4, dtype=dt)
    v["a"] = [1, 2, 3, 4]
    v["b"] = [0.5, 1.5, 2.5, 3.5]
    fill = np.zeros((), dtype=dt)
    fill["a"] = -7
    fill["b"] = -0.25
    p = os.path.join(tmp_path, "cf.h5")
    write_hdf5(p, {"v": v}, {"v": {"fillvalue": fill}})
    h = HDF5File(p)
    np.testing.assert_array_equal(h.read("v"), v)
    # UNDEF the contiguous data address -> pure fill
    msgs = h._messages_at(h._header_addr["v"])
    layout_off = next(off for t, b, off in msgs if t == 0x0008)
    buf = bytearray(open(p, "rb").read())
    struct.pack_into("<Q", buf, layout_off + 2, 0xFFFFFFFFFFFFFFFF)
    with open(p, "wb") as f:
        f.write(bytes(buf))
    got = HDF5File(p).read("v")
    assert got.dtype == dt
    assert all(got["a"] == -7) and all(got["b"] == -0.25)


def test_fletcher32_over_vlen_and_compound(tmp_path):
    """The checksum filter composes with non-scalar datatypes: vlen
    string DESCRIPTOR streams and compound records ride the same
    chunk filter chain — verify both round-trip and fail loudly on a
    flipped descriptor byte."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    cells = np.empty(6, dtype=object)
    for i, s in enumerate(["a", "", "hello", None, "éé", "x"]):
        cells[i] = s
    dt = np.dtype([("k", "<i4"), ("x", "<f8")])
    cv = np.zeros(5, dtype=dt)
    cv["k"] = np.arange(5)
    cv["x"] = np.arange(5) * 0.25
    p = os.path.join(tmp_path, "vf.h5")
    write_hdf5(
        p,
        {"s": cells, "c": cv},
        {
            "s": {"chunk": (3,), "fletcher": True, "compress": 3},
            "c": {"chunk": (2,), "fletcher": True, "shuffle": True},
        },
    )
    h = HDF5File(p)
    assert [fid for fid, _ in h.datasets["s"].filters] == [3, 1]
    assert [fid for fid, _ in h.datasets["c"].filters] == [3, 2]
    assert list(h.read("s")) == ["a", "", "hello", "", "éé", "x"]
    np.testing.assert_array_equal(h.read("c"), cv)
    # flip a byte inside a compound chunk: loud fletcher failure
    chunks = list(h._iter_chunks(h.datasets["c"]))
    buf = bytearray(open(p, "rb").read())
    buf[chunks[0][2] + 7] ^= 0x08
    with open(p, "wb") as f:
        f.write(bytes(buf))
    with pytest.raises(ValueError, match="fletcher32 checksum mismatch"):
        HDF5File(p).read("c")


# ---------------------------------------------------------------------------
# Interop fuzz round 4 (VERDICT r10 "Next round" #6): v2 B-tree
# non-default split ratios, SOHM refusal loudness, attribute
# phase-change prefixes and single-attribute dense storage, userblocks
# composed with the other superblock families.
# ---------------------------------------------------------------------------


def _mem_h5(buf: bytes):
    import netcdf4_variable_streamer_spark.sources.hdf5lite as hl

    h = hl.HDF5File.__new__(hl.HDF5File)
    h.path = "<mem>"
    h._buf = bytes(buf)
    return h


def test_bt2_nondefault_split_merge_ratios():
    """The BTHD split/merge percentages are WRITER policy (when to
    split or merge nodes); a reader must walk the same tree whatever
    they say. libhdf5 writes (100, 40) by default and anything the
    application set via H5Pset_btree_ratios otherwise — patch several
    non-default pairs over a multi-node tree and require identical
    records (checksum refreshed: the header is checksummed, so the
    patch must be legitimate bytes, not silent corruption)."""
    import netcdf4_variable_streamer_spark.sources.hdf5lite as hl

    recs = [struct.pack("<QQQ", 4096 + 32 * i, 32, i) for i in range(600)]
    out = bytearray(b"\x00" * 48)
    addr = hl._write_bt2(out, recs, 1, node_size=512)
    baseline = _mem_h5(out)._bt2_records(addr, 1)
    assert baseline == recs
    for split, merge in ((50, 20), (90, 10), (1, 1), (255, 255)):
        buf = bytearray(out)
        buf[addr + 14], buf[addr + 15] = split, merge
        struct.pack_into(
            "<I", buf, addr + 34, hl.lookup3(bytes(buf[addr:addr + 34]))
        )
        assert _mem_h5(buf)._bt2_records(addr, 1) == recs
    # a patch WITHOUT the checksum refresh stays loud
    buf = bytearray(out)
    buf[addr + 14] = 50
    with pytest.raises(ValueError, match="header checksum"):
        _mem_h5(buf)._bt2_records(addr, 1)


def test_sohm_shared_message_refusals_loud(tmp_path):
    """Shared-message bodies that point into a SOHM heap (version 3,
    location type 1) — what H5Pset_shared_mesg_nregions-enabled files
    carry — refuse LOUDLY naming SOHM; unknown shared versions and
    location types are named too. (netcdf-c never enables SOHM, so
    this is a documented permanent refusal, not a gap a NetCDF-4 file
    can hit.)"""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    p = os.path.join(tmp_path, "base.h5")
    write_hdf5(p, {"a": np.arange(4, dtype=np.int32)})
    h = HDF5File(p)
    with pytest.raises(ValueError, match="SOHM"):
        h._shared_body(0x03, bytes([3, 1]) + b"\x00" * 8)
    with pytest.raises(ValueError, match="location"):
        h._shared_body(0x03, bytes([3, 7]) + b"\x00" * 8)
    with pytest.raises(ValueError, match="shared-message version 9"):
        h._shared_body(0x03, bytes([9, 2]) + b"\x00" * 8)
    with pytest.raises(ValueError, match="cannot hold"):
        h._shared_body(0x03, bytes([3, 2]))


def test_ohdr_phase_change_prefix_fields():
    """OHDR v2 headers carrying the optional prefixes libhdf5 writes
    when attribute phase-change values are non-default (flag 0x10:
    max-compact/min-dense u16 pair) and/or times are tracked (flag
    0x20: four u32 stamps) must offset the message walk correctly —
    crafted headers with each flag combination carry one attribute
    message whose value must survive."""
    import netcdf4_variable_streamer_spark.sources.hdf5lite as hl

    attr_body = hl._attr_msg("k", np.int32(7), latest=True)[4:]
    # _attr_msg(latest) returns the 2-byte-type envelope; rebuild the
    # v2 message by hand so the test controls the header layout fully
    for flags_extra, prefix in [
        (0x10, struct.pack("<HH", 2, 2)),            # phase change
        (0x20, struct.pack("<4I", 1, 2, 3, 4)),      # times
        (0x30, struct.pack("<4I", 1, 2, 3, 4)
               + struct.pack("<HH", 100, 1)),        # both
    ]:
        msg = bytes([0x0C]) + struct.pack("<H", len(attr_body)) \
            + bytes([0]) + attr_body
        blk = msg
        hdr = b"OHDR" + bytes([2, 0x02 | flags_extra]) + prefix
        hdr += struct.pack("<I", len(blk)) + blk
        buf = bytearray(b"\x00" * 64) + hdr
        buf += struct.pack("<I", hl.lookup3(bytes(hdr)))
        msgs = _mem_h5(buf)._messages(64)
        got = dict(
            m for m in (
                _mem_h5(buf)._parse_attr(b)
                for t, b in msgs if t == 0x0C
            ) if m
        )
        assert int(got["k"]) == 7, hex(flags_extra)


def test_dense_attribute_storage_single_attr():
    """Dense attribute storage holding exactly ONE attribute — the
    min_dense=0 phase-change boundary a file hits when the application
    forces dense storage (H5Pset_attr_phase_change(0, 0)). The
    fractal heap + name B-tree machinery must not assume the >8
    population our writer uses it for."""
    import netcdf4_variable_streamer_spark.sources.hdf5lite as hl

    out = bytearray(b"\x00" * 48)
    fheap_addr, bt2_addr = hl._write_dense_attrs(out, {"only": 41})
    h = _mem_h5(out)
    got = dict(h._dense_attrs(fheap_addr, bt2_addr))
    assert int(got["only"]) == 41


def test_userblock_composed_with_other_families(tmp_path):
    """Userblocks compose with the OTHER superblock families and
    sizes beyond round 10's set: 2048/8192/16384-byte blocks on a
    classic file, and a 2048-byte block in front of a crafted
    superblock-v1 file (every stored address is base-relative, so the
    shift must be invisible)."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    rng = np.random.RandomState(11)
    v = (np.arange(120, dtype=np.int32) * 7).reshape(40, 3)
    base = os.path.join(tmp_path, "plain.h5")
    write_hdf5(base, {"v": v}, {"v": {"chunk": (8, 3)}}, attrs={"k": 3})
    orig = open(base, "rb").read()
    for ub in (2048, 8192, 16384):
        p = os.path.join(tmp_path, f"ub{ub}.h5")
        blob = rng.bytes(ub)
        assert blob[:8] != b"\x89HDF\r\n\x1a\n"
        with open(p, "wb") as f:
            f.write(blob + orig)
        h = HDF5File(p)
        assert int(h.attrs["k"]) == 3
        np.testing.assert_array_equal(h.read("v"), v)

    # superblock v1 (non-default K's, same craft as
    # test_superblock_v1_nondefault_btree_k) behind a userblock
    root_header = struct.unpack_from("<Q", orig, 56 + 8)[0]
    sb = bytearray(100)
    sb[0:8] = b"\x89HDF\r\n\x1a\n"
    sb[8] = 1
    sb[13] = 8
    sb[14] = 8
    struct.pack_into("<HH", sb, 16, 3, 11)
    struct.pack_into("<HH", sb, 24, 17, 0)
    struct.pack_into("<QQQQ", sb, 28, 0, 0xFFFFFFFFFFFFFFFF,
                     len(orig), 0xFFFFFFFFFFFFFFFF)
    struct.pack_into("<QQII", sb, 60, 0, root_header, 0, 0)
    sb[96:100] = orig[96:100]
    p = os.path.join(tmp_path, "ub_v1.h5")
    with open(p, "wb") as f:
        f.write(rng.bytes(2048) + bytes(sb) + orig[100:])
    h = HDF5File(p)
    assert int(h.attrs["k"]) == 3
    np.testing.assert_array_equal(h.read("v"), v)
    np.testing.assert_array_equal(h.read_slab0("v", 30, 40), v[30:40])


def test_ohdr_chunk0_size_codes():
    """OHDR v2 stores the chunk-0 length at 1, 2, 4 or 8 bytes (flag
    bits 0-1); our writer always emits the 4-byte code, libhdf5 picks
    the smallest that fits — every code must walk, including combined
    with the phase-change prefix."""
    import netcdf4_variable_streamer_spark.sources.hdf5lite as hl

    attr_body = hl._attr_msg("k", np.int32(9), latest=True)[4:]
    msg = bytes([0x0C]) + struct.pack("<H", len(attr_body)) \
        + bytes([0]) + attr_body
    for code in (0, 1, 2, 3):
        for extra, prefix in ((0, b""), (0x10, struct.pack("<HH", 5, 3))):
            hdr = b"OHDR" + bytes([2, code | extra]) + prefix
            hdr += len(msg).to_bytes(1 << code, "little") + msg
            buf = bytearray(b"\x00" * 32) + hdr
            buf += struct.pack("<I", hl.lookup3(bytes(hdr)))
            msgs = _mem_h5(buf)._messages(32)
            got = dict(
                m for m in (
                    _mem_h5(buf)._parse_attr(b)
                    for t, b in msgs if t == 0x0C
                ) if m
            )
            assert int(got["k"]) == 9, (code, extra)


def test_unsupported_filter_ids_named(tmp_path):
    """Unsupported pipeline filters refuse LOUDLY naming the filter:
    nbit (5), scaleoffset (6) — the HDF5-only filters a netCDF-4
    variable cannot carry (nc_def_var_* exposes only deflate/shuffle/
    fletcher32/szip; szip itself decodes since round 12) — plus truly
    unknown ids. Crafted by patching a deflate pipeline message's
    filter id in place."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    v = np.arange(64, dtype=np.int32).reshape(16, 4)
    for fid, name in ((5, "nbit"), (6, "scaleoffset"),
                      (305, "unknown/registered filter")):
        p = os.path.join(tmp_path, f"f{fid}.h5")
        write_hdf5(p, {"v": v}, {"v": {"chunk": (4, 4), "compress": 1}})
        buf = bytearray(open(p, "rb").read())
        # the filter-pipeline message stores the deflate id (1) as a
        # u16 followed by name length 0 and flags 0; locate it via the
        # message body offset recorded by the reader
        h = HDF5File(p)
        hits = 0
        for t, body, off in h._messages_at(h._header_addr["v"]):
            if t == 0x000B:
                assert struct.unpack_from("<H", body, 8)[0] == 1
                struct.pack_into("<H", buf, off + 8, fid)
                hits += 1
        assert hits == 1
        open(p, "wb").write(bytes(buf))
        with pytest.raises(ValueError, match=f"filter id {fid} .{name}"):
            HDF5File(p).read("v")


# ---------------------------------------------------------------------------
# szip / CCSDS 121.0-B-2 extended-Rice (round 12)
# ---------------------------------------------------------------------------


def _bits(s: str) -> bytes:
    """Independent golden-byte assembler: '0'/'1' string (spaces
    ignored) -> MSB-first padded bytes, built with none of the
    codec's own machinery."""
    s = s.replace(" ", "")
    s += "0" * (-len(s) % 8)
    return bytes(
        int(s[i : i + 8], 2) for i in range(0, len(s), 8)
    )


def _fs(v: int) -> str:
    return "0" * v + "1"


def test_szip_golden_fs_block():
    """Format pinning, FS option (ID 1, k=0): hand-assembled per the
    spec — 3-bit ID for 8-bit data, then one unary codeword per
    sample. The encoder must produce these exact bytes."""
    from netcdf4_variable_streamer_spark.sources.szip import (
        szip_decode,
        szip_encode,
    )

    samples = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.uint8)
    want = _bits("001" + "".join(_fs(int(v)) for v in samples))
    got = szip_encode(
        samples, nbits=8, pixels_per_block=8, pixels_per_scanline=8,
        nn=False,
    )
    assert got == want
    assert szip_decode(
        want, 8, nbits=8, pixels_per_block=8, pixels_per_scanline=8,
        nn=False,
    ) == list(samples)


def test_szip_golden_uncompressed_block():
    """High-entropy block falls back to the all-ones ID and raw
    samples (8 x 8 bits here)."""
    from netcdf4_variable_streamer_spark.sources.szip import (
        szip_decode,
        szip_encode,
    )

    samples = np.array([255, 0, 255, 0, 255, 0, 255, 0], dtype=np.uint8)
    want = _bits("111" + "".join(format(int(v), "08b") for v in samples))
    got = szip_encode(
        samples, nbits=8, pixels_per_block=8, pixels_per_scanline=8,
        nn=False,
    )
    assert got == want
    assert szip_decode(
        want, 8, nbits=8, pixels_per_block=8, pixels_per_scanline=8,
        nn=False,
    ) == list(samples)


def test_szip_golden_zero_blocks_and_ros():
    """Zero-block runs: an all-zero 64-sample scanline (8 blocks)
    emits ID 0 + selector 0 + the '00001' remainder-of-segment
    codeword from the standard; a 3-block zero run before data emits
    FS(run-1)."""
    from netcdf4_variable_streamer_spark.sources.szip import (
        szip_decode,
        szip_encode,
    )

    allz = np.zeros(64, dtype=np.uint8)
    want = _bits("000" + "0" + _fs(4))
    got = szip_encode(
        allz, nbits=8, pixels_per_block=8, pixels_per_scanline=64,
        nn=False,
    )
    assert got == want
    assert szip_decode(
        want, 64, nbits=8, pixels_per_block=8, pixels_per_scanline=64,
        nn=False,
    ) == [0] * 64

    mixed = np.zeros(32, dtype=np.uint8)
    mixed[24:32] = [0, 1, 2, 3, 0, 1, 2, 3]
    want = _bits(
        "000" + "0" + _fs(2)  # 3 zero blocks, run coded as FS(2)
        + "001" + "".join(_fs(int(v)) for v in mixed[24:])
    )
    got = szip_encode(
        mixed, nbits=8, pixels_per_block=8, pixels_per_scanline=32,
        nn=False,
    )
    assert got == want
    assert szip_decode(
        want, 32, nbits=8, pixels_per_block=8, pixels_per_scanline=32,
        nn=False,
    ) == list(mixed)


def test_szip_golden_second_extension():
    """SE option (ID 0 + selector 1): pairs code as FS of
    gamma = (d0+d1)(d0+d1+1)/2 + d1."""
    from netcdf4_variable_streamer_spark.sources.szip import (
        szip_decode,
        szip_encode,
    )

    samples = np.array([0, 1, 0, 0, 0, 0, 0, 0], dtype=np.uint8)
    # gammas: (0,1)->2, (0,0)->0 x3; SE cost 3+1+2+4 beats FS 3+1+8
    want = _bits("000" + "1" + _fs(2) + _fs(0) + _fs(0) + _fs(0))
    got = szip_encode(
        samples, nbits=8, pixels_per_block=8, pixels_per_scanline=8,
        nn=False,
    )
    assert got == want
    assert szip_decode(
        want, 8, nbits=8, pixels_per_block=8, pixels_per_scanline=8,
        nn=False,
    ) == list(samples)


def test_szip_golden_nn_reference_block():
    """NN preprocessing: the raw reference sample rides between the
    first block's ID and its J-1 coded differences, mapped by the
    theta-clamped CCSDS mapper."""
    from netcdf4_variable_streamer_spark.sources.szip import (
        szip_decode,
        szip_encode,
    )

    samples = np.array([10, 11, 12, 11, 10, 10, 10, 10], dtype=np.uint8)
    # deltas (d: +1 +1 -1 -1 0 0 0) -> mapped 2 2 1 1 0 0 0
    want = _bits(
        "001" + format(10, "08b")
        + "".join(_fs(v) for v in (2, 2, 1, 1, 0, 0, 0))
    )
    got = szip_encode(
        samples, nbits=8, pixels_per_block=8, pixels_per_scanline=8,
        nn=True,
    )
    assert got == want
    assert szip_decode(
        want, 8, nbits=8, pixels_per_block=8, pixels_per_scanline=8,
        nn=True,
    ) == list(samples)


def test_szip_roundtrip_fuzz():
    """Encoder/decoder round-trip across widths, modes, block and
    scanline geometries, smooth and adversarial data — including
    multi-scanline streams, short final intervals, zero runs crossing
    scanlines, and 16/32-bit splits."""
    from netcdf4_variable_streamer_spark.sources.szip import (
        szip_decode,
        szip_encode,
    )

    rng = np.random.default_rng(12)
    for nbits, dt in ((8, "u1"), (16, "u2"), (32, "u4")):
        hi = 2 ** min(nbits, 31)
        arrays = [
            (np.cumsum(rng.integers(-3, 4, 512)) % (2**nbits - 1)).astype(dt),
            rng.integers(0, hi, 512).astype(dt),
            np.zeros(512, dt),
            np.full(512, (1 << nbits) - 1, dt),
        ]
        z = np.zeros(512, dt)
        z[130:140] = 7
        arrays.append(z)
        for arr in arrays:
            for nn in (True, False):
                for ppb, pps in ((8, 64), (16, 256), (32, 32), (8, 8)):
                    s = szip_encode(
                        arr, nbits=nbits, pixels_per_block=ppb,
                        pixels_per_scanline=pps, nn=nn,
                    )
                    assert szip_decode(
                        s, len(arr), nbits=nbits, pixels_per_block=ppb,
                        pixels_per_scanline=pps, nn=nn,
                    ) == list(arr)


def test_szip_refusals_loud():
    """Every malformed input refuses with a named ValueError: partial
    blocks, bad geometry, the raw-option mask, truncation (including
    a low-entropy reference block cut before its raw reference),
    and an NN unmap that leaves the sample range."""
    from netcdf4_variable_streamer_spark.sources.szip import (
        szip_decode,
        szip_encode,
        szip_h5_decode,
    )

    a = np.arange(12, dtype=np.uint8)
    with pytest.raises(ValueError, match="not whole 8-sample blocks"):
        szip_encode(a, nbits=8, pixels_per_block=8,
                    pixels_per_scanline=8)
    with pytest.raises(ValueError, match="bits_per_pixel 12"):
        szip_encode(a, nbits=12, pixels_per_block=4,
                    pixels_per_scanline=4)
    with pytest.raises(ValueError, match="pixels_per_block 7"):
        szip_encode(a, nbits=8, pixels_per_block=7,
                    pixels_per_scanline=7)
    with pytest.raises(ValueError, match="pixels_per_scanline 12"):
        szip_encode(a, nbits=8, pixels_per_block=8,
                    pixels_per_scanline=12)
    with pytest.raises(ValueError, match="raw-option"):
        szip_h5_decode(b"\x00" * 8, (128 | 8, 8, 8, 8))
    with pytest.raises(ValueError, match="stored-size prefix"):
        szip_h5_decode(b"\x00", (32 | 8, 8, 8, 8))
    with pytest.raises(ValueError, match="not whole 2-byte samples"):
        szip_h5_decode(struct.pack("<I", 7) + b"\x00" * 8,
                       (32 | 8, 16, 8, 8))
    # low-entropy reference block truncated before the raw reference
    with pytest.raises(ValueError, match="truncated"):
        szip_decode(
            _bits("000" + "0" + _fs(4)), 8, nbits=8,
            pixels_per_block=8, pixels_per_scanline=8, nn=True,
        )
    # truncated mid-codeword
    with pytest.raises(ValueError, match="truncated"):
        szip_decode(
            _bits("001" + format(10, "08b") + "00"), 8, nbits=8,
            pixels_per_block=8, pixels_per_scanline=8, nn=True,
        )
    # NN unmap escapes [0, 255]: ref 200, mapped delta 305 -> d -250
    with pytest.raises(ValueError, match="left the sample range"):
        szip_decode(
            _bits("001" + format(200, "08b") + _fs(305)), 2, nbits=8,
            pixels_per_block=2, pixels_per_scanline=2, nn=True,
        )


def test_szip_hdf5_roundtrip_and_writer_refusals(tmp_path):
    """szip as HDF5 filter 4 end to end (both libvers, NN and EC,
    8/16/32-bit and float32, chunk-pruned slab reads), plus the
    writer-side refusals: 64-bit samples, non-dividing chunks, and
    stacking szip with deflate."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    rng = np.random.default_rng(5)
    a = (np.cumsum(rng.integers(-9, 10, (40, 32)), axis=1)
         % 100000).astype("<i4")
    b = rng.integers(0, 5000, (24, 16)).astype("<u2")
    f = (rng.standard_normal((16, 32)) * 10).astype("<f4")
    for libver in ("earliest", "latest"):
        p = os.path.join(tmp_path, f"sz_{libver}.h5")
        write_hdf5(p, {"a": a, "b": b, "f": f}, {
            "a": {"chunk": (8, 32), "szip": {"pixels_per_block": 16}},
            "b": {"chunk": (8, 16),
                  "szip": {"pixels_per_block": 8, "mode": "ec"}},
            "f": {"chunk": (4, 32), "szip": {"pixels_per_block": 32}},
        }, libver=libver)
        h = HDF5File(p)
        assert [fl[0] for fl in h.datasets["a"].filters] == [4]
        np.testing.assert_array_equal(h.read("a"), a)
        np.testing.assert_array_equal(h.read("b"), b)
        np.testing.assert_array_equal(h.read("f"), f)
        np.testing.assert_array_equal(h.read_slab0("a", 10, 30),
                                      a[10:30])

    with pytest.raises(ValueError, match="64-bit samples"):
        write_hdf5(os.path.join(tmp_path, "r1.h5"),
                   {"v": np.arange(64, dtype=np.int64)},
                   {"v": {"chunk": (16,), "szip": {}}})
    with pytest.raises(ValueError, match="not whole 16-sample"):
        write_hdf5(os.path.join(tmp_path, "r2.h5"),
                   {"v": np.arange(24, dtype=np.int32)},
                   {"v": {"chunk": (24,), "szip": {}}})
    with pytest.raises(ValueError, match="never produced"):
        write_hdf5(os.path.join(tmp_path, "r3.h5"),
                   {"v": np.arange(32, dtype=np.int32)},
                   {"v": {"chunk": (16,), "szip": {}, "compress": 4}})


# ---------------------------------------------------------------------------
# Interop fuzz round 5 (VERDICT r11 "Next round" #6): fractal heaps at
# non-default doubling-table geometry (incl. checksummed/filtered
# direct blocks), szip composed with shuffle, and the szip+fletcher
# writer refusal.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "width,start,max_direct,level",
    [
        (8, 256, 8 * 1024, None),    # wide table, small blocks
        (2, 1024, 16 * 1024, None),  # narrow table
        (4, 128, 4 * 1024, 6),       # filtered -> checksummed FHDBs
        (8, 256, 2 * 1024, 4),       # filtered + wide + small blocks
    ],
)
def test_fractal_heap_nondefault_geometry(
    monkeypatch, width, start, max_direct, level
):
    """A fractal heap's doubling-table geometry (table width, starting
    block size, max direct size) is an application choice recorded in
    the FRHP header — a reader must honor whatever the header says,
    including checksummed direct blocks at NON-default sizes (filtered
    heaps set flags bit 1). Patch the writer's defaults, write objects
    that span several doubling rows, and round-trip every one."""
    import netcdf4_variable_streamer_spark.sources.hdf5lite as hl

    monkeypatch.setattr(hl, "_FH_WIDTH", width)
    monkeypatch.setattr(hl, "_FH_START", start)
    monkeypatch.setattr(hl, "_FH_MAX_DIRECT", max_direct)
    rng = np.random.RandomState(width * start % 997)
    objs = {}
    total = 0
    for i in range(200):
        sz = int(rng.randint(1, max_direct // 3))
        if total + sz > width * max_direct:
            break
        total += sz
        objs[f"o{i:03d}"] = (
            rng.bytes(sz) if rng.rand() < 0.5 else b"\x07" * sz
        )
    out = bytearray(b"\x00" * 48)
    addr, ids = hl._write_fractal_heap(out, objs, 8, deflate=level)
    h = _mem_h5(out)
    heap = h._fractal_heap(addr)
    assert heap["width"] == width
    assert heap["start_size"] == start
    assert heap["max_direct"] == max_direct
    assert heap["checksum_dblocks"] == (level is not None)
    for nm, body in objs.items():
        assert h._fheap_object(heap, ids[nm]) == body
    if level is not None:
        # checksummed direct blocks are the point of flags bit 1:
        # corrupt every allocated direct block's STORED (compressed)
        # bytes — located via the header/root-iblock entries, not the
        # FHDB signature (it is compressed too) — and any read fails
        # loudly
        buf = bytearray(out)
        if heap["cur_rows"] == 0:
            db_addrs = [heap["root_addr"]]
        else:
            base = heap["root_addr"] + 4 + 1 + 8 + heap["off_size"]
            db_addrs = []
            for e in range(heap["cur_rows"] * width):
                a_e = struct.unpack_from("<Q", buf, base + 20 * e)[0]
                if a_e != hl.UNDEF:
                    db_addrs.append(a_e)
        for a_e in db_addrs:
            buf[a_e + 10] ^= 0xFF
        hb = _mem_h5(buf)
        heap_bad = hb._fractal_heap(addr)
        with pytest.raises(ValueError, match="checksum|corrupt|rror"):
            for nm in objs:
                hb._fheap_object(heap_bad, ids[nm])


def test_szip_composes_with_shuffle(tmp_path):
    """shuffle -> szip (both legal HDF5 pipeline stages) round-trips:
    szip entropy-codes the SHUFFLED byte stream as opaque samples —
    lossless regardless of the transposed layout — and decode reverses
    the stages in pipeline order."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    rng = np.random.default_rng(9)
    a = (np.cumsum(rng.integers(-4, 5, (32, 16)), axis=0) % 30000).astype(
        "<i4"
    )
    p = os.path.join(tmp_path, "szsh.h5")
    write_hdf5(
        p,
        {"v": a},
        {"v": {"chunk": (8, 16), "shuffle": True,
               "szip": {"pixels_per_block": 16}}},
    )
    h = HDF5File(p)
    assert [f[0] for f in h.datasets["v"].filters] == [2, 4]
    np.testing.assert_array_equal(h.read("v"), a)
    np.testing.assert_array_equal(h.read_slab0("v", 8, 24), a[8:24])


def test_szip_fletcher_refused(tmp_path):
    """szip + fletcher32 on one dataset refuses loudly at write time:
    the 4 checksum bytes would ride the szip stream as misaligned
    extra samples, and the partial-block padding convention is
    unverifiable without the szip library."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import write_hdf5

    with pytest.raises(ValueError, match="szip with fletcher32"):
        write_hdf5(
            os.path.join(tmp_path, "szf.h5"),
            {"v": np.arange(64, dtype=np.int32)},
            {"v": {"chunk": (16,), "szip": {}, "fletcher": True}},
        )


@settings(max_examples=40, deadline=None)
@given(
    nbits=st.sampled_from([8, 16, 32]),
    nn=st.booleans(),
    ppb=st.sampled_from([2, 4, 8, 16, 32]),
    blocks_per_rsi=st.integers(1, 6),
    n_blocks=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    shape=st.sampled_from(["smooth", "random", "zeros", "spiky"]),
)
def test_szip_roundtrip_hypothesis(
    nbits, nn, ppb, blocks_per_rsi, n_blocks, seed, shape
):
    """Property: szip_decode(szip_encode(x)) == x for arbitrary
    geometry (block size, scanline length, short final interval) and
    data shapes across all sample widths and both modes."""
    from netcdf4_variable_streamer_spark.sources.szip import (
        szip_decode,
        szip_encode,
    )

    rng = np.random.RandomState(seed)
    n = n_blocks * ppb
    dt = {8: "u1", 16: "u2", 32: "u4"}[nbits]
    hi = 2 ** min(nbits, 31)
    if shape == "smooth":
        arr = (np.cumsum(rng.randint(-3, 4, n)) % (2**nbits - 1)).astype(dt)
    elif shape == "random":
        arr = rng.randint(0, hi, n).astype(dt)
    elif shape == "zeros":
        arr = np.zeros(n, dt)
    else:
        arr = np.zeros(n, dt)
        arr[:: max(1, n // 7)] = (1 << nbits) - 1
    pps = ppb * blocks_per_rsi
    s = szip_encode(
        arr, nbits=nbits, pixels_per_block=ppb,
        pixels_per_scanline=pps, nn=nn,
    )
    assert szip_decode(
        s, n, nbits=nbits, pixels_per_block=ppb,
        pixels_per_scanline=pps, nn=nn,
    ) == list(arr)


@settings(max_examples=25, deadline=None)
@given(
    n_rows=st.integers(1, 12),
    members=st.lists(
        st.sampled_from(
            ["i4", "f8", "i2", "str", "seq_i4", "seq_f8", "ref",
             "regref"]
        ),
        min_size=1, max_size=5,
    ),
    chunked=st.booleans(),
    level=st.sampled_from([None, 1, 6]),
    seed=st.integers(0, 2**31 - 1),
)
def test_compound_vlen_members_roundtrip_hypothesis(
    tmp_path_factory, n_rows, members, chunked, level, seed
):
    """Property: NC_COMPOUND datasets with arbitrary mixes of fixed,
    NC_STRING, NC_VLEN-of-numeric, and (round 13) OBJECT-REFERENCE
    members round-trip through the writer/reader pair across layouts
    and filters."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    rng = np.random.RandomState(seed)
    tmp = tmp_path_factory.mktemp("cvh")
    fields, fills = [], []
    for i, kind in enumerate(members):
        name = f"m{i}"
        if kind in ("str", "seq_i4", "seq_f8", "ref", "regref"):
            fields.append((name, object))
        else:
            fields.append((name, f"<{kind}"))
        fills.append(kind)
    refs = tuple(
        n for (n, _f), k in zip(fields, fills) if k == "ref"
    )
    regrefs = tuple(
        n for (n, _f), k in zip(fields, fills) if k == "regref"
    )
    meta = {}
    if refs:
        meta["ref_members"] = refs
    if regrefs:
        meta["regref_members"] = regrefs
    dt = np.dtype(fields, metadata=meta) if meta else np.dtype(fields)
    arr = np.zeros(n_rows, dt)
    for (name, _fmt), kind in zip(fields, fills):
        if kind == "ref":
            arr[name] = [
                [None, "tgt_a", "g/tgt_b"][int(rng.randint(0, 3))]
                for _ in range(n_rows)
            ]
        elif kind == "regref":
            cells = []
            for _ in range(n_rows):
                c = int(rng.randint(0, 4))
                lo = int(rng.randint(0, 2))
                cells.append(
                    [
                        None,
                        ("tgt_a", [((lo, lo + 1),)]),
                        ("tgt_a", "all"),
                        ("g/tgt_b", "none"),
                    ][c]
                )
            arr[name] = cells
        elif kind == "str":
            arr[name] = [
                "" if rng.rand() < 0.2
                else "s%d-%s" % (j, "x" * int(rng.randint(0, 20)))
                for j in range(n_rows)
            ]
        elif kind.startswith("seq_"):
            base = "<" + kind[4:]
            arr[name] = [
                rng.randint(-50, 50, int(rng.randint(0, 6))).astype(base)
                for _ in range(n_rows)
            ]
        elif kind == "f8":
            arr[name] = rng.randint(-1000, 1000, n_rows) * 0.25
        else:
            arr[name] = rng.randint(-30000, 30000, n_rows)
    opts = {}
    if chunked:
        opts = {"obs": {"chunk": (max(1, n_rows // 3),)}}
        if level is not None:
            opts["obs"]["compress"] = level
    p = os.path.join(str(tmp), "c.h5")
    targets = (
        {
            "tgt_a": np.arange(2, dtype=np.int32),
            "g/tgt_b": np.arange(3, dtype=np.float32),
        }
        if refs or regrefs
        else {}
    )
    write_hdf5(p, {**targets, "obs": arr}, opts)
    r = HDF5File(p).read("obs")
    for (name, _fmt), kind in zip(fields, fills):
        if kind == "ref":
            assert list(r[name]) == list(arr[name])
        elif kind == "regref":
            for got, want in zip(r[name], arr[name]):
                if want is None:
                    assert got is None
                elif want[1] == "all":
                    assert got.kind == "all" and got.path == want[0]
                elif want[1] == "none":
                    assert got.kind == "none" and got.path == want[0]
                else:
                    assert got.path == want[0]
                    assert got.blocks == (tuple(want[1][0]),)
        elif kind == "str":
            assert list(r[name]) == list(arr[name])
        elif kind.startswith("seq_"):
            for got, want in zip(r[name], arr[name]):
                np.testing.assert_array_equal(got, want)
        else:
            np.testing.assert_array_equal(r[name], arr[name])


@settings(max_examples=30, deadline=None)
@given(
    n_rows=st.integers(1, 16),
    base=st.sampled_from(["u1", "i1", "i2", "u2", "i4", "i8"]),
    n_members=st.integers(0, 8),
    opq_size=st.integers(1, 24),
    tag=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0, max_size=40,
    ),
    chunked=st.booleans(),
    level=st.sampled_from([None, 1, 6]),
    seed=st.integers(0, 2**31 - 1),
)
def test_enum_opaque_roundtrip_hypothesis(
    tmp_path_factory, n_rows, base, n_members, opq_size, tag,
    chunked, level, seed,
):
    """Property (round 12): NC_ENUM datasets over any integer base
    with arbitrary (name, value) members — including zero members,
    negative values, and non-contiguous ids — and NC_OPAQUE datasets
    of any cell size with arbitrary printable-ASCII tags round-trip
    bit-exactly across layouts and filters, members and tag surfaced
    on the DatasetInfo."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    rng = np.random.RandomState(seed)
    bdt = np.dtype(base)
    info = np.iinfo(bdt)
    vals = rng.randint(
        info.min, int(info.max) + 1, size=n_members * 3
    ).astype(bdt)
    vals = np.unique(vals)[:n_members]
    members = tuple(
        (f"mem_{i}", int(v)) for i, v in enumerate(vals)
    )
    edt = (
        np.dtype(base, metadata={"enum_members": members})
        if members
        else np.dtype(base, metadata={"enum_members": ()})
    )
    flags = (
        rng.choice([v for _n, v in members], size=n_rows).astype(bdt)
        if members
        else np.zeros(n_rows, dtype=bdt)
    ).astype(edt)
    odt = np.dtype(f"V{opq_size}", metadata={"opaque_tag": tag})
    blobs = np.zeros(n_rows, dtype=odt)
    blobs.view("u1").reshape(n_rows, opq_size)[:] = rng.randint(
        0, 256, size=(n_rows, opq_size)
    )
    opts = {}
    if chunked:
        o = {"chunk": (max(1, n_rows // 2),)}
        if level is not None:
            o["compress"] = level
            o["shuffle"] = True
        opts = {"flag": dict(o), "blob": dict(o)}
    tmp = tmp_path_factory.mktemp("eoh")
    p = os.path.join(str(tmp), "eo.h5")
    write_hdf5(p, {"flag": flags, "blob": blobs}, opts or None)
    h = HDF5File(p)
    assert h.datasets["flag"].enum_members == members
    got_tag = h.datasets["blob"].opaque_tag
    # the writer pads the tag to 8 with NULs; parse strips trailing
    # NULs — embedded content is preserved verbatim
    assert got_tag == tag
    np.testing.assert_array_equal(
        h.read("flag"), flags.view(bdt)
    )
    assert h.read("blob").tobytes() == blobs.tobytes()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 40),
    base=st.sampled_from(["i1", "i2", "i4", "u1", "u2"]),
    scale=st.floats(
        min_value=1e-4, max_value=1e4,
        allow_nan=False, allow_infinity=False,
    ),
    offset=st.floats(
        min_value=-1e6, max_value=1e6,
        allow_nan=False, allow_infinity=False,
    ),
    use_missing=st.booleans(),
    use_range=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_mask_and_scale_roundtrip_hypothesis(
    tmp_path_factory, n, base, scale, offset, use_missing, use_range,
    seed,
):
    """Property (round 12): for ANY packed integer variable with ANY
    scale/offset floats, the mask_and_scale batch equals the numpy
    reference packed*scale+offset with exactly the missing_value /
    valid_range cells NULL (judged on packed values)."""
    import pyarrow as pa

    from netcdf4_variable_streamer_spark.sources.netcdf3 import (
        write_netcdf3,
    )
    from netcdf4_variable_streamer_spark.sources.netcdf3_source import (
        _arrow_batches,
    )

    rng = np.random.RandomState(seed)
    bdt = np.dtype(base)
    info = np.iinfo(bdt)
    packed = rng.randint(
        info.min, int(info.max) + 1, size=n
    ).astype(bdt)
    attrs = {"scale_factor": float(scale), "add_offset": float(offset)}
    mask = np.zeros(n, dtype=bool)
    if use_missing:
        mv = packed[0]  # guaranteed present
        attrs["missing_value"] = mv
        mask |= packed == mv
    if use_range:
        lo, hi = sorted(
            rng.randint(info.min, int(info.max) + 1, 2).astype(bdt)
        )
        attrs["valid_range"] = np.array([lo, hi], dtype=bdt)
        mask |= (packed < lo) | (packed > hi)

    npname = {"i1": "int8", "i2": "int16", "i4": "int32",
              "u1": "uint8", "u2": "uint16"}[base]
    tmp = tmp_path_factory.mktemp("msh")
    p = os.path.join(str(tmp), "m.nc")
    write_netcdf3(
        p,
        dims={"t": None},
        variables={"x": (npname, ("t",))},
        data={"x": packed},
        var_attrs={"x": attrs},
    )
    tbl = pa.Table.from_batches(
        list(
            _arrow_batches(p, ["t_idx", "x"], 0, n, mask_and_scale=True)
        )
    )
    got = tbl["x"].to_pylist()
    ref = packed.astype(np.float64) * float(scale) + float(offset)
    for i in range(n):
        if mask[i]:
            assert got[i] is None, (i, got[i])
        else:
            assert got[i] == ref[i], (i, got[i], ref[i])


def test_szip_se_cost_sum_no_int64_overflow():
    """ADVICE r12 #1 regression: the second-extension option's block
    cost is a SUM of per-pair gammas; samples just below the 2^30
    per-sample guard produce ~2^61 gammas whose int64 sum wraps
    negative, making argmin pick SE and the writer allocate a
    negative-size array. float32 values in [0.5, 2.0) — a common
    normalized-data range — have bit patterns exactly in that band.
    The cost must be computed in Python ints (clamped), so encode
    succeeds and round-trips."""
    from netcdf4_variable_streamer_spark.sources.szip import (
        szip_decode,
        szip_encode,
    )

    rng = np.random.RandomState(7)
    f = rng.uniform(0.5, 2.0, 32).astype(np.float32)
    samples = f.view(np.uint32)
    assert int(samples.max()) < 1 << 30  # inside the per-gamma guard
    s = szip_encode(
        samples, nbits=32, pixels_per_block=8,
        pixels_per_scanline=32, nn=False,
    )
    assert szip_decode(
        s, 32, nbits=32, pixels_per_block=8,
        pixels_per_scanline=32, nn=False,
    ) == list(samples)


def test_deflate_record_chunks_szip_fletcher_refused():
    """ADVICE r12 #2 regression: the two-phase distributed writer's
    phase-1 chunk sizer shares _write_dataset's loud szip+fletcher32
    refusal instead of appending checksum bytes the codec then
    rejects with a misleading whole-block error (or silently sizing a
    file phase 2a will refuse)."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        _deflate_record_chunks,
    )

    block = np.arange(64, dtype=np.int32).reshape(4, 16)
    with pytest.raises(ValueError, match="szip with fletcher32"):
        list(
            _deflate_record_chunks(
                block, "<i4", 6, False, fletcher=True,
                szip={"pixels_per_block": 16},
            )
        )


def test_szip_golden_zero_block_reference():
    """Round 13 (VERDICT r12 #3): a ZERO-BLOCK ID in a reference
    block — the shape a real szip/libaec file emits for constant
    data — decodes per the CCSDS low-entropy layout: 3-bit ID 0,
    1-bit selector 0, the raw reference sample, then the FS run
    codeword; the reference block's J-1 coded samples are zero, so
    every sample equals the reference."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    # one 8-sample NN interval, ref=5, run=1 (fsv 0 -> '1')
    stream = _bits("000" + "0" + format(5, "08b") + "1")
    got = szip_decode(
        stream, 8, nbits=8, pixels_per_block=8,
        pixels_per_scanline=8, nn=True,
    )
    assert got == [5] * 8


def test_szip_golden_zero_run_from_reference():
    """A zero-block RUN that starts at the reference block spans the
    following all-zero blocks too: 4 blocks of 4, run codeword
    fsv=3 -> run 4, all 16 samples equal the reference."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    stream = _bits("000" + "0" + format(77, "08b") + _fs(3))
    got = szip_decode(
        stream, 16, nbits=8, pixels_per_block=4,
        pixels_per_scanline=16, nn=True,
    )
    assert got == [77] * 16


def test_szip_golden_second_extension_reference():
    """SECOND EXTENSION in a reference block: the pair grid starts at
    the reference's slot, so the first gamma encodes the dummy pair
    (0, delta_1) and contributes only delta_1; J/2 gammas cover the
    J-1 coded samples. Expected samples computed by hand through the
    NN unmap chain."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    # ref=10, deltas [2,0,4,1,0,2,3] -> pairs (0,2)(0,4)(1,0)(2,3)
    # gammas g(a,b) = (a+b)(a+b+1)/2 + b = 5, 14, 1, 18
    stream = _bits(
        "000" + "1" + format(10, "08b")
        + _fs(5) + _fs(14) + _fs(1) + _fs(18)
    )
    got = szip_decode(
        stream, 8, nbits=8, pixels_per_block=8,
        pixels_per_scanline=8, nn=True,
    )
    # unmap by hand: 10 +1 +0 +2 -1 +0 +1 -2
    assert got == [10, 11, 11, 13, 12, 12, 13, 11]


def test_szip_golden_se_reference_then_normal_block():
    """A low-entropy reference block followed by a normal FS block in
    the same interval: the reader resumes the standard per-block loop
    after the irregular first block."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    # J=4, pps=8: block 0 codes 3 samples (SE: 2 gammas, first
    # contributes only delta_1), block 1 codes 4 via FS (id 1, k=0)
    stream = _bits(
        "000" + "1" + format(100, "08b") + _fs(5) + _fs(14)  # [2,0,4]
        + "001" + _fs(1) + _fs(0) + _fs(2) + _fs(3)  # [1,0,2,3]
    )
    got = szip_decode(
        stream, 8, nbits=8, pixels_per_block=4,
        pixels_per_scanline=8, nn=True,
    )
    # 100 +1 +0 +2 -1 +0 +1 -2
    assert got == [100, 101, 101, 103, 102, 102, 103, 101]


def test_szip_se_reference_truncated_payload_refuses():
    """A second-extension reference block whose gamma payload is cut
    short refuses loudly instead of decoding garbage."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    stream = _bits("000" + "1" + format(10, "08b") + _fs(5))
    with pytest.raises(ValueError, match="truncated"):
        szip_decode(
            stream, 8, nbits=8, pixels_per_block=8,
            pixels_per_scanline=8, nn=True,
        )


def _unmap_nn_independent(ref: int, deltas, nbits: int) -> list[int]:
    """Independent CCSDS unit-delay unmap for golden expectations —
    deliberately NOT the module's implementation."""
    xmax = (1 << nbits) - 1
    out = [ref]
    pred = ref
    for delta in deltas:
        theta = min(pred, xmax - pred)
        if delta <= 2 * theta:
            d = delta // 2 if delta % 2 == 0 else -((delta + 1) // 2)
        else:
            mag = delta - theta
            d = mag if pred <= xmax - pred else -mag
        pred += d
        assert 0 <= pred <= xmax
        out.append(pred)
    return out


@settings(max_examples=60, deadline=None)
@given(
    ref=st.integers(0, 255),
    deltas=st.lists(st.integers(0, 3), min_size=7, max_size=7),
    zero=st.booleans(),
)
def test_szip_low_entropy_reference_hypothesis(ref, deltas, zero):
    """Fuzz round 6: low-entropy reference blocks assembled with the
    INDEPENDENT bit-string assembler decode to the independently
    unmapped samples — zero-block (deltas forced to 0) and
    second-extension (dummy-paired first gamma) shapes, arbitrary
    reference values."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    if zero:
        deltas = [0] * 7
        payload = "1"  # run 1 (fsv 0)
        sel = "0"
    else:
        pairs = [(0, deltas[0])] + [
            (deltas[i], deltas[i + 1]) for i in (1, 3, 5)
        ]
        payload = "".join(
            _fs((a + b) * (a + b + 1) // 2 + b) for a, b in pairs
        )
        sel = "1"
    # a delta can step below 0 — only decode when the walk stays in
    # range (the loud out-of-range case is pinned separately)
    xmax = 255
    pred, ok = ref, True
    for d in deltas:
        theta = min(pred, xmax - pred)
        if d <= 2 * theta:
            step = d // 2 if d % 2 == 0 else -((d + 1) // 2)
        else:
            step = (d - theta) if pred <= xmax - pred else -(d - theta)
        pred += step
        if not 0 <= pred <= xmax:
            ok = False
            break
    if not ok:
        return
    stream = _bits("000" + sel + format(ref, "08b") + payload)
    got = szip_decode(
        stream, 8, nbits=8, pixels_per_block=8,
        pixels_per_scanline=8, nn=True,
    )
    assert got == _unmap_nn_independent(ref, deltas, 8)


def test_szip_se_reference_out_of_range_refuses():
    """A second-extension reference block whose decoded delta walks
    the sample out of [0, 2^n) refuses loudly (the NN unmap range
    guard), never returns garbage."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    # ref=0 -> theta=0; any odd delta steps negative. gamma for the
    # dummy pair (0, 305): (305*306)/2 + 305
    g = 305 * 306 // 2 + 305
    stream = _bits(
        "000" + "1" + format(0, "08b") + _fs(g) + _fs(0) * 3
    )
    with pytest.raises(ValueError, match="left the sample range"):
        szip_decode(
            stream, 8, nbits=8, pixels_per_block=8,
            pixels_per_scanline=8, nn=True,
        )


def test_foreign_compound_versions_with_ref_member():
    """Fuzz round 6: v2 and v3 compound datatype messages (foreign
    writers — this writer emits v1) with a class-7 object-reference
    member parse to the same dtype + ref_members marker; a v3 message
    mixing ref, vlen-str and fixed members parses all three."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        _dt_vlen_str,
        _parse_dt,
    )

    i4 = struct.pack("<B3BIHH", 0x10, 0x08, 0, 0, 4, 0, 32)
    ref = struct.pack("<B3BI", 0x17, 0, 0, 0, 8)

    def member_v2(name, off, dtbody):
        nb = name.encode() + b"\x00"
        return (
            nb + b"\x00" * (-len(nb) % 8)
            + struct.pack("<I", off) + dtbody
        )

    def member_v3(name, off, dtbody):
        # compact name, minimal-width offset (1 byte for size < 256)
        return name.encode() + b"\x00" + bytes([off]) + dtbody

    body2 = struct.pack("<BBBBI", 0x26, 2, 0, 0, 12)
    body2 += member_v2("ok", 0, i4) + member_v2("ptr", 4, ref)
    dt2 = _parse_dt(body2)
    assert dt2.metadata["ref_members"] == ("ptr",)
    assert dt2.fields["ptr"][0] == np.dtype("<u8")

    body3 = struct.pack("<BBBBI", 0x36, 3, 0, 0, 28)
    body3 += member_v3("a", 0, i4)
    body3 += member_v3("p", 4, ref)
    body3 += member_v3("s", 12, _dt_vlen_str())
    dt3 = _parse_dt(body3)
    assert dt3.metadata["ref_members"] == ("p",)
    assert dt3.metadata["vlen_str_members"] == ("s",)
    assert dt3.names == ("a", "p", "s")


def test_ea_direct_paged_block_probe(tmp_path, monkeypatch):
    """Fuzz round 6: the documented direct-paged assumption probed.
    With shrunken page geometry (4-element pages < 16-element direct
    blocks) the extensible array emits PAGED data blocks addressed
    DIRECTLY from the index block — the layout libhdf5's defaults
    never produce. The reader treats every page of such a block as
    initialized (no EASB bitmap exists for it); the probe verifies
    (a) the honest half: a full round-trip through the shrunken
    geometry, and (b) the loudness half: a flipped byte inside one
    page of a DIRECT data block still fails that page's checksum."""
    import netcdf4_variable_streamer_spark.sources.hdf5lite as hl

    monkeypatch.setattr(hl, "_EA_PAGE_BITS", 2)  # 4-element pages
    n = 200
    v = (np.arange(n, dtype=np.int32) * 3 % 997).reshape(n, 1)
    p = os.path.join(tmp_path, "ea_direct_paged.h5")
    hl.write_hdf5(
        p, {"v": v}, {"v": {"chunk": (1, 1), "maxshape": (None, 1)}},
        libver="latest",
    )
    h = hl.HDF5File(p)
    assert h.datasets["v"].chunk_index == "ea"
    np.testing.assert_array_equal(h.read("v"), v)
    np.testing.assert_array_equal(h.read_slab0("v", 3, 9), v[3:9])
    # chunk 5 lives in the FIRST direct data block (16 elements,
    # now 4 pages); flip a byte of its stored address
    chunks = list(h._iter_chunks(h.datasets["v"]))
    assert len(chunks) == n
    needle = struct.pack("<Q", chunks[5][2])
    del h
    buf = bytearray(open(p, "rb").read())
    hit = buf.rfind(needle)
    assert hit > 0
    buf[hit + 1] ^= 0x10
    p2 = os.path.join(tmp_path, "ea_direct_paged_corrupt.h5")
    open(p2, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="page checksum mismatch"):
        hl.HDF5File(p2).read("v")


def test_szip_encode_block_low_entropy_ref_guard():
    """ADVICE r13 #1 regression: _encode_block must refuse loudly if a
    future change arms low-entropy encoding for a reference block —
    the ID-then-reference bit order it emits for normal options would
    disagree with the selector-BEFORE-reference layout the decoder
    (and libaec) parse for option 0, and the SE pair grid of a
    reference block needs the zero-dummy slot-0 padding this writer
    does not produce. Today allow_low is False whenever ref is not
    None, so this guard is the only thing standing between a future
    allow_low change and silently misparseable bytes."""
    from netcdf4_variable_streamer_spark.sources.szip import (
        _BitWriter,
        _encode_block,
        _id_bits,
    )

    vals = np.zeros(8, dtype=np.int64)  # SE wins: F+5 bits < F+8 FS
    w = _BitWriter()
    with pytest.raises(ValueError, match="reference block"):
        _encode_block(w, vals, 8, _id_bits(8), allow_low=True, ref=3)
    # the real reference path (allow_low=False) is unaffected
    _encode_block(w, vals, 8, _id_bits(8), allow_low=False, ref=3)


def test_szip_zero_run_reference_segment_boundary():
    """Fuzz round 7 (VERDICT r13 #5): a remainder-of-segment zero run
    STARTING AT a low-entropy reference block must stop at the
    64-block segment boundary, with the second segment carrying its
    own codewords — J=2 / 80 blocks puts the boundary strictly inside
    the interval. The writer never starts a run at the reference
    block; the decoder accepts the shape a real libaec stream can
    take."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    # segment 1: ref block + ROS (blocks 0..63); segment 2: ROS again
    stream = _bits(
        "000" + "0" + format(200, "08b") + _fs(4)  # _ROS
        + "000" + "0" + _fs(4)
    )
    got = szip_decode(
        stream, 160, nbits=8, pixels_per_block=2,
        pixels_per_scanline=160, nn=True,
    )
    assert got == [200] * 160


def test_szip_zero_run_reference_short_then_fs_at_boundary():
    """Fuzz round 7: a PLAIN (non-ROS) zero run from the reference
    block ending one block short of the segment boundary, a normal FS
    block AS the segment's last block, then a second-segment ROS run
    — the irregular first block, the explicit run-length path, and
    the boundary re-sync composed in one interval."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    ref = 50
    # run 63 covers blocks 0..62 (fsv == run for run >= 5);
    # block 63 is FS k=0 with mapped deltas [2, 4]; blocks 64..79 ROS
    stream = _bits(
        "000" + "0" + format(ref, "08b") + _fs(63)
        + "001" + _fs(2) + _fs(4)
        + "000" + "0" + _fs(4)
    )
    got = szip_decode(
        stream, 160, nbits=8, pixels_per_block=2,
        pixels_per_scanline=160, nn=True,
    )
    deltas = [0] * 125 + [2, 4] + [0] * 32
    assert got == _unmap_nn_independent(ref, deltas, 8)


@pytest.mark.parametrize(
    "J", [2, 16, 32], ids=["J2-single-gamma", "J16", "J32-max"]
)
def test_szip_se_reference_edge_geometries(J):
    """Fuzz round 7: SECOND-EXTENSION reference blocks at the J edge
    geometries — J=2 (the pair grid degenerates to ONE gamma whose
    first element is the spec's zero dummy, so it contributes exactly
    one sample), J=16 and J=32 (the largest legal block). Expected
    samples come from the independent unit-delay unmap, not the
    module under test."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    ref = 100
    deltas = [(3 + 5 * i) % 7 for i in range(J - 1)]
    pairs = [(0, deltas[0])] + [
        (deltas[i], deltas[i + 1]) for i in range(1, J - 2, 2)
    ]
    assert len(pairs) == J // 2
    payload = "".join(
        _fs((a + b) * (a + b + 1) // 2 + b) for a, b in pairs
    )
    stream = _bits("000" + "1" + format(ref, "08b") + payload)
    got = szip_decode(
        stream, J, nbits=8, pixels_per_block=J,
        pixels_per_scanline=J, nn=True,
    )
    assert got == _unmap_nn_independent(ref, deltas, 8)


def test_compound_regref_members_multi_gcol_filtered(tmp_path):
    """Fuzz round 7: region-reference member cells spilling across
    MULTIPLE 4096-byte global-heap collections (600 serialized
    hyperslab payloads cannot fit one GCOL), under the full filter
    stack (shuffle + deflate + Fletcher-32) on the compound dataset.
    Every heap pointer must resolve to its own selection; slab reads
    prune chunks AND heap parses."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    n = 600
    dt = np.dtype(
        [("wid", "<i4"), ("win", object)],
        metadata={"regref_members": ("win",)},
    )
    a = np.zeros(n, dt)
    a["wid"] = np.arange(n)
    a["win"] = [
        None if i % 97 == 0
        else ("grid", [((i % 50, i % 50 + 3),)])
        for i in range(n)
    ]
    p = os.path.join(tmp_path, "regref_gcol.h5")
    write_hdf5(
        p,
        {"grid": np.arange(60, dtype=np.int64) * 7, "obs": a},
        {"obs": {"chunk": (64,), "compress": 6, "shuffle": True,
                 "fletcher32": True}},
    )
    # multiple collections actually exist on disk
    raw = open(p, "rb").read()
    assert raw.count(b"GCOL") >= 2, raw.count(b"GCOL")
    h = HDF5File(p)
    r = h.read("obs")
    assert list(r["wid"]) == list(range(n))
    for i in (1, 97 * 2, 311, n - 1):
        if i % 97 == 0:
            assert r["win"][i] is None
        else:
            lo = i % 50
            assert str(r["win"][i]) == f"grid[{lo}:{lo + 3}]"
            np.testing.assert_array_equal(
                h.read_region(r["win"][i]),
                np.arange(lo, lo + 3, dtype=np.int64) * 7,
            )
    sl = h.read_slab0("obs", 128, 192)
    assert list(sl["wid"]) == list(range(128, 192))
    assert str(sl["win"][0]) == "grid[28:31]"


def test_compound_mixed_ref_regref_string_members(tmp_path):
    """Fuzz round 7: NC_STRING + object-reference + region-reference
    members in ONE compound type — the three heap-backed member
    classes the writer supports separately, proven composed: the
    datatype message carries class-9 AND both class-7 flavors, all
    three markers survive the round trip, and every member resolves
    independently (slab reads included)."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    dt = np.dtype(
        [("sid", "<i4"), ("name", object), ("target", object),
         ("win", object)],
        metadata={"ref_members": ("target",),
                  "regref_members": ("win",)},
    )
    a = np.zeros(4, dt)
    a["sid"] = [1, 2, 3, 4]
    a["name"] = ["alpha", None, "gamma", "delta"]
    a["target"] = ["base", None, "g/press", "base"]
    a["win"] = [
        ("base", [((0, 2),)]),
        None,
        ("base", "all"),
        ("g/press", [((1, 2),)]),
    ]
    for libver in ("earliest", "latest"):
        p = os.path.join(tmp_path, f"mixed_{libver}.h5")
        write_hdf5(
            p,
            {"base": np.arange(5, dtype=np.int16),
             "g/press": np.arange(3, dtype=np.float32) * 0.5,
             "obs": a},
            {"obs": {"chunk": (2,), "compress": 4}},
            libver=libver,
        )
        h = HDF5File(p)
        r = h.read("obs")
        md = r.dtype.metadata
        assert md["vlen_str_members"] == ("name",)
        assert md["ref_members"] == ("target",)
        assert md["regref_members"] == ("win",)
        assert list(r["name"]) == ["alpha", "", "gamma", "delta"]
        assert list(r["target"]) == ["base", None, "g/press", "base"]
        wins = [None if w is None else str(w) for w in r["win"]]
        assert wins == ["base[0:2]", None, "base[...]", "g/press[1:2]"]
        np.testing.assert_array_equal(
            h.read_region(r["win"][0]), np.arange(2, dtype=np.int16)
        )
        sl = h.read_slab0("obs", 2, 4)
        assert list(sl["target"]) == ["g/press", "base"]
        assert str(sl["win"][1]) == "g/press[1:2]"


def test_szip_zero_run_crossing_segment_refuses():
    """Fuzz round 7 regression (found by this round's boundary
    probes): a PLAIN zero-run codeword whose length crosses the
    64-block segment boundary is malformed — libaec interprets run
    lengths within the segment, so decoding it would silently
    desynchronize. Both the long-form (fsv >= 5) and short-form
    (fsv <= 3 near the boundary) crossings refuse by name; a run
    overrunning the whole interval stays loud too."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    # J=2, 80 blocks: plain run 70 at block 0 crosses the boundary 64
    stream = _bits("000" + "0" + format(9, "08b") + _fs(70))
    with pytest.raises(ValueError, match="crosses the segment"):
        szip_decode(
            stream, 160, nbits=8, pixels_per_block=2,
            pixels_per_scanline=160, nn=True,
        )
    # short-form: run 63 to block 62, FS block 63... then at block 64
    # a run of 4 (fsv 3) inside segment 2 is fine — but a 63-block
    # run followed by fsv=3 AT block 63 would cross: blocks 63..66
    stream = _bits(
        "000" + "0" + format(9, "08b") + _fs(62)  # blocks 0..61
        + "000" + "0" + _fs(3)  # blocks 62..65 — crosses 64
    )
    with pytest.raises(ValueError, match="crosses the segment"):
        szip_decode(
            stream, 160, nbits=8, pixels_per_block=2,
            pixels_per_scanline=160, nn=True,
        )
    # interval overrun in the FINAL (short) segment is also loud
    stream = _bits("000" + "0" + format(9, "08b") + _fs(10))
    with pytest.raises(ValueError, match="crosses the segment"):
        szip_decode(
            stream, 16, nbits=8, pixels_per_block=2,
            pixels_per_scanline=16, nn=True,
        )


def test_szip_low_entropy_reference_wide_samples():
    """Fuzz round 7: the low-entropy reference-block layout at the
    16- and 32-bit sample widths — the ID field widens (4 and 5
    bits) and the raw reference occupies the full sample width, but
    the selector-before-reference order is unchanged. Goldens pin a
    zero-block reference and an SE reference at 16 bits and a
    zero-block reference at 32 bits (ref above 2^31 exercises the
    unsigned width)."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    stream = _bits("0000" + "0" + format(40000, "016b") + "1")
    got = szip_decode(
        stream, 8, nbits=16, pixels_per_block=8,
        pixels_per_scanline=8, nn=True,
    )
    assert got == [40000] * 8

    g = lambda a, b: (a + b) * (a + b + 1) // 2 + b  # noqa: E731
    stream = _bits(
        "0000" + "1" + format(1000, "016b")
        + _fs(g(0, 2)) + _fs(g(0, 4)) + _fs(g(1, 0)) + _fs(g(2, 3))
    )
    got = szip_decode(
        stream, 8, nbits=16, pixels_per_block=8,
        pixels_per_scanline=8, nn=True,
    )
    assert got == _unmap_nn_independent(1000, [2, 0, 4, 1, 0, 2, 3], 16)

    stream = _bits(
        "00000" + "0" + format(3_000_000_000, "032b") + "1"
    )
    got = szip_decode(
        stream, 8, nbits=32, pixels_per_block=8,
        pixels_per_scanline=8, nn=True,
    )
    assert got == [3_000_000_000] * 8


def test_szip_ec_mode_out_of_range_refuses():
    """Fuzz round 7 regression (found by this round's EC-mode probe):
    entropy-coded (non-NN) streams have no NN-unmap range guard, and
    FS / k-split / second-extension codewords are unbounded — a
    corrupt stream used to decode samples past 2^nbits, which
    szip_h5_decode's astype then silently WRAPPED into wrong data
    (403 -> 147 at 8 bits). Both shapes now refuse loudly; in-range
    EC streams still decode."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    # FS block with a raw value 300 > 255 at nbits=8
    stream = _bits("001" + _fs(300) + _fs(0) * 7)
    with pytest.raises(ValueError, match="left the 8-bit"):
        szip_decode(
            stream, 8, nbits=8, pixels_per_block=8,
            pixels_per_scanline=8, nn=False,
        )
    # k-split (k=2): hi=100 -> (100<<2)|3 = 403 > 255
    stream = _bits("011" + (_fs(100) + _fs(0) * 7) + "11" + "00" * 7)
    with pytest.raises(ValueError, match="left the 8-bit"):
        szip_decode(
            stream, 8, nbits=8, pixels_per_block=8,
            pixels_per_scanline=8, nn=False,
        )
    # an in-range EC stream still decodes: FS values [250, 0 x7]
    stream = _bits("001" + _fs(250) + _fs(0) * 7)
    got = szip_decode(
        stream, 8, nbits=8, pixels_per_block=8,
        pixels_per_scanline=8, nn=False,
    )
    assert got == [250, 0, 0, 0, 0, 0, 0, 0]


def test_compound_bigendian_members_roundtrip(tmp_path):
    """Fuzz round 7: per-member byte order inside compounds — a
    foreign writer (or nc_def_var_endian) may mark individual members
    big-endian. Signed/unsigned/float members at >i4 / >u2 widths
    round-trip exactly (incl. INT32_MIN and the u2 max), the reader
    normalizes to little-endian, and a big-endian member composes
    with heap-backed string + object-reference members in the same
    compound."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    dt = np.dtype([("a", ">i4"), ("b", "<f8"), ("c", ">u2")])
    arr = np.zeros(5, dt)
    arr["a"] = [-3, 7, 2**30, -(2**31), 0]
    arr["b"] = [0.5, -1.25, 3e9, 0.0, -0.0]
    arr["c"] = [1, 65535, 256, 0, 513]
    p = os.path.join(tmp_path, "be_comp.h5")
    write_hdf5(p, {"obs": arr}, {"obs": {"chunk": (2,), "compress": 4}})
    r = HDF5File(p).read("obs")
    assert r.dtype == np.dtype(
        [("a", "<i4"), ("b", "<f8"), ("c", "<u2")]
    )
    for name in ("a", "b", "c"):
        np.testing.assert_array_equal(r[name], arr[name])

    dt2 = np.dtype(
        [("a", ">i4"), ("name", object), ("t", object)],
        metadata={"ref_members": ("t",)},
    )
    a2 = np.zeros(3, dt2)
    a2["a"] = [-3, 2**30, 5]
    a2["name"] = ["x", None, "zz"]
    a2["t"] = ["base", None, "base"]
    p2 = os.path.join(tmp_path, "be_mix.h5")
    write_hdf5(p2, {"base": np.arange(2, dtype=np.int8), "obs": a2}, {})
    r2 = HDF5File(p2).read("obs")
    assert list(r2["a"]) == [-3, 2**30, 5]
    assert list(r2["name"]) == ["x", "", "zz"]
    assert list(r2["t"]) == ["base", None, "base"]


# ---------------------------------------------------------------------------
# Fuzz round 8 (VERDICT r14 #6): wide-sample SE reference blocks,
# big-endian FOREIGN compound messages, zero-run + low-entropy-
# reference composition across RSI boundaries, and the NN range guard
# reached THROUGH a low-entropy reference block at wide widths.
# ---------------------------------------------------------------------------


def test_szip_se_reference_wide32():
    """Fuzz round 8: the SECOND-EXTENSION reference layout at the
    32-bit sample width — the widest ID field (5 bits) composed with
    the selector-before-reference order and the slot-0 dummy of the
    pair grid, with the raw reference above 2^31 so the full unsigned
    width is exercised. r14 pinned only the zero-block reference at
    32 bits; this closes the SE half."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    ref = 3_000_000_001
    deltas = [2, 0, 4, 1, 0, 2, 3]
    pairs = [(0, deltas[0])] + [
        (deltas[i], deltas[i + 1]) for i in range(1, 6, 2)
    ]
    payload = "".join(
        _fs((a + b) * (a + b + 1) // 2 + b) for a, b in pairs
    )
    stream = _bits("00000" + "1" + format(ref, "032b") + payload)
    got = szip_decode(
        stream, 8, nbits=32, pixels_per_block=8,
        pixels_per_scanline=8, nn=True,
    )
    assert got == _unmap_nn_independent(ref, deltas, 32)


def test_szip_low_entropy_ref_then_out_of_range_refuses():
    """Fuzz round 8: the NN unmap range guard reached THROUGH a
    low-entropy reference block at the 16-bit width — block 0 is a
    zero-run reference (run 1), block 1 a k=13 split whose first
    sample decodes to delta 65536; the unmap must refuse (the sample
    leaves the 16-bit range) rather than hand a wrapped value to the
    HDF5 layer's astype. The in-range twin of the same stream shape
    decodes exactly."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    ref = 100
    head = "0000" + "0" + format(ref, "016b") + _fs(0)  # run 1
    # block 1: ID 14 -> k = 13; hi FS values then 13-bit low fields
    bad = head + "1110" + _fs(8) + _fs(0) * 7 + "0" * 13 * 8
    with pytest.raises(ValueError, match="left the sample range"):
        szip_decode(
            _bits(bad), 16, nbits=16, pixels_per_block=8,
            pixels_per_scanline=16, nn=True,
        )
    ok = head + "1110" + _fs(4) + _fs(0) * 7 + "0" * 13 * 8
    got = szip_decode(
        _bits(ok), 16, nbits=16, pixels_per_block=8,
        pixels_per_scanline=16, nn=True,
    )
    deltas = [0] * 7 + [4 << 13] + [0] * 7
    assert got == _unmap_nn_independent(ref, deltas, 16)


def test_szip_multi_rsi_low_entropy_composition():
    """Fuzz round 8: zero-run + low-entropy-reference composition at
    the RSI boundary — scanline 1 is entirely a zero-run REFERENCE
    block (ROS codeword), scanline 2 opens with a second-extension
    reference and closes with a plain zero run. The decoder must
    restart the reference, the segment counter AND the block grid at
    the scanline boundary; a desync here would corrupt every later
    scanline of the chunk."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    # RSI 1 (16 samples, J=2, 8 blocks): zero-run ref, ROS
    rsi1 = "000" + "0" + format(7, "08b") + _fs(4)
    # RSI 2: SE ref (one gamma, slot-0 dummy) then zero run of 7
    rsi2 = (
        "000" + "1" + format(9, "08b") + _fs(3 * 4 // 2 + 3)
        + "000" + "0" + _fs(7)
    )
    got = szip_decode(
        _bits(rsi1 + rsi2), 32, nbits=8, pixels_per_block=2,
        pixels_per_scanline=16, nn=True,
    )
    want = [7] * 16 + _unmap_nn_independent(9, [3] + [0] * 14, 8)
    assert got == want


def test_foreign_compound_bigendian_members_v2_v3():
    """Fuzz round 8: BIG-ENDIAN members inside v2 and v3 compound
    datatype messages — the foreign-writer shapes (this writer emits
    v1) composed with the byte-order bit r14 pinned only through the
    v1 path. A v2 compound with a >i4 member and a v3 compound mixing
    >i4, >f8, a vlen-string and an object-reference member must parse
    to big-endian numpy dtypes with the heap-member markers intact."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        _dt_vlen_str,
        _parse_dt,
    )

    i4be = struct.pack("<B3BIHH", 0x10, 0x08 | 0x01, 0, 0, 4, 0, 32)
    u2be = struct.pack("<B3BIHH", 0x10, 0x01, 0, 0, 2, 0, 16)
    f8be = struct.pack("<B3BI", 0x11, 0x01, 0, 0, 8) + b"\x00" * 12
    ref = struct.pack("<B3BI", 0x17, 0, 0, 0, 8)

    def member_v2(name, off, dtbody):
        nb = name.encode() + b"\x00"
        return (
            nb + b"\x00" * (-len(nb) % 8)
            + struct.pack("<I", off) + dtbody
        )

    def member_v3(name, off, dtbody):
        return name.encode() + b"\x00" + bytes([off]) + dtbody

    body2 = struct.pack("<BBBBI", 0x26, 2, 0, 0, 8)
    body2 += member_v2("a", 0, i4be) + member_v2("c", 4, u2be)
    dt2 = _parse_dt(body2)
    assert dt2.fields["a"][0] == np.dtype(">i4")
    assert dt2.fields["c"][0] == np.dtype(">u2")

    body3 = struct.pack("<BBBBI", 0x36, 4, 0, 0, 36)
    body3 += member_v3("a", 0, i4be)
    body3 += member_v3("x", 4, f8be)
    body3 += member_v3("s", 12, _dt_vlen_str())
    body3 += member_v3("p", 28, ref)
    dt3 = _parse_dt(body3)
    assert dt3.names == ("a", "x", "s", "p")
    assert dt3.fields["a"][0] == np.dtype(">i4")
    assert dt3.fields["x"][0] == np.dtype(">f8")
    assert dt3.metadata["vlen_str_members"] == ("s",)
    assert dt3.metadata["ref_members"] == ("p",)


def test_foreign_file_v3_compound_bigendian(tmp_path, monkeypatch):
    """Fuzz round 8, file-level half of the BE-foreign-compound probe:
    the message-parse test above checks _parse_dt in isolation; here a
    whole FILE is written with the writer's compound emitter swapped
    for a v3-emitting variant (compact names, minimal-width offsets —
    the libver-latest shape a foreign writer produces) carrying
    big-endian members, then read back through the untouched reader
    stack — object-header walk, chunk B-tree, shuffle+deflate filters
    and the member-wise byte-order normalization all composed."""
    import netcdf4_variable_streamer_spark.sources.hdf5lite as hl

    def dt_compound_v3(dtype):
        names = dtype.names or ()
        assert dtype.itemsize < 256  # 1-byte v3 offsets suffice here
        body = b""
        for n in names:
            fdt, off = dtype.fields[n][0], dtype.fields[n][1]
            body += n.encode() + b"\x00" + bytes([off])
            body += hl._dt_body(fdt)
        return struct.pack(
            "<BBBBI", 0x36, len(names) & 0xFF,
            (len(names) >> 8) & 0xFF, 0, dtype.itemsize,
        ) + body

    monkeypatch.setattr(hl, "_dt_compound", dt_compound_v3)
    dt = np.dtype([("a", ">i4"), ("b", "<f8"), ("c", ">u2")])
    arr = np.zeros(5, dt)
    arr["a"] = [-3, 7, 2**30, -(2**31), 0]
    arr["b"] = [0.5, -1.25, 3e9, 0.0, -0.0]
    arr["c"] = [1, 65535, 256, 0, 513]
    p = os.path.join(tmp_path, "v3_be_comp.h5")
    hl.write_hdf5(
        p, {"obs": arr}, {"obs": {"chunk": (2,), "compress": 4}}
    )
    r = hl.HDF5File(p).read("obs")
    assert r.dtype == np.dtype(
        [("a", "<i4"), ("b", "<f8"), ("c", "<u2")]
    )
    for name in ("a", "b", "c"):
        np.testing.assert_array_equal(r[name], arr[name])


@_SETTINGS
@given(
    data=st.binary(min_size=0, max_size=256),
    nbits=st.sampled_from([8, 16]),
    J=st.sampled_from([2, 8]),
)
def test_szip_decode_random_bytes_never_crash(data, nbits, J):
    """Fuzz round 8 robustness sweep: szip_decode over arbitrary
    bytes must either refuse with ValueError or return EXACTLY n
    in-range samples — never raise any other exception class, never
    return a wrong-length or out-of-range result (the two silent
    failure shapes the r14 refusal guards closed, now swept instead
    of only golden-pinned). Both NN and EC modes."""
    from netcdf4_variable_streamer_spark.sources.szip import szip_decode

    n = 32
    for nn in (True, False):
        try:
            got = szip_decode(
                data, n, nbits=nbits, pixels_per_block=J,
                pixels_per_scanline=16, nn=nn,
            )
        except ValueError:
            continue
        assert len(got) == n
        assert all(0 <= v < (1 << nbits) for v in got)


@_SETTINGS
@given(
    flip=st.integers(min_value=0, max_value=10_000),
    nbits=st.sampled_from([8, 16]),
)
def test_szip_decode_bitflip_never_crash(flip, nbits):
    """Same sweep over MUTATED valid streams — a single bit flip in a
    real encoded stream lands in the decoder's most-reachable states
    (mid-codeword, mid-ID, mid-reference) that pure random bytes
    rarely hit. Decode must refuse with ValueError or produce exactly
    n in-range samples."""
    import numpy as np

    from netcdf4_variable_streamer_spark.sources.szip import (
        szip_decode,
        szip_encode,
    )

    n = 64
    rng = np.random.RandomState(7)
    samples = np.minimum(
        rng.randint(0, 6, n).cumsum() % ((1 << nbits) - 1), 200
    )
    enc = bytearray(
        szip_encode(
            samples, nbits=nbits, pixels_per_block=8,
            pixels_per_scanline=32, nn=True,
        )
    )
    assume(len(enc) > 0)
    pos = flip % (len(enc) * 8)
    enc[pos // 8] ^= 1 << (pos % 8)
    try:
        got = szip_decode(
            bytes(enc), n, nbits=nbits, pixels_per_block=8,
            pixels_per_scanline=32, nn=True,
        )
    except ValueError:
        return
    assert len(got) == n
    assert all(0 <= v < (1 << nbits) for v in got)


def test_hdf5_corrupt_link_name_no_unicode_crash(tmp_path):
    """Fuzz round 8 (whole-file corruption sweep finding): a bit flip
    inside a stored LINK NAME used to escape as UnicodeDecodeError
    from the strict utf-8 decode — now every name decode follows the
    codec's established ("utf-8", "replace") convention, so the file
    still opens, the corrupted name simply no longer matches, and the
    lookup misses with a clean KeyError while intact datasets read
    exactly."""
    import netcdf4_variable_streamer_spark.sources.hdf5lite as hl

    p = os.path.join(tmp_path, "t.h5")
    v = np.arange(12, dtype=np.int32).reshape(4, 3)
    hl.write_hdf5(p, {"zq": v, "ok": np.arange(5, dtype=np.int16)}, {})
    buf = bytearray(open(p, "rb").read())
    hit = buf.find(b"zq\x00")
    assert hit > 0
    buf[hit] = 0xF3  # invalid UTF-8 lead byte inside the name
    p2 = os.path.join(tmp_path, "c.h5")
    open(p2, "wb").write(bytes(buf))
    h = hl.HDF5File(p2)  # opening must not crash
    np.testing.assert_array_equal(
        h.read("ok"), np.arange(5, dtype=np.int16)
    )
    with pytest.raises(KeyError):
        h.read("zq")


@_SETTINGS
@given(flip=st.integers(min_value=0, max_value=10_000_000))
def test_hdf5_bitflip_refuses_cleanly(flip, tmp_path):
    """Whole-file single-bit corruption sweep: reading a mutated HDF5
    container must either succeed, refuse with ValueError (checksum/
    signature/structure guards), or miss a renamed object with
    KeyError — never any other exception class. The returned SHAPE is
    deliberately NOT pinned: v0 object headers carry no checksum, so
    a flip inside a dataspace dimension is undetectable in principle
    — the reader faithfully reports the corrupted extent (hypothesis
    found exactly that: a dim flip 20 -> 21 reads one extra record
    from the preallocated region). A 4000-case offline sweep ran
    clean on the exception-class contract before this bounded
    version was committed."""
    import netcdf4_variable_streamer_spark.sources.hdf5lite as hl

    p = os.path.join(tmp_path, "t.h5")
    v = (np.arange(60, dtype=np.int32) * 7 % 97).reshape(20, 3)
    hl.write_hdf5(
        p,
        {"v": v, "s": np.array([b"ab", b"cd"], dtype="S2")},
        {"v": {"chunk": (4, 3), "compress": 4}},
    )
    buf = bytearray(open(p, "rb").read())
    pos = flip % (len(buf) * 8)
    buf[pos // 8] ^= 1 << (pos % 8)
    p2 = os.path.join(tmp_path, "c.h5")
    open(p2, "wb").write(bytes(buf))
    try:
        h = hl.HDF5File(p2)
        h.read("v")
        h.read("s")
    except (ValueError, KeyError):
        pass


def test_netcdf3_negative_begin_refuses_both_paths(tmp_path):
    """Fuzz round 8 (whole-file corruption sweep finding): a
    sign-flipped NEGATIVE variable begin offset used to escape as
    OSError from read_fixed's seek — and, far worse, read_records'
    memmap path would have SILENTLY sliced from the file's END
    (Python negative-index semantics) and returned wrong data with no
    error. _check_span now refuses spans outside [0, filesize) on
    both paths."""
    from netcdf4_variable_streamer_spark.sources.netcdf3 import (
        NetCDF3File,
        write_netcdf3,
    )

    p = os.path.join(tmp_path, "t.nc")
    write_netcdf3(
        p, {"time": None, "x": 3},
        {"temp": ("float32", ("time", "x")), "base": ("int32", ("x",))},
        {"temp": np.arange(30, dtype="float32").reshape(10, 3),
         "base": np.array([1, 2, 3], dtype="int32")},
    )
    h = NetCDF3File(p)
    buf = bytearray(open(p, "rb").read())
    for var in ("base", "temp"):
        needle = struct.pack(">i", h.variables[var].begin)
        hit = buf.find(needle)
        assert hit > 0
        b2 = bytearray(buf)
        b2[hit] |= 0x80  # flip the sign bit of the begin offset
        p2 = os.path.join(tmp_path, f"neg_{var}.nc")
        open(p2, "wb").write(bytes(b2))
        h2 = NetCDF3File(p2)
        with pytest.raises(ValueError, match="outside the"):
            if var == "base":
                h2.read_fixed("base")
            else:
                h2.read_records("temp")


def test_netcdf3_corrupt_name_no_unicode_crash(tmp_path):
    """Sibling of the hdf5 link-name finding: a corrupt byte inside a
    stored NetCDF-3 variable name must surface as a lookup miss
    (KeyError), never escape as UnicodeDecodeError from a strict
    utf-8 decode."""
    from netcdf4_variable_streamer_spark.sources.netcdf3 import (
        NetCDF3File,
        write_netcdf3,
    )

    p = os.path.join(tmp_path, "t.nc")
    write_netcdf3(
        p, {"x": 3}, {"zq": ("int32", ("x",))},
        {"zq": np.array([1, 2, 3], dtype="int32")},
    )
    buf = bytearray(open(p, "rb").read())
    hit = buf.find(b"zq")
    assert hit > 0
    buf[hit] = 0xF3
    p2 = os.path.join(tmp_path, "c.nc")
    open(p2, "wb").write(bytes(buf))
    h = NetCDF3File(p2)  # header parse must not crash
    with pytest.raises(KeyError):
        h.read_fixed("zq")


@_SETTINGS
@given(flip=st.integers(min_value=0, max_value=10_000_000))
def test_netcdf3_bitflip_refuses_cleanly(flip, tmp_path):
    """Whole-file single-bit corruption sweep for the NetCDF-3 codec:
    reading a mutated file must succeed, refuse with ValueError, or
    miss a renamed variable with KeyError — never any other exception
    class. An 8000-case offline sweep ran clean before this bounded
    version was committed."""
    from netcdf4_variable_streamer_spark.sources.netcdf3 import (
        NetCDF3File,
        write_netcdf3,
    )

    p = os.path.join(tmp_path, "t.nc")
    write_netcdf3(
        p, {"time": None, "x": 3},
        {"temp": ("float32", ("time", "x")), "base": ("int32", ("x",))},
        {"temp": np.arange(30, dtype="float32").reshape(10, 3),
         "base": np.array([1, 2, 3], dtype="int32")},
    )
    buf = bytearray(open(p, "rb").read())
    pos = flip % (len(buf) * 8)
    buf[pos // 8] ^= 1 << (pos % 8)
    p2 = os.path.join(tmp_path, "c.nc")
    open(p2, "wb").write(bytes(buf))
    try:
        h = NetCDF3File(p2)
        h.read_fixed("base")
        list(h.read_records("temp"))
    except (ValueError, KeyError):
        pass


def test_multimodal_codecs_refuse_cleanly():
    """Fuzz round 8 (payload corruption sweep finding): the BMP / PPM
    / PNG / WAV decoders parse UNTRUSTED binary columns inside
    mapInPandas kernels — a truncated header used to escape as
    struct.error and a corrupt PNG deflate stream as zlib.error,
    opaque task-killers instead of the documented corrupt-payload
    ValueError. Deterministic worst offenders from the sweep, plus a
    400-case mutation spot-sweep per codec asserting only
    ValueError / NotImplementedError ever surface."""
    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    wav = mm.encode_wav_pcm16(
        rng.randint(-3000, 3000, 64).astype(np.int16)
    )
    png = mm.encode_png(img)
    # deterministic regressions: the exact shapes that leaked
    with pytest.raises(ValueError, match="truncated or corrupt BMP"):
        mm.decode_bmp(mm.encode_bmp(img)[:12])  # header cut short
    with pytest.raises(ValueError, match="truncated or corrupt WAV"):
        mm.decode_wav_pcm16(wav[:20])  # mid-fmt-chunk truncation
    bad_png = bytearray(png)
    bad_png[373 // 8 if len(png) > 47 else 40] ^= 0x20  # corrupt IDAT
    try:
        mm.decode_png(bytes(bad_png))
    except (ValueError, NotImplementedError):
        pass
    # mutation spot-sweep across all four codecs
    qoi = mm.encode_qoi(
        rng.randint(0, 256, size=(6, 5, 4), dtype=np.uint8)
    )
    gif = mm.encode_gif(
        (rng.randint(0, 5, size=(2, 8, 8, 3)) * 50).astype(np.uint8)
    )
    cases = [
        (mm.decode_bmp, mm.encode_bmp(img)),
        (mm.decode_ppm, mm.encode_ppm(img)),
        (mm.decode_png, png),
        (mm.decode_qoi, qoi),
        (mm.decode_gif, gif),
        (lambda b: mm.decode_wav_pcm16(b), wav),
    ]
    for dec, payload in cases:
        for _ in range(100):
            pos = rng.randint(0, len(payload) * 8)
            b2 = bytearray(payload)
            b2[pos // 8] ^= 1 << (pos % 8)
            try:
                dec(bytes(b2))
            except (ValueError, NotImplementedError):
                pass
            for n in (0, 7, len(payload) // 2):
                try:
                    dec(bytes(payload[:n]))
                except (ValueError, NotImplementedError):
                    pass


def test_netcdf3_torn_append_recovers(tmp_path):
    """Fuzz round 8: the publish-then-patch append invariant under a
    TORN append — a crash after the record bytes land but before the
    4-byte numrecs patch leaves orphan bytes past the declared count.
    A reader must see exactly the OLD records (never the orphans);
    a subsequent append must position at the declared count,
    OVERWRITE the orphan bytes, and leave the file byte-consistent
    with a never-crashed history."""
    from netcdf4_variable_streamer_spark.sources.netcdf3 import (
        NetCDF3File,
        append_records,
        write_netcdf3,
    )

    p = os.path.join(tmp_path, "t.nc")
    base = np.arange(9, dtype="int32").reshape(3, 3)
    write_netcdf3(
        p, {"time": None, "x": 3}, {"v": ("int32", ("time", "x"))},
        {"v": base},
    )
    # torn append: do a real append, then un-publish the count
    orphan = np.full((2, 3), 77, dtype="int32")
    append_records(p, {"v": orphan})
    buf = bytearray(open(p, "rb").read())
    buf[4:8] = struct.pack(">i", 3)  # crash before the patch
    open(p, "wb").write(bytes(buf))

    h = NetCDF3File(p)
    assert h.numrecs == 3
    np.testing.assert_array_equal(
        np.concatenate(list(h.read_records("v"))).reshape(3, 3), base
    )
    # recovery append overwrites the orphan region
    fresh = np.full((2, 3), 99, dtype="int32")
    assert append_records(p, {"v": fresh}) == 5
    h2 = NetCDF3File(p)
    got = np.asarray(list(h2.read_records("v"))).reshape(5, 3)
    np.testing.assert_array_equal(got[:3], base)
    np.testing.assert_array_equal(got[3:], fresh)
    assert not (got == 77).any()  # no orphan byte survived


def test_nc4_torn_append_recovers(tmp_path):
    """Fuzz round 8, HDF5-container twin of the torn-append test: a
    crash between pwrite_records_nc4 and _patch_extents leaves chunk
    bytes on disk past the published extent. Readers must see exactly
    the OLD records; a recovery append positions at the published
    extent, overwrites the orphan chunks, and the final file reads as
    a never-crashed history."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        NetCDF4View,
        append_records_nc4,
        create_netcdf4_tail,
        pwrite_records_nc4,
    )

    p = os.path.join(tmp_path, "t.nc4")
    base = np.arange(9, dtype="int32").reshape(3, 3)
    create_netcdf4_tail(
        p,
        dims={"time": None, "x": 3},
        variables={"v": ("int32", ("time", "x"))},
        capacity=16,
    )
    assert append_records_nc4(p, {"v": base}) == 3
    # the torn append: orphan chunk bytes land, extent never published
    pwrite_records_nc4(
        p, {"v": np.full((2, 3), 77, dtype="int32")}, 3
    )
    v = NetCDF4View(p)
    assert v.numrecs == 3
    np.testing.assert_array_equal(v.read_records("v", 0, 3), base)
    # recovery append overwrites the orphans
    fresh = np.full((2, 3), 99, dtype="int32")
    assert append_records_nc4(p, {"v": fresh}) == 5
    v2 = NetCDF4View(p)
    got = v2.read_records("v", 0, 5)
    np.testing.assert_array_equal(got[:3], base)
    np.testing.assert_array_equal(got[3:], fresh)
    assert not (got == 77).any()


def test_gif_bad_frame_geometry_refuses():
    """Round-15 self-review regressions: a GIF image descriptor
    placing a frame OUTSIDE the logical screen (or declaring an
    empty frame) used to escape as IndexError from the composition /
    deinterlace indexing — both now refuse with the codec's named
    ValueError; an in-bounds smaller frame at an offset still
    composes fine."""
    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    img = (np.arange(48, dtype=np.uint8) % 4).reshape(4, 4, 3) * 60
    payload = bytearray(mm.encode_gif(img))
    # image descriptor: find block 0x2C; its fw field is 4
    idx = payload.index(0x2C, 13)
    # oversize: fw = 9 > canvas width 4
    bad = bytearray(payload)
    struct.pack_into("<H", bad, idx + 5, 9)
    with pytest.raises(ValueError, match="outside the"):
        mm.decode_gif(bytes(bad))
    # empty: fh = 0
    bad = bytearray(payload)
    struct.pack_into("<H", bad, idx + 7, 0)
    with pytest.raises(ValueError, match="outside the"):
        mm.decode_gif(bytes(bad))


def test_wav_truncated_data_chunk_refuses():
    """Round-15 self-review regression: a PCM16 WAV whose data chunk
    declares more bytes than the payload carries used to silently
    return PARTIAL audio (np.frombuffer clamps); it now refuses —
    matching the G.711 branch added in the same round."""
    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    wav = mm.encode_wav_pcm16(
        np.arange(64, dtype=np.int16), sample_rate=8000
    )
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_wav_pcm16(wav[:100])


def test_image_codec_allocation_guards():
    """Round-15 resource guards: a tiny crafted payload must not be
    able to force a huge allocation — a 14-byte GIF header declaring
    a 65535x65535 canvas (a 12.9 GB np.zeros), a PNG IHDR declaring
    implausible dimensions, and a PNG zlib BOMB (a ~100 KB payload
    decompressing to 100 MB) all refuse by name before any large
    allocation; decompression is bounded to the header-declared pixel
    count."""
    import zlib

    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    hdr = (
        b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0)
        + b"\x3b"
    )
    with pytest.raises(ValueError, match="implausible"):
        mm.decode_gif(hdr)

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b))
        )

    bomb = zlib.compress(b"\x00" * 20_000_000)
    png = (
        mm._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="header declares"):
        mm.decode_png(png)

    png2 = (
        mm._PNG_SIG
        + chunk(
            b"IHDR",
            struct.pack(">IIBBBBB", 100000, 100000, 8, 2, 0, 0, 0),
        )
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="implausible"):
        mm.decode_png(png2)


# ---------------------------------------------------------------------------
# Fuzz round 9 (round 16): the three ADVICE r15 advisories plus the
# deferred-clear / code-width-cap edges of the new codecs.
# ---------------------------------------------------------------------------


def test_gif_gce_bad_size_refuses():
    """ADVICE r15: the transparent-color index lives at pos+sz only
    when the graphic-control sub-block size is exactly 4 — a corrupt
    in-bounds GCE with any other size used to silently misread WHICH
    palette index is transparent (wrong pixels, no error). It now
    refuses by name; the conformant sz=4 stream still decodes."""
    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    img = (np.arange(48, dtype=np.uint8) % 4).reshape(4, 4, 3) * 60
    payload = bytearray(mm.encode_gif(img))
    assert (mm.decode_gif(bytes(payload))[0] == img).all()
    # locate the GCE introducer 0x21 0xF9; the size byte follows
    i = payload.index(b"\x21\xf9")
    assert payload[i + 2] == 4
    for bad_sz in (3, 5):
        bad = bytearray(payload)
        bad[i + 2] = bad_sz
        with pytest.raises(ValueError, match="graphic-control"):
            mm.decode_gif(bytes(bad))


def test_g711_wav_strict_container():
    """ADVICE r15: non-PCM WAV format tags (6/7) require an 18-byte
    fmt chunk (cbSize=0) plus a fact chunk carrying the sample count —
    strict readers reject a bare 16-byte fmt. Pin the emitted chunk
    layout field by field, and that the chunk-walking decoder still
    round-trips through the fact chunk."""
    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    s16 = (np.sin(np.arange(321) / 4) * 9000).astype(np.int16)
    for law, tag in (("mulaw", 7), ("alaw", 6)):
        wav = mm.encode_wav_g711(s16, law)
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        (riff_size,) = struct.unpack_from("<I", wav, 4)
        assert riff_size == len(wav) - 8
        chunks = {}
        pos = 12
        while pos + 8 <= len(wav):
            cid = wav[pos : pos + 4]
            (size,) = struct.unpack_from("<I", wav, pos + 4)
            chunks[cid] = wav[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size & 1)
        fmt = chunks[b"fmt "]
        assert len(fmt) == 18
        got_tag, ch, rate, byps, align, bits, cb = struct.unpack(
            "<HHIIHHH", fmt
        )
        assert (got_tag, ch, rate, bits, cb) == (tag, 1, 8000, 8, 0)
        assert byps == 8000 and align == 1
        (n_samples,) = struct.unpack("<I", chunks[b"fact"])
        assert n_samples == len(s16)
        assert len(chunks[b"data"]) == len(s16)
        out, got_rate = mm.decode_wav_pcm16(wav)
        assert got_rate == 8000 and len(out) == len(s16)


def _ref_lzw_compress_frozen(indices, mcs):
    """Test-local conformant LZW compressor with the spec's 4096-entry
    dictionary FREEZE (no CLEAR emitted once full — the deferred-clear
    construction real encoders like GIFLIB use). Returns (packed
    bytes, n_table_entries_at_end)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table = {(i,): i for i in range(1 << mcs)}
    next_code = eoi + 1
    out_codes = [clear]
    w = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        out_codes.append(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        w = (k,)
    if w:
        out_codes.append(table[w])
    out_codes.append(eoi)
    # pack each code at the width the decoder holds when reading it
    bits = bytearray()
    acc = nacc = 0
    size = eoi + 1
    width = mcs + 1
    first = True
    for c in out_codes:
        acc |= c << nacc
        nacc += width
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
        if c == clear:
            size, width, first = eoi + 1, mcs + 1, True
        elif c != eoi:
            if first:
                first = False
            elif size < 4096:
                size += 1
                if size == (1 << width) and width < 12:
                    width += 1
    if nacc:
        bits.append(acc & 0xFF)
    return bytes(bits), next_code


def test_gif_lzw_dictionary_freezes_at_4096():
    """ADVICE r15: the LZW table must FREEZE at the spec's 4096-entry
    cap — decoding stayed correct (codes cannot exceed 4095 at the
    12-bit width cap) but the table grew with pixel count on long
    deferred-clear streams, costing memory beyond what a conformant
    decoder holds. Drive the decoder with a real frozen deferred-clear
    stream long enough to fill the dictionary: pixels must round-trip
    exactly and the peak table size must be exactly 4096."""
    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    rng = np.random.RandomState(16)
    n = 60_000
    pixels = [int(v) for v in rng.randint(0, 256, n)]
    data, next_code = _ref_lzw_compress_frozen(pixels, 8)
    assert next_code == 4096, "fixture failed to fill the dictionary"
    stats = {}
    out = mm._gif_lzw_decode(data, 8, n, _stats=stats)
    assert out == pixels
    assert stats["max_table"] == 4096
    # the boundary itself: exactly enough input to reach (not pass)
    # the cap still round-trips
    short = pixels[: n // 4]
    data2, _ = _ref_lzw_compress_frozen(short, 8)
    stats2 = {}
    assert mm._gif_lzw_decode(data2, 8, len(short), _stats=stats2) == short
    assert stats2["max_table"] <= 4096


def test_jpeg_refusals_and_guards():
    """JPEG (round 16) refusal envelope: progressive (SOF2),
    arithmetic-coded (SOF9), 12-bit precision, 4-component,
    2x2-sampled grayscale, implausible dimensions (before any
    allocation), missing tables, truncated entropy data, and
    non-JPEG payloads all refuse by name — never hang, never return
    wrong pixels silently."""
    import struct as _struct

    from netcdf4_variable_streamer_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    good = bytearray(
        encode_jpeg(np.zeros((16, 16, 3), np.uint8), quality=75)
    )
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG")

    def swap_sof(marker2):
        bad = bytearray(good)
        i = bad.index(b"\xff\xc0")
        bad[i + 1] = marker2
        return bytes(bad)

    # round 16: progressive (SOF2) is now SUPPORTED — but a baseline
    # 0..63 full-band scan header inside a progressive frame is
    # illegal per T.81 and must refuse by name, not decode garbage
    with pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg(swap_sof(0xC2))
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(swap_sof(0xC9))
    # 12-bit precision
    bad = bytearray(good)
    i = bad.index(b"\xff\xc0")
    bad[i + 4] = 12
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(bad))
    # implausible dimensions refuse before allocating
    bad = bytearray(good)
    _struct.pack_into(">HH", bad, i + 5, 65500, 65500)
    with pytest.raises(ValueError, match="implausible"):
        decode_jpeg(bytes(bad))
    # grayscale with 2x2 sampling is non-interleaved per T.81
    gray = bytearray(
        encode_jpeg(np.zeros((8, 8), np.uint8), quality=75)
    )
    i = gray.index(b"\xff\xc0")
    gray[i + 11] = 0x22
    with pytest.raises(NotImplementedError, match="grayscale JPEG"):
        decode_jpeg(bytes(gray))
    # truncations at every structural boundary
    for cut in (2, 4, 21, len(good) // 2, len(good) - 3):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(bytes(good[:cut]))
    # entropy data replaced by an invalid Huffman walk must refuse,
    # not desync: flip bits over the scan tail
    sos = bytes(good).index(b"\xff\xda")
    for pos in range(sos + 20, min(sos + 60, len(good) - 2)):
        bad = bytearray(good)
        bad[pos] ^= 0xFF
        try:
            decode_jpeg(bytes(bad))
        except (ValueError, NotImplementedError):
            pass


def test_jpeg_mutation_sweep():
    """400-case bit-flip + truncation sweep over real encoded JPEG
    payloads (the same posture as the other codecs' sweeps): only
    ValueError / NotImplementedError may surface — anything else
    (IndexError, struct.error, hang) is an escape."""
    from netcdf4_variable_streamer_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(99)
    payloads = [
        encode_jpeg(
            rng.randint(0, 256, (24, 17, 3)).astype(np.uint8),
            quality=60,
        ),
        encode_jpeg(
            rng.randint(0, 256, (9, 30)).astype(np.uint8), quality=85
        ),
        encode_jpeg(
            rng.randint(0, 256, (18, 21, 3)).astype(np.uint8),
            quality=70,
            progressive=True,
        ),
    ]
    for payload in payloads:
        for _ in range(200):
            pos = rng.randint(0, len(payload) * 8)
            b2 = bytearray(payload)
            b2[pos // 8] ^= 1 << (pos % 8)
            try:
                decode_jpeg(bytes(b2))
            except (ValueError, NotImplementedError):
                pass
        for n in (0, 1, 2, 19, len(payload) // 3, len(payload) - 1):
            try:
                decode_jpeg(bytes(payload[:n]))
            except (ValueError, NotImplementedError):
                pass


def test_qoi_run_length_boundaries():
    """Fuzz round 9: QOI_OP_RUN boundaries. The run op stores runs
    1..62 biased by -1 (values 63/64 are reserved — they would
    collide with the RGB/RGBA tags 0xFE/0xFF), so images with runs
    of exactly 61/62/63/124 pixels and a run ending exactly at the
    image boundary exercise the encoder's split logic and the
    decoder's run replay at every edge. All must round-trip exactly,
    and the encoded stream must never contain a run chunk whose
    biased length exceeds 61."""
    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    for n in (1, 2, 61, 62, 63, 64, 123, 124, 125, 200):
        img = np.full((1, n + 1, 3), 77, np.uint8)
        img[0, 0] = (1, 2, 3)  # a non-run head so the run is exactly n
        enc = mm.encode_qoi(img)
        assert (mm.decode_qoi(enc) == img).all(), n
        # scan chunk stream: no QOI_OP_RUN with biased length > 61
        pos = 14
        while pos < len(enc) - 8:
            b = enc[pos]
            if b == 0xFE:
                pos += 4
            elif b == 0xFF:
                pos += 5
            else:
                if (b >> 6) == 3:  # QOI_OP_RUN
                    assert (b & 0x3F) <= 61, n
                pos += 1
        # run ending exactly at the image end (no trailing pixel)
        tail = np.full((1, n, 4), 200, np.uint8)
        assert (mm.decode_qoi(mm.encode_qoi(tail)) == tail).all(), n


def test_g711_alaw_sign_and_clamp_edges():
    """Fuzz round 9: G.711 companding edges — segment-0/1 boundary
    (|x| = 256), the int16 extremes (−32768 must clamp without
    overflow), ±1, 0, and sign preservation straddling each segment
    boundary, for BOTH laws. Also pins the A-law even-bit inversion
    invariant (codeword ^ 0x55 symmetry): alaw_encode(0) == 0xD5 and
    mulaw_encode(0) == 0xFF — the spec's zero codewords."""
    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    edges = np.array(
        [-32768, -32767, -16384, -4097, -4096, -257, -256, -255,
         -129, -128, -2, -1, 0, 1, 2, 127, 128, 255, 256, 257,
         4095, 4096, 16383, 32767],
        dtype=np.int16,
    )
    assert int(mm.alaw_encode(np.array([0], np.int16))[0]) == 0xD5
    assert int(mm.mulaw_encode(np.array([0], np.int16))[0]) == 0xFF
    for enc, dec, bound in (
        (mm.alaw_encode, mm.alaw_decode, 1024),
        (mm.mulaw_encode, mm.mulaw_decode, 1024),
    ):
        y = dec(enc(edges)).astype(np.int32)
        err = np.abs(y - edges.astype(np.int32))
        assert err.max() <= bound
        # relative error: companding error is proportional to segment
        # step, ≤ half the step ≈ |x|/16 + O(1) for both laws
        big = np.abs(edges.astype(np.int32)) >= 256
        rel = err[big] / np.abs(edges.astype(np.int32))[big]
        assert rel.max() <= 0.04
        nz = np.abs(edges.astype(np.int32)) > 64
        assert (
            np.sign(y[nz]) == np.sign(edges.astype(np.int32)[nz])
        ).all()
    # int16 extreme: -32768 clamps to the top magnitude codeword of
    # the negative half, decode stays in int16 range
    for enc, dec in (
        (mm.alaw_encode, mm.alaw_decode),
        (mm.mulaw_encode, mm.mulaw_decode),
    ):
        lo = dec(enc(np.array([-32768], np.int16)))[0]
        hi = dec(enc(np.array([32767], np.int16)))[0]
        assert -32768 <= int(lo) < -30000 and 30000 < int(hi) <= 32767


def test_png_interlace_layout_enforced():
    """Round 9 required the Adam7 flag to refuse by name; round 17
    DECODES Adam7 (see test_llm_ops), so the guarantee evolves: an
    interlaced header whose payload carries the NON-interlaced byte
    layout must fail the pass-structure size check — a decoder that
    ignored the flag would return scrambled pixels silently. Unknown
    interlace methods still refuse."""
    import struct as _struct
    import zlib as _zlib

    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    def chunk(t, b):
        return (
            _struct.pack(">I", len(b)) + t + b
            + _struct.pack(">I", _zlib.crc32(t + b))
        )

    png = (
        mm._PNG_SIG
        + chunk(
            b"IHDR", _struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
        )
        + chunk(b"IDAT", _zlib.compress(b"\x00" * (4 * (4 * 3 + 1))))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="header declares"):
        mm.decode_png(png)
    bad = (
        mm._PNG_SIG
        + chunk(
            b"IHDR", _struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 2)
        )
        + chunk(b"IDAT", _zlib.compress(b"\x00" * 52))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlace method"):
        mm.decode_png(bad)


@_SETTINGS
@given(seed=st.integers(0, 2**31 - 1), nflips=st.integers(1, 6))
def test_hdf5_vlen_gcol_corruption_fails_controlled(
    tmp_path_factory, seed, nflips
):
    """Fuzz round 9: byte flips over a VLEN-STRING file — the global-
    heap (GCOL) machinery the shuffle+deflate sweep never touches:
    collection signatures, sizes, object indices, descriptor streams.
    A flip must surface as ValueError or parse clean — never a bare
    struct.error/IndexError/UnicodeDecodeError, and never an
    unbounded allocation from a corrupt heap size."""
    import random

    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    root = str(tmp_path_factory.mktemp("gcolcorrupt"))
    base_path = os.path.join(root, "base.h5")
    vals = np.array(
        ["alpha", "", "a much longer string payload", "x" * 90,
         "beta", "gamma delta", "7", "eight"],
        dtype=object,
    )
    write_hdf5(
        base_path,
        {"s": vals, "t": np.arange(6, dtype=np.int32)},
        {"s": {"attrs": {"note": "vlen"}}},
    )
    buf = bytearray(open(base_path, "rb").read())
    rng = random.Random(seed)
    for _ in range(nflips):
        buf[rng.randrange(len(buf))] = rng.randrange(256)
    path = os.path.join(root, "t.h5")
    with open(path, "wb") as f:
        f.write(bytes(buf))
    try:
        h = HDF5File(path)
        for n in list(h.datasets):
            h.read(n)
            dict(h.datasets[n].attrs)
    except ValueError:
        pass  # loud, contextual refusal — the contract


@_SETTINGS
@given(seed=st.integers(0, 2**31 - 1), nflips=st.integers(1, 6))
def test_hdf5_dense_corruption_fails_controlled(
    tmp_path_factory, seed, nflips
):
    """Fuzz round 9: byte flips over a libver='latest' DENSE-storage
    file — fractal heaps, v2 B-trees, creation-order indexes: the
    structures the original corruption sweep's compact-storage file
    never exercises. Same contract: ValueError or clean, never an
    opaque crash or runaway allocation."""
    import random

    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    root = str(tmp_path_factory.mktemp("densecorrupt"))
    base_path = os.path.join(root, "base.h5")
    data = {
        f"d{i:02d}": np.arange(i + 1, dtype=np.int32)
        for i in range(12)
    }
    attrs = {f"a{i}": float(i) * 0.25 for i in range(12)}
    write_hdf5(
        base_path, data, {"d00": {"attrs": attrs}}, attrs=attrs,
        libver="latest",
    )
    buf = bytearray(open(base_path, "rb").read())
    rng = random.Random(seed)
    for _ in range(nflips):
        buf[rng.randrange(len(buf))] = rng.randrange(256)
    path = os.path.join(root, "t.h5")
    with open(path, "wb") as f:
        f.write(bytes(buf))
    try:
        h = HDF5File(path)
        dict(h.attrs)
        for n in list(h.datasets):
            h.read(n)
            dict(h.datasets[n].attrs)
    except ValueError:
        pass


def test_hdf5_vlen_and_dense_truncation_refuses(tmp_path):
    """Fuzz round 9 companion: every prefix truncation of the vlen
    and dense fixture files must refuse with ValueError or open
    cleanly-partial — never an opaque exception class."""
    from netcdf4_variable_streamer_spark.sources.hdf5lite import (
        HDF5File,
        write_hdf5,
    )

    vals = np.array(["abc", "d" * 70, "", "ef"], dtype=object)
    p1 = os.path.join(str(tmp_path), "v.h5")
    write_hdf5(p1, {"s": vals})
    p2 = os.path.join(str(tmp_path), "d.h5")
    write_hdf5(
        p2,
        {f"d{i}": np.arange(3, dtype=np.int32) for i in range(11)},
        libver="latest",
    )
    for src in (p1, p2):
        raw = open(src, "rb").read()
        for frac in (0.05, 0.2, 0.5, 0.8, 0.95, 0.999):
            cut = os.path.join(str(tmp_path), "cut.h5")
            with open(cut, "wb") as f:
                f.write(raw[: int(len(raw) * frac)])
            try:
                h = HDF5File(cut)
                for n in list(h.datasets):
                    h.read(n)
            except ValueError:
                pass


@_SETTINGS
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    nch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_lossless_image_codecs_roundtrip_hypothesis(h, w, nch, seed):
    """Property sweep over EVERY lossless image codec at arbitrary
    small shapes: encode→decode must be the identity for BMP/PPM
    (RGB), PNG (gray/RGB/RGBA), QOI (RGB/RGBA), TIFF (any, both
    compressions), and GIF (RGB quantized to ≤256 colors by
    construction)."""
    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )
    from netcdf4_variable_streamer_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, nch)).astype(np.uint8)
    if nch == 3:
        assert (mm.decode_bmp(mm.encode_bmp(img)) == img).all()
        assert (mm.decode_ppm(mm.encode_ppm(img)) == img).all()
        # GIF needs ≤256 distinct colors: quantize to a 4-value grid
        few = (rng.randint(0, 4, (h, w, 3)) * 80).astype(np.uint8)
        assert (mm.decode_gif(mm.encode_gif(few))[0] == few).all()
    if nch in (3, 4):
        assert (mm.decode_qoi(mm.encode_qoi(img)) == img).all()
    png_in = img[:, :, 0] if nch == 1 else img
    got = mm.decode_png(mm.encode_png(png_in))
    assert (got.reshape(png_in.shape) == png_in).all()
    tin = img[:, :, 0] if nch == 1 else img
    for comp in ("none", "packbits"):
        assert (
            decode_tiff(encode_tiff(tin, compression=comp)) == tin
        ).all()
        # round 17: the tiled layout over the same shapes (edge
        # padding always exercised — shapes here never reach 16)
        assert (
            decode_tiff(
                encode_tiff(tin, compression=comp, tile=(16, 16))
            )
            == tin
        ).all()
    if nch == 1:
        # round 17: G4 bilevel round-trip, strip and tiled layouts
        bil = ((tin < 128) * 255).astype(np.uint8)
        assert (
            decode_tiff(encode_tiff(bil, compression="g4")) == bil
        ).all()
        assert (
            decode_tiff(
                encode_tiff(bil, compression="g4", tile=(16, 16))
            )
            == bil
        ).all()


@_SETTINGS
@given(
    n=st.integers(0, 600),
    stereo=st.booleans(),
    block=st.sampled_from([32, 192, 4096]),
    seed=st.integers(0, 2**31 - 1),
)
def test_lossless_audio_codecs_roundtrip_hypothesis(
    n, stereo, block, seed
):
    """Property sweep over the lossless audio codecs: WAV-PCM16 and
    FLAC (mono/stereo, arbitrary lengths incl. empty and
    non-multiple-of-block) must round-trip bit-exactly."""
    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )
    from netcdf4_variable_streamer_spark.functions.flac import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.RandomState(seed)
    shape = (n, 2) if stereo else (n,)
    s = rng.randint(-32768, 32768, shape).astype(np.int16)
    out, rate = decode_flac(encode_flac(s, 22050, block=block))
    assert rate == 22050 and out.shape == s.shape
    assert (out == s).all()
    # PCM16 WAV round-trips both channel layouts (stereo since r17)
    if n > 0 or not stereo:
        w, rate = mm.decode_wav_pcm16(
            mm.encode_wav_pcm16(s, sample_rate=8000)
        )
        assert rate == 8000 and w.shape == s.shape and (w == s).all()
    # stereo IMA ADPCM: header samples exact, shape preserved
    if stereo and n >= 2:
        a, rate = mm.decode_wav_pcm16(
            mm.encode_wav_ima_adpcm(s, 8000, block_nibbles=64)
        )
        assert rate == 8000 and a.shape == s.shape
        _, spb = mm.ima_adpcm_encode_stereo(s, 8)
        for b in range(0, n, spb):
            assert (a[b] == s[b]).all()


def test_round16_codec_review_round2_regressions():
    """Second round-16 review batch, pinned: (1) TIFF 4-7-byte
    truncations refuse as ValueError (the old sweep skipped exactly
    that window); (2) an unbounded SamplesPerPixel no longer
    multiplies past the pixel guard into a decompression bomb;
    (3) SLONG/FLOAT-typed tags decode with their own wire format —
    a FLOAT-typed integer tag now refuses by name instead of
    mis-parsing the bit pattern; (4) PackBits compresses each row
    separately per TIFF 6.0 (runs never cross rows) and still
    round-trips; (5) encode_tiff/encode_flac/encode_avi_mjpeg
    validate rows_per_strip / block size / fps by name; (6) a FLAC
    stream with valid CRCs but geometrically exploding LPC
    predictions refuses instead of escaping as OverflowError;
    (7) a nested-LIST AVI bomb refuses instead of RecursionError."""
    import struct as _struct

    from netcdf4_variable_streamer_spark.functions.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from netcdf4_variable_streamer_spark.functions.flac import (
        encode_flac,
    )
    from netcdf4_variable_streamer_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    for n in (4, 5, 6, 7):
        with pytest.raises(ValueError):
            decode_tiff(b"II*\x00\x08\x00\x00"[:n])
    base = bytearray(encode_tiff(np.zeros((4, 4), np.uint8)))
    i = bytes(base).index(_struct.pack("<HHI", 277, 3, 1)) + 8
    bomb = bytearray(base)
    _struct.pack_into("<H", bomb, i, 65535)
    with pytest.raises(NotImplementedError, match="samples per pixel"):
        decode_tiff(bytes(bomb))
    # FLOAT-typed width tag refuses by name, never mis-parses
    j = bytes(base).index(_struct.pack("<HHI", 256, 3, 1)) + 2
    floaty = bytearray(base)
    _struct.pack_into("<H", floaty, j, 11)  # type FLOAT
    with pytest.raises(ValueError, match="non-integral"):
        decode_tiff(bytes(floaty))
    with pytest.raises(ValueError, match="rows_per_strip"):
        encode_tiff(np.zeros((4, 4), np.uint8), rows_per_strip=0)
    # per-row PackBits: a run crossing a row boundary must split —
    # every literal/repeat packet stays within one row's byte count
    img = np.full((3, 5), 7, np.uint8)
    enc = encode_tiff(img, compression="packbits", rows_per_strip=3)
    assert (decode_tiff(enc) == img).all()
    # the 15-byte all-equal strip must be three 5-byte row packets,
    # not one 15-byte run: the repeat packet for a 5-byte run is
    # (257-5)=252, appearing once per row
    assert enc.count(bytes([252, 7])) == 3
    with pytest.raises(ValueError, match="block size"):
        encode_flac(np.zeros(10, np.int16), block=8)
    with pytest.raises(ValueError, match="fps"):
        encode_avi_mjpeg(np.zeros((1, 16, 16, 3), np.uint8), fps=0)
    nest = b""
    for _ in range(1000):
        nest = (
            b"LIST" + _struct.pack("<I", len(nest) + 4) + b"hdrl"
            + nest
        )
    avi = b"RIFF" + _struct.pack("<I", len(nest) + 4) + b"AVI " + nest
    with pytest.raises(ValueError, match="nesting"):
        decode_avi_mjpeg(avi)


# ---------------------------------------------------------------------------
# Fuzz round 10 (round 17, VERDICT r16 #4): the round-16 codecs under
# the attacks the verdict prescribed — TIFF EARLY-CHANGE width bumps
# at table-full boundaries, FLAC mid-frame corruption against the CRC
# envelope, AVI movi/idx1 truncation, progressive-JPEG scan-script
# violations, and cross-format dispatch confusion.
# ---------------------------------------------------------------------------


def _lzw_compress_tiff(data: bytes) -> bytes:
    """Test-local TIFF-variant LZW compressor (independent of the
    decoder: MSB-first, Clear=256/EOI=257, EARLY-CHANGE bumps when
    the just-added code hits 511/1023/2047)."""
    bits = []
    width = 9

    def emit(code, w):
        bits.extend((code >> (w - 1 - i)) & 1 for i in range(w))

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256, width)
    w = b""
    for ch in data:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code <= 4093:
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) - 1 and width < 12:
                width += 1
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(257, width)
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        int("".join(map(str, bits[i : i + 8])), 2)
        for i in range(0, len(bits), 8)
    )


def test_fuzz10_tiff_lzw_width_bumps_and_boundary_truncation():
    """EARLY-CHANGE width bumps at the table-full boundaries: streams
    engineered so the dictionary ends exactly AT / one-before / one
    after each bump (511, 1023, 2047) and one crossing the 4094-entry
    freeze must round-trip byte-exactly through the in-repo decoder;
    every PREFIX truncation of a bump-crossing stream must raise —
    never hang, never return short data silently."""
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.tiff import (
        _tiff_lzw,
    )

    rng = np.random.RandomState(10)
    # incompressible bytes add ~1 dictionary entry per input byte:
    # size sweeps land the final code count around each boundary
    for target in (250, 251, 252, 253, 254, 255, 764, 765, 766,
                   1788, 1789, 1790):
        data = bytes(rng.randint(0, 256, target).astype(np.uint8))
        blob = _lzw_compress_tiff(data)
        assert _tiff_lzw(blob, len(data)) == data, target
    # cross the 4094 freeze: ~4.5k of incompressible data
    data = bytes(rng.randint(0, 256, 4600).astype(np.uint8))
    blob = _lzw_compress_tiff(data)
    assert _tiff_lzw(blob, len(data)) == data
    for cut in range(0, len(blob), 37):
        with pytest.raises((ValueError, NotImplementedError)):
            _tiff_lzw(blob[:cut], len(data))


def test_fuzz10_flac_mid_frame_corruption_never_silent():
    """Every single-bit flip inside the FRAME region of a FLAC stream
    (past the metadata blocks) must surface as a controlled error —
    the CRC-8 (header) / CRC-16 (frame) envelope means no corrupted
    frame may ever decode to silently-wrong samples."""
    import struct as _struct

    import numpy as np

    from netcdf4_variable_streamer_spark.functions.flac import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.RandomState(12)
    sig = (
        rng.randint(-3000, 3000, (700, 2)).cumsum(axis=0) % 8000
    ).astype(np.int16)
    blob = encode_flac(sig, 16000, block=256)
    assert (decode_flac(blob)[0] == sig).all()
    # locate the first frame: walk metadata blocks from offset 4
    pos = 4
    while True:
        hdr = blob[pos]
        (size,) = _struct.unpack(">I", b"\0" + blob[pos + 1 : pos + 4])
        pos += 4 + size
        if hdr & 0x80:
            break
    frames_at = pos
    for bitpos in range(0, (len(blob) - frames_at) * 8, 11):
        b2 = bytearray(blob)
        b2[frames_at + bitpos // 8] ^= 1 << (bitpos % 8)
        try:
            out, _ = decode_flac(bytes(b2))
        except (ValueError, NotImplementedError):
            continue
        raise AssertionError(
            f"bit flip at frame offset {bitpos} decoded silently"
        )


def test_fuzz10_avi_movi_idx1_truncation_and_size_lies():
    """AVI container truncation at every boundary around the movi and
    idx1 lists, plus size-field lies (declared chunk sizes past the
    payload, a frame count the movi list cannot satisfy): controlled
    errors only."""
    import struct as _struct

    import numpy as np

    from netcdf4_variable_streamer_spark.functions.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    rng = np.random.RandomState(13)
    v = rng.randint(0, 256, (3, 2, 2)).astype(np.uint8)
    frames = np.stack(
        [
            np.stack([v[i].repeat(8, 0).repeat(8, 1)] * 3, axis=2)
            for i in range(3)
        ]
    )
    blob = encode_avi_mjpeg(frames, fps=12)
    out, fps = decode_avi_mjpeg(blob)
    assert fps == 12 and (out == frames).all()
    movi = blob.index(b"movi")
    idx1 = blob.index(b"idx1")
    cuts = sorted(
        {
            movi - 8, movi - 1, movi, movi + 3, movi + 12,
            idx1 - 8, idx1 - 1, idx1, idx1 + 4, idx1 + 9,
            len(blob) - 1,
        }
    )
    for cut in cuts:
        try:
            decode_avi_mjpeg(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    # size lies: inflate each LIST/chunk size dword found at the
    # first 40 chunk headers
    pos = 12
    edits = 0
    while pos + 8 <= len(blob) and edits < 40:
        b2 = bytearray(blob)
        _struct.pack_into("<I", b2, pos + 4, 0x7FFFFFF0)
        try:
            decode_avi_mjpeg(bytes(b2))
        except (ValueError, NotImplementedError):
            pass
        (sz,) = _struct.unpack_from("<I", blob, pos + 4)
        cid = blob[pos : pos + 4]
        pos += 8 + (4 if cid == b"LIST" else sz + (sz & 1))
        edits += 1


def test_fuzz10_progressive_jpeg_scan_script_violations():
    """Progressive scan-script violations injected into a REAL SOF2
    stream's SOS headers: Ss>Se, Se>63, a DC scan claiming a spectral
    band, refinement jumps (Ah-Al != 1), and a full sweep of the
    three scan-script bytes on every scan — each mutation must either
    refuse (ValueError / NotImplementedError) or still decode to the
    original image SHAPE; no crash, no hang, no mis-shaped output."""
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(14)
    img = rng.randint(0, 256, (24, 16, 3)).astype(np.uint8)
    blob = encode_jpeg(img, quality=80, progressive=True)
    base = decode_jpeg(blob)
    assert base.shape == img.shape

    # SOS positions: marker FF DA, then L(2) ns(1) 2*ns comp bytes,
    # then Ss, Se, AhAl
    sos_at = []
    i = 2
    while i + 4 < len(blob):
        if blob[i] == 0xFF and blob[i + 1] == 0xDA:
            ns = blob[i + 4]
            sos_at.append(i + 5 + 2 * ns)  # offset of Ss
        i += 1
    assert len(sos_at) >= 4  # the 4-phase script
    for off in sos_at:
        for ss, se, ahal in (
            (5, 2, 0x00),   # Ss > Se
            (1, 64, 0x10),  # Se past the block
            (0, 63, 0x00),  # DC+AC mixed claim on every scan
            (1, 63, 0x31),  # refinement jump Ah=3 -> Al=1
            (0, 0, 0x75),   # absurd approximation bits
        ):
            b2 = bytearray(blob)
            b2[off], b2[off + 1], b2[off + 2] = ss, se, ahal
            try:
                out = decode_jpeg(bytes(b2))
                assert out.shape == img.shape
            except (ValueError, NotImplementedError):
                pass
        for byte_off in range(3):
            for val in range(0, 256, 17):
                b2 = bytearray(blob)
                b2[off + byte_off] = val
                try:
                    out = decode_jpeg(bytes(b2))
                    assert out.shape == img.shape
                except (ValueError, NotImplementedError):
                    pass


def test_fuzz10_dispatch_confusion_chimeras():
    """Payloads whose MAGIC claims format A but whose body is format
    B must fail controlled (or legitimately decode the inner body
    when the container genuinely carries it) — never hang, never
    raise an uncontrolled type. Covers the image dispatch, the audio
    dispatch, and RIFF-family confusion (WAV vs AVI)."""
    import struct as _struct

    import numpy as np

    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )
    from netcdf4_variable_streamer_spark.functions.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from netcdf4_variable_streamer_spark.functions.flac import (
        encode_flac,
    )
    from netcdf4_variable_streamer_spark.functions.jpeg import (
        encode_jpeg,
    )
    from netcdf4_variable_streamer_spark.functions.tiff import (
        encode_tiff,
    )

    rng = np.random.RandomState(15)
    img = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    sig = rng.randint(-500, 500, 200).astype(np.int16)
    bodies = {
        "jpeg": encode_jpeg(img),
        "tiff": encode_tiff(img),
        "png": mm.encode_png(img),
        "gif": mm.encode_gif(img),
        "flac": encode_flac(sig, 8000, block=64),
        "wav": mm.encode_wav_pcm16(sig, 8000),
        "avi": encode_avi_mjpeg(
            np.zeros((1, 8, 8, 3), np.uint8), fps=10
        ),
    }
    magics = {
        "jpeg": b"\xff\xd8\xff",
        "tiff": b"II*\x00",
        "png": b"\x89PNG\r\n\x1a\n",
        "gif": b"GIF89a",
        "flac": b"fLaC",
    }
    for mname, magic in magics.items():
        for bname, body in bodies.items():
            if bname == mname:
                continue
            chimera = magic + body
            try:
                mm.decode_any(chimera)
            except (ValueError, NotImplementedError):
                pass
            try:
                mm.decode_audio_any(chimera)
            except (ValueError, NotImplementedError):
                pass
    # RIFF-family confusion: WAVE header, AVI list body (and reverse)
    wav_avi = (
        b"RIFF"
        + _struct.pack("<I", len(bodies["avi"]) - 8 + 4)
        + b"WAVE"
        + bodies["avi"][12:]
    )
    try:
        mm.decode_audio_any(wav_avi)
    except (ValueError, NotImplementedError):
        pass
    avi_wav = (
        b"RIFF"
        + _struct.pack("<I", len(bodies["wav"]) - 8 + 4)
        + b"AVI "
        + bodies["wav"][12:]
    )
    try:
        decode_avi_mjpeg(avi_wav)
    except (ValueError, NotImplementedError):
        pass


def test_fuzz10_g4_transition_list_bounded():
    """Fuzz round 10's find: a crafted G4 stream repeating
    zero-advance vertical codes could grow a row's transition list to
    8x the INPUT size (memory amplification) before the row ever
    finished — legitimate rows carry at most w transitions (+ one
    terminal a1 == w), and the decoder now enforces exactly that
    bound while still decoding every fully-alternating row (the
    worst legitimate case, both phases, widths 1..64)."""
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.tiff import (
        _ccitt_g4_decode,
        _ccitt_g4_encode,
    )

    for w in (1, 2, 3, 6, 7, 64):
        for phase in (0, 1):
            bits = (
                ((np.arange(w) + phase) % 2)
                .astype(np.uint8)[None, :]
                .repeat(3, 0)
            )
            enc = _ccitt_g4_encode(bits)
            assert (_ccitt_g4_decode(enc, w, 3) == bits).all()
    # adversarial: alternating VR1/VL1 mode codes on a huge row must
    # die on a bound, not allocate 8x the stream in transitions
    stream = bytes(int("011010" * 4, 2).to_bytes(3, "big")) * 2000
    with pytest.raises(ValueError):
        _ccitt_g4_decode(stream, 1 << 20, 1)


def test_fuzz10_spec_table_invariants():
    """Structural invariants of the transcribed spec tables — the
    checks that catch transcription typos which encoder/decoder
    symmetry would hide: (a) the T.4 white and black code tables
    (each unioned with the shared extended make-ups) are PREFIX-FREE
    with no duplicates — a mistyped bit string almost always collides
    with or prefixes another code; (b) run coverage is complete and
    exact (terminating 0..63, make-ups 64..1728 in 64s, extended
    1792..2560 in 64s); (c) the IMA ADPCM step table is strictly
    monotone from 7 to 32767 with the spec's ~1.1 growth ratio
    (observed band 1.06..1.15) — a digit typo breaks one of the
    three immediately."""
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        _IMA_STEPS,
    )
    from netcdf4_variable_streamer_spark.functions.tiff import (
        _T4_BLACK,
        _T4_EXT,
        _T4_WHITE,
    )

    for pairs in (_T4_WHITE + _T4_EXT, _T4_BLACK + _T4_EXT):
        codes = [bits for _, bits in pairs]
        assert len(set(codes)) == len(codes)
        s = sorted(codes)
        clashes = [
            (a, b) for a, b in zip(s, s[1:]) if b.startswith(a)
        ]
        assert not clashes, clashes
        assert all(set(c) <= {"0", "1"} for c in codes)
        assert max(len(c) for c in codes) <= 14
    expected = list(range(64)) + [64 * i for i in range(1, 28)]
    assert [r for r, _ in _T4_WHITE] == expected
    assert [r for r, _ in _T4_BLACK] == expected
    assert [r for r, _ in _T4_EXT] == [
        1792 + 64 * i for i in range(13)
    ]
    st = _IMA_STEPS
    assert len(st) == 89 and st[0] == 7 and st[88] == 32767
    assert (np.diff(st) > 0).all()
    ratio = st[1:].astype(np.float64) / st[:-1]
    assert ratio.min() > 1.05 and ratio.max() < 1.15


def _png_file(w, h, depth, color, interlace, rows, plte=None, trns=None):
    """Test-local PNG writer (independent of encode_png): raw filtered
    scanline bytes in, chunked/CRC'd file out."""
    import struct as _struct
    import zlib as _zlib

    def chunk(t, b):
        return (
            _struct.pack(">I", len(b)) + t + b
            + _struct.pack(">I", _zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    out = bytearray(mm._PNG_SIG)
    out += chunk(
        b"IHDR",
        _struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace),
    )
    if plte is not None:
        out += chunk(b"PLTE", plte.tobytes())
    if trns is not None:
        out += chunk(b"tRNS", bytes(trns))
    out += chunk(b"IDAT", _zlib.compress(rows))
    out += chunk(b"IEND", b"")
    return bytes(out)


def _png_pack(row, depth):
    bits = np.unpackbits(row[:, None], axis=1)[:, 8 - depth:]
    return np.packbits(bits.flatten()).tobytes()


def test_png_palette_lowdepth_adam7():
    """Round 17 PNG surface extensions, each pinned by an
    INDEPENDENTLY-built file (test-local chunk writer + bit packer):
    (a) the Adam7 pass grid PARTITIONS the pixel grid at arbitrary
    shapes (every pixel exactly once — the wrong-table failure mode
    is silent double/zero coverage); (b) 8-bit palette (PLTE lookup),
    2-bit palette with tRNS alpha (RGBA out, 255 past the tRNS
    length), indexes past the PLTE refuse by name; (c) 1-bit
    grayscale scales to 0/255 (the scanned-page class); (d) Adam7
    RGB and Adam7 1-bit gray reassemble exactly; (e) 300-case
    mutation sweep over an interlaced palette file."""
    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )
    from netcdf4_variable_streamer_spark.functions.multimodal import (
        _ADAM7,
    )

    # (a) partition property
    for w, h in ((1, 1), (2, 3), (8, 8), (9, 10), (17, 5), (33, 31)):
        cover = np.zeros((h, w), int)
        for x0, y0, dx, dy in _ADAM7:
            cover[y0:h:dy, x0:w:dx] += 1
        assert (cover == 1).all(), (w, h)

    rng = np.random.RandomState(33)
    # (b) palettes
    w, h = 5, 4
    plte = rng.randint(0, 256, (6, 3)).astype(np.uint8)
    idx = rng.randint(0, 6, (h, w)).astype(np.uint8)
    rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    got = mm.decode_png(_png_file(w, h, 8, 3, 0, rows, plte))
    assert got.shape == (h, w, 3) and (got == plte[idx]).all()
    idx = rng.randint(0, 4, (h, w)).astype(np.uint8)
    rows = b"".join(
        b"\x00" + _png_pack(idx[y], 2) for y in range(h)
    )
    got = mm.decode_png(
        _png_file(w, h, 2, 3, 0, rows, plte[:4], [200, 100, 50])
    )
    assert got.shape == (h, w, 4)
    assert (got[:, :, :3] == plte[:4][idx]).all()
    alpha = np.full(256, 255, np.uint8)
    alpha[:3] = [200, 100, 50]
    assert (got[:, :, 3] == alpha[idx]).all()
    bad_idx = np.full((2, 2), 7, np.uint8)
    rows = b"".join(
        b"\x00" + bad_idx[y].tobytes() for y in range(2)
    )
    with pytest.raises(ValueError, match="outside the"):
        mm.decode_png(_png_file(2, 2, 8, 3, 0, rows, plte[:4]))

    # (c) 1-bit gray
    g = rng.randint(0, 2, (h, w)).astype(np.uint8)
    rows = b"".join(b"\x00" + _png_pack(g[y], 1) for y in range(h))
    got = mm.decode_png(_png_file(w, h, 1, 0, 0, rows))
    assert got.shape == (h, w, 1) and (got[:, :, 0] == g * 255).all()

    # (d) Adam7
    w, h = 9, 10
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    rows = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        for y in range(sub.shape[0]):
            rows += b"\x00" + sub[y].tobytes()
    assert (
        mm.decode_png(_png_file(w, h, 8, 2, 1, rows)) == img
    ).all()
    g = rng.randint(0, 2, (h, w)).astype(np.uint8)
    rows = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = g[y0::dy, x0::dx]
        for y in range(sub.shape[0]):
            rows += b"\x00" + _png_pack(sub[y], 1)
    got = mm.decode_png(_png_file(w, h, 1, 0, 1, rows))
    assert (got[:, :, 0] == g * 255).all()

    # (e) mutation sweep over an interlaced 2-bit palette file
    idx = rng.randint(0, 4, (h, w)).astype(np.uint8)
    rows = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = idx[y0::dy, x0::dx]
        for y in range(sub.shape[0]):
            rows += b"\x00" + _png_pack(sub[y], 2)
    good = _png_file(w, h, 2, 3, 1, rows, plte[:4])
    assert (
        mm.decode_png(good) == plte[:4][idx]
    ).all()
    for _ in range(300):
        b2 = bytearray(good)
        p = rng.randint(0, len(b2) * 8)
        b2[p // 8] ^= 1 << (p % 8)
        try:
            mm.decode_png(bytes(b2))
        except (ValueError, NotImplementedError):
            pass
    for cut in (0, 10, 33, len(good) // 2, len(good) - 1):
        try:
            mm.decode_png(bytes(good[:cut]))
        except (ValueError, NotImplementedError):
            pass


@_SETTINGS
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    nch=st.sampled_from([1, 3]),
    comp=st.sampled_from(["none", "packbits", "g4"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_layout_equivalence_hypothesis(h, w, nch, comp, seed):
    """Cross-LAYOUT property: the same image encoded as strips and as
    tiles must decode identically for every compression — the two
    layouts are storage arrangements of the same pixels, so any
    divergence is a placement/padding/predictor-scope bug in one of
    them."""
    from netcdf4_variable_streamer_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.RandomState(seed)
    if comp == "g4":
        if nch != 1:
            return  # bilevel only
        img = (rng.randint(0, 2, (h, w)) * 255).astype(np.uint8)
    else:
        shape = (h, w) if nch == 1 else (h, w, nch)
        img = rng.randint(0, 256, shape).astype(np.uint8)
    a = decode_tiff(encode_tiff(img, compression=comp, rows_per_strip=7))
    b = decode_tiff(encode_tiff(img, compression=comp, tile=(16, 16)))
    assert a.shape == b.shape == img.shape
    assert (a == img).all() and (b == img).all()


def test_round17_review_regressions():
    """Round-17 code-review batch, pinned: (1) a G4 strip LIST
    covering fewer than the declared rows raises instead of silently
    returning a short image; (2) zero-length-run HORIZONTAL codes hit
    the same transition-list bound as vertical codes (the fuzz-10
    guard originally only covered the V path); (3) G4 photo=1
    (BlackIsZero) renders REVERSED from photo=0, matching
    libtiff-family readers, in both strip and tiled layouts; (4) PNG
    tRNS on gray/RGB emits the alpha plane (raw-sample-domain key
    match) instead of parsing and silently dropping; short tRNS
    refuses."""
    import struct as _struct
    import zlib as _zlib

    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )
    from netcdf4_variable_streamer_spark.functions.tiff import (
        _ccitt_g4_decode,
        decode_tiff,
        encode_tiff,
    )

    # (1) short strip list
    img = (np.arange(18 * 26).reshape(18, 26) % 2 * 255).astype(
        np.uint8
    )
    good = encode_tiff(img, compression="g4", rows_per_strip=5)
    assert (decode_tiff(good) == img).all()
    b = bytearray(good)
    # halve the strip count in both 324-family tags (273/279 arrays)
    n273 = b.index(_struct.pack("<HH", 273, 4))
    n279 = b.index(_struct.pack("<HH", 279, 4))
    for at in (n273, n279):
        cnt = _struct.unpack_from("<I", b, at + 4)[0]
        _struct.pack_into("<I", b, at + 4, cnt // 2)
    with pytest.raises(ValueError, match="strips cover"):
        decode_tiff(bytes(b))

    # (2) zero-advance horizontal attack bounded
    atk = ("001" + "00110101" + "0000110111") * 3000
    data = int(atk + "0" * ((-len(atk)) % 8), 2).to_bytes(
        (len(atk) + 7) // 8, "big"
    )
    with pytest.raises(ValueError, match="transitions"):
        _ccitt_g4_decode(data, 8, 1)

    # (3) photo=1 inversion (strip + tiled)
    for tile in (None, (16, 16)):
        kw = {"tile": tile} if tile else {"rows_per_strip": 5}
        blob = bytearray(encode_tiff(img, compression="g4", **kw))
        i = blob.index(_struct.pack("<HH", 262, 3)) + 8
        assert _struct.unpack_from("<H", blob, i)[0] == 0
        _struct.pack_into("<H", blob, i, 1)
        assert (decode_tiff(bytes(blob)) == 255 - img).all(), tile

    # (4) gray/RGB tRNS
    def chunk(t, body):
        return (
            _struct.pack(">I", len(body)) + t + body
            + _struct.pack(">I", _zlib.crc32(t + body) & 0xFFFFFFFF)
        )

    g = np.array([[7, 9], [7, 0]], np.uint8)
    rows = b"".join(b"\x00" + g[y].tobytes() for y in range(2))
    png = (
        mm._PNG_SIG
        + chunk(
            b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        )
        + chunk(b"tRNS", bytes([0, 7]))
        + chunk(b"IDAT", _zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    got = mm.decode_png(png)
    assert got.shape == (2, 2, 2)
    assert (got[:, :, 0] == g).all()
    assert (got[:, :, 1] == np.where(g == 7, 0, 255)).all()
    rgb = np.array([[[1, 2, 3], [9, 9, 9]]], np.uint8)
    png = (
        mm._PNG_SIG
        + chunk(
            b"IHDR", _struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
        )
        + chunk(b"tRNS", bytes([0, 1, 0, 2, 0, 3]))
        + chunk(b"IDAT", _zlib.compress(b"\x00" + rgb[0].tobytes()))
        + chunk(b"IEND", b"")
    )
    got = mm.decode_png(png)
    assert (got[0, 0] == [1, 2, 3, 0]).all()
    assert (got[0, 1] == [9, 9, 9, 255]).all()
    png_short = (
        mm._PNG_SIG
        + chunk(
            b"IHDR", _struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
        )
        + chunk(b"tRNS", bytes([0, 1]))
        + chunk(b"IDAT", _zlib.compress(b"\x00" + rgb[0].tobytes()))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="tRNS"):
        mm.decode_png(png_short)


def test_round18_advice_regressions():
    """Round-18 ADVICE fixes, pinned: (1) an IMA ADPCM WAV whose fact
    chunk declares more samples than the data chunk's blocks decode
    refuses by name instead of returning silently-short audio (the
    same loud-refusal discipline G4 short strips got in r17); (2) a
    palette PNG whose tRNS chunk carries more entries than the PLTE
    refuses by name instead of escaping as a raw numpy broadcast
    error."""
    import struct as _struct

    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    # (1) fact chunk lies long: 606 samples encoded, fact says 5000
    s = (np.arange(606, dtype=np.int16) * 37) % 2048
    wav = bytearray(mm.encode_wav_ima_adpcm(s.astype(np.int16), 8000))
    fi = wav.index(b"fact")
    assert _struct.unpack_from("<I", wav, fi + 8)[0] == 606
    _struct.pack_into("<I", wav, fi + 8, 5000)
    with pytest.raises(ValueError, match="fact chunk declares 5000"):
        mm.decode_wav_pcm16(bytes(wav))
    # the untampered file still decodes exactly as long as declared
    out, rate = mm.decode_wav_pcm16(
        mm.encode_wav_ima_adpcm(s.astype(np.int16), 8000)
    )
    assert rate == 8000 and out.shape == (606,)

    # (2) tRNS longer than the PLTE refuses by name (was a numpy
    # broadcast ValueError for >256, silent 255-padding semantics
    # confusion below)
    plte = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
    )
    rows = b"\x00" + bytes([0, 1, 2, 3])
    png = _png_file(
        4, 1, 8, 3, 0, rows, plte=plte, trns=bytes(range(6))
    )
    with pytest.raises(ValueError, match="tRNS carries 6"):
        mm.decode_png(png)
    # in-bounds tRNS (shorter than PLTE) still decodes, 255-padded
    png_ok = _png_file(
        4, 1, 8, 3, 0, rows, plte=plte, trns=bytes([10, 20])
    )
    got = mm.decode_png(png_ok)
    assert got.shape == (1, 4, 4)
    assert list(got[0, :, 3]) == [10, 20, 255, 255]


def _vorbis_mono_fixture(doc):
    from netcdf4_variable_streamer_spark.functions.vorbis import (
        encode_ogg_vorbis_mono,
    )

    frames = []
    for f in range(4):
        y = ((doc * 5 + f * 3) % 256, (doc * 3 + f * 7) % 256)
        classes = [(doc + f + p) % 2 for p in range(8)]
        rv = [
            ((doc * 7 + f * 5 + p * 3 + i) % 17 - 8)
            if classes[p]
            else 0
            for p in range(8)
            for i in range(8)
        ]
        frames.append((y, classes, rv))
    return encode_ogg_vorbis_mono(frames), frames


def _vorbis_stereo_fixture(doc):
    from netcdf4_variable_streamer_spark.functions.vorbis import (
        encode_ogg_vorbis_stereo,
    )

    flags = [0, 1, 1, 0]
    frames = []
    for fi, bf in enumerate(flags):
        parts = (256 if bf else 64) // 8
        ys = tuple(
            (
                (doc * 3 + fi + ch) % 128,
                (doc * 5 + fi * 2 + ch) % 128,
                (doc + fi + ch) % 16,
                (doc * 2 + fi + ch) % 16,
                (doc * 7 + fi + ch) % 16,
            )
            for ch in range(2)
        )
        classes = [(doc + fi + q) % 2 for q in range(parts)]
        p0, p1 = [], []
        for q in range(parts):
            if classes[q]:
                p0 += [(doc + fi + q) % 8, (doc * 3 + fi + q) % 8]
                p1 += [
                    ((doc * 11 + fi * 7 + q * 3 + i) % 17 - 8)
                    for i in range(8)
                ]
        frames.append((bf, ys, classes, p0, p1))
    return encode_ogg_vorbis_stereo(frames), frames


def test_vorbis_ogg_page_layer():
    """Ogg framing (RFC 3533): packet reassembly across spanning
    pages and 255-multiple nil terminators, CRC verification, BOS/EOS
    discipline, sequence-gap and continued-flag validation."""
    from netcdf4_variable_streamer_spark.functions import vorbis as V

    pkts = [b"a" * 10, b"b" * 600, b"c" * 255, b"", b"d" * 5000]
    grans = [0, 64, 128, 128, 256]
    stream = V.ogg_pages(pkts, 0x1234, grans, max_body=700)
    out, g, serial = V.ogg_depage(stream)
    assert out == pkts and serial == 0x1234
    # every single-bit corruption of the stream must surface as a
    # named ValueError (CRC catches body/header flips)
    rng = np.random.RandomState(7)
    for _ in range(200):
        bad = bytearray(stream)
        bad[rng.randint(len(bad))] ^= 1 << rng.randint(8)
        if bytes(bad) == stream:
            continue
        with pytest.raises((ValueError, NotImplementedError)):
            V.ogg_depage(bytes(bad))
    with pytest.raises(ValueError, match="EOS"):
        V.ogg_depage(stream[: stream.index(b"OggS", 4)])
    # Vorbis embedding rules (spec A.2, round-18 review): the BOS
    # page carries the identification header ALONE and audio starts
    # on a fresh page after the setup header
    vs, _ = _vorbis_mono_fixture(0)
    first_nsegs = vs[26]
    first_lace = list(vs[27 : 27 + first_nsegs])
    hdr_pkts, _, _ = V.ogg_depage(vs)
    assert sum(first_lace) == len(hdr_pkts[0])
    assert first_lace[-1] < 255


def test_vorbis_roundtrip_integer_observables():
    """Both fixture variants decode through the generic bitstream
    decoder with BIT-EXACT integer observables: floor Y sums, rounded
    residue sums, packet and sample counts (incl. the dual-blocksize
    pn/4 + n/4 lapping arithmetic)."""
    from netcdf4_variable_streamer_spark.functions import vorbis as V
    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_audio_any,
    )

    for doc in (0, 7):
        stream, frames = _vorbis_mono_fixture(doc)
        st = V.vorbis_stream_stats(stream)
        assert st["floor_checksum"] == sum(
            sum(fr[0]) for fr in frames
        )
        assert st["residue_checksum"] == sum(
            sum(fr[2]) for fr in frames
        )
        assert st["n_samples"] == 3 * 64 and st["n_packets"] == 4
        pcm, rate = decode_audio_any(stream)
        assert rate == 8000 and pcm.shape == (192,)
        assert pcm.dtype == np.int16

        stream, frames = _vorbis_stereo_fixture(doc)
        st = V.vorbis_stream_stats(stream)
        assert st["floor_checksum"] == sum(
            sum(ys[ch]) for (_, ys, _, _, _) in frames
            for ch in range(2)
        )

        def dsum(e):
            return (
                (e % 2) + (e // 2 % 2) + (e // 4 % 2) + (e % 4) - 8
            )

        rc = sum(
            sum(map(dsum, p0)) + sum(p1)
            for (_, _, _, p0, p1) in frames
        )
        assert st["residue_checksum"] == rc
        # lapping: [0,1,1,0] -> (16+64) + (64+64) + (64+16)
        assert st["n_samples"] == 288 and st["channels"] == 2
        pcm, rate = decode_audio_any(stream)
        assert rate == 16000 and pcm.shape == (288, 2)


def test_vorbis_synthesis_analytic_identities():
    """The float synthesis tail is pinned by spec-derivable math, not
    fixture agreement: (a) the window satisfies Princen-Bradley
    w^2[k] + w^2[k+n/2] = 1 exactly; (b) IMDCT output carries the
    TDAC symmetries (first half antisymmetric, second half
    symmetric); (c) PERFECT RECONSTRUCTION: random integer spectra
    fed through the decoder (flat floor at amplitude 1.0), analyzed
    by a TEST-LOCAL forward MDCT, return the spectra at one uniform
    gain of n/4 — any window/basis/lapping mistake breaks the ratio
    uniformity."""
    from netcdf4_variable_streamer_spark.functions import vorbis as V

    for n in (64, 128, 256, 512):
        w = V._vorbis_window(n)
        assert np.allclose(
            w[: n // 2] ** 2 + w[n // 2 :] ** 2, 1.0, atol=1e-12
        )
    rng = np.random.RandomState(1)
    for n in (64, 256):
        y = V._imdct(rng.randn(n // 2))
        assert np.allclose(y[: n // 2], -y[: n // 2][::-1], atol=1e-9)
        assert np.allclose(y[n // 2 :], y[n // 2 :][::-1], atol=1e-9)
    F, n, n2 = 8, 128, 64
    specs = rng.randint(-8, 9, (F, n2))
    frames = [
        ((255, 255), [1] * 8, [int(v) for v in specs[f]])
        for f in range(F)
    ]
    stream = V.encode_ogg_vorbis_mono(frames)
    pkts, _, _ = V.ogg_depage(stream)
    dec = V.VorbisDecoder(V.parse_headers(pkts))
    out = np.concatenate(
        [dec.decode_packet(p) for p in pkts[3:]]
    )[:, 0]
    w = V._vorbis_window(n)
    k = np.arange(n)[:, None]
    j = np.arange(n2)[None, :]
    fwd = np.cos(np.pi / (2 * n) * (2 * k + 1 + n / 2) * (2 * j + 1))
    ratios = []
    for f in range(1, F - 1):
        seg = out[(f - 1) * n2 : (f - 1) * n2 + n]
        X = (seg * w) @ fwd
        nz = specs[f] != 0
        assert np.allclose(
            X[~nz], 0, atol=1e-9 * max(1, abs(X).max())
        )
        ratios.append(X[nz] / specs[f][nz])
    ratios = np.concatenate(ratios)
    assert np.allclose(ratios, n / 4, rtol=1e-9)


def test_vorbis_refusals_and_mutation_sweep():
    """Refusal envelope: floor type 0 (LSP), nonzero mapping type,
    nonzero time transform, codebook allocation bombs,
    over/underspecified Huffman trees, version != 0 — each by name;
    then a 12k-case bit-flip/truncation/burst sweep over both fixture
    variants surfaces only ValueError / NotImplementedError."""
    from netcdf4_variable_streamer_spark.functions import vorbis as V
    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_audio_any,
    )

    def headers_with(floors=None, mappings=None, times_ok=True):
        vbook = V.BookSpec(
            32, 1, [5] * 32, lookup_type=1, minimum=-15.0,
            delta=1.0, value_bits=5,
            multiplicands=list(range(32)),
        )

        def def_floors(bw):
            bw.write(0, 6)
            bw.write(1, 16)
            bw.write(0, 5)
            bw.write(0, 2)
            bw.write(6, 4)

        def def_res(bw):
            bw.write(0, 6)
            bw.write(1, 16)
            bw.write(0, 24)
            bw.write(64, 24)
            bw.write(7, 24)
            bw.write(0, 6)
            bw.write(0, 8)
            bw.write(1, 3)
            bw.write(0, 1)
            bw.write(0, 8)

        def def_maps(bw):
            bw.write(0, 6)
            bw.write(0, 16)
            bw.write(0, 1)
            bw.write(0, 1)
            bw.write(0, 2)
            bw.write(0, 8)
            bw.write(0, 8)
            bw.write(0, 8)

        return V._vorbis_headers(
            1, 8000, 128, 128, [vbook],
            floors or def_floors, def_res, mappings or def_maps,
            modes=[0],
        )

    def bad_floor0(bw):
        bw.write(0, 6)
        bw.write(0, 16)  # floor type 0

    with pytest.raises(NotImplementedError, match="floor type 0"):
        V.parse_headers(headers_with(floors=bad_floor0))

    def bad_maptype(bw):
        bw.write(0, 6)
        bw.write(3, 16)

    with pytest.raises(NotImplementedError, match="mapping type 3"):
        V.parse_headers(headers_with(mappings=bad_maptype))
    # codebook bombs and malformed trees, straight at the parser
    bw = V.BitWriter()
    bw.write(0x564342, 24)
    bw.write(1, 16)
    bw.write(1 << 21, 24)  # 2M entries
    with pytest.raises(ValueError, match="implausible"):
        V.parse_codebook(V.BitReader(bw.bytes() + b"\0" * 64))
    with pytest.raises(ValueError, match="underspecified"):
        V.assign_codewords([2, 2, 2])
    with pytest.raises(ValueError, match="overspecified"):
        V.assign_codewords([1, 1, 2])
    # version byte in the identification header
    mono, _ = _vorbis_mono_fixture(3)
    pkts, grans, serial = V.ogg_depage(mono)
    bad_ident = pkts[0][:7] + b"\x09" + pkts[0][8:]
    with pytest.raises(ValueError, match="version"):
        V.parse_headers([bad_ident] + pkts[1:])

    # mutation sweep over both variants
    stereo, _ = _vorbis_stereo_fixture(3)
    rng = np.random.RandomState(18)
    for base in (mono, stereo):
        for _ in range(6000):
            mut = bytearray(base)
            kind = rng.randint(3)
            if kind == 0:
                mut[rng.randint(len(mut))] ^= 1 << rng.randint(8)
            elif kind == 1:
                mut = mut[: rng.randint(len(mut))]
            else:
                for _ in range(rng.randint(1, 8)):
                    mut[rng.randint(len(mut))] ^= rng.randint(1, 256)
            try:
                decode_audio_any(bytes(mut))
            except (ValueError, NotImplementedError):
                pass


def test_fuzz11_g4_tiled_edges_and_photometric_composition():
    """Fuzz round 11 target 1 (VERDICT r17 #6): G4 x tiled layouts at
    edge-crop shapes composed with BOTH photometrics and (round 18)
    FillOrder 2 — grid placement, pad cropping and inversion must
    compose, and bit-flips over the tile directory and tile data must
    refuse, never mis-place a tile."""
    import struct as _struct

    from netcdf4_variable_streamer_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.RandomState(11)
    for h, w in [(17, 19), (16, 33), (47, 15), (16, 16)]:
        page = (rng.randint(0, 2, (h, w)) * 255).astype(np.uint8)
        for fo in (1, 2):
            f = encode_tiff(
                page, compression="g4", tile=(16, 16), fill_order=fo
            )
            got = decode_tiff(f)
            assert got.shape == (h, w)
            # G4 encodes photometric 0 (WhiteIsZero): bilevel content
            # must round-trip exactly after the inversion convention
            assert (got == page).all(), (h, w, fo)
        # photometric flip: patch tag 262 to 1 (BlackIsZero) — pixels
        # must invert, not silently stay
        f = bytearray(
            encode_tiff(page, compression="g4", tile=(16, 16))
        )
        i = f.index(_struct.pack("<HH", 262, 3)) + 8
        f[i : i + 2] = _struct.pack("<H", 1)
        assert (decode_tiff(bytes(f)) == 255 - page).all()
    # mutation sweep over one tiled G4 FillOrder-2 file
    base = encode_tiff(
        (rng.randint(0, 2, (33, 47)) * 255).astype(np.uint8),
        compression="g4", tile=(16, 16), fill_order=2,
    )
    ok = 0
    for _ in range(3000):
        mut = bytearray(base)
        if rng.randint(2):
            mut[rng.randint(len(mut))] ^= 1 << rng.randint(8)
        else:
            mut = mut[: rng.randint(len(mut))]
        try:
            decode_tiff(bytes(mut))
            ok += 1
        except (ValueError, NotImplementedError):
            pass
    assert ok < 3000  # corruption is actually being caught


def test_fuzz11_adpcm_blockalign_lies_and_truncation():
    """Fuzz round 11 target 2: stereo IMA ADPCM with lying blockAlign
    / samplesPerBlock header fields and truncated final blocks must
    refuse by name (incl. the round-18 fact-chunk rule), never return
    silently wrong-length audio."""
    import struct as _struct

    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    rng = np.random.RandomState(11)
    s = rng.randint(-3000, 3000, (300, 2)).astype(np.int16)
    base = mm.encode_wav_ima_adpcm(s, 8000, block_nibbles=64)
    ref, rate = mm.decode_wav_pcm16(base)
    assert rate == 8000 and ref.shape == s.shape

    def patch_fmt(payload, off, val):
        b = bytearray(payload)
        i = b.index(b"fmt ") + 8 + off
        _struct.pack_into("<H", b, i, val)
        return bytes(b)

    # blockAlign lies: not headers + whole 8-byte groups -> named
    with pytest.raises(ValueError, match="blockAlign"):
        mm.decode_wav_pcm16(patch_fmt(base, 12, 13))
    # samplesPerBlock exceeding block capacity -> named
    with pytest.raises(ValueError, match="capacity"):
        mm.decode_wav_pcm16(patch_fmt(base, 18, 60000))
    # truncation inside a block refuses with the slot-count error;
    # truncation at a BLOCK boundary survives per-block checks and
    # must then trip the round-18 fact-chunk rule
    fi = base.index(b"fmt ")
    (balign,) = _struct.unpack_from("<H", base, fi + 8 + 12)
    di = base.index(b"data")
    (dsize,) = _struct.unpack_from("<I", base, di + 4)
    b = bytearray(base[: di + 8 + dsize - 40])
    _struct.pack_into("<I", b, di + 4, dsize - 40)
    with pytest.raises(ValueError, match="sample slots"):
        mm.decode_wav_pcm16(bytes(b))
    cut = (dsize // balign - 1) * balign
    b = bytearray(base[: di + 8 + cut])
    _struct.pack_into("<I", b, di + 4, cut)
    with pytest.raises(ValueError, match="fact chunk declares"):
        mm.decode_wav_pcm16(bytes(b))
    # mutation sweep
    for _ in range(3000):
        mut = bytearray(base)
        if rng.randint(2):
            mut[rng.randint(len(mut))] ^= 1 << rng.randint(8)
        else:
            mut = mut[: rng.randint(len(mut))]
        try:
            mm.decode_wav_pcm16(bytes(mut))
        except (ValueError, NotImplementedError):
            pass


def test_fuzz11_png_palette_trns_and_adam7_edges():
    """Fuzz round 11 target 3: palette/tRNS chunk-length edges (zero
    PLTE, non-multiple-of-3 PLTE, round-18 oversized tRNS) and Adam7
    pass grids at degenerate shapes (1xN, Nx1, pass-empty sizes) —
    every pixel exactly once, every malformed chunk a named error."""
    import struct as _struct
    import zlib as _zlib

    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    def chunk(t, b):
        return (
            _struct.pack(">I", len(b)) + t + b
            + _struct.pack(">I", _zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    rng = np.random.RandomState(11)
    # Adam7 degenerate shapes: interlaced gray8, every pixel once
    for h, w in [(1, 1), (1, 9), (9, 1), (2, 3), (5, 5), (8, 8)]:
        g = rng.randint(0, 256, (h, w)).astype(np.uint8)
        rows = bytearray()
        for y0, x0, dy, dx in (
            (0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4),
            (0, 2, 4, 4), (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1),
        ):
            sub = g[y0:h:dy, x0:w:dx]
            if sub.size == 0:
                continue
            for r in sub:
                rows += b"\x00" + r.tobytes()
        png = (
            mm._PNG_SIG
            + chunk(
                b"IHDR",
                _struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1),
            )
            + chunk(b"IDAT", _zlib.compress(bytes(rows)))
            + chunk(b"IEND", b"")
        )
        assert (mm.decode_png(png)[:, :, 0] == g).all(), (h, w)
    # malformed palette chunks refuse by name
    base = lambda plte, trns=None: (
        mm._PNG_SIG
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + (chunk(b"tRNS", trns) if trns else b"")
        + chunk(b"IDAT", _zlib.compress(b"\x00\x00\x01"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        mm.decode_png(base(b"\x01\x02"))  # not a multiple of 3
    with pytest.raises(ValueError, match="tRNS"):
        mm.decode_png(base(b"\x00" * 6, b"\x00\x01\x02"))  # 3 > 2


def test_fuzz11_scanned_archive_dispatch_chimeras():
    """Fuzz round 11 target 4: chimeras over the (now six-variant)
    TIFF corpus — headers of one variant grafted onto strip data of
    another (G4 counts over PackBits bytes, FillOrder-2 tag over
    MSB data, tile tags over strip data) must refuse or decode to a
    full-shape image, never crash or return a partial array."""
    import struct as _struct

    from netcdf4_variable_streamer_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.RandomState(11)
    page = (rng.randint(0, 2, (18, 26)) * 255).astype(np.uint8)
    gray = rng.randint(0, 256, (18, 26)).astype(np.uint8)
    variants = [
        encode_tiff(gray, compression="none"),
        encode_tiff(gray, compression="packbits", rows_per_strip=5),
        encode_tiff(page, compression="g4", rows_per_strip=5),
        encode_tiff(gray, compression="packbits", tile=(16, 16)),
        encode_tiff(page, compression="g4", tile=(16, 16)),
        encode_tiff(
            page, compression="g4", rows_per_strip=5, fill_order=2
        ),
    ]
    # graft: take each file's IFD, splice the strip/tile DATA region
    # of every other file behind it
    for a in variants:
        for b in variants:
            if a is b:
                continue
            cut = min(64, len(a) // 2)
            chimera = a[:cut] + b[cut:] + b[:cut]
            try:
                img = decode_tiff(chimera)
                assert img.shape[0] == 18 and img.shape[1] == 26
            except (ValueError, NotImplementedError):
                pass
    # cross-tag graft: set the FillOrder tag on every MSB variant
    for v in variants[:5]:
        b = bytearray(v)
        try:
            i = b.index(_struct.pack("<HH", 266, 3)) + 8
            b[i : i + 2] = _struct.pack("<H", 2)
        except ValueError:
            continue  # variant carries no FillOrder tag
        try:
            img = decode_tiff(bytes(b))
            assert img.shape == (18, 26)
        except (ValueError, NotImplementedError):
            pass


def test_vorbis_decoder_generic_paths():
    """The decoder is generic over the bitstream, not over what the
    in-repo encoder emits — exercise the setup/packet paths the two
    fixture variants never produce: (a) ORDERED codebook length
    lists; (b) SPARSE codebooks with unused entries; (c) lookup-1
    multi-dim integer-root reconstruction WITH sequence_p cascading;
    (d) floor1 subclass_bits > 0 routing points through a MASTERBOOK
    codeword; (e) residue type 0's strided vector placement."""
    from netcdf4_variable_streamer_spark.functions import vorbis as V

    # (a) ordered lengths [1,2,3,4,5,6,7,7] (Kraft-complete)
    bw = V.BitWriter()
    bw.write(0x564342, 24)
    bw.write(1, 16)
    bw.write(8, 24)
    bw.write(1, 1)  # ordered
    bw.write(0, 5)  # initial length 1
    for cur, bits, num in (
        (0, 4, 1), (1, 3, 1), (2, 3, 1), (3, 3, 1),
        (4, 3, 1), (5, 2, 1), (6, 2, 2),
    ):
        bw.write(num, bits)
    bw.write(0, 4)  # lookup type 0
    cb = V.parse_codebook(V.BitReader(bw.bytes()))
    assert cb.codewords == V.assign_codewords(
        [1, 2, 3, 4, 5, 6, 7, 7]
    )

    # (b) sparse: entries [used len1, unused, len2, len3, unused, len3]
    bw = V.BitWriter()
    bw.write(0x564342, 24)
    bw.write(1, 16)
    bw.write(6, 24)
    bw.write(0, 1)  # unordered
    bw.write(1, 1)  # sparse
    for used, ln in ((1, 1), (0, 0), (1, 2), (1, 3), (0, 0), (1, 3)):
        bw.write(used, 1)
        if used:
            bw.write(ln - 1, 5)
    bw.write(0, 4)
    cb = V.parse_codebook(V.BitReader(bw.bytes()))
    assert set(cb.codewords) == {0, 2, 3, 5}
    assert cb.codewords == V.assign_codewords(
        [1, None, 2, 3, None, 3]
    )

    # (c) lookup-1, dim 2, entries 9 -> lookup_values 3, sequence_p=1
    bw = V.BitWriter()
    bw.write(0x564342, 24)
    bw.write(2, 16)
    bw.write(9, 24)
    bw.write(0, 1)
    bw.write(0, 1)
    lens = [3, 3, 3, 3, 3, 3, 3, 4, 4]  # Kraft: 7/8 + 2/16 = 1
    for ln in lens:
        bw.write(ln - 1, 5)
    bw.write(1, 4)  # lookup type 1
    bw.write(V.float32_pack(10.0), 32)
    bw.write(V.float32_pack(1.0), 32)
    bw.write(1, 4)  # value_bits 2
    bw.write(1, 1)  # sequence_p = 1
    for m in (0, 1, 2):
        bw.write(m, 2)
    cb = V.parse_codebook(V.BitReader(bw.bytes()))
    assert cb.lookup_values == 3 and cb.sequence_p == 1
    # entry 5 -> offsets (5 % 3, 5 // 3 % 3) = (2, 1):
    # v0 = 10 + 2 = 12; v1 = v0 + 10 + 1 = 23 (sequence cascade)
    code, ln = cb.codewords[5]
    bw2 = V.BitWriter()
    for i in range(ln - 1, -1, -1):
        bw2.write((code >> i) & 1, 1)
    assert cb.decode_vector(V.BitReader(bw2.bytes())) == [12.0, 23.0]

    # (d) floor1 masterbook routing: cbits=1, 2 subclass books with
    # DIFFERENT decode tables; the masterbook codeword picks per point
    master = V.BookSpec(2, 1, [1, 1])
    sub_a = V.BookSpec(4, 1, [2, 2, 2, 2])
    sub_b = V.BookSpec(8, 1, [3] * 8)
    books = [None, None, None]
    fl = V.Floor1()
    fl.partition_classes = [0]
    fl.class_dims = [2]
    fl.class_subclass_bits = [1]
    fl.class_masterbooks = [0]
    fl.subclass_books = [[1, 2]]
    fl.multiplier = 1
    fl.rangebits = 6
    fl.x_list = [0, 64, 16, 48]

    def mkbook(spec):
        cb = V.Codebook()
        cb.dimensions = spec.dim
        cb.entries = spec.entries
        cb.decode_map = {
            (1 << ln) | code: e
            for e, (code, ln) in spec.codewords.items()
        }
        cb.max_len = max(ln for _, ln in spec.codewords.values())
        cb.lookup_type = 0
        return cb

    books = [mkbook(master), mkbook(sub_a), mkbook(sub_b)]
    bw = V.BitWriter()
    bw.write(1, 1)  # nonzero
    bw.write(100, 8)
    bw.write(50, 8)
    # masterbook cval = entry 1 -> bits: point 0 book = subclass[1]
    # (sub_b), point 1 book = subclass[0] (sub_a)
    c, ln = master.codewords[1]
    for i in range(ln - 1, -1, -1):
        bw.write((c >> i) & 1, 1)
    c, ln = sub_b.codewords[5]
    for i in range(ln - 1, -1, -1):
        bw.write((c >> i) & 1, 1)
    c, ln = sub_a.codewords[2]
    for i in range(ln - 1, -1, -1):
        bw.write((c >> i) & 1, 1)
    y = V.decode_floor1_yvals(V.BitReader(bw.bytes()), fl, books)
    assert y == [100, 50, 5, 2]
    # and the curve renders monotone segments into amplitude domain
    curve = V.floor1_curve(fl, y, 64)
    assert curve.shape == (64,) and (curve > 0).all()

    # (e) residue type 0: stride placement — one partition, book dim
    # 4 over partition_size 8 -> step 2, vec d lands at off + s + d*2
    vb = V.BookSpec(
        16, 4, [4] * 16, lookup_type=1, minimum=0.0, delta=1.0,
        value_bits=2, multiplicands=[0, 1],
    )
    r = V.Residue()
    r.rtype = 0
    r.begin = 0
    r.end = 8
    r.partition_size = 8
    r.classifications = 2
    r.classbook = 0
    r.cascade = [0, 1]
    r.books = [[None] * 8, [1] + [None] * 7]
    clsb = V.BookSpec(4, 2, [2, 2, 2, 2])
    dbooks = [None, None]

    def mkvq(spec):
        cb = mkbook(spec)
        cb.lookup_type = spec.lookup_type
        cb.minimum = spec.minimum
        cb.delta = spec.delta
        cb.sequence_p = 0
        cb.lookup_values = 2
        cb.multiplicands = spec.multiplicands
        return cb

    dbooks = [mkbook(clsb), mkvq(vb)]
    bw = V.BitWriter()
    # classword: single channel, classwords=2 but parts=1 -> one
    # codeword covers it; class of partition 0 must be 1:
    # entry = temp with temp % 2 assigned to index 1.. (i=1 gets
    # pcount+1 which is PAST parts) — entry 2 gives class[0]=1
    c, ln = clsb.codewords[2]
    for i in range(ln - 1, -1, -1):
        bw.write((c >> i) & 1, 1)
    # two vectors: entry 0b0110 -> mults (0,1,1,0); entry 0b1001
    for e in (6, 9):
        c, ln = vb.codewords[e]
        for i in range(ln - 1, -1, -1):
            bw.write((c >> i) & 1, 1)
    out = V._residue_core(
        V.BitReader(bw.bytes()), r, dbooks, 1, 8, [False]
    )[0]
    # entry 6 mult offsets: (6%2, 6//2%2, 6//4%2, 6//8%2) = (0,1,1,0)
    # placed at 0,2,4,6; entry 9 -> (1,0,0,1) placed at 1,3,5,7
    assert list(out) == [0, 1, 1, 0, 1, 0, 0, 1]


def test_png_16bit_depth_all_colors():
    """Round-18 16-bit PNG (the scientific/HDR sample class — closes
    a named r17 refusal): gray/RGB/gray-alpha/RGBA at depth 16 decode
    to uint16 with big-endian pair unpacking, plain AND Adam7
    interlaced; the Sub filter's left-neighbor distance is the full
    2*spp bytes; tRNS keys match at FULL 16-bit range with a
    65535-opaque alpha plane; palette stays 8-bit-max by spec; 8-bit
    decode is unchanged; mutation sweep refuses controlled."""
    import struct as _struct
    import zlib as _zlib

    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )

    def chunk(t, b):
        return (
            _struct.pack(">I", len(b)) + t + b
            + _struct.pack(">I", _zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    rng = np.random.RandomState(18)
    for color, spp in ((0, 1), (2, 3), (4, 2), (6, 4)):
        for interlace in (0, 1):
            h, w = 5, 7
            g = rng.randint(0, 65536, (h, w, spp)).astype(np.uint16)
            rows = bytearray()
            passes = (
                mm._ADAM7 if interlace else ((0, 0, 1, 1),)
            )
            for x0, y0, dx, dy in passes:
                sub = g[y0:h:dy, x0:w:dx]
                if sub.size == 0:
                    continue
                for r in sub:
                    rows += b"\x00" + r.astype(">u2").tobytes()
            png = (
                mm._PNG_SIG
                + chunk(
                    b"IHDR",
                    _struct.pack(
                        ">IIBBBBB", w, h, 16, color, 0, 0, interlace
                    ),
                )
                + chunk(b"IDAT", _zlib.compress(bytes(rows)))
                + chunk(b"IEND", b"")
            )
            out = mm.decode_png(png)
            assert out.dtype == np.uint16
            assert out.shape == (h, w, spp)
            assert (out == g).all(), (color, interlace)
    # Sub filter at bpp = 2 bytes (gray16)
    h, w = 3, 6
    g = rng.randint(0, 65536, (h, w)).astype(np.uint16)
    rows = bytearray()
    for r in g:
        raw = r.astype(">u2").tobytes()
        filt = bytearray(raw)
        for i in range(len(raw) - 1, 1, -1):
            filt[i] = (raw[i] - raw[i - 2]) % 256
        rows += b"\x01" + bytes(filt)
    png = (
        mm._PNG_SIG
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )
    assert (mm.decode_png(png)[:, :, 0] == g).all()
    # full-range tRNS key, 65535-opaque alpha
    g = np.array([[1000, 65535, 1000]], np.uint16)
    png = (
        mm._PNG_SIG
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 3, 1, 16, 0, 0, 0, 0))
        + chunk(b"tRNS", _struct.pack(">H", 65535))
        + chunk(
            b"IDAT",
            _zlib.compress(b"\x00" + g[0].astype(">u2").tobytes()),
        )
        + chunk(b"IEND", b"")
    )
    out = mm.decode_png(png)
    assert out.dtype == np.uint16 and list(out[0, :, 1]) == [
        65535, 0, 65535,
    ]
    # 16-bit palette is invalid by spec and still refuses by name
    with pytest.raises(NotImplementedError, match="depth=16 color=3"):
        mm.decode_png(
            mm._PNG_SIG
            + chunk(
                b"IHDR",
                _struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0),
            )
            + chunk(b"IEND", b"")
        )
    # 8-bit regression
    img = rng.randint(0, 256, (9, 11, 3)).astype(np.uint8)
    assert (mm.decode_png(mm.encode_png(img))[:, :, :3] == img).all()
    # mutation sweep over a 16-bit interlaced RGBA file
    g = rng.randint(0, 65536, (8, 9, 4)).astype(np.uint16)
    rows = bytearray()
    for x0, y0, dx, dy in mm._ADAM7:
        sub = g[y0:8:dy, x0:9:dx]
        for r in sub:
            rows += b"\x00" + r.astype(">u2").tobytes()
    base = (
        mm._PNG_SIG
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 9, 8, 16, 6, 0, 0, 1))
        + chunk(b"IDAT", _zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )
    for _ in range(2000):
        mut = bytearray(base)
        if rng.randint(2):
            mut[rng.randint(len(mut))] ^= 1 << rng.randint(8)
        else:
            mut = mut[: rng.randint(len(mut))]
        try:
            mm.decode_png(bytes(mut))
        except (ValueError, NotImplementedError):
            pass


def test_vorbis_silent_channel_packet():
    """A floor nonzero flag of 0 marks the channel silent: the floor
    reads nothing further, the residue skips the channel entirely
    (do-not-decode), and the synthesis yields zeros — a path the
    fixture encoders never emit."""
    from netcdf4_variable_streamer_spark.functions import vorbis as V

    stream, frames = _vorbis_mono_fixture(1)
    pkts, _, _ = V.ogg_depage(stream)
    setup = V.parse_headers(pkts)
    dec = V.VorbisDecoder(setup)
    dec.decode_packet(pkts[3])  # prime the lapping state
    fc0, rc0 = dec.floor_checksum, dec.residue_checksum
    bw = V.BitWriter()
    bw.write(0, 1)  # audio packet
    bw.write(0, 1)  # floor nonzero = 0 -> silent, packet ends here
    out = dec.decode_packet(bw.bytes())
    assert out.shape == (64, 1)
    # left half of this block is silent; only the previous block's
    # windowed right half remains
    assert dec.floor_checksum == fc0
    assert dec.residue_checksum == rc0
    # a fully-silent pair produces exact zeros
    out2 = dec.decode_packet(bw.bytes())
    bw2 = V.BitWriter()
    bw2.write(0, 1)
    bw2.write(0, 1)
    out3 = dec.decode_packet(bw2.bytes())
    assert (out3 == 0).all()


@_SETTINGS
@given(
    seed=st.integers(0, 10**6),
    n_frames=st.integers(1, 7),
    stereo=st.booleans(),
)
def test_vorbis_roundtrip_hypothesis(seed, n_frames, stereo):
    """Property round-trip: ARBITRARY frame content (random floor Y
    values, random partition classes, random in-range residues,
    random block-size sequences for the stereo variant) encodes to a
    stream whose generic decode reproduces the integer observables
    bit-exactly and yields the lapping-arithmetic sample count."""
    from netcdf4_variable_streamer_spark.functions import vorbis as V

    rng = np.random.RandomState(seed)
    if not stereo:
        frames = []
        for _ in range(n_frames):
            y = (int(rng.randint(256)), int(rng.randint(256)))
            classes = [int(rng.randint(2)) for _ in range(8)]
            rv = [
                int(rng.randint(-15, 17)) if classes[p] else 0
                for p in range(8)
                for _ in range(8)
            ]
            frames.append((y, classes, rv))
        stream = V.encode_ogg_vorbis_mono(frames)
        st_ = V.vorbis_stream_stats(stream)
        assert st_["floor_checksum"] == sum(
            sum(fr[0]) for fr in frames
        )
        assert st_["residue_checksum"] == sum(
            sum(fr[2]) for fr in frames
        )
        assert st_["n_samples"] == (n_frames - 1) * 64
        return
    flags = [int(rng.randint(2)) for _ in range(n_frames)]
    frames = []
    for bf in flags:
        parts = (256 if bf else 64) // 8
        ys = tuple(
            (
                int(rng.randint(128)), int(rng.randint(128)),
                int(rng.randint(16)), int(rng.randint(16)),
                int(rng.randint(16)),
            )
            for _ in range(2)
        )
        classes = [int(rng.randint(2)) for _ in range(parts)]
        p0, p1 = [], []
        for q in range(parts):
            if classes[q]:
                p0 += [int(rng.randint(8)), int(rng.randint(8))]
                p1 += [int(rng.randint(-15, 17)) for _ in range(8)]
        frames.append((bf, ys, classes, p0, p1))
    stream = V.encode_ogg_vorbis_stereo(frames)
    st_ = V.vorbis_stream_stats(stream)
    assert st_["floor_checksum"] == sum(
        sum(ys[ch]) for (_, ys, _, _, _) in frames for ch in range(2)
    )

    def dsum(e):
        return (e % 2) + (e // 2 % 2) + (e // 4 % 2) + (e % 4) - 8

    assert st_["residue_checksum"] == sum(
        sum(map(dsum, p0)) + sum(p1)
        for (_, _, _, p0, p1) in frames
    )
    ns, prev = 0, None
    for bf in flags:
        n = 256 if bf else 64
        if prev is not None:
            ns += prev // 4 + n // 4
        prev = n
    assert st_["n_samples"] == ns


def _palette_tiff(idx, depth, comp=1, tile=None, strips_of=None):
    """Test-local palette-TIFF writer (independent IFD layout):
    ColorMap[i][c] = ((i*37 + c*101) % 256) * 257."""
    import struct as _struct

    from netcdf4_variable_streamer_spark.functions.tiff import (
        _packbits,
    )

    h, w = idx.shape
    nmap = 1 << depth
    cmap = []
    for c in range(3):
        cmap += [((i * 37 + c * 101) % 256) * 257 for i in range(nmap)]

    def pack_rows(a):
        if depth == 8:
            raw = a.tobytes()
        else:
            out = bytearray()
            for r in a:
                rr = list(r) + [0] * (len(r) % 2)
                for i in range(0, len(rr), 2):
                    out.append((rr[i] << 4) | rr[i + 1])
            raw = bytes(out)
        if comp == 32773:
            rb = len(raw) // a.shape[0]
            return b"".join(
                _packbits(raw[i * rb : (i + 1) * rb])
                for i in range(a.shape[0])
            )
        return raw

    chunks = []
    rps = h
    if tile:
        tl_, tw_ = tile
        gh, gw = -(-h // tl_) * tl_, -(-w // tw_) * tw_
        grid = np.zeros((gh, gw), np.uint8)
        grid[:h, :w] = idx
        for y0 in range(0, gh, tl_):
            for x0 in range(0, gw, tw_):
                chunks.append(
                    pack_rows(grid[y0 : y0 + tl_, x0 : x0 + tw_])
                )
    elif strips_of:
        rps = strips_of
        for r0 in range(0, h, rps):
            chunks.append(pack_rows(idx[r0 : r0 + rps]))
    else:
        chunks.append(pack_rows(idx))
    entries = [
        (256, 3, 1, [w]), (257, 3, 1, [h]), (258, 3, 1, [depth]),
        (259, 3, 1, [comp]), (262, 3, 1, [3]), (277, 3, 1, [1]),
        (320, 3, len(cmap), cmap),
    ]
    if tile:
        entries += [
            (322, 3, 1, [tile[1]]), (323, 3, 1, [tile[0]]),
            (324, 4, len(chunks), None),
            (325, 4, len(chunks), [len(x) for x in chunks]),
        ]
        off_tag = 324
    else:
        entries += [
            (273, 4, len(chunks), None), (278, 3, 1, [rps]),
            (279, 4, len(chunks), [len(x) for x in chunks]),
        ]
        off_tag = 273
    entries.sort()
    ifd = 8
    data_off = ifd + 2 + 12 * len(entries) + 4
    oline = {}
    for tag, typ, cnt, vals in entries:
        size = (2 if typ == 3 else 4) * cnt
        if size > 4:
            oline[tag] = data_off
            data_off += size
    soffs = []
    o = data_off
    for x in chunks:
        soffs.append(o)
        o += len(x)
    out = bytearray(
        b"II*\x00" + _struct.pack("<I", ifd)
        + _struct.pack("<H", len(entries))
    )
    blobs = bytearray()
    for tag, typ, cnt, vals in entries:
        if tag == off_tag:
            vals = soffs
        fmt = "H" if typ == 3 else "I"
        rawv = _struct.pack(f"<{cnt}{fmt}", *vals)
        out += _struct.pack("<HHI", tag, typ, cnt)
        if len(rawv) <= 4:
            out += rawv.ljust(4, b"\0")
        else:
            out += _struct.pack("<I", oline[tag])
            blobs += rawv
    out += _struct.pack("<I", 0)
    out += blobs
    for x in chunks:
        out += x
    return bytes(out)


def test_tiff_palette_colormap_decode():
    """Round-18 palette TIFF (photometric 3 — the older-archive
    indexed-color class): 4-bit (MSB-first nibbles, byte-aligned
    rows) and 8-bit indices decode through the 16-bit ColorMap's
    high byte, across single-strip / multi-strip / tiled layouts
    and uncompressed / PackBits; missing or short ColorMaps,
    predictor 2 over indices, and 16-bit palette refuse by name;
    mutation sweep stays controlled."""
    import struct as _struct

    from netcdf4_variable_streamer_spark.functions.tiff import (
        decode_tiff,
    )

    rng = np.random.RandomState(18)
    for depth in (4, 8):
        idx = (
            np.arange(7 * 9).reshape(7, 9) % (1 << depth)
        ).astype(np.uint8)
        exp = np.zeros((7, 9, 3), np.uint8)
        for c in range(3):
            lut = np.array(
                [(i * 37 + c * 101) % 256 for i in range(1 << depth)],
                np.uint8,
            )
            exp[:, :, c] = lut[idx]
        for kw in (
            {},
            {"strips_of": 3},
            {"tile": (16, 16)},
            {"comp": 32773},
            {"comp": 32773, "strips_of": 2},
        ):
            f = _palette_tiff(idx, depth, **kw)
            got = decode_tiff(f)
            assert got.shape == (7, 9, 3) and (got == exp).all(), (
                depth, kw,
            )
    # refusals
    base = _palette_tiff(idx, 8)
    i = base.index(_struct.pack("<HH", 320, 3))
    no_cmap = base[:i] + base[i + 12 :]
    # (count byte in the IFD header must drop too)
    n = bytearray(no_cmap)
    _struct.pack_into(
        "<H", n, 8, _struct.unpack_from("<H", no_cmap, 8)[0] - 1
    )
    with pytest.raises(ValueError, match="ColorMap"):
        decode_tiff(bytes(n))
    b = bytearray(base)
    j = b.index(_struct.pack("<HH", 258, 3)) + 8
    b[j : j + 2] = _struct.pack("<H", 16)
    with pytest.raises(NotImplementedError, match="palette"):
        decode_tiff(bytes(b))
    # mutation sweep over a PackBits 4-bit palette file
    pal = _palette_tiff(idx % 16, 4, comp=32773, strips_of=2)
    for _ in range(2000):
        mut = bytearray(pal)
        if rng.randint(2):
            mut[rng.randint(len(mut))] ^= 1 << rng.randint(8)
        else:
            mut = mut[: rng.randint(len(mut))]
        try:
            decode_tiff(bytes(mut))
        except (ValueError, NotImplementedError):
            pass


def test_tiff_g3_mh_rle_decode():
    """Round-18 CCITT RLE (TIFF compression 2 — T.4 Modified Huffman
    1-D, the OTHER fax compression old archives ship): byte-aligned
    per-row alternating white/black runs through the shared T.4
    tables. Pinned by (a) a HAND-DERIVED stream (white-4 '1011' +
    black-3 '10' + white-1 '000111' -> 0xB8 0x70); (b) round-trips
    across strip/tile layouts, both FillOrders, uniform pages;
    (c) nonzero T4Options refuse by name; (d) mutation sweep."""
    import struct as _struct

    from netcdf4_variable_streamer_spark.functions.tiff import (
        _ccitt_mh_decode,
        decode_tiff,
        encode_tiff,
    )

    got = _ccitt_mh_decode(bytes([0xB8, 0x70]), 8, 1)
    assert list(got[0]) == [0, 0, 0, 0, 1, 1, 1, 0]
    rng = np.random.RandomState(7)
    page = (rng.randint(0, 2, (37, 61)) * 255).astype(np.uint8)
    for kw in (
        {"rows_per_strip": 9},
        {"tile": (16, 16)},
        {"rows_per_strip": 9, "fill_order": 2},
        {"tile": (16, 32), "fill_order": 2},
    ):
        f = encode_tiff(page, compression="g3", **kw)
        assert (decode_tiff(f) == page).all(), kw
    for fill in (0, 255):
        u = np.full((5, 23), fill, np.uint8)
        assert (
            decode_tiff(encode_tiff(u, compression="g3")) == u
        ).all(), fill
    # photometric 1 over G3 renders inverted, same as G4
    base = encode_tiff(page, compression="g3", rows_per_strip=9)
    b = bytearray(base)
    i = b.index(_struct.pack("<HH", 262, 3)) + 8
    b[i : i + 2] = _struct.pack("<H", 1)
    assert (decode_tiff(bytes(b)) == 255 - page).all()
    # nonzero T4Options (2-D G3 / EOL variants) refuse by name: add
    # tag 292 by rewriting a harmless SHORT tag slot is fiddly, so
    # build a minimal file with the tag via _mini_g4-style injection
    from test_llm_ops import _mini_g4

    g3 = bytearray(_mini_g4())
    i = g3.index(_struct.pack("<HH", 259, 3)) + 8
    g3[i : i + 2] = _struct.pack("<H", 2)
    i = g3.index(_struct.pack("<HH", 293, 4))
    g3[i : i + 2] = _struct.pack("<H", 292)
    g3[i + 2 : i + 4] = _struct.pack("<H", 3)
    g3[i + 8 : i + 12] = _struct.pack("<I", 1)
    with pytest.raises(NotImplementedError, match="T4Options"):
        decode_tiff(bytes(g3))
    # mutation sweep
    for _ in range(2500):
        mut = bytearray(base)
        if rng.randint(2):
            mut[rng.randint(len(mut))] ^= 1 << rng.randint(8)
        else:
            mut = mut[: rng.randint(len(mut))]
        try:
            decode_tiff(bytes(mut))
        except (ValueError, NotImplementedError):
            pass

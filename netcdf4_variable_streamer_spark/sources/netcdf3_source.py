"""Spark DataSource over real NetCDF-3 classic files (netcdf3.py codec).

The record (UNLIMITED) dimension is the reference's streamed dim
(SURVEY §2 A1/A8/A9), so the scan plan mirrors netcdf_source.py's
chunk-store source exactly — only the storage layer differs:

- ``partitions()`` splits the RECORD RANGE into ~equal contiguous runs
  (one task wave, like ChunkPartition bundling): the driver touches only
  the KB-sized header, never the data, so a 100 TB file plans in O(1).
- ``pushFilters`` harvests range predicates on the ``<recdim>_idx``
  column and narrows the planned record range BEFORE partitioning —
  the hyperslab slice (A11) as automatic pushdown; every filter is
  yielded back for row-level re-evaluation.
- ``read()`` is one strided-memmap byte-range read per record variable
  (codec ``read_records``), exploded to the same long form the chunk
  source emits: (rec_idx, fixed-dim idx..., var columns) — so every
  grid query runs unchanged against a real ``.nc`` file.

Write path: :func:`write_netcdf3` exports small/aggregated frames from
the driver; a distributed sink would need record-offset coordination
(the classic format interleaves records), which the chunk store already
provides — at scale you write the chunk store and export .nc at the
edge, which is also what the reference's single-process writer implies.

PUSHDOWN REUSE CAVEAT (round 4): Spark caches Python-source read info
per loaded table and re-plans only when a query pushes filters, so
reusing ONE DataFrame object for a filtered query and then a
filterless one silently reuses the narrowed partitions. Use a fresh
``load()`` per query (every engine builder does); details and the
regression test live with the netcdf4 source.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime

import numpy as np
import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from netcdf4_variable_streamer_spark.sources.netcdf3 import NetCDF3File
from netcdf4_variable_streamer_spark.sources.tailcache import (
    FrozenMemberCounts,
)

FORMAT3_NAME = "netcdf3"

def _fill_value(v) -> "np.ndarray | None":
    """The variable's ``_FillValue`` cast to its own dtype, or None.

    netCDF masked-array semantics (the reference inherits them from
    netCDF4.Dataset): cells equal to ``_FillValue`` are MISSING data,
    which in a DataFrame is NULL (SURVEY §1.2). The attribute is stored
    as NC_DOUBLE/NC_INT(64) by the writer; casting to the variable's
    dtype reproduces the cell bytes exactly, so the equality mask is
    byte-faithful.
    """
    fv = v.attrs.get("_FillValue")
    if fv is None:
        return None
    return np.asarray(fv).astype(v.dtype.newbyteorder("="))


def _mask_scale(v):
    """CF packing spec -> ``(scale, offset)`` floats, or None if the
    variable carries neither ``scale_factor`` nor ``add_offset``.
    Unpacking is ``packed * scale + offset`` (the NUG convention;
    netCDF4-python's ``set_auto_maskandscale`` applies it by default,
    so the reference's users see UNPACKED values unless they opt
    out)."""
    sf = v.attrs.get("scale_factor")
    ao = v.attrs.get("add_offset")
    if sf is None and ao is None:
        return None
    scale = float(np.asarray(sf).reshape(())) if sf is not None else 1.0
    off = float(np.asarray(ao).reshape(())) if ao is not None else 0.0
    return scale, off


def _invalid_mask(v, flat) -> "np.ndarray | None":
    """netCDF auto-mask semantics beyond ``_FillValue``: cells equal
    to ``missing_value`` (scalar or list) or outside
    ``valid_range`` / ``valid_min`` / ``valid_max`` are missing data.
    All comparisons happen on the PACKED values cast to the
    variable's dtype (the NUG rule: validity is judged before
    unpacking)."""
    m = None

    def _or(mm):
        nonlocal m
        m = mm if m is None else (m | mm)

    mv = v.attrs.get("missing_value")
    if mv is not None:
        for x in np.atleast_1d(np.asarray(mv)).astype(
            flat.dtype.newbyteorder("=")
        ):
            _or(flat == x)
    vmin = vmax = None
    vr = v.attrs.get("valid_range")
    if vr is not None:
        a = np.asarray(vr).reshape(-1)
        vmin, vmax = a[0], a[-1]
    if v.attrs.get("valid_min") is not None:
        vmin = np.asarray(v.attrs["valid_min"]).reshape(())
    if v.attrs.get("valid_max") is not None:
        vmax = np.asarray(v.attrs["valid_max"]).reshape(())
    dt = flat.dtype.newbyteorder("=")
    if vmin is not None:
        _or(flat < np.asarray(vmin).astype(dt))
    if vmax is not None:
        _or(flat > np.asarray(vmax).astype(dt))
    return m


_CF_UNIT_US = {
    "microseconds": 1,
    "milliseconds": 1_000,
    "seconds": 1_000_000,
    "minutes": 60_000_000,
    "hours": 3_600_000_000,
    "days": 86_400_000_000,
}
_CF_UNITS_RE = re.compile(
    r"^(microseconds|milliseconds|seconds|minutes|hours|days)\s+since\s+"
    r"(\d{4}-\d{2}-\d{2})(?:[ T](\d{2}:\d{2}:\d{2}))?$"
)


# Fixed-length CF calendars: every year has the same month lengths.
_CAL_MONTH_DAYS = {
    "noleap": [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
    "365_day": [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
    "all_leap": [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
    "366_day": [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
    "360_day": [30] * 12,
}

_US_DAY = 86_400_000_000


def _cf_time(v):
    """CF time decode spec if the variable carries a CF ``units``
    attribute ("<unit> since <date>"), else None:

    - ``("std", base_us, unit_us)`` — standard / gregorian /
      proleptic_gregorian calendars (epoch-microsecond arithmetic);
    - ``("cal", name, (y, m, d, second_of_day_us), unit_us)`` — the
      fixed-length calendars (noleap/365_day, all_leap/366_day,
      360_day): day counts advance in the SOURCE calendar, then each
      (y, m, d) renders field-wise as a timestamp_ntz; dates with no
      proleptic-Gregorian rendering (Feb 30, Feb 29 of a non-leap
      year) become NULL, the missing-data convention.

    NetCDF has no native timestamp type — time is numbers + this
    convention (SURVEY §1.2). Decoding is OPT-IN (option
    ``decode_cf_time``) because the reference's netCDF4 base class also
    returns raw numbers and leaves num2date to the caller. Calendars
    outside this set are left raw.
    """
    units = v.attrs.get("units")
    if not isinstance(units, str):
        return None
    m = _CF_UNITS_RE.match(units.strip())
    if not m:
        return None
    unit_us = _CF_UNIT_US[m.group(1)]
    cal = v.attrs.get("calendar")
    cal = cal if isinstance(cal, str) else "standard"
    if cal in ("standard", "gregorian", "proleptic_gregorian"):
        base = datetime.fromisoformat(
            m.group(2) + (" " + m.group(3) if m.group(3) else "")
        )
        base_us = int(
            (base - datetime(1970, 1, 1)).total_seconds() * 1_000_000
        )
        return "std", base_us, unit_us
    if cal in _CAL_MONTH_DAYS:
        y, mo, d = (int(x) for x in m.group(2).split("-"))
        sod = 0
        if m.group(3):
            hh, mm, ss = (int(x) for x in m.group(3).split(":"))
            sod = (hh * 3600 + mm * 60 + ss) * 1_000_000
        return "cal", cal, (y, mo, d, sod), unit_us
    return None  # unknown calendar: leave raw, caller decodes


def _days_from_civil(y, m, d):
    """Proleptic-Gregorian days since 1970-01-01 from field vectors
    (Howard Hinnant's public `days_from_civil` algorithm, floor-division
    form, vectorized)."""
    y = y.astype(np.int64) - (m <= 2)
    era = y // 400
    yoe = y - era * 400
    doy = (153 * ((m + 9) % 12) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _greg_days_in_month(y, m):
    dim = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])[m - 1]
    leap = (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))
    return np.where((m == 2) & leap, 29, dim)


def _decode_cf_values(cf, flat: np.ndarray):
    """(datetime64[us] values, null mask or None) for raw CF numbers."""
    if cf[0] == "std":
        _, base_us, unit_us = cf
        us = base_us + np.rint(
            flat.astype(np.float64) * unit_us
        ).astype(np.int64)
        return us.astype("datetime64[us]"), None
    _, cal, (y0, m0, d0, sod_us), unit_us = cf
    month_days = np.asarray(_CAL_MONTH_DAYS[cal], dtype=np.int64)
    cum = np.concatenate(([0], np.cumsum(month_days)))
    ylen = int(month_days.sum())
    total_us = (
        np.rint(flat.astype(np.float64) * unit_us).astype(np.int64) + sod_us
    )
    base_day = y0 * ylen + cum[m0 - 1] + (d0 - 1)
    abs_day = base_day + total_us // _US_DAY  # floor: negatives correct
    us_in_day = total_us % _US_DAY
    y = abs_day // ylen
    doy = abs_day % ylen
    m = np.searchsorted(cum, doy, side="right").astype(np.int64)
    d = doy - cum[m - 1] + 1
    us = _days_from_civil(y, m, d) * _US_DAY + us_in_day
    invalid = d > _greg_days_in_month(y, m)
    return us.astype("datetime64[us]"), (
        invalid if bool(invalid.any()) else None
    )


# NetCDF external type -> (Spark column type, numpy dtype emitted by
# read()). CDF-5's unsigned types widen to the next signed Spark type
# (Spark has no unsigned ints — SURVEY §1.2); NC_UINT64 has no lossless
# signed *integer* container and maps to DECIMAL(20,0), the narrowest
# exact container for the full 0..2^64-1 range.
_NC_SPARK = {
    1: ("byte", "i1"),
    3: ("short", "i2"),
    4: ("int", "i4"),
    5: ("float", "f4"),
    6: ("double", "f8"),
    7: ("short", "i2"),  # NC_UBYTE
    8: ("int", "i4"),  # NC_USHORT
    9: ("long", "i8"),  # NC_UINT
    10: ("long", "i8"),  # NC_INT64
    11: ("decimal(20,0)", "u8"),  # NC_UINT64 (exact, SURVEY §1.2)
}
_NC_SPARK[2] = ("string", "S1")  # NC_CHAR: trailing char dim -> string

NC_CHAR = 2


def _eff_shape(v) -> tuple:
    """Per-record cell shape with a char variable's trailing
    string-length dimension collapsed (SURVEY §1.2 row S1: char arrays
    surface as StringType; the last char dim becomes the string
    length — the netCDF convention for text data)."""
    if v.nc_type == NC_CHAR and v.shape:
        return v.shape[:-1]
    return v.shape


def _eff_fixed_dimids(v) -> tuple:
    """Fixed (non-record) dimids that survive the char collapse."""
    ids = v.dimids[1:]
    if v.nc_type == NC_CHAR and ids:
        return ids[:-1]
    return ids


def _char_strings(block: np.ndarray, strlen: int) -> list:
    """An S1 block whose last axis is the char dim -> python strings.
    Trailing NULs are the classic format's text padding; the S-dtype
    tolist conversion strips them (netCDF4-python's chartostring
    semantics)."""
    n_cells = (
        int(block.size // strlen)
        if strlen
        else int(np.prod(block.shape[:-1], dtype=np.int64))
    )
    if strlen == 0:
        return [""] * n_cells
    flat = np.ascontiguousarray(block).reshape(n_cells, strlen)
    return [
        b.decode("utf-8", "replace")
        for b in flat.view(f"S{strlen}").ravel().tolist()
    ]


@dataclass
class RecordRangePartition(InputPartition):
    path: str
    lo: int  # first record within THIS file (inclusive)
    hi: int  # last record within this file (exclusive)
    offset: int = 0  # global index of this file's record 0 (multi-file)


def _record_vars(nc: NetCDF3File) -> list:
    rvs = [v for v in nc.variables.values() if v.is_record]
    if not rvs:
        raise ValueError(f"{nc.path}: no record variables to stream")
    # char variables' trailing string-length dim collapses into the
    # string value, so only the EFFECTIVE per-record shapes must agree
    shapes = {_eff_shape(v) for v in rvs}
    if len(shapes) > 1:
        raise ValueError(
            f"record variables disagree on per-record shape: {shapes}"
        )
    return rvs


def _spark_schema(
    nc: NetCDF3File,
    decode_cf_time: bool = False,
    mask_and_scale: bool = False,
) -> str:
    rvs = _record_vars(nc)
    dim_names = list(nc.dims)
    fixed = [dim_names[d] for d in _eff_fixed_dimids(rvs[0])]
    parts = [f"{nc.record_dim}_idx long"]
    parts += [f"{d}_idx int" for d in fixed]
    for v in rvs:
        if v.nc_type not in _NC_SPARK:
            raise ValueError(
                f"{nc.path}: variable {v.name} has NetCDF type "
                f"{v.nc_type} with no Spark mapping"
            )
        if (
            decode_cf_time
            and v.nc_type != NC_CHAR
            and _cf_time(v) is not None
        ):
            # timestamp_ntz: CF times are calendar-naive UTC — no
            # session-timezone reinterpretation on foreign sessions
            parts.append(f"{v.name} timestamp_ntz")
        elif (
            mask_and_scale
            and v.nc_type != NC_CHAR
            and _mask_scale(v) is not None
        ):
            # CF-packed variable: unpacks to double at scan time
            parts.append(f"{v.name} double")
        else:
            parts.append(f"{v.name} {_NC_SPARK[v.nc_type][0]}")
    return ", ".join(parts)


def _spark_schema_union(
    members: list[tuple[str, int, int]],
    decode_cf_time: bool = False,
    mask_and_scale: bool = False,
) -> str:
    """UNION schema across a directory's members (round 10 —
    ``schema_evolution=union``): archives evolve, later files gain
    variables (a sensor added mid-archive). Variables align by NAME in
    first-appearance order; a variable present in several members must
    agree on type and per-record shape; fixed dims must agree
    everywhere. Members missing a variable surface NULLs for it."""
    seen: dict[str, tuple] = {}
    order: list[str] = []
    ref_fixed = None
    parts: list[str] = []
    for i, (path, _n, _off) in enumerate(members):
        nc = NetCDF3File(path)
        rvs = _record_vars(nc)
        dim_names = list(nc.dims)
        fixed = tuple(
            (dim_names[d], nc.dims[dim_names[d]])
            for d in _eff_fixed_dimids(rvs[0])
        )
        if i == 0:
            ref_fixed = fixed
            parts.append(f"{nc.record_dim}_idx long")
            parts += [f"{d}_idx int" for d, _e in fixed]
        elif fixed != ref_fixed:
            raise ValueError(
                f"{path}: fixed dims {fixed!r} != first member "
                f"{ref_fixed!r} (schema_evolution=union aligns "
                "VARIABLES; dims and extents must still match)"
            )
        for v in rvs:
            if (
                decode_cf_time
                and v.nc_type != NC_CHAR
                and _cf_time(v) is not None
            ):
                st = "timestamp_ntz"
            elif (
                mask_and_scale
                and v.nc_type != NC_CHAR
                and _mask_scale(v) is not None
            ):
                st = "double"
            else:
                st = _NC_SPARK[v.nc_type][0]
            sig = (st, _eff_shape(v))
            if v.name in seen:
                if seen[v.name] != sig:
                    raise ValueError(
                        f"{path}: variable {v.name} signature {sig!r} "
                        f"conflicts with {seen[v.name]!r} from an "
                        "earlier member (union aligns by name; types "
                        "and shapes must agree)"
                    )
            else:
                seen[v.name] = sig
                order.append(v.name)
    return ", ".join(parts + [f"{n} {seen[n][0]}" for n in order])


_PA_BY_SPARK = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "timestamp_ntz": None,  # filled below (needs pa)
    "decimal(20,0)": None,
}


def _pa_type(spark_type: str):
    if spark_type == "timestamp_ntz":
        return pa.timestamp("us")
    if spark_type == "decimal(20,0)":
        return pa.decimal128(20, 0)
    return pa.type_for_alias(_PA_BY_SPARK[spark_type])


def _resolve_members(path: str) -> list[tuple[str, int, int]]:
    """[(file, numrecs, global_offset)] — a single .nc file, or a
    DIRECTORY of .nc files treated as ONE dataset concatenated along the
    record dim in filename order (the file-per-day layout netCDF4's
    MFDataset serves). Only the KB-sized headers are read; cost is
    O(files) driver metadata work, same class as a file listing."""
    import os

    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".nc")
        )
        if not files:
            raise ValueError(f"{path}: no .nc files in directory")
        members, off = [], 0
        for f in files:
            p = os.path.join(path, f)
            n = NetCDF3File(p).numrecs
            members.append((p, n, off))
            off += n
        return members
    return [(path, NetCDF3File(path).numrecs, 0)]


class NetCDF3Reader(DataSourceReader):
    def __init__(
        self,
        path: str,
        schema: StructType,
        target_partitions=None,
        decode_cf_time: bool = False,
        union_schema: bool = False,
        mask_and_scale: bool = False,
    ):
        import os

        self.path = path
        self.mask_and_scale = mask_and_scale
        self.columns = [f.name for f in schema.fields]
        # declared Spark type per column — the union path materializes
        # typed NULL arrays for variables a member predates
        self.col_types = {
            f.name: f.dataType.simpleString() for f in schema.fields
        }
        self.union_schema = union_schema
        self.decode_cf_time = decode_cf_time
        self.members = _resolve_members(path)
        first = NetCDF3File(self.members[0][0])

        def member_sig(nc: NetCDF3File):
            # schema string alone encodes dim NAMES and types, not the
            # fixed-dim EXTENTS — a directory mixing y=32 and y=16 files
            # would pass a schema-only check and silently concatenate
            # inconsistent per-record grids (ADVICE r3). Compare the
            # per-record shape too.
            shapes = tuple(
                (v.name, v.shape)
                for v in nc.variables.values()
                if v.is_record
            )
            return str(_spark_schema(nc)), shapes

        if union_schema:
            # name-aligned union: per-variable signature + fixed-dim
            # agreement enforced by _spark_schema_union (raises there)
            _spark_schema_union(self.members, decode_cf_time, mask_and_scale)
        else:
            ref_sig = member_sig(first)
            for p, _n, _off in self.members[1:]:
                got = member_sig(NetCDF3File(p))
                if got != ref_sig:
                    raise ValueError(
                        f"{p}: member signature {got!r} != first member "
                        f"{ref_sig!r} (schema AND fixed-dim extents must "
                        "match across a multi-file dataset; pass "
                        "schema_evolution=union to align evolving "
                        "variable sets by name)"
                    )
        self.numrecs = sum(n for _p, n, _off in self.members)
        self._idx_col = f"{first.record_dim}_idx"
        self.lo = 0
        self.hi = self.numrecs
        self.target_partitions = target_partitions or int(
            os.environ.get("SPARK_GRAFT_CPUS", "32")
        )

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            if getattr(f, "attribute", None) == (self._idx_col,) and hasattr(
                f, "value"
            ):
                v = f.value
                if isinstance(v, (list, tuple, set)):
                    # In filter (time_idx.isin(...)): prune to the
                    # value envelope; Spark re-checks membership
                    vals = [int(x) for x in v if x is not None]
                    if vals:
                        self.lo = max(self.lo, min(vals))
                        self.hi = min(self.hi, max(vals) + 1)
                    yield f
                    continue
                v = int(v)
                if isinstance(f, EqualTo):
                    self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, v + 1)
            yield f  # Spark re-evaluates row-level

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        total = hi - lo
        if total == 0:
            return [RecordRangePartition(self.members[0][0], 0, 0, 0)]
        n_parts = max(1, min(total, self.target_partitions))
        per = -(-total // n_parts)  # ceil
        out = []
        for p, n, off in self.members:
            mlo, mhi = max(lo, off), min(hi, off + n)
            r = mlo
            while r < mhi:
                e = min(r + per, mhi)
                out.append(RecordRangePartition(p, r - off, e - off, off))
                r = e
        return out

    def read(self, partition: RecordRangePartition):
        yield from _arrow_batches(
            partition.path,
            self.columns,
            partition.lo,
            partition.hi,
            partition.offset,
            self.decode_cf_time,
            col_types=self.col_types if self.union_schema else None,
            mask_and_scale=self.mask_and_scale,
        )


def _arrow_batches(
    path: str,
    columns: list[str],
    lo: int,
    hi: int,
    offset: int = 0,
    decode_cf_time: bool = False,
    col_types: dict[str, str] | None = None,
    mask_and_scale: bool = False,
):
    """Arrow RecordBatches for records ``[lo, hi)`` of one .nc file —
    the shared executor-side column builder of the batch scan
    (:meth:`NetCDF3Reader.read`) and the Arrow-batched streaming tail
    (:class:`NetCDF3ArrowStreamReader`). One strided-memmap byte-range
    read per record variable, exploded to long form with NumPy only —
    no per-row Python objects."""
    if hi <= lo:
        return
    nc = NetCDF3File(path)
    rvs = _record_vars(nc)
    dim_names = list(nc.dims)
    fixed = [dim_names[d] for d in _eff_fixed_dimids(rvs[0])]
    shape = _eff_shape(rvs[0])
    cells = int(np.prod(shape, dtype=np.int64)) if shape else 1
    n = hi - lo
    wanted = set(columns)  # column pruning: build only the read schema
    arrays: dict[str, np.ndarray] = {}
    if f"{nc.record_dim}_idx" in wanted:
        arrays[f"{nc.record_dim}_idx"] = np.repeat(
            np.arange(lo, hi, dtype=np.int64)
            + offset,  # global index across the file set
            cells,
        )
    if shape:
        grids = np.indices(shape).reshape(len(shape), cells)
        for i, d in enumerate(fixed):
            if f"{d}_idx" in wanted:
                arrays[f"{d}_idx"] = np.tile(grids[i].astype(np.int32), n)
    masks: dict[str, np.ndarray] = {}
    for v in rvs:
        if v.name not in wanted:
            continue  # pruned variable: its bytes are never touched
        block = nc.read_records(v.name, lo, hi)
        if v.nc_type == NC_CHAR:
            # char matrix -> strings (no _FillValue masking: the
            # padding convention for text is trailing NULs, already
            # stripped by the conversion)
            strlen = v.shape[-1] if v.shape else 1
            arrays[v.name] = _char_strings(block, strlen)
            continue
        flat = block.reshape(-1)
        fv = _fill_value(v)
        if fv is not None:
            # _FillValue cells are missing data -> NULL (masked-array
            # semantics of the reference's netCDF4 base class)
            masks[v.name] = flat == fv
        if mask_and_scale:
            # netCDF auto-mask: missing_value / valid_range cells are
            # NULL too (judged on the packed values, NUG rule)
            inv = _invalid_mask(v, flat)
            if inv is not None:
                prev = masks.get(v.name)
                masks[v.name] = inv if prev is None else (prev | inv)
        cf = _cf_time(v) if decode_cf_time else None
        ms = _mask_scale(v) if mask_and_scale else None
        if cf is not None:
            vals, invalid = _decode_cf_values(cf, flat)
            arrays[v.name] = vals
            if invalid is not None:  # e.g. 360_day Feb 30 -> NULL
                prev = masks.get(v.name)
                masks[v.name] = (
                    invalid if prev is None else (prev | invalid)
                )
        elif ms is not None:
            # CF unpack: packed * scale + add_offset, in float64 (one
            # vectorized expression; masked cells' garbage values are
            # nulled by the mask, never surfaced)
            arrays[v.name] = flat.astype(np.float64) * ms[0] + ms[1]
        else:
            # native byte order + the declared Spark width (unsigned
            # CDF-5 types widen to the next signed type here)
            arrays[v.name] = flat.astype(
                np.dtype(_NC_SPARK[v.nc_type][1]), copy=False
            )
    if col_types is not None:
        # union-schema mode: a variable this member predates surfaces
        # as a typed all-NULL column (name-aligned null fill)
        n_rows = n * cells
        for c in columns:
            if c not in arrays:
                arrays[c] = pa.nulls(n_rows, type=_pa_type(col_types[c]))
    cols = [
        a if isinstance(a := arrays[c], pa.Array)
        else pa.array(a, mask=masks.get(c))
        for c in columns
    ]
    # NC_UINT64 columns are read as uint64 and delivered as Arrow
    # decimal128(20,0) — the exact container DECIMAL(20,0) declares
    cols = [
        c.cast(pa.decimal128(20, 0)) if c.type == pa.uint64() else c
        for c in cols
    ]
    tbl = pa.table(cols, names=columns)
    yield from tbl.to_batches(max_chunksize=1 << 20)


class NetCDF3StreamReader(SimpleDataSourceStreamReader):
    """Tail-follow a GROWING .nc file (reference A14 on real files): the
    offset is the header's numrecs — append_records patches it only
    after the record bytes are on disk, so every batch reads fully
    published records."""

    def __init__(self, path: str, schema: StructType):
        import os

        if os.path.isdir(path):
            # the batch reader concatenates directory members; the tail
            # offset here is a single file's numrecs, so a directory
            # would fail later with a raw IsADirectoryError (ADVICE r3)
            raise ValueError(
                f"{path}: streaming tail supports a single .nc file — "
                "point the stream at one growing file, or use the batch "
                "reader for directory datasets"
            )
        self.path = path
        self.columns = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"rec": 0}

    def _rows_between(self, lo: int, hi: int):
        return _stream_rows(self.path, self.columns, lo, hi)

    def read(self, start: dict):
        end = {"rec": NetCDF3File(self.path).numrecs}
        return self._rows_between(start["rec"], end["rec"]), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows_between(start["rec"], end["rec"])


class NetCDF3ArrowStreamReader(DataSourceStreamReader):
    """Partition-planned, Arrow-batched tail — ``option("tail_reader",
    "arrow")`` (VERDICT r7 "Next round" #3). Same offset semantics as
    the Simple tail (offset = the header's published numrecs), but each
    microbatch's record range is SPLIT into contiguous runs that
    EXECUTORS read as Arrow RecordBatches through the batch scan's
    column builder, instead of the driver materializing one Python row
    list per microbatch. This is the high-ingest-rate posture: driver
    work per trigger is O(1) (one KB-sized header read + range
    arithmetic), data bytes move memmap→NumPy→Arrow with no per-row
    Python objects, and a burst of millions of records becomes a
    normal parallel scan instead of a driver bottleneck. This reader is
    the DEFAULT since round 9 (measured: flat drain latency at any
    delta vs the Simple reader's linear-in-rows — SCALE.md crossover
    table); ``tail_reader=simple`` opts back into the Simple reader."""

    def __init__(
        self, path: str, schema: StructType, target_partitions=None
    ):
        import os

        if os.path.isdir(path):
            raise ValueError(
                f"{path}: this reader tails a single .nc file — "
                "directory archives dispatch to the Arrow dir reader"
            )
        self.path = path
        self.columns = [f.name for f in schema.fields]
        self.target_partitions = target_partitions or int(
            os.environ.get("SPARK_GRAFT_CPUS", "32")
        )

    def initialOffset(self) -> dict:
        return {"rec": 0}

    def latestOffset(self) -> dict:
        # numrecs is patched only after record bytes are on disk, so
        # every planned range reads fully published records
        return {"rec": NetCDF3File(self.path).numrecs}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["rec"], end["rec"]
        if hi <= lo:
            return []
        per = -(-(hi - lo) // max(1, min(hi - lo, self.target_partitions)))
        return [
            RecordRangePartition(self.path, r, min(r + per, hi), 0)
            for r in range(lo, hi, per)
        ]

    def read(self, partition: RecordRangePartition):
        yield from _arrow_batches(
            partition.path, self.columns, partition.lo, partition.hi
        )


class NetCDF3ArrowDirStreamReader(DataSourceStreamReader):
    """Partition-planned Arrow tail over a GROWING DIRECTORY of .nc
    archive files — the Arrow twin of :class:`NetCDF3DirStreamReader`
    with the same offset shape (pinned per-member record counts) and
    the same freeze-invariant enforcement, but each microbatch's
    per-member deltas split into record ranges that EXECUTORS read as
    Arrow RecordBatches with globalized record indexes. Fixes the
    drain-throughput class the Simple dir reader is linear-in-rows on
    (SCALE.md round-8 addendum): driver work per trigger is ONE header
    read (the growing newest member) — frozen members' counts carry
    forward through the stat-guarded ``FrozenMemberCounts`` cache."""

    def __init__(
        self,
        path: str,
        schema: StructType,
        target_partitions=None,
        union_schema: bool = False,
    ):
        import os

        self.path = path
        self.columns = [f.name for f in schema.fields]
        # union mode (round 10): the tail follows an EVOLVING archive —
        # new members may carry variables old ones predate; deltas
        # from old members NULL-fill them (same machinery as the batch
        # union scan). The freeze invariant is untouched: evolution
        # only ever happens in NEW members.
        self.col_types = (
            {f.name: f.dataType.simpleString() for f in schema.fields}
            if union_schema
            else None
        )
        self.target_partitions = target_partitions or int(
            os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
        self._pinned = FrozenMemberCounts(
            lambda p: NetCDF3File(p).numrecs
        )

    def initialOffset(self) -> dict:
        return {"files": [], "counts": []}

    def latestOffset(self) -> dict:
        import os

        files = sorted(
            f for f in os.listdir(self.path) if f.endswith(".nc")
        )
        return {
            "files": files,
            "counts": self._pinned.counts(self.path, files),
        }

    def _check_invariants(self, start: dict, end: dict) -> None:
        if end["files"][: len(start["files"])] != start["files"]:
            raise ValueError(
                f"{self.path}: archive members renamed or removed — "
                f"offset had {start['files']}, directory has "
                f"{end['files']}"
            )
        for i, f in enumerate(start["files"]):
            lo, hi = start["counts"][i], end["counts"][i]
            if i < len(start["files"]) - 1 and hi != lo:
                verb = "grew" if hi > lo else "shrank"
                raise ValueError(
                    f"{self.path}/{f}: frozen member {verb} "
                    f"({lo} -> {hi} records) — the freeze invariant "
                    "is violated; only the newest archive member may "
                    "grow"
                )
            if hi < lo:
                raise ValueError(
                    f"{self.path}/{f}: pinned member shrank "
                    f"({lo} -> {hi} records) — records already issued "
                    "to the stream were truncated or replaced"
                )

    def partitions(self, start: dict, end: dict):
        import os

        self._check_invariants(start, end)
        total = sum(end["counts"]) - sum(start["counts"])
        if total <= 0:
            return []
        per = -(-total // max(1, min(total, self.target_partitions)))
        out, base = [], 0
        for i, f in enumerate(end["files"]):
            p = os.path.join(self.path, f)
            lo = start["counts"][i] if i < len(start["counts"]) else 0
            hi = end["counts"][i]
            r = lo
            while r < hi:
                e = min(r + per, hi)
                out.append(RecordRangePartition(p, r, e, base))
                r = e
            base += hi
        return out

    def read(self, partition: RecordRangePartition):
        yield from _arrow_batches(
            partition.path,
            self.columns,
            partition.lo,
            partition.hi,
            partition.offset,
            col_types=self.col_types,
        )


def _stream_rows(path: str, columns, lo: int, hi: int, base: int = 0):
    """Long-form row tuples for records [lo, hi) of one .nc file; the
    record index column is globalized by ``base`` (directory tails)."""
    if hi <= lo:
        return []
    nc = NetCDF3File(path)
    rvs = _record_vars(nc)
    dim_names = list(nc.dims)
    fixed = [dim_names[d] for d in _eff_fixed_dimids(rvs[0])]
    shape = _eff_shape(rvs[0])
    cells = int(np.prod(shape, dtype=np.int64)) if shape else 1
    n = hi - lo
    cols: dict[str, np.ndarray] = {
        f"{nc.record_dim}_idx": np.repeat(
            np.arange(base + lo, base + hi, dtype=np.int64), cells
        )
    }
    if shape:
        grids = np.indices(shape).reshape(len(shape), cells)
        for i, d in enumerate(fixed):
            cols[f"{d}_idx"] = np.tile(grids[i].astype(np.int32), n)
    for v in rvs:
        if v.nc_type == NC_CHAR:
            cols[v.name] = _char_strings(
                nc.read_records(v.name, lo, hi),
                v.shape[-1] if v.shape else 1,
            )
            continue
        flat = nc.read_records(v.name, lo, hi).reshape(-1)
        fv = _fill_value(v)
        vals = flat.astype(
            np.dtype(_NC_SPARK[v.nc_type][1]), copy=False
        ).tolist()
        if v.nc_type == 11:  # DECIMAL(20,0) rows need Decimal cells
            from decimal import Decimal

            vals = [Decimal(x) for x in vals]
        if fv is not None:
            vals = [
                None if m else x for x, m in zip(vals, (flat == fv))
            ]
        cols[v.name] = vals
    ordered = [
        cols[c] if isinstance(cols[c], list) else cols[c].tolist()
        for c in columns
    ]
    return [tuple(row) for row in zip(*ordered)]


class NetCDF3DirStreamReader(SimpleDataSourceStreamReader):
    """Tail-follow a GROWING DIRECTORY of .nc archive files — the
    capacity-chunked pattern the single-file tail's docs point to:
    writers freeze a member once a later member exists, and only the
    newest (sort-last) member grows. The offset pins every member's
    record count at snapshot time, so readBetweenOffsets replays the
    exact same rows even after further growth; global record indexes
    come from the frozen members' prefix sums."""

    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.columns = [f.name for f in schema.fields]
        # frozen members' counts carry forward across triggers —
        # O(1) header reads per trigger (see tailcache module docs)
        self._pinned = FrozenMemberCounts(
            lambda p: NetCDF3File(p).numrecs
        )

    def _members(self) -> list[str]:
        import os

        return sorted(
            f for f in os.listdir(self.path) if f.endswith(".nc")
        )

    def initialOffset(self) -> dict:
        return {"files": [], "counts": []}

    def read(self, start: dict):
        import os

        files = self._members()
        if files[: len(start["files"])] != start["files"]:
            raise ValueError(
                f"{self.path}: archive members renamed or removed — "
                f"offset had {start['files']}, directory has {files}"
            )
        fresh = self._pinned.counts(self.path, files)
        rows, counts, base = [], [], 0
        for i, f in enumerate(files):
            p = os.path.join(self.path, f)
            n = fresh[i]
            lo = start["counts"][i] if i < len(start["counts"]) else 0
            if i < len(start["files"]) - 1 and n != lo:
                # enforce, not just assume, the freeze invariant: a
                # member that already had a successor at pin time has
                # its final count pinned — growth now would re-issue
                # global indexes already assigned to later members
                verb = "grew" if n > lo else "shrank"
                raise ValueError(
                    f"{self.path}/{f}: frozen member {verb} "
                    f"({lo} -> {n} records) — the freeze invariant is "
                    "violated; only the newest archive member may grow"
                )
            if n < lo:
                # the newest pinned member may grow but never shrink:
                # lo > hi would silently replay an empty/invalid range
                raise ValueError(
                    f"{self.path}/{f}: pinned member shrank "
                    f"({lo} -> {n} records) — records already issued "
                    "to the stream were truncated or replaced"
                )
            rows.extend(_stream_rows(p, self.columns, lo, n, base))
            counts.append(n)
            base += n
        return rows, {"files": files, "counts": counts}

    def readBetweenOffsets(self, start: dict, end: dict):
        import os

        rows, base = [], 0
        for i, f in enumerate(end["files"]):
            p = os.path.join(self.path, f)
            lo = start["counts"][i] if i < len(start["counts"]) else 0
            hi = end["counts"][i]
            rows.extend(_stream_rows(p, self.columns, lo, hi, base))
            base += hi
        return rows


class NetCDF3DataSource(DataSource):
    """spark.read.format("netcdf3").option("path", file).load()

    Options:
    - ``path``: a ``.nc`` file or a directory of them (one dataset).
    - ``target_partitions``: record-range partition count override.
    - ``decode_cf_time``: "true" to decode variables carrying a CF
      ``units = "<unit> since <date>"`` attribute to ``timestamp_ntz``
      (standard/proleptic-Gregorian calendars only; batch scans only).
    - ``mask_and_scale``: "true" for netCDF4-python's default
      ``set_auto_maskandscale`` semantics — variables carrying
      ``scale_factor``/``add_offset`` unpack to double at scan time,
      and cells equal to ``missing_value`` or outside
      ``valid_range``/``valid_min``/``valid_max`` are NULL (judged on
      the packed values; batch scans only). CF time decode wins when
      a variable carries both conventions.
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT3_NAME

    def _cf_opt(self) -> bool:
        return str(self.options.get("decode_cf_time", "")).lower() in (
            "true",
            "1",
        )

    def _ms_opt(self) -> bool:
        return str(self.options.get("mask_and_scale", "")).lower() in (
            "true",
            "1",
        )

    def _union_opt(self) -> bool:
        return str(
            self.options.get("schema_evolution", "")
        ).lower() in ("union", "true", "1")

    def schema(self) -> str:
        members = _resolve_members(self.options["path"])
        if self._union_opt():
            # round 10: name-aligned UNION of the members' variable
            # sets (evolving archives — later files gain variables)
            return _spark_schema_union(
                members, self._cf_opt(), self._ms_opt()
            )
        # first member carries the schema (multi-file: consistency is
        # enforced across all members when the reader is built)
        return _spark_schema(
            NetCDF3File(members[0][0]), self._cf_opt(), self._ms_opt()
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        tp = self.options.get("target_partitions")
        return NetCDF3Reader(
            self.options["path"],
            schema,
            int(tp) if tp else None,
            decode_cf_time=self._cf_opt(),
            union_schema=self._union_opt(),
            mask_and_scale=self._ms_opt(),
        )

    def _no_cf_tail(self) -> None:
        if self._cf_opt():
            raise ValueError(
                "decode_cf_time is a batch-scan option; the streaming "
                "tail emits raw CF numbers — decode with "
                "timestamp_micros() downstream"
            )
        if self._ms_opt():
            raise ValueError(
                "mask_and_scale is a batch-scan option; the streaming "
                "tail emits raw packed numbers — unpack with "
                "value * scale + offset downstream"
            )

    def streamReader(self, schema: StructType):
        # the partition-planned Arrow tail is the DEFAULT (round 9:
        # measured ~constant drain latency at any tail delta while the
        # Simple reader is linear-in-rows — crossover ~1e5 rows per
        # trigger, and below it the difference is trigger-overhead
        # noise); tail_reader=simple opts back into the Simple reader
        # via PySparkNotImplementedError -> simpleStreamReader (the
        # documented pyspark dispatch in datasource_internal)
        if str(self.options.get("tail_reader", "arrow")).lower() == "simple":
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader"},
            )
        self._no_cf_tail()
        import os

        tp = self.options.get("tail_partitions")
        tp = int(tp) if tp else None
        path = self.options["path"]
        if os.path.isdir(path):
            return NetCDF3ArrowDirStreamReader(
                path, schema, tp, union_schema=self._union_opt()
            )
        if self._union_opt():
            raise ValueError(
                "schema_evolution=union applies to directory "
                "datasets; a single file has one schema"
            )
        return NetCDF3ArrowStreamReader(path, schema, tp)

    def simpleStreamReader(self, schema: StructType):
        import os

        self._no_cf_tail()
        path = self.options["path"]
        if self._union_opt():
            # the Simple dir reader drains rows member-by-member with
            # no typed-NULL machinery; union tails are the Arrow
            # reader's job (the default) — refuse rather than KeyError
            # mid-drain
            raise ValueError(
                "schema_evolution=union requires the Arrow tail "
                "(the default tail_reader); the Simple reader does "
                "not NULL-fill evolving schemas"
            )
        if os.path.isdir(path):
            return NetCDF3DirStreamReader(path, schema)
        return NetCDF3StreamReader(path, schema)

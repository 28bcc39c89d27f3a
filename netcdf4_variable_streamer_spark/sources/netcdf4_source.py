"""Spark DataSource over real NetCDF-4 (= HDF5) files (hdf5lite codec).

Mirrors ``netcdf3_source.py`` — the record (UNLIMITED) dimension is the
reference's streamed dim, so the plan shape is identical and only the
container differs:

- ``partitions()`` splits the record range into contiguous runs; the
  driver parses only the KB-sized HDF5 metadata (superblock, object
  headers, chunk B-trees), never dataset bytes, so a 100 TB file plans
  in O(metadata).
- ``pushFilters`` narrows the record range on ``<recdim>_idx``
  predicates BEFORE partitioning (hyperslab pushdown, A11).
- ``read()`` is a chunk-pruned slab read per record variable
  (``HDF5File.read_slab0`` touches only chunks intersecting the range,
  inflating shuffle/deflate per covering chunk), exploded to the same
  long form the netcdf3 source emits — every grid query runs unchanged
  against a real ``.nc4``/NetCDF-4 file.
- ``_FillValue`` cells surface as NULL (masked-array semantics), same
  as the netcdf3 source.

Streaming tail (A14): tail-mode files (``create_netcdf4_tail``) grow
within a preallocated one-record-per-chunk capacity — append pwrites
the record chunks and publishes an 8-byte dataspace-extent patch LAST,
so the tail's offset (the current extent) never exposes half-published
records. Growth past the preallocation rewrites the chunk B-trees
append-only with amortized doubling (up to 65000 records per file on a
single v1 node); beyond that, archives chunk into capacity-sized files
and use the directory dataset (filename-ordered concatenation along
the record dim, netCDF4.MFDataset-style).

``decode_cf_time`` option ("true"): record variables carrying a CF
``units = "<unit> since <date>"`` attribute decode to timestamp_ntz at
scan time, including the fixed-length calendars (noleap/all_leap/
360_day) — identical semantics to the NetCDF-3 source (batch scans
only).

PUSHDOWN REUSE CAVEAT (applies to every pushFilters DataSource, found
round 4 via this source's tests): Spark caches the Python-source read
info per loaded table and only re-plans when a query pushes filters, so
reusing ONE DataFrame object for a filtered query and then a filterless
one silently reuses the narrowed partitions (rows go missing). Every
engine builder calls ``spark.read...load()`` fresh per query, which is
the safe pattern; users should do the same (fresh ``load()`` per
query), or disable ``spark.sql.python.filterPushdown.enabled``.
Asserted in tests/test_hdf5lite.py::test_pushdown_fresh_load_is_safe.
"""

from __future__ import annotations

from dataclasses import dataclass

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

from netcdf4_variable_streamer_spark.sources.hdf5lite import NetCDF4View
from netcdf4_variable_streamer_spark.sources.netcdf3_source import (
    _cf_time,
    _decode_cf_values,
    _invalid_mask,
    _mask_scale,
)
from netcdf4_variable_streamer_spark.sources.tailcache import (
    FrozenMemberCounts,
)

FORMAT4_NAME = "netcdf4"

# numpy dtype kind+size -> (spark type, emitted numpy dtype); unsigned
# widens to the next signed container; uint64 has no signed integer
# container and maps to the exact DECIMAL(20,0) (SURVEY §1.2)
_NP_SPARK = {
    "i1": ("byte", "i1"),
    "i2": ("short", "i2"),
    "i4": ("int", "i4"),
    "i8": ("long", "i8"),
    "u1": ("short", "i2"),
    "u2": ("int", "i4"),
    "u4": ("long", "i8"),
    "u8": ("decimal(20,0)", "u8"),
    "f4": ("float", "f4"),
    "f8": ("double", "f8"),
}


def _np_key(dtype: np.dtype) -> str:
    return f"{dtype.kind}{dtype.itemsize}"


def _ddl_name(name: str) -> str:
    """Backtick-quote a field name for Spark DDL. HDF5 names may
    legally contain characters Spark's schema parser treats as
    syntax (spaces, ':', ',', '<'); unquoted they fail with a bare
    ParseException naming neither the variable nor the member."""
    return "`" + name.replace("`", "``") + "`"


def _compound_spark(var_name: str, dtype: np.dtype) -> str:
    """Structured (NC_COMPOUND) dtype -> Spark struct<...> DDL. Member
    mapping mirrors the scalar columns: numerics widen unsigned the
    same way, fixed strings (S<n>) decode to string, 1-D array members
    become array<...>; anything else refuses loudly."""
    parts = []
    for m in dtype.names:
        fdt = dtype.fields[m][0]
        if fdt.subdtype is not None:
            base, shape = fdt.subdtype
            bkey = _np_key(base)
            if len(shape) != 1 or bkey not in _NP_SPARK:
                raise ValueError(
                    f"compound member {var_name}.{m}: array member "
                    f"{base}{shape} has no Spark mapping"
                )
            parts.append(f"{_ddl_name(m)}:array<{_NP_SPARK[bkey][0]}>")
        elif fdt.kind == "O":
            seqs = dict(
                (dtype.metadata or {}).get("vlen_seq_members", ())
            )
            if m in seqs:
                # NC_VLEN-of-numeric member -> array<T> (round 12)
                bkey = _np_key(np.dtype(seqs[m]))
                parts.append(
                    f"{_ddl_name(m)}:array<{_NP_SPARK[bkey][0]}>"
                )
            else:
                # NC_STRING member (resolved through the global
                # heap), object-reference member (referenced path) or
                # region-reference member (RegionRef string form,
                # round 13) — all surface as string
                parts.append(f"{_ddl_name(m)}:string")
        elif fdt.kind == "S":
            parts.append(f"{_ddl_name(m)}:string")
        else:
            key = _np_key(fdt)
            if key not in _NP_SPARK:
                raise ValueError(
                    f"compound member {var_name}.{m}: dtype {fdt} has "
                    "no Spark mapping"
                )
            parts.append(f"{_ddl_name(m)}:{_NP_SPARK[key][0]}")
    return f"struct<{','.join(parts)}>"


def _compound_arrow(flat: np.ndarray) -> "pa.StructArray":
    """A flat structured-record array -> Arrow StructArray with the
    same member conversions as scalar columns (unsigned widening,
    uint64 -> decimal128(20,0), S<n> -> str, subarray -> list)."""
    children, names = [], []
    for m in flat.dtype.names:
        fdt = flat.dtype.fields[m][0]
        col = flat[m]
        if fdt.subdtype is not None:
            base = fdt.subdtype[0]
            wdt = np.dtype(_NP_SPARK[_np_key(base)][1])
            child = pa.array(list(col.astype(wdt, copy=False)))
            if wdt == np.dtype("u8"):
                # match the declared array<decimal(20,0)> (scalar u8
                # members widen the same way below)
                child = child.cast(pa.list_(pa.decimal128(20, 0)))
        elif fdt.kind == "S":
            child = pa.array(
                [b.decode("utf-8", "replace") for b in col.tolist()]
            )
        elif fdt.kind == "O":
            seqs = dict(
                (flat.dtype.metadata or {}).get("vlen_seq_members", ())
            )
            if m in seqs:
                # NC_VLEN-of-numeric member: object cells of
                # variable-length arrays -> one list<...> build
                base = np.dtype(seqs[m])
                wdt = np.dtype(_NP_SPARK[_np_key(base)][1])
                lens = np.fromiter(
                    (len(c) for c in col), dtype=np.int64,
                    count=col.shape[0],
                )
                flatv = (
                    np.concatenate(
                        [np.asarray(c, dtype=base) for c in col]
                    )
                    if int(lens.sum())
                    else np.empty(0, dtype=base)
                )
                offsets = np.zeros(col.shape[0] + 1, dtype=np.int32)
                np.cumsum(lens, out=offsets[1:])
                child = pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(flatv.astype(wdt, copy=False)),
                )
                if child.type == pa.list_(pa.uint64()):
                    child = child.cast(pa.list_(pa.decimal128(20, 0)))
            elif m in dict.fromkeys(
                (flat.dtype.metadata or {}).get("regref_members", ())
            ):
                # region-reference member (round 13): RegionRef cells
                # -> their deterministic string form, None stays null
                child = pa.array(
                    [None if c is None else str(c) for c in col],
                    pa.string(),
                )
            else:
                # NC_STRING member: already python str from the heap;
                # object-reference members are already path str/None
                child = pa.array(col.tolist(), pa.string())
        else:
            child = pa.array(
                np.ascontiguousarray(col).astype(
                    np.dtype(_NP_SPARK[_np_key(fdt)][1]), copy=False
                )
            )
            if child.type == pa.uint64():
                child = child.cast(pa.decimal128(20, 0))
        children.append(child)
        names.append(m)
    return pa.StructArray.from_arrays(children, names=names)


def _vlen_compound_arrow(
    cells: np.ndarray, base: np.dtype
) -> "pa.ListArray":
    """NC_VLEN-of-compound cells (object array of structured arrays)
    -> Arrow list<struct<...>>: one concatenation + one StructArray
    build for the whole batch, no per-cell Arrow calls."""
    lens = np.fromiter(
        (len(c) for c in cells), dtype=np.int64, count=cells.shape[0]
    )
    total = int(lens.sum())
    flat = (
        np.concatenate([np.asarray(c, dtype=base) for c in cells])
        if total
        else np.empty(0, dtype=base)
    )
    offsets = np.zeros(cells.shape[0] + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), _compound_arrow(flat)
    )


def _eff_shape4(x) -> tuple:
    """Per-record cell shape with the char collapse applied: an S1
    variable's trailing explicit char dim (netcdf-c's NC_CHAR layout)
    folds into the string value; an S<n> fixed-string dataset already
    carries its length in the dtype."""
    if x.dtype.kind == "S" and x.dtype.itemsize == 1 and x.shape:
        return x.shape[:-1]
    return x.shape


def _eff_fixed_dims4(x) -> tuple:
    dims = x.dims[1:]
    if x.dtype.kind == "S" and x.dtype.itemsize == 1 and dims:
        return dims[:-1]
    return dims


def _nc4_strings(block: np.ndarray, x) -> list:
    """A string block -> python strings (all three encodings: S1 with
    an explicit char dim, S<n> element dtype, or vlen NC_STRING —
    already decoded to str by hdf5lite)."""
    from netcdf4_variable_streamer_spark.sources.netcdf3_source import (
        _char_strings,
    )

    if x.dtype.kind == "O":
        return list(block.reshape(-1))
    if x.dtype.itemsize == 1:
        return _char_strings(block, x.shape[-1] if x.shape else 1)
    return [
        b.decode("utf-8", "replace") for b in block.reshape(-1).tolist()
    ]


@dataclass
class NC4RangePartition(InputPartition):
    path: str
    lo: int
    hi: int
    offset: int = 0  # global index of this file's record 0 (multi-file)


def _record_vars(v: NetCDF4View) -> list:
    rvs = [x for x in v.variables.values() if x.is_record]
    if not rvs:
        raise ValueError(f"{v.path}: no record variables to stream")
    # only EFFECTIVE per-record shapes must agree — a char variable's
    # trailing string-length dim collapses into the string value
    shapes = {_eff_shape4(x) for x in rvs}
    if len(shapes) > 1:
        raise ValueError(
            f"record variables disagree on per-record shape: {shapes}"
        )
    return rvs


def _spark_schema(
    v: NetCDF4View,
    decode_cf_time: bool = False,
    mask_and_scale: bool = False,
) -> str:
    rvs = _record_vars(v)
    fixed = _eff_fixed_dims4(rvs[0])
    parts = [f"{v.record_dim}_idx long"]
    parts += [f"{d}_idx int" for d in fixed]
    for x in rvs:
        if x.vlen_base is not None:
            if x.vlen_base.names:
                # NC_VLEN of NC_COMPOUND -> array<struct<...>> (round
                # 9): cells are variable-length record sequences
                parts.append(
                    f"{_ddl_name(x.name)} array<"
                    f"{_compound_spark(x.name, x.vlen_base)}>"
                )
                continue
            # NC_VLEN of a numeric base -> ArrayType column (cells are
            # variable-length vectors); unsigned bases widen like
            # their scalar columns, except u8 (no exact array-of-
            # decimal path) which refuses loudly
            bkey = _np_key(x.vlen_base)
            if bkey not in _NP_SPARK or bkey == "u8":
                raise ValueError(
                    f"{v.path}: vlen variable {x.name} base "
                    f"{x.vlen_base} has no Spark array mapping"
                )
            parts.append(f"{_ddl_name(x.name)} array<{_NP_SPARK[bkey][0]}>")
            continue
        if x.dtype.names:
            # NC_COMPOUND record variable -> StructType column
            parts.append(f"{_ddl_name(x.name)} {_compound_spark(x.name, x.dtype)}")
            continue
        if x.dtype.kind == "V" and not x.dtype.names:
            # NC_OPAQUE: fixed-size raw bytes per cell -> binary
            parts.append(f"{_ddl_name(x.name)} binary")
            continue
        if x.dtype.kind in ("S", "O"):
            parts.append(f"{_ddl_name(x.name)} string")
            continue
        key = _np_key(x.dtype)
        if key not in _NP_SPARK:
            raise ValueError(
                f"{v.path}: variable {x.name} dtype {x.dtype} has no "
                "Spark mapping"
            )
        if decode_cf_time and _cf_time(x) is not None:
            # timestamp_ntz: CF times are calendar-naive UTC (same
            # opt-in semantics as the NetCDF-3 source)
            parts.append(f"{_ddl_name(x.name)} timestamp_ntz")
        elif mask_and_scale and _mask_scale(x) is not None:
            # CF-packed variable: unpacks to double at scan time
            # (same opt-in semantics as the NetCDF-3 source)
            parts.append(f"{_ddl_name(x.name)} double")
        else:
            parts.append(f"{_ddl_name(x.name)} {_NP_SPARK[key][0]}")
    return ", ".join(parts)


def _resolve_members(path: str) -> list[tuple[str, int, int]]:
    """[(file, numrecs, global_offset)] — single file or directory
    dataset (filename order), headers only."""
    import os

    if os.path.isdir(path):
        files = sorted(
            f
            for f in os.listdir(path)
            if f.endswith((".nc", ".nc4", ".h5", ".hdf5"))
        )
        if not files:
            raise ValueError(f"{path}: no NetCDF-4 files in directory")
        members, off = [], 0
        for f in files:
            p = os.path.join(path, f)
            n = NetCDF4View(p).numrecs
            members.append((p, n, off))
            off += n
        return members
    return [(path, NetCDF4View(path).numrecs, 0)]


def _spark_schema_union(
    members: list[tuple[str, int, int]],
    decode_cf_time: bool = False,
    mask_and_scale: bool = False,
) -> str:
    """UNION schema across a directory's members (round 10,
    ``schema_evolution=union`` — HDF5 twin of the NetCDF-3 source's):
    record variables align by NAME in first-appearance order, shared
    variables must agree on declared type and per-record shape, fixed
    dims must agree everywhere; members missing a variable surface
    typed NULLs."""
    seen: dict[str, tuple] = {}
    order: list[str] = []
    decls: dict[str, str] = {}
    ref_fixed = None
    head: list[str] = []
    for i, (path, _n, _off) in enumerate(members):
        v = NetCDF4View(path)
        rvs = _record_vars(v)
        fixed = tuple(
            (d, v.dims[d]) for d in _eff_fixed_dims4(rvs[0])
        )
        if i == 0:
            ref_fixed = fixed
            head.append(f"{v.record_dim}_idx long")
            head += [f"{d}_idx int" for d, _e in fixed]
        elif fixed != ref_fixed:
            raise ValueError(
                f"{path}: fixed dims {fixed!r} != first member "
                f"{ref_fixed!r} (schema_evolution=union aligns "
                "VARIABLES; dims and extents must still match)"
            )
        # reuse the single-file schema builder for the member's own
        # declarations, then merge by name
        member_ddl = _spark_schema(v, decode_cf_time, mask_and_scale)
        own = dict(
            d.strip().split(" ", 1)
            for d in _split_top_level(member_ddl)
        )
        for x in rvs:
            nm = _ddl_name(x.name)
            sig = (own[nm], _eff_shape4(x))
            if nm in seen:
                if seen[nm] != sig:
                    raise ValueError(
                        f"{path}: variable {x.name} signature {sig!r} "
                        f"conflicts with {seen[nm]!r} from an earlier "
                        "member (union aligns by name; types and "
                        "shapes must agree)"
                    )
            else:
                seen[nm] = sig
                order.append(nm)
                decls[nm] = own[nm]
    return ", ".join(head + [f"{nm} {decls[nm]}" for nm in order])


def _split_top_level(ddl: str) -> list[str]:
    """Split a DDL column list on commas OUTSIDE angle brackets (the
    struct/array declarations the nc4 schema can contain)."""
    out, depth, cur = [], 0, []
    for ch in ddl:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


class NetCDF4Reader(DataSourceReader):
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
        self.decode_cf_time = decode_cf_time
        self.mask_and_scale = mask_and_scale
        self.columns = [f.name for f in schema.fields]
        self.union_schema = union_schema
        if union_schema:
            # per-column Arrow types, computed driver-side (executors
            # cannot parse Spark DDL without a session): the union
            # path materializes typed NULL arrays for variables a
            # member predates
            from pyspark.sql.pandas.types import to_arrow_type

            self.col_pa = {
                f.name: to_arrow_type(f.dataType)
                for f in schema.fields
            }
        else:
            self.col_pa = None
        self.members = _resolve_members(path)
        first = NetCDF4View(self.members[0][0])

        def member_sig(v: NetCDF4View):
            shapes = tuple(
                (x.name, x.shape)
                for x in v.variables.values()
                if x.is_record
            )
            return _spark_schema(v, decode_cf_time), shapes

        if union_schema:
            # per-variable signature + fixed-dim agreement enforced by
            # _spark_schema_union (raises there)
            _spark_schema_union(self.members, decode_cf_time, mask_and_scale)
        else:
            ref_sig = member_sig(first)
            for p, _n, _off in self.members[1:]:
                got = member_sig(NetCDF4View(p))
                if got != ref_sig:
                    raise ValueError(
                        f"{p}: member signature {got!r} != first member "
                        f"{ref_sig!r} (pass schema_evolution=union to "
                        "align evolving variable sets by name)"
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
                    # In filter (round 12 — what time_idx.isin(...)
                    # pushes): prune the record range to the value
                    # envelope; Spark re-evaluates the exact membership
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
            return [NC4RangePartition(self.members[0][0], 0, 0, 0)]
        n_parts = max(1, min(total, self.target_partitions))
        per = -(-total // n_parts)
        out = []
        for p, n, off in self.members:
            mlo, mhi = max(lo, off), min(hi, off + n)
            r = mlo
            while r < mhi:
                e = min(r + per, mhi)
                out.append(NC4RangePartition(p, r - off, e - off, off))
                r = e
        return out

    def read(self, partition: NC4RangePartition):
        yield from _arrow_batches4(
            partition.path,
            self.columns,
            partition.lo,
            partition.hi,
            partition.offset,
            self.decode_cf_time,
            col_pa=self.col_pa,
            mask_and_scale=self.mask_and_scale,
        )


def _arrow_batches4(
    path: str,
    columns: list[str],
    lo: int,
    hi: int,
    offset: int = 0,
    decode_cf_time: bool = False,
    col_pa: dict | None = None,
    mask_and_scale: bool = False,
):
    """Arrow RecordBatches for records ``[lo, hi)`` of one NetCDF-4
    file — the shared executor-side column builder of the batch scan
    (:meth:`NetCDF4Reader.read`) and the Arrow-batched streaming tail
    (:class:`NetCDF4ArrowStreamReader`). Pruned columns' chunks are
    never read or inflated."""
    if hi <= lo:
        return
    v = NetCDF4View(path)
    rvs = _record_vars(v)
    fixed = _eff_fixed_dims4(rvs[0])
    shape = _eff_shape4(rvs[0])
    cells = int(np.prod(shape, dtype=np.int64)) if shape else 1
    n = hi - lo
    wanted = set(columns)
    arrays: dict[str, np.ndarray] = {}
    if f"{v.record_dim}_idx" in wanted:
        arrays[f"{v.record_dim}_idx"] = np.repeat(
            np.arange(lo, hi, dtype=np.int64) + offset,
            cells,
        )
    if shape:
        grids = np.indices(shape).reshape(len(shape), cells)
        for i, d in enumerate(fixed):
            if f"{d}_idx" in wanted:
                arrays[f"{d}_idx"] = np.tile(grids[i].astype(np.int32), n)
    masks: dict[str, np.ndarray] = {}
    for x in rvs:
        if x.name not in wanted:
            continue  # pruned: its chunks are never read
        if x.vlen_base is not None:
            if x.vlen_base.names:
                arrays[x.name] = _vlen_compound_arrow(
                    v.read_records(x.name, lo, hi).reshape(-1),
                    x.vlen_base,
                )
                continue
            # variable-length vectors -> Arrow list column (each cell
            # a numpy array, widened like the scalar mapping)
            wdt = np.dtype(_NP_SPARK[_np_key(x.vlen_base)][1])
            arrays[x.name] = [
                c.astype(wdt, copy=False)
                for c in v.read_records(x.name, lo, hi).reshape(-1)
            ]
            continue
        if x.dtype.names:
            # compound records -> Arrow StructArray (no masks: netcdf
            # compound variables carry no scalar _FillValue semantics)
            arrays[x.name] = _compound_arrow(
                v.read_records(x.name, lo, hi).reshape(-1)
            )
            continue
        if x.dtype.kind == "V" and not x.dtype.names:
            # NC_OPAQUE -> binary: one zero-copy fixed-size-binary
            # build over the raw cell bytes, cast to the schema's
            # variable binary — no per-cell Python
            flat = np.ascontiguousarray(
                v.read_records(x.name, lo, hi).reshape(-1)
            )
            fsb = pa.Array.from_buffers(
                pa.binary(x.dtype.itemsize),
                flat.shape[0],
                [None, pa.py_buffer(flat.tobytes())],
            )
            arrays[x.name] = fsb.cast(pa.binary())
            continue
        if x.dtype.kind in ("S", "O"):
            arrays[x.name] = _nc4_strings(
                v.read_records(x.name, lo, hi), x
            )
            continue
        flat = v.read_records(x.name, lo, hi).reshape(-1)
        fv = x.attrs.get("_FillValue")
        if fv is not None:
            masks[x.name] = flat == np.asarray(fv).astype(x.dtype)
        if mask_and_scale:
            # netCDF auto-mask: missing_value / valid_range cells are
            # NULL too (judged on the packed values, NUG rule)
            inv = _invalid_mask(x, flat)
            if inv is not None:
                prev = masks.get(x.name)
                masks[x.name] = inv if prev is None else (prev | inv)
        ms = _mask_scale(x) if mask_and_scale else None
        cf = _cf_time(x) if decode_cf_time else None
        if cf is None and ms is not None:
            # CF unpack: packed * scale + add_offset in float64 (one
            # vectorized expression; masked cells never surface)
            arrays[x.name] = flat.astype(np.float64) * ms[0] + ms[1]
            continue
        if cf is not None:
            vals, invalid = _decode_cf_values(cf, flat)
            arrays[x.name] = vals
            if invalid is not None:  # e.g. 360_day Feb 30 -> NULL
                prev = masks.get(x.name)
                masks[x.name] = (
                    invalid if prev is None else (prev | invalid)
                )
        else:
            arrays[x.name] = flat.astype(
                np.dtype(_NP_SPARK[_np_key(x.dtype)][1]), copy=False
            )
    if col_pa is not None:
        # union-schema mode: a variable this member predates surfaces
        # as a typed all-NULL column (name-aligned null fill)
        n_rows = n * cells
        for c in columns:
            if c not in arrays:
                arrays[c] = pa.nulls(n_rows, type=col_pa[c])
    cols = [
        arrays[c]
        if isinstance(arrays[c], pa.Array)
        else pa.array(arrays[c], mask=masks.get(c))
        for c in columns
    ]
    # uint64 variables are delivered as Arrow decimal128(20,0) — the
    # exact container their DECIMAL(20,0) schema declares
    cols = [
        c.cast(pa.decimal128(20, 0)) if c.type == pa.uint64() else c
        for c in cols
    ]
    yield from pa.table(cols, names=columns).to_batches(
        max_chunksize=1 << 20
    )


class NetCDF4StreamReader(SimpleDataSourceStreamReader):
    """Tail-follow a GROWING tail-mode NetCDF-4 file (reference A14 on
    the HDF5 container): the offset is the record datasets' current
    dataspace extent — append_records_nc4 pwrites the record chunks
    FIRST and patches the extents LAST, so every batch reads fully
    published records. Growth past the preallocated capacity triggers
    an append-only B-tree rewrite with amortized doubling
    (append_records_nc4), so the stream is unbounded within a single
    file."""

    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.columns = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"rec": 0}

    def _rows_between(self, lo: int, hi: int):
        return _stream_rows4(self.path, self.columns, lo, hi)

    def read(self, start: dict):
        end = {"rec": NetCDF4View(self.path).numrecs}
        return self._rows_between(start["rec"], end["rec"]), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows_between(start["rec"], end["rec"])


class NetCDF4ArrowStreamReader(DataSourceStreamReader):
    """Partition-planned, Arrow-batched tail for the HDF5 container —
    ``option("tail_reader", "arrow")``, the twin of
    ``netcdf3_source.NetCDF3ArrowStreamReader`` (VERDICT r7 "Next
    round" #3). Offsets are the record datasets' published dataspace
    extent, exactly like the Simple tail; each microbatch's record
    range splits into contiguous runs that executors read as Arrow
    RecordBatches through the batch scan's column builder. Driver work
    per trigger is O(1) metadata (one extent read); data never becomes
    per-row Python objects."""

    def __init__(
        self, path: str, schema: StructType, target_partitions=None
    ):
        import os

        if os.path.isdir(path):
            raise ValueError(
                f"{path}: this reader tails a single NetCDF-4 file — "
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
        # the extent is patched only after record chunks are on disk,
        # so every planned range reads fully published records
        return {"rec": NetCDF4View(self.path).numrecs}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["rec"], end["rec"]
        if hi <= lo:
            return []
        per = -(-(hi - lo) // max(1, min(hi - lo, self.target_partitions)))
        return [
            NC4RangePartition(self.path, r, min(r + per, hi), 0)
            for r in range(lo, hi, per)
        ]

    def read(self, partition: NC4RangePartition):
        yield from _arrow_batches4(
            partition.path, self.columns, partition.lo, partition.hi
        )


class NetCDF4ArrowDirStreamReader(DataSourceStreamReader):
    """Partition-planned Arrow tail over a GROWING DIRECTORY of
    NetCDF-4 archive files — the Arrow twin of
    :class:`NetCDF4DirStreamReader` (same pinned-count offsets, same
    freeze-invariant enforcement, see the classic-format
    ``NetCDF3ArrowDirStreamReader`` for the design notes); microbatch
    deltas split into executor-read Arrow RecordBatches with
    globalized record indexes."""

    _EXTS = (".nc", ".nc4", ".h5", ".hdf5")

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
        # union mode (round 10): evolving archives — see the classic
        # twin's notes; Arrow types computed driver-side
        if union_schema:
            from pyspark.sql.pandas.types import to_arrow_type

            self.col_pa = {
                f.name: to_arrow_type(f.dataType)
                for f in schema.fields
            }
        else:
            self.col_pa = None
        self.target_partitions = target_partitions or int(
            os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
        # frozen members' counts carry forward across triggers —
        # O(1) header reads per trigger (see tailcache module docs)
        self._pinned = FrozenMemberCounts(
            lambda p: NetCDF4View(p).numrecs
        )

    def initialOffset(self) -> dict:
        return {"files": [], "counts": []}

    def latestOffset(self) -> dict:
        import os

        files = sorted(
            f
            for f in os.listdir(self.path)
            if f.endswith(self._EXTS)
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
                out.append(NC4RangePartition(p, r, e, base))
                r = e
            base += hi
        return out

    def read(self, partition: NC4RangePartition):
        yield from _arrow_batches4(
            partition.path,
            self.columns,
            partition.lo,
            partition.hi,
            partition.offset,
            col_pa=self.col_pa,
        )


def _stream_rows4(path: str, columns, lo: int, hi: int, base: int = 0):
    """Long-form row tuples for records [lo, hi) of one NetCDF-4 file;
    the record index column is globalized by ``base``."""
    if hi <= lo:
        return []
    v = NetCDF4View(path)
    rvs = _record_vars(v)
    fixed = _eff_fixed_dims4(rvs[0])
    shape = _eff_shape4(rvs[0])
    cells = int(np.prod(shape, dtype=np.int64)) if shape else 1
    n = hi - lo
    cols: dict = {
        f"{v.record_dim}_idx": np.repeat(
            np.arange(base + lo, base + hi, dtype=np.int64), cells
        ).tolist()
    }
    if shape:
        grids = np.indices(shape).reshape(len(shape), cells)
        for i, d in enumerate(fixed):
            cols[f"{d}_idx"] = np.tile(
                grids[i].astype(np.int32), n
            ).tolist()
    for x in rvs:
        if x.vlen_base is not None:
            if x.vlen_base.names:
                cols[x.name] = _vlen_compound_arrow(
                    v.read_records(x.name, lo, hi).reshape(-1),
                    x.vlen_base,
                ).to_pylist()
                continue
            wdt = np.dtype(_NP_SPARK[_np_key(x.vlen_base)][1])
            cols[x.name] = [
                c.astype(wdt, copy=False).tolist()
                for c in v.read_records(x.name, lo, hi).reshape(-1)
            ]
            continue
        if x.dtype.names:
            # struct cells as python dicts — pyspark converts dicts to
            # Row values for StructType columns
            sa = _compound_arrow(
                v.read_records(x.name, lo, hi).reshape(-1)
            )
            cols[x.name] = sa.to_pylist()
            continue
        if x.dtype.kind in ("S", "O"):
            cols[x.name] = _nc4_strings(v.read_records(x.name, lo, hi), x)
            continue
        if x.dtype.kind == "V" and not x.dtype.names:
            # NC_OPAQUE cells -> bytes rows (binary column)
            cols[x.name] = [
                bytes(c)
                for c in v.read_records(x.name, lo, hi)
                .reshape(-1)
                .tolist()
            ]
            continue
        flat = v.read_records(x.name, lo, hi).reshape(-1)
        fv = x.attrs.get("_FillValue")
        vals = flat.astype(
            np.dtype(_NP_SPARK[_np_key(x.dtype)][1]), copy=False
        ).tolist()
        if x.dtype.kind == "u" and x.dtype.itemsize == 8:
            from decimal import Decimal

            vals = [Decimal(y) for y in vals]  # DECIMAL(20,0) rows
        if fv is not None:
            mask = flat == np.asarray(fv).astype(x.dtype)
            vals = [None if m else y for y, m in zip(vals, mask)]
        cols[x.name] = vals
    ordered = [cols[c] for c in columns]
    return [tuple(row) for row in zip(*ordered)]


class NetCDF4DirStreamReader(SimpleDataSourceStreamReader):
    """Tail-follow a GROWING DIRECTORY of NetCDF-4 archive files —
    same freeze-invariant protocol as the classic directory tail
    (netcdf3_source.NetCDF3DirStreamReader): offsets pin per-member
    record counts for exact replay; global indexes from frozen-member
    prefix sums."""

    _EXTS = (".nc", ".nc4", ".h5", ".hdf5")

    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.columns = [f.name for f in schema.fields]
        # frozen members' counts carry forward across triggers —
        # O(1) header reads per trigger (see tailcache module docs)
        self._pinned = FrozenMemberCounts(
            lambda p: NetCDF4View(p).numrecs
        )

    def _members(self) -> list[str]:
        import os

        return sorted(
            f for f in os.listdir(self.path) if f.endswith(self._EXTS)
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
                # enforce the freeze invariant (see the classic dir
                # reader): a member with a pinned successor must not
                # change its record count
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
            rows.extend(_stream_rows4(p, self.columns, lo, n, base))
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
            rows.extend(_stream_rows4(p, self.columns, lo, hi, base))
            base += hi
        return rows


class NetCDF4DataSource(DataSource):
    """spark.read.format("netcdf4").option("path", file).load()"""

    @classmethod
    def name(cls) -> str:
        return FORMAT4_NAME

    def _decode_cf(self) -> bool:
        return str(
            self.options.get("decode_cf_time", "false")
        ).lower() == "true"

    def _union_opt(self) -> bool:
        return str(
            self.options.get("schema_evolution", "")
        ).lower() in ("union", "true", "1")

    def _ms_opt(self) -> bool:
        return str(
            self.options.get("mask_and_scale", "")
        ).lower() in ("true", "1")

    def schema(self) -> str:
        members = _resolve_members(self.options["path"])
        if self._union_opt():
            # round 10: name-aligned UNION of the members' variable
            # sets (evolving archives — later files gain variables)
            return _spark_schema_union(
                members, self._decode_cf(), self._ms_opt()
            )
        return _spark_schema(
            NetCDF4View(members[0][0]), self._decode_cf(), self._ms_opt()
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        tp = self.options.get("target_partitions")
        return NetCDF4Reader(
            self.options["path"],
            schema,
            int(tp) if tp else None,
            union_schema=self._union_opt(),
            decode_cf_time=self._decode_cf(),
            mask_and_scale=self._ms_opt(),
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
        if self._ms_opt():
            raise ValueError(
                "mask_and_scale is a batch-scan option; the streaming "
                "tail emits raw packed numbers — unpack with "
                "value * scale + offset downstream"
            )
        import os

        tp = self.options.get("tail_partitions")
        tp = int(tp) if tp else None
        path = self.options["path"]
        if os.path.isdir(path):
            return NetCDF4ArrowDirStreamReader(
                path, schema, tp, union_schema=self._union_opt()
            )
        if self._union_opt():
            raise ValueError(
                "schema_evolution=union applies to directory "
                "datasets; a single file has one schema"
            )
        return NetCDF4ArrowStreamReader(path, schema, tp)

    def simpleStreamReader(self, schema: StructType):
        import os

        if self._ms_opt():
            raise ValueError(
                "mask_and_scale is a batch-scan option; the streaming "
                "tail emits raw packed numbers — unpack with "
                "value * scale + offset downstream"
            )
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
            return NetCDF4DirStreamReader(path, schema)
        return NetCDF4StreamReader(path, schema)

"""Custom Python DataSource: the reference's chunked I/O as a Spark source.

Maps the reference surface (SURVEY.md §2 Table A) onto the PySpark 4.x
DataSource API:

- A1/A8/A9 chunked scan → ``reader``: one InputPartition per storage
  chunk (chunk-alignment = partition-alignment), Arrow RecordBatch reads,
  column pruning via the pushed-down read schema.
- A11 hyperslab slice  → ``pushFilters``: range predicates on the
  streamed-dim index column prune whole chunks before they are opened
  (the automatic version of the reference's user-driven `var[a:b]`).
- A4-A7 buffered write → ``writer``: each task buffers rows into NumPy
  blocks of `chunk_lines` and emits chunk files; `commit` assigns global
  line offsets and publishes them into the meta sidecar atomically
  (task files are invisible until job commit).
- A14 append/tail      → ``simpleStreamReader``: offset = current extent
  of the UNLIMITED dim; each microbatch reads [start, extent).

100 TB posture: partitions() is O(#chunks) metadata work on the driver;
data reads are per-chunk Arrow batches on executors; pruned chunks are
never opened; the writer commits offsets only at job commit so failed
tasks leave no visible data.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from netcdf4_variable_streamer_spark.sources.chunkstore import (
    ChunkInfo,
    ChunkStore,
)

FORMAT_NAME = "netcdf_chunks"


@dataclass
class ChunkPartition(InputPartition):
    """A contiguous run of storage chunks read by one task.

    Bundling chunks into runs (instead of one partition per chunk) keeps
    the per-partition cost — task scheduling + one JVM<->Python worker
    round trip — amortized over many chunks: a 100 TB store has millions
    of chunks but the scan still plans O(cluster-parallelism) tasks.
    `start`/`n_lines` describe the whole run (used by pruning tests)."""

    path: str
    files: list  # chunk filenames in streamed-dim order
    start: int
    n_lines: int


@dataclass
class ChunkCommitMessage(WriterCommitMessage):
    files: list  # [(filename, n_lines)]


def _spark_schema(store: ChunkStore) -> str:
    parts = [f"{store.streamed_dim}_idx long"]
    parts += [f"{d}_idx int" for d in store.fixed_dims]
    type_map = {
        "int8": "byte", "int16": "short", "int32": "int", "int64": "long",
        "float32": "float", "float64": "double",
    }
    parts += [f"{v} {type_map[dt]}" for v, dt in store.variables.items()]
    return ", ".join(parts)


class NetCDFChunkReader(DataSourceReader):
    def __init__(
        self, path: str, schema: StructType, target_partitions: int | None = None
    ):
        self.path = path
        self.columns = [f.name for f in schema.fields]
        self.lo = 0  # inclusive lower bound on streamed idx from pushdown
        self.hi: int | None = None  # exclusive upper bound
        self._store = ChunkStore.open(path)
        self._idx_col = f"{self._store.streamed_dim}_idx"
        # scan parallelism target: ONE wave of tasks. partitions() bundles
        # chunks into equal line counts, so there are no stragglers for
        # extra waves to rebalance — and each Python-DataSource task pays
        # a fixed JVM<->Python setup cost (~10 ms measured), which made a
        # 3-wave default 2x slower end-to-end at 4M rows. Overridable
        # per-read via option("target_partitions").
        self.target_partitions = target_partitions or int(
            os.environ.get("SPARK_GRAFT_CPUS", "32")
        )

    def pushFilters(self, filters: list[Filter]):
        """Harvest streamed-dim index ranges to prune whole chunks
        (reference A11 as automatic pushdown). Every filter is yielded
        back: chunk pruning is partition-granular, so Spark must still
        evaluate the predicates row-level inside surviving chunks."""
        for f in filters:
            if getattr(f, "attribute", None) == (self._idx_col,) and hasattr(
                f, "value"
            ):
                v = f.value
                if isinstance(v, (list, tuple, set)):
                    # In filter (round 12): prune chunks to the value
                    # envelope; Spark re-checks exact membership
                    vals = [int(x) for x in v if x is not None]
                    if vals:
                        self.lo = max(self.lo, min(vals))
                        self.hi = min(
                            self.hi or max(vals) + 1, max(vals) + 1
                        )
                    yield f
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(v))
                    self.hi = min(self.hi or int(v) + 1, int(v) + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(v) + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(v))
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi or int(v), int(v))
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi or int(v) + 1, int(v) + 1)
            yield f  # always re-evaluated row-level by Spark

    def partitions(self):
        survivors = [
            c
            for c in self._store.list_chunks()
            if c.start + c.n_lines > self.lo
            and (self.hi is None or c.start < self.hi)
        ]
        if not survivors:
            # Spark requires >= 1 partition; an empty run reads nothing
            return [ChunkPartition(self.path, [], 0, 0)]
        # bundle contiguous chunk-runs so one task reads ~equal line counts
        n_bundles = max(1, min(len(survivors), self.target_partitions))
        total = sum(c.n_lines for c in survivors)
        per_bundle = -(-total // n_bundles)  # ceil
        out: list[ChunkPartition] = []
        run: list[ChunkInfo] = []
        run_lines = 0
        for c in survivors:
            run.append(c)
            run_lines += c.n_lines
            if run_lines >= per_bundle:
                out.append(
                    ChunkPartition(
                        self.path, [r.file for r in run], run[0].start, run_lines
                    )
                )
                run, run_lines = [], 0
        if run:
            out.append(
                ChunkPartition(
                    self.path, [r.file for r in run], run[0].start, run_lines
                )
            )
        return out

    def read(self, partition: ChunkPartition):
        # Coalesce the run's chunk files into large Arrow batches before
        # crossing to the JVM: per-batch ingestion overhead is fixed, so
        # fewer/bigger batches win. Memory stays bounded by the bundle
        # size partitions() chose (~total_lines / target_partitions).
        tables = [
            pq.read_table(
                os.path.join(partition.path, fname), columns=self.columns
            )
            for fname in partition.files
        ]
        if not tables:
            return
        combined = pa.concat_tables(tables).combine_chunks()
        yield from combined.to_batches(max_chunksize=1 << 20)


class NetCDFChunkWriter(DataSourceArrowWriter):
    def __init__(self, path: str, schema: StructType, overwrite: bool):
        self.path = path
        self.schema = schema
        self.overwrite = overwrite
        store = ChunkStore.open(path)
        self.chunk_lines = store.chunk_lines
        self.var_names = list(store.variables)
        self.var_dtypes = dict(store.variables)
        self.line_shape = store.line_shape
        self.cells = store.cells_per_line
        self.streamed_dim = store.streamed_dim

    def write(self, iterator):
        """Task-level buffered append (reference A4-A6), Arrow path: each
        incoming RecordBatch's columns become NumPy arrays wholesale (no
        per-row Python), complete lines are buffered and emitted as one
        pending chunk file per `chunk_lines` lines; a partial-line tail
        is carried into the next batch. Incoming rows must be sorted by
        (streamed idx, fixed dims in C order) within the task."""
        pending: list[tuple[str, int]] = []
        idx_name = f"{self.streamed_dim}_idx"
        cells = self.cells

        carry_idx = np.empty(0, dtype=np.int64)
        carry: dict[str, np.ndarray] = {
            v: np.empty(0, dtype=self.var_dtypes[v]) for v in self.var_names
        }
        line_buf: dict[str, list[np.ndarray]] = {v: [] for v in self.var_names}
        n_buffered = 0

        def emit_block():
            nonlocal n_buffered
            if n_buffered == 0:
                return
            block = {
                v: np.concatenate(line_buf[v]).reshape(
                    (n_buffered, *self.line_shape)
                )
                for v in self.var_names
            }
            fname = f"pending-{uuid.uuid4().hex}.npz"
            np.savez(os.path.join(self.path, fname), **block)
            pending.append((fname, n_buffered))
            for v in self.var_names:
                line_buf[v].clear()
            n_buffered = 0

        def consume(idx: np.ndarray, cols: dict[str, np.ndarray]):
            """Buffer all complete lines in (idx, cols); return the tail."""
            nonlocal n_buffered
            n_lines = len(idx) // cells
            if n_lines:
                head = idx[: n_lines * cells].reshape(n_lines, cells)
                if not (head == head[:, :1]).all():
                    raise ValueError(
                        "rows of one line are not contiguous: writer input "
                        "must be sorted by (streamed idx, fixed dims)"
                    )
                for v in self.var_names:
                    line_buf[v].append(
                        np.ascontiguousarray(
                            cols[v][: n_lines * cells], dtype=self.var_dtypes[v]
                        )
                    )
                n_buffered += n_lines
                while n_buffered >= self.chunk_lines:
                    # split exact chunk multiples out of the buffer
                    flat = {v: np.concatenate(line_buf[v]) for v in self.var_names}
                    take = self.chunk_lines * cells
                    block = {
                        v: flat[v][:take].reshape(
                            (self.chunk_lines, *self.line_shape)
                        )
                        for v in self.var_names
                    }
                    fname = f"pending-{uuid.uuid4().hex}.npz"
                    np.savez(os.path.join(self.path, fname), **block)
                    pending.append((fname, self.chunk_lines))
                    for v in self.var_names:
                        line_buf[v] = [flat[v][take:]]
                    n_buffered -= self.chunk_lines
            tail = len(idx) - n_lines * cells
            return idx[len(idx) - tail:], {
                v: cols[v][len(idx) - tail:] for v in self.var_names
            }

        for batch in iterator:
            d = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
            idx = np.concatenate([carry_idx, d[idx_name].to_numpy()])
            cols = {
                v: np.concatenate(
                    [carry[v], d[v].to_numpy(zero_copy_only=False)]
                )
                for v in self.var_names
            }
            carry_idx, carry = consume(idx, cols)
        if len(carry_idx):
            raise ValueError(
                f"task input ended mid-line: {len(carry_idx)} of {cells} "
                "cells for the final line"
            )
        emit_block()
        return ChunkCommitMessage(files=pending)

    def commit(self, messages):
        """Job commit: deterministically order task outputs, assign global
        line offsets, convert pending blocks into chunk files, publish
        meta atomically (reference A6/A7 flush+close). In overwrite mode
        the existing chunks are dropped HERE, not in write(): tasks may
        retry/speculate, and the store must stay intact if the job fails
        before commit."""
        store = ChunkStore.open(self.path)
        if self.overwrite:
            store.truncate()
        for msg in messages:
            for fname, _n in msg.files:
                with np.load(os.path.join(self.path, fname)) as z:
                    block = {v: z[v] for v in self.var_names}
                store.append_block(block)
                os.remove(os.path.join(self.path, fname))

    def abort(self, messages):
        for msg in messages:
            if msg is None:
                continue
            for fname, _n in msg.files:
                try:
                    os.remove(os.path.join(self.path, fname))
                except OSError:
                    pass


class NetCDFChunkStreamReader(SimpleDataSourceStreamReader):
    """Tail-follow a growing store (reference A14): the offset is the
    current extent of the UNLIMITED dim."""

    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.columns = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"line": 0}

    def _rows_between(self, lo: int, hi: int):
        # materialized (not a generator): the runner pickles the prefetched
        # rows for microbatch replay
        out = []
        store = ChunkStore.open(self.path)
        for c in store.list_chunks():
            if c.start + c.n_lines <= lo or c.start >= hi:
                continue
            tbl = store.read_chunk(c, columns=self.columns)
            idx = tbl.column(f"{store.streamed_dim}_idx").to_numpy()
            mask = (idx >= lo) & (idx < hi)
            for row in tbl.filter(pa.array(mask)).to_pylist():
                out.append(tuple(row[c_] for c_ in self.columns))
        return out

    def read(self, start: dict):
        store = ChunkStore.open(self.path)
        end = {"line": store.extent}
        return self._rows_between(start["line"], end["line"]), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows_between(start["line"], end["line"])


@dataclass
class ChunkTailPartition(InputPartition):
    """One Arrow-tail task: a bundled run of chunk files plus the
    microbatch's [lo, hi) line window (edge chunks are masked to the
    window executor-side)."""

    path: str
    files: list
    lo: int
    hi: int


class NetCDFChunkArrowStreamReader(DataSourceStreamReader):
    """Partition-planned Arrow tail of a growing chunk store —
    ``option("tail_reader", "arrow")``, completing the Arrow-tail
    family across all stream sources (netcdf3/netcdf4 files and
    directories, and the chunk store). Offset = UNLIMITED-dim extent
    exactly like the Simple reader; each microbatch's surviving chunks
    bundle into ~equal-line tasks (the batch scan's one-wave policy)
    that executors read as Arrow RecordBatches, masked to the offset
    window. Driver work per trigger is the chunk LISTING — metadata,
    not data."""

    def __init__(
        self, path: str, schema: StructType, target_partitions=None
    ):
        self.path = path
        self.columns = [f.name for f in schema.fields]
        store = ChunkStore.open(path)
        self._idx_col = f"{store.streamed_dim}_idx"
        self.target_partitions = target_partitions or int(
            os.environ.get("SPARK_GRAFT_CPUS", "32")
        )

    def initialOffset(self) -> dict:
        return {"line": 0}

    def latestOffset(self) -> dict:
        return {"line": ChunkStore.open(self.path).extent}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["line"], end["line"]
        if hi <= lo:
            return []
        store = ChunkStore.open(self.path)
        survivors = [
            c
            for c in store.list_chunks()
            if c.start + c.n_lines > lo and c.start < hi
        ]
        if not survivors:
            return []
        n_bundles = max(1, min(len(survivors), self.target_partitions))
        total = sum(c.n_lines for c in survivors)
        per_bundle = -(-total // n_bundles)
        out, run, run_lines = [], [], 0
        for c in survivors:
            run.append(c)
            run_lines += c.n_lines
            if run_lines >= per_bundle:
                out.append(
                    ChunkTailPartition(
                        self.path, [r.file for r in run], lo, hi
                    )
                )
                run, run_lines = [], 0
        if run:
            out.append(
                ChunkTailPartition(
                    self.path, [r.file for r in run], lo, hi
                )
            )
        return out

    def read(self, partition: ChunkTailPartition):
        tables = [
            pq.read_table(
                os.path.join(partition.path, fname), columns=self.columns
            )
            for fname in partition.files
        ]
        if not tables:
            return
        combined = pa.concat_tables(tables).combine_chunks()
        idx = combined.column(self._idx_col).to_numpy()
        mask = (idx >= partition.lo) & (idx < partition.hi)
        if not mask.all():
            combined = combined.filter(pa.array(mask))
        yield from combined.to_batches(max_chunksize=1 << 20)


class NetCDFChunkDataSource(DataSource):
    """spark.read.format("netcdf_chunks").option("path", dir).load()"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return _spark_schema(ChunkStore.open(self.options["path"]))

    def reader(self, schema: StructType) -> DataSourceReader:
        tp = self.options.get("target_partitions")
        return NetCDFChunkReader(
            self.options["path"], schema, int(tp) if tp else None
        )

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return NetCDFChunkWriter(self.options["path"], schema, overwrite)

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
        tp = self.options.get("tail_partitions")
        return NetCDFChunkArrowStreamReader(
            self.options["path"], schema, int(tp) if tp else None
        )

    def simpleStreamReader(self, schema: StructType):
        return NetCDFChunkStreamReader(self.options["path"], schema)


def register(spark) -> None:
    spark.dataSource.register(NetCDFChunkDataSource)


def read_native(spark, path: str):
    """Batch-scan a chunk store through Spark's NATIVE parquet reader.

    The store's chunks are parquet files with every column (index columns
    included) materialized, so a batch read does not need the Python
    DataSource at all: handing the committed chunk-file list to
    ``spark.read.parquet`` keeps the whole scan JVM-side — vectorized
    parquet decode, whole-stage codegen, row-group min/max pruning on the
    streamed-dim index — with zero JVM<->Python crossings. Measured at the
    c1 bench shape (4.2M cells x 2 vars) this runs at the single-process
    pyarrow floor (~0.35 s) vs ~0.65 s for the tuned Python-DataSource
    path; at 100 TB it is the only sane batch path.

    The file list comes from the meta sidecar, NOT a glob: orphan chunk
    files from an aborted job are invisible until commit publishes them,
    and the native path must honor the same visibility rule (A7).

    The Python DataSource remains the protocol surface — buffered chunked
    writes (A4-A7), streaming tail (A14), and partition-granular pushdown
    pruning for chunk-aligned task placement — and the round-trip tests
    assert this path returns row-identical results to it.
    """
    store = ChunkStore.open(path)
    committed = {c.file for c in store.list_chunks()}
    if not committed:
        return spark.createDataFrame([], _spark_schema(store))
    on_disk = {
        f for f in os.listdir(path)
        if f.startswith("chunk-") and f.endswith(".parquet")
    }
    reader = spark.read.schema(_spark_schema(store))
    if on_disk == committed:
        # fast path: one root directory, one driver-side listing; Spark
        # also bins the many small chunk files into maxPartitionBytes-sized
        # tasks. Passing N explicit roots instead costs O(N) driver-side
        # path qualification (~0.65 s at 256 chunks — measured).
        return reader.option("pathGlobFilter", "chunk-*.parquet").parquet(path)
    # orphans present (aborted-job debris): pin the committed list
    return reader.parquet(*(os.path.join(path, f) for f in sorted(committed)))

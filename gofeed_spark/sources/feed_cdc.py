"""Incremental change-feed source (Python DataSource API, Spark 4).

The reference discovers work by re-running ``SELECT ... WHERE status != 2
AND until < now()`` / ``... ORDER BY updated_at`` on a timer
(watcher.go:89-122, repo.go:106-120) — processing-time polling with the
table itself as the offset store.  This source formalizes that as a
Structured Streaming offset: the high-water mark of ``updated_at`` (a
monotone microsecond timestamp; ties are re-read and deduplicated
downstream by the idempotent sink, matching the reference's at-least-once
posture).

The backing store here is a parquet directory (the container has no DB
server); the ``read``/``readBetweenOffsets`` implementation goes through
pyarrow predicate-filtered reads, which is exactly the shape of a JDBC
``WHERE updated_at > ?`` poll — swap the pyarrow call for a DB cursor and
nothing else changes.
"""

from __future__ import annotations

import ast
import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

CDC_SCHEMA = (
    "id string, version int, retry_count int, partition_id string, "
    "gate int, status int, error_messages string, data string, updated_at long"
)
_COLS = [
    "id", "version", "retry_count", "partition_id",
    "gate", "status", "error_messages", "data", "updated_at",
]


def _scan(path: str, after: int) -> list[tuple]:
    """Poll the backing table for rows with updated_at > after — the JDBC
    ``WHERE updated_at > ? ORDER BY updated_at`` twin (repo.go:118)."""
    import pyarrow.dataset as ds

    if not os.path.exists(path):
        return []
    dataset = ds.dataset(path, format="parquet")
    tbl = dataset.to_table(filter=ds.field("updated_at") > after)
    rows = sorted(
        zip(*[tbl.column(c).to_pylist() for c in _COLS]),
        key=lambda r: (r[-1], r[0]),
    )
    return rows


class FeedCDCReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("feed_cdc requires option 'path'")

    def initialOffset(self) -> dict:
        return {"last_ts": -1}

    def read(self, start: dict):
        last = int(start["last_ts"])
        rows = _scan(self.path, last)
        new_last = max((r[-1] for r in rows), default=last)
        return iter(rows), {"last_ts": new_last}

    def readBetweenOffsets(self, start: dict, end: dict):
        """Deterministic replay for recovery: rows in (start, end]."""
        lo, hi = int(start["last_ts"]), int(end["last_ts"])
        return iter([r for r in _scan(self.path, lo) if r[-1] <= hi])


class FeedCDCDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "feed_cdc"

    def schema(self) -> str:
        return CDC_SCHEMA

    def simpleStreamReader(self, schema):
        return FeedCDCReader(self.options)


def register_feed_cdc(spark) -> None:
    spark.dataSource.register(FeedCDCDataSource)

"""PEP-249 database state store for the feed engine.

The reference's literal deployment keeps items/partitions in a SQL
database behind Gorm (go.mod:11-12, repo.go:106-138).  This store puts
the SAME tables behind the same ``FeedRunner``: the CDC source polls the
database with a real cursor (sources/feed_cdc.py backend='dbapi'), the
micro-batch decision reads the current state through one SELECT per
table, and state writes go back as per-row OCC upserts.

Scale + concurrency shape:

- WRITES run ``foreachPartition`` with one connection and one
  ``executemany`` per Spark partition — the standard Spark→JDBC sink
  pattern; nothing funnels through the driver.
- Every upserted row carries its own OCC guard
  (``ON CONFLICT ... WHERE excluded.version >= version``), so a stale
  runner write can never clobber a concurrent out-of-band update that
  bumped the row's version — per-row OCC, exactly the reference's save
  semantics (repo.go:125-138: losing the version race drops the write).
- Rows the runner never touched this batch are simply absent from the
  upsert, so out-of-band INSERTS that land mid-batch survive untouched
  (the snapshot-flip parquet layout would rewrite the whole table and
  lose them — the database layout is what makes "items added while
  Available" safe, README.md:104-110).
- READS for the decision step are the driver-side equivalent of the
  reference's own polls (repo.go:106-120); state volume is ACTIVE work,
  not corpus size.  At warehouse scale the same contract runs over a
  JDBC dialect with the identical upsert shape.

SQLite specifics (the test face of the PEP-249 contract, like the
reference's sqlite driver, main.go:74-80): WAL journal mode so readers
don't block behind the single writer, and a generous busy timeout so
concurrent executors serialize instead of erroring.
"""

from __future__ import annotations

import importlib

from pyspark.sql import DataFrame, SparkSession

from gofeed_spark.sources.feed_cdc import CDC_SCHEMA, _COLS

PARTITION_COLS = ["id", "version", "gate", "status"]

_ITEMS_DDL_SQL = (
    "CREATE TABLE IF NOT EXISTS items ("
    "id TEXT PRIMARY KEY, version INTEGER, retry_count INTEGER, "
    "partition_id TEXT, gate INTEGER, status INTEGER, "
    "error_messages TEXT, data TEXT, updated_at INTEGER)"
)
_PARTS_DDL_SQL = (
    "CREATE TABLE IF NOT EXISTS partitions ("
    "id TEXT PRIMARY KEY, version INTEGER, gate INTEGER, status INTEGER)"
)


def _connect(module_name: str, path: str):
    mod = importlib.import_module(module_name)
    if module_name == "sqlite3":
        con = mod.connect(path, timeout=60)
        con.execute("PRAGMA busy_timeout=60000")
        return con
    return mod.connect(path)


def _items_upsert_sql() -> str:
    cols = ", ".join(_COLS)
    sets = ", ".join(f"{c}=excluded.{c}" for c in _COLS if c != "id")
    return (
        f"INSERT INTO items ({cols}) VALUES ({','.join('?' * len(_COLS))}) "
        f"ON CONFLICT(id) DO UPDATE SET {sets} "
        "WHERE excluded.version >= items.version"
    )


def _parts_upsert_sql() -> str:
    cols = ", ".join(PARTITION_COLS)
    sets = ", ".join(f"{c}=excluded.{c}" for c in PARTITION_COLS if c != "id")
    return (
        f"INSERT INTO partitions ({cols}) VALUES ({','.join('?' * len(PARTITION_COLS))}) "
        f"ON CONFLICT(id) DO UPDATE SET {sets} "
        "WHERE excluded.version >= partitions.version"
    )


class DbApiStore:
    """Feed state tables in any PEP-249 database (``module_name`` names the
    driver; ``path`` is its DSN — a file path for sqlite3)."""

    def __init__(self, path: str, module_name: str = "sqlite3"):
        self.path = path
        self.module = module_name

    def ensure_schema(self) -> None:
        con = _connect(self.module, self.path)
        try:
            if self.module == "sqlite3":
                con.execute("PRAGMA journal_mode=WAL")
            con.execute(_ITEMS_DDL_SQL)
            con.execute(_PARTS_DDL_SQL)
            con.commit()
        finally:
            con.close()

    def seed(self, items_rows: list[tuple], parts_rows: list[tuple]) -> None:
        """Initial load (rows in _COLS / PARTITION_COLS order)."""
        self.ensure_schema()
        con = _connect(self.module, self.path)
        try:
            con.executemany(_items_upsert_sql(), items_rows)
            con.executemany(_parts_upsert_sql(), parts_rows)
            con.commit()
        finally:
            con.close()

    # -- reads -----------------------------------------------------------
    def read_items(self, spark: SparkSession) -> DataFrame:
        con = _connect(self.module, self.path)
        try:
            rows = [
                tuple(r)
                for r in con.execute(
                    f"SELECT {', '.join(_COLS)} FROM items ORDER BY id"
                ).fetchall()
            ]
        finally:
            con.close()
        return spark.createDataFrame(rows, CDC_SCHEMA)

    def read_partitions(self, spark: SparkSession) -> DataFrame:
        con = _connect(self.module, self.path)
        try:
            rows = [
                tuple(r)
                for r in con.execute(
                    f"SELECT {', '.join(PARTITION_COLS)} FROM partitions ORDER BY id"
                ).fetchall()
            ]
        finally:
            con.close()
        from gofeed_spark.feedstate.model import PARTITION_DDL

        return spark.createDataFrame(rows, PARTITION_DDL)

    # -- writes ----------------------------------------------------------
    def upsert_items(self, items: DataFrame) -> None:
        self._upsert(items.select(*_COLS), _items_upsert_sql())

    def upsert_partitions(self, parts: DataFrame) -> None:
        self._upsert(parts.select(*PARTITION_COLS), _parts_upsert_sql())

    def _upsert(self, df: DataFrame, sql: str) -> None:
        module_name, path = self.module, self.path

        def write_partition(rows_iter):
            rows = [tuple(r) for r in rows_iter]
            if not rows:
                return
            con = _connect(module_name, path)
            try:
                con.executemany(sql, rows)
                con.commit()
            finally:
                con.close()

        df.foreachPartition(write_partition)

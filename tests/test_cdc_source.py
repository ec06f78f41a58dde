"""CDC source tests: incremental offsets (no re-delivery across restarts),
and the full chain CDC source → gate state machine → idempotent sink."""

from __future__ import annotations

import os

import pytest

from gofeed_spark.feedstate.model import AVAILABLE, COMPLETE, FAILED
from gofeed_spark.sources.feed_cdc import CDC_SCHEMA, register_feed_cdc
from gofeed_spark.streaming.feed_stream import gate_stream
from gofeed_spark.streaming.sinks import ParquetUpsertSink


def _item(i, pid, gate, status, ts, version=0):
    return (i, version, 0, pid, gate, status, "", "{}", ts)


def _append(spark, path, rows):
    from gofeed_spark.streaming.feed_stream import one_slice_df

    one_slice_df(spark, rows, CDC_SCHEMA).write.mode("append").parquet(path)


def _drain(spark, table, ckpt, collector):
    q = (
        spark.readStream.format("feed_cdc")
        .option("path", table)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .foreachBatch(lambda df, bid: collector.extend(df.collect()))
        .start()
    )
    q.awaitTermination(120)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_feed_cdc(spark)


def test_cdc_incremental_offsets(spark, tmp_path):
    table, ckpt = str(tmp_path / "items"), str(tmp_path / "ckpt")
    _append(spark, table, [_item("a", "p", 0, AVAILABLE, 100), _item("b", "p", 0, AVAILABLE, 200)])
    got = []
    _drain(spark, table, ckpt, got)
    assert sorted(r.id for r in got) == ["a", "b"]

    # restart: only rows with updated_at beyond the checkpointed high-water
    # mark are delivered — the old rows are NOT re-read
    _append(spark, table, [_item("a", "p", 0, COMPLETE, 300, version=1), _item("c", "p", 0, AVAILABLE, 400)])
    got2 = []
    _drain(spark, table, ckpt, got2)
    assert sorted((r.id, r.updated_at) for r in got2) == [("a", 300), ("c", 400)]


def _append_sqlite(db_path, rows):
    import sqlite3

    con = sqlite3.connect(db_path)
    with con:
        con.execute(
            "CREATE TABLE IF NOT EXISTS items ("
            "id TEXT PRIMARY KEY, version INTEGER, retry_count INTEGER, "
            "partition_id TEXT, gate INTEGER, status INTEGER, "
            "error_messages TEXT, data TEXT, updated_at INTEGER)"
        )
        con.executemany(
            "INSERT OR REPLACE INTO items VALUES (?,?,?,?,?,?,?,?,?)",
            [(r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7], r[8]) for r in rows],
        )
    con.close()


def test_cdc_sqlite_backend_incremental(spark, tmp_path):
    """Same incremental-offset contract against the DB-cursor backend —
    the reference's actual store family (Gorm/SQLite, main.go:74-80)."""
    db, ckpt = str(tmp_path / "feed.db"), str(tmp_path / "ckpt_sql")
    _append_sqlite(db, [_item("a", "p", 0, AVAILABLE, 100), _item("b", "p", 0, AVAILABLE, 200)])
    got = []
    q = (
        spark.readStream.format("feed_cdc")
        .option("path", db)
        .option("backend", "sqlite")
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .foreachBatch(lambda df, bid: got.extend(df.collect()))
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r.id for r in got) == ["a", "b"]

    # UPDATE in place (the DB shape — no append-only log): only rows whose
    # updated_at moved past the checkpointed mark are re-delivered.
    _append_sqlite(db, [_item("a", "p", 0, COMPLETE, 300, version=1), _item("c", "p", 0, AVAILABLE, 400)])
    got2 = []
    q = (
        spark.readStream.format("feed_cdc")
        .option("path", db)
        .option("backend", "sqlite")
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .foreachBatch(lambda df, bid: got2.extend(df.collect()))
        .start()
    )
    q.awaitTermination(120)
    assert sorted((r.id, r.updated_at) for r in got2) == [("a", 300), ("c", 400)]


def test_cdc_dbapi_backend_incremental(spark, tmp_path):
    """The generic PEP-249 backend, driven here through sqlite3's DB-API
    face: the exact cursor contract a pyodbc/SQL Server deployment would
    use (connection string in via 'path', driver module named by option) —
    the portable proof of the reference's production-store claim."""
    db, ckpt = str(tmp_path / "feed_dbapi.db"), str(tmp_path / "ckpt_dbapi")
    _append_sqlite(db, [_item("a", "p", 0, AVAILABLE, 100), _item("b", "p", 0, AVAILABLE, 200)])

    def drain(into):
        q = (
            spark.readStream.format("feed_cdc")
            .option("path", db)
            .option("backend", "dbapi")
            .option("dbapi_module", "sqlite3")
            .load()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .foreachBatch(lambda df, bid: into.extend(df.collect()))
            .start()
        )
        q.awaitTermination(120)

    got = []
    drain(got)
    assert sorted(r.id for r in got) == ["a", "b"]
    # in-place UPDATE: only rows past the checkpointed mark re-deliver
    _append_sqlite(db, [_item("a", "p", 0, COMPLETE, 300, version=1), _item("c", "p", 0, AVAILABLE, 400)])
    got2 = []
    drain(got2)
    assert sorted((r.id, r.updated_at) for r in got2) == [("a", 300), ("c", 400)]


def test_cdc_to_gate_machine_end_to_end(spark, tmp_path):
    """The reference's whole loop: poll the items table → per-partition
    decision → idempotent state sink (watcher.go:89-184 as one pipeline)."""
    table = str(tmp_path / "items")
    ckpt = str(tmp_path / "ckpt")
    sink = ParquetUpsertSink(str(tmp_path / "state"), key="partition_id")

    def run():
        src = (
            spark.readStream.format("feed_cdc")
            .option("path", table)
            .load()
            .select("id", "partition_id", "gate", "status")
        )
        q = (
            gate_stream(src)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination(120)

    _append(spark, table, [_item("a", "p1", 0, AVAILABLE, 100), _item("b", "p2", 0, AVAILABLE, 100)])
    run()
    st = {r.partition_id: r.status for r in sink.read(spark).collect()}
    assert st == {"p1": AVAILABLE, "p2": AVAILABLE}

    # item updates arrive in the table (as the reference's processor would
    # write them): a completes -> p1 closes; b fails -> p2 fails
    _append(spark, table, [_item("a", "p1", 0, COMPLETE, 200, 1), _item("b", "p2", 0, FAILED, 200, 1)])
    run()
    st = {r.partition_id: r.status for r in sink.read(spark).collect()}
    assert st == {"p1": COMPLETE, "p2": FAILED}

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
    spark.createDataFrame(rows, CDC_SCHEMA).coalesce(1).write.mode("append").parquet(path)


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

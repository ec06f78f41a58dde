"""Streaming-surface queries (rows-only driver check: stateful streaming is
not ANSI-SQL-expressible; the equivalent batch semantics are hash-checked
by q47-q51 and the window twins by q31/q32)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from gofeed_spark.feedstate.model import AVAILABLE, COMPLETE, FAILED
from gofeed_spark.queries.registry import query
from gofeed_spark.streaming.feed_stream import (
    ITEM_EVENT_DDL,
    gate_stream,
    one_slice_df,
    replay_stream,
)
from gofeed_spark.streaming.sinks import ParquetUpsertSink


@query("q52_streaming_gate_feed")
def q52(spark, sf_dir):
    """End-to-end streaming gate machine: two staged micro-batches of item
    state changes drive the keyed state store; the idempotent foreachBatch
    sink holds the final per-partition decisions (streaming twin of
    watcher.go:124-184; exactly-once tested in tests/test_streaming.py)."""
    base = tempfile.mkdtemp(prefix="gofeed_q52_")
    stage, ckpt, out = f"{base}/stage", f"{base}/ckpt", f"{base}/sink"
    slice1 = [
        ("i1", "pA", 0, AVAILABLE),
        ("i2", "pA", 0, AVAILABLE),
        ("i3", "pB", 0, AVAILABLE),
    ]
    slice2 = [
        ("i1", "pA", 0, COMPLETE),
        ("i2", "pA", 1, AVAILABLE),  # pA barrier clears -> gate 1
        ("i3", "pB", 0, FAILED),     # pB fails
    ]
    sink = ParquetUpsertSink(out, key="partition_id")
    # The state store allocates one store per shuffle partition; 2 keys need
    # far fewer than the session's 32.  (Batch plans are unaffected: AQE
    # re-coalesces, and the conf is restored after the run.)
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # Stage BOTH slices up front: maxFilesPerTrigger=1 makes the single
        # availableNow run deliver them as two ordered micro-batches with
        # state carried between them — same trigger sequence as two
        # separate runs at half the query-startup cost (checkpoint-restart
        # state persistence is separately pinned by tests/test_streaming.py).
        for s in (slice1, slice2):
            one_slice_df(spark, s, ITEM_EVENT_DDL).write.mode("append").parquet(stage)
        q = (
            gate_stream(replay_stream(spark, stage, ITEM_EVENT_DDL))
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    return sink.read(spark).select(
        "partition_id", "gate", "status", "n_items"
    ).orderBy("partition_id")

"""End-to-end streaming feed engine: CDC source → feed_step micro-batches →
transactional state upsert, driven to quiescence — the reference's full
Watcher loop (golden outcomes of watcher_test.go:268-349) on the streaming
path, including crash-idempotency."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gofeed_spark.feedstate.model import (
    AVAILABLE,
    COMPLETE,
    FAILED,
    seed_dataframes,
)
from gofeed_spark.feedstate.processors import json_times_processor
from gofeed_spark.streaming.feed_runner import FeedRunner


def _seed(spark, base):
    parts, items = seed_dataframes(spark)
    os.makedirs(base, exist_ok=True)
    items.withColumn("updated_at", F.lit(0).cast("long")).write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "items"))
    parts.write.mode("overwrite").parquet(os.path.join(base, "partitions"))


def test_streaming_feed_reaches_reference_goldens(spark, tmp_path):
    base = str(tmp_path / "feed")
    _seed(spark, base)
    runner = FeedRunner(
        spark, base, json_times_processor, max_retries=3, auto_close=True
    )
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        runner.run_available()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)

    items = {r.id: r for r in runner.items().collect()}
    assert items["s1_ready"].status == COMPLETE
    assert items["s2_fail"].status == FAILED
    assert items["s6_owned_should_fail"].status == FAILED
    assert items["s8_disabled"].status == AVAILABLE  # frozen partition
    assert items["s12_gate"].status == AVAILABLE and items["s12_gate"].gate == 1
    assert items["s14_gate"].status == COMPLETE
    parts = {r.id: (r.status, r.gate) for r in runner.partitions().collect()}
    assert parts["p1_gate"] == (COMPLETE, 1)
    assert parts["p2_gate"] == (FAILED, 0)
    assert all(s == COMPLETE for p, (s, g) in parts.items() if p.startswith("p1"))

    # dead-letter log: exactly the items that transitioned to Failed, once
    dead = spark.read.parquet(os.path.join(base, "dead_letter"))
    dl = sorted(r.id for r in dead.collect())
    assert dl == ["s10_ready_should_fail", "s13_gate_fail", "s6_owned_should_fail"]
    assert all(r.retry_count == 4 for r in dead.collect())  # MaxRetries=3 + 1
    assert all("moving to failed item" in r.error_messages for r in dead.collect())

    # crash-idempotency: re-delivering an already-committed batch is a no-op
    before = {tuple(r) for r in runner.items().collect()}
    poison = spark.createDataFrame([(1,)], "x int")
    runner._step(poison, runner._committed()[-1])
    after = {tuple(r) for r in runner.items().collect()}
    assert after == before

"""Volume sanity for the one-pass feed tick: 200k items across 1k
partitions in a single distributed pass — the load profile where the
reference's 2-queries-per-partition-per-tick design does 2,000 DB
round-trips and this engine does one shuffle."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from gofeed_spark.feedstate.engine import gate_decision, ready_items
from gofeed_spark.feedstate.model import AVAILABLE, COMPLETE, FAILED


def test_one_pass_tick_at_volume(spark):
    n_parts, items_per = 1000, 200
    parts = spark.range(n_parts).select(
        F.concat(F.lit("p"), "id").alias("id"),
        F.lit(0).alias("version"),
        F.lit(0).alias("gate"),
        F.lit(AVAILABLE).alias("status"),
    )
    # per partition: mostly Available at gate 0; every 7th partition has a
    # Failed item; every 13th is fully Complete
    items = (
        spark.range(n_parts * items_per)
        .select(
            F.concat(F.lit("i"), "id").alias("id"),
            F.lit(0).alias("version"),
            F.lit(0).alias("retry_count"),
            F.concat(F.lit("p"), (F.col("id") % n_parts)).alias("partition_id"),
            F.lit(0).alias("gate"),
            F.when((F.col("id") % n_parts) % 13 == 0, COMPLETE)
            .when(((F.col("id") % n_parts) % 7 == 0) & (F.col("id") < n_parts), FAILED)
            .otherwise(AVAILABLE)
            .alias("status"),
            F.lit("").alias("error_messages"),
            F.lit("{}").alias("data"),
        )
    )
    t0 = time.time()
    decisions = gate_decision(parts, items).collect()
    ready_n = ready_items(parts, items).count()
    dt = time.time() - t0
    by_status = {}
    for r in decisions:
        by_status[r.status] = by_status.get(r.status, 0) + 1
    # every-13th partitions (not also multiple of 7): all items Complete -> Complete
    # every-7th (not 13th): Failed; rest Available
    assert by_status[FAILED] == len(
        [p for p in range(n_parts) if p % 7 == 0 and p % 13 != 0]
    )
    assert by_status[COMPLETE] == len([p for p in range(n_parts) if p % 13 == 0])
    assert ready_n > 0
    # one distributed pass, not N+1: seconds, not minutes
    assert dt < 60, f"one-pass tick took {dt:.1f}s"

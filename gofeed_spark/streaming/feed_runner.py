"""The complete change-feed engine as ONE streaming pipeline — the
composition every piece of this package builds toward, and the full Spark
twin of the reference's Watcher.Start loop (watcher.go:68-212):

    feed_cdc source (poll items table, offset = updated_at high-water mark)
      → micro-batch: one-pass gate decision + processor map + retry columns
        (feedstate.engine.feed_step — the N+1 elimination)
      → transactional upsert of BOTH state tables (items + partitions)
      → processed items re-enter the table with bumped updated_at, so the
        next trigger picks up continuation work (multi-gate items flow
        gate by gate exactly like the reference's re-poll loop)

Exactly-once effect: streaming checkpoint + the batch-id manifest; the
OCC version column arbitrates any concurrent batch writer.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from gofeed_spark.feedstate.engine import feed_step
from gofeed_spark.feedstate.model import ITEM_DDL, PARTITION_DDL
from gofeed_spark.feedstate.processors import ProcessorFn
from gofeed_spark.sources.feed_cdc import register_feed_cdc


class FeedRunner:
    """Continuous feed processing over parquet state tables.

    ``items_path`` is both source and sink: the CDC source reads new/changed
    rows; the engine writes processed rows back with ``updated_at`` bumped
    to the micro-batch watermark, which re-queues continuation work — the
    same convergence-through-the-data loop as the reference (failed but
    retryable items stay Available and re-match the next poll,
    item.go:27-38 / repo.go:114-120).
    """

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        processor: ProcessorFn,
        max_retries: int = 5,
        manual_checkpoint: bool = False,
        auto_close: bool = True,
    ):
        self.spark = spark
        self.base = base_path
        self.items_path = os.path.join(base_path, "items")
        self.parts_path = os.path.join(base_path, "partitions")
        self.ckpt = os.path.join(base_path, "_checkpoint")
        self.manifest = os.path.join(base_path, "_batches.json")
        self.processor = processor
        self.max_retries = max_retries
        self.manual_checkpoint = manual_checkpoint
        self.auto_close = auto_close
        register_feed_cdc(spark)

    # -- state-table accessors -------------------------------------------
    def items(self):
        return self.spark.read.parquet(self.items_path).drop("updated_at")

    def partitions(self):
        return self.spark.read.parquet(self.parts_path)

    def _committed(self) -> list[int]:
        if not os.path.exists(self.manifest):
            return []
        with open(self.manifest) as f:
            return json.load(f)

    def _commit(self, batch_id: int) -> None:
        ids = self._committed()
        ids.append(batch_id)
        tmp = self.manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ids, f)
        os.replace(tmp, self.manifest)

    # -- the micro-batch body --------------------------------------------
    def _step(self, changed, batch_id: int) -> None:
        if batch_id in self._committed():
            return  # re-delivered after crash: idempotent skip
        if changed.isEmpty():
            return
        with_ts = self.spark.read.parquet(self.items_path)
        items = with_ts.drop("updated_at")
        parts = self.partitions()
        new_parts, new_items = feed_step(
            parts,
            items,
            self.processor,
            max_retries=self.max_retries,
            manual_checkpoint=self.manual_checkpoint,
            auto_close=self.auto_close,
        )
        # Materialize the processor output ONCE, immediately: everything
        # below (dead.isEmpty, dead.write, the items upsert) would otherwise
        # re-execute the uncached feed_step DAG and re-run the side-effectful
        # processor (HTTP POSTs) up to 3× per micro-batch — and a
        # non-deterministic outcome could make the dead-letter log disagree
        # with the committed items table.
        new_items = new_items.localCheckpoint()
        new_parts = new_parts.localCheckpoint()
        # Re-queue ONLY rows whose version moved this step: they get
        # updated_at = batch tick (> the source's high-water mark), so the
        # CDC source re-delivers them for the next decision round; untouched
        # rows keep their timestamp and are not re-delivered — quiescence
        # is reached exactly when a step changes nothing.
        tick = (
            with_ts.agg(F.max("updated_at")).collect()[0][0] or 0
        ) + 1
        prev = with_ts.select(
            "id",
            F.col("version").alias("__old_v"),
            F.col("updated_at").alias("__old_ts"),
            F.col("status").alias("__old_status"),
        )
        joined = new_items.join(prev, "id", "left")
        out_items = joined.withColumn(
            "updated_at",
            F.when(
                F.col("version") > F.coalesce(F.col("__old_v"), F.lit(-1)),
                F.lit(tick),
            )
            .otherwise(F.coalesce(F.col("__old_ts"), F.lit(0)))
            .cast("long"),
        ).drop("__old_v", "__old_ts", "__old_status")
        # Dead-letter routing: items that TRANSITIONED to Failed this step
        # (retries exhausted or non-retryable — item.go:35-37) are appended
        # to an immutable log with their error trail, exactly once.
        from gofeed_spark.feedstate.model import FAILED as _FAILED

        dead = joined.filter(
            (F.col("status") == _FAILED)
            & (F.coalesce(F.col("__old_status"), F.lit(-1)) != _FAILED)
        ).select(
            "id", "partition_id", "gate", "retry_count", "error_messages", "data",
            F.lit(tick).alias("failed_at_tick"),
        )
        if not dead.isEmpty():
            dead.write.mode("append").parquet(os.path.join(self.base, "dead_letter"))
        from gofeed_spark.feedstate.admin import transactional_write

        transactional_write(
            self.spark,
            {"items": out_items.localCheckpoint(), "partitions": new_parts},
            self.base,
        )
        self._commit(batch_id)

    # -- driver ----------------------------------------------------------
    def run_available(self, timeout_s: int = 300, max_rounds: int = 16) -> None:
        """Drain all available work: repeated availableNow passes until the
        CDC source has nothing new (each pass may re-queue continuation
        work for the next)."""
        for _ in range(max_rounds):
            before = self._committed()
            q = (
                self.spark.readStream.format("feed_cdc")
                .option("path", self.items_path)
                .load()
                .writeStream.option("checkpointLocation", self.ckpt)
                .trigger(availableNow=True)
                .foreachBatch(self._step)
                .start()
            )
            q.awaitTermination(timeout_s)
            if self._committed() == before:
                break

"""Idempotent keyed upsert sink for foreachBatch.

Exactly-once effect = streaming checkpoint (which batch is next) + this
sink's batch-id manifest (which batches already landed).  A re-delivered
micro-batch (restart between sink-commit and checkpoint-commit) is
recognized by its batchId and skipped — the same idempotency contract Delta
gets from txnAppId/txnVersion, implemented over plain parquet because this
container carries no Delta; the swap is one line in a real deployment.

Write protocol (single streaming writer per query — Spark guarantees
foreachBatch calls are serial): stage the merged table to a new directory,
atomically rename over a versioned pointer, then append the manifest.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame


class ParquetUpsertSink:
    """foreachBatch callable: keyed last-writer-wins MERGE into a parquet
    table at ``path`` (the streaming OCC-save twin, repo.go:125-138)."""

    def __init__(self, path: str, key: str = "partition_id"):
        self.path = path
        self.key = key
        self.manifest = os.path.join(path, "_committed_batches.json")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(path, exist_ok=True)

    def committed(self) -> list[int]:
        if not os.path.exists(self.manifest):
            return []
        with open(self.manifest) as f:
            return json.load(f)

    def _commit(self, batch_id: int) -> None:
        ids = self.committed()
        ids.append(batch_id)
        tmp = self.manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ids, f)
        os.replace(tmp, self.manifest)

    def read(self, spark) -> DataFrame | None:
        if not os.path.exists(self.data_dir):
            return None
        return spark.read.parquet(self.data_dir)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.committed():
            return  # re-delivered batch: idempotent skip
        spark = batch_df.sparkSession
        # Latest row per key within the batch wins (a key can appear once
        # per trigger from the stateful op, but be defensive).
        batch = batch_df.dropDuplicates([self.key])
        current = self.read(spark)
        if current is None:
            merged = batch
        else:
            merged = current.join(
                batch.select(self.key), self.key, "left_anti"
            ).unionByName(batch)
        staging = os.path.join(self.path, f"_staging_{batch_id}")
        merged.write.mode("overwrite").parquet(staging)
        old = os.path.join(self.path, f"_old_{batch_id}")
        if os.path.exists(self.data_dir):
            os.replace(self.data_dir, old)
        os.replace(staging, self.data_dir)
        shutil.rmtree(old, ignore_errors=True)
        self._commit(batch_id)

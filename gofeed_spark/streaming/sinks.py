"""Idempotent keyed upsert sink for foreachBatch.

Exactly-once effect = streaming checkpoint (which batch is next) + this
sink's manifest (which batches already landed).  A re-delivered
micro-batch (restart between sink-commit and checkpoint-commit) is
recognized by its batchId and skipped — the same idempotency contract Delta
gets from txnAppId/txnVersion, implemented over plain parquet because this
container carries no Delta; the swap is one line in a real deployment.

Write protocol (single streaming writer per query — Spark guarantees
foreachBatch calls are serial): the merged table is written to a fresh
VERSIONED directory (``data_v{batch_id}``) and published by ONE atomic
manifest PUT that carries BOTH the committed batch ids and the live data
pointer — the object-store commit shape (no directory renames anywhere),
through the ``gofeed_spark.fs`` seam, so the sink lands on a rename-less
backend unchanged.  A crash before the PUT leaves an unreferenced
versioned dir (reclaimed on the next commit); after the PUT the batch is
fully visible.  There is no torn state at any crash point.  Legacy
tables (list-manifest + ``data/`` dir from the pre-pointer sink) are
read transparently and upgrade on their first new commit.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from gofeed_spark.fs import get_filesystem


class ParquetUpsertSink:
    """foreachBatch callable: keyed last-writer-wins MERGE into a parquet
    table at ``path`` (the streaming OCC-save twin, repo.go:125-138)."""

    def __init__(self, path: str, key: str = "partition_id"):
        self.path = path
        self.key = key
        # resolve the backend ONCE, driver-side (fs.py: executor/closure
        # code must carry the resolved instance, not re-hit the registry)
        self.fs = get_filesystem(path)
        self.manifest = self.fs.join(path, "_committed_batches.json")

    # -- manifest ----------------------------------------------------------
    def _state(self) -> dict:
        """{"batches": [...], "data": rel_dir_name | None} — accepts the
        legacy bare-list manifest (data lived at the fixed ``data/``)."""
        if self.fs.stat(self.manifest) is None:
            return {"batches": [], "data": None}
        raw = json.loads(self.fs.read_bytes(self.manifest))
        if isinstance(raw, list):  # legacy layout
            return {"batches": raw, "data": "data"}
        return raw

    def committed(self) -> list[int]:
        return self._state()["batches"]

    def read(self, spark) -> DataFrame | None:
        rel = self._state()["data"]
        if rel is None:
            return None
        return spark.read.parquet(self.fs.spark_path(self.fs.join(self.path, rel)))

    # -- the sink ----------------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        state = self._state()
        if batch_id in state["batches"]:
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
        new_rel = f"data_v{batch_id:06d}"
        merged.write.mode("overwrite").parquet(
            self.fs.spark_path(self.fs.join(self.path, new_rel))
        )
        old_rel = state["data"]
        state = {"batches": state["batches"] + [batch_id], "data": new_rel}
        # THE commit point: one atomic whole-object PUT publishes the data
        # pointer and the batch id together — no window where one is
        # visible without the other
        self.fs.put_bytes(self.manifest, json.dumps(state).encode())
        # post-commit cleanup; a crash here leaves a garbage dir that the
        # next commit's sweep reclaims
        if old_rel is not None:
            self.fs.delete_tree(self.fs.join(self.path, old_rel))
        for name in self.fs.listdir(self.path):
            if (
                name.startswith(("data_v", "_staging_", "_old_"))
                and name != new_rel
                and self.fs.isdir(self.fs.join(self.path, name))
            ):
                self.fs.delete_tree(self.fs.join(self.path, name))

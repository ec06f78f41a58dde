"""Lineage/storage helpers for iterative plans.

``localCheckpoint`` is the standard Spark pattern for keeping iterative
algorithms' lineage one step deep — but its block-manager storage is NOT
released by ``Dataset.unpersist`` (that covers cache-manager entries
only); the blocks belong to the checkpointed RDD and otherwise wait for
driver GC + ContextCleaner.  Any loop that supersedes a checkpoint every
round (cluster label propagation, feed fixpoints, per-micro-batch
materialization) must release eagerly or executor storage accumulates
for the life of the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the block-manager storage behind a ``localCheckpoint``'d frame.

    Reaches the LogicalRDD's checkpointed RDD via py4j; best-effort — a
    plan shape we don't recognize is left for GC.  Only call once the
    frame's data is durably elsewhere (written to storage, superseded by
    the next round): a localCheckpoint'd RDD cannot be recomputed after
    unpersisting (its lineage was truncated).
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass

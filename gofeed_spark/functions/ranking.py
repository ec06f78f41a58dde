"""Ranking helpers for tiny post-limit result frames.

Every top-k operator here finishes by attaching a dense ``rank`` to a frame
that is ≤ k·n_tables rows BY CONSTRUCTION (it sits after a ``limit``).  A
``Window.orderBy`` with an empty partition spec computes the right thing
but makes WindowExec log "No Partition Defined ... Moving all data to a
single partition" on every execution — noise that would camouflage a REAL
unpartitioned window over unbounded data (the classic scale-killer this
repo pins tests against).  Partitioning by a constant doesn't help:
Catalyst folds foldable partition expressions away and the spec is empty
again.

``with_rank`` ranks without a WindowExec: shuffle the (tiny, bounded)
frame to one partition, sort within it, number rows with
``monotonically_increasing_id`` (consecutive from 0 inside a single
partition, so +1 is exactly ``row_number`` under the given order).  The
``repartition(1)`` is an EXCHANGE — upstream stages keep their
parallelism, unlike a ``coalesce(1)``, which would drag the whole parent
pipeline into one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_rank(
    df: DataFrame,
    order: list,
    rank_col: str = "rank",
    cast: str = "int",
) -> DataFrame:
    """Add ``rank_col`` = 1-based row number of ``df`` under ``order``.
    Only for bounded (post-``limit``) frames: the single output partition
    is the point, not a bottleneck."""
    return (
        df.repartition(1)
        .sortWithinPartitions(*order)
        .withColumn(rank_col, (F.monotonically_increasing_id() + 1).cast(cast))
    )

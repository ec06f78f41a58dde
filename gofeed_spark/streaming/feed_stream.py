"""Streaming change feed: replay source + keyed gate state machine.

The reference's feed is a poll loop over DB tables (watcher.go:89-122) —
already micro-batch semantics.  Here the source is a file stream
(``maxFilesPerTrigger=1`` → one deterministic micro-batch per staged file;
a CDC/JDBC incremental source slots in without touching the rest), and the
gate machine is ``applyInPandasWithState`` keyed by partition_id — state is
the per-partition item map, the decision ladder is re-evaluated on every
update batch, exactly the semantics of watcher.go:147-161 with the timer
replaced by data arrival.
"""

from __future__ import annotations

import os
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from gofeed_spark.feedstate.model import AVAILABLE, COMPLETE, FAILED

ITEM_EVENT_DDL = "id string, partition_id string, gate int, status int"

GATE_OUT_DDL = (
    "partition_id string, gate int, status int, n_items int, "
    "failed_n int, avail_n int"
)
GATE_STATE_DDL = (
    "gate int, status int, item_ids array<string>, "
    "item_gates array<int>, item_statuses array<int>"
)


def replay_stream(
    spark: SparkSession,
    stage_dir: str,
    schema_ddl: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-replay micro-batch source: every parquet file staged into
    ``stage_dir`` becomes (at most) one micro-batch.  Tests stage the batch
    fixture in slices to drive deterministic trigger sequences."""
    return (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage_dir)
    )


def stage_slices(df_slices: Iterable, stage_dir: str) -> None:
    """Write each DataFrame slice as one staged file (one micro-batch)."""
    os.makedirs(stage_dir, exist_ok=True)
    for i, sdf in enumerate(df_slices):
        # repartition(1), not coalesce(1): a coalesced task evaluates every
        # parent partition's Python chain sequentially (~4 s for a tiny
        # driver-built frame on local[32])
        sdf.repartition(1).write.mode("append").parquet(stage_dir)


def one_slice_df(spark: SparkSession, rows: list, schema_ddl: str) -> DataFrame:
    """Single-partition DataFrame from driver-side fixture rows.

    ``createDataFrame`` spreads even a 3-row list over defaultParallelism
    partitions; writing that as one file via ``coalesce(1)`` costs one
    Python evaluation per parent partition inside a single task (~4 s on
    local[32]).  Parallelizing with one slice writes the same file in
    ~0.1 s."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema_ddl)


def _decide(items: dict[str, tuple[int, int]], gate: int, status: int,
            manual_checkpoint: bool, auto_close: bool) -> tuple[int, int]:
    """The decision ladder over the in-state item map (watcher.go:147-161)."""
    if status == COMPLETE:
        return gate, status
    failed_n = sum(1 for g, s in items.values() if s == FAILED)
    avail_n = sum(1 for g, s in items.values() if s == AVAILABLE)
    at_gate_n = sum(1 for g, s in items.values() if s == AVAILABLE and g == gate)
    if failed_n > 0:
        return gate, FAILED
    if avail_n > 0:
        if at_gate_n == 0 and not manual_checkpoint:
            gate += 1
        return gate, AVAILABLE
    return gate, (COMPLETE if auto_close else status)


def gate_stream(
    item_events: DataFrame,
    manual_checkpoint: bool = False,
    auto_close: bool = True,
) -> DataFrame:
    """Keyed stateful gate machine: a stream of item state changes
    (ITEM_EVENT_DDL) → one decision row per partition per trigger.

    State per partition_id = (gate, status, item→(gate,status) map); item
    updates fold into the map, then the ladder re-evaluates.  State size is
    O(items per partition) — the same bound the reference carries in its
    DB; at 100 TB the state store (RocksDB provider) spills per key group.
    """

    def update(key, pdfs, state: GroupState):
        (partition_id,) = key
        if state.exists:
            gate, status, ids, gates, statuses = state.get
            items = dict(zip(ids, zip(gates, statuses)))
        else:
            gate, status = 0, AVAILABLE
            items = {}
        for pdf in pdfs:
            # Vectorized fold: zip over columns (tolist() → Python ints for
            # state serialization); later rows overwrite earlier ones, same
            # as the row-at-a-time loop.
            items.update(
                zip(pdf["id"].tolist(), zip(pdf["gate"].tolist(), pdf["status"].tolist()))
            )
        gate, status = _decide(items, gate, status, manual_checkpoint, auto_close)
        ids = list(items.keys())
        state.update((
            gate, status, ids,
            [items[i][0] for i in ids],
            [items[i][1] for i in ids],
        ))
        yield pd.DataFrame(
            {
                "partition_id": [partition_id],
                "gate": [gate],
                "status": [status],
                "n_items": [len(items)],
                "failed_n": [sum(1 for g, s in items.values() if s == FAILED)],
                "avail_n": [sum(1 for g, s in items.values() if s == AVAILABLE)],
            }
        )

    return item_events.groupBy("partition_id").applyInPandasWithState(
        update,
        outputStructType=GATE_OUT_DDL,
        stateStructType=GATE_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

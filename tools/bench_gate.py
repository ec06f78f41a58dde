"""Gate-machine state-churn bench: gate_stream (applyInPandasWithState)
vs gate_stream_tws (transformWithStateInPandas) on the HOT-PARTITION
profile — few partitions x many items, where the legacy encoding rewrites
the whole per-partition item array every micro-batch while the typed-state
path (reference twin: watcher.go:124-184) writes only the touched MapState
keys.

    python tools/bench_gate.py [n_parts] [items_per_part]
        [update_batches] [touch_per_part]

Profile (defaults 4 x 20000, 16 update batches x 50 touched/part):

1. REGISTER: one micro-batch delivers every item (Available, gate 0) —
   state reaches its full size.
2. UPDATE x K: each micro-batch re-delivers ``touch_per_part`` items per
   partition (still Available — the partition never terminates, so state
   is never evicted).  This is the steady-state shape: a trickle of item
   updates against a large standing item map.

Both impls run on the SAME RocksDB state store provider (required by
transformWithState; set once at session start, never mutated per-start)
over the same staged files; the update-phase wall clock and the state
store's own progress metrics (numRowsUpdated, RocksDB bytes) are the
comparison.  Prints ONE JSON line:

    {"metric": "gate_hot_partition", "n_parts": P, "items_per_part": I,
     "update_batches": K, "touch_per_part": T,
     "impls": {name: {"wall_register_sec": s, "wall_updates_sec": s,
                      "updates_per_sec": r, "rows_updated": n,
                      "state_rows_final": n, "bytes": {metric: total}}}}

``state_rows_final`` differs by design: the legacy encoding keeps ONE
state row per partition (the whole item array inside it); the typed-state
layout keeps one MapState entry per item plus one head row — that
granularity is exactly what makes its per-update write volume O(touched).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gofeed_spark.feedstate.model import AVAILABLE
from gofeed_spark.session import get_spark
from gofeed_spark.streaming.feed_stream import (
    ITEM_EVENT_DDL,
    ROCKSDB_PROVIDER,
    gate_stream,
    gate_stream_tws,
    tws_supported,
)


def _stage_one_file(df, stage_dir: str) -> None:
    df.repartition(1).write.mode("append").parquet(stage_dir)


def _register_frame(spark, n_parts: int, items_per_part: int):
    n = n_parts * items_per_part
    return spark.range(n).select(
        F.concat(F.lit("i"), "id").alias("id"),
        F.concat(F.lit("p"), (F.col("id") % n_parts)).alias("partition_id"),
        F.lit(0).alias("gate"),
        F.lit(AVAILABLE).alias("status"),
    )


def _update_frame(spark, n_parts: int, items_per_part: int,
                  touch_per_part: int, batch_i: int):
    # touch a rotating window of item ids so successive batches hit
    # different keys (RocksDB can't just overwrite one hot memtable entry)
    # registration assigns item g to partition g % n_parts (round-robin);
    # the update for per-partition index j of partition p must therefore
    # target global id g = j * n_parts + p
    n = n_parts * touch_per_part
    base = (batch_i * touch_per_part) % items_per_part
    j = (F.lit(base) + F.floor(F.col("id") / n_parts)) % items_per_part
    p = F.col("id") % n_parts
    return spark.range(n).select(
        F.concat(F.lit("i"), (j * n_parts + p).cast("long")).alias("id"),
        F.concat(F.lit("p"), p).alias("partition_id"),
        F.lit(0).alias("gate"),
        F.lit(AVAILABLE).alias("status"),
    )


def _drain(spark, stage_dir: str, ckpt_dir: str, impl):
    src = (
        spark.readStream.schema(ITEM_EVENT_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = (
        impl(src)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .foreachBatch(lambda df, bid: df.count())
        .start()
    )
    q.awaitTermination(1800)
    return q


def _progress_stats(q) -> tuple[int, int, dict]:
    rows_updated, state_rows, byte_totals = 0, 0, {}
    for p in q.recentProgress:
        for op in p.get("stateOperators") or []:
            rows_updated += op.get("numRowsUpdated") or 0
            state_rows = op.get("numRowsTotal") or state_rows
            for k, v in (op.get("customMetrics") or {}).items():
                if "ytes" in k and isinstance(v, (int, float)) and v:
                    byte_totals[k] = byte_totals.get(k, 0) + int(v)
    return rows_updated, state_rows, byte_totals


def bench_impl(spark, impl, stage_register: str, stage_updates: list[str],
               update_rows: int, initial_state=None) -> dict:
    base = tempfile.mkdtemp(prefix=f"gate_bench_{impl.__name__}_")
    try:
        ckpt = os.path.join(base, "ckpt")
        stage = os.path.join(base, "stage")
        os.makedirs(stage)
        # phase 1: registration — streamed through handleInputRows, or
        # (initial_state mode) bulk-loaded by handleInitialState on the
        # first (empty) micro-batch
        if initial_state is not None:
            _stage_one_file(initial_state.limit(0), stage)
            run_impl = lambda src: impl(src, initial_state=initial_state)  # noqa: E731
        else:
            shutil.copy(stage_register, os.path.join(stage, "b000.parquet"))
            run_impl = impl
        t0 = time.perf_counter()
        q = _drain(spark, stage, ckpt, run_impl)
        wall_register = time.perf_counter() - t0
        reg_updated, _, reg_bytes = _progress_stats(q)
        # phase 2: the K update slices, one file -> one micro-batch each
        for i, f in enumerate(stage_updates):
            shutil.copy(f, os.path.join(stage, f"u{i:03d}.parquet"))
        t0 = time.perf_counter()
        q = _drain(spark, stage, ckpt, run_impl)
        wall_updates = time.perf_counter() - t0
        rows_updated, state_rows, byte_totals = _progress_stats(q)
        return {
            "wall_register_sec": round(wall_register, 2),
            "wall_updates_sec": round(wall_updates, 2),
            "updates_per_sec": round(update_rows / wall_updates),
            "rows_updated": rows_updated,
            "rows_updated_register": reg_updated,
            "state_rows_final": state_rows,
            "bytes": byte_totals,
            "bytes_register": reg_bytes,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main():
    args = sys.argv[1:]
    n_parts = int(args[0]) if len(args) > 0 else 4
    items_per_part = int(args[1]) if len(args) > 1 else 20_000
    update_batches = int(args[2]) if len(args) > 2 else 16
    touch_per_part = int(args[3]) if len(args) > 3 else 50
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("gate-bench", master=f"local[{cpus}]")
    # ONE provider for both impls, set before any query ever starts (the
    # per-start conf-mutation race is documented in feed_runner._drain_confs)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    fixtures = tempfile.mkdtemp(prefix="gate_bench_fixtures_")
    try:
        reg_dir = os.path.join(fixtures, "register")
        _stage_one_file(
            _register_frame(spark, n_parts, items_per_part), reg_dir
        )
        reg_file = [
            os.path.join(reg_dir, f)
            for f in os.listdir(reg_dir)
            if f.endswith(".parquet")
        ][0]
        update_files = []
        for i in range(update_batches):
            d = os.path.join(fixtures, f"upd{i:03d}")
            _stage_one_file(
                _update_frame(spark, n_parts, items_per_part, touch_per_part, i),
                d,
            )
            update_files.append(
                [
                    os.path.join(d, f)
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                ][0]
            )
        impls = [gate_stream] + ([gate_stream_tws] if tws_supported() else [])
        update_rows = update_batches * n_parts * touch_per_part
        out_impls = {}
        for impl in impls:
            out_impls[impl.__name__] = bench_impl(
                spark, impl, reg_file, update_files, update_rows
            )
        if tws_supported():
            # third leg: identical standing map, but registered through
            # the bulk initial-state path instead of handleInputRows
            out_impls["gate_stream_tws_initial_state"] = bench_impl(
                spark, gate_stream_tws, reg_file, update_files, update_rows,
                initial_state=_register_frame(spark, n_parts, items_per_part),
            )
        print(
            json.dumps(
                {
                    "metric": "gate_hot_partition",
                    "n_parts": n_parts,
                    "items_per_part": items_per_part,
                    "update_batches": update_batches,
                    "touch_per_part": touch_per_part,
                    "impls": out_impls,
                }
            )
        )
    finally:
        shutil.rmtree(fixtures, ignore_errors=True)


if __name__ == "__main__":
    main()

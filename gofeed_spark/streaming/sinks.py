"""Idempotent keyed upsert sink for foreachBatch — touched-buckets layout.

Exactly-once effect = streaming checkpoint (which batch is next) + this
sink's manifest (which batches already landed).  A re-delivered
micro-batch (restart between sink-commit and checkpoint-commit) is
recognized by its batchId and skipped — the same idempotency contract Delta
gets from txnAppId/txnVersion, implemented over plain parquet because this
container carries no Delta; the swap is one line in a real deployment.

Scale contract (the reference's own is one row per OCC save,
repo.go:125-138): state is HASH-BUCKETED on the merge key and a
micro-batch reads and rewrites ONLY the buckets containing its keys, so
per-batch I/O tracks the batch's keys, not total state — the streaming
twin of the feed store's bucketed layout (feedstate/admin.py
``bucketed_write``), re-expressed in the object-store commit shape:

Write protocol (single streaming writer per query — Spark guarantees
foreachBatch calls are serial): the touched buckets' merged contents are
written under a fresh VERSIONED directory (``data_v{batch_id}/pbkt=bNNNN``)
and published by ONE atomic manifest PUT that carries the committed batch
ids plus a bucket→directory pointer table — untouched buckets keep their
old pointers BY NAME (the manifest-by-name carry from feedstate/txlog.py),
so no directory is ever renamed and no untouched byte is ever rewritten.
A crash before the PUT leaves unreferenced staging subdirs (reclaimed on
the next commit's sweep); after the PUT the batch is fully visible.  There
is no torn state at any crash point.  Legacy tables (bare-list manifest +
``data/``, or the round-11 single-pointer manifest) read transparently and
convert to the bucketed layout inside their first new commit — no extra
manifest version, the feedstate conversion convention.

Bucket values are prefixed non-numeric by construction (``bNNNN``) and the
manifest addresses leaf dirs directly, so partition re-inference can never
bite (the round-7 ANN lesson); the bucket column itself never survives the
read (leaf paths are below the scan roots, so Spark discovers no partition
column).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofeed_spark.fs import get_filesystem

# partition dir name for the bucket column; deliberately NOT "b" (a data
# column named b would collide) and NOT underscore-prefixed (Spark treats
# _-prefixed paths as hidden and would skip the bucket dirs on read)
_BCOL = "pbkt"


class ParquetUpsertSink:
    """foreachBatch callable: keyed last-writer-wins MERGE into a
    hash-bucketed parquet table at ``path`` (the streaming OCC-save twin,
    repo.go:125-138).  ``n_buckets`` fixes the layout modulus at table
    creation; existing tables keep the modulus recorded in their manifest
    (mixing moduli would split keys across buckets).

    Within-batch winner: when ``seq_col`` is given, the row with the
    LARGEST seq value per key wins the within-batch merge (ties break on
    the remaining columns, deterministically) — the real
    last-writer-wins contract for producers that emit several rows per
    key per trigger.  Without ``seq_col`` the sink ASSERTS one row per
    key per batch (the stateful-op producer shape) instead of silently
    picking an arbitrary within-batch winner.

    Fresh-checkpoint hazard: batch ids are scoped to ONE checkpoint
    (Spark restarts them at 0 for a new checkpoint), while this manifest
    — unlike Delta's per-``txnAppId`` versions — has no app identity.
    Re-pointing a NEW stream (fresh checkpoint) at an EXISTING table
    would make its early batches collide with long-committed ids and be
    silently discarded as re-deliveries.  The sink therefore raises when
    the first batch a NEW sink instance sees carries a stale id that is
    not the newest committed one (a legitimate restart only ever
    re-delivers the newest committed batch); resuming a stream with its
    original checkpoint constructs the sink before that newest batch, so
    real restarts are unaffected."""

    # committed-id retention: the manifest keeps a FLOOR plus the newest
    # ids only, so its size is O(n_buckets + retain_batches) no matter how
    # long the stream runs (a month of triggers must not mean re-PUTting
    # millions of ids per commit).  Safe because batch ids from the single
    # writer are monotone and only the newest uncommitted batch is ever
    # re-delivered: anything at or below the floor is long-committed.
    retain_batches = 100

    def __init__(
        self,
        path: str,
        key: str = "partition_id",
        n_buckets: int = 32,
        seq_col: str | None = None,
    ):
        self.path = path
        self.key = key
        self.n_buckets = n_buckets
        self.seq_col = seq_col
        # first-call flag for the fresh-checkpoint detector (see class doc)
        self._saw_batch = False
        # resolve the backend ONCE, driver-side (fs.py: executor/closure
        # code must carry the resolved instance, not re-hit the registry)
        self.fs = get_filesystem(path)
        self.manifest = self.fs.join(path, "_committed_batches.json")
        # observability: bytes + buckets written by the most recent commit
        # (the write-volume metric — tools/bench_sink.py reads these)
        self.last_write_bytes: int | None = None
        self.last_buckets_written: int | None = None

    # -- manifest ----------------------------------------------------------
    def _state(self) -> dict:
        """Normalized ``{"batches": [...], "buckets": {name: rel} | None,
        "data": rel | None, "n_buckets": int | None}`` — accepts the legacy
        bare-list manifest (data at the fixed ``data/``) and the round-11
        single-pointer manifest (``{"batches", "data"}``)."""
        if self.fs.stat(self.manifest) is None:
            return {
                "batches": [], "floor": -1,
                "buckets": None, "data": None, "n_buckets": None,
            }
        raw = json.loads(self.fs.read_bytes(self.manifest))
        if isinstance(raw, list):  # legacy bare-list layout
            return {
                "batches": raw, "floor": -1,
                "buckets": None, "data": "data", "n_buckets": None,
            }
        if "buckets" not in raw:  # round-11 single-pointer layout
            return {
                "batches": raw["batches"], "floor": -1,
                "buckets": None,
                "data": raw.get("data"),
                "n_buckets": None,
            }
        raw.setdefault("floor", -1)
        return raw

    def committed(self) -> list[int]:
        return self._state()["batches"]

    def _read_rels(self, spark, rels: list[str]) -> DataFrame | None:
        if not rels:
            return None
        return spark.read.parquet(
            *[self.fs.spark_path(self.fs.join(self.path, r)) for r in sorted(rels)]
        )

    def read(self, spark) -> DataFrame | None:
        state = self._state()
        if state["buckets"] is not None:
            return self._read_rels(spark, list(state["buckets"].values()))
        if state["data"] is not None:
            return self._read_rels(spark, [state["data"]])
        return None

    # -- the sink ----------------------------------------------------------
    def _bucket_expr(self, nb: int):
        # key cast to string first so the layout is stable across key types
        return F.concat(
            F.lit("b"),
            F.lpad(
                F.pmod(F.xxhash64(F.col(self.key).cast("string")), F.lit(nb))
                .cast("string"),
                4,
                "0",
            ),
        ).alias(_BCOL)

    def _merge_batch(self, batch_df: DataFrame) -> DataFrame:
        """Within-batch reduction to one row per key: ``max_by`` on
        ``seq_col`` (ties broken lexicographically on the remaining
        columns via the struct ordering — deterministic) when configured;
        identity otherwise (one-row-per-key is then ASSERTED inside the
        touched-buckets job, not silently repaired)."""
        if self.seq_col is None:
            return batch_df
        if self.seq_col not in batch_df.columns:
            raise ValueError(f"seq_col {self.seq_col!r} missing from batch")
        others = [
            c for c in batch_df.columns if c not in (self.key, self.seq_col)
        ]
        return (
            batch_df.groupBy(self.key)
            .agg(F.max(F.struct(self.seq_col, *others)).alias("__w"))
            .select(self.key, f"__w.{self.seq_col}", *[f"__w.{c}" for c in others])
            .select(*batch_df.columns)
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        state = self._state()
        if batch_id <= state["floor"] or batch_id in state["batches"]:
            # Stale id.  Legitimate only as a re-delivery of the NEWEST
            # committed batch (restart between sink commit and checkpoint
            # commit — the single-writer contract).  A NEW sink instance
            # seeing any OTHER stale id first is the fresh-checkpoint
            # signature (batch ids restarted at 0 against an existing
            # table): silently skipping would DROP legitimate new data,
            # so refuse loudly (see class doc).
            newest = max(state["batches"]) if state["batches"] else state["floor"]
            if not self._saw_batch and batch_id != newest:
                raise ValueError(
                    f"batch id {batch_id} is already committed in "
                    f"{self.manifest} (newest={newest}) but this sink "
                    "instance has seen no batch yet: this looks like a "
                    "NEW stream (fresh checkpoint, ids restarted at 0) "
                    "pointed at an existing table — its batches would be "
                    "silently discarded as re-deliveries. Use a new table "
                    "path, or resume with the original checkpoint."
                )
            self._saw_batch = True
            return  # re-delivered batch: idempotent skip
        self._saw_batch = True
        spark = batch_df.sparkSession
        if _BCOL in batch_df.columns:
            raise ValueError(
                f"column name {_BCOL!r} is reserved for the sink's bucket "
                "partition key; rename the data column"
            )
        nb = state["n_buckets"] or self.n_buckets
        # Within-batch winner (seq_col) or identity; persist: the batch
        # feeds two jobs (touched-bucket discovery + the write) and must
        # not recompute through the source.
        batch = self._merge_batch(batch_df).persist()
        try:
            old_buckets = state["buckets"] if state["buckets"] is not None else {}
            # One tiny job over the batch (≤ n_buckets rows back): which
            # buckets does it touch, and — when no seq_col declares a
            # winner — does any key appear more than once?  (n == nk per
            # bucket ⇔ one row per key; asserting here costs nothing
            # extra since the discovery pass already scans the batch.)
            stats = (
                batch.groupBy(self._bucket_expr(nb))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count_distinct(F.col(self.key)).alias("nk"),
                )
                .collect()
            )
            if self.seq_col is None and any(r["n"] != r["nk"] for r in stats):
                raise ValueError(
                    "batch contains multiple rows per key but no seq_col "
                    "is configured to pick the within-batch winner; pass "
                    "seq_col= to ParquetUpsertSink for last-writer-wins "
                    "semantics (an arbitrary winner would be "
                    "nondeterministic)"
                )
            if state["buckets"] is None and state["data"] is not None:
                # legacy unbucketed table: fold the layout conversion into
                # this commit — the whole table is "touched" exactly once
                cur = self._read_rels(spark, [state["data"]])
            else:
                touched = {r[_BCOL] for r in stats}
                cur_rels = [old_buckets[b] for b in touched if b in old_buckets]
                cur = self._read_rels(spark, cur_rels)
            if cur is None:
                merged = batch
            else:
                merged = cur.join(
                    batch.select(self.key), self.key, "left_anti"
                ).unionByName(batch)
            new_rel = f"data_v{batch_id:06d}"
            new_dir = self.fs.join(self.path, new_rel)
            # repartition ON the bucket puts each bucket's rows wholly in
            # one task -> exactly one file per bucket (partitionBy alone
            # writes files-per-task-per-bucket; footer overhead then
            # dominates small deltas — the round-8 feedstate measurement)
            merged.withColumn(_BCOL, self._bucket_expr(nb)).repartition(
                F.col(_BCOL)
            ).write.partitionBy(_BCOL).mode("overwrite").parquet(
                self.fs.spark_path(new_dir)
            )
            written = {
                name[len(_BCOL) + 1 :]: f"{new_rel}/{name}"
                for name in self.fs.listdir(new_dir)
                if name.startswith(_BCOL + "=")
            }
            self.last_write_bytes = self.fs.tree_stats(new_dir)[1]
            self.last_buckets_written = len(written)
            buckets = dict(old_buckets)  # untouched buckets carry BY NAME
            buckets.update(written)
            committed = sorted(state["batches"] + [batch_id])
            floor = state["floor"]
            if len(committed) > self.retain_batches:
                floor = max(floor, committed[-self.retain_batches])
                committed = [b for b in committed if b > floor]
            new_state = {
                "batches": committed,
                "floor": floor,
                "buckets": buckets,
                "n_buckets": nb,
            }
            # THE commit point: one atomic whole-object PUT publishes the
            # bucket pointer table and the batch id together — no window
            # where one is visible without the other
            self.fs.put_bytes(self.manifest, json.dumps(new_state).encode())
            # post-commit cleanup; a crash here leaves garbage that the
            # next commit's sweep reclaims
            self._sweep(buckets)
        finally:
            batch.unpersist()

    def _sweep(self, buckets: dict[str, str]) -> None:
        """Reclaim everything the manifest no longer references: whole
        version dirs with no live bucket, superseded bucket subdirs inside
        still-live version dirs, and the legacy ``data/`` dir after its
        conversion commit."""
        live_rels = set(buckets.values())
        live_tops = {rel.split("/")[0] for rel in live_rels}
        for name in self.fs.listdir(self.path):
            full = self.fs.join(self.path, name)
            if not (
                name.startswith(("data_v", "_staging_", "_old_")) or name == "data"
            ) or not self.fs.isdir(full):
                continue
            if name not in live_tops:
                self.fs.delete_tree(full)
                continue
            for sub in self.fs.listdir(full):
                if (
                    sub.startswith(_BCOL + "=")
                    and f"{name}/{sub}" not in live_rels
                ):
                    self.fs.delete_tree(self.fs.join(full, sub))

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

import contextlib
import json
import os
import threading

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from gofeed_spark.feedstate.engine import feed_step
from gofeed_spark.feedstate.model import ITEM_DDL, PARTITION_DDL
from gofeed_spark.feedstate.processors import ProcessorFn
from gofeed_spark.sources.feed_cdc import register_feed_cdc

# AQE-off guard for streaming runs.  Streaming does not support AQE — every
# query start then DISABLES it on a conf clone (ResolveWriteToStream), and
# with TWO in-process runners that per-start mutation races the other
# runner's task serialization over a shared live map: the closure bytes
# truncate mid-write and every overlapping micro-batch dies with
# java.io.OptionalDataException (reproduced ~1-in-8 in the two-runner race
# test; 10/10 clean with AQE off).  Pre-disabling AQE for the DURATION of
# a drain removes the mutation (the resolver sees it already off and
# touches nothing).  Ref-counted so overlapping drains on one session
# restore the caller's setting only after the LAST one finishes; batch
# queries outside a drain keep AQE.
_AQE_LOCK = threading.Lock()
_AQE_DEPTH: dict[int, int] = {}
# session identity -> (the session itself, (saved aqe, saved shuffle parts)).
# Keyed by the SESSION OBJECT, not applicationId: spark.conf is per-session,
# and session CLONES (one runner per clone, the deployment shape
# feed_cdc.register_feed_cdc describes) all share one applicationId — an
# app-keyed guard would skip disabling AQE on the second clone and restore
# the first clone's confs onto whichever session exited last.  Holding the
# session in the value also keeps its id() from being reused while active.
_AQE_SAVED: dict[int, tuple[object, tuple[str, str]]] = {}


@contextlib.contextmanager
def _drain_confs(spark, shuffle_partitions=None):
    """AQE off (+ optional fixed drain parallelism) for the drain's
    lifetime.  AQE off is correctness (the per-start disable race above);
    the fixed shuffle-partition count is the PERFORMANCE replacement for
    what AQE was buying — runtime coalescing of the 32-partition default
    on modest per-batch state (measured at the 200k-item profile: AQE-on
    8.5k/13.5k/8.0k items/s parquet/txlog/dbapi, AQE-off 7.3k/11.9k/4.7k,
    AQE-off + fixed 8: 9.9k/17.2k/7.8k — better than AQE ever was).
    Ref-counted per session object: the first drain's settings win for
    overlapping drains on that session, and that SAME session's confs are
    restored after its last drain exits."""
    key = id(spark)
    with _AQE_LOCK:
        if _AQE_DEPTH.get(key, 0) == 0:
            _AQE_SAVED[key] = (
                spark,
                (
                    spark.conf.get("spark.sql.adaptive.enabled", "true"),
                    spark.conf.get("spark.sql.shuffle.partitions"),
                ),
            )
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            if shuffle_partitions is not None:
                spark.conf.set(
                    "spark.sql.shuffle.partitions", str(shuffle_partitions)
                )
        _AQE_DEPTH[key] = _AQE_DEPTH.get(key, 0) + 1
    try:
        yield
    finally:
        with _AQE_LOCK:
            _AQE_DEPTH[key] -= 1
            if _AQE_DEPTH[key] == 0:
                del _AQE_DEPTH[key]
                sess, (aqe, sp) = _AQE_SAVED.pop(key)
                sess.conf.set("spark.sql.adaptive.enabled", aqe)
                sess.conf.set("spark.sql.shuffle.partitions", sp)


class FeedRunner:
    """Continuous feed processing over versioned state tables.

    ``items`` is both source and sink: the CDC source reads new/changed
    rows; the engine writes processed rows back with ``updated_at`` bumped
    to the micro-batch watermark, which re-queues continuation work — the
    same convergence-through-the-data loop as the reference (failed but
    retryable items stay Available and re-match the next poll,
    item.go:27-38 / repo.go:114-120).

    ``storage``: ``"parquet"`` (default) writes plain table dirs flipped by
    ``transactional_write`` — single-writer-safe, the original layout.
    ``"txlog"`` commits both tables through the manifest log
    (feedstate/txlog.py): multi-writer-safe — a concurrent runner's commit
    loses the O_EXCL claim, and this runner re-reads the fresh state and
    recomputes before retrying, the reference's dirty=false path at the
    storage layer.
    ``"dbapi"`` keeps both tables in a PEP-249 database
    (feedstate/dbstore.py — the reference's literal Gorm-over-SQL
    deployment): the CDC source polls it with a cursor and writes land as
    per-row OCC upserts, so out-of-band INSERTS arriving mid-batch
    survive (a snapshot flip would rewrite the table around them) and a
    concurrent row update can never be clobbered by a stale runner write.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        processor: ProcessorFn,
        max_retries: int = 5,
        manual_checkpoint: bool = False,
        auto_close: bool = True,
        storage: str = "parquet",
        runner_id: str = "",
        dbapi_module: str = "sqlite3",
        db_path: str | None = None,
        table_prefix: str = "",
        fanout_rows: int = 200_000,
        poll_limit: int | None = None,
        drain_shuffle_partitions: int | None = 8,
        state_buckets: int = 16,
        bucket_target_bytes: int = 16 * 1024 * 1024,
        max_state_buckets: int = 4096,
        small_delta_rows: int = 8192,
    ):
        """``runner_id``: distinct per concurrent runner sharing one store
        (txlog mode) — each runner keeps its OWN streaming checkpoint and
        batch manifest (its private poll offsets, like each reference
        watcher's in-process cursor) while the shared TxLog arbitrates the
        state commits.

        ``table_prefix``: namespaces this feed's tables (reference
        ``main.go:29`` / README.md:131-135) so several feed instances can
        cohabit ONE store — one database (dbapi), one warehouse dir
        (parquet), or one manifest log (txlog): ``{prefix}items``,
        ``{prefix}partitions``, ``{prefix}dead_letter``, with the
        checkpoint/manifest paths namespaced alongside.

        ``fanout_rows`` (dbapi): active-work rows per read partition.  A
        pushed-down COUNT sizes each micro-batch's read; at or below one
        partition's worth the read is a single driver-side SELECT, above
        it the rows come in executor-side as ``updated_at`` range
        predicates (DbApiStore.read_items num_partitions) so large active
        state never funnels through the driver.

        ``poll_limit``: caps each CDC poll's backlog (the reference's poll
        LIMIT, repo.go:114-120) so a hot producer can't balloon one
        micro-batch; undelivered rows re-poll next round and
        ``run_available`` keeps draining until quiescent.

        ``state_buckets`` (parquet/txlog): the items/partitions tables are
        laid out hash-bucketed (bucket = pmod(xxhash64(id), n); directory
        values prefixed ``b0007``-style, non-numeric by construction) and
        each micro-batch rewrites ONLY buckets containing touched rows —
        write volume scales with work done, not table size, the snapshot-
        store twin of the dbapi backend's per-row upserts.  A legacy
        (unbucketed) table converts inside the first batch commit.  Size it
        so one bucket ≈ one comfortable write task at your state size;
        more buckets = finer write granularity + more files.

        The LAYOUT owns the modulus: an existing bucketed table records
        its bucket count in the layout itself (parquet: an ``_n_buckets``
        marker inside the table dir, flipped atomically with conversions;
        txlog: ``@m{n}b{NNNN}`` manifest keys, committed atomically with
        the data), and ``__init__`` ADOPTS that value over a disagreeing
        ``state_buckets`` argument — restarting with a different number
        can never mix two moduli over one table (which would silently
        duplicate or strand rows).  Pre-marker legacy layouts are claimed
        with the configured value on first contact.

        ``bucket_target_bytes`` / ``max_state_buckets``: size-tiered
        growth.  When the items table's mean bucket size exceeds the
        target, the next batch commit converts the state to the next
        power-of-two bucket count that brings it back under (same
        in-commit mechanism as the legacy conversion: no extra manifest
        version, atomic) — so per-batch write volume stays
        ~O(touched rows × bucket_target_bytes) as the table grows, the
        reference contract of one row per save (repo.go:125-138)
        approximated with a bounded constant instead of degrading
        linearly with table size.

        ``small_delta_rows``: staging writes at or below this row count
        skip the ``repartition(b)`` shuffle (``coalesce(1)`` writes the
        identical one-file-per-bucket layout from one task) — the shuffle
        cost ~10-14% of feed throughput at the 200k-item profile for
        typical few-KB deltas."""
        self.spark = spark
        self.base = base_path
        self.runner_id = runner_id or "w0"
        self.prefix = table_prefix
        self.t_items = f"{table_prefix}items"
        self.t_parts = f"{table_prefix}partitions"
        self.t_dead = f"{table_prefix}dead_letter"
        self.items_path = os.path.join(base_path, self.t_items)
        self.parts_path = os.path.join(base_path, self.t_parts)
        suffix = (f"_{table_prefix}" if table_prefix else "") + (
            f"_{runner_id}" if runner_id else ""
        )
        self.ckpt = os.path.join(base_path, f"_checkpoint{suffix}")
        self.manifest = os.path.join(base_path, f"_batches{suffix}.json")
        # Per-runner dead-letter partition dir: concurrent Spark jobs must
        # never append into ONE directory (FileOutputCommitter's shared
        # _temporary staging is not concurrency-safe); readers scan the
        # dead_letter root and see `writer` as a partition column.
        self.dead_dir = os.path.join(
            base_path, self.t_dead, f"writer={runner_id or 'w0'}"
        )
        self.processor = processor
        self.max_retries = max_retries
        self.manual_checkpoint = manual_checkpoint
        self.auto_close = auto_close
        if storage not in ("parquet", "txlog", "dbapi"):
            raise ValueError("storage must be 'parquet', 'txlog' or 'dbapi'")
        self.storage = storage
        if storage == "txlog":
            from gofeed_spark.feedstate.txlog import TxLog

            self.log = TxLog(base_path)
        elif storage == "dbapi":
            from gofeed_spark.feedstate.dbstore import DbApiStore

            os.makedirs(base_path, exist_ok=True)
            self.db_path = db_path or os.path.join(base_path, "state.db")
            self.dbapi_module = dbapi_module
            self.db = DbApiStore(self.db_path, dbapi_module, table_prefix=table_prefix)
            self.db.ensure_schema()
        self.fanout_rows = max(1, fanout_rows)
        if poll_limit is not None and poll_limit < 1:
            raise ValueError("poll_limit must be >= 1 (None = unbounded)")
        self.poll_limit = poll_limit
        # Drain-time shuffle parallelism (None = leave the session's).
        # Feed state per micro-batch is modest; with AQE off during drains
        # (see _drain_confs) a fixed small count replaces AQE's runtime
        # coalescing and measures FASTER than AQE ever did at the 200k
        # profile.  Size it up only for very large active state.
        self.drain_shuffle_partitions = drain_shuffle_partitions
        if state_buckets < 1:
            raise ValueError("state_buckets must be >= 1")
        self.state_buckets = state_buckets
        self.bucket_target_bytes = max(1, bucket_target_bytes)
        self.max_state_buckets = max(state_buckets, max_state_buckets)
        if self.max_state_buckets > 9999:
            # bucket dir values are zero-padded to 4 digits ('b0000'…);
            # lpad TRUNCATES longer strings, which would silently collide
            # buckets — refuse rather than corrupt
            raise ValueError("state_buckets/max_state_buckets must be <= 9999")
        self.small_delta_rows = small_delta_rows
        self._grow_to: int | None = None
        self._rel_bytes: dict[str, int] = {}
        # adopt the layout's modulus over a disagreeing ctor argument —
        # see the docstring; self.bucket_count_adopted records it happened
        self.bucket_count_adopted = False
        layout_n = self._layout_bucket_count()
        if layout_n is not None and layout_n != self.state_buckets:
            self.state_buckets = layout_n
            self.bucket_count_adopted = True
        # write-volume accounting (bytes staged per table, last batch and
        # cumulative, plus a bounded per-batch history) — the bench_feed
        # metric proving writes track work done, not table size
        import collections

        self.last_write_bytes: dict[str, int] = {}
        self.total_write_bytes: int = 0
        self.write_history: collections.deque = collections.deque(maxlen=64)
        register_feed_cdc(self.spark)

    # -- state-table accessors -------------------------------------------
    def _bucket_col(self, n_buckets: int | None = None):
        """Deterministic bucket value for an id: 'b' + zero-padded
        pmod(xxhash64(id), n_buckets).  The prefix keeps the partition
        directory value non-numeric by construction (a numeric-looking
        string would re-infer as INT on read and silently break isin
        probes on values with leading zeros)."""
        n = self.state_buckets if n_buckets is None else n_buckets
        return F.concat(
            F.lit("b"),
            F.lpad(
                F.pmod(F.xxhash64(F.col("id")), F.lit(n)).cast(
                    "string"
                ),
                4,
                "0",
            ),
        )

    def _parquet_legacy(self, path: str) -> bool:
        """True when ``path`` is not yet in bucketed layout (missing, empty,
        or root-level part files) — the next write converts wholesale."""
        if not os.path.isdir(path):
            return True
        return not any(e.startswith("b=") for e in os.listdir(path))

    def _txlog_rels(self, tables: dict, table: str) -> list[str]:
        # "@b": legacy bucket keys; "@m": modulus-stamped keys (m{n}bNNNN)
        keys = [
            k
            for k in tables
            if k == table
            or k.startswith(table + "@b")
            or k.startswith(table + "@m")
        ]
        return [tables[k] for k in sorted(keys)]

    @staticmethod
    def _manifest_modulus(tables: dict, table: str) -> int | None:
        """Bucket modulus recorded in a manifest's ``{table}@m{n}bNNNN``
        keys — committed atomically with the data, so concurrent runners
        derive the SAME modulus as the snapshot they read (a racing
        conversion makes their commit conflict and recompute).  None for
        legacy ``@b`` keys / plain entries (modulus not recorded)."""
        prefix = table + "@m"
        for k in tables:
            if k.startswith(prefix):
                return int(k[len(prefix):].split("b", 1)[0])
        return None

    def _layout_bucket_count(self) -> int | None:
        """The bucket modulus the EXISTING state layout was written under,
        or None (no state yet / legacy pre-marker layout)."""
        if self.storage == "parquet":
            from gofeed_spark.feedstate.admin import read_bucket_marker

            return read_bucket_marker(self.items_path)
        if self.storage == "txlog":
            try:
                _, tables = self.log.latest()
            except Exception:
                return None
            return self._manifest_modulus(tables, self.t_items)
        return None

    def _maybe_schedule_growth(self, items_table_bytes: int) -> None:
        """Size-tiered buckets: when mean bucket size exceeds the target,
        schedule the next power-of-two count that brings it back under.
        The NEXT batch commit performs the conversion (full restage under
        the new modulus, same in-commit mechanism as the legacy
        conversion), keeping per-batch write volume ~O(touched rows ×
        bucket_target_bytes) as state grows."""
        n = self.state_buckets
        while (
            items_table_bytes / n > self.bucket_target_bytes
            and n < self.max_state_buckets
        ):
            n *= 2
        if n != self.state_buckets:
            self._grow_to = min(n, self.max_state_buckets)

    def _txlog_table_bytes(self, tables: dict, table: str) -> int:
        """Total on-disk bytes of a txlog table across its manifest rels.
        Rel snapshots are immutable, so per-rel sizes cache forever (the
        cache is pruned to the manifest's live set each call — bounded by
        rel count); an object-store deployment would read sizes straight
        off the manifest instead of listing."""
        rels = [
            v
            for k, v in tables.items()
            if k == table or k.startswith(table + "@")
        ]
        from gofeed_spark.feedstate.admin import _dir_bytes

        total = 0
        fresh: dict[str, int] = {}
        for rel in rels:
            b = self._rel_bytes.get(rel)
            if b is None:
                b = _dir_bytes(os.path.join(self.base, rel))
            fresh[rel] = b
            total += b
        self._rel_bytes = fresh
        return total

    def _txlog_read(self, table):
        """Read a possibly-bucketed txlog table: the union of the plain
        entry (legacy / pre-conversion) and every ``{table}@bNNNN`` bucket
        snapshot named by the latest manifest."""
        _, tables = self.log.latest()
        return self._txlog_read_snapshot(tables, table)

    def _txlog_read_snapshot(self, tables: dict, table: str):
        """Same as ``_txlog_read`` but against an EXPLICIT manifest
        snapshot.  ``commit_retry`` compute closures must use this with
        the tables dict they were handed: re-reading ``latest()`` inside
        the closure races a concurrent commit, building writes from a
        newer snapshot than the OCC expected_version — a guaranteed
        conflict that burns retry attempts."""
        rels = self._txlog_rels(tables, table)
        if not rels:
            raise ValueError(f"table {table!r} not in commit: {sorted(tables)}")
        return self.spark.read.parquet(
            *[os.path.join(self.base, r) for r in rels]
        )
    def _read_fanout(self, n_rows: int) -> int:
        """Read partitions for an n_rows read: 1 (plain driver SELECT) up
        to 32 executor-side ranges, one per `fanout_rows` of volume."""
        return min(32, max(1, (n_rows + self.fanout_rows - 1) // self.fanout_rows))

    def _items_with_ts(self):
        if self.storage == "txlog":
            return self._txlog_read(self.t_items).drop("b")
        if self.storage == "dbapi":
            # full-table accessor: size the read from a pushed-down COUNT
            # so even user-facing reads never funnel big state through the
            # driver
            return self.db.read_items(
                self.spark, num_partitions=self._read_fanout(self.db.count_items())
            )
        from gofeed_spark.feedstate.admin import recover_bucketed

        recover_bucketed(self.base, [self.t_items])
        return self.spark.read.parquet(self.items_path).drop("b")

    def items(self):
        return self._items_with_ts().drop("updated_at")

    def partitions(self):
        if self.storage == "txlog":
            return self._txlog_read(self.t_parts).drop("b")
        if self.storage == "dbapi":
            return self.db.read_partitions(self.spark)
        from gofeed_spark.feedstate.admin import recover_bucketed

        recover_bucketed(self.base, [self.t_parts])
        return self.spark.read.parquet(self.parts_path).drop("b")

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
        try:
            empty = changed.isEmpty()
        except Exception:
            # Transient task loss (local mode fails a job on FIRST task
            # failure; concurrent Python-data-source queries occasionally
            # hit a JVM deserialization hiccup) — one retry re-runs the job.
            empty = changed.isEmpty()
        if empty:
            return
        # txlog mode: a concurrent runner may win the commit claim; re-read
        # the fresh snapshot and recompute (at-least-once, like every retry
        # path here — the batch-id manifest still dedups whole batches).
        attempts = 8 if self.storage == "txlog" else 1
        last_conflict = None
        for _ in range(attempts):
            if self._attempt(batch_id):
                return
            from gofeed_spark.feedstate.txlog import CommitConflict

            last_conflict = CommitConflict("txlog commit lost repeatedly")
        raise last_conflict

    def _attempt(self, batch_id: int) -> bool:
        # Every localCheckpoint this attempt creates is released on the way
        # out (success, conflict, or raise): once the storage commit has the
        # data — or the attempt is abandoned — the checkpoint blocks are
        # dead weight, and a long-lived runner would otherwise accumulate
        # 4-5 of them per micro-batch until driver GC notices.
        ckpts: list = []

        def ckpt(df):
            d = df.localCheckpoint()
            ckpts.append(d)
            return d

        try:
            return self._attempt_inner(batch_id, ckpt)
        finally:
            from gofeed_spark.functions.lineage import release_local_checkpoint

            for d in ckpts:
                release_local_checkpoint(d)

    def _attempt_inner(self, batch_id: int, ckpt) -> bool:
        from gofeed_spark.feedstate.model import AVAILABLE, COMPLETE

        expected = self.log.latest()[0] if self.storage == "txlog" else None
        decision_counts = None
        if self.storage == "dbapi":
            # Decision-step reads push the reference's poll predicates into
            # the database (repo.go:114-120 over the covering index): the
            # gate decision consumes ONE pushed-down GROUP BY (the
            # GetStatusCounts twin), so only the rows processing can touch —
            # Available items in non-Complete partitions — ever cross the
            # driver.  Complete rows are never rewritten, and terminal
            # Failed rows (which accumulate for the feed's lifetime) are
            # counted in the database, never fetched: micro-batch cost
            # scales with READY work, not table size.
            decision_counts = self.db.read_decision_counts(self.spark)
            avail = self.db.count_items(statuses=(AVAILABLE,))
            with_ts = self.db.read_items(
                self.spark,
                statuses=(AVAILABLE,),
                num_partitions=self._read_fanout(avail),
            )
            parts = self.db.read_partitions(
                self.spark, exclude_statuses=(COMPLETE,)
            )
        else:
            with_ts = self._items_with_ts()
            parts = self.partitions()
        items = with_ts.drop("updated_at")
        new_parts, new_items = feed_step(
            parts,
            items,
            self.processor,
            max_retries=self.max_retries,
            manual_checkpoint=self.manual_checkpoint,
            auto_close=self.auto_close,
            decision_counts=decision_counts,
        )
        # Materialize the processor output ONCE, immediately: everything
        # below (dead.isEmpty, dead.write, the items upsert) would otherwise
        # re-execute the uncached feed_step DAG and re-run the side-effectful
        # processor (HTTP POSTs) up to 3× per micro-batch — and a
        # non-deterministic outcome could make the dead-letter log disagree
        # with the committed items table.
        new_items = ckpt(new_items)
        new_parts = ckpt(new_parts)
        # Re-queue ONLY rows whose version moved this step: they get
        # updated_at = batch tick (> the source's high-water mark), so the
        # CDC source re-delivers them for the next decision round; untouched
        # rows keep their timestamp and are not re-delivered — quiescence
        # is reached exactly when a step changes nothing.
        # The re-queue tick must exceed the GLOBAL high-water mark the CDC
        # source has seen (which may sit on a Complete row outside the
        # predicate-pushed read) — in dbapi mode it comes back as ONE
        # pushed-down, index-only MAX, not a row fetch.
        if self.storage == "dbapi":
            tick = self.db.max_updated_at() + 1
        else:
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
        changed = F.col("version") > F.coalesce(F.col("__old_v"), F.lit(-1))
        out_items = (
            joined.withColumn(
                "updated_at",
                F.when(changed, F.lit(tick))
                .otherwise(F.coalesce(F.col("__old_ts"), F.lit(0)))
                .cast("long"),
            )
            .withColumn("__changed", changed)
            .drop("__old_v", "__old_ts", "__old_status")
        )
        # Dead-letter routing: items that TRANSITIONED to Failed this step
        # (retries exhausted or non-retryable — item.go:35-37) land in a
        # log with their error trail.
        from gofeed_spark.feedstate.model import FAILED as _FAILED

        dead = joined.filter(
            (F.col("status") == _FAILED)
            & (F.coalesce(F.col("__old_status"), F.lit(-1)) != _FAILED)
        ).select(
            "id", "partition_id", "gate", "retry_count", "error_messages", "data",
            F.lit(tick).alias("failed_at_tick"),
        )
        # Materialize dead BEFORE the storage commit: its lineage reads the
        # PRE-commit items table, whose files the commit replaces.
        dead = ckpt(dead)
        if self.storage == "txlog":
            # EXACTLY-once dead letters: the dead_letter table rides in the
            # SAME atomic manifest commit as the state tables — a crash can
            # never separate a Failed transition from its dead-letter row,
            # and a conflict retry recomputes both together.  State tables
            # commit BUCKETED: only buckets containing touched rows are
            # staged as fresh snapshot dirs; every untouched bucket is
            # carried into the new manifest by NAME — zero bytes written,
            # so commit volume scales with work done, not table size.  A
            # legacy plain-table manifest converts inside this same commit
            # (all buckets staged, the plain entry dropped) at no extra
            # version.  Dead letters are exactly that append sink: one
            # immutable delta snapshot per failing batch, carried forward
            # by name ever after.
            import shutil as _shutil
            import uuid as _uuid

            from gofeed_spark.feedstate.admin import _dir_bytes
            from gofeed_spark.feedstate.txlog import CommitConflict

            _, prev_tables = self.log.latest()
            token = _uuid.uuid4().hex[:8]
            # The LAYOUT owns the modulus: adopt the snapshot's stamped
            # bucket count (``@m{n}b...`` keys) — a concurrent runner may
            # have converted the table since our __init__, and computing
            # touched buckets under a different modulus than the layout
            # would flip deltas against wrongly-shaped buckets.  A layout
            # with only legacy un-stamped ``@b`` keys has an UNKNOWABLE
            # modulus, so it converts wholesale this commit (claiming the
            # configured value) — same in-commit mechanism as the plain
            # legacy conversion, no extra manifest version.
            m_items = self._manifest_modulus(prev_tables, self.t_items)
            if m_items is not None and m_items != self.state_buckets:
                self.state_buckets = m_items
                self._grow_to = None  # re-derive against the adopted layout
            grow = self._grow_to
            n_buckets = grow if grow is not None else self.state_buckets

            def _needs_convert(table, modulus):
                if grow is not None or table in prev_tables:
                    return True
                if modulus is None:  # legacy @b keys, modulus unknown
                    return any(
                        k.startswith(table + "@b") for k in prev_tables
                    )
                return modulus != n_buckets

            convert_items = _needs_convert(self.t_items, m_items)
            convert_parts = _needs_convert(
                self.t_parts, self._manifest_modulus(prev_tables, self.t_parts)
            )
            writes: dict = {
                k: v
                for k, v in prev_tables.items()
                if (
                    not convert_items
                    and (
                        k.startswith(self.t_items + "@b")
                        or k.startswith(self.t_items + "@m")
                    )
                )
                or (
                    not convert_parts
                    and (
                        k.startswith(self.t_parts + "@b")
                        or k.startswith(self.t_parts + "@m")
                    )
                )
                or k == self.t_dead  # legacy plain dead-letter snapshot
                or k.startswith(self.t_dead + "@d")  # per-batch deltas
            }
            fresh_rels: list[str] = []
            stats: dict[str, int] = {}

            def stage_buckets(table, sel, full, delta_rows=None):
                # ONE partitionBy write job (``sel`` is already filtered to
                # touched buckets unless ``full``; repartition ON b = one
                # file per bucket), then rename each produced bucket dir to
                # a top-level snapshot name (vacuum's __v convention) —
                # never one Spark job per bucket.  A KNOWN-small delta
                # skips the repartition shuffle: coalesce(1) writes the
                # identical one-file-per-bucket layout from one task over
                # the checkpointed in-memory blocks.
                staging = os.path.join(self.base, f"{table}__vstage_{token}")
                _shutil.rmtree(staging, ignore_errors=True)
                if delta_rows is not None and delta_rows <= self.small_delta_rows:
                    sel = sel.coalesce(1)
                else:
                    sel = sel.repartition(F.col("b"))
                sel.write.partitionBy("b").mode("overwrite").parquet(staging)
                for entry in os.listdir(staging):
                    if not entry.startswith("b="):
                        continue
                    # key carries the layout's modulus: {table}@m{n}b{NNNN}
                    rel = f"{table}@m{n_buckets}{entry[2:]}__v_{token}"
                    os.replace(
                        os.path.join(staging, entry), os.path.join(self.base, rel)
                    )
                    writes[f"{table}@m{n_buckets}{entry[2:]}"] = rel
                    fresh_rels.append(rel)
                    stats[table] = stats.get(table, 0) + _dir_bytes(
                        os.path.join(self.base, rel)
                    )
                _shutil.rmtree(staging, ignore_errors=True)

            items_b = ckpt(out_items.withColumn("b", self._bucket_col(n_buckets)))
            if convert_items:
                # legacy plain entry / un-stamped layout / scheduled
                # growth: convert wholesale this commit
                stage_buckets(self.t_items, items_b.drop("__changed"), True)
            else:
                # one collect yields touched buckets AND their full row
                # counts (the delta is the whole content of each touched
                # bucket) — same job count as a distinct() would be
                brows = (
                    items_b.groupBy("b")
                    .agg(
                        F.count("*").alias("c"),
                        F.max(F.col("__changed").cast("int")).alias("t"),
                    )
                    .collect()
                )
                tb = [r.b for r in brows if r.t == 1]
                if tb:
                    stage_buckets(
                        self.t_items,
                        items_b.filter(F.col("b").isin(tb)).drop("__changed"),
                        False,
                        delta_rows=sum(r.c for r in brows if r.t == 1),
                    )
            parts_b = new_parts.withColumn("b", self._bucket_col(n_buckets))
            if convert_parts:
                stage_buckets(self.t_parts, parts_b, True)
            else:
                ch = self._changed_part_ids(parts, new_parts)
                prows = (
                    parts_b.join(
                        ch.withColumn("__t", F.lit(1)), "id", "left"
                    )
                    .groupBy("b")
                    .agg(
                        F.count("*").alias("c"),
                        F.max("__t").alias("t"),
                    )
                    .collect()
                )
                pb = [r.b for r in prows if r.t == 1]
                if pb:
                    stage_buckets(
                        self.t_parts,
                        parts_b.filter(F.col("b").isin(pb)),
                        False,
                        delta_rows=sum(r.c for r in prows if r.t == 1),
                    )
            # Dead letters land as a PER-BATCH delta snapshot
            # (``dead_letter@d_<token>``): prior deltas ride forward by
            # name (zero rewrite — the append-sink shape the table-rewrite
            # comment used to promise), and the new rows still share this
            # manifest's atomicity with the state tables.  Readers union
            # every delta (plus a legacy plain snapshot, carried above).
            if not dead.isEmpty():
                writes[f"{self.t_dead}@d_{token}"] = dead
            try:
                self.log.commit(writes, expected_version=expected)
            except CommitConflict:
                # losers clean their own pre-staged bucket snapshots (the
                # same courtesy commit() extends to DataFrame stagings)
                for rel in fresh_rels:
                    _shutil.rmtree(
                        os.path.join(self.base, rel), ignore_errors=True
                    )
                return False  # recompute against the fresh snapshot
            if grow is not None:
                self.state_buckets = grow
                self._grow_to = None
            self._record_write(batch_id, stats)
            self._maybe_schedule_growth(
                self._txlog_table_bytes(writes, self.t_items)
            )
        elif self.storage == "dbapi":
            # Dead letters first (same at-least-once ordering as parquet
            # mode), then per-row CAS upserts of ONLY the rows this step
            # touched: touched items carry version+1 (so the strict
            # `excluded.version > version` guard applies them, and the loser
            # of a two-writer race is dropped row-by-row in the database);
            # untouched rows are simply not in the statement — no table
            # rewrite, so concurrent out-of-band inserts survive, and the
            # write volume scales with work done, not table size.
            if not dead.isEmpty():
                dead.write.mode("append").parquet(self.dead_dir)
            self.db.upsert_items(out_items.filter("__changed").drop("__changed"))
            # gate_decision carries the partition version through unchanged;
            # bump it here for partitions whose decision actually moved so
            # the CAS accepts exactly those rows, and skip the rest entirely
            changed_parts = new_parts.join(
                self._changed_part_ids(parts, new_parts), "id"
            ).select(
                "id",
                (F.col("version") + 1).alias("version"),
                "gate",
                "status",
            )
            self.db.upsert_partitions(changed_parts)
        else:
            # Parquet mode is single-writer: write dead letters BEFORE the
            # state flip so a crash between the two can only DUPLICATE a
            # dead letter on batch replay (at-least-once, the reference's
            # posture), never lose one — the post-crash recompute sees the
            # item already Failed and would skip it.  State lands through
            # bucketed_write: only buckets containing touched rows are
            # rewritten (write volume tracks work done); a legacy
            # unbucketed table converts wholesale on its first write.
            if not dead.isEmpty():
                dead.write.mode("append").parquet(self.dead_dir)
            from gofeed_spark.feedstate.admin import (
                _dir_bytes,
                bucketed_write,
                read_bucket_marker,
            )

            grow = self._grow_to
            n_buckets = grow if grow is not None else self.state_buckets

            def _full_rewrite(path):
                # legacy plain layout, OR a bucketed layout that predates
                # the ``_n_buckets`` marker (its modulus is unknowable —
                # claim it under the configured value, stamping the
                # marker), OR scheduled size-tiered growth
                if grow is not None or self._parquet_legacy(path):
                    return True
                return (
                    os.path.exists(path)
                    and read_bucket_marker(path) is None
                )

            items_b = ckpt(out_items.withColumn("b", self._bucket_col(n_buckets)))
            writes = {}
            if _full_rewrite(self.items_path):
                writes[self.t_items] = (items_b.drop("__changed"), None)
            else:
                # touched buckets + their full row counts in ONE collect
                # over the CHECKPOINTED frame (an in-memory scan, not a
                # recompute) so an untouched table skips its write job
                # entirely — the common case for a mostly-settled feed —
                # and a known-small delta skips the repartition shuffle
                brows = (
                    items_b.groupBy("b")
                    .agg(
                        F.count("*").alias("c"),
                        F.max(F.col("__changed").cast("int")).alias("t"),
                    )
                    .collect()
                )
                tb = [r.b for r in brows if r.t == 1]
                if tb:
                    writes[self.t_items] = (
                        items_b.filter(F.col("b").isin(tb)).drop("__changed"),
                        "auto",
                        sum(r.c for r in brows if r.t == 1),
                    )
            parts_b = new_parts.withColumn("b", self._bucket_col(n_buckets))
            if _full_rewrite(self.parts_path):
                writes[self.t_parts] = (parts_b, None)
            else:
                ch = self._changed_part_ids(parts, new_parts)
                prows = (
                    parts_b.join(ch.withColumn("__t", F.lit(1)), "id", "left")
                    .groupBy("b")
                    .agg(F.count("*").alias("c"), F.max("__t").alias("t"))
                    .collect()
                )
                pb = [r.b for r in prows if r.t == 1]
                if pb:
                    writes[self.t_parts] = (
                        parts_b.filter(F.col("b").isin(pb)),
                        "auto",
                        sum(r.c for r in prows if r.t == 1),
                    )
            stats = bucketed_write(
                self.spark,
                writes,
                self.base,
                n_buckets,
                small_delta_rows=self.small_delta_rows,
            )
            if grow is not None:
                self.state_buckets = grow
                self._grow_to = None
            self._record_write(batch_id, stats)
            self._maybe_schedule_growth(_dir_bytes(self.items_path))
        self._commit(batch_id)
        return True

    def _record_write(self, batch_id: int, stats: dict[str, int]) -> None:
        self.last_write_bytes = stats
        self.total_write_bytes += sum(stats.values())
        self.write_history.append({"batch_id": batch_id, **stats})

    def _changed_part_ids(self, parts, new_parts):
        """ids of partitions whose decision (gate or status) moved this
        step — the write set for every backend's partition upsert."""
        old_p = parts.select(
            "id",
            F.col("gate").alias("__og"),
            F.col("status").alias("__os"),
        )
        return (
            new_parts.join(old_p, "id")
            .filter(
                (F.col("gate") != F.col("__og"))
                | (F.col("status") != F.col("__os"))
            )
            .select("id")
        )

    def dead_letters(self):
        """The dead-letter log as a DataFrame (None when nothing failed)."""
        if self.storage == "txlog":
            _, tables = self.log.latest()
            rels = [
                tables[k]
                for k in sorted(tables)
                if k == self.t_dead or k.startswith(self.t_dead + "@d")
            ]
            if not rels:
                return None
            return self.spark.read.parquet(
                *[os.path.join(self.base, r) for r in rels]
            )
        root = os.path.join(self.base, self.t_dead)
        if not os.path.exists(root):
            return None
        return self.spark.read.parquet(root)

    def requeue_dead_letters(self, ids=None) -> int:
        """Ops-loop recovery, automated: flip dead-lettered FAILED items
        back to Available with retry_count reset and a fresh ``updated_at``
        tick (above the CDC high-water mark, so the next poll re-delivers
        them), and re-open their FAILED partitions.  The reference
        documents this as a manual step (README.md:104-110: "you can later
        update the partition to make sure it is in the Available state");
        here it is one OCC-guarded write.  ``ids`` restricts the requeue
        to those item ids (None = every dead-lettered item).  The
        dead-letter log keeps its rows — it is an audit log, not a queue.
        Returns the number of items requeued."""
        from gofeed_spark.feedstate.model import AVAILABLE, FAILED
        from gofeed_spark.functions.lineage import release_local_checkpoint

        dead = self.dead_letters()
        if dead is None:
            return 0
        dids = dead.select("id").distinct()
        if ids is not None:
            dids = dids.filter(F.col("id").isin([*ids]))

        def build_requeued(items_t, tick):
            return (
                items_t.join(dids, "id")
                .filter(F.col("status") == FAILED)
                .select(
                    "id",
                    (F.col("version") + 1).cast("int").alias("version"),
                    F.lit(0).cast("int").alias("retry_count"),
                    "partition_id",
                    "gate",
                    F.lit(AVAILABLE).cast("int").alias("status"),
                    F.lit("").alias("error_messages"),
                    "data",
                    F.lit(tick).cast("long").alias("updated_at"),
                )
            )

        def build_reopened(parts_t, requeued):
            part_ids = requeued.select(
                F.col("partition_id").alias("id")
            ).distinct()
            return (
                parts_t.join(part_ids, "id")
                .filter(F.col("status") == FAILED)
                .select(
                    "id",
                    (F.col("version") + 1).cast("int").alias("version"),
                    "gate",
                    F.lit(AVAILABLE).cast("int").alias("status"),
                )
            )

        released: list = []
        try:
            if self.storage == "txlog":
                # Versions and the updated_at tick are derived INSIDE the
                # compute closure from the snapshot commit_retry hands it:
                # an OCC retry after a concurrent commit re-reads fresh
                # state, so it can never write stale versions or a tick
                # at/below the new CDC high-water mark (which would let the
                # requeue be clobbered or never re-delivered).
                counted = {"n": 0}

                def compute(version, tables):
                    # reads span plain + bucket entries; the write below is
                    # a plain full-table snapshot (requeue is a rare ops
                    # action) whose manifest drops the bucket entries — the
                    # next micro-batch commit re-buckets it
                    items_t = self._txlog_read_snapshot(tables, self.t_items).drop("b")
                    parts_t = self._txlog_read_snapshot(tables, self.t_parts).drop("b")
                    tick = (
                        items_t.agg(F.max("updated_at")).collect()[0][0] or 0
                    ) + 1
                    requeued = build_requeued(items_t, tick).localCheckpoint()
                    released.append(requeued)
                    counted["n"] = requeued.count()
                    if counted["n"] == 0:
                        # nothing left to requeue against THIS snapshot
                        # (e.g. a concurrent requeue won): carry every
                        # table forward by name — a no-rewrite commit.
                        return dict(tables)
                    reopened = build_reopened(parts_t, requeued).localCheckpoint()
                    released.append(reopened)
                    writes = {
                        self.t_items: items_t.join(
                            requeued.select("id"), "id", "left_anti"
                        ).unionByName(requeued.select(*items_t.columns)),
                        self.t_parts: parts_t.join(
                            reopened.select("id"), "id", "left_anti"
                        ).unionByName(reopened.select(*parts_t.columns)),
                    }
                    for k, v in tables.items():  # dead-letter snapshots by name
                        if k == self.t_dead or k.startswith(self.t_dead + "@d"):
                            writes[k] = v
                    return writes

                self.log.commit_retry(compute)
                return counted["n"]
            with_ts = self._items_with_ts()
            if self.storage == "dbapi":
                tick = self.db.max_updated_at() + 1
            else:
                tick = (
                    with_ts.agg(F.max("updated_at")).collect()[0][0] or 0
                ) + 1
            requeued = build_requeued(with_ts, tick).localCheckpoint()
            released.append(requeued)
            n = requeued.count()
            if n == 0:
                return 0
            reopened = build_reopened(self.partitions(), requeued).localCheckpoint()
            released.append(reopened)
            if self.storage == "dbapi":
                self.db.upsert_items(requeued)
                self.db.upsert_partitions(reopened)
            else:
                from gofeed_spark.feedstate.admin import transactional_write

                # checkpoint the merged frames BEFORE the write: their
                # lineage reads the very parquet dirs the write replaces
                items_t = self._items_with_ts()
                parts_t = self.partitions()
                merged_items = (
                    items_t.join(requeued.select("id"), "id", "left_anti")
                    .unionByName(requeued.select(*items_t.columns))
                    .localCheckpoint()
                )
                merged_parts = (
                    parts_t.join(reopened.select("id"), "id", "left_anti")
                    .unionByName(reopened.select(*parts_t.columns))
                    .localCheckpoint()
                )
                released.extend([merged_items, merged_parts])
                transactional_write(
                    self.spark,
                    {self.t_items: merged_items, self.t_parts: merged_parts},
                    self.base,
                )
            return n
        finally:
            for df in released:
                release_local_checkpoint(df)

    def maintain(
        self,
        vacuum_keep: int = 2,
        vacuum_min_age_s: float = 3600.0,
        compact_target_bytes: int = 128 * 1024 * 1024,
    ) -> dict:
        """Storage maintenance — the table-lifecycle job that runs OFF the
        hot path (cron/idle, like Delta's VACUUM + OPTIMIZE):

        - txlog: drop snapshot dirs unreferenced by the last
          ``vacuum_keep`` complete manifests (TxLog.vacuum — also reclaims
          superseded state buckets and dead-letter deltas past the
          retention window).
        - parquet: compact the accreting dead-letter partition dirs
          (per-batch appends → byte-targeted file counts; the state
          buckets stay one-file-per-bucket by construction and need no
          compaction).
        - dbapi: nothing to do (the database manages its own storage).

        Returns a summary dict.  Single-runner invariant for parquet
        compaction (same as every staging flip); txlog vacuum is safe
        beside live writers (retention window protects in-flight
        stagings)."""
        if self.storage == "txlog":
            return {
                "vacuumed": self.log.vacuum(
                    keep=vacuum_keep, min_age_s=vacuum_min_age_s
                )
            }
        if self.storage == "parquet":
            from gofeed_spark.fs import get_filesystem
            from gofeed_spark.sources.io import compact

            fs = get_filesystem(self.base)
            compacted: dict[str, int] = {}
            root = fs.join(self.base, self.t_dead)
            for entry in fs.listdir(root):
                sub = fs.join(root, entry)
                if entry.startswith("writer=") and fs.isdir(sub):
                    compacted[entry] = compact(
                        self.spark, sub, target_file_bytes=compact_target_bytes
                    )
            return {"compacted": compacted}
        return {}

    # -- driver ----------------------------------------------------------
    def _cdc_reader(self):
        """The CDC readStream for this runner's storage backend — shared by
        the drain mode and the service mode so their source options can
        never diverge."""
        if self.storage == "txlog":
            src_path, backend = self.base, "txlog"
        elif self.storage == "dbapi":
            src_path, backend = self.db_path, "dbapi"
        else:
            src_path, backend = self.items_path, "parquet"
        reader = (
            self.spark.readStream.format("feed_cdc")
            .option("path", src_path)
            .option("backend", backend)
            .option("table", self.t_items)
        )
        if self.storage == "dbapi":
            reader = reader.option("dbapi_module", self.dbapi_module)
        if self.poll_limit is not None:
            reader = reader.option("poll_limit", str(self.poll_limit))
        return reader

    def run_forever(self, poll_interval_s: float = 10.0):
        """The reference's long-running service mode (main.go:33
        ``poll_interval``, default 10 s; watcher.go:118's ticker loop): one
        CDC poll + feed tick per interval, running until the returned
        StreamingQuery is stopped (or errors — surfaced through
        ``awaitTermination`` exactly as Spark surfaces streaming errors).
        Same checkpoint as the drain mode, so the two can be interleaved
        across restarts with exactly-once effect.

        Sets AQE off on the session for the service's lifetime (streaming
        does not support it, and pre-disabling avoids the per-start conf
        mutation that races concurrent runners — see ``_drain_confs``;
        a service-mode deployment owns its session, like the reference's
        watcher process owns its DB handle)."""
        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        if self.drain_shuffle_partitions is not None:
            self.spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(self.drain_shuffle_partitions),
            )
        return (
            self._cdc_reader()
            .load()
            .writeStream.option("checkpointLocation", self.ckpt)
            .trigger(processingTime=f"{poll_interval_s} seconds")
            .foreachBatch(self._step)
            .start()
        )

    def run_available(self, timeout_s: int = 300, max_rounds: int = 16) -> None:
        """Drain all available work: repeated availableNow passes until the
        CDC source has nothing new (each pass may re-queue continuation
        work for the next).

        Raises instead of returning when the drain does not converge: a
        persistent per-batch failure (processor bug, corrupt checkpoint)
        re-raises the last streaming error after ``max_rounds``; a feed
        that keeps generating work without quiescing raises RuntimeError.
        Exhaustion is never silent — the caller must know the run failed."""
        import hashlib
        import time

        from pyspark.errors.exceptions.captured import StreamingQueryException

        last_exc: Exception | None = None
        with _drain_confs(self.spark, self.drain_shuffle_partitions):
            for attempt in range(max_rounds):
                before = self._committed()
                q = (
                    self._cdc_reader()
                    .load()
                    .writeStream.option("checkpointLocation", self.ckpt)
                    .trigger(availableNow=True)
                    .foreachBatch(self._step)
                    .start()
                )
                try:
                    q.awaitTermination(timeout_s)
                    last_exc = None
                except StreamingQueryException as exc:
                # A failed round is safe to retry wholesale: the streaming
                # checkpoint re-delivers the batch and the batch-id manifest
                # + OCC storage commit make re-processing idempotent (seen
                # under concurrent runners as transient local-mode task
                # failures).  Kept for the retry; re-raised on exhaustion.
                    last_exc = exc
                    # DECORRELATE the retry: runners that fail the same
                    # round would otherwise restart in lockstep and can
                    # re-collide on the same transient every round until
                    # exhaustion.  Deterministic per-runner jitter (id
                    # hash) plus linear growth spreads the restarts apart.
                    jitter = (
                        int.from_bytes(
                            hashlib.blake2b(
                                self.runner_id.encode(), digest_size=2
                            ).digest(),
                            "big",
                        )
                        % 997
                    ) / 600.0
                    time.sleep(0.1 + jitter + attempt * 0.15)
                    continue
                if self._committed() == before:
                    return  # a clean round committed nothing new: converged
        if last_exc is not None:
            raise last_exc
        raise RuntimeError(
            f"feed did not quiesce within {max_rounds} rounds: every round "
            "committed new work (continuation loop or hot producer)"
        )

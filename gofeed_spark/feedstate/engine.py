"""Batch feed-state engine: one-pass set-based versions of the reference's
per-partition polling loop.

The reference runs, per leased partition per tick, TWO point queries
(available items, status counts — repo.go:114-120,141-162 driven by
watcher.go:136,141) and then a per-partition decision ladder
(watcher.go:147-161).  Here the whole tick is ONE distributed pass:

    items ⋈ partitions (equi-join on partition_id, one shuffle)
      → groupBy(partition_id) conditional counts (same key — no 2nd shuffle)
      → decision ladder as a CASE expression
      → processor map over ready items (mapInPandas, no shuffle)
      → retry/transition columns (codegen)
      → keyed upsert back into the state tables

which is the N+1 elimination called out in SURVEY §3.2.  At 100 TB the
only shuffle is on partition_id; skewed partitions are handled by AQE
skew-join splitting (enabled session-wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofeed_spark.feedstate.model import AVAILABLE, COMPLETE, FAILED
from gofeed_spark.feedstate.processors import ProcessorFn, process_items

ITEM_FIELDS = ["version", "retry_count", "gate", "status", "error_messages", "data"]


def gate_decision(
    partitions: DataFrame,
    items: DataFrame,
    manual_checkpoint: bool = False,
    auto_close: bool = True,
) -> DataFrame:
    """Per-partition checkpoint decision (watcher.go:147-161 as a set op).

    Returns the partitions frame with ``status``/``gate`` replaced by the
    post-decision values:

    - any Failed item            -> partition Failed
    - any Available item         -> partition Available; gate++ when none of
                                    them sit at the CURRENT gate (fan-in
                                    barrier) and not manual_checkpoint
    - none of either             -> Complete when auto_close, else unchanged

    Complete partitions are frozen (never leased: repo.go:106-112).
    """
    return _decide(
        partitions,
        items.select("partition_id", "status", "gate", F.lit(1).alias("n")),
        manual_checkpoint,
        auto_close,
    )


def gate_decision_from_counts(
    partitions: DataFrame,
    counts: DataFrame,
    manual_checkpoint: bool = False,
    auto_close: bool = True,
) -> DataFrame:
    """``gate_decision`` from PRE-AGGREGATED per-(partition, status, gate)
    counts — the shape a SQL state store pushes down as one GROUP BY
    (DbApiStore.read_decision_counts), so the decision never needs the
    terminal Failed rows themselves.  ``counts``: (partition_id, status,
    gate, n)."""
    return _decide(partitions, counts, manual_checkpoint, auto_close)


def _decide(
    partitions: DataFrame,
    weighted: DataFrame,
    manual_checkpoint: bool,
    auto_close: bool,
) -> DataFrame:
    """The decision ladder over (partition_id, status, gate, n) evidence
    rows — raw items carry n=1, pushed-down aggregates carry group counts;
    the sums are identical either way."""
    p = partitions.select(
        "id", "version", F.col("gate").alias("p_gate"), F.col("status").alias("p_status")
    )
    counts = (
        weighted.join(
            p.select(F.col("id").alias("partition_id"), "p_gate"), "partition_id"
        )
        .groupBy("partition_id")
        .agg(
            F.sum(F.when(F.col("status") == FAILED, F.col("n")).otherwise(0)).alias(
                "failed_n"
            ),
            F.sum(F.when(F.col("status") == AVAILABLE, F.col("n")).otherwise(0)).alias(
                "avail_n"
            ),
            F.sum(
                F.when(
                    (F.col("status") == AVAILABLE) & (F.col("gate") == F.col("p_gate")),
                    F.col("n"),
                ).otherwise(0)
            ).alias("at_gate_n"),
        )
    )
    j = p.join(counts, p.id == counts.partition_id, "left").select(
        "id", "version", "p_gate", "p_status",
        F.coalesce("failed_n", F.lit(0)).alias("failed_n"),
        F.coalesce("avail_n", F.lit(0)).alias("avail_n"),
        F.coalesce("at_gate_n", F.lit(0)).alias("at_gate_n"),
    )
    frozen = F.col("p_status") == COMPLETE
    new_status = (
        F.when(frozen, F.col("p_status"))
        .when(F.col("failed_n") > 0, F.lit(FAILED))
        .when(F.col("avail_n") > 0, F.lit(AVAILABLE))
        .otherwise(F.lit(COMPLETE) if auto_close else F.col("p_status"))
    )
    gate_bump = (
        (~frozen)
        & (F.col("failed_n") == 0)
        & (F.col("avail_n") > 0)
        & (F.col("at_gate_n") == 0)
        & F.lit(not manual_checkpoint)
    )
    new_gate = F.when(gate_bump, F.col("p_gate") + 1).otherwise(F.col("p_gate"))
    return j.select(
        "id", "version", new_gate.alias("gate"), new_status.alias("status")
    )


def ready_items(partitions: DataFrame, items: DataFrame) -> DataFrame:
    """Items eligible for processing this tick: Available, sitting at their
    partition's current gate, in a non-Complete partition (the set-based twin
    of GetAvailableItems, repo.go:114-120 — without the per-watcher LIMIT:
    Spark's task scheduler owns batching/backpressure)."""
    p = partitions.filter(F.col("status") != COMPLETE).select(
        F.col("id").alias("partition_id"), F.col("gate").alias("p_gate")
    )
    return (
        items.filter(F.col("status") == AVAILABLE)
        .join(p, "partition_id")
        .filter(F.col("gate") == F.col("p_gate"))
        .drop("p_gate")
    )


def apply_process_results(
    items: DataFrame, results: DataFrame, max_retries: int = 5
) -> DataFrame:
    """Merge processor outputs back into the items frame — the columnar twin
    of processItem + Item.error (watcher.go:195-212, item.go:27-38).

    Success: status=Complete iff complete, gate=next_gate, data=new_data.
    Error:   retry_count++, append error_msg to error_messages unless the
             accumulated log already equals it, status=Failed iff no_retry
             or retry_count exceeds max_retries (negative = retry forever).
    Items absent from ``results`` pass through unchanged.
    """
    r = results.select(
        "id", "next_gate", "complete", "new_data", "error_msg", "no_retry"
    )
    j = items.join(r, "id", "left")
    touched = F.col("error_msg").isNotNull() | F.col("new_data").isNotNull()
    errored = F.col("error_msg").isNotNull()
    new_rc = F.when(errored, F.col("retry_count") + 1).otherwise(F.col("retry_count"))
    exceeded = (
        (new_rc > max_retries) if max_retries >= 0 else F.lit(False)
    )
    new_status = (
        F.when(~touched, F.col("status"))
        .when(errored & (F.col("no_retry") | exceeded), F.lit(FAILED))
        .when(errored, F.col("status"))
        .when(F.col("complete"), F.lit(COMPLETE))
        .otherwise(F.col("status"))
    )
    new_em = (
        F.when(~errored, F.col("error_messages"))
        .when(F.col("error_messages") == "", F.col("error_msg"))
        .when(
            F.col("error_messages") != F.col("error_msg"),
            F.concat_ws("\n", "error_messages", "error_msg"),
        )
        .otherwise(F.col("error_messages"))
    )
    new_gate = F.when(touched & ~errored, F.col("next_gate")).otherwise(F.col("gate"))
    new_data = F.when(touched & ~errored, F.col("new_data")).otherwise(F.col("data"))
    new_version = F.when(touched, F.col("version") + 1).otherwise(F.col("version"))
    return j.select(
        "id",
        new_version.alias("version"),
        new_rc.alias("retry_count"),
        "partition_id",
        new_gate.alias("gate"),
        new_status.alias("status"),
        new_em.alias("error_messages"),
        new_data.alias("data"),
    )


def occ_upsert(
    target: DataFrame,
    updates: DataFrame,
    fields: list[str],
    key: str = "id",
    version_col: str = "version",
) -> DataFrame:
    """Optimistic-concurrency upsert, the batch/MERGE twin of Save
    (repo.go:125-138, contract README.md:118-126): an update applies only
    when its expected ``version`` equals the target row's current version;
    winners get version+1; losers are dropped silently (the caller re-reads,
    exactly like the reference's dirty=false path).  Update keys absent from
    the target are inserted with version 1.
    """
    t = target.alias("t")
    u = updates.alias("u")
    matched = F.col(f"t.{version_col}") == F.col(f"u.{version_col}")
    merged = t.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "left").select(
        F.col(f"t.{key}").alias(key),
        F.when(matched, F.col(f"t.{version_col}") + 1)
        .otherwise(F.col(f"t.{version_col}"))
        .alias(version_col),
        *[
            F.when(matched, F.col(f"u.{f}")).otherwise(F.col(f"t.{f}")).alias(f)
            for f in fields
        ],
    )
    inserts = (
        u.join(t, F.col(f"u.{key}") == F.col(f"t.{key}"), "left_anti")
        .select(
            F.col(key),
            (F.col(version_col) + 1).alias(version_col),
            *[F.col(f) for f in fields],
        )
    )
    return merged.unionByName(inserts)


def feed_step(
    partitions: DataFrame,
    items: DataFrame,
    processor: ProcessorFn,
    max_retries: int = 5,
    manual_checkpoint: bool = False,
    auto_close: bool = True,
    decision_counts: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch tick over ALL partitions at once (the reference does
    this per-partition per-poll; one distributed pass replaces N+1 queries).

    Matches the reference's intra-tick ordering (watcher.go:135-176): the
    ready set and the gate decision both observe the PRE-tick state; item
    processing lands after.

    ``decision_counts``: pre-aggregated (partition_id, status, gate, n)
    evidence for the gate decision (a SQL store's pushed-down GROUP BY) —
    with it, ``items`` may carry only the rows processing can touch
    (Available); terminal Failed rows stay in the store."""
    ready = ready_items(partitions, items)
    if decision_counts is not None:
        new_parts = gate_decision_from_counts(
            partitions,
            decision_counts,
            manual_checkpoint=manual_checkpoint,
            auto_close=auto_close,
        )
    else:
        new_parts = gate_decision(
            partitions, items, manual_checkpoint=manual_checkpoint, auto_close=auto_close
        )
    results = process_items(ready, processor)
    new_items = apply_process_results(items, results, max_retries=max_retries)
    return new_parts, new_items


def run_feed_to_fixpoint(
    partitions: DataFrame,
    items: DataFrame,
    processor: ProcessorFn,
    max_retries: int = 5,
    manual_checkpoint: bool = False,
    auto_close: bool = True,
    max_steps: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """Iterate feed_step until quiescence: no ready items AND the last step
    changed no partition state.  The loop is driver-side over STEPS (each
    step is a fully distributed job — never over rows); lineage is truncated
    each step with localCheckpoint, the standard Spark pattern for iterative
    algorithms (at durable scale, checkpoint() to reliable storage instead).
    """
    from gofeed_spark.functions.lineage import release_local_checkpoint

    parts, its = partitions.localCheckpoint(), items.localCheckpoint()
    for _ in range(max_steps):
        new_parts, new_its = feed_step(
            parts, its, processor,
            max_retries=max_retries,
            manual_checkpoint=manual_checkpoint,
            auto_close=auto_close,
        )
        new_parts, new_its = new_parts.localCheckpoint(), new_its.localCheckpoint()
        # Quiescent when nothing was ready (items unchanged) and the
        # partition decision is a no-op.  The exceptAll probe only runs
        # once the ready set is empty — one tiny job per step instead of
        # two for every non-final step.
        still_ready = ready_items(new_parts, new_its).limit(1).count()
        quiescent = (
            still_ready == 0 and new_parts.exceptAll(parts).limit(1).count() == 0
        )
        # the superseded step's checkpoints are dead once the quiescence
        # probes have run — release their blocks instead of waiting for GC
        release_local_checkpoint(parts)
        release_local_checkpoint(its)
        parts, its = new_parts, new_its
        if quiescent:
            break
    return parts, its

"""Feed-state layer queries (q47-q51): the reference's gate state machine,
retry engine, OCC upsert, and full e2e fixpoint — each checked against a
DuckDB oracle.

The partitions/items fixture is not among the driver's parquet tables, so
every query (and its oracle) builds the seed rows inline: Spark side from
``feedstate.model``, oracle side from the same rows rendered as a VALUES
table — both engines see byte-identical input.

Provenance: decision ladder watcher.go:147-161; retry item.go:27-38; OCC
save repo.go:125-138; e2e goldens watcher_test.go:268-349 (q49/q51 oracles
ARE those golden outcomes as VALUES literals — the driver hash-checks that
the engine reproduces them).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gofeed_spark.feedstate.engine import (
    apply_process_results,
    gate_decision,
    occ_upsert,
    run_feed_to_fixpoint,
)
from gofeed_spark.feedstate.model import (
    ITEM_COLS,
    ITEM_DDL,
    ITEM_FIXTURE,
    PARTITION_COLS,
    PARTITION_DDL,
    PARTITION_FIXTURE,
    seed_dataframes,
    values_sql,
)
from gofeed_spark.feedstate.processors import json_times_processor
from gofeed_spark.queries.registry import query

_P_VALUES = values_sql(PARTITION_FIXTURE, PARTITION_COLS).replace("AS t(", "AS p(")
_I_VALUES = values_sql(ITEM_FIXTURE, ITEM_COLS).replace("AS t(", "AS i(")


@query(
    "q47_feed_gate_decision",
    oracle=f"""
WITH p AS (SELECT * FROM {_P_VALUES}),
     i AS (SELECT * FROM {_I_VALUES}),
     c AS (
       SELECT p.id,
              SUM(CASE WHEN i.status = 3 THEN 1 ELSE 0 END) AS failed_n,
              SUM(CASE WHEN i.status = 1 THEN 1 ELSE 0 END) AS avail_n,
              SUM(CASE WHEN i.status = 1 AND i.gate = p.gate THEN 1 ELSE 0 END) AS at_gate_n
       FROM p LEFT JOIN i ON i.partition_id = p.id
       GROUP BY p.id
     )
SELECT p.id AS partition_id,
       CASE WHEN p.status = 2 THEN p.status
            WHEN c.failed_n > 0 THEN 3
            WHEN c.avail_n > 0 THEN 1
            ELSE 2 END AS status,
       CASE WHEN p.status <> 2 AND c.failed_n = 0 AND c.avail_n > 0
                 AND c.at_gate_n = 0
            THEN p.gate + 1 ELSE p.gate END AS gate
FROM p JOIN c ON c.id = p.id
ORDER BY partition_id
""",
)
def q47(spark, sf_dir):
    """Single-tick gate decision over the e2e seed fixture."""
    parts, items = seed_dataframes(spark)
    return (
        gate_decision(parts, items)
        .select(F.col("id").alias("partition_id"), "status", "gate")
        .orderBy("partition_id")
    )


# Retry-engine fixture: (item base state) x (processor outcome) covering
# every branch of item.go:27-38 — first error, repeated identical error,
# new distinct error, retries exceeded, non-retryable, success w/ and w/o
# completion, untouched item.
_RETRY_ITEMS = [
    ("r1_first_err", 0, 0, "p", 0, 1, "", "{}"),
    ("r2_same_err", 3, 1, "p", 0, 1, "boom", "{}"),
    ("r3_new_err", 3, 1, "p", 0, 1, "boom", "{}"),
    ("r4_exceeded", 5, 5, "p", 0, 1, "boom", "{}"),
    ("r5_no_retry", 0, 0, "p", 0, 1, "", "{}"),
    ("r6_success_done", 2, 2, "p", 0, 1, "old", "{}"),
    ("r7_success_gate", 0, 0, "p", 1, 1, "", "{}"),
    ("r8_untouched", 0, 4, "p", 2, 1, "keep", '{"k":1}'),
]
# (id, next_gate, complete, new_data, error_msg, no_retry)
_RETRY_RESULTS = [
    ("r1_first_err", 0, False, "", "boom", False),
    ("r2_same_err", 0, False, "", "boom", False),
    ("r3_new_err", 0, False, "", "crash", False),
    ("r4_exceeded", 0, False, "", "boom", False),
    ("r5_no_retry", 0, False, "", "fatal", True),
    ("r6_success_done", 1, True, '{"done":true}', None, False),
    ("r7_success_gate", 2, False, '{"step":2}', None, False),
]
_RESULT_COLS = ["id", "next_gate", "complete", "new_data", "error_msg", "no_retry"]
_RESULT_DDL = (
    "id string, next_gate int, complete boolean, new_data string, "
    "error_msg string, no_retry boolean"
)


@query(
    "q48_feed_retry_engine",
    oracle=f"""
WITH r AS (SELECT * FROM {values_sql(_RETRY_RESULTS, _RESULT_COLS).replace('AS t(', 'AS r(')}),
     it AS (SELECT * FROM {values_sql(_RETRY_ITEMS, ITEM_COLS).replace('AS t(', 'AS it(')})
SELECT it.id,
       CASE WHEN r.error_msg IS NOT NULL THEN it.retry_count + 1
            ELSE it.retry_count END AS retry_count,
       CASE WHEN r.id IS NULL THEN it.status
            WHEN r.error_msg IS NOT NULL
                 AND (r.no_retry OR it.retry_count + 1 > 5) THEN 3
            WHEN r.error_msg IS NOT NULL THEN it.status
            WHEN r.complete THEN 2
            ELSE it.status END AS status,
       CASE WHEN r.error_msg IS NULL THEN it.error_messages
            WHEN it.error_messages = '' THEN r.error_msg
            WHEN it.error_messages <> r.error_msg
                 THEN it.error_messages || chr(10) || r.error_msg
            ELSE it.error_messages END AS error_messages,
       CASE WHEN r.id IS NOT NULL AND r.error_msg IS NULL THEN r.next_gate
            ELSE it.gate END AS gate,
       CASE WHEN r.id IS NOT NULL AND r.error_msg IS NULL THEN r.new_data
            ELSE it.data END AS data
FROM it LEFT JOIN r ON r.id = it.id
ORDER BY it.id
""",
)
def q48(spark, sf_dir):
    """Retry/error-accumulation engine over a branch-complete fixture."""
    items = spark.createDataFrame(_RETRY_ITEMS, ITEM_DDL)
    results = spark.createDataFrame(_RETRY_RESULTS, _RESULT_DDL)
    return (
        apply_process_results(items, results, max_retries=5)
        .select("id", "retry_count", "status", "error_messages", "gate", "data")
        .orderBy("id")
    )


# Golden outcomes of the reference's two-watcher e2e test
# (watcher_test.go:268-349), as (item_id, status, item_gate, times, fail,
# processed, payload_gate).  MaxRetries=3 for parity with the test.
_GOLDEN_ITEMS = [
    ("s1_ready", 2, 0, 3, False, 3, 0),
    ("s2_fail", 3, 0, 3, False, 0, 0),
    ("s3_done", 2, 0, 3, False, 0, 0),
    ("s4_owned", 2, 0, 3, False, 3, 0),
    ("s5_owned", 2, 0, 3, False, 3, 0),
    ("s6_owned_should_fail", 3, 0, 3, True, 0, 0),
    ("s7_owned", 2, 0, 3, False, 3, 0),
    ("s8_disabled", 1, 0, 3, False, 0, 0),
    ("s9_ready", 2, 0, 3, False, 3, 0),
    ("s10_ready_should_fail", 3, 0, 3, True, 0, 0),
    ("s11_ready", 2, 0, 3, False, 3, 0),
    ("s12_gate", 1, 1, 3, False, 1, 1),
    ("s13_gate_fail", 3, 0, 3, True, 0, 1),
    ("s14_gate", 2, 1, 3, False, 3, 1),
    ("s15_gate", 2, 1, 3, False, 3, 1),
]
_GOLDEN_ITEM_COLS = [
    "item_id", "status", "item_gate", "times", "fail", "processed", "payload_gate",
]

# Final partition states implied by the same run (p1* assertions are
# explicit in watcher_test.go:381-390; p2* follow from the failure ladder).
_GOLDEN_PARTS = [
    ("p1_unowned", 2, 0),
    ("p2_unowned", 3, 0),
    ("p1_owned", 2, 0),
    ("p2_owned", 3, 0),
    ("p1_disabled", 2, 0),
    ("p1_swap", 2, 0),
    ("p2_swap", 3, 0),
    ("p1_gate", 2, 1),
    ("p2_gate", 3, 0),
]


_GOLDEN_CACHE: dict[str, tuple] = {}


def _run_golden(spark):
    """Memoized per session: q49 and q51 both need this fixpoint run; the
    result is two localCheckpoint-ed (materialized) frames, so caching the
    pair halves the correctness-sweep cost without changing semantics."""
    key = spark.sparkContext.applicationId
    if key not in _GOLDEN_CACHE:
        parts, items = seed_dataframes(spark)
        _GOLDEN_CACHE[key] = run_feed_to_fixpoint(
            parts, items, json_times_processor, max_retries=3, auto_close=True
        )
    return _GOLDEN_CACHE[key]


@query(
    "q49_feed_e2e_items",
    oracle=f"""
SELECT * FROM {values_sql(_GOLDEN_ITEMS, _GOLDEN_ITEM_COLS).replace('AS t(', 'AS g(')}
ORDER BY item_id
""",
)
def q49(spark, sf_dir):
    """Full change-feed fixpoint: items must land on the reference's golden
    (status, payload) outcomes.  Payload compared field-wise (the reference
    compares parsed structs, not bytes — watcher_test.go:362-372)."""
    _, items = _run_golden(spark)
    payload = F.from_json(
        "data", "times int, fail boolean, processed int, gate int"
    )
    return items.select(
        F.col("id").alias("item_id"),
        "status",
        F.col("gate").alias("item_gate"),
        F.coalesce(payload.getField("times"), F.lit(0)).alias("times"),
        F.coalesce(payload.getField("fail"), F.lit(False)).alias("fail"),
        F.coalesce(payload.getField("processed"), F.lit(0)).alias("processed"),
        F.coalesce(payload.getField("gate"), F.lit(0)).alias("payload_gate"),
    ).orderBy("item_id")


@query(
    "q51_feed_e2e_partitions",
    oracle=f"""
SELECT * FROM {values_sql(_GOLDEN_PARTS, ['partition_id', 'status', 'gate']).replace('AS t(', 'AS g(')}
ORDER BY partition_id
""",
)
def q51(spark, sf_dir):
    """Partition states after the same fixpoint run: every p1* Complete
    (watcher_test.go:386-389), every failing p2* Failed, gates advanced
    only where the fan-in barrier cleared."""
    parts, _ = _run_golden(spark)
    return parts.select(
        F.col("id").alias("partition_id"), "status", "gate"
    ).orderBy("partition_id")


# Engine modes (watcher.go:30-35): ManualCheckpoint freezes gate
# advancement (an operator advances gates out-of-band); !AutoClose leaves
# exhausted partitions in their prior status instead of Complete.
@query(
    "q67_feed_manual_checkpoint",
    oracle=f"""
WITH p AS (SELECT * FROM {_P_VALUES}),
     i AS (SELECT * FROM {_I_VALUES}),
     c AS (
       SELECT p.id,
              SUM(CASE WHEN i.status = 3 THEN 1 ELSE 0 END) AS failed_n,
              SUM(CASE WHEN i.status = 1 THEN 1 ELSE 0 END) AS avail_n
       FROM p LEFT JOIN i ON i.partition_id = p.id
       GROUP BY p.id
     )
SELECT p.id AS partition_id,
       CASE WHEN p.status = 2 THEN p.status
            WHEN c.failed_n > 0 THEN 3
            WHEN c.avail_n > 0 THEN 1
            ELSE p.status END AS status,
       p.gate AS gate
FROM p JOIN c ON c.id = p.id
ORDER BY partition_id
""",
)
def q67(spark, sf_dir):
    """Single tick under ManualCheckpoint + !AutoClose: gates never bump,
    exhausted partitions keep their prior status."""
    parts, items = seed_dataframes(spark)
    return (
        gate_decision(parts, items, manual_checkpoint=True, auto_close=False)
        .select(F.col("id").alias("partition_id"), "status", "gate")
        .orderBy("partition_id")
    )


# OCC upsert fixture: version match, version miss (stale), absent key
# (insert), untouched target row.
_OCC_TARGET = [("a", 2, "old_a"), ("b", 5, "old_b"), ("c", 0, "old_c")]
_OCC_UPDATES = [("a", 2, "new_a"), ("b", 4, "stale_b"), ("d", 0, "new_d")]


@query(
    "q50_feed_occ_upsert",
    oracle=f"""
WITH t AS (SELECT * FROM {values_sql(_OCC_TARGET, ['id', 'version', 'val']).replace('AS t(', 'AS tt(')}),
     u AS (SELECT * FROM {values_sql(_OCC_UPDATES, ['id', 'version', 'val']).replace('AS t(', 'AS uu(')})
SELECT t.id,
       CASE WHEN u.id IS NOT NULL AND u.version = t.version
            THEN t.version + 1 ELSE t.version END AS version,
       CASE WHEN u.id IS NOT NULL AND u.version = t.version
            THEN u.val ELSE t.val END AS val
FROM t LEFT JOIN u ON u.id = t.id
UNION ALL
SELECT u.id, u.version + 1, u.val
FROM u LEFT JOIN t ON t.id = u.id
WHERE t.id IS NULL
ORDER BY id
""",
)
def q50(spark, sf_dir):
    """OCC conditional upsert: stale versions dropped, matches bump the
    version, absent keys insert — the MERGE twin of repo.go:125-138."""
    target = spark.createDataFrame(_OCC_TARGET, "id string, version int, val string")
    updates = spark.createDataFrame(_OCC_UPDATES, "id string, version int, val string")
    return occ_upsert(target, updates, fields=["val"]).orderBy("id")

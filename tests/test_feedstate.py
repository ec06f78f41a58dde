"""Feed-state engine unit tests: gate-decision ladder, retry engine, OCC
upsert, processor contract — mirroring the reference's test pyramid
(item_test.go:8-62, processor_test.go:32-122, watcher_test.go:233-391).
"""

from __future__ import annotations

import json

import pytest

from gofeed_spark.feedstate.engine import (
    apply_process_results,
    gate_decision,
    occ_upsert,
    ready_items,
    run_feed_to_fixpoint,
)
from gofeed_spark.feedstate.model import (
    AVAILABLE,
    COMPLETE,
    FAILED,
    ITEM_DDL,
    PARTITION_DDL,
    seed_dataframes,
)
from gofeed_spark.feedstate.processors import (
    http_processor,
    json_times_processor,
    process_items,
)
from tests.conftest import rows


def parts_df(spark, *rows_):
    return spark.createDataFrame(list(rows_), PARTITION_DDL)


def items_df(spark, *rows_):
    return spark.createDataFrame(list(rows_), ITEM_DDL)


# ---------------------------------------------------------------- gate ladder


def test_gate_failed_item_fails_partition(spark):
    p = parts_df(spark, ("p", 0, 0, AVAILABLE))
    i = items_df(
        spark,
        ("a", 0, 0, "p", 0, FAILED, "", "{}"),
        ("b", 0, 0, "p", 0, AVAILABLE, "", "{}"),
    )
    out = rows(gate_decision(p, i), "id", "status", "gate")
    assert out == {("p", FAILED, 0)}


def test_gate_bumps_only_when_no_item_at_current_gate(spark):
    p = parts_df(spark, ("p", 0, 0, AVAILABLE), ("q", 0, 0, AVAILABLE))
    i = items_df(
        spark,
        ("a", 0, 0, "p", 1, AVAILABLE, "", "{}"),  # beyond gate -> bump p
        ("b", 0, 0, "q", 0, AVAILABLE, "", "{}"),  # at gate -> no bump
    )
    out = rows(gate_decision(p, i), "id", "status", "gate")
    assert out == {("p", AVAILABLE, 1), ("q", AVAILABLE, 0)}


def test_gate_manual_checkpoint_suppresses_bump(spark):
    p = parts_df(spark, ("p", 0, 0, AVAILABLE))
    i = items_df(spark, ("a", 0, 0, "p", 1, AVAILABLE, "", "{}"))
    out = rows(gate_decision(p, i, manual_checkpoint=True), "id", "status", "gate")
    assert out == {("p", AVAILABLE, 0)}


def test_gate_autoclose_and_frozen_complete(spark):
    p = parts_df(
        spark,
        ("done_items", 0, 0, AVAILABLE),
        ("no_items", 0, 0, AVAILABLE),
        ("frozen", 0, 0, COMPLETE),
        ("was_failed", 0, 0, FAILED),
    )
    i = items_df(
        spark,
        ("a", 0, 0, "done_items", 0, COMPLETE, "", "{}"),
        ("f", 0, 0, "frozen", 0, AVAILABLE, "", "{}"),
    )
    closed = rows(gate_decision(p, i, auto_close=True), "id", "status")
    assert closed == {
        ("done_items", COMPLETE),
        ("no_items", COMPLETE),
        ("frozen", COMPLETE),
        ("was_failed", COMPLETE),
    }
    kept = rows(gate_decision(p, i, auto_close=False), "id", "status")
    assert ("was_failed", FAILED) in kept  # without AutoClose status unchanged
    assert ("done_items", AVAILABLE) in kept


def test_ready_items_gate_and_frozen_filter(spark):
    p = parts_df(spark, ("p", 0, 1, AVAILABLE), ("z", 0, 0, COMPLETE))
    i = items_df(
        spark,
        ("at_gate", 0, 0, "p", 1, AVAILABLE, "", "{}"),
        ("behind", 0, 0, "p", 0, AVAILABLE, "", "{}"),
        ("done", 0, 0, "p", 1, COMPLETE, "", "{}"),
        ("frozen_p", 0, 0, "z", 0, AVAILABLE, "", "{}"),
    )
    assert rows(ready_items(p, i), "id") == {("at_gate",)}


# --------------------------------------------------------------- retry engine


def _one_item(spark, retry_count=0, error_messages="", status=AVAILABLE):
    return items_df(spark, ("x", 0, retry_count, "p", 0, status, error_messages, "{}"))


def _result(spark, error_msg=None, no_retry=False, complete=False, next_gate=0, data=""):
    return spark.createDataFrame(
        [("x", next_gate, complete, data, error_msg, no_retry)],
        "id string, next_gate int, complete boolean, new_data string, "
        "error_msg string, no_retry boolean",
    )


def test_retry_increment_and_message_append(spark):
    out = apply_process_results(
        _one_item(spark, retry_count=1, error_messages="boom"),
        _result(spark, error_msg="crash"),
        max_retries=5,
    ).collect()[0]
    assert out.retry_count == 2
    assert out.error_messages == "boom\ncrash"
    assert out.status == AVAILABLE  # retryable, under limit


def test_retry_identical_message_not_duplicated(spark):
    out = apply_process_results(
        _one_item(spark, retry_count=1, error_messages="boom"),
        _result(spark, error_msg="boom"),
        max_retries=5,
    ).collect()[0]
    assert out.error_messages == "boom"


def test_retry_exceeding_max_fails(spark):
    out = apply_process_results(
        _one_item(spark, retry_count=5), _result(spark, error_msg="boom"), max_retries=5
    ).collect()[0]
    assert out.retry_count == 6
    assert out.status == FAILED


def test_retry_negative_max_retries_forever(spark):
    out = apply_process_results(
        _one_item(spark, retry_count=99), _result(spark, error_msg="boom"), max_retries=-1
    ).collect()[0]
    assert out.status == AVAILABLE


def test_non_retryable_fails_immediately(spark):
    out = apply_process_results(
        _one_item(spark), _result(spark, error_msg="fatal", no_retry=True), max_retries=5
    ).collect()[0]
    assert out.retry_count == 1
    assert out.status == FAILED


def test_success_sets_gate_data_and_complete(spark):
    out = apply_process_results(
        _one_item(spark), _result(spark, complete=True, next_gate=2, data='{"ok":1}')
    ).collect()[0]
    assert (out.status, out.gate, out.data, out.version) == (COMPLETE, 2, '{"ok":1}', 1)


# ----------------------------------------------------------------- OCC upsert


def test_occ_upsert_semantics(spark):
    t = spark.createDataFrame(
        [("a", 2, "old_a"), ("b", 5, "old_b")], "id string, version int, val string"
    )
    u = spark.createDataFrame(
        [("a", 2, "new_a"), ("b", 4, "stale"), ("c", 0, "ins")],
        "id string, version int, val string",
    )
    out = rows(occ_upsert(t, u, fields=["val"]), "id", "version", "val")
    assert out == {("a", 3, "new_a"), ("b", 5, "old_b"), ("c", 1, "ins")}


# ----------------------------------------------------------------- processors


def test_json_times_processor_contract():
    r = json_times_processor("i", '{"times": 2, "processed": 1}')
    assert (r.complete, r.error_msg) == (True, None)
    assert json.loads(r.data)["processed"] == 2
    r2 = json_times_processor("i", '{"times": 3, "fail": true}')
    assert r2.error_msg and not r2.no_retry
    r3 = json_times_processor("i", "not json")
    assert r3.error_msg and r3.no_retry


# Table-driven HTTP cases, the shape of processor_test.go:32-122.
HTTP_CASES = [
    # (name, status, body, want_error, want_no_retry, want_gate, want_complete)
    ("good", 200, '{"gate": 2, "complete": false, "response": {"k": "v"}}', False, False, 2, False),
    ("complete", 200, '{"complete": true}', False, False, 0, True),
    ("gateless", 200, "{}", False, False, 0, False),
    ("bad_json", 200, "not json {", True, False, None, None),
    ("app_error", 200, '{"error": {"message": "boom"}}', True, False, None, None),
    ("app_error_no_retry", 200, '{"error": {"message": "boom", "no_retry": true}}', True, True, None, None),
    ("http_404", 404, "{}", True, False, None, None),
    ("http_500", 500, "{}", True, False, None, None),
]


@pytest.mark.parametrize("name,status,body,want_err,want_nr,want_gate,want_complete", HTTP_CASES)
def test_http_processor_taxonomy(name, status, body, want_err, want_nr, want_gate, want_complete):
    proc = http_processor("http://target", transport=lambda url, b: (status, body.encode()))
    r = proc("id1", '{"payload": 1}')
    assert (r.error_msg is not None) == want_err
    assert r.no_retry == want_nr
    if not want_err:
        assert r.next_gate == want_gate
        assert r.complete == want_complete


def test_http_processor_transport_failure_retryable():
    def boom(url, b):
        raise OSError("connection refused")

    r = http_processor("http://target", transport=boom)("id", "{}")
    assert r.error_msg and not r.no_retry


def test_process_items_maps_posted_payloads(spark):
    seen = []

    def echo(url, body):
        seen.append(body)
        return 200, b'{"complete": true}'

    items = items_df(spark, ("a", 0, 0, "p", 0, AVAILABLE, "", '{"n": 1}'))
    out = process_items(items, http_processor("http://t", transport=echo)).collect()
    assert out[0].complete is True


# ------------------------------------------------------------------ e2e twin


def test_fixpoint_reproduces_golden_outcomes(spark):
    parts, items = seed_dataframes(spark)
    fparts, fitems = run_feed_to_fixpoint(
        parts, items, json_times_processor, max_retries=3, auto_close=True
    )
    st = {r.id: r.status for r in fitems.collect()}
    assert st["s1_ready"] == COMPLETE
    assert st["s2_fail"] == FAILED
    assert st["s6_owned_should_fail"] == FAILED
    assert st["s8_disabled"] == AVAILABLE
    assert st["s12_gate"] == AVAILABLE
    assert st["s14_gate"] == COMPLETE
    pst = {r.id: (r.status, r.gate) for r in fparts.collect()}
    assert pst["p1_gate"] == (COMPLETE, 1)
    assert pst["p2_gate"] == (FAILED, 0)
    assert all(pst[p][0] == COMPLETE for p in pst if p.startswith("p1"))


def test_two_writers_occ_race_single_winner(spark):
    """The reference's flagship concurrency guarantee (watcher_test.go:
    233-266,381-390): TWO writers racing on ONE state store.  Both read the
    same committed snapshot, both attempt the same OCC batch; the version
    column arbitrates — every item gets exactly ONE version bump, no torn
    state, and the final table is byte-identical to the single-writer run.

    The store commit is serialized (a DB commit is atomic); everything
    else — snapshot reads, update computation, commit order — races freely.
    """
    import threading

    from pyspark.sql import functions as F

    FIELDS = ["retry_count", "partition_id", "gate", "status", "error_messages", "data"]

    def seed():
        return items_df(
            spark,
            *[
                (f"i{n}", 0, 0, "p", 0, AVAILABLE, "", f"payload{n}")
                for n in range(4)
            ],
        ).localCheckpoint()

    def make_updates(snap):
        # Deterministic "processing": Available -> Complete, data derived
        # from the item alone (both writers compute identical updates, like
        # the reference's two watchers running one processor).
        return (
            snap.filter(F.col("status") == AVAILABLE)
            .withColumn("status", F.lit(COMPLETE))
            .withColumn("data", F.concat(F.lit("done:"), F.col("id")))
        )

    def run_writers(n_writers):
        store = {"items": seed()}
        lock = threading.Lock()
        barrier = threading.Barrier(n_writers)
        wins = {w: 0 for w in range(n_writers)}
        errors = []

        def writer(w):
            try:
                first = True
                for _ in range(8):
                    snap = store["items"]  # committed-snapshot read
                    updates = make_updates(snap).localCheckpoint()
                    if first:
                        # guarantee a true collision: every writer holds
                        # updates computed from the SAME seed snapshot
                        # before any commit lands
                        barrier.wait(timeout=120)
                        first = False
                    if updates.isEmpty():
                        break
                    with lock:  # the DB's atomic commit
                        cur = store["items"]
                        won = (
                            updates.select("id", "version")
                            .join(cur.select("id", "version"), ["id", "version"])
                            .count()
                        )
                        wins[w] += won
                        store["items"] = occ_upsert(
                            cur, updates, fields=FIELDS
                        ).localCheckpoint()
            except Exception as e:  # surface thread failures to pytest
                errors.append(e)

        threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        return store["items"], wins

    final_racy, wins = run_writers(2)
    final_solo, _ = run_writers(1)

    racy = rows(final_racy, "id", "version", "status", "data")
    # single-winner arbitration: every item bumped exactly once, total wins
    # across writers == item count (no double processing, no lost update)
    assert all(v == 1 and s == COMPLETE for _, v, s, _ in racy)
    assert sum(wins.values()) == 4
    # no torn state: the racy final table equals the single-writer goldens
    assert racy == rows(final_solo, "id", "version", "status", "data")

"""as-of join edge cases: equal timestamps (inclusive <=), keys with no
match (NULL), multiple right rows at one timestamp, right rows strictly
after the probe.
"""

from __future__ import annotations

import datetime as dt

import pytest

from gofeed_spark.operators.asof import asof_join_last_event
from tests.conftest import rows


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 100),
            (1, ts("2024-01-01 11:00:00"), 101),
            (1, ts("2024-01-01 11:00:00"), 105),  # tie on ts: max value wins
            (1, ts("2024-01-01 12:00:00"), 102),
            (2, ts("2024-01-01 09:00:00"), 200),
        ],
        "k long, t timestamp, v long",
    )
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:30:00"), 11),  # between events -> 100
            (1, ts("2024-01-01 11:00:00"), 12),  # equal ts inclusive -> 105
            (1, ts("2024-01-01 09:00:00"), 13),  # before all -> NULL
            (2, ts("2024-01-01 09:00:00"), 21),  # exact equal -> 200
            (3, ts("2024-01-01 10:00:00"), 31),  # key with no right rows -> NULL
        ],
        "k long, t timestamp, probe_id long",
    )
    return left, right


def test_asof_semantics(frames):
    left, right = frames
    out = rows(
        asof_join_last_event(
            left, right,
            left_on="k", right_on="k",
            left_time="t", right_time="t",
            right_value="v", left_keep="probe_id",
        ),
        "probe_id", "asof_value",
    )
    assert out == {(11, 100), (12, 105), (13, None), (21, 200), (31, None)}


def test_asof_carries_max_not_last(spark):
    # MAX semantics: a later-but-smaller right value must not shadow an
    # earlier larger one (matches the declared oracle MAX(event_id) <= t).
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 50), (1, ts("2024-01-01 11:00:00"), 40)],
        "k long, t timestamp, v long",
    )
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 12:00:00"), 1)], "k long, t timestamp, probe_id long"
    )
    out = rows(
        asof_join_last_event(
            left, right, "k", "k", "t", "t", "v", "probe_id"
        ),
        "probe_id", "asof_value",
    )
    assert out == {(1, 50)}


def test_interval_join_containment_and_bins(spark):
    """Boundary-inclusive containment, intervals spanning multiple bins,
    unmatched events dropped, and an event inside two overlapping
    intervals matches both exactly once."""
    from pyspark.sql import functions as F

    from gofeed_spark.operators.asof import interval_join

    ev = spark.createDataFrame(
        [(1, 100), (2, 250), (3, 999), (4, 5000)], "event_id long, t long"
    )
    iv = spark.createDataFrame(
        [
            ("a", 100, 250),    # hits 1 (start bound) and 2 (end bound)
            ("b", 200, 1500),   # spans bins; hits 2 and 3
            ("c", 9000, 9999),  # hits nothing
        ],
        "iv_id string, s long, e long",
    )
    out = interval_join(ev, iv, "t", "s", "e", bin_width=400)
    got = sorted((r.event_id, r.iv_id) for r in out.collect())
    assert got == [(1, "a"), (2, "a"), (2, "b"), (3, "b")]


def test_interval_join_is_equi_join_not_nested_loop(spark):
    """The plan must be a bin equi-join: no BroadcastNestedLoopJoin or
    CartesianProduct anywhere (the whole point of the bucketing)."""
    from gofeed_spark.queries import QUERIES

    plan = (
        QUERIES["q95_interval_join"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

"""Feed-state data model: status enum, table schemas, and the golden e2e
fixture.

Schemas mirror FIXTURES.md §A (derived from the reference's Gorm models,
/root/reference/internal/state/partition.go:7-23 and item.go:13-23; status
enum repo.go:15-22).  The fixture reproduces the seed rows of the
reference's end-to-end watcher test
(/root/reference/internal/state/watcher_test.go:114-217) so our batch
engine can be checked against its golden outcomes — data parity, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

UNKNOWN, AVAILABLE, COMPLETE, FAILED = 0, 1, 2, 3

PARTITION_DDL = "id string, version int, gate int, status int"
ITEM_DDL = (
    "id string, version int, retry_count int, partition_id string, "
    "gate int, status int, error_messages string, data string"
)

# (id, version, gate, status)
PARTITION_FIXTURE: list[tuple] = [
    ("p1_unowned", 0, 0, FAILED),
    ("p2_unowned", 0, 0, AVAILABLE),
    ("p1_owned", 0, 0, AVAILABLE),
    ("p2_owned", 0, 0, AVAILABLE),
    ("p1_disabled", 0, 0, COMPLETE),
    ("p1_swap", 0, 0, AVAILABLE),
    ("p2_swap", 0, 0, AVAILABLE),
    ("p1_gate", 0, 0, AVAILABLE),
    ("p2_gate", 0, 0, AVAILABLE),
]

# (id, version, retry_count, partition_id, gate, status, error_messages, data)
ITEM_FIXTURE: list[tuple] = [
    ("s1_ready", 0, 0, "p1_unowned", 0, AVAILABLE, "", '{"times": 3}'),
    ("s2_fail", 0, 0, "p2_unowned", 0, FAILED, "", '{"times": 3}'),
    ("s3_done", 0, 0, "p1_owned", 0, COMPLETE, "", '{"times": 3}'),
    ("s4_owned", 0, 0, "p2_owned", 0, AVAILABLE, "", '{"times": 3}'),
    ("s5_owned", 0, 0, "p1_owned", 0, AVAILABLE, "", '{"times": 3}'),
    ("s6_owned_should_fail", 0, 0, "p2_owned", 0, AVAILABLE, "", '{"times": 3, "fail": true}'),
    ("s7_owned", 0, 0, "p1_owned", 0, AVAILABLE, "", '{"times": 3}'),
    ("s8_disabled", 0, 0, "p1_disabled", 0, AVAILABLE, "", '{"times": 3}'),
    ("s9_ready", 0, 0, "p1_swap", 0, AVAILABLE, "", '{"times": 3}'),
    ("s10_ready_should_fail", 0, 0, "p2_swap", 0, AVAILABLE, "", '{"times": 3, "fail": true}'),
    ("s11_ready", 0, 0, "p2_swap", 0, AVAILABLE, "", '{"times": 3}'),
    ("s12_gate", 0, 0, "p2_gate", 0, AVAILABLE, "", '{"times": 3, "gate": 1}'),
    ("s13_gate_fail", 0, 0, "p2_gate", 0, AVAILABLE, "", '{"times": 3, "gate": 1, "fail": true}'),
    ("s14_gate", 0, 0, "p1_gate", 0, AVAILABLE, "", '{"times": 3, "gate": 1}'),
    ("s15_gate", 0, 0, "p1_gate", 0, AVAILABLE, "", '{"times": 3, "gate": 1}'),
]


def partition_fixture_rows() -> list[tuple]:
    return list(PARTITION_FIXTURE)


def item_fixture_rows() -> list[tuple]:
    return list(ITEM_FIXTURE)


def seed_dataframes(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """(partitions, items) seed DataFrames for the golden e2e fixture."""
    parts = spark.createDataFrame(PARTITION_FIXTURE, PARTITION_DDL)
    items = spark.createDataFrame(ITEM_FIXTURE, ITEM_DDL)
    return parts, items


def _sql_str(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def values_sql(rows: list[tuple], cols: list[str]) -> str:
    """Render fixture rows as an ANSI VALUES table expression so oracle SQL
    can run over the exact same seed without a registered view."""
    body = ", ".join("(" + ", ".join(_sql_str(v) for v in r) + ")" for r in rows)
    return f"(VALUES {body}) AS t({', '.join(cols)})"


PARTITION_COLS = ["id", "version", "gate", "status"]
ITEM_COLS = [
    "id", "version", "retry_count", "partition_id",
    "gate", "status", "error_messages", "data",
]

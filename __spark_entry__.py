"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape, the generalization of the
reference's GetCountByStatus aggregation) at sf0.001.
``queries()`` / ``oracle_sql()`` — the full declared surface from
SURVEY.md §2.C plus the LLM-pipeline operators, implemented in
``gofeed_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gofeed_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q06_groupby_multiagg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (approximate LSH ops omitted →
    rows-only check, their exact twins carry the hash check)."""
    return dict(ORACLES)

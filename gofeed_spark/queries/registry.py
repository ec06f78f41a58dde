"""Registration machinery for declared queries.

``QUERIES[name]`` is ``fn(spark, sf_dir) -> DataFrame``;
``ORACLES[name]`` is the DuckDB-runnable ANSI SQL (absent ⇒ the driver runs
the weaker rows-only check — used only for genuinely non-SQL-expressible
ops such as approximate LSH variants).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
#: minimum result rows a query must produce at GATE SFs for its check to
#: be non-vacuous (default 1 — a query that "passes" by matching an EMPTY
#: oracle verifies nothing, the r15 q14 trap); declare ``min_rows=0`` only
#: when an empty result is the intended contract at some SF.
MIN_ROWS: dict[str, int] = {}


def query(name: str, oracle: str | None = None, min_rows: int = 1):
    """Decorator: register a query implementation + optional oracle SQL.
    ``min_rows`` feeds the gate's non-vacuity audit (see MIN_ROWS)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        MIN_ROWS[name] = min_rows
        return fn

    return deco


def get_query(name: str) -> QueryFn:
    return QUERIES[name]

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


def query(name: str, oracle: str | None = None):
    """Decorator: register a query implementation + optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def get_query(name: str) -> QueryFn:
    return QUERIES[name]

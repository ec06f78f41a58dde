"""Shared Spark fixture for the unit-test suite.

One session per pytest run (Spark startup dominates otherwise); small
parallelism and shuffle counts keep local runs fast while still exercising
multi-partition code paths.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gofeed_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gofeed-tests", master="local[4]", shuffle_partitions=4)
    yield s


def rows(df, *cols):
    """Collected rows as a set of tuples (order-insensitive compare)."""
    if cols:
        df = df.select(*cols)
    return {tuple(r) for r in df.collect()}

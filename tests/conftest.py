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
    # SPARK_GRAFT_TEST_MASTER lets the suite run under e.g.
    # local-cluster[2,2,4096] (separate executor JVMs + working dirs) to
    # prove there are no driver-local sys.path/FS assumptions.
    master = os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]")
    s = get_spark("gofeed-tests", master=master, shuffle_partitions=4)
    yield s


def rows(df, *cols):
    """Collected rows as a set of tuples (order-insensitive compare)."""
    if cols:
        df = df.select(*cols)
    return {tuple(r) for r in df.collect()}

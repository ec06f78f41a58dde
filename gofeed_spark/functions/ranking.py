"""Ranking helpers for tiny post-limit result frames.

Every top-k operator here finishes by attaching a dense ``rank`` to a frame
that is ≤ k·n_tables rows BY CONSTRUCTION (it sits after a ``limit``).  A
``Window.orderBy`` with an empty partition spec computes the right thing
but makes WindowExec log "No Partition Defined ... Moving all data to a
single partition" on every execution — noise that would camouflage a REAL
unpartitioned window over unbounded data (the classic scale-killer this
repo pins tests against).  ``rank_window`` partitions by a constant: the
same single-partition execution, but the intent is stated in the plan
(``windowspecdefinition(0, ...)``) and the warning can only ever fire for
a genuine regression.
"""

from __future__ import annotations

from pyspark.sql import Window, WindowSpec
from pyspark.sql import functions as F


def rank_window(*order) -> WindowSpec:
    """Window for ranking a bounded (post-``limit``) frame: single
    partition by constant key — warning-free, deterministic, and cheap
    because the input is ≤ k rows by construction."""
    return Window.partitionBy(F.lit(0)).orderBy(*order)

"""As-of join: for each left row, the most recent right row at or before the
left row's timestamp, per key.

Spark has no built-in as-of join; the naive forms are a range join
(quadratic blow-up per key) or a correlated subquery (decorrelates to the
same).  The scalable implementation used here is the classic union-tag
trick, one shuffle total:

1. union both sides tagged, with a common (key, time) layout;
2. single window per key ordered by (time, side-tag, tiebreak) — right rows
   sort BEFORE left probes at equal time, so "<=" semantics hold;
3. running ``last(value, ignorenulls=True)`` carries the latest right value
   forward onto every left probe row;
4. keep only left rows.

Cost: one hash-partition by key + one sort within partitions — the same
cost as a single window function, independent of time-range density.
Skewed keys can be salted upstream; at 100 TB the partition count follows
``spark.sql.shuffle.partitions`` and AQE coalescing.

Reference provenance: the reference correlates Partitions↔Items by point
queries per partition (/root/reference/internal/state/repo.go:114-120 driven
by watcher.go:136) — an app-level nested-loop join; this operator is the
set-based generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_last_event(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_value: str,
    left_keep: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """For each left row: max/latest ``right_value`` among right rows with the
    same key and ``right_time <= left_time``.  Ties on time resolve to the
    largest ``right_value`` (matching ``SELECT MAX(value) ... WHERE ts <= t``
    when times are unique per value ordering)."""
    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_value).cast("long").alias("__v"),
        F.lit(None).cast("long").alias("__keep"),
    )
    l = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__v"),
        F.col(left_keep).cast("long").alias("__keep"),
    )
    # Right rows sort BEFORE left probes at equal time (side 0 < 1), which
    # gives the inclusive "<=" semantics.  Correctness rests on the running
    # MAX over the prefix frame — ties among right rows at one timestamp
    # need no value ordering, max() is order-insensitive.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l)
    # The declared oracle (Q33) is MAX(value) over right rows with ts <= t;
    # the running max over the tagged union computes exactly that.
    carried = F.max("__v").over(w)
    return (
        unioned.withColumn(out_col, carried)
        .filter(F.col("__side") == 1)
        .select(F.col("__keep").alias(left_keep), F.col(out_col))
    )

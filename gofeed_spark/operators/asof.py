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
    width_rows: int | None = None,
) -> DataFrame:
    """For each left row: max/latest ``right_value`` among right rows with the
    same key and ``right_time <= left_time``.  Ties on time resolve to the
    largest ``right_value`` (matching ``SELECT MAX(value) ... WHERE ts <= t``
    when times are unique per value ordering).

    ``width_rows`` (optional, the caller's row estimate for left+right)
    routes the tagged union through ``compute_width`` on the key: the
    window's sort is compute-bound over byte-slim rows, which AQE's
    byte-based coalescing would funnel onto 1-2 reducers; the explicit
    cores-wide repartition is the distribution the window needs anyway,
    so no extra shuffle is added."""
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
    if width_rows is not None:
        from gofeed_spark.functions.parallel import compute_width

        unioned = compute_width(unioned, "__k", n=width_rows)
    # The declared oracle (Q33) is MAX(value) over right rows with ts <= t;
    # the running max over the tagged union computes exactly that.
    carried = F.max("__v").over(w)
    return (
        unioned.withColumn(out_col, carried)
        .filter(F.col("__side") == 1)
        .select(F.col("__keep").alias(left_keep), F.col(out_col))
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width: int = 3_600_000_000,
) -> DataFrame:
    """Interval-containment join (event.ts ∈ [interval.start, interval.end],
    inclusive, NO equi key) — the other time-join Spark lacks: the naive
    theta join plans as BroadcastNestedLoopJoin (every event against every
    interval; quadratic, and impossible when neither side broadcasts).

    Bin bucketing makes it an equi-join: each interval explodes to its
    covered time bins (⌈length/bin_width⌉ rows — bounded, and 1-2 for
    intervals shorter than a bin), each event maps to ONE bin, the join
    runs on the bin key (ordinary shuffled hash join — AQE's skew-join
    splitting handles a hot hour), and the exact containment predicate
    filters the bin's false positives.  Cost is linear in
    |events| + Σ interval_bins; floor(x / bin) is monotone, so an event
    inside an interval always lands in one of that interval's bins —
    no matches are lost.

    All three time columns must share one NUMERIC clock (the µs-epoch
    convention of the q31/q33 family); ``bin_width`` is in the same unit.
    Returns events ⋈ intervals rows (all columns of both, minus the bin).
    """
    b = F.lit(bin_width)
    ev = events.withColumn("__bin", F.floor(F.col(ts_col) / b))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(F.floor(F.col(start_col) / b), F.floor(F.col(end_col) / b))
        ),
    )
    return (
        ev.join(iv, "__bin")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("__bin")
    )

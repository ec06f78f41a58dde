"""Scale-safe global ordered running sum (the sequence-packing primitive).

A naive global cumulative sum — ``SUM(x) OVER (ORDER BY k)`` with no
PARTITION BY — makes WindowExec move the ENTIRE dataset into one partition
(Spark warns "No Partition Defined for Window operation"), the defining
scale-killer at 100 TB.  The standard distributed formulation is two-pass:

1. range-partition by the order column (partition p holds a contiguous key
   range, ranges ascend with the partition id),
2. per-partition subtotals — N rows, collected to the driver,
3. exclusive prefix-sum of the subtotals on the driver → per-partition
   offsets, broadcast back,
4. per-partition running sum (a window PARTITIONed BY the partition id —
   parallel) plus the partition's offset.

Used by q76 token packing; the same primitive serves any global
order-dependent scan (cumulative bytes, global row_number ranges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "run",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = inclusive running sum of ``val_col`` in global
    ``order_col`` order, without ever concentrating the data on one node.

    Deterministic for unique ``order_col`` keys (range partitioning keeps
    equal keys in one partition, so ties break within a partition exactly
    like the single-window formulation).
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # Materialize (localCheckpoint, released with the frame): the subtotal
    # job and the final scan must observe the SAME partition assignment
    # (range bounds come from sampling).
    ranged = (
        df.repartitionByRange(n, order_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # Pass 1: per-partition subtotals — N tiny rows to the driver.
    subtotals = {
        r["__pid"]: r["s"]
        for r in ranged.groupBy("__pid").agg(F.sum(val_col).alias("s")).collect()
    }
    # Exclusive prefix sum in pid order (range order == pid order).
    offsets, acc = [], 0
    for pid in sorted(subtotals):
        offsets.append((pid, acc))
        acc += int(subtotals[pid] or 0)
    off = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __offset long")
    # Pass 2: parallel per-partition running sum + broadcast offset.
    w = Window.partitionBy("__pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ranged.join(F.broadcast(off), "__pid")
        .withColumn(out_col, (F.sum(val_col).over(w) + F.col("__offset")).cast("long"))
        .drop("__pid", "__offset")
    )

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

    For a NUMERIC order column the range bucket is a pure function of the
    key — ``floor((key - min) / width)`` over the observed [min, max] — so
    both passes compute it independently and deterministically: no
    repartitionByRange (whose bounds come from sampling) and therefore no
    materialization barrier between the passes.  Jobs: one min/max agg,
    one subtotal agg (N tiny rows to the driver), one final windowed scan.
    Non-numeric keys fall back to sampled range partitioning with a
    localCheckpoint pinning the assignment.

    Deterministic for unique ``order_col`` keys (equal keys always share a
    bucket, so ties break within a partition exactly like the
    single-window formulation).
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    dtype = df.schema[order_col].dataType.simpleString()
    numeric = dtype in ("tinyint", "smallint", "int", "bigint", "float", "double", "date")
    if numeric:
        lo_hi = df.agg(
            F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
        ).collect()[0]
        lo, hi = lo_hi["lo"], lo_hi["hi"]
        if lo is None:  # empty input: nothing to sum
            return df.withColumn(out_col, F.lit(None).cast("long"))
        width = max((float(hi) - float(lo)) / n, 1e-12)
        pid = F.least(
            F.floor((F.col(order_col).cast("double") - F.lit(float(lo))) / F.lit(width)),
            F.lit(n - 1),
        ).cast("int")
        ranged = df.withColumn("__pid", pid)
    else:
        # Sampled range bounds are not a pure key function: pin ONE
        # assignment for both passes.
        ranged = (
            df.repartitionByRange(n, order_col)
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint()
        )
    # Pass 1: per-bucket subtotals — N tiny rows to the driver.
    subtotals = {
        r["__pid"]: r["s"]
        for r in ranged.groupBy("__pid").agg(F.sum(val_col).alias("s")).collect()
    }
    # Exclusive prefix sum in pid order (bucket ranges ascend with pid).
    offsets, acc = [], 0
    for pid_v in sorted(subtotals):
        offsets.append((pid_v, acc))
        acc += int(subtotals[pid_v] or 0)
    off = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __offset long")
    # Pass 2: parallel per-bucket running sum + broadcast offset.
    w = Window.partitionBy("__pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ranged.join(F.broadcast(off), "__pid")
        .withColumn(out_col, (F.sum(val_col).over(w) + F.col("__offset")).cast("long"))
        .drop("__pid", "__offset")
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the context-window preparation
    step of a training/RAG pipeline: each document's whitespace-token
    sequence splits into chunks of ``window`` tokens starting every
    ``stride = window - overlap`` tokens (consecutive chunks share
    ``overlap`` tokens so no span is ever cut without context; the final
    chunk is the remaining tail, clamped).

    Returns (id, chunk_idx, n_tokens, chunk_text), one row per chunk,
    chunk_idx 0-based in document order.

    Spark-first shape: pure codegen — split once, then a ``transform``
    over the chunk-START sequence (a HOF lambda per CHUNK, a handful per
    document — per-chunk work is one ``slice`` + ``array_join``, the q69
    winnowing convention; per-TOKEN work would belong in Arrow) and one
    posexplode.  No shuffle: chunks leave the scan assembled, and
    downstream dedup/packing operates on chunk rows like any corpus."""
    if not 0 <= overlap < window:
        raise ValueError(f"need 0 <= overlap < window, got {overlap}/{window}")
    stride = window - overlap
    # materialize the token array BEFORE the transform lambda references
    # it — an inlined split would re-tokenize once per chunk
    base = docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"),
    )
    n = F.size("__toks")
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)).cast("double") / stride).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.slice("__toks", i * stride + 1, window).alias("ctoks"),
        ),
    )
    ex = base.select(F.col(id_col), F.posexplode(chunks).alias("__p", "c"))
    return ex.select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.ctoks").alias("n_tokens"),
        F.array_join("c.ctoks", " ").alias("chunk_text"),
    )

"""Local-parallelism floor for compute-heavy per-row passes.

A parquet file is splittable only at ROW-GROUP boundaries: a table written
as one row group scans as one task no matter how many cores the session
has (``spark.sql.files.maxPartitionBytes`` cannot split inside a row
group), and a per-byte-expensive pass — regex rules, Arrow signature
batches, tf extraction — then runs serial while the rest of the cluster
idles.  Columnar engines that parallelize WITHIN a row group (DuckDB) do
not have this cliff, which is exactly where the round-7 textops gap came
from.

``parallel_floor`` repartitions such a starved input up to the session's
default parallelism.  On a real warehouse table (many files / many row
groups — the 100 TB shape) the guard no-ops: no shuffle is ever added to
a well-split scan.  When it fires, the cost is one round-robin shuffle of
exactly the rows the pass reads — by construction cheaper than running
the pass on one core.

Apply it ONLY at the head of compute-heavy per-row operators (the regex /
Arrow passes), never to cheap scan-project queries where the shuffle
would dominate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


# Below this much compressed scan input the pass is small enough that the
# repartition's task-launch overhead exceeds what parallelism buys back
# (measured: flooring ~0.5 MB sf0.1 inputs INFLATED the headline queries
# ~2×, while ~3-6 MB sf1.0 inputs got 4-6× faster).
MIN_INPUT_BYTES = 1 << 20


def parallel_floor(df: DataFrame, per_task_bytes: "int | None" = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism when its
    scan is split-starved AND carries enough input bytes for the widening
    to pay for itself; identity otherwise (and on any planning/metadata
    error — the floor is an optimization, never a correctness
    dependency).  Non-local storage skips the floor entirely: warehouse
    tables are well-split, and sizing them needs a remote call.

    ``per_task_bytes`` (opt-in, for the HEAVIEST per-byte passes only —
    the shingle/minhash kernels, measured ~0.8 s serial on a 0.6 MB scan):
    below ``MIN_INPUT_BYTES`` the full-parallelism floor never pays, but a
    PROPORTIONAL width (one task per ``per_task_bytes`` of input, capped
    at the session's cores) still does when the pass is expensive enough
    per byte — 0.78 → 0.46 s measured on the sf0.1 shingle pass at width
    ~9.  Callers with cheap per-byte passes must leave it None: the same
    widening INFLATES scan-projects (the round-8 lesson)."""
    import os

    try:
        spark = df.sparkSession
        p = spark.sparkContext.defaultParallelism
        files = df.inputFiles()
        if not files:
            return df
        total = 0
        for f in files:
            total += os.path.getsize(f[5:] if f.startswith("file:") else f)
        if total < MIN_INPUT_BYTES:
            if per_task_bytes:
                w = min(p, total // per_task_bytes)
                if w >= 2 and df.rdd.getNumPartitions() * 2 <= w:
                    return df.repartition(w)
            return df
        if df.rdd.getNumPartitions() * 2 <= p:
            return df.repartition(p)
    except Exception:
        pass
    return df


def compute_width(
    df: DataFrame, *cols: str, n: "int | None" = None, min_rows: int = 20_000
) -> DataFrame:
    """Explicit-width repartition on ``cols`` — EXEMPT from AQE's
    byte-based reducer coalescing.  For stages whose cost is per-row
    COMPUTE (pair explosion, per-bucket gram scoring, wide dedup aggs)
    over byte-slim rows: AQE sizes reducers by bytes and funnels such
    stages onto 1-2 cores (profiled: q58 7.2→1.7 s, q40 6.7→2.3 s, q41
    5.0→2.6 s at sf1.0 once widened).  Width = the session's default
    parallelism — the cores actually available, on any cluster size.

    ``n`` (when the caller knows its corpus size — hint or parquet-footer
    estimate): below ``min_rows`` the widening is SKIPPED — at small
    volume the extra shuffle + 32-task scheduling costs more than the
    parallelism returns (measured ±0.2 s both ways at sf0.1), the same
    size gate ``parallel_floor`` applies by bytes."""
    from pyspark.sql import functions as F

    if n is not None and n < min_rows:
        return df
    spark = df.sparkSession
    p = max(spark.sparkContext.defaultParallelism, 1)
    return df.repartition(p, *[F.col(c) for c in cols])

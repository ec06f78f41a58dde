"""parallel_floor — the split-starved-scan guard (functions/parallel.py).

Parquet splits only at row-group boundaries, so a one-row-group table
scans as one task regardless of cores; the floor repartitions such a scan
up to session parallelism, but ONLY when the input carries enough bytes
to pay for the shuffle, and never on in-memory frames."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from gofeed_spark.functions.parallel import parallel_floor


def _write_one_row_group(path: str, n_rows: int, payload: str) -> None:
    # per-row-distinct payloads: dictionary/RLE encoding would otherwise
    # collapse identical strings far below the floor's byte gate
    tbl = pa.table(
        {"id": list(range(n_rows)), "text": [f"{i}:{payload}" for i in range(n_rows)]}
    )
    pq.write_table(tbl, path, row_group_size=n_rows, compression="NONE")


def test_floor_widens_large_single_row_group_scan(spark, tmp_path):
    p = str(tmp_path / "big.parquet")
    _write_one_row_group(p, 4000, "x" * 600)  # ~2.4 MB, one row group
    df = spark.read.parquet(p)
    assert df.rdd.getNumPartitions() <= 2  # starved by construction
    out = parallel_floor(df)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert out.count() == 4000


def test_floor_skips_small_input(spark, tmp_path):
    p = str(tmp_path / "small.parquet")
    _write_one_row_group(p, 200, "x" * 100)  # ~20 KB: overhead > win
    df = spark.read.parquet(p)
    out = parallel_floor(df)
    assert out is df  # identity — no shuffle added


def test_floor_skips_in_memory_frames(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "x int")
    assert parallel_floor(df) is df


def test_floor_proportional_width_below_min_bytes(spark, tmp_path):
    # Opt-in per_task_bytes: a sub-MiB heavy-pass input gets a width
    # proportional to its bytes (one task per per_task_bytes), capped at
    # session parallelism — never the full-parallelism floor.
    p = str(tmp_path / "mid.parquet")
    _write_one_row_group(p, 3000, "y" * 120)  # ~400 KB < 1 MiB gate
    df = spark.read.parquet(p)
    assert parallel_floor(df) is df  # default: below the byte gate
    out = parallel_floor(df, per_task_bytes=64 * 1024)
    w = out.rdd.getNumPartitions()
    # ~400 KB / 64 KiB = 6 tasks, capped at session parallelism
    assert 2 <= w <= min(6, spark.sparkContext.defaultParallelism)
    assert out.count() == 3000


def test_floor_proportional_width_skips_tiny_input(spark, tmp_path):
    p = str(tmp_path / "tiny.parquet")
    _write_one_row_group(p, 200, "x" * 100)  # ~20 KB: width would be < 2
    df = spark.read.parquet(p)
    assert parallel_floor(df, per_task_bytes=64 * 1024) is df

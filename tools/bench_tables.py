"""Table-format commit-cost evidence: per-APPEND wall time and metadata
bytes as the table grows — the measured form of the O(new files) claim
(sources/delta.py, sources/iceberg.py module docs).

For each format, appends K identical batches and records per commit:
  wall_s            end-to-end write_* call
  meta_bytes        NEW bytes under the metadata plane this commit
                    (_delta_log/ vs metadata/)
  meta_total_bytes  cumulative metadata-plane size

Expected shapes (honest, by construction):
- Delta: one JSON commit of O(new files) actions — meta_bytes flat.
- Iceberg: one O(new files) manifest + a manifest LIST that carries all
  prior manifests by pointer — meta_bytes grows ~linearly in COMMIT
  COUNT (a few hundred bytes per prior manifest), never in data size;
  real deployments fold this with manifest rewrites/expiry, and
  expire_iceberg keeps history bounded here.

Usage: python tools/bench_tables.py [n_commits] [rows_per_commit]
Prints ONE JSON line; append to BENCH_SCALE.md via tee/pipe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plane_bytes(fs, root: str, sub: str) -> int:
    total = 0
    for rel, size in fs.walk_files(root):
        if rel.startswith(sub):
            total += size
    return total


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    from gofeed_spark.fs import get_filesystem
    from gofeed_spark.sources import delta as D
    from gofeed_spark.sources import iceberg as I

    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    batch = spark.range(rows).select(
        F.col("id"),
        (F.col("id") % 5).cast("string").alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    batch.localCheckpoint()

    work = tempfile.mkdtemp(prefix="bench_tables_")
    out: dict = {"metric": "bench_tables", "n_commits": n_commits, "rows_per_commit": rows}
    try:
        for fmt, writer, plane in (
            ("delta", lambda df, p: D.write_delta(df, p, partition_by=["k"]), "_delta_log/"),
            ("iceberg", lambda df, p: I.write_iceberg(df, p, partition_by=["k"]), "metadata/"),
        ):
            path = f"{work}/{fmt}"
            fs = get_filesystem(path)
            series = []
            prev = 0
            for i in range(n_commits):
                t0 = time.perf_counter()
                writer(batch, path)
                wall = time.perf_counter() - t0
                cur = _plane_bytes(fs, path, plane)
                series.append(
                    {
                        "commit": i,
                        "wall_s": round(wall, 3),
                        "meta_bytes": cur - prev,
                        "meta_total_bytes": cur,
                    }
                )
                prev = cur
            out[fmt] = series
            # read-side sanity: the final table is complete
            reader = D.read_delta if fmt == "delta" else I.read_iceberg
            assert reader(spark, path).count() == rows * n_commits
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

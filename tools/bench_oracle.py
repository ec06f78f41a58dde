"""DuckDB-side timing of the headline queries' oracle SQL — the other half
of the bench ratio.  Methodology-matched to bench.py: best-of-N (default 3)
per query after one warm-up execution, full materialization (fetchall).

Usage: python tools/bench_oracle.py [sf_dir] [runs] [query ...]
Prints one JSON line {"metric": "oracle_total", ...}.  Naming queries
restricts the set (for splitting very long runs across invocations);
with an explicit subset AND runs=1 the warm-up is skipped, so the single
timing is a COLD run — label it as such when recording.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE, _sf_from_dir
from gofeed_spark.catalog import TABLES
from gofeed_spark.queries import ORACLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if only and name not in only:
            continue
        sql = ORACLES.get(name)
        if sql is None:
            continue  # rows-only query (no oracle): excluded on both sides
        if not (only and runs == 1):
            con.execute(sql).fetchall()  # warm-up (page cache, planning)
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "oracle_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(sf_dir),
                "runs": runs,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

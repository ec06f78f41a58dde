"""Paired sf0.1 ratio vs the DuckDB oracle — ONE JSON line per round.

The 2×-oracle gate evidence was previously scattered across ad-hoc runs at
different host loads; this tool is the single methodology both sides run
under together (same process, same minute, same page cache):

    python tools/bench_paired.py [sf_dir] [runs]

For every headline query that HAS an oracle: Spark side = bench.py's
end-to-end noop-sink execution (one warm-up, then median + best of
``runs``); oracle side = the same query's DuckDB SQL fetched to
completion, same warm-up + stats.  Prints

    {"metric": "paired_ratio", "sf_dir": ..., "runs": N,
     "spark_median": s, "spark_best": s, "oracle_median": s,
     "ratio_median": spark_median/oracle_median,
     "ratio_best": spark_best/oracle_median,
     "queries": {q: {"spark": s, "oracle": s}}}

Append the line to BENCH_SCALE.md per round (pipe, never transcribe).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE
from gofeed_spark.catalog import TABLES
from gofeed_spark.queries import ORACLES, QUERIES
from gofeed_spark.session import get_spark


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, runs: int) -> tuple[float, float]:
    fn()  # warm-up: Catalyst/codegen compile or DuckDB plan cache
    vals = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return statistics.median(vals), min(vals)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("paired-bench", master=f"local[{cpus}]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    per_q: dict[str, dict[str, float]] = {}
    sp_med = sp_best = or_med = 0.0
    for name in HEADLINE:
        if name not in ORACLES:
            continue  # oracle-less ops are outside the paired gate
        df = QUERIES[name](spark, sf_dir)
        s_med, s_best = _timed(lambda d=df: _noop(d), runs)
        o_med, _ = _timed(lambda q=ORACLES[name]: con.execute(q).fetchall(), runs)
        per_q[name] = {"spark": round(s_med, 3), "oracle": round(o_med, 3)}
        sp_med += s_med
        sp_best += s_best
        or_med += o_med

    print(
        json.dumps(
            {
                "metric": "paired_ratio",
                "sf_dir": sf_dir,
                "runs": runs,
                "spark_median": round(sp_med, 3),
                "spark_best": round(sp_best, 3),
                "oracle_median": round(or_med, 3),
                "ratio_median": round(sp_med / or_med, 3),
                "ratio_best": round(sp_best / or_med, 3),
                "queries": per_q,
            }
        )
    )


if __name__ == "__main__":
    main()

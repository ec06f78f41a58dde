"""Full-surface execution sweep: run EVERY registered query at a given
SF dir (Spark side only — no oracle) and print one JSON line with
per-query rows + wall seconds.  This is the scale-robustness probe the
oracle gate can't give (DuckDB's all-pairs oracles don't scale to
sf1.0): it proves each plan executes at 10-100x the gate SF and flags
queries whose cost curve bends wrong (compare runs across SFs).

    python tools/sweep_all.py [sf_dir] [query ...]

Round-12 catch: the WARC fixtures' pinned n_archives=4 (parse
parallelism floor at 50k docs) fell out of the first sf1.0 sweep.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gofeed_spark.queries import MIN_ROWS, ORACLES, QUERIES
from gofeed_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/repo/.bench_data/sf1.0"
    # accept full names OR qNN prefixes; a zero-match argument is fatal
    # (the r15 check_correctness vacuous-filter lesson)
    names: list[str] = []
    for a in args[1:]:
        hits = [n for n in sorted(QUERIES) if n == a or n.startswith(a + "_")]
        if not hits:
            print(f"FATAL: {a!r} matches no registered query", file=sys.stderr)
            return 2
        names.extend(h for h in hits if h not in names)
    names = names or sorted(QUERIES)
    spark = get_spark("sweep-all")
    out, failed, vacuous = {}, 0, 0
    for name in names:
        t0 = time.perf_counter()
        try:
            n = QUERIES[name](spark, sf_dir).count()
            out[name] = {"rows": n, "sec": round(time.perf_counter() - t0, 2)}
            # sweep-side non-vacuity (the gate audit's twin at scale): an
            # oracle-paired query whose fixture vanishes at this SF would
            # otherwise read as a clean pass while executing nothing
            if name in ORACLES and n < MIN_ROWS.get(name, 1):
                out[name]["VACUOUS"] = True
                vacuous += 1
        except Exception as e:  # noqa: BLE001 - recorded per query
            out[name] = {"err": f"{type(e).__name__}: {str(e)[:200]}"}
            failed += 1
        print(f"{name:36s} {out[name]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": "sweep_all",
                "sf_dir": sf_dir,
                "n_queries": len(out),
                "n_failed": failed,
                "n_vacuous": vacuous,
                "total_sec": round(sum(v.get("sec", 0) for v in out.values()), 1),
                "queries": out,
            }
        )
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

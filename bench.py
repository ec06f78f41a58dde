"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {"q06_groupby_multiagg": <sec>, ...}, "sf": <float>,
     "oracle_total": <sec>, "ratio": <value/oracle_total>}

``oracle_total``/``ratio`` carry the DuckDB-oracle comparison directly in
the per-round line (same process, same minute, same page cache — the
bench_paired.py methodology): every headline query that has an oracle is
also run through DuckDB (one warm-up, then the same median-of-N), and
``ratio`` is the paired-subset Spark total over the oracle total.

Each query executes end-to-end (parquet scan -> plan -> noop sink) so the
timing covers the real distributed execution path without driver-side
collect of large results.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gofeed_spark.queries import QUERIES  # noqa: E402
from gofeed_spark.session import get_spark  # noqa: E402

# Representative mix: scans, aggs, joins, windows, sessionization, as-of,
# dedup/LSH, similarity — the shapes whose plans matter at 100 TB.
HEADLINE = [
    "q01_scan_project",
    "q04_sort_limit",
    "q06_groupby_multiagg",
    "q08_having",
    "q10_inner_join",
    "q11_join3_agg",
    "q15_theta_join",
    "q16_window_rank",
    "q17_topk_per_group",
    "q19_window_running",
    "q24_math_conditional",
    "q31_sessionization",
    "q32_tumbling_window",
    "q33_asof_join",
    "q36_token_count",
    "q38_quality_score",
    "q40_ngram_jaccard_pairs",
    "q41_minhash_lsh_pairs",
    "q34_knn_brute",
    "q35_label_centroids",
    "q58_topk_pairs_lsh",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_query(spark, name: str, sf_dir: str, runs: int = 3) -> tuple[float, float]:
    """(median, best) latency over ``runs`` end-to-end executions (3 by
    default).  Median over min for the headline: the minimum rides out
    noise but rewards one lucky scheduling draw, which at the ~0.1-0.3 s
    local-mode floor produced ±10-20 ms round-over-round drift on sub-0.5 s
    queries; the median is stable against both the lucky and the unlucky
    tail while measuring the same steady state.

    The first execution of a plan pays one-time JVM costs — Catalyst
    analysis over py4j, whole-stage-codegen compilation (janino), AQE stage
    planning — that at bench SF dwarf the actual execution (3-5× for most
    queries) and amortize to zero at the 100 TB scale this engine targets.
    The headline metric is the repeat-run steady state (the engine, not the
    compiler); the cold first run is reported alongside so both semantics
    are visible.  Every run executes the full scan → compute → sink path
    (noop sink, nothing cached between runs except OS page cache both
    engines share)."""
    times = []
    for _ in range(runs):
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    import statistics

    return statistics.median(times), min(times)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--runs", type=int, default=int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")),
        help="executions per query; headline = median (steady state), cold also reported",
    )
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        help="directory of *.parquet tables to benchmark against",
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir
    spark = get_spark("bench")
    # Warm-up sweep, off the clock: one execution of EVERY headline plan
    # shape.  This amortizes the per-session one-time costs — JVM/parquet
    # footer cache, Python UDF worker daemons, and crucially janino
    # whole-stage-codegen compilation + JIT for each plan — which at bench
    # SF are 3-5× the steady-state execution and are exactly what the
    # declared steady-state methodology excludes (they are per-session, not
    # per-query, and amortize to zero at the 100 TB target scale).  The
    # sweep IS the cold pass: its per-query times are reported as
    # cold_total so both semantics stay visible.
    colds: dict[str, float] = {}
    for name in HEADLINE:
        if name in QUERIES:
            try:
                t0 = time.time()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                colds[name] = round(time.time() - t0, 3)
            except Exception:  # noqa: BLE001 — the timed loop reports it
                pass

    timings: dict[str, float] = {}
    bests: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        try:
            median, best = run_query(spark, name, sf_dir, runs=args.runs)
            timings[name] = round(median, 3)
            bests[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 — a broken query must not kill the bench
            print(f"bench: {name} failed: {exc!r}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    cold_total = round(sum(t for t in colds.values() if t >= 0), 3)
    best_total = round(sum(t for t in bests.values() if t >= 0), 3)
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
        "runs": args.runs,
        "cold_total": cold_total,
        # best-of-N, the pre-round-7 headline semantics: kept so
        # cross-round deltas stay apples-to-apples
        "best_total": best_total,
    }
    # Paired DuckDB-oracle leg: same process/minute/page cache, same
    # warm-up + median-of-N. Fail-safe — a broken oracle leg must never
    # take down the Spark bench line.
    try:
        import statistics

        import duckdb

        from gofeed_spark.catalog import TABLES
        from gofeed_spark.queries import ORACLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        oracle_total = paired_total = 0.0
        for name in HEADLINE:
            if name not in ORACLES or timings.get(name, -1.0) < 0:
                continue
            sql = ORACLES[name]
            con.execute(sql).fetchall()  # warm-up (plan cache, page cache)
            vals = []
            for _ in range(args.runs):
                t0 = time.time()
                con.execute(sql).fetchall()
                vals.append(time.time() - t0)
            oracle_total += statistics.median(vals)
            paired_total += timings[name]
        if oracle_total > 0:
            out["oracle_total"] = round(oracle_total, 3)
            out["ratio"] = round(paired_total / oracle_total, 3)
    except Exception as exc:  # noqa: BLE001
        print(f"bench: oracle leg skipped: {exc!r}", file=sys.stderr)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

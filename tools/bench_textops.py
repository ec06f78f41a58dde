"""Scale bench for the corpus-quality text operators (q89-q93): Spark vs
the DuckDB oracle on the SAME parquet, bench.py methodology (one warm-up,
then median of N full materializations per engine).

    python tools/bench_textops.py [sf_dir] [runs]

Prints one JSON line:
    {"metric": "textops", "sf_dir": ..., "spark": {q: sec}, "oracle": {q: sec}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from gofeed_spark.catalog import TABLES
from gofeed_spark.queries import ORACLES, QUERIES
from gofeed_spark.session import get_spark

QS = [
    "q89_boilerplate_removal",
    "q90_source_report",
    "q91_gopher_rules",
    "q92_dup_ngram_fraction",
    "q93_mixture_sample",
    "q94_duplicate_spans",
    "q95_interval_join",
    "q96_fuzzy_join",
    "q97_bm25_search",
    "q101_source_cap",
    "q102_shard_export",
    "q103_curation_export",
    "q104_unigram_logprob",
    "q105_url_canonicalize",
    "q106_bigram_logprob",
    "q107_keyword_classify",
    "q108_relative_length_filter",
]


def timed(fn, runs):
    fn()  # warm-up
    vals = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return round(statistics.median(vals), 3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_data",
        "sf0.5",
    )
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("textops-bench", master=f"local[{cpus}]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    sp, du = {}, {}
    for name in QS:
        df = QUERIES[name](spark, sf_dir)
        sp[name] = timed(lambda d=df: d.collect(), runs)
        sql = ORACLES[name]
        du[name] = timed(lambda s=sql: con.execute(s).fetchall(), runs)

    print(
        json.dumps(
            {
                "metric": "textops",
                "sf_dir": sf_dir,
                "runs": runs,
                "spark": sp,
                "oracle": du,
                "spark_total": round(sum(sp.values()), 3),
                "oracle_total": round(sum(du.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()

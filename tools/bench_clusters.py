"""Cluster-resolution bench at scale: q83's pair→cluster→survivor pipeline
(pairs from the CAPPED MinHash-LSH path → ``neardup_clusters`` min-label
propagation) on the 5×-replicated corpus, reporting wall time and
rounds-to-convergence — the sub-quadratic evidence BENCH_SCALE.md tracks.

    python tools/bench_clusters.py [sf_dir]

Default sf_dir: .bench_data/sf0.5 (stage with tools/make_bench_sf.py).
The corpus clones every 5th doc once and every 10th twice (q83's shape),
so on the replicated data every doc is already a 5-clone family and the
clone step grows the largest families to 15 members — the regime where
uncapped pair generation would be quadratic.

Prints ONE JSON line:
    {"metric": "neardup_clusters", "n_docs": N, "n_pairs": P,
     "n_clusters": C, "rounds": R, "pairs_sec": s, "cluster_sec": s}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gofeed_spark.catalog import load_table, table_rowcount
from gofeed_spark.operators import dedup
from gofeed_spark.session import get_spark

CLONE_OFFSET = 10_000_000


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, ".bench_data", "sf0.5"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("clusters-bench", master=f"local[{cpus}]")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    c1 = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + CLONE_OFFSET).alias("doc_id"), "text"
    )
    c2 = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2 * CLONE_OFFSET).alias("doc_id"), "text"
    )
    corpus = d.unionByName(c1).unionByName(c2)
    n = table_rowcount(sf_dir, "documents")
    n_docs = n + n // 5 + n // 10 + 2

    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_pairs(
        corpus, threshold=0.5, n_hint=n_docs
    ).localCheckpoint()
    n_pairs = pairs.count()
    pairs_sec = time.perf_counter() - t0

    report: dict = {}
    t0 = time.perf_counter()
    out = dedup.neardup_clusters(pairs, docs=corpus, report=report)
    n_clusters = out.filter(F.col("keep") == 1).count()
    cluster_sec = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "neardup_clusters",
                "n_docs": n_docs,
                "n_pairs": n_pairs,
                "n_clusters": n_clusters,
                "rounds": report.get("rounds"),
                "pairs_sec": round(pairs_sec, 2),
                "cluster_sec": round(cluster_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Incremental-dedup bench: amortized index build + per-batch probe vs
re-running whole-corpus MinHash-LSH — the append-only-corpus evidence
BENCH_SCALE.md tracks for q100's machinery.

    python tools/bench_incremental.py [sf_dir] [batch_pct]

Default sf_dir: .bench_data/sf0.5 (stage with tools/make_bench_sf.py);
batch_pct=2 (docs with id % 50 == 0 form the incoming batch, the rest
are the standing corpus).  The batch carries planted clones (id % 100
== 0 takes corpus doc id+1's text) so the probe does real matching work.

Prints ONE JSON line:
    {"metric": "incremental_dedup", "n_corpus": N, "n_batch": B,
     "build_sec": s, "probe_sec": s, "full_pairs_sec": s,
     "n_matches": M, "speedup_vs_full": x}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gofeed_spark.catalog import load_table
from gofeed_spark.operators import dedup
from gofeed_spark.session import get_spark


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, ".bench_data", "sf0.5")
    every = 100 // int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = get_spark(app_name="bench_incremental")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % every != 0).persist()
    src = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("src_text"))
    batch = (
        docs.filter(F.col("doc_id") % every == 0)
        .join(src, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % (2 * every) == 0) & F.col("src_text").isNotNull(),
                F.col("src_text"),
            ).otherwise(F.col("text")).alias("text"),
        )
        .persist()
    )
    n_corpus, n_batch = corpus.count(), batch.count()

    path = tempfile.mkdtemp(prefix="gofeed_bench_idx_")
    try:
        t0 = time.monotonic()
        dedup.build_minhash_index(corpus, path, num_hashes=64, bands=16, k=5)
        build_sec = time.monotonic() - t0

        # warm-up probe (codegen/Arrow init), then timed steady-state probe
        dedup.probe_minhash_index(spark, path, batch, threshold=1.0).count()
        t0 = time.monotonic()
        n_matches = dedup.probe_minhash_index(spark, path, batch, threshold=1.0).count()
        probe_sec = time.monotonic() - t0

        # the write half of the loop: append the (deduped) batch so the
        # NEXT batch sees it — cost is O(batch), independent of corpus
        t0 = time.monotonic()
        dedup.append_minhash_index(spark, path, batch)
        append_sec = time.monotonic() - t0

        # the non-incremental alternative: whole-corpus pair generation on
        # corpus+batch (what re-running dedup on every append costs)
        both = corpus.unionByName(batch)
        both.count()
        t0 = time.monotonic()
        dedup.minhash_lsh_pairs(both, num_hashes=64, bands=16, k=5, threshold=0.5).count()
        full_sec = time.monotonic() - t0
    finally:
        shutil.rmtree(path, ignore_errors=True)

    print(json.dumps({
        "metric": "incremental_dedup",
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_batch": n_batch,
        "build_sec": round(build_sec, 3),
        "probe_sec": round(probe_sec, 3),
        "append_sec": round(append_sec, 3),
        "full_pairs_sec": round(full_sec, 3),
        "n_matches": n_matches,
        "speedup_vs_full": round(full_sec / probe_sec, 1) if probe_sec else None,
    }))


if __name__ == "__main__":
    main()

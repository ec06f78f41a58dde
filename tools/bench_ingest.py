"""Ingestion/tokenizer bench: WARC export+read and BPE train+encode
throughput over the documents table at a given sf dir.

    python tools/bench_ingest.py [sf_dir]

Prints ONE JSON line:
    {"metric": "ingest", "sf_dir": ..., "n_docs": N,
     "warc": {"export_sec": s, "read_sec": s, "docs_per_sec_read": r},
     "bpe": {"train_sec": s, "encode_sec": s, "tokens": n,
             "tokens_per_sec": r}}
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

from gofeed_spark.operators import bpe
from gofeed_spark.session import get_spark
from gofeed_spark.sources import warc as W


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ingest-bench", master=f"local[{cpus}]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    urls = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode("text", "utf-8").alias("body"),
    )
    out_dir = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        t0 = time.perf_counter()
        W.export_warc(urls, out_dir, n_archives=32).collect()
        t_export = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_back = W.read_warc(spark, out_dir + "/*.warc.gz").count()
        t_read = time.perf_counter() - t0
        assert n_back == n_docs, (n_back, n_docs)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.perf_counter()
    merges = bpe.train_bpe(docs, num_merges=200, max_words=2000)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_tokens = (
        bpe.bpe_segments(docs, merges)
        .agg(F.sum("n_tokens").alias("t"))
        .collect()[0]["t"]
    )
    t_encode = time.perf_counter() - t0
    print(json.dumps({
        "metric": "ingest",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "warc": {
            "export_sec": round(t_export, 2),
            "read_sec": round(t_read, 2),
            "docs_per_sec_read": round(n_docs / t_read),
        },
        "bpe": {
            "train_sec": round(t_train, 2),
            "encode_sec": round(t_encode, 2),
            "tokens": int(n_tokens),
            "tokens_per_sec": round(n_tokens / t_encode),
        },
    }))


if __name__ == "__main__":
    main()

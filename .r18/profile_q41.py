"""Phase profile of q41 minhash_lsh_pairs at a given SF dir (guide §1):
times each subtree with the noop sink, clearing cache between phases.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.queries import QUERIES
from gofeed_spark.catalog import load_table as T
from gofeed_spark.operators import dedup as D
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("profile-q41")


def t(label, df, runs=3):
    vals = []
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        vals.append(time.time() - t0)
    print(f"{label:38s} {sorted(vals)[len(vals)//2]:.3f}  (min {min(vals):.3f})")


docs = T(spark, sf_dir, "documents")
# warm once
QUERIES["q41_minhash_lsh_pairs"](spark, sf_dir).write.format("noop").mode("overwrite").save()

sh = D._doc_shingles(docs, "text", "doc_id", 5)
t("_doc_shingles", sh)
sigs = D.minhash_signatures(docs)
t("minhash_signatures", sigs)
band = D._band_rows(D.minhash_signatures(docs), 64, 16)
t("sigs+band_rows", band)
full = QUERIES["q41_minhash_lsh_pairs"](spark, sf_dir)
t("q41 full", full)
# full without the est_jac joins: candidates only
sp = D.minhash_signatures(docs).persist()
cand = D._group_pairs(D._band_rows(sp, 64, 16), "bh", df_cap=None, hot="star", n=5000).dropDuplicates(["doc_a", "doc_b"])
t("sigs(persist)+band+group+dedup", cand)
sp.unpersist()

import shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.catalog import load_table
from pyspark.sql import functions as F
from gofeed_spark.operators import dedup as D
from gofeed_spark.fs import get_filesystem

spark = get_spark("profile-build")
docs = load_table(spark, "/root/repo/.bench_data/sf1.0", "documents")
docs.count()
corpus = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
work = tempfile.mkdtemp(prefix="prof_build_") + "/idx"
fs = get_filesystem(work)
last = [time.time()]
def lap(label):
    now = time.time(); print(f"{label:26s} {now-last[0]:7.2f}s", flush=True); last[0] = now
try:
    sigs = D.minhash_signatures(corpus, 64, 5, "text", "doc_id", with_fp=True).persist()
    sigs.count()
    lap("sigs materialize")
    band = D._band_rows(sigs, 64, 16)
    stats = band.groupBy("bh").agg(F.count("*").alias("df"), F.min("doc_id").alias("hub"))
    hot = stats.filter(F.col("df") > 5000)
    band = band.join(F.broadcast(hot.select("bh")), "bh", "left_anti").unionByName(hot.select(F.col("hub").alias("doc_id"), "bh"))
    sigs.write.mode("overwrite").parquet(fs.spark_path(fs.join(work, "sigs")))
    lap("sigs write")
    band.write.mode("overwrite").parquet(fs.spark_path(fs.join(work, "bands")))
    lap("bands write")
    sigs.groupBy("fp").agg(F.min("doc_id").alias("dup_of")).write.mode("overwrite").parquet(fs.spark_path(fs.join(work, "fps")))
    lap("fps write")
    sigs.unpersist()
finally:
    shutil.rmtree(work.rsplit("/",1)[0], ignore_errors=True)

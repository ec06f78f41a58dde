import shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.catalog import load_table
from pyspark.sql import functions as F
from gofeed_spark.operators import dedup as D

spark = get_spark("profile-q100")
docs = load_table(spark, "/root/repo/.bench_data/sf1.0", "documents")
docs.count()
corpus = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
shifted = docs.select((F.col("doc_id") - 1).alias("sid"), F.col("text").alias("stext"))
batch = (docs.filter(F.col("doc_id") % 10 == 0)
    .join(shifted, F.col("doc_id") == F.col("sid"), "left")
    .select("doc_id", F.when((F.col("doc_id") % 20 == 0) & F.col("stext").isNotNull(), F.col("stext")).otherwise(F.col("text")).alias("text")))
work = tempfile.mkdtemp(prefix="prof_q100_") + "/idx"
last = [time.time()]
def lap(label):
    now = time.time(); print(f"{label:30s} {now-last[0]:7.2f}s", flush=True); last[0] = now
try:
    D.build_minhash_index(corpus, work)
    lap("build_minhash_index")
    out = D.probe_minhash_index(spark, work, batch, threshold=1.0)
    out.write.format("noop").mode("overwrite").save()
    lap("probe (noop)")
finally:
    shutil.rmtree(work.rsplit("/",1)[0], ignore_errors=True)

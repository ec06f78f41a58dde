import shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.catalog import load_table
from pyspark.sql import functions as F
from gofeed_spark.sources import iceberg as I

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf1.0"
spark = get_spark("profile-q171")
docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
docs.count()
work = tempfile.mkdtemp(prefix="prof_q171_") + "/tbl"
last_t = [time.time()]
def lap(label):
    now = time.time()
    print(f"{label:30s} {now - last_t[0]:7.2f}s", flush=True)
    last_t[0] = now
try:
    last = None
    for residue in (0, 1, 2):
        last = I.write_iceberg(docs.filter(F.col("doc_id") % 3 == residue), work, partition_by=["source"])
        lap(f"write r{residue}")
    res = I.rewrite_iceberg(spark, work, target_file_bytes=1 << 30, min_files=2)
    lap("rewrite_iceberg")
    head = I.read_iceberg(spark, work).groupBy("source").agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c"))
    head.write.format("noop").mode("overwrite").save()
    lap("head read")
    ch = I.read_iceberg_changes(spark, work, 0).groupBy("source").agg(F.countDistinct("_snapshot_id").alias("n"))
    ch.write.format("noop").mode("overwrite").save()
    lap("changes read")
    pre = I.read_iceberg(spark, work, snapshot_id=last).groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    pre.write.format("noop").mode("overwrite").save()
    lap("pre-rewrite read")
    print("rewritten:", res["rewritten"])
finally:
    shutil.rmtree(work.rsplit("/",1)[0], ignore_errors=True)

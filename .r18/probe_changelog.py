import shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.catalog import load_table
from pyspark.sql import functions as F
from gofeed_spark.sources import iceberg as I

spark = get_spark("probe-chg")
docs = load_table(spark, "/root/repo/.bench_data/sf1.0", "documents").select("doc_id", "source", "n_chars")
docs.count()
work = tempfile.mkdtemp(prefix="prof_chg_") + "/tbl"
try:
    I.write_iceberg(docs, work, partition_by=["source"])
    t0 = time.time()
    D = 16
    for i in range(D):
        I.delete_iceberg_rows(spark, work, f"doc_id % 37 = {i}")
    t_del = time.time() - t0
    t0 = time.time()
    out = (I.read_iceberg_changes(spark, work, 0, cdf=True)
        .groupBy("_change_type").agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c")))
    rows = {r["_change_type"]: (r["n"], r["c"]) for r in out.collect()}
    t_read = time.time() - t0
    print(f"deletes({D}): {t_del:.2f}s   changelog read: {t_read:.2f}s   {sorted(rows.items())}")
finally:
    shutil.rmtree(work.rsplit("/",1)[0], ignore_errors=True)

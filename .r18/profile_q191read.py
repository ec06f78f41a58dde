import shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.catalog import load_table
from pyspark.sql import functions as F
from gofeed_spark.sources import delta as D
from gofeed_spark.sources import iceberg as I

spark = get_spark("profile-q191r")
docs = load_table(spark, "/root/repo/.bench_data/sf1.0", "documents").select("doc_id", "source", "n_chars")
docs.count()
upd = docs.filter(F.col("doc_id") % 5 == 2).withColumn("n_chars", F.col("n_chars") + 1000)
work = tempfile.mkdtemp(prefix="prof_q191r_")
dt, it = f"{work}/delta", f"{work}/ice"
try:
    for residue in (0, 1):
        batch = docs.filter(F.col("doc_id") % 2 == residue).repartition(1).sortWithinPartitions("doc_id")
        D.write_delta(batch, dt, row_tracking=True)
        I.write_iceberg(batch, it, format_version=3)
    D.merge_delta(spark, dt, upd, ["doc_id"], when_not_matched=None)
    I.merge_iceberg(spark, it, upd, ["doc_id"], when_not_matched=None)
    D.optimize_delta(spark, dt, min_files=2)
    I.rewrite_iceberg(spark, it, min_files=2)
    D.delete_delta_rows(spark, dt, "doc_id % 7 = 0", dv=True)
    I.delete_iceberg_rows(spark, it, "doc_id % 7 = 0")
    def t(label, df):
        vals=[]
        for _ in range(3):
            t0=time.time(); df.write.format("noop").mode("overwrite").save(); vals.append(time.time()-t0)
        print(f"{label:30s} {sorted(vals)[1]:.2f}  (min {min(vals):.2f})", flush=True)
    t("read_delta lineage", D.read_delta(spark, dt, row_lineage=True))
    t("read_iceberg lineage", I.read_iceberg(spark, it, row_lineage=True))
    d = D.read_delta(spark, dt, row_lineage=True).groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    i = I.read_iceberg(spark, it, row_lineage=True).groupBy("source").agg(F.sum("_row_id").alias("s"))
    t("both reads + aggs + join", d.join(i, "source"))
finally:
    shutil.rmtree(work, ignore_errors=True)

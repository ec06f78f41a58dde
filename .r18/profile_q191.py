"""Per-step wall profile of q191's body at a given SF dir."""
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.catalog import load_table
from pyspark.sql import functions as F
from gofeed_spark.sources import delta as D
from gofeed_spark.sources import iceberg as I

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf1.0"
spark = get_spark("profile-q191")
# warm the JVM/codegen on something small first
load_table(spark, sf_dir, "documents").count()

docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
upd = docs.filter(F.col("doc_id") % 5 == 2).withColumn("n_chars", F.col("n_chars") + 1000)
work = tempfile.mkdtemp(prefix="prof_q191_")
dt, it = f"{work}/delta", f"{work}/ice"
T0 = time.time()
last = [T0]


def lap(label):
    now = time.time()
    print(f"{label:34s} {now - last[0]:7.2f}s  (cum {now - T0:6.2f})", flush=True)
    last[0] = now


try:
    for residue in (0, 1):
        batch = (
            docs.filter(F.col("doc_id") % 2 == residue)
            .repartition(1)
            .sortWithinPartitions("doc_id")
        )
        D.write_delta(batch, dt, row_tracking=True)
        lap(f"write_delta r{residue}")
        I.write_iceberg(batch, it, format_version=3)
        lap(f"write_iceberg r{residue}")
    dmv = D.merge_delta(spark, dt, upd, ["doc_id"], when_not_matched=None)
    lap("merge_delta")
    imv = I.merge_iceberg(spark, it, upd, ["doc_id"], when_not_matched=None)
    lap("merge_iceberg")
    iseq = next(
        s["sequence-number"]
        for s in I._load_metadata(I.get_filesystem(it), it)[0]["snapshots"]
        if s["snapshot-id"] == imv
    )
    D.optimize_delta(spark, dt, min_files=2)
    lap("optimize_delta")
    I.rewrite_iceberg(spark, it, min_files=2)
    lap("rewrite_iceberg")
    D.delete_delta_rows(spark, dt, "doc_id % 7 = 0", dv=True)
    lap("delete_delta_rows (dv)")
    I.delete_iceberg_rows(spark, it, "doc_id % 7 = 0")
    lap("delete_iceberg_rows")
    d = (
        D.read_delta(spark, dt, row_lineage=True)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_live"),
            F.sum("_row_id").cast("long").alias("rowid_sum_delta"),
            F.sum(F.when(F.col("_row_commit_version") == dmv, 1).otherwise(0)).cast("long").alias("n_upd_delta"),
            F.sum("n_chars").cast("long").alias("chars_live"),
        )
    )
    i = (
        I.read_iceberg(spark, it, row_lineage=True)
        .groupBy("source")
        .agg(
            F.sum("_row_id").cast("long").alias("rowid_sum_ice"),
            F.sum(F.when(F.col("_last_updated_sequence_number") == iseq, 1).otherwise(0)).cast("long").alias("n_upd_ice"),
        )
    )
    out = (
        d.join(i, "source")
        .select("source", "n_live", "rowid_sum_delta", "rowid_sum_ice", "n_upd_delta", "n_upd_ice", "chars_live")
        .orderBy("source")
        .localCheckpoint()
    )
    lap("final read+join+checkpoint")
    print("rows:", out.count())
finally:
    shutil.rmtree(work, ignore_errors=True)

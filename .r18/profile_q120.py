import shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.catalog import load_table
from pyspark.sql import functions as F
from gofeed_spark.operators.urls import canonicalize_url
from gofeed_spark.sources import warc as W
from gofeed_spark.sources.warc import read_warc_stream
from gofeed_spark.queries.streaming_q import _await_drained
from gofeed_spark.streaming.sinks import ParquetUpsertSink

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf1.0"
spark = get_spark("profile-q120")
docs = load_table(spark, sf_dir, "documents")
docs.count()

def urls(frame, extra):
    return frame.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string"), F.lit(extra)).alias("url"),
        F.encode("text", "utf-8").alias("body"),
    )

work = tempfile.mkdtemp(prefix="prof_q120_")
landing, ckpt, out = f"{work}/landing", f"{work}/ckpt", f"{work}/sink"
spark.conf.set("spark.sql.shuffle.partitions", "4")
last = [time.time()]
def lap(label):
    now = time.time()
    print(f"{label:30s} {now - last[0]:7.2f}s", flush=True)
    last[0] = now
try:
    crawl = urls(docs, "").unionByName(urls(docs.filter(F.col("doc_id") % 5 == 0), "?utm_src=recrawl"))
    n_arch = W.archive_count(crawl.count(), spark.sparkContext.defaultParallelism)
    W.export_warc(crawl, landing, n_archives=n_arch).collect()
    lap(f"export fixture ({n_arch} archives)")
    sink = ParquetUpsertSink(out, key="url_canon", mode="lsm")
    orig = sink.__call__
    times = []
    def timed(df, bid):
        t0 = time.time()
        orig(df, bid)
        times.append(time.time() - t0)
    records = read_warc_stream(spark, landing, max_files_per_trigger=-(-n_arch // 4))
    agg = (records.withColumn("url_canon", canonicalize_url(F.col("url")))
        .withColumn("text", F.decode("body", "utf-8"))
        .withColumn("n_words", F.size(F.split(F.trim("text"), r"\s+")))
        .groupBy("url_canon")
        .agg(F.count(F.lit(1)).alias("n_crawls"), F.sum("n_words").cast("long").alias("total_words")))
    q = (agg.writeStream.outputMode("update").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).foreachBatch(timed).start())
    _await_drained(q, 180)
    lap("stream drain")
    print("sink call times:", [round(t,2) for t in times])
    n = sink.read(spark).count()
    lap("read back")
    print("rows", n)
finally:
    shutil.rmtree(work, ignore_errors=True)

"""Phase profile of q135: export_warc write vs read_warc parse vs extraction."""
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.catalog import load_table
from pyspark.sql import functions as F, Window
from gofeed_spark.queries.web import _html_col, _metrics_cols
from gofeed_spark.operators.html import html_to_text
from gofeed_spark.operators.urls import canonicalize_url
from gofeed_spark.sources import warc as W

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf1.0"
spark = get_spark("profile-q135")
docs = load_table(spark, sf_dir, "documents")
docs.count()

def urls(frame, extra):
    return frame.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string"), F.lit(extra)).alias("url"),
        F.encode(_html_col(), "utf-8").alias("body"),
    )

crawl = urls(docs, "").unionByName(urls(docs.filter(F.col("doc_id") % 5 == 0), "?utm_src=recrawl"))
out_dir = tempfile.mkdtemp(prefix="prof_q135_")
last = [time.time()]

def lap(label):
    now = time.time()
    print(f"{label:34s} {now - last[0]:7.2f}s", flush=True)
    last[0] = now

try:
    n = crawl.count()
    lap("crawl count")
    n_arch = W.archive_count(n, spark.sparkContext.defaultParallelism)
    W.export_warc(crawl, out_dir, n_archives=n_arch, content_type="text/html").collect()
    lap(f"export_warc ({n_arch} archives)")
    back = (
        W.read_warc(spark, out_dir + "/*.warc.gz")
        .filter((F.col("http_status") == 200) & F.col("content_type").startswith("text/html"))
        .select("url", F.decode("body", "utf-8").alias("html"))
    )
    back.write.format("noop").mode("overwrite").save()
    lap("read_warc parse (noop)")
    kept = (
        back.withColumn("url_canon", canonicalize_url(F.col("url")))
        .withColumn("rn", F.row_number().over(Window.partitionBy("url_canon").orderBy("url")))
        .filter(F.col("rn") == 1)
    )
    txt = html_to_text(F.col("html"))
    out = kept.select("url_canon", *[c for c in _metrics_cols(txt)]).orderBy("url_canon")
    out.write.format("noop").mode("overwrite").save()
    lap("canon+window+extract+metrics (noop)")
finally:
    shutil.rmtree(out_dir, ignore_errors=True)

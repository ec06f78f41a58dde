import shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.catalog import load_table
from pyspark.sql import functions as F, Window
from gofeed_spark.queries.web import _html_col, _metrics_cols
from gofeed_spark.operators.html import html_to_text
from gofeed_spark.operators.urls import canonicalize_url
from gofeed_spark.functions.parallel import compute_width
from gofeed_spark.sources import warc as W

spark = get_spark("probe-q135t")
docs = load_table(spark, "/root/repo/.bench_data/sf1.0", "documents")
docs.count()

def urls(frame, extra):
    return frame.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string"), F.lit(extra)).alias("url"),
        F.encode(_html_col(), "utf-8").alias("body"),
    )

crawl = urls(docs, "").unionByName(urls(docs.filter(F.col("doc_id") % 5 == 0), "?utm_src=recrawl"))
out_dir = tempfile.mkdtemp(prefix="prof_q135t_")
try:
    n = crawl.count()
    n_arch = W.archive_count(n, spark.sparkContext.defaultParallelism)
    W.export_warc(crawl, out_dir, n_archives=n_arch, content_type="text/html").collect()
    back = (
        W.read_warc(spark, out_dir + "/*.warc.gz")
        .filter((F.col("http_status") == 200) & F.col("content_type").startswith("text/html"))
        .select("url", F.decode("body", "utf-8").alias("html"))
    )
    txt = html_to_text(F.col("html"))

    def t(label, df):
        vals=[]
        for _ in range(3):
            t0=time.time(); df.write.format("noop").mode("overwrite").save(); vals.append(time.time()-t0)
        print(f"{label:30s} {sorted(vals)[1]:.2f}  (min {min(vals):.2f})", flush=True)

    kept0 = (back.withColumn("url_canon", canonicalize_url(F.col("url")))
        .withColumn("rn", F.row_number().over(Window.partitionBy("url_canon").orderBy("url")))
        .filter(F.col("rn") == 1))
    t("tail as-is", kept0.select("url_canon", *_metrics_cols(txt)).orderBy("url_canon"))

    wide = compute_width(back.withColumn("url_canon", canonicalize_url(F.col("url"))), "url_canon", n=n)
    kept1 = (wide.withColumn("rn", F.row_number().over(Window.partitionBy("url_canon").orderBy("url")))
        .filter(F.col("rn") == 1))
    t("tail width-fixed", kept1.select("url_canon", *_metrics_cols(txt)).orderBy("url_canon"))
finally:
    shutil.rmtree(out_dir, ignore_errors=True)

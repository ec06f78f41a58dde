import sys, time
sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.catalog import load_table
from pyspark.sql import functions as F
from gofeed_spark.queries.web import _html_col, _metrics_cols
from gofeed_spark.operators.html import html_to_text
from gofeed_spark.functions.parallel import parallel_floor

spark = get_spark("probe-cse2")
d = load_table(spark, "/root/repo/.bench_data/sf1.0", "documents")
d.count()

def t(label, df):
    vals=[]
    for _ in range(3):
        t0=time.time(); df.write.format("noop").mode("overwrite").save(); vals.append(time.time()-t0)
    print(f"{label:34s} {sorted(vals)[1]:.2f}  (min {min(vals):.2f})", flush=True)

txt = html_to_text(_html_col())
df_f = parallel_floor(d)
t("floored: txt only", df_f.select("doc_id", txt.alias("t")))
t("floored: 3 metrics inline", df_f.select("doc_id", *_metrics_cols(txt)))
print("floor partitions:", df_f.rdd.getNumPartitions() if False else "n/a")

"""Web-extraction queries: HTML → text main-content extraction (the
WET-generation step, operators/html.py) — standalone (q134) and composed
into the raw-HTML crawl-ingest chain (q135, the q119 shape fed from
RESPONSE records instead of ready text).

The synthetic documents carry no markup, so each query wraps every doc in
a deterministic HTML template (title/heading/comment/style/script/entity
fragments — content that must be KEPT and content that must be DROPPED,
both non-vacuously) built from ONE parts list that renders identically as
a Spark concat and as a DuckDB ``||`` chain, the q84 injected-fixture
convention.  The extraction chain itself is generated into the oracle
from the operator's own stage table (``html_to_text_sql``), so Spark and
DuckDB run the SAME extraction and the results hash-match end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gofeed_spark.operators.html import (
    html_blocks_sql,
    html_text_blocks,
    html_to_text,
    html_to_text_sql,
)
from gofeed_spark.queries.registry import query


def T(spark, sf_dir, name):
    from gofeed_spark.catalog import load_table

    return load_table(spark, sf_dir, name)


# One template, two renderings.  ("lit", s) is a literal fragment;
# ("int", col) an integer column (CAST AS VARCHAR in SQL, .cast string in
# Spark); ("str", col) a string column.  Drop-content: style, comment,
# script.  Keep-content: title, heading, the doc text, an entity-bearing
# paragraph, a nested div.
_H_PARTS = [
    ("lit", "<!DOCTYPE html><html><head><title>Doc "),
    ("int", "doc_id"),
    ("lit", "</title><style>p { color: red; }</style></head><body>"
            "<!-- crawl note for "),
    ("str", "source"),
    ("lit", " --><h1>Doc "),
    ("int", "doc_id"),
    ("lit", "</h1><p>"),
    ("str", "text"),
    ("lit", '</p><script type="text/javascript">var docId = '),
    ("int", "doc_id"),
    ("lit", ";</script><p>Tom &amp; Jerry say 1 &lt; 2 &gt; 0</p>"
            "<div>source: <b>"),
    ("str", "source"),
    ("lit", "</b></div></body></html>"),
]


def _html_col():
    return F.concat(*[
        F.lit(v) if kind == "lit"
        else (F.col(v).cast("string") if kind == "int" else F.col(v))
        for kind, v in _H_PARTS
    ])


def _html_sql() -> str:
    return " || ".join(
        "'" + v.replace("'", "''") + "'" if kind == "lit"
        else (f"CAST({v} AS VARCHAR)" if kind == "int" else v)
        for kind, v in _H_PARTS
    )


def _metrics_sql(txt: str) -> str:
    """n_blocks / n_words / text_md5 over an extracted-text expression —
    the DuckDB twin of `_metrics_cols`."""
    return (
        f"CAST(len({html_blocks_sql(txt)}) AS INT) AS n_blocks,\n"
        f"       CAST(len(string_split_regex(trim({txt}), '\\s+')) AS INT)"
        " AS n_words,\n"
        f"       md5({txt}) AS text_md5"
    )


def _metrics_cols(txt):
    return [
        F.size(html_text_blocks(txt)).alias("n_blocks"),
        F.size(F.split(F.trim(txt), r"\s+")).alias("n_words"),
        F.md5(txt.cast("binary")).alias("text_md5"),
    ]


@query(
    "q134_html_extract",
    oracle=f"""
WITH h AS (SELECT doc_id, {_html_sql()} AS html FROM documents),
x AS (SELECT doc_id, {html_to_text_sql('html')} AS txt FROM h)
SELECT doc_id,
       {_metrics_sql('txt')}
FROM x ORDER BY doc_id
""",
)
def q134(spark, sf_dir):
    """HTML → text extraction (operators/html.py) over every document
    wrapped in the deterministic HTML template: script/style/comment
    content must vanish, title/heading/body/entity content must survive
    with normalized whitespace and block segmentation.  ``text_md5``
    hashes the EXACT extracted string, so the whole regex chain is
    value-checked byte-for-byte against DuckDB running the generated
    twin SQL.  Pure codegen — one projection, no shuffle, no UDF: the
    100 TB posture is a map-only scan."""
    d = T(spark, sf_dir, "documents")
    txt = html_to_text(_html_col())
    return d.select("doc_id", *[c for c in _metrics_cols(txt)]).orderBy("doc_id")


@query(
    "q135_crawl_html_pipeline",
    oracle=rf"""
WITH raw AS (
  SELECT doc_id, {_html_sql()} AS html,
         'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
  UNION ALL
  SELECT doc_id, {_html_sql()} AS html,
         'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
           || '?utm_src=recrawl' AS url
  FROM documents WHERE doc_id % 5 = 0
),
canon AS (
  SELECT html, url,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(url, '([?&])utm_[A-Za-z_]+=[^&]*', '\1', 'g'),
                 '&&+', '&', 'g'),
               '\?&', '?'),
             '[?&]+$', ''),
           '/+(\?|$)', '\1', 'g') AS url_canon
  FROM raw
),
kept AS (
  SELECT url_canon, html,
         ROW_NUMBER() OVER (PARTITION BY url_canon ORDER BY url) AS rn
  FROM canon
),
x AS (SELECT url_canon, {html_to_text_sql('html')} AS txt
      FROM kept WHERE rn = 1)
SELECT url_canon,
       {_metrics_sql('txt')}
FROM x ORDER BY url_canon
""",
)
def q135(spark, sf_dir):
    """The composed RAW-HTML crawl-ingest chain — q119 fed from RESPONSE
    records instead of ready text (VERDICT r13 item 1): the corpus is
    exported as WARC archives whose response bodies are the HTML
    template (content_type text/html, plus tracking-param recrawl
    variants for every 5th doc) → distributed ``read_warc`` → keep only
    HTTP-200 ``text/html`` responses (the content-type dispatch a real
    crawl needs) → HTML → text extraction → URL canonicalization →
    keep-first per canonical URL → block/word/text-hash metrics.
    Catalyst plans everything after the archive scan as one job graph;
    the oracle rebuilds the same HTML, URL chain, dedup window and the
    generated extraction SQL straight from the documents table, so the
    WHOLE path — container round trip, HTTP envelope, content-type
    filter, extraction — is hash-checked."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from gofeed_spark.operators.urls import canonicalize_url
    from gofeed_spark.sources import warc as W

    docs = T(spark, sf_dir, "documents")

    def urls(frame, extra):
        return frame.select(
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
                F.col("doc_id").cast("string"), F.lit(extra),
            ).alias("url"),
            F.encode(_html_col(), "utf-8").alias("body"),
        )

    crawl = urls(docs, "").unionByName(
        urls(docs.filter(F.col("doc_id") % 5 == 0), "?utm_src=recrawl")
    )
    out_dir = tempfile.mkdtemp(prefix="gofeed_q135_")
    try:
        # ~5k records per archive (the q118 rule): read-side parallelism
        # scales with the corpus; 4 at the sf0.01 gate
        n_arch = max(4, -(-crawl.count() // 5000))
        W.export_warc(
            crawl, out_dir, n_archives=n_arch, content_type="text/html"
        ).collect()
        back = (
            W.read_warc(spark, out_dir + "/*.warc.gz")
            .filter(
                (F.col("http_status") == 200)
                & F.col("content_type").startswith("text/html")
            )
            .select("url", F.decode("body", "utf-8").alias("html"))
        )
        kept = (
            back.withColumn("url_canon", canonicalize_url(F.col("url")))
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("url_canon").orderBy("url")
                ),
            )
            .filter(F.col("rn") == 1)
        )
        txt = html_to_text(F.col("html"))
        return (
            kept.select("url_canon", *[c for c in _metrics_cols(txt)])
            .orderBy("url_canon")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


@query(
    "q140_wet_export",
    oracle=f"""
WITH h AS (SELECT doc_id,
                  'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
                  {_html_sql()} AS html
           FROM documents),
x AS (SELECT url, {html_to_text_sql('html')} AS txt FROM h)
SELECT url,
       'conversion' AS rec_type,
       {_metrics_sql('txt')}
FROM x ORDER BY url
""",
)
def q140(spark, sf_dir):
    """WET GENERATION round trip — the job Common Crawl runs to produce
    its .wet sidecars, end to end in this engine: raw-HTML response
    archives → distributed ``read_warc`` → HTML → text extraction →
    re-export as WARC CONVERSION records (the WET layout,
    ``export_warc(rec_type='conversion')``) → read the WET archives back
    → block/word/text-hash metrics.  The oracle rebuilds the template
    HTML and the generated extraction SQL straight from the documents
    table, so BOTH container round trips (HTML .warc in, .wet out and
    back) plus the extraction are hash-checked — the engine can produce
    and consume the WET format, not just read it."""
    import shutil
    import tempfile

    from gofeed_spark.sources import warc as W

    docs = T(spark, sf_dir, "documents")
    crawl = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(_html_col(), "utf-8").alias("body"),
    )
    work = tempfile.mkdtemp(prefix="gofeed_q140_")
    raw_dir, wet_dir = f"{work}/raw", f"{work}/wet"
    try:
        n_arch = max(4, -(-crawl.count() // 5000))
        W.export_warc(
            crawl, raw_dir, n_archives=n_arch, content_type="text/html"
        ).collect()
        extracted = (
            W.read_warc(spark, raw_dir + "/*.warc.gz")
            .filter(
                (F.col("http_status") == 200)
                & F.col("content_type").startswith("text/html")
            )
            .select(
                "url",
                F.encode(
                    html_to_text(F.decode("body", "utf-8")), "utf-8"
                ).alias("body"),
            )
        )
        W.export_warc(
            extracted, wet_dir, n_archives=n_arch,
            content_type="text/plain", rec_type="conversion",
        ).collect()
        back = W.read_warc(spark, wet_dir + "/*.warc.gz", rec_types=("conversion",))
        txt = F.decode("body", "utf-8")
        return (
            back.select(
                "url", "rec_type", *[c for c in _metrics_cols(txt)]
            )
            .orderBy("url")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

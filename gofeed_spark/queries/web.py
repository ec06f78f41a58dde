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
    extract_anchor_hrefs_sql,
    extract_anchor_texts_sql,
    extract_links_sql,
    html_blocks_sql,
    html_text_blocks,
    html_to_text,
    html_to_text_sql,
    resolve_link_sql,
)
from gofeed_spark.queries.registry import query


def T(spark, sf_dir, name):
    from gofeed_spark.catalog import load_table

    return load_table(spark, sf_dir, name)


# One template, two renderings.  ("lit", s) is a literal fragment;
# ("int", col) an integer column (CAST AS VARCHAR in SQL, .cast string in
# Spark); ("inc", col) the column plus one; ("str", col) a string column.
# Drop-content: style, comment, script.  Keep-content: title, heading,
# the doc text, an entity-bearing paragraph, a nested div, anchor text.
# The two <a href> fragments (a root-relative next-doc link and an
# absolute hub link) feed the link-graph queries (q141/q142): the hub has
# no outlinks (dangling mass) and each host's last next-link dangles too.
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
    ("lit", '</b></div><p>see <a href="/doc/'),
    ("inc", "doc_id"),
    ("lit", '">next doc</a> or the <a href="https://hub.example.com/">'
            "crawl hub</a></p></body></html>"),
]


def _html_col():
    out = []
    for kind, v in _H_PARTS:
        if kind == "lit":
            out.append(F.lit(v))
        elif kind == "int":
            out.append(F.col(v).cast("string"))
        elif kind == "inc":
            out.append((F.col(v) + 1).cast("string"))
        else:
            out.append(F.col(v))
    return F.concat(*out)


def _html_sql() -> str:
    frags = []
    for kind, v in _H_PARTS:
        if kind == "lit":
            frags.append("'" + v.replace("'", "''") + "'")
        elif kind == "int":
            frags.append(f"CAST({v} AS VARCHAR)")
        elif kind == "inc":
            frags.append(f"CAST({v} + 1 AS VARCHAR)")
        else:
            frags.append(v)
    return " || ".join(frags)


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
    from gofeed_spark.functions.parallel import parallel_floor

    # the regex-chain extraction is a heavy per-byte pass and the
    # synthetic table is one row group: floor the scan width or the whole
    # chain runs on one core (round-8 rule; 9.0->1.6 s at sf1.0, no-op on
    # well-split warehouse tables and on sub-MiB gate inputs)
    d = parallel_floor(T(spark, sf_dir, "documents"))
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
        n_rec = crawl.count()
        n_arch = W.archive_count(n_rec, spark.sparkContext.defaultParallelism)
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
        # explicit width on the window key: AQE's byte-based coalescing
        # funnels the post-window stage — which carries the WHOLE
        # regex-extraction chain — onto 1-2 reducers (the r17 TW lesson on
        # a derived relation; 25.1->5.9 s at sf1.0).  The window reuses
        # the repartition's distribution, so no extra exchange appears;
        # the n-gate skips the widening at sub-20k-row gate SFs.
        from gofeed_spark.functions.parallel import compute_width

        kept = (
            compute_width(
                back.withColumn("url_canon", canonicalize_url(F.col("url"))),
                "url_canon",
                n=n_rec,
            )
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
        n_arch = W.archive_count(crawl.count(), spark.sparkContext.defaultParallelism)
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


_URL_SQL = (
    "'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)"
)

_EDGES_SQL = f"""
h AS (SELECT doc_id, {_URL_SQL} AS src, {_html_sql()} AS html FROM documents),
hrefs AS (SELECT src, UNNEST({extract_links_sql('html')}) AS href FROM h),
edges_raw AS (SELECT src, {resolve_link_sql('src', 'href')} AS dst FROM hrefs)
"""


@query(
    "q141_link_extract",
    oracle=f"""
WITH {_EDGES_SQL.strip()}
SELECT src, dst FROM edges_raw ORDER BY src, dst
""",
)
def q141(spark, sf_dir):
    """Link extraction — the crawl-FRONTIER step (operators/html.py
    ``extract_links``/``resolve_link``): every page's <a href> values,
    resolved against the page URL (absolute pass-through, root-relative
    join the scheme+host) into (src, dst) edge rows.  This is both the
    frontier a crawler enqueues next and the edge list the link graph
    (q142) ranks.  Pure codegen — regexp_extract_all + explode, no UDF;
    hash-checked against the same extraction in DuckDB."""
    d = T(spark, sf_dir, "documents")
    from gofeed_spark.operators.html import extract_links, resolve_link

    src = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    ).alias("src")
    hrefs = d.select(src, F.explode(extract_links(_html_col())).alias("href"))
    return hrefs.select(
        "src", resolve_link(F.col("src"), F.col("href")).alias("dst")
    ).orderBy("src", "dst")


@query(
    "q142_crawl_pagerank",
    oracle=f"""
WITH {_EDGES_SQL.strip()},
edges AS (SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
          FROM edges_raw GROUP BY 1, 2),
nodes AS (SELECT DISTINCT n FROM (SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges) u),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ncnt FROM nodes),
ow AS (SELECT src, SUM(w) AS W FROM edges GROUP BY src),
r0 AS (SELECT n, 1.0 / nn.ncnt AS r FROM nodes, nn),
c1 AS (SELECT e.dst AS n, SUM(r0.r * e.w / ow.W) AS contrib
       FROM edges e JOIN r0 ON e.src = r0.n JOIN ow ON e.src = ow.src GROUP BY e.dst),
d1 AS (SELECT COALESCE(SUM(r0.r), 0.0) AS dm FROM r0 LEFT JOIN ow ON r0.n = ow.src
       WHERE ow.src IS NULL),
r1 AS (SELECT nodes.n, (1.0 - 0.85) / nn.ncnt + 0.85 * (COALESCE(c1.contrib, 0.0) + d1.dm / nn.ncnt) AS r
       FROM nodes LEFT JOIN c1 ON nodes.n = c1.n, nn, d1),
c2 AS (SELECT e.dst AS n, SUM(r1.r * e.w / ow.W) AS contrib
       FROM edges e JOIN r1 ON e.src = r1.n JOIN ow ON e.src = ow.src GROUP BY e.dst),
d2 AS (SELECT COALESCE(SUM(r1.r), 0.0) AS dm FROM r1 LEFT JOIN ow ON r1.n = ow.src
       WHERE ow.src IS NULL),
r2 AS (SELECT nodes.n, (1.0 - 0.85) / nn.ncnt + 0.85 * (COALESCE(c2.contrib, 0.0) + d2.dm / nn.ncnt) AS r
       FROM nodes LEFT JOIN c2 ON nodes.n = c2.n, nn, d2)
SELECT n AS node, ROUND(r, 6) + 0.0 AS pagerank FROM r2 ORDER BY node
""",
)
def q142(spark, sf_dir):
    """CRAWL-GRAPH PageRank — the full web-centrality chain from raw
    HTML: link extraction (q141's edges) → per-(src,dst) weights →
    2-iteration weighted PageRank (operators/graph.py) over STRING url
    nodes.  The graph has real crawl structure by construction: the hub
    page every doc links to is a dangling node (no outlinks — its mass
    redistributes), and each host's final next-doc link dangles too.
    The oracle composes the generated link-extraction SQL into the q128
    PageRank CTE chain; ROUND(r,6)+0.0 normalizes the grid on both
    sides.  Round-6 boundary margins MEASURED at registration (the q129
    discipline): min distance to the rounding boundary 6.4e-10 absolute
    at sf0.01 / 5.6e-8 at sf0.1, vs ~1e-15 cross-engine float noise —
    ≥6e5× headroom."""
    from gofeed_spark.operators.graph import pagerank
    from gofeed_spark.operators.html import extract_links, resolve_link

    d = T(spark, sf_dir, "documents")
    src = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    ).alias("src")
    hrefs = d.select(src, F.explode(extract_links(_html_col())).alias("href"))
    edges = (
        hrefs.select(
            "src", resolve_link(F.col("src"), F.col("href")).alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
    pr = pagerank(edges, n_iters=2, damping=0.85, weight="w")
    return pr.select(
        "node", (F.round("pagerank", 6) + 0.0).alias("pagerank")
    ).orderBy("node")


# robots fixture: per-host robots.txt derived from the source's numeric
# suffix d = N % 10 — the gofeedbot group disallows /doc/{d} but re-allows
# the longer /doc/{d}{d} (longest-match + tie exercise), while the * group
# disallows everything (group-selection exercise: the specific group must
# win).  src0 publishes NO robots at all (no-robots default = allowed).
_ROBOTS_BODY_SQL = (
    "'# robots' || chr(10) || 'User-agent: gofeedbot' || chr(10) || "
    "'Disallow: /doc/' || d || chr(10) || 'Allow: /doc/' || d || d || chr(10) "
    "|| chr(10) || 'User-agent: *' || chr(10) || 'Disallow: /' || chr(10)"
)


@query(
    "q143_robots_gate",
    oracle=f"""
WITH hosts AS (
  SELECT source || '.example.com' AS host,
         CAST(CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 10 AS VARCHAR) AS d
  FROM (SELECT DISTINCT source FROM documents) s
  WHERE source <> 'src0'
),
robots_src AS (SELECT host, {_ROBOTS_BODY_SQL} AS body FROM hosts),
{{parse}},
urls_src AS (SELECT {_URL_SQL} AS url FROM documents),
{{allowed}}
SELECT url, allowed FROM robots_verdict ORDER BY url
""".format(
        parse=__import__(
            "gofeed_spark.operators.robots", fromlist=["parse_robots_sql"]
        ).parse_robots_sql("robots_src").strip().rstrip(","),
        allowed=__import__(
            "gofeed_spark.operators.robots", fromlist=["robots_allowed_sql"]
        ).robots_allowed_sql("urls_src", "gofeedbot").strip(),
    ),
)
def q143(spark, sf_dir):
    """robots.txt admission gate (operators/robots.py, RFC 9309 subset) —
    the crawl-POLITENESS step between the frontier (q141) and fetching:
    per-host robots bodies parse through the codegen posexplode/window
    chain into rule rows, and every page URL gets an ``allowed`` verdict
    for agent ``gofeedbot``.  The fixture exercises every semantic the
    subset defines: prefix matching (Disallow /doc/{{d}} blocks all ids
    whose decimal string starts with d), LONGEST-match override (Allow
    /doc/{{d}}{{d}} re-admits them), group selection (the * group
    disallows ALL — picking it instead of the gofeedbot group would flip
    every verdict), and the no-robots default (src0 publishes none →
    allowed).  Oracle: the generated parse+admission SQL twins over the
    same fixture."""
    from gofeed_spark.operators.robots import parse_robots, robots_allowed

    docs = T(spark, sf_dir, "documents")
    d = F.pmod(
        F.regexp_extract("source", r"([0-9]+)$", 1).cast("int"), F.lit(10)
    ).cast("string")
    robots_src = (
        docs.select("source").distinct()
        .filter(F.col("source") != "src0")
        .select(
            F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
            F.concat(
                F.lit("# robots\nUser-agent: gofeedbot\nDisallow: /doc/"),
                d, F.lit("\nAllow: /doc/"), d, d,
                F.lit("\n\nUser-agent: *\nDisallow: /\n"),
            ).alias("body"),
        )
    )
    rules = parse_robots(robots_src)
    urls = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    return robots_allowed(urls, rules, "gofeedbot").orderBy("url")


from gofeed_spark.operators.robots import (  # noqa: E402
    parse_robots_sql as _prs,
    robots_allowed_sql as _ras,
)

_Q144_PARSE = _prs("robots_src").strip().rstrip(",")
_Q144_ALLOWED = _ras("urls_src", "gofeedbot").strip()


@query(
    "q144_crawl_curation",
    oracle=rf"""
WITH raw AS (
  SELECT doc_id, {_html_sql()} AS html,
         {_URL_SQL} AS url
  FROM documents
  UNION ALL
  SELECT doc_id, {_html_sql()} AS html,
         {_URL_SQL} || '?utm_src=recrawl' AS url
  FROM documents WHERE doc_id % 5 = 0
),
hosts AS (
  SELECT source || '.example.com' AS host,
         CAST(CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 10 AS VARCHAR) AS d
  FROM (SELECT DISTINCT source FROM documents) s
  WHERE source <> 'src0'
),
robots_src AS (SELECT host, {_ROBOTS_BODY_SQL} AS body FROM hosts),
{_Q144_PARSE},
urls_src AS (SELECT url FROM raw),
{_Q144_ALLOWED},
admitted AS (SELECT r.url, r.html FROM raw r
             JOIN robots_verdict v ON r.url = v.url WHERE v.allowed),
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
  FROM admitted
),
kept AS (
  SELECT url_canon, html,
         ROW_NUMBER() OVER (PARTITION BY url_canon ORDER BY url) AS rn
  FROM canon
),
x AS (SELECT url_canon, {html_to_text_sql('html')} AS txt
      FROM kept WHERE rn = 1)
SELECT url_canon,
       {_metrics_sql('txt')},
       CASE WHEN (LENGTH(txt) - LENGTH(REPLACE(txt, ' ', '')) + 1) >= 5
              AND CAST(LENGTH(REPLACE(txt, ' ', '')) AS DOUBLE)
                  / CAST(LENGTH(txt) - LENGTH(REPLACE(txt, ' ', '')) + 1 AS DOUBLE)
                  BETWEEN 2.0 AND 12.0
            THEN 'ok' ELSE 'low' END AS quality
FROM x ORDER BY url_canon
""",
)
def q144(spark, sf_dir):
    """THE COMPLETE RAW-CRAWL CURATION CHAIN as one declarative job
    graph — every crawl-side operator this round added, composed:
    WARC archives of raw HTML responses (with tracking-param recrawl
    variants) → distributed ``read_warc`` → HTTP-200/text-html dispatch
    → robots.txt ADMISSION for gofeedbot (q143's per-host fixture;
    disallowed fetches drop before any content work — the politeness
    gate where it belongs, upstream of everything) → URL
    canonicalization → keep-first recrawl dedup → HTML→text extraction
    → quality gate features (q38's avg-word-length form over the
    EXTRACTED text) + block/word/text-hash metrics.  Catalyst plans the
    whole thing downstream of the archive scan as one job graph; the
    oracle composes the generated robots + extraction SQL twins with
    the canonical-URL chain, so the END-TO-END pipeline — container,
    envelope, admission, dedup, extraction, quality — is hash-checked
    as a single unit, exactly the job a real crawl-curation user runs."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from gofeed_spark.operators.robots import parse_robots, robots_allowed
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
    d = F.pmod(
        F.regexp_extract("source", r"([0-9]+)$", 1).cast("int"), F.lit(10)
    ).cast("string")
    robots_src = (
        docs.select("source").distinct()
        .filter(F.col("source") != "src0")
        .select(
            F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
            F.concat(
                F.lit("# robots\nUser-agent: gofeedbot\nDisallow: /doc/"),
                d, F.lit("\nAllow: /doc/"), d, d,
                F.lit("\n\nUser-agent: *\nDisallow: /\n"),
            ).alias("body"),
        )
    )
    out_dir = tempfile.mkdtemp(prefix="gofeed_q144_")
    try:
        n_rec = crawl.count()
        n_arch = W.archive_count(n_rec, spark.sparkContext.defaultParallelism)
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
        admitted = (
            robots_allowed(back, parse_robots(robots_src), "gofeedbot")
            .filter(F.col("allowed"))
            .drop("allowed")
        )
        # explicit width on the window key (the q135 fix): the post-window
        # stage carries the whole extraction + quality chain and AQE's
        # byte coalescing would run it 1-2 wide
        from gofeed_spark.functions.parallel import compute_width

        kept = (
            compute_width(
                admitted.withColumn(
                    "url_canon", canonicalize_url(F.col("url"))
                ),
                "url_canon",
                n=n_rec,
            )
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("url_canon").orderBy("url")
                ),
            )
            .filter(F.col("rn") == 1)
        )
        txt = html_to_text(F.col("html"))
        nw = F.length(txt) - F.length(F.regexp_replace(txt, " ", "")) + 1
        awl = (
            F.length(F.regexp_replace(txt, " ", "")).cast("double")
            / nw.cast("double")
        )
        quality = F.when(
            (nw >= 5) & awl.between(2.0, 12.0), "ok"
        ).otherwise("low")
        return (
            kept.select(
                "url_canon",
                *[c for c in _metrics_cols(txt)],
                quality.alias("quality"),
            )
            .orderBy("url_canon")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


# --- q152 WAT generation round trip --------------------------------------------
@query(
    "q152_wat_export",
    oracle=f"""
WITH h AS (SELECT doc_id, {_URL_SQL} AS url, {_html_sql()} AS html FROM documents)
SELECT url,
       'metadata' AS rec_type,
       CAST(200 AS INT) AS http_status,
       CAST(len({extract_links_sql('html')}) AS INT) AS n_links,
       md5(array_to_string({extract_links_sql('html')}, ' ')) AS links_md5
FROM h ORDER BY url
""",
)
def q152(spark, sf_dir):
    """WAT GENERATION round trip — the metadata sidecar of the Common
    Crawl triple, completing it for this engine (WARC ingest q118/q120,
    WET q140, WAT here): raw-HTML response archives → distributed
    ``read_warc`` → per-page metadata record {url, status, ordered href
    list} serialized as JSON → re-export as WARC METADATA records
    (``export_warc(rec_type='metadata', content_type='application/
    json')``) → read the .wat back → parse the JSON payload → flattened
    verdict columns.  Hash-checking the PARSED payload (status, link
    count, md5 of the ordered href list) rather than JSON bytes keeps
    the oracle engine-neutral while still proving the full encode →
    container → decode chain preserves every field; the oracle rebuilds
    the template HTML and link list straight from documents via the
    generated ``extract_links_sql`` twin."""
    import shutil
    import tempfile

    from pyspark.sql import types as T_

    from gofeed_spark.operators.html import extract_links
    from gofeed_spark.sources import warc as W

    docs = T(spark, sf_dir, "documents")
    crawl = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(_html_col(), "utf-8").alias("body"),
    )
    work = tempfile.mkdtemp(prefix="gofeed_q152_")
    raw_dir, wat_dir = f"{work}/raw", f"{work}/wat"
    try:
        n_arch = W.archive_count(crawl.count(), spark.sparkContext.defaultParallelism)
        W.export_warc(
            crawl, raw_dir, n_archives=n_arch, content_type="text/html"
        ).collect()
        meta = (
            W.read_warc(spark, raw_dir + "/*.warc.gz")
            .filter(
                (F.col("http_status") == 200)
                & F.col("content_type").startswith("text/html")
            )
            .select(
                "url",
                F.encode(
                    F.to_json(
                        F.struct(
                            F.col("url").alias("url"),
                            F.col("http_status").alias("status"),
                            extract_links(F.decode("body", "utf-8")).alias("links"),
                        )
                    ),
                    "utf-8",
                ).alias("body"),
            )
        )
        W.export_warc(
            meta, wat_dir, n_archives=n_arch,
            content_type="application/json", rec_type="metadata",
        ).collect()
        back = W.read_warc(spark, wat_dir + "/*.warc.gz", rec_types=("metadata",))
        schema = T_.StructType(
            [
                T_.StructField("url", T_.StringType()),
                T_.StructField("status", T_.IntegerType()),
                T_.StructField("links", T_.ArrayType(T_.StringType())),
            ]
        )
        parsed = back.select(
            "url",
            "rec_type",
            F.from_json(F.decode("body", "utf-8"), schema).alias("wat"),
        )
        return (
            parsed.select(
                "url",
                "rec_type",
                F.col("wat.status").alias("http_status"),
                F.size("wat.links").alias("n_links"),
                F.md5(F.array_join("wat.links", " ").cast("binary")).alias(
                    "links_md5"
                ),
            )
            .orderBy("url")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --- q153 anchor-text aggregation per link target -------------------------------
@query(
    "q153_anchor_text",
    oracle=f"""
WITH h AS (SELECT doc_id, {_URL_SQL} AS src, {_html_sql()} AS html FROM documents),
pairs AS (
  SELECT src,
         UNNEST({extract_anchor_hrefs_sql('html')}) AS href,
         UNNEST({extract_anchor_texts_sql('html')}) AS anchor
  FROM h
),
edges AS (SELECT {resolve_link_sql('src', 'href')} AS dst, anchor FROM pairs)
SELECT dst,
       CAST(COUNT(*) AS INT) AS n_anchors,
       md5(string_agg(anchor, '|' ORDER BY anchor)) AS anchors_md5
FROM edges GROUP BY dst ORDER BY dst
""",
)
def q153(spark, sf_dir):
    """ANCHOR-TEXT aggregation per link target — the classic web training
    signal (anchor text is a human-written description of the TARGET
    page; aggregated per destination it seeds queries/titles/summaries
    for retrieval training): text-anchored links extract as positionally
    zipped (href, anchor) lists from one shared regex (group 1 vs group
    2, so alignment is structural), resolve against the page host, and
    aggregate per destination — anchor count + md5 of the
    '|'-joined SORTED anchor list (sorting makes the aggregate
    order-free on both engines).  The template's two anchors make the
    distribution non-vacuous: every next-doc target carries one
    'next doc' anchor, the hub accumulates one 'crawl hub' anchor per
    page.  Pure codegen extraction, one groupBy — no Python."""
    from gofeed_spark.operators.html import (
        extract_anchor_hrefs,
        extract_anchor_texts,
        resolve_link,
    )

    docs = T(spark, sf_dir, "documents")
    h = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("src"),
        _html_col().alias("html"),
    )
    pairs = h.select(
        "src",
        F.posexplode(extract_anchor_hrefs("html")).alias("pos", "href"),
        extract_anchor_texts("html").alias("__anchors"),
    ).select(
        "src", "href", F.element_at("__anchors", F.col("pos") + 1).alias("anchor")
    )
    edges = pairs.select(
        resolve_link(F.col("src"), F.col("href")).alias("dst"), "anchor"
    )
    return (
        edges.groupBy("dst")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_anchors"),
            F.md5(
                F.concat_ws("|", F.sort_array(F.collect_list("anchor"))).cast(
                    "binary"
                )
            ).alias("anchors_md5"),
        )
        .orderBy("dst")
    )


# --- q154 politeness-aware frontier schedule -----------------------------------
@query(
    "q154_frontier_schedule",
    oracle=r"""
WITH u AS (
  SELECT doc_id,
         'https://www.' || source || '.example.com/docs/'
         || CAST(doc_id AS VARCHAR) AS url
  FROM documents
),
h AS (SELECT doc_id, url,
             regexp_extract(url, '^https?://([^/]+)', 1) AS host
      FROM u),
s AS (SELECT doc_id, url, host,
             ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id, url) AS slot
      FROM h)
SELECT doc_id, url, host, CAST(slot AS INT) AS slot,
       CAST((slot - 1) * 250 AS BIGINT) AS fetch_at_ms,
       CAST(CAST(('0x' || substr(md5(host), 1, 8)) AS BIGINT) % 16 AS INT)
         AS worker
FROM s ORDER BY doc_id
""",
)
def q154(spark, sf_dir):
    """Politeness-aware FRONTIER SCHEDULING (urls.schedule_frontier) —
    the step between robots admission and the fetch pool, completing the
    crawler machinery (frontier q141 → robots q143 → schedule here →
    fetch q118): per-HOST fetch slots (one request per host per 250 ms,
    priority then URL ordering for determinism) and a host-pinned worker
    assignment via the md5-prefix bucket convention (identical in
    codegen, on the driver, and in ANSI SQL — politeness survives
    parallelism with zero cross-worker coordination).  One window
    shuffle partitioned by host; hosts are the crawler's natural
    partition key, so the plan is unchanged at 100 TB."""
    from gofeed_spark.operators.urls import schedule_frontier

    docs = T(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    out = schedule_frontier(
        u, url_col="url", priority_col="doc_id", delay_ms=250, n_workers=16
    )
    return out.select(
        "doc_id", "url", "host", "slot", "fetch_at_ms", "worker"
    ).orderBy("doc_id")


# --- q157 CDX capture index: build, publish, ranged-read fetch ------------------
def _q157_oracle():
    from gofeed_spark.operators.urls import surt_key_sql

    return f"""
WITH h AS (SELECT doc_id, {_URL_SQL} AS url, {_html_sql()} AS html FROM documents)
SELECT {surt_key_sql('url')} AS urlkey,
       url,
       CAST(200 AS INT) AS http_status,
       'text/html' AS mime,
       CAST(octet_length(encode(html)) AS BIGINT) AS n_bytes,
       md5(html) AS digest,
       md5(html) AS fetched_md5
FROM h ORDER BY urlkey, url
"""


@query("q157_cdx_export", oracle=_q157_oracle())
def q157(spark, sf_dir):
    """CDX INDEX round trip — the LAST Common Crawl derivative this
    engine lacked (WARC q118, WET q140, WAT q152, CDX here): raw-HTML
    archives written with per-member offset tracking
    (``export_warc_cdx`` — index rows are a by-product of the write,
    no second scan) → SURT urlkeys (``operators/urls.surt_key``) →
    published as range-partitioned, internally-sorted gzip CDXJ shards
    (``write_cdx`` — Spark's sort machinery IS the index builder) →
    parsed back (``read_cdx``) → every capture re-fetched via a RANGED
    READ of exactly its own gzip member (``fetch_cdx_records`` over
    ``FileSystem.read_bytes_range``, the wayback access pattern).  The
    oracle recomputes urlkey (generated SQL twin), byte length, and the
    body md5 straight from documents: ``fetched_md5 == digest`` being
    hash-checked proves the (filename, offset, length) triples address
    exactly the bytes the writer indexed — the offsets themselves are
    container-dependent and stay out of the output."""
    import shutil
    import tempfile

    from gofeed_spark.operators.urls import surt_key
    from gofeed_spark.sources import warc as W
    from gofeed_spark.sources.cdx import (
        export_warc_cdx,
        fetch_cdx_records,
        read_cdx,
        write_cdx,
    )

    docs = T(spark, sf_dir, "documents")
    crawl = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(_html_col(), "utf-8").alias("body"),
    )
    work = tempfile.mkdtemp(prefix="gofeed_q157_")
    raw_dir, cdx_dir = f"{work}/raw", f"{work}/cdx"
    try:
        n_arch = W.archive_count(crawl.count(), spark.sparkContext.defaultParallelism)
        idx = (
            export_warc_cdx(crawl, raw_dir, n_archives=n_arch)
            .localCheckpoint()  # ONE evaluation: the write is a side effect
        )
        write_cdx(
            idx.withColumn("urlkey", surt_key(F.col("url"))),
            cdx_dir,
            n_shards=4,
        ).collect()
        back = read_cdx(spark, cdx_dir + "/cdx-*.gz")
        fetched = fetch_cdx_records(back)
        out = back.select("urlkey", "url", "digest").join(
            fetched, ["urlkey", "url"]
        )
        return (
            out.select(
                "urlkey",
                "url",
                F.col("status").alias("http_status"),
                "mime",
                "n_bytes",
                "digest",
                "fetched_md5",
            )
            .orderBy("urlkey", "url")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --- q166 recrawl diff over two CDX capture indexes -----------------------------
def _q166_oracle():
    from gofeed_spark.operators.urls import surt_key_sql

    return f"""
WITH a AS (
  SELECT {surt_key_sql('u')} AS k, md5(text) AS digest
  FROM (SELECT {_URL_SQL} AS u, text, doc_id FROM documents)
),
b_base AS (
  SELECT {surt_key_sql('u')} AS k, md5(
           CASE WHEN doc_id % 4 = 0 THEN text || ' v2' ELSE text END
         ) AS digest
  FROM (SELECT {_URL_SQL} AS u, text, doc_id FROM documents)
  WHERE doc_id % 5 <> 0
),
b_new AS (
  SELECT {surt_key_sql('u')} AS k, md5(text) AS digest
  FROM (SELECT {_URL_SQL} || '?v=2' AS u, text, doc_id FROM documents)
  WHERE doc_id % 7 = 0
),
b AS (SELECT * FROM b_base UNION ALL SELECT * FROM b_new)
SELECT COALESCE(a.k, b.k) AS urlkey,
       CASE WHEN a.k IS NULL THEN 'new'
            WHEN b.k IS NULL THEN 'gone'
            WHEN a.digest <> b.digest THEN 'changed'
            ELSE 'same' END AS verdict
FROM a FULL OUTER JOIN b ON a.k = b.k
ORDER BY urlkey
"""


@query("q166_cdx_recrawl_diff", oracle=_q166_oracle())
def q166(spark, sf_dir):
    """RECRAWL DIFF over two CDX capture indexes — the crawl-ops question
    the index layer exists to answer without touching archive bytes:
    crawl A (every doc) and crawl B (every 5th doc gone, every 4th's
    content changed, a ``?v=2`` variant new for every 7th) each export
    through ``export_warc_cdx`` (digests tracked AT WRITE TIME as index
    by-products), then one urlkey full-outer join of the two byte-slim
    indexes classifies every capture as same / changed / gone / new.
    At 100 TB the diff reads two CDX indexes — kilobytes per thousand
    captures — never the archives; the oracle recomputes both crawls'
    digests from documents, so the verdicts hash-check the whole
    digest-at-write + SURT + join chain."""
    import shutil
    import tempfile

    from gofeed_spark.operators.urls import surt_key
    from gofeed_spark.sources import warc as W
    from gofeed_spark.sources.cdx import export_warc_cdx

    docs = T(spark, sf_dir, "documents")

    def url(extra=""):
        return F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"), F.lit(extra),
        )

    crawl_a = docs.select(
        url().alias("url"), F.encode("text", "utf-8").alias("body")
    )
    changed = F.when(
        F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    crawl_b = (
        docs.filter(F.col("doc_id") % 5 != 0)
        .select(url().alias("url"), F.encode(changed, "utf-8").alias("body"))
        .unionByName(
            docs.filter(F.col("doc_id") % 7 == 0).select(
                url("?v=2").alias("url"),
                F.encode("text", "utf-8").alias("body"),
            )
        )
    )
    work = tempfile.mkdtemp(prefix="gofeed_q166_")
    try:
        n_arch = W.archive_count(
            crawl_a.count(), spark.sparkContext.defaultParallelism
        )
        idx_a = (
            export_warc_cdx(
                crawl_a, f"{work}/a", n_archives=n_arch,
                content_type="text/plain",
            )
            .select(surt_key(F.col("url")).alias("k"), "digest")
            .localCheckpoint()
        )
        idx_b = (
            export_warc_cdx(
                crawl_b, f"{work}/b", n_archives=n_arch,
                content_type="text/plain",
            )
            .select(surt_key(F.col("url")).alias("k"), "digest")
            .localCheckpoint()
        )
        a = idx_a.select(F.col("k").alias("ak"), F.col("digest").alias("ad"))
        b = idx_b.select(F.col("k").alias("bk"), F.col("digest").alias("bd"))
        joined = a.join(b, a.ak == b.bk, "full_outer")
        verdict = (
            F.when(F.col("ak").isNull(), "new")
            .when(F.col("bk").isNull(), "gone")
            .when(F.col("ad") != F.col("bd"), "changed")
            .otherwise("same")
        )
        return (
            joined.select(
                F.coalesce("ak", "bk").alias("urlkey"),
                verdict.alias("verdict"),
            )
            .orderBy("urlkey")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --- q172 streaming frontier scheduler ------------------------------------------
def _q172_oracle():
    # identical semantics to q154 — only the TRANSPORT differs (frontier
    # URLs arrive through staged micro-batches instead of one frame); the
    # q161 oracle-reuse convention
    from gofeed_spark.queries.registry import ORACLES

    return ORACLES["q154_frontier_schedule"]


@query("q172_streaming_frontier", oracle=_q172_oracle())
def q172(spark, sf_dir):
    """STREAMING FRONTIER SCHEDULER — q154's ingest form (VERDICT r14
    next-round item 10), closing the last batch-only crawl operator: the
    frontier KEEPS ARRIVING while the crawler runs, and each micro-batch
    gets politeness slots that continue every host's running sequence
    (per-host slot bases folded forward through a hash-bucketed state
    table; within-batch window over the BATCH only — the standing
    schedule never reshuffles) under FROZEN host→worker assignments
    (md5-prefix bucket convention).  Batches are staged
    priority-monotone (doc_id-range files, pinned mtimes — the q138
    recipe), so the accumulated schedule equals the batch scheduler's
    output exactly: the q154 oracle is reused VERBATIM, and hash
    equality proves streaming == batch.  Re-delivered batches skip
    idempotently through both upsert sinks (schedule + bases)."""
    import os
    import shutil
    import tempfile

    from gofeed_spark.operators.urls import StreamingFrontierScheduler
    from gofeed_spark.queries.streaming_q import _await_drained

    docs = T(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://www."),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    work = tempfile.mkdtemp(prefix="gofeed_q172_")
    stage, ckpt = f"{work}/stage", f"{work}/ckpt"
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # priority-monotone staging: file i holds the i-th doc_id range
        # (part index prefixes the name, so listing order = range order)
        u.repartitionByRange(4, "doc_id").write.parquet(stage)
        parts = sorted(f for f in os.listdir(stage) if f.startswith("part-"))
        for i, f in enumerate(parts):
            os.utime(f"{stage}/{f}", (1_000_000_000 + i, 1_000_000_000 + i))
        stream = (
            spark.readStream.schema(u.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        sched = StreamingFrontierScheduler(
            f"{work}/state",
            delay_ms=250,
            n_workers=16,
            url_col="url",
            priority_col="doc_id",
        )
        q = (
            stream.writeStream.option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .foreachBatch(sched)
            .start()
        )
        _await_drained(q, 180)
        return (
            sched.read(spark)
            .select("doc_id", "url", "host", "slot", "fetch_at_ms", "worker")
            .orderBy("doc_id")
            .localCheckpoint()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        shutil.rmtree(work, ignore_errors=True)

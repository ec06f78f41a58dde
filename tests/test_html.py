"""HTML → text extraction (operators/html.py): semantics pinned on
hand-built fixtures (torn/nested markup, entity edges, drop-content
containers) plus the cross-engine dialect contract — Spark (Java regex)
and DuckDB (RE2) must produce byte-identical output for every fixture,
since the oracle runs the generated twin SQL (q134/q135)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from gofeed_spark.operators.html import (
    html_blocks_sql,
    html_text_blocks,
    html_to_text,
    html_to_text_sql,
)

# (html, expected_text) — expected is the block-segmented, trimmed form
CASES = [
    # keep vs drop: title/heading/body survive; style/script/comment die
    (
        '<!DOCTYPE html><html><head><title>T</title><style>p{x:1}</style>'
        '</head><body><!-- note --><h1>H</h1><p>body  text</p>'
        '<script>var x = "<p>fake</p>";</script></body></html>',
        "T\nH\nbody text",
    ),
    # nested markup: inline tags inside a block merge with spaces
    ("<div><p>a <b>bold</b> word</p><p>next</p></div>", "a bold word\nnext"),
    # block segmentation: list items, rows, <br>
    ("<ul><li>one</li><li>two</li></ul><br>tail", "one\ntwo\ntail"),
    ("<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>", "a b\nc"),
    # torn markup: unterminated tag keeps its text; bare < survives
    ("<p unclosed and a < b stray", "<p unclosed and a < b stray"),
    ("before <p", "before <p"),
    # unclosed script drops only the tag (bounded, documented leak)
    ("<script>no close\nbody leaks", "no close\nbody leaks"),
    # comment swallows markup inside it; commented-out script vanishes
    ("<!-- <script>evil()</script> -->kept", "kept"),
    # entities: one decode level, &amp; last, numeric &#39; supported
    (
        "1 &lt; 2 &gt; 0 &quot;q&quot; &#39;a&#39; &apos;b&apos; "
        "x&nbsp;y &amp; z &amp;lt;",
        "1 < 2 > 0 \"q\" 'a' 'b' x y & z &lt;",
    ),
    # whitespace: horizontal runs -> one space, vertical runs -> one \n
    ("a\t \tb\r\n\r\n\n   c", "a b\nc"),
    # case-insensitive tags, self-closing br
    ('<P CLASS="x">UPPER</P><BR/>after', "UPPER\nafter"),
    # plain text passes through (modulo whitespace normalization)
    ("no markup  at\nall", "no markup at\nall"),
    ("", ""),
    # script with attributes; style with newlines inside
    ('<script type="text/javascript">\nvar a=1;\n</script>ok', "ok"),
    ("<style>\nbody { margin: 0; }\n</style>ok", "ok"),
]


def test_extraction_semantics(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "i int, h string"
    )
    got = {
        r.i: r.t
        for r in df.select("i", html_to_text("h").alias("t")).collect()
    }
    for i, (h, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {h!r} -> {got[i]!r} != {want!r}"


def test_cross_engine_dialect_parity(spark):
    """Every fixture must extract BYTE-IDENTICALLY in DuckDB through the
    generated twin SQL — the q134/q135 oracle contract (Java ∩ RE2)."""
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "i int, h string"
    )
    got = {
        r.i: (r.t, r.b)
        for r in df.select(
            "i",
            html_to_text("h").alias("t"),
            html_text_blocks("h").alias("b"),
        ).collect()
    }
    con = duckdb.connect()
    sql_t = html_to_text_sql("?::VARCHAR")
    for i, (h, _) in enumerate(CASES):
        want_t, want_b = con.execute(
            f"WITH x AS (SELECT {sql_t} AS t) "
            f"SELECT t, {html_blocks_sql('t')} FROM x",
            [h],
        ).fetchone()
        assert got[i][0] == want_t, f"case {i} text: {got[i][0]!r} != {want_t!r}"
        assert got[i][1] == want_b, f"case {i} blocks"


def test_blocks_are_nonempty_and_ordered(spark):
    df = spark.createDataFrame(
        [("<p>a</p><p></p><p>b</p>",), ("",)], "h string"
    )
    got = [r.b for r in df.select(html_text_blocks("h").alias("b")).collect()]
    assert got[0] == ["a", "b"]  # empty block dropped, order kept
    assert got[1] == []


def test_extraction_is_pure_codegen(spark):
    """The chain must stay JVM-side: no BatchEvalPython / Python UDF in
    the plan (the hot-path rule) — it is regexp_replace all the way."""
    df = spark.createDataFrame([("<p>x</p>",)], "h string")
    plan = (
        df.select(html_to_text("h").alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_link_extraction_and_resolution(spark):
    """extract_links/resolve_link (the crawl-frontier step): hrefs come
    out in document order; absolute links pass through, root-relative
    and bare-relative join the page's scheme+host; pages without links
    yield empty arrays; the DuckDB twins match byte-for-byte."""
    from gofeed_spark.operators.html import (
        extract_links,
        extract_links_sql,
        resolve_link,
        resolve_link_sql,
    )

    pages = [
        (1, "https://a.example.com/doc/1",
         '<a href="/doc/2">n</a> <A HREF="https://hub.example.com/">h</A> '
         '<a class="x" href="rel/page">r</a>'),
        (2, "https://b.example.com/x", "<p>no links here</p>"),
        (3, "http://c.example.com/y", '<a name="anchor">no href</a>'
            '<a href="/only">one</a>'),
    ]
    df = spark.createDataFrame(pages, "i int, url string, html string")
    got = {
        r.i: r.links
        for r in df.select(
            "i", extract_links("html").alias("links")
        ).collect()
    }
    assert got[1] == ["/doc/2", "https://hub.example.com/", "rel/page"]
    assert got[2] == [] and got[3] == ["/only"]
    resolved = {
        (r.i, r.href): r.dst
        for r in df.select(
            "i", F.explode(extract_links("html")).alias("href"), "url"
        ).select(
            "i", "href", resolve_link(F.col("url"), F.col("href")).alias("dst")
        ).collect()
    }
    assert resolved[(1, "/doc/2")] == "https://a.example.com/doc/2"
    assert resolved[(1, "https://hub.example.com/")] == "https://hub.example.com/"
    assert resolved[(1, "rel/page")] == "https://a.example.com/rel/page"
    assert resolved[(3, "/only")] == "http://c.example.com/only"
    # cross-engine parity of both twins
    import duckdb

    con = duckdb.connect()
    for i, url, html in pages:
        links, = con.execute(
            f"SELECT {extract_links_sql('?::VARCHAR')}", [html]
        ).fetchone()
        assert links == got[i], i
        for href in links:
            dst, = con.execute(
                "WITH p AS (SELECT ?::VARCHAR AS u, ?::VARCHAR AS h) "
                f"SELECT {resolve_link_sql('u', 'h')} FROM p",
                [url, href],
            ).fetchone()
            assert dst == resolved[(i, href)], (i, href)


def test_fuzz_extraction_cross_engine_and_total(spark):
    """Property fuzz (hypothesis): on arbitrary ASCII tag-soup — random
    interleavings of tag fragments, entities, torn markup and text — the
    extraction (a) never throws, (b) produces no well-formed tag in its
    output, (c) normalizes whitespace to the block contract, and (d) is
    BYTE-IDENTICAL in DuckDB through the generated twin SQL.  The dialect
    contract is ASCII-scoped by design (the corpus templates are ASCII);
    this pins it on inputs far nastier than the fixtures."""
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.one_of(
        st.text(
            alphabet="abcZ 19.<>/&;#\"'=\n\t-!",
            min_size=0, max_size=12,
        ),
        st.sampled_from([
            "<p>", "</p>", "<div class='x'>", "</div>", "<br>", "<BR/>",
            "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
            "&amp;", "&lt;", "&nbsp;", "&#39;", "<a href=\"/x\">", "</a>",
            "< notatag", "<p unclosed", "<li>", "</li>", "<h1>", "</h1>",
        ]),
    )
    soup = st.lists(frag, min_size=0, max_size=12).map("".join)

    collected: list[str] = []

    @given(soup)
    @settings(max_examples=120, deadline=None, derandomize=True)
    def gather(s):
        collected.append(s)

    gather()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(collected)], "i int, h string"
    )
    got = {
        r.i: r.t
        for r in df.select("i", html_to_text("h").alias("t")).collect()
    }
    assert len(got) == len(collected)  # (a) total: no row threw
    con = duckdb.connect()
    sql_t = html_to_text_sql("?::VARCHAR")
    tag_re = _re.compile(r"<[!/]?[A-Za-z][^>]*>")
    for i, s in enumerate(collected):
        t = got[i]
        # (b) no surviving tags — scoped to inputs without &lt;/&gt;: the
        # entity stages run AFTER tag-strip by design (decoded entities
        # are displayed text, never re-parsed as markup — the module-doc
        # order), so &lt;ab ... &gt; in the INPUT legitimately assembles a
        # tag-SHAPED substring in the OUTPUT.  Parity (d) still covers
        # those inputs byte-for-byte.
        if "&lt;" not in s and "&gt;" not in s:
            assert not tag_re.search(t), (s, t)
        assert "  " not in t and not t.startswith((" ", "\n")), (s, t)
        assert not t.endswith((" ", "\n")), (s, t)  # (c) normalized
        (want,) = con.execute(f"SELECT {sql_t}", [s]).fetchone()
        assert t == want, (s, t, want)              # (d) twin parity


def test_anchor_extraction_pairs_and_contract(spark):
    from gofeed_spark.operators.html import (
        extract_anchor_hrefs,
        extract_anchor_texts,
    )

    html = (
        '<p><a href="/a">first</a> text <A HREF="https://x.example/">SeCoNd</A>'
        '<a href="/nested"><b>bold</b></a>'        # nested markup: excluded
        "<a href='/single'>single-quoted</a>"      # single-quoted: excluded
        '<a href="/empty"></a>'                    # empty anchor: kept, ""
        "</p>"
    )
    d = spark.createDataFrame([(html,)], "h string")
    row = d.select(
        extract_anchor_hrefs("h").alias("hrefs"),
        extract_anchor_texts("h").alias("anchors"),
    ).collect()[0]
    # positionally aligned; nested-markup and single-quoted anchors excluded
    assert row["hrefs"] == ["/a", "https://x.example/", "/empty"]
    assert row["anchors"] == ["first", "SeCoNd", ""]


def test_entity_decoded_text_may_look_like_markup_but_stays_text(spark):
    """Regression for the r14s2 fuzz find: ``&lt;ab #9"&gt;`` decodes (one
    level, AFTER tag-strip) into the tag-SHAPED text ``<ab #9">`` — which
    must survive as TEXT (entities are displayed content, never re-parsed
    as markup) and stay byte-identical to the DuckDB twin."""
    import duckdb

    from gofeed_spark.operators.html import html_to_text, html_to_text_sql

    s = 'x &lt;ab #9"&gt; y<p>real tag</p>'
    d = spark.createDataFrame([(s,)], "h string")
    t = d.select(html_to_text("h").alias("t")).collect()[0]["t"]
    assert '<ab #9">' in t          # decoded text kept verbatim
    assert "<p>" not in t           # the real tag was stripped
    (want,) = duckdb.connect().execute(
        "SELECT " + html_to_text_sql("?::VARCHAR"), [s]
    ).fetchone()
    assert t == want

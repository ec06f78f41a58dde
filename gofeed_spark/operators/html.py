"""HTML → text main-content extraction — the WET-generation step that
turns raw crawl RESPONSE records (sources/warc.py:108-143 surfaces
``http_status``/``content_type``/``body``) into the plain text every
downstream operator (dedup, quality, tokenize) consumes.  This is the
first operator a raw Common Crawl user needs after ``read_warc``: the
archives Common Crawl ships carry HTML, not ready text (their WET
sidecars are exactly this extraction, precomputed).

Spark-first shape: the whole extraction is ONE chain of
``regexp_replace`` stages over the text column — pure Catalyst
expressions inside whole-stage codegen, no Python in the hot path, no
shuffle, scales linearly with the scan.  The stage table is data
(`_STAGES`), and the SAME table generates the DuckDB oracle SQL
(``html_to_text_sql`` — the q112 generated-SQL precedent), so the
operator is hash-checked end-to-end, not just row-counted.

Dialect contract (the q84 convention): every pattern is restricted to
the Java-regex ∩ RE2 dialect — no backreferences, no lookaround, only
``(?is)`` inline flags, ``\\b``, lazy ``.*?``, and character classes
that mean the same thing in both engines — so Spark (Java regex) and
DuckDB (RE2) produce byte-identical output.

Extraction semantics (document order matters):

1. ``<script>``/``<style>`` elements drop WITH their content (code and
   CSS are not text), then comments ``<!-- -->`` drop — comments go
   second so a commented-out script still vanishes whole.
2. Block-level boundaries (``<br>``, ``<hr>``, and the closing tags of
   p/div/headings/list items/table rows/…) become NEWLINES — the block
   segmentation; every other tag (well-formed, i.e. ``<`` + optional
   ``!``/``/`` + a letter, through the next ``>``) becomes a space.
   A bare ``<`` that does not open a tag (``a < b``) survives as text.
3. The common named entities decode (``&nbsp; &lt; &gt; &quot; &#39;
   &apos;`` then ``&amp;`` LAST — the standard order, so
   double-encoded text like ``&amp;lt;`` decodes exactly one level).
   Numeric character references beyond ``&#39;`` are out of scope for
   a pure-regex chain and pass through verbatim.
4. Whitespace normalizes: horizontal runs collapse to one space,
   newline runs (with surrounding spaces) collapse to ONE newline, and
   the result is trimmed — so the output is trimmed non-empty blocks
   joined by single newlines.

Torn markup degrades safely, never throws: an unterminated tag
(``<p unclosed``) keeps its text tail; an unclosed ``<script>`` drops
only the tag itself (its body leaks as text — a bounded, documented
loss; pinned in tests/test_html.py).

Reference scope note: the reference engine has no text surface; this
module belongs to the added LLM-pipeline surface (SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied strictly in order.  Patterns live in the
# Java ∩ RE2 dialect; replacements contain no Java-replacement specials
# (no ``$`` or ``\\``), so they read literally in both engines.
_STAGES: list[tuple[str, str]] = [
    # 1. containers whose CONTENT drops too
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    # 2a. block boundaries -> newline (the segmentation signal)
    (
        r"(?i)<(?:br|hr)\b[^>]*>|</(?:p|div|h[1-6]|li|ul|ol|tr|table|thead"
        r"|tbody|blockquote|pre|section|article|aside|header|footer|nav"
        r"|dd|dt|figure|figcaption|title|form|option|select|textarea)\s*>",
        "\n",
    ),
    # 2b. every remaining WELL-FORMED tag -> space ("<" + optional !/ +
    # letter ... ">"); a non-tag "<" (e.g. "a < b") survives as text
    (r"(?s)<[!/]?[A-Za-z][^>]*>", " "),
    # 3. named entities; &amp; strictly last (one decode level)
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
    # 4. whitespace normalization: horizontal runs -> one space, any run
    # containing a newline -> one newline, then trim
    (r"[ \t\r\f]+", " "),
    (r"\s*\n\s*", "\n"),
    (r"^\s+|\s+$", ""),
]


def html_to_text(col: Column | str) -> Column:
    """Extracted text of an HTML column: trimmed blocks joined by single
    newlines (see module doc for the exact semantics).  Pure codegen —
    one regexp_replace chain, no UDF, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _STAGES:
        c = F.regexp_replace(c, pat, rep)
    return c


def html_text_blocks(col: Column | str) -> Column:
    """The extraction segmented as an ``array<string>`` of non-empty
    blocks (paragraphs/headings/list items/rows)."""
    return F.array_remove(F.split(html_to_text(col), "\n"), "")


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def html_to_text_sql(expr: str) -> str:
    """The SAME stage chain as DuckDB SQL over ``expr`` — generated from
    `_STAGES`, so the oracle can never drift from the operator (the q112
    generated-SQL convention).  Newline replacements render as
    ``chr(10)``; every pattern is already RE2-valid by the dialect
    contract."""
    out = expr
    for pat, rep in _STAGES:
        rep_sql = "chr(10)" if rep == "\n" else _sql_str(rep)
        out = f"regexp_replace({out}, {_sql_str(pat)}, {rep_sql}, 'g')"
    return out


def html_blocks_sql(expr: str) -> str:
    """DuckDB twin of ``html_text_blocks`` over an already-extracted
    text expression (list of non-empty chr(10)-separated blocks)."""
    return f"list_filter(string_split({expr}, chr(10)), x -> x <> '')"


# --- link extraction (the crawl-frontier / link-graph step) -----------------

# double-quoted href values of <a> tags; same Java ∩ RE2 dialect contract
_HREF_RE = r'(?is)<a\b[^>]*?\bhref\s*=\s*"([^"]*)"'
_HOST_RE = r"^(https?://[^/]+)"


def extract_links(col: Column | str) -> Column:
    """``array<string>`` of raw href values from an HTML column — the
    frontier-generation step of a crawler and the edge source of the
    link graph.  Pure codegen (regexp_extract_all)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_HREF_RE), F.lit(1))


def resolve_link(page_url: Column | str, href: Column | str) -> Column:
    """Resolve an href against its page URL: absolute hrefs pass through,
    root-relative (``/path``) and bare-relative hrefs join the page's
    scheme+host.  (Path-merging of ``../`` is out of scope — crawl
    canonicalization runs downstream via operators/urls.py.)"""
    p = F.col(page_url) if isinstance(page_url, str) else page_url
    h = F.col(href) if isinstance(href, str) else href
    host = F.regexp_extract(p, _HOST_RE, 1)
    return (
        F.when(h.startswith("http://") | h.startswith("https://"), h)
        .when(h.startswith("/"), F.concat(host, h))
        .otherwise(F.concat(host, F.lit("/"), h))
    )


def extract_links_sql(expr: str) -> str:
    """DuckDB twin of ``extract_links`` over an HTML expression."""
    return f"regexp_extract_all({expr}, {_sql_str(_HREF_RE)}, 1)"


_ANCHOR_RE = r'(?is)<a\b[^>]*?\bhref\s*=\s*"([^"]*)"[^>]*>([^<]*)</a'


def extract_anchor_hrefs(col: Column | str) -> Column:
    """href values of TEXT-ANCHORED links (``<a href="...">text</a>`` with
    a markup-free anchor body — the [^<]* contract; nested-markup anchors
    are out of scope, canonicalization handles the rest downstream).
    Positionally zips with ``extract_anchor_texts`` — same regex, group 1
    vs group 2, so the lists always align."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_ANCHOR_RE), F.lit(1))


def extract_anchor_texts(col: Column | str) -> Column:
    """The anchor TEXT of each text-anchored link — the classic web
    training signal (anchor text describes the TARGET page; aggregated
    per destination it is a free human-written summary corpus)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_ANCHOR_RE), F.lit(2))


def extract_anchor_hrefs_sql(expr: str) -> str:
    """DuckDB twin of ``extract_anchor_hrefs``."""
    return f"regexp_extract_all({expr}, {_sql_str(_ANCHOR_RE)}, 1)"


def extract_anchor_texts_sql(expr: str) -> str:
    """DuckDB twin of ``extract_anchor_texts``."""
    return f"regexp_extract_all({expr}, {_sql_str(_ANCHOR_RE)}, 2)"


def resolve_link_sql(page_url: str, href: str) -> str:
    """DuckDB twin of ``resolve_link``."""
    host = f"regexp_extract({page_url}, {_sql_str(_HOST_RE)}, 1)"
    return (
        f"CASE WHEN {href} LIKE 'http://%' OR {href} LIKE 'https://%' THEN {href} "
        f"WHEN {href} LIKE '/%' THEN {host} || {href} "
        f"ELSE {host} || '/' || {href} END"
    )

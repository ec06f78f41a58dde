"""URL hygiene for web-corpus pipelines: canonicalization, domain
extraction, blocklist verdicts — the CCNet/RefinedWeb preprocessing that
runs BEFORE content dedup (URL-level dedup removes the bulk of recrawls
for free, and domain blocklists are the first quality gate).

Everything is regexp/concat column expressions (whole-stage codegen, one
projection pass, no shuffle); patterns stay inside the Java-regex ∩ RE2
dialect so a SQL oracle can mirror them.

Reference scope note: the reference engine (a change-feed poller) has no
URL surface; this module belongs to the added LLM-pipeline surface
(SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form for URL-level dedup: fragment dropped, ``utm_*``
    tracking params stripped (with separator cleanup), scheme+host
    lowercased (path/query case is significant and preserved), trailing
    path slashes removed.  Pure column expressions; apply before
    ``groupBy(url)`` recrawl-dedup or joins against a crawl frontier."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")                          # fragment
    u = F.regexp_replace(u, r"([?&])utm_[A-Za-z_]+=[^&]*", r"$1")  # tracking
    u = F.regexp_replace(u, r"&&+", "&")                          # a=1&&&b=2 (BEFORE ?&)
    u = F.regexp_replace(u, r"\?&", "?")                          # ?&id= -> ?id=
    u = F.regexp_replace(u, r"[?&]+$", "")                        # dangling ? / &
    u = F.regexp_replace(u, r"/+(\?|$)", r"$1")                   # trailing /
    # lowercase ONLY scheme://host — paths and query values are case-significant
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1)
    return F.concat(F.lower(head), u.substr(F.length(head) + 1, F.lit(1 << 30)))


def url_domain(canonical: Column | str) -> Column:
    """Registrable-host shorthand from a CANONICAL url: the host with one
    leading ``www.`` stripped (full public-suffix parsing needs a suffix
    table — out of scope; this matches what per-domain caps key on)."""
    c = F.col(canonical) if isinstance(canonical, str) else canonical
    return F.regexp_extract(c, r"^[a-z][a-z0-9+.-]*://(?:www\.)?([^/:?]+)", 1)


def with_url_verdict(docs, url_col: str = "url", blocklist: tuple = ()) -> "DataFrame":
    """(…, url_canon, domain, blocked): one projection pass adding the
    canonical url, its domain, and a blocklist verdict.  ``blocklist`` is
    a literal IN-list (domain sets are small and ship with the job);
    at warehouse scale pass a broadcast-joined table instead."""
    canon = canonicalize_url(url_col)
    dom = url_domain(canon)
    blocked = dom.isin(*blocklist) if blocklist else F.lit(False)
    return (
        docs.withColumn("url_canon", canon)
        .withColumn("domain", dom)
        .withColumn("blocked", blocked.cast("int"))
    )

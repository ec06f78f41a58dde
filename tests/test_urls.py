"""URL hygiene operators: hand-computed canonicalization cases covering
every rule, plus domain extraction and blocklist verdicts."""

from __future__ import annotations

from gofeed_spark.operators.urls import with_url_verdict


CASES = [
    # (raw, canonical, domain)
    ("HTTPS://WWW.News.Example.COM/a/b/", "https://www.news.example.com/a/b",
     "news.example.com"),
    ("http://example.com/x?utm_source=a&id=3#frag", "http://example.com/x?id=3",
     "example.com"),
    ("http://example.com/x?id=3&utm_campaign=z", "http://example.com/x?id=3",
     "example.com"),
    ("http://example.com/x?utm_only=1", "http://example.com/x", "example.com"),
    ("http://Example.com/CaseKept/Path", "http://example.com/CaseKept/Path",
     "example.com"),
    ("https://a.b.c/", "https://a.b.c", "a.b.c"),
    ("https://host.io/p/?utm_x=1&utm_y=2&q=Z", "https://host.io/p?q=Z",
     "host.io"),
]


def test_canonicalization_rules(spark):
    docs = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)], "doc_id long, url string"
    )
    out = {r.doc_id: (r.url_canon, r.domain)
           for r in with_url_verdict(docs).collect()}
    for i, (_, canon, dom) in enumerate(CASES):
        assert out[i] == (canon, dom), (i, out[i], canon, dom)


def test_blocklist_verdict(spark):
    docs = spark.createDataFrame(
        [(1, "http://spam.site/x"), (2, "http://WWW.Spam.Site/y"),
         (3, "http://fine.site/z")],
        "doc_id long, url string",
    )
    out = {r.doc_id: r.blocked
           for r in with_url_verdict(docs, blocklist=("spam.site",)).collect()}
    assert out == {1: 1, 2: 1, 3: 0}  # www + case variants normalize first


def test_canonical_idempotent(spark):
    docs = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)], "doc_id long, url string"
    )
    once = with_url_verdict(docs).select("doc_id", F_url("url_canon"))
    twice = with_url_verdict(
        once.withColumnRenamed("url_canon", "url"), "url"
    ).select("doc_id", "url_canon")
    a = {r.doc_id: r.url_canon for r in once.collect()}
    b = {r.doc_id: r.url_canon for r in twice.collect()}
    assert a == b


def F_url(c):
    from pyspark.sql import functions as F

    return F.col(c)

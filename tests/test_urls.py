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


def test_streaming_frontier_equals_batch_and_skips_replay(spark, tmp_path):
    """StreamingFrontierScheduler folded over priority-monotone batches
    reproduces schedule_frontier exactly (slots continue per host,
    workers frozen); a re-delivered batch id is an idempotent skip."""
    from pyspark.sql import functions as F

    from gofeed_spark.operators.urls import (
        StreamingFrontierScheduler,
        schedule_frontier,
    )

    urls = spark.range(60).select(
        F.col("id").alias("priority"),
        F.concat(
            F.lit("https://h"),
            (F.col("id") % 5).cast("string"),
            F.lit(".example.com/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
    )
    batch_out = schedule_frontier(urls, delay_ms=100, n_workers=8)
    sched = StreamingFrontierScheduler(
        str(tmp_path / "state"), delay_ms=100, n_workers=8,
        priority_col="priority",
    )
    # three priority-monotone micro-batches
    for i, (lo, hi) in enumerate(((0, 20), (20, 45), (45, 60))):
        sched(urls.filter(f"priority >= {lo} and priority < {hi}"), i)
    got = {
        tuple(r)
        for r in sched.read(spark)
        .select("priority", "url", "host", "slot", "fetch_at_ms", "worker")
        .collect()
    }
    want = {
        tuple(r)
        for r in batch_out.select(
            "priority", "url", "host", "slot", "fetch_at_ms", "worker"
        ).collect()
    }
    assert got == want
    # replayed batch id: both sinks skip, schedule and bases unchanged
    sched(urls.filter("priority >= 45"), 2)
    assert {
        tuple(r)
        for r in sched.read(spark)
        .select("priority", "url", "host", "slot", "fetch_at_ms", "worker")
        .collect()
    } == want
    # a genuinely new batch continues every host's sequence
    more = spark.range(60, 70).select(
        F.col("id").alias("priority"),
        F.concat(
            F.lit("https://h"),
            (F.col("id") % 5).cast("string"),
            F.lit(".example.com/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
    )
    sched(more, 3)
    full = schedule_frontier(urls.unionByName(more), delay_ms=100, n_workers=8)
    assert {
        tuple(r)
        for r in sched.read(spark)
        .select("priority", "url", "host", "slot", "fetch_at_ms", "worker")
        .collect()
    } == {
        tuple(r)
        for r in full.select(
            "priority", "url", "host", "slot", "fetch_at_ms", "worker"
        ).collect()
    }

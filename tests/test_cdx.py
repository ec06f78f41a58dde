"""CDX capture indexing (sources/cdx.py): SURT urlkey twins, indexed
WARC export offsets, sorted-shard publish, ranged-read fetch, and the
error contract on misaddressed ranges."""

from __future__ import annotations

import hashlib
import zlib

import duckdb
import pytest

from pyspark.sql import functions as F

from gofeed_spark.fs import LocalFileSystem
from gofeed_spark.operators.urls import surt_key, surt_key_sql
from gofeed_spark.sources.cdx import (
    CdxError,
    export_warc_cdx,
    fetch_cdx_records,
    fetch_record,
    read_cdx,
    write_cdx,
)
from gofeed_spark.sources.warc import read_warc


SURT_CASES = [
    # (url, expected urlkey)
    ("https://src3.example.com/doc/42", "com,example,src3)/doc/42"),
    ("http://WWW.Example.COM/", "com,example)/"),
    ("https://www.example.com", "com,example)"),          # no path at all
    ("http://a.b.c.example.org:8080/p?q=1", "org,example,c,b,a)/p?q=1"),
    ("https://host.io/Case/Kept?X=Y", "io,host)/Case/Kept?X=Y"),
    ("http://example.com/x#frag", "com,example)/x#frag"),  # canon strips first
]


def test_surt_key_values(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(SURT_CASES)], "i long, url string"
    )
    got = {r.i: r.k for r in df.select("i", surt_key("url").alias("k")).collect()}
    for i, (_, want) in enumerate(SURT_CASES):
        assert got[i] == want, (SURT_CASES[i][0], got[i], want)


def test_surt_sql_twin_parity(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(SURT_CASES)], "i long, url string"
    )
    got = {r.i: r.k for r in df.select("i", surt_key("url").alias("k")).collect()}
    con = duckdb.connect()
    for i, (u, _) in enumerate(SURT_CASES):
        (dk,) = con.execute(
            f"SELECT {surt_key_sql('url')} FROM (SELECT ? AS url)", [u]
        ).fetchone()
        assert dk == got[i], (u, dk, got[i])


@pytest.fixture()
def corpus(spark):
    rows = [
        (f"https://s{i % 3}.example.com/doc/{i}", f"payload {i} " + "x" * i)
        for i in range(17)
    ]
    return spark.createDataFrame(rows, "url string, body string"), rows


def test_export_offsets_fetch_roundtrip(spark, corpus, tmp_path):
    df, rows = corpus
    out = str(tmp_path / "raw")
    idx = export_warc_cdx(df, out, n_archives=3).localCheckpoint()
    got = idx.collect()
    assert len(got) == len(rows)
    fs = LocalFileSystem()
    by_url = {u: b for u, b in rows}
    for r in got:
        rec_type, url, status, mime, body = fetch_record(
            fs, r.filename, r.offset, r.length
        )
        assert (rec_type, status, mime) == ("response", 200, "text/html")
        assert url == r.url
        assert body.decode() == by_url[r.url]
        assert hashlib.md5(body).hexdigest() == r.digest
    # members tile each archive exactly: offsets are disjoint + complete
    import collections, os

    per_file = collections.defaultdict(list)
    for r in got:
        per_file[r.filename].append((r.offset, r.length))
    for fn, spans in per_file.items():
        spans.sort()
        pos = 0
        for off, ln in spans:
            assert off == pos
            pos += ln
        assert pos == os.path.getsize(fn)


def test_fetch_matches_full_scan(spark, corpus, tmp_path):
    df, rows = corpus
    out = str(tmp_path / "raw")
    idx = export_warc_cdx(df, out, n_archives=3).localCheckpoint()
    cdx = idx.withColumn("urlkey", surt_key(F.col("url")))
    fetched = {
        r.url: (r.status, r.n_bytes, r.fetched_md5)
        for r in fetch_cdx_records(cdx).collect()
    }
    scan = {
        r.url: (r.http_status, len(bytes(r.body)), hashlib.md5(bytes(r.body)).hexdigest())
        for r in read_warc(spark, out + "/*.warc.gz").collect()
    }
    assert fetched == scan


def test_write_cdx_sorted_shards(spark, corpus, tmp_path):
    df, _rows = corpus
    raw, cd = str(tmp_path / "raw"), str(tmp_path / "cdx")
    idx = export_warc_cdx(df, raw, n_archives=3).localCheckpoint()
    cdx = idx.withColumn("urlkey", surt_key(F.col("url")))
    shards = sorted(
        r.shard for r in write_cdx(cdx, cd, n_shards=4).collect()
    )
    # concatenating shards IN FILE-NAME ORDER yields a globally sorted index
    keys = []
    for s in shards:
        raw_b = LocalFileSystem().read_bytes(s)
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        for line in (d.decompress(raw_b) + d.flush()).decode().splitlines():
            keys.append(line.split(" ", 1)[0])
    assert keys == sorted(keys) and len(keys) == 17
    # and read_cdx parses every field back
    back = read_cdx(spark, cd + "/cdx-*.gz")
    assert back.count() == 17
    one = back.orderBy("urlkey").first()
    assert one.timestamp == "20000101000000" and one.status == 200
    assert one.mime == "text/html" and one.length > 0 and one.offset >= 0


def test_fetch_record_misaddressed_range_raises(spark, corpus, tmp_path):
    df, _rows = corpus
    out = str(tmp_path / "raw")
    r = export_warc_cdx(df, out, n_archives=1).localCheckpoint().first()
    fs = LocalFileSystem()
    with pytest.raises(CdxError):
        fetch_record(fs, r.filename, r.offset + 1, r.length)  # mid-member
    with pytest.raises(CdxError):
        fetch_record(fs, r.filename, r.offset, r.length - 1)  # truncated


def test_read_bytes_range_default_matches_seek(tmp_path):
    p = str(tmp_path / "blob.bin")
    data = bytes(range(256)) * 5
    fs = LocalFileSystem()
    fs.put_bytes(p, data)
    # the seam default (whole read + slice) must equal the seeked read
    from gofeed_spark.fs import FileSystem

    assert fs.read_bytes_range(p, 300, 77) == data[300:377]
    assert FileSystem.read_bytes_range(fs, p, 300, 77) == data[300:377]
    assert fs.read_bytes_range(p, len(data) - 5, 100) == data[-5:]


def test_export_more_archives_than_rows(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://a.example.com/1", "one")], "url string, body string"
    )
    out = str(tmp_path / "raw")
    idx = export_warc_cdx(df, out, n_archives=8).localCheckpoint()
    rows = idx.collect()
    assert len(rows) == 1  # empty partitions contribute no index rows
    fs = LocalFileSystem()
    _t, url, _s, _m, body = fetch_record(
        fs, rows[0].filename, rows[0].offset, rows[0].length
    )
    assert (url, body) == ("https://a.example.com/1", b"one")


def test_publish_and_lookup_random_access(spark, corpus, tmp_path):
    from gofeed_spark.sources.cdx import fetch_record, lookup_cdx, publish_cdx

    df, rows = corpus
    raw, cd = str(tmp_path / "raw"), str(tmp_path / "cdx")
    idx = export_warc_cdx(df, raw, n_archives=3).localCheckpoint()
    cdx = idx.withColumn("urlkey", surt_key(F.col("url")))
    index = publish_cdx(cdx, cd, n_shards=4)
    assert [e["shard"] for e in index] == sorted(e["shard"] for e in index)
    assert sum(e["n_lines"] for e in index) == len(rows)
    # every capture resolves through index -> shard -> bisect -> ranged GET
    fs = LocalFileSystem()
    by_url = dict(rows)
    for r in cdx.select("urlkey", "url").collect():
        hits = lookup_cdx(cd, r.urlkey)
        assert len(hits) == 1 and hits[0]["url"] == r.url
        _t, url, _s, _m, body = fetch_record(
            fs, hits[0]["filename"], hits[0]["offset"], hits[0]["length"]
        )
        assert url == r.url and body.decode() == by_url[r.url]
    # a key outside every shard range misses cleanly
    assert lookup_cdx(cd, "zzz,nowhere)/x") == []
    assert lookup_cdx(cd, "aaa)/x") == []

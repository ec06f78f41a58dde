"""WARC container (sources/warc.py): record grammar, gzip-member layout,
HTTP envelope stripping, WET conversion records — and the distributed
export → read round trip."""

from __future__ import annotations

import pytest

from gofeed_spark.sources.warc import (
    WarcError,
    _gunzip_multistream,
    export_warc,
    parse_warc,
    read_warc,
    warc_bytes,
    write_warc,
)
from tests.conftest import rows


RECS = [
    {"rec_type": "warcinfo", "content_type": "application/warc-fields",
     "body": b"software: gofeed_spark\r\n"},
    {"rec_type": "request", "url": "http://a.example/x",
     "content_type": "application/http; msgtype=request",
     "body": b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n"},
    {"rec_type": "response", "url": "http://a.example/x",
     "date": "2024-01-02T03:04:05Z", "content_type": "text/html",
     "http_status": 404, "body": b"<html>nope</html>"},
    {"rec_type": "conversion", "url": "http://a.example/x",
     "content_type": "text/plain", "body": "extracted \xe9 text".encode()},
]


@pytest.mark.parametrize("compress", [True, False], ids=["gz", "plain"])
def test_roundtrip_all_record_types(compress):
    out = parse_warc("f", warc_bytes(RECS, compress=compress))
    assert [r[2] for r in out] == ["warcinfo", "request", "response", "conversion"]
    _a, _i, t, url, date, status, ctype, body = out[2]
    assert (url, date, status) == ("http://a.example/x", "2024-01-02T03:04:05Z", 404)
    assert ctype == "text/html" and body == b"<html>nope</html>"
    assert out[3][7] == "extracted \xe9 text".encode()
    # body bytes are arbitrary: CRLFs inside payloads must not split records
    tricky = [{"rec_type": "response", "url": "u", "content_type": "x",
               "body": b"\r\n\r\nWARC/1.0\r\n\r\n binary-looking \x00\xff"}]
    got = parse_warc("f", warc_bytes(tricky, compress=compress))
    assert len(got) == 1 and got[0][7] == tricky[0]["body"]


def test_gzip_members_are_individually_framed():
    blob = warc_bytes(RECS, compress=True)
    # standard layout: one gzip member per record → N magic headers
    assert blob.count(b"\x1f\x8b\x08") >= len(RECS)
    assert _gunzip_multistream(blob) == warc_bytes(RECS, compress=False)


def test_error_paths(tmp_path):
    with pytest.raises(WarcError):
        parse_warc("f", b"HTTP/1.1 200 OK\r\n\r\nnot warc")
    plain = warc_bytes(RECS, compress=False)
    with pytest.raises(WarcError):
        parse_warc("f", plain[: len(plain) // 2])  # torn payload
    with pytest.raises(WarcError):
        _gunzip_multistream(b"\x1f\x8b\x08 corrupt member")


def test_distributed_export_read_roundtrip(spark, tmp_path):
    docs = spark.range(200).selectExpr(
        "concat('https://s', id % 5, '.example.com/doc/', id) AS url",
        "encode(concat('document body number ', id), 'utf-8') AS body",
    )
    out_dir = str(tmp_path / "warc_out")
    manifest = export_warc(docs, out_dir, n_archives=4).collect()
    written = {r.archive: r.n_records for r in manifest if r.n_records}
    assert sum(written.values()) == 200
    assert len(written) >= 2  # genuinely spread over multiple archives
    back = read_warc(spark, out_dir + "/*.warc.gz")
    got = rows(
        back.selectExpr("url", "rec_type", "http_status", "decode(body, 'utf-8') AS text"),
        "url", "rec_type", "http_status", "text",
    )
    expect = {
        (f"https://s{i % 5}.example.com/doc/{i}", "response", 200,
         f"document body number {i}")
        for i in range(200)
    }
    assert got == expect
    # rec_types filter: nothing comes back when only warcinfo is requested
    assert read_warc(spark, out_dir + "/*.warc.gz", rec_types=("warcinfo",)).count() == 0


def test_write_warc_file_roundtrip(tmp_path):
    p = write_warc(RECS, str(tmp_path / "one.warc.gz"))
    data = open(p, "rb").read()
    assert [r[2] for r in parse_warc(p, data)] == [
        "warcinfo", "request", "response", "conversion",
    ]


def test_lf_header_records_with_crlf_in_payload():
    """LF-terminated WARC headers (the fallback the parser supports) must
    not lose framing to a CRLFCRLF that appears LATER inside a payload
    (round-10 review finding: the CRLF terminator was preferred even when
    the LF one came first)."""
    body = b"pre\r\n\r\npost"
    rec = (
        b"WARC/1.0\nWARC-Type: conversion\nWARC-Target-URI: http://u/\n"
        b"Content-Type: text/plain\nContent-Length: %d\n\n" % len(body)
    ) + body + b"\n\n"
    rows_ = parse_warc("f", rec)
    assert len(rows_) == 1
    assert rows_[0][2] == "conversion" and rows_[0][7] == body

    # LF WARC headers around a CRLF HTTP envelope: status must survive
    payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<b>x</b>"
    rec2 = (
        b"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://u/\n"
        b"Content-Type: application/http; msgtype=response\n"
        b"Content-Length: %d\n\n" % len(payload)
    ) + payload + b"\n\n"
    rows2 = parse_warc("f", rec2)
    assert len(rows2) == 1
    _a, _i, t, url, _d, status, ctype, body2 = rows2[0]
    assert (t, status, ctype, body2) == ("response", 200, "text/html", b"<b>x</b>")


def test_wet_export_roundtrip(spark, tmp_path):
    """rec_type='conversion' writes the WET layout: bare extracted-text
    records, no HTTP envelope — and they read back as conversions."""
    docs = spark.range(30).selectExpr(
        "concat('https://w.example/', id) AS url",
        "encode(concat('wet text ', id), 'utf-8') AS body",
    )
    out_dir = str(tmp_path / "wet_out")
    export_warc(docs, out_dir, n_archives=2, rec_type="conversion").collect()
    back = read_warc(spark, out_dir + "/*.warc.gz")
    got = rows(
        back.selectExpr("url", "rec_type", "http_status", "decode(body,'utf-8') AS t"),
        "url", "rec_type", "http_status", "t",
    )
    assert got == {
        (f"https://w.example/{i}", "conversion", None, f"wet text {i}")
        for i in range(30)
    }

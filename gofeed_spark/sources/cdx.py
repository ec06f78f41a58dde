"""CDX capture indexing — the third Common Crawl derivative (WARC q118,
WET q140, WAT q152, CDX here): every WARC record gets an index line
`urlkey timestamp {json}` (the CDXJ layout) whose (filename, offset,
length) triple addresses the record's own gzip member inside its
archive, so a consumer fetches ONE capture with a ranged read instead of
scanning archives — the wayback-machine access pattern.

Spark-first decomposition:
- ``export_warc_cdx`` — the indexed write: each task serializes its
  partition as one archive (the ``export_warc`` layout, one gzip member
  per record) while tracking member offsets, PUTs the archive through
  the filesystem seam, and RETURNS one row per record (url, filename,
  offset, length, digest, mime, status).  Index rows are a by-product of
  the write — no second scan over the corpus.
- ``write_cdx`` — publishes the index as gzip CDXJ shards that are
  globally range-partitioned and internally sorted by urlkey
  (``repartitionByRange`` + ``sortWithinPartitions`` — Spark's sort
  machinery IS the index builder), the layout CDX binary search needs.
- ``read_cdx`` / ``fetch_cdx_records`` — the consumer half: parse CDXJ
  lines back to typed rows, then fetch+verify each addressed record via
  ``FileSystem.read_bytes_range`` (HTTP Range on an object store) and
  per-member gunzip.

Reference scope note: the reference engine has no archive surface; this
module belongs to the added LLM-pipeline surface (SURVEY.md §2.E), built
from the public CDX/CDXJ conventions (pywb/OpenWayback docs) and ISO
28500 framing.  Digest is md5 hex of the record BODY (content bytes,
pre-HTTP-envelope) — the algorithm is engine-convention (Common Crawl
ships sha1-base32); md5 is what both verification engines compute.
"""

from __future__ import annotations

import hashlib
import json
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofeed_spark.sources.warc import (
    WarcError,
    _parse_records,
    _split_http,
    member_bytes,
)

#: fixed capture timestamp (the engine is clock-free in tests; a real
#: crawl passes fetch time through ``timestamp_col``).
DEFAULT_TS = "20000101000000"

CDX_FIELDS = (
    "url string, filename string, offset long, length long, "
    "digest string, mime string, status int"
)


class CdxError(ValueError):
    pass


def export_warc_cdx(
    docs: DataFrame,
    out_dir: str,
    url_col: str = "url",
    body_col: str = "body",
    n_archives: int = 8,
    content_type: str = "text/html",
    compress: bool = True,
    rec_type: str = "response",
) -> DataFrame:
    """Distributed corpus → WARC archives + per-record index rows.

    Same archive layout as ``export_warc`` (one gzip member per record,
    one archive per task, PUT through the driver-resolved filesystem
    seam), but each task also tracks every member's (offset, length) as
    it serializes and returns one row PER RECORD instead of per archive.
    The caller typically pins the result (``localCheckpoint``) — it is
    both the write receipt and the raw CDX index.

    Cluster posture: index rows are a few dozen bytes per record —
    O(records) but byte-slim, the same scale as any per-doc metric
    column; they shuffle fine at 100 TB where the archives themselves
    never move again."""
    import pandas as pd

    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(out_dir)  # resolved on the DRIVER, pickled to tasks
    fs.makedirs(out_dir)
    df = docs.select(url_col, body_col).repartition(max(1, n_archives))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs = []
        for pdf in batches:
            for url, body in zip(pdf[url_col], pdf[body_col]):
                b = bytes(body) if not isinstance(body, str) else body.encode()
                rec = {
                    "rec_type": rec_type,
                    "url": str(url),
                    "content_type": content_type,
                    "body": b,
                }
                if rec_type == "response":
                    rec["http_status"] = 200
                recs.append(rec)
        if not recs:
            yield pd.DataFrame(
                {
                    "url": pd.Series([], dtype=object),
                    "filename": pd.Series([], dtype=object),
                    "offset": pd.Series([], dtype="int64"),
                    "length": pd.Series([], dtype="int64"),
                    "digest": pd.Series([], dtype=object),
                    "mime": pd.Series([], dtype=object),
                    "status": pd.Series([], dtype="int32"),
                }
            )
            return
        ext = ".warc.gz" if compress else ".warc"
        path = fs.join(out_dir, f"part-{pid:05d}{ext}")
        out = bytearray()
        rows = []
        for i, rec in enumerate(recs):
            member = member_bytes(rec, i, compress)
            rows.append(
                (
                    rec["url"],
                    path,
                    len(out),
                    len(member),
                    hashlib.md5(rec["body"]).hexdigest(),
                    content_type,
                    int(rec.get("http_status", 0)),
                )
            )
            out += member
        fs.put_bytes(path, bytes(out))
        yield pd.DataFrame(
            rows,
            columns=[
                "url", "filename", "offset", "length",
                "digest", "mime", "status",
            ],
        )

    return df.mapInPandas(run, CDX_FIELDS)


def write_cdx(
    cdx: DataFrame,
    out_dir: str,
    n_shards: int = 4,
    urlkey_col: str = "urlkey",
    timestamp: str = DEFAULT_TS,
) -> DataFrame:
    """Index rows → gzip CDXJ shards (`cdx-NNNNN.gz`), globally
    range-partitioned by urlkey and sorted inside each shard — shard
    order IS key order, so a lookup binary-searches one shard and a
    domain scan reads a contiguous shard run (the Common Crawl
    cc-index layout).  Returns (shard, n_lines) per written file; the
    caller materializes to run the write."""
    import pandas as pd

    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(out_dir)
    fs.makedirs(out_dir)
    cols = ["url", "filename", "offset", "length", "digest", "mime", "status"]
    slim = cdx.select(urlkey_col, *cols)
    parts = (
        slim.repartitionByRange(max(1, n_shards), F.col(urlkey_col))
        .sortWithinPartitions(urlkey_col, "url")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        lines = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                blob = {
                    "url": row.url,
                    "mime": row.mime,
                    "status": int(row.status),
                    "digest": row.digest,
                    "length": int(row.length),
                    "offset": int(row.offset),
                    "filename": row.filename,
                }
                lines.append(
                    f"{getattr(row, urlkey_col)} {timestamp} "
                    + json.dumps(blob, sort_keys=True)
                )
        if not lines:
            yield pd.DataFrame(
                {
                    "shard": pd.Series([], dtype=object),
                    "n_lines": pd.Series([], dtype="int64"),
                }
            )
            return
        path = fs.join(out_dir, f"cdx-{pid:05d}.gz")
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        data = "\n".join(lines).encode() + b"\n"
        fs.put_bytes(path, co.compress(data) + co.flush())
        yield pd.DataFrame({"shard": [path], "n_lines": [len(lines)]})

    return parts.mapInPandas(run, "shard string, n_lines long")


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ shards → typed rows (urlkey, timestamp, url, filename,
    offset, length, digest, mime, status).  ``spark.read.text``
    decompresses .gz line files natively; the JSON blob parses with a
    fixed schema (codegen ``from_json``, no Python)."""
    lines = spark.read.text(path)
    first = F.split(F.col("value"), " ", 3)
    schema = (
        "url string, mime string, status int, digest string, "
        "length long, offset long, filename string"
    )
    j = F.from_json(first.getItem(2), schema)
    return lines.select(
        first.getItem(0).alias("urlkey"),
        first.getItem(1).alias("timestamp"),
        j.getField("url").alias("url"),
        j.getField("filename").alias("filename"),
        j.getField("offset").alias("offset"),
        j.getField("length").alias("length"),
        j.getField("digest").alias("digest"),
        j.getField("mime").alias("mime"),
        j.getField("status").alias("status"),
    )


def fetch_record(fs, filename: str, offset: int, length: int) -> tuple:
    """ONE capture via a ranged read — the pure worker kernel: slice the
    member, gunzip it if compressed, parse the single WARC record,
    unwrap the HTTP envelope.  Returns (rec_type, url, status, mime,
    body).  Raises ``CdxError`` on a range that is not one well-formed
    member (a wrong offset surfaces loudly, never as silent junk)."""
    raw = fs.read_bytes_range(filename, int(offset), int(length))
    if len(raw) < length:
        raise CdxError(
            f"short ranged read: {len(raw)} < {length} at {filename}:{offset}"
        )
    if raw[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            raw = d.decompress(raw) + d.flush()
        except zlib.error as exc:
            raise CdxError(f"corrupt member at {filename}:{offset}: {exc}") from exc
        if not d.eof:  # zlib tolerates a truncated trailer; the index must not
            raise CdxError(f"truncated member at {filename}:{offset}")
    try:
        parsed = list(_parse_records(raw))
    except WarcError as exc:
        raise CdxError(f"bad member at {filename}:{offset}: {exc}") from exc
    if len(parsed) != 1:
        raise CdxError(
            f"range at {filename}:{offset} holds {len(parsed)} records, not 1"
        )
    headers, payload = parsed[0]
    rec_type = headers.get("warc-type", "")
    url = headers.get("warc-target-uri", "")
    ctype = headers.get("content-type", "")
    status, body = None, payload
    if rec_type == "response" and "msgtype=response" in ctype.replace(" ", ""):
        status, http_ctype, body = _split_http(payload)
        if http_ctype is not None:
            ctype = http_ctype
    return rec_type, url, status, ctype, body


def fetch_cdx_records(cdx: DataFrame, base: str | None = None) -> DataFrame:
    """Distributed ranged-read fetch of every capture an index frame
    addresses: (urlkey, url, status, mime, n_bytes, fetched_md5) — the
    md5 is computed over the FETCHED body, so equality with the index's
    write-time ``digest`` proves the (filename, offset, length) triples
    address exactly the bytes the writer indexed.

    ``base``: a path on the archives' filesystem — the backend is
    resolved DRIVER-side from it and closed over (the ``export_warc``
    posture, required for test-registered schemes); default resolves
    per-task from each filename (fine for POSIX / natively-registered
    executor schemes).  Rows sort by (filename, offset) inside each
    Arrow batch so a local backend reads each archive forward."""
    import pandas as pd

    closed_fs = None
    if base is not None:
        from gofeed_spark.fs import get_filesystem

        closed_fs = get_filesystem(base)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gofeed_spark.fs import get_filesystem as gfs

        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["filename", "offset"])
            rows = []
            for row in pdf.itertuples(index=False):
                fs = closed_fs if closed_fs is not None else gfs(row.filename)
                _rt, url, status, mime, body = fetch_record(
                    fs, row.filename, row.offset, row.length
                )
                rows.append(
                    (
                        row.urlkey,
                        url,
                        -1 if status is None else int(status),
                        mime or "",
                        len(body),
                        hashlib.md5(body).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "urlkey", "url", "status", "mime", "n_bytes", "fetched_md5",
                ],
            )

    out_schema = (
        "urlkey string, url string, status int, mime string, "
        "n_bytes long, fetched_md5 string"
    )
    slim = cdx.select("urlkey", "filename", "offset", "length")
    return slim.mapInPandas(run, out_schema)


def publish_cdx(
    cdx: DataFrame,
    out_dir: str,
    n_shards: int = 4,
    urlkey_col: str = "urlkey",
    timestamp: str = DEFAULT_TS,
) -> list[dict]:
    """``write_cdx`` plus a shard-range index: runs the sorted-shard write,
    then publishes ``_cdx_index.json`` mapping each shard to its (min, max)
    urlkey — the random-access companion (one driver-side PUT of an
    n_shards-row receipt; the shards themselves never re-read).  Returns
    the receipt rows."""
    from gofeed_spark.fs import get_filesystem

    receipt = write_cdx(
        cdx, out_dir, n_shards=n_shards, urlkey_col=urlkey_col,
        timestamp=timestamp,
    ).collect()
    fs = get_filesystem(out_dir)
    index = []
    for row in sorted(receipt, key=lambda r: r.shard):
        raw = fs.read_bytes(row.shard)
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        lines = (d.decompress(raw) + d.flush()).decode().splitlines()
        index.append(
            {
                "shard": row.shard,
                "n_lines": int(row.n_lines),
                "min_key": lines[0].split(" ", 1)[0],
                "max_key": lines[-1].split(" ", 1)[0],
            }
        )
    fs.put_bytes(
        fs.join(out_dir, "_cdx_index.json"),
        json.dumps(index, indent=1).encode(),
    )
    return index


def lookup_cdx(out_dir: str, urlkey: str) -> list[dict]:
    """Random-access capture lookup — the wayback GET path, NO Spark job:
    one GET of ``_cdx_index.json`` picks the shard whose [min, max] range
    covers the key (shards are range-partitioned and sorted, so at most
    one shard matches), one GET + gunzip of that shard, then a bisect
    over its sorted lines.  Returns the parsed CDXJ records (urlkey,
    timestamp, url, digest, mime, status, filename, offset, length) —
    feed (filename, offset, length) to :func:`fetch_record` for the
    capture bytes (one ranged GET).  Three I/Os per lookup at any corpus
    size."""
    import bisect

    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(out_dir)
    idx_path = fs.join(out_dir, "_cdx_index.json")
    if not fs.exists(idx_path):
        raise CdxError(f"no _cdx_index.json at {out_dir} (publish_cdx writes it)")
    index = json.loads(fs.read_bytes(idx_path))
    shard = next(
        (e for e in index if e["min_key"] <= urlkey <= e["max_key"]), None
    )
    if shard is None:
        return []
    raw = fs.read_bytes(shard["shard"])
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    lines = (d.decompress(raw) + d.flush()).decode().splitlines()
    keys = [ln.split(" ", 1)[0] for ln in lines]
    lo = bisect.bisect_left(keys, urlkey)
    out = []
    for i in range(lo, len(keys)):
        if keys[i] != urlkey:
            break
        key, ts, blob = lines[i].split(" ", 2)
        rec = json.loads(blob)
        rec.update({"urlkey": key, "timestamp": ts})
        out.append(rec)
    return out

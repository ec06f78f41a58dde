"""WARC (ISO 28500 / WARC 1.0-1.1) ingestion — the container format
web-scale corpora actually arrive in (Common Crawl's .warc/.wet files).

- ``read_warc``: distributed reader.  Each archive file becomes one
  input row via Spark's ``binaryFile`` source and parses INSIDE an Arrow
  ``mapInPandas`` worker (records in a WARC are not line-splittable —
  payloads carry arbitrary bytes and gzip members span them — so
  file-granular parallelism is the correct unit, exactly how Common
  Crawl shards parallelize: many ~1 GB files, one task each).  Handles
  plain and gzip archives (per-record multi-member gzip, the standard
  layout, via stdlib zlib), warcinfo/request/response/conversion record
  types, and strips HTTP envelopes off response payloads (status code
  and Content-Type surface as columns, the body as bytes).
- ``warc_bytes`` / ``write_warc``: deterministic writer for the same
  format — fixture building and corpus re-export without any external
  tooling.

The reference has no ingestion surface (its feed rows arrive via SQL);
this serves the engine's LLM-pipeline north star: a pipeline whose
dedup/quality/tokenize stages are Spark-native needs the crawl container
read Spark-natively too.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "archive string, rec_idx int, rec_type string, url string, "
    "warc_date string, http_status int, content_type string, body binary"
)


class WarcError(ValueError):
    pass


def _gunzip_multistream(data: bytes) -> bytes:
    """Concatenated gzip members (the standard WARC layout: one member
    per record) → the full decompressed stream."""
    out = bytearray()
    view = memoryview(data)  # per-member slices must not copy the tail:
    pos = 0                  # one copy per member is O(records × bytes)
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(view[pos:])
            out += d.flush()
        except zlib.error as exc:
            raise WarcError(f"corrupt gzip member: {exc}") from exc
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise WarcError("corrupt gzip member")
        pos += consumed
    return bytes(out)


def _parse_records(raw: bytes):
    """Yield (headers dict, payload bytes) per WARC record."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and raw[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            break
        if not raw[pos: pos + 5] == b"WARC/":
            raise WarcError(f"expected WARC version header at byte {pos}")
        hdr_end, sep = _first_blank_line(raw, pos)
        if hdr_end < 0:
            raise WarcError("unterminated WARC header block")
        headers: dict[str, str] = {}
        lines = raw[pos:hdr_end].decode("utf-8", "replace").splitlines()
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcError("missing/invalid Content-Length") from exc
        body_start = hdr_end + sep
        payload = raw[body_start: body_start + clen]
        if len(payload) < clen:
            raise WarcError("truncated record payload")
        yield headers, payload
        pos = body_start + clen


def _first_blank_line(raw: bytes, pos: int = 0) -> tuple[int, int]:
    """(offset, separator length) of the EARLIEST blank-line terminator —
    CRLFCRLF or LFLF, whichever occurs first.  Preferring CRLF
    unconditionally would let a CRLFCRLF later in a payload win over an
    earlier LF header terminator, mis-framing LF-header archives."""
    a = raw.find(b"\r\n\r\n", pos)
    b = raw.find(b"\n\n", pos)
    if a < 0:
        return b, 2
    if b < 0 or a <= b:
        return a, 4
    return b, 2


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP envelope of a response record → (status, content-type, body)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    end, sep = _first_blank_line(payload)
    if end < 0:
        return None, None, payload
    head = payload[:end].decode("latin-1", "replace").splitlines()
    status = None
    ctype = None
    parts = head[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    for line in head[1:]:
        if line.lower().startswith("content-type:"):
            ctype = line.split(":", 1)[1].strip()
    return status, ctype, payload[end + sep:]


def parse_warc(name: str, data: bytes) -> list[tuple]:
    """One archive's bytes → WARC_SCHEMA tuples (pure function — the
    worker-side kernel of ``read_warc``, unit-testable without Spark)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_multistream(data)
    rows = []
    for i, (headers, payload) in enumerate(_parse_records(data)):
        rec_type = headers.get("warc-type", "")
        url = headers.get("warc-target-uri", "")
        date = headers.get("warc-date", "")
        ctype = headers.get("content-type", "")
        status = None
        body = payload
        if rec_type == "response" and "msgtype=response" in ctype.replace(" ", ""):
            status, http_ctype, body = _split_http(payload)
            if http_ctype is not None:
                ctype = http_ctype
        rows.append((name, i, rec_type, url, date, status, ctype, body))
    return rows


def read_warc(
    spark: SparkSession,
    path: str,
    rec_types: tuple[str, ...] = ("response", "conversion"),
) -> DataFrame:
    """Distributed WARC read: ``binaryFile`` scan (one task per archive —
    the Common Crawl parallelism unit) → Arrow-batched parse.  Keeps only
    ``rec_types`` records (responses + WET conversions by default;
    pass () for everything, warcinfo/request included)."""
    import posixpath

    from collections.abc import Iterator

    import pandas as pd

    from gofeed_spark.fs import get_filesystem

    sp = get_filesystem(path).spark_path(path)
    reader = spark.read.format("binaryFile")
    base, leaf = posixpath.split(sp)
    if base and any(c in leaf for c in "*?["):
        # A trailing-component glob goes through pathGlobFilter over the
        # parent DIRECTORY: loading the raw glob string makes Spark's
        # FileStreamSink metadata probe getFileStatus() the literal glob
        # path, which logs a full FileNotFoundException stack at WARN on
        # every read.  The directory form probes cleanly and lists the
        # same files — PROVIDED the WARC directory is FLAT (the directory
        # form discovers files recursively, so a nested subdirectory
        # could contribute leaf-matching files the raw one-level glob
        # would not have listed).  export_warc's layout is flat by
        # construction; external archive dirs must be too (ADVICE r11).
        reader = reader.option("pathGlobFilter", leaf)
        sp = base
    files = reader.load(sp)
    return _parse_stage(files, rec_types)


def _parse_stage(
    files: DataFrame, rec_types: tuple[str, ...]
) -> DataFrame:
    """The shared Arrow-batched parse over a ``binaryFile`` relation
    (batch or streaming — the stage is stateless, so the plan is
    identical either way)."""
    from collections.abc import Iterator

    import pandas as pd

    keep = tuple(rec_types)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "archive", "rec_idx", "rec_type", "url", "warc_date",
            "http_status", "content_type", "body",
        ]
        for pdf in batches:
            rows = []
            for name, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    r for r in parse_warc(str(name), bytes(blob))
                    if not keep or r[2] in keep
                )
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(run, WARC_SCHEMA)


def read_warc_stream(
    spark: SparkSession,
    landing_dir: str,
    rec_types: tuple[str, ...] = ("response", "conversion"),
    glob: str = "*.warc.gz",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming WARC ingestion: a ``readStream(binaryFile)`` watch over a
    landing directory — each archive dropped there becomes (part of) one
    micro-batch of parsed records, through the SAME Arrow parse stage as
    the batch ``read_warc``, so a pipeline composed downstream
    (canonicalize → dedup → quality gates → sink) runs at ingest time.
    This is the crawl-side twin of the reference's poll-loop watcher
    (watcher.go:89-122): the file source's checkpoint tracks which
    archives are consumed, so a restart resumes exactly where it stopped
    — archives are the Common Crawl delivery unit, one gzip object each.

    ``max_files_per_trigger`` bounds per-batch archive count (ingest
    pacing); the landing dir must be FLAT (see ``read_warc``)."""
    reader = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is FIXED, but the streaming source refuses
        # to infer — spell it out
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    from gofeed_spark.fs import get_filesystem

    files = reader.load(get_filesystem(landing_dir).spark_path(landing_dir))
    return _parse_stage(files, rec_types)


def member_bytes(rec: dict, i: int, compress: bool = True) -> bytes:
    """ONE record ({'rec_type', 'url', 'date', 'content_type', 'body',
    optional 'http_status'}) → its serialized WARC member (its own gzip
    member when ``compress``, the standard layout).  This is the unit a
    CDX index addresses: a (offset, length) range covering exactly the
    bytes this function returns is independently fetchable and
    decompressible (sources/cdx.py).  Deterministic: record ids derive
    from (url, index), no clocks."""
    body = bytes(rec.get("body", b""))
    rec_type = rec.get("rec_type", "response")
    ctype = rec.get("content_type", "text/plain")
    if rec_type == "response":
        status = int(rec.get("http_status", 200))
        env_ct = ctype
        payload = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {env_ct}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        ctype = "application/http; msgtype=response"
    else:
        payload = body
    rid = f"<urn:gofeed:{i}:{rec.get('url', '')}>"
    hdr = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: {rec.get('date', '2000-01-01T00:00:00Z')}\r\n"
        + (f"WARC-Target-URI: {rec['url']}\r\n" if rec.get("url") else "")
        + f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    member = hdr + payload + b"\r\n\r\n"
    if compress:
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        return co.compress(member) + co.flush()
    return member


def warc_bytes(records: list[dict], compress: bool = True) -> bytes:
    """Serialize records as a WARC stream — one gzip member per record
    when ``compress`` (the standard layout); see ``member_bytes``."""
    return b"".join(
        member_bytes(rec, i, compress) for i, rec in enumerate(records)
    )


def write_warc(records: list[dict], path: str, compress: bool = True) -> str:
    """Serialize + publish one archive through the filesystem seam (atomic
    whole-object PUT — POSIX or object-store path alike)."""
    from gofeed_spark.fs import get_filesystem

    get_filesystem(path).put_bytes(path, warc_bytes(records, compress))
    return path


def export_warc(
    docs: DataFrame,
    out_dir: str,
    url_col: str = "url",
    body_col: str = "body",
    n_archives: int = 8,
    content_type: str = "text/plain",
    compress: bool = True,
    rec_type: str = "response",
) -> DataFrame:
    """Distributed corpus → WARC export (the write half of ingestion):
    each of ``n_archives`` partitions serializes its rows as one archive
    object inside ``out_dir`` — parallelism by archive, the same unit the
    reader scans.  Returns (archive, n_records) per written file; the
    caller materializes (``.collect()``/count) to run the export.
    ``rec_type="response"`` wraps rows in HTTP 200 envelopes (.warc);
    ``rec_type="conversion"`` writes bare extracted-text records — the
    WET layout Common Crawl ships alongside its archives.

    Cluster posture: the archive bytes travel through the filesystem seam
    (``gofeed_spark.fs``) — the backend is resolved DRIVER-side from
    ``out_dir``'s scheme and closed over into the task, so each executor
    PUTs its archive to the shared store (object store / shared mount),
    never to a disk only it can see.  On a schemeless POSIX path the
    behavior is the historical one (local files), which is correct on
    ``local[N]`` and on any cluster whose ``out_dir`` is a shared mount;
    for anything else, register an object-store backend for the scheme."""
    from collections.abc import Iterator

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
            yield pd.DataFrame({"archive": [], "n_records": []})
            return
        ext = ".warc.gz" if compress else ".warc"
        path = fs.join(out_dir, f"part-{pid:05d}{ext}")
        fs.put_bytes(path, warc_bytes(recs, compress))
        yield pd.DataFrame({"archive": [path], "n_records": [len(recs)]})

    return df.mapInPandas(run, "archive string, n_records long")


def archive_count(n_records: int, parallelism: int) -> int:
    """Archive count for a corpus export: ~5k records per archive (the
    Common Crawl-ish unit — read parallelism scales with archive count),
    but never LESS than the session's cores once the corpus is big
    enough to feed them (~1k records each) — WARC archives are the
    read-side parallelism unit (not splittable mid-file), so an
    under-split local export serializes the parse onto a few cores (the
    compute_width rule: size compute-bound stages by CORES; measured at
    sf1.0: 10 archives → 10.8 s read, 32 → ~3.5 s on local[32]).  At
    real crawl scale archive count dwarfs cores and the 5k rule wins."""
    return max(
        4,
        -(-n_records // 5000),
        min(parallelism, -(-n_records // 1000)),
    )

"""Puffin file format (public spec at iceberg.apache.org/puffin-spec):
the statistics/blob container Iceberg v3 stores DELETION VECTORS in.

Layout::

    Magic  Blob₁ … Blobₙ  Footer
    Footer = Magic  FooterPayload  FooterPayloadSize(4 LE)  Flags(4)  Magic

``FooterPayload`` is JSON: ``{"blobs": [{"type", "fields",
"snapshot-id", "sequence-number", "offset", "length", ...}],
"properties": {...}}``.  Flag bit 0 of byte 0 marks a COMPRESSED footer
payload (refused — optional feature, and conservative readers must not
guess).

Deletion-vector blobs (``deletion-vector-v1``) carry::

    length(4 BE) magic(D1 D3 39 64) bitmap(64-bit portable roaring) crc(4 BE)

— the SAME magic + bitmap serialization as Delta Lake deletion vectors
(deliberate cross-format compatibility in the v3 spec), so decode
delegates to :mod:`roaring`.  The CRC-32 covers magic+bitmap.
``PuffinError`` wraps every malformed-input failure (the codec error
contract all sources follow).
"""

from __future__ import annotations

import json
import struct
import zlib

from gofeed_spark.sources.roaring import RoaringError, dv_decode_payload, dv_payload

MAGIC = b"PFA1"


class PuffinError(ValueError):
    pass


def read_footer(data: bytes) -> dict:
    """The footer payload JSON of one Puffin file."""
    if len(data) < 12 or data[:4] != MAGIC or data[-4:] != MAGIC:
        raise PuffinError("not a Puffin file (bad magic)")
    try:
        (size,) = struct.unpack_from("<i", data, len(data) - 12)
        flags = data[len(data) - 8 : len(data) - 4]
    except struct.error as exc:
        raise PuffinError("truncated Puffin footer") from exc
    if flags[0] & 1:
        raise PuffinError("compressed Puffin footer payload (unsupported)")
    start = len(data) - 12 - size
    if start < 8:
        raise PuffinError("Puffin footer payload size out of range")
    if data[start - 4 : start] != MAGIC:
        raise PuffinError("Puffin footer start magic missing")
    try:
        return json.loads(data[start : start + size])
    except (UnicodeDecodeError, json.JSONDecodeError) as exc:
        raise PuffinError(f"bad Puffin footer payload: {exc}") from exc


def read_blob(data: bytes, offset: int, length: int) -> bytes:
    if offset < 4 or offset + length > len(data):
        raise PuffinError(
            f"blob [{offset}, {offset + length}) outside file of {len(data)}"
        )
    return data[offset : offset + length]


def decode_dv_blob(blob: bytes) -> set[int]:
    """A ``deletion-vector-v1`` blob → the deleted row positions."""
    if len(blob) < 12:
        raise PuffinError("truncated deletion-vector blob")
    (n,) = struct.unpack_from(">i", blob, 0)
    payload = blob[4 : 4 + n]
    if len(payload) != n:
        raise PuffinError("deletion-vector blob length mismatch")
    (crc,) = struct.unpack_from(">I", blob, 4 + n)
    if zlib.crc32(payload) & 0xFFFFFFFF != crc:
        raise PuffinError("deletion-vector blob CRC mismatch")
    try:
        return dv_decode_payload(payload)
    except RoaringError as exc:
        raise PuffinError(f"bad deletion-vector bitmap: {exc}") from exc


def encode_dv_blob(positions) -> bytes:
    """Deleted positions → one ``deletion-vector-v1`` blob (the write
    half: fixtures and the future v3 writer)."""
    payload = dv_payload(sorted(positions))
    return (
        struct.pack(">i", len(payload))
        + payload
        + struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
    )


def write_puffin(blobs: list[tuple[dict, bytes]]) -> bytes:
    """Assemble a Puffin file from ``(footer-metadata-without-offsets,
    blob bytes)`` pairs; offsets/lengths are filled in here.  Returns
    the file bytes (footer uncompressed, flags zero)."""
    out = bytearray(MAGIC)
    metas = []
    for meta, blob in blobs:
        m = dict(meta)
        m["offset"] = len(out)
        m["length"] = len(blob)
        metas.append(m)
        out += blob
    payload = json.dumps({"blobs": metas, "properties": {}}).encode("utf-8")
    out += MAGIC + payload + struct.pack("<i", len(payload)) + b"\x00\x00\x00\x00" + MAGIC
    return bytes(out)

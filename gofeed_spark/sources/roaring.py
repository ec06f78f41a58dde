"""Roaring bitmaps + Delta deletion-vector containers, pure Python.

Three public specs, one module:

1. **32-bit Roaring portable format** (the RoaringFormatSpec shared by
   the Java/C/Go/Rust implementations): cookie 12347
   (``SERIAL_COOKIE_NO_RUNCONTAINER``) or 12346 (``SERIAL_COOKIE``, with
   a run-container bitset), little-endian throughout; array containers
   (sorted uint16, card <= 4096), bitmap containers (1024 x uint64), run
   containers ((start, extra-length) uint16 pairs).  Encode emits
   array/bitmap containers under the no-run cookie (maximally
   compatible); decode accepts all three container kinds.

2. **64-bit bitmap-of-bitmaps** (the Roaring64/RoaringBitmapArray
   portable convention Delta's deletion vectors use): ``u64 LE`` bitmap
   count, then per bitmap ascending ``u32 LE`` high key + a standard
   32-bit portable bitmap of the low halves.

3. **Delta deletion-vector framing** (delta.io PROTOCOL.md §Deletion
   Vectors): on-disk DV files start with a version byte (1); each DV
   blob is ``[u32 BE dataSize][dataSize bytes][u32 BE CRC-32 of the
   bytes]`` where the bytes are ``u32 LE magic 1681511377`` + the
   portable 64-bit bitmap; the add action's ``offset`` points at the
   size word.  Inline DVs (storageType ``i``) are the bytes z85-encoded
   without the size/checksum frame; storageType ``u`` derives the file
   name from a z85-encoded 16-byte UUID.

Z85 is the ZeroMQ spec (4 bytes -> 5 chars, big-endian).
``RoaringError`` wraps every malformed input (the codec error contract:
sources/*codec.py).
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib

SERIAL_COOKIE_NO_RUN = 12347
SERIAL_COOKIE_RUN = 12346
NO_OFFSET_THRESHOLD = 4
DV_MAGIC = 1681511377


class RoaringError(ValueError):
    """Malformed roaring/deletion-vector input."""


# --- 32-bit portable bitmap ---------------------------------------------------


def decode_bitmap32(data: bytes, pos: int = 0) -> tuple[set[int], int]:
    """Standard portable 32-bit bitmap at ``data[pos:]`` →
    (values, end position)."""
    try:
        (cookie32,) = struct.unpack_from("<I", data, pos)
        cookie = cookie32 & 0xFFFF
        if cookie == SERIAL_COOKIE_RUN:
            n = (cookie32 >> 16) + 1
            pos += 4
            nbytes = (n + 7) // 8
            run_bits = data[pos : pos + nbytes]
            if len(run_bits) != nbytes:
                raise RoaringError("truncated run bitset")
            pos += nbytes
            is_run = [bool(run_bits[i >> 3] & (1 << (i & 7))) for i in range(n)]
            has_offsets = n >= NO_OFFSET_THRESHOLD
        elif cookie == SERIAL_COOKIE_NO_RUN:
            (n,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8
            is_run = [False] * n
            has_offsets = True
        else:
            raise RoaringError(f"bad roaring cookie {cookie}")
        keys_cards = []
        for _ in range(n):
            k, c1 = struct.unpack_from("<HH", data, pos)
            keys_cards.append((k, c1 + 1))
            pos += 4
        if has_offsets:
            pos += 4 * n  # offsets are redundant for sequential decode
        out: set[int] = set()
        for i, (key, card) in enumerate(keys_cards):
            base = key << 16
            if is_run[i]:
                (n_runs,) = struct.unpack_from("<H", data, pos)
                pos += 2
                for _ in range(n_runs):
                    start, extra = struct.unpack_from("<HH", data, pos)
                    pos += 4
                    out.update(range(base + start, base + start + extra + 1))
            elif card <= 4096:
                vals = struct.unpack_from(f"<{card}H", data, pos)
                pos += 2 * card
                out.update(base + v for v in vals)
            else:
                words = struct.unpack_from("<1024Q", data, pos)
                pos += 8192
                for wi, w in enumerate(words):
                    while w:
                        b = w & -w
                        out.add(base + (wi << 6) + b.bit_length() - 1)
                        w ^= b
        return out, pos
    except struct.error as exc:
        raise RoaringError(f"truncated bitmap: {exc}") from exc


def encode_bitmap32(values) -> bytes:
    """Values (iterable of 0..2^32-1) → standard portable bytes
    (no-run cookie; array/bitmap containers)."""
    by_key: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v < (1 << 32):
            raise RoaringError(f"value {v} out of 32-bit range")
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    out = bytearray()
    out += struct.pack("<II", SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(set(by_key[k])) - 1)
    # offsets: byte position of each container from stream start
    header_end = len(out) + 4 * len(keys)
    offsets = []
    containers = []
    at = header_end
    for k in keys:
        vals = sorted(set(by_key[k]))
        if len(vals) <= 4096:
            blob = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            blob = struct.pack("<1024Q", *words)
        offsets.append(at)
        containers.append(blob)
        at += len(blob)
    for off in offsets:
        out += struct.pack("<I", off)
    for blob in containers:
        out += blob
    return bytes(out)


# --- 64-bit portable (bitmap of bitmaps) --------------------------------------


def decode_bitmap64(data: bytes, pos: int = 0) -> tuple[set[int], int]:
    try:
        (n,) = struct.unpack_from("<Q", data, pos)
    except struct.error as exc:
        raise RoaringError("truncated 64-bit header") from exc
    pos += 8
    out: set[int] = set()
    last_key = -1
    for _ in range(n):
        try:
            (key,) = struct.unpack_from("<I", data, pos)
        except struct.error as exc:
            raise RoaringError("truncated bitmap key") from exc
        if key <= last_key:
            raise RoaringError("bitmap keys not strictly ascending")
        last_key = key
        pos += 4
        lows, pos = decode_bitmap32(data, pos)
        out.update((key << 32) | v for v in lows)
    return out, pos


def encode_bitmap64(values) -> bytes:
    by_key: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v < (1 << 64):
            raise RoaringError(f"value {v} out of 64-bit range")
        by_key.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(by_key)))
    for k in sorted(by_key):
        out += struct.pack("<I", k)
        out += encode_bitmap32(by_key[k])
    return bytes(out)


# --- Z85 ----------------------------------------------------------------------

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise RoaringError("z85 input length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack_from(">I", data, i)
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[word % 85])
            word //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise RoaringError("z85 text length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            if c not in _Z85_INV:
                raise RoaringError(f"bad z85 character {c!r}")
            word = word * 85 + _Z85_INV[c]
        if word >= 1 << 32:
            raise RoaringError("z85 chunk overflows 32 bits")
        out += struct.pack(">I", word)
    return bytes(out)


# --- Delta deletion-vector container ------------------------------------------


def dv_payload(values) -> bytes:
    """Deleted positions → the DV data bytes (magic + portable 64-bit
    bitmap) — what inline DVs carry and file frames wrap."""
    return struct.pack("<I", DV_MAGIC) + encode_bitmap64(values)


def dv_decode_payload(data: bytes) -> set[int]:
    try:
        (magic,) = struct.unpack_from("<I", data, 0)
    except struct.error as exc:
        raise RoaringError("truncated DV payload") from exc
    if magic != DV_MAGIC:
        raise RoaringError(f"bad DV magic {magic}")
    vals, _pos = decode_bitmap64(data, 4)
    return vals


def dv_file_bytes(payloads: list[bytes]) -> tuple[bytes, list[int]]:
    """DV payloads → (one on-disk DV file, per-payload offsets).  Layout
    per PROTOCOL.md: version byte 1, then per DV ``[u32 BE size][bytes]
    [u32 BE crc32]``; offsets point at the size words."""
    out = bytearray(b"\x01")
    offsets = []
    for p in payloads:
        offsets.append(len(out))
        out += struct.pack(">I", len(p))
        out += p
        out += struct.pack(">I", zlib.crc32(p) & 0xFFFFFFFF)
    return bytes(out), offsets


def dv_read_at(data: bytes, offset: int, size_hint: int | None = None) -> set[int]:
    """Decode the DV whose size word sits at ``offset`` in a DV file;
    verifies the CRC-32 trailer.  ``size_hint`` (the add action's
    sizeInBytes) is cross-checked when given."""
    if not data or data[0] != 1:
        raise RoaringError("bad DV file version byte")
    try:
        (size,) = struct.unpack_from(">I", data, offset)
    except struct.error as exc:
        raise RoaringError("DV offset out of range") from exc
    if size_hint is not None and size != size_hint:
        raise RoaringError(f"DV size {size} != action sizeInBytes {size_hint}")
    payload = data[offset + 4 : offset + 4 + size]
    if len(payload) != size:
        raise RoaringError("truncated DV payload")
    try:
        (crc,) = struct.unpack_from(">I", data, offset + 4 + size)
    except struct.error as exc:
        raise RoaringError("truncated DV checksum") from exc
    if crc != (zlib.crc32(payload) & 0xFFFFFFFF):
        raise RoaringError("DV checksum mismatch")
    return dv_decode_payload(payload)


def dv_file_name(uuid_str: str, prefix: str = "") -> str:
    """storageType 'u' file name: ``[prefix/]deletion_vector_{uuid}.bin``."""
    base = f"deletion_vector_{uuid_str}.bin"
    return f"{prefix}/{base}" if prefix else base


def dv_unpack_u(path_or_inline: str) -> tuple[str, str]:
    """storageType 'u' pathOrInlineDv → (prefix, uuid string): the LAST
    20 chars are the z85 UUID, anything before is the random prefix."""
    if len(path_or_inline) < 20:
        raise RoaringError("storageType 'u' needs a 20-char z85 uuid")
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    return prefix, str(_uuid.UUID(bytes=z85_decode(enc)))


def dv_pack_u(uuid_str: str, prefix: str = "") -> str:
    return prefix + z85_encode(_uuid.UUID(uuid_str).bytes)

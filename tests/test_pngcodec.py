"""Spec-level tests for the pure-stdlib PNG codec: the decoder is checked
against PNG byte streams assembled INDEPENDENTLY here (forward filtering
and chunk framing re-implemented in the test from the public spec), a
well-known public fixture, and encode/decode round-trips — this is the
"real media decoder executed in tests" contract (the swap-point proof),
not a stub-vs-stub comparison."""

from __future__ import annotations

import base64
import random
import struct
import zlib

import pytest

from gofeed_spark.operators.pngcodec import (
    PngError,
    decode_png,
    encode_png,
    gray_strip,
    is_png,
    resample_nearest,
    to_gray,
)

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _forward_filter(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """The spec's FORWARD filter (what encoders emit), implemented here
    independently of the codec under test."""
    out = bytearray([ftype])
    for x in range(len(row)):
        a = row[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            v = row[x]
        elif ftype == 1:
            v = (row[x] - a) & 0xFF
        elif ftype == 2:
            v = (row[x] - b) & 0xFF
        elif ftype == 3:
            v = (row[x] - ((a + b) >> 1)) & 0xFF
        else:  # 4 — Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = (row[x] - pred) & 0xFF
        out.append(v)
    return bytes(out)


def _assemble(width, height, color_type, bpp, rows_with_filters, plte=b""):
    raw = bytearray()
    prev = bytes(width * bpp)
    for ftype, row in rows_with_filters:
        raw += _forward_filter(ftype, row, prev, bpp)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = SIG + _chunk(b"IHDR", ihdr)
    if plte:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def test_decode_all_five_filters_rgb():
    """A 4x5 RGB image whose five rows use filter types 0..4: the decoder
    must invert every filter exactly (byte stream assembled independently
    above)."""
    random.seed(11)
    w, h, bpp = 4, 5, 3
    rows = [bytes(random.randrange(256) for _ in range(w * bpp)) for _ in range(h)]
    data = _assemble(w, h, 2, bpp, list(zip([0, 1, 2, 3, 4], rows)))
    assert decode_png(data) == (w, h, 3, b"".join(rows))


def test_decode_filters_grayscale_and_rgba():
    random.seed(12)
    for color_type, bpp in ((0, 1), (6, 4), (4, 2)):
        w, h = 7, 4
        rows = [
            bytes(random.randrange(256) for _ in range(w * bpp)) for _ in range(h)
        ]
        data = _assemble(w, h, color_type, bpp, list(zip([4, 3, 1, 2], rows)))
        assert decode_png(data) == (w, h, bpp, b"".join(rows)), color_type


def test_decode_palette_expands_to_rgb():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    rows = [bytes([0, 1, 2]), bytes([2, 1, 0])]
    data = _assemble(3, 2, 3, 1, [(0, rows[0]), (1, rows[1])], plte=plte)
    w, h, ch, px = decode_png(data)
    assert (w, h, ch) == (3, 2, 3)
    assert px == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255, 0, 255, 0, 255, 0, 0]
    )


def test_public_fixture_1x1():
    """The widely-published 1x1 PNG data-URI fixture — produced by a real
    encoder (not this codec), so decoding it exercises spec compliance
    against the outside world."""
    data = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
        "DwAChwGA60e6kgAAAABJRU5ErkJggg=="
    )
    assert is_png(data)
    assert decode_png(data) == (1, 1, 4, b"\x00\x00\xff\x7f")


def test_roundtrip_every_channel_count():
    random.seed(13)
    for ch in (1, 2, 3, 4):
        w, h = 6, 3
        px = bytes(random.randrange(256) for _ in range(w * h * ch))
        assert decode_png(encode_png(w, h, ch, px)) == (w, h, ch, px)


def test_rejects_non_png_and_unsupported():
    with pytest.raises(PngError):
        decode_png(b"not a png at all")
    # 16-bit depth refused, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    data = SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00")) + _chunk(b"IEND", b"")
    with pytest.raises(PngError):
        decode_png(data)


def test_gray_strip_matches_itu_luma():
    # constant (100, 150, 200) RGB: L = (299*100 + 587*150 + 114*200)//1000 = 140
    img = encode_png(4, 2, 3, bytes([100, 150, 200] * 8))
    assert gray_strip(img, 4) == [140 / 255.0] * 4


def test_resample_and_gray_shapes():
    w, h, ch = 4, 4, 3
    px = bytes(range(w * h * ch))
    small = resample_nearest(w, h, ch, px, 2, 2)
    assert len(small) == 2 * 2 * ch
    gray = to_gray(w, h, ch, px)
    assert len(gray) == w * h

"""Minimal pure-stdlib PNG codec (decode + encode), written from the
public PNG specification (RFC 2083 / W3C PNG): zlib-inflated IDAT
scanlines, the five standard row filters (None/Sub/Up/Average/Paeth),
8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha)
and 6 (RGBA), non-interlaced.

Purpose: the media operators' REAL decode branch (multimodal.py) must be
executable even where PIL is absent — image featurization, resize and
perceptual hashing run on actual pixels for PNG blobs in any
environment, with PIL remaining the preferred tier when importable (it
covers JPEG etc.).  This is the reference's "multimodal columns" north
star made runnable, not a stub.

Scale posture: decode runs inside Arrow-batched ``mapInPandas`` workers
(one blob at a time per task thread); nothing here touches the driver.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per color type (8-bit depth)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Bytes that are not a PNG this codec supports."""


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        yield ctype, body
        pos += 12 + length  # skip CRC (integrity is the transport's job)
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG → ``(width, height, channels, pixels)`` with
    ``pixels`` as row-major interleaved 8-bit samples (palette images are
    expanded to RGB, so channels is one of 1, 2, 3, 4).  Raises
    ``PngError`` on non-PNG bytes or unsupported variants (16-bit,
    interlaced)."""
    if not is_png(data):
        raise PngError("not a PNG signature")
    width = height = None
    color_type = bit_depth = interlace = None
    palette = b""
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise PngError("missing IHDR")
    if bit_depth != 8:
        raise PngError(f"unsupported bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type}")
    if interlace != 0:
        raise PngError("interlaced PNG unsupported")
    bpp = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise PngError("scanline data size mismatch")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + _paeth(a, prev[x], c)) & 0xFF
        elif ftype != 0:
            raise PngError(f"unknown filter type {ftype}")
        out[y * stride : (y + 1) * stride] = row
        prev = row
    if color_type == 3:  # expand palette indices to RGB
        if not palette:
            raise PngError("palette image without PLTE")
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            off = idx * 3
            if off + 3 > len(palette):
                raise PngError("palette index out of range")
            rgb[i * 3 : i * 3 + 3] = palette[off : off + 3]
        return width, height, 3, bytes(rgb)
    return width, height, bpp, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Encode row-major interleaved 8-bit samples as a valid PNG (filter 0
    rows, one IDAT).  ``channels``: 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise PngError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise PngError("pixel buffer size mismatch")
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter: None
        raw += pixels[y * stride : (y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def to_gray(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Luma conversion, ITU-R 601-2 integer weights (the same formula
    PIL's ``convert("L")`` documents): L = (299R + 587G + 114B) / 1000.
    Alpha channels are dropped."""
    if channels == 1:
        return pixels
    if channels == 2:  # gray + alpha
        return pixels[::2]
    out = bytearray(width * height)
    for i in range(width * height):
        r = pixels[i * channels]
        g = pixels[i * channels + 1]
        b = pixels[i * channels + 2]
        out[i] = (299 * r + 587 * g + 114 * b) // 1000
    return bytes(out)


def resample_nearest(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    new_w: int,
    new_h: int,
) -> bytes:
    """Nearest-neighbor resample (deterministic, spec-free)."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = min(height - 1, (y * height) // new_h)
        for x in range(new_w):
            sx = min(width - 1, (x * width) // new_w)
            src = (sy * width + sx) * channels
            dst = (y * new_w + x) * channels
            out[dst : dst + channels] = pixels[src : src + channels]
    return bytes(out)


def gray_strip(data: bytes, n: int) -> list[float]:
    """Decode a PNG and reduce it to an ``n``-value normalized grayscale
    strip by box-averaging equal column spans of the luma image — the
    pure-stdlib twin of multimodal's PIL feature path (grayscale →
    (n × 1) resize → normalized pixel row)."""
    w, h, ch, px = decode_png(data)
    gray = to_gray(w, h, ch, px)
    out = []
    for i in range(n):
        lo = (i * w) // n
        hi = max(lo + 1, ((i + 1) * w) // n)
        acc = 0
        cnt = 0
        for y in range(h):
            base = y * w
            for x in range(lo, hi):
                acc += gray[base + x]
                cnt += 1
        out.append((acc / cnt) / 255.0 if cnt else 0.0)
    return out

"""Pure Python GIF decoder + minimal encoder (GIF87a/89a, public spec).

GIF is the one widely-deployed ANIMATED format that decodes with nothing
but the stdlib: LZW-compressed color-indexed frames.  This gives the
engine's video-shaped operator (``multimodal.sample_frames``) a REAL
container tier — frame extraction with correct frame composition
(disposal methods, transparency, local palettes, interlacing) — in any
environment, the animated sibling of pngcodec/jpegcodec.

Decoder: ``decode_gif(data) -> (w, h, [rgb_frame_bytes, ...])`` — every
frame composed onto the logical screen per its disposal method, returned
as row-major RGB.  Encoder: ``encode_gif(w, h, frames, palette=None)``
writes an animated GIF from paletted frames (≤ 256 colors) — enough to
round-trip fixtures and build test media without an image library.
"""

from __future__ import annotations

import struct


class GifError(ValueError):
    pass


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset_table():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = eoi + 1

    width = min_code_size + 1
    next_code = eoi + 1
    reset_table()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset_table()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise GifError("bad first LZW code")
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                if next_code < 4096:
                    table.append(prev + entry[:1])
                    next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                if next_code < 4096:
                    table.append(entry)
                    next_code += 1
            else:
                raise GifError("LZW code out of range")
            out += entry
            prev = entry
            if next_code == (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return out
    return out


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: bytearray, w: int, h: int) -> bytearray:
    out = bytearray(len(idx))
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y * w: (y + 1) * w] = idx[src: src + w]
            src += w
    return out


def decode_gif(data: bytes) -> tuple[int, int, list[bytes]]:
    """→ (width, height, [RGB frame bytes, ...]), frames fully composed
    onto the logical screen per each frame's disposal method."""
    try:
        return _decode_gif(data)
    except (IndexError, struct.error) as exc:
        raise GifError(f"malformed GIF stream: {exc!r}") from exc


def _decode_gif(data: bytes):
    if not is_gif(data):
        raise GifError("not a GIF stream")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = data[pos: pos + 3 * n]
        pos += 3 * n
    canvas = bytearray(w * h * 3)
    if gct:
        r, g, b = gct[3 * bg: 3 * bg + 3] or b"\x00\x00\x00"
        canvas = bytearray(bytes([r, g, b]) * (w * h))
    frames: list[bytes] = []
    transparent = None
    disposal = 0
    prev_canvas = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                gc = data[pos + 1: pos + 1 + size]
                pos += 1 + size
                disposal = (gc[0] >> 2) & 0x07
                transparent = gc[3] if gc[0] & 0x01 else None
            # skip (remaining) sub-blocks
            while True:
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                pos += n
        elif block == 0x2C:  # image descriptor
            fx, fy, fw, fh, fflags = struct.unpack("<HHHHB", data[pos: pos + 9])
            pos += 9
            if fflags & 0x80:
                n = 2 << (fflags & 0x07)
                palette = data[pos: pos + 3 * n]
                pos += 3 * n
            else:
                if gct is None:
                    raise GifError("no color table for frame")
                palette = gct
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while True:
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                lzw += data[pos: pos + n]
                pos += n
            idx = _lzw_decode(min_code, bytes(lzw), fw * fh)
            if len(idx) < fw * fh:
                raise GifError("truncated frame data")
            if fflags & 0x40:
                idx = _deinterlace(idx, fw, fh)
            if disposal == 3:
                prev_canvas = bytes(canvas)
            before = bytes(canvas) if disposal == 2 else None
            n_colors = len(palette) // 3
            for y in range(fh):
                cy = fy + y
                if cy >= h:
                    break
                for x in range(fw):
                    cx = fx + x
                    if cx >= w:
                        continue
                    ci = idx[y * fw + x]
                    if transparent is not None and ci == transparent:
                        continue
                    if ci >= n_colors:
                        # a short palette slice would silently SHRINK the
                        # canvas bytearray via slice assignment — fail
                        # loudly so callers take their fallback tier
                        raise GifError(
                            f"pixel index {ci} outside {n_colors}-color table"
                        )
                    o = (cy * w + cx) * 3
                    p = 3 * ci
                    canvas[o: o + 3] = palette[p: p + 3]
            frames.append(bytes(canvas))
            # dispose AFTER the frame is captured
            if disposal == 2 and before is not None:
                # restore the covered region to background (approximate
                # with the pre-frame canvas region per common practice)
                for y in range(fh):
                    cy = fy + y
                    if cy >= h:
                        break
                    o = (cy * w + fx) * 3
                    canvas[o: o + 3 * min(fw, w - fx)] = before[o: o + 3 * min(fw, w - fx)]
            elif disposal == 3 and prev_canvas is not None:
                canvas = bytearray(prev_canvas)
            transparent = None
            disposal = 0
        else:
            raise GifError(f"unknown block 0x{block:02x}")
    if not frames:
        raise GifError("no frames")
    return w, h, frames


# ---------------------------------------------------------------------------
# Encoder (paletted frames, global color table)


def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    palette: bytes | None = None,
) -> bytes:
    """Animated GIF from color-INDEX frames (each ``width*height`` bytes
    of palette indices).  ``palette`` is up to 256 RGB triples (padded to
    a power of two); defaults to a 256-level grayscale ramp so grayscale
    pixel buffers encode directly as their own indices."""
    if not frames:
        raise GifError("no frames to encode")
    if palette is None:
        palette = bytes(v for i in range(256) for v in (i, i, i))
    n_colors = len(palette) // 3
    size_exp = 1
    while (2 << size_exp - 1) < n_colors:
        size_exp += 1
    n_slots = 2 << (size_exp - 1)
    pal = palette + b"\x00" * (3 * n_slots - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (size_exp - 1), 0, 0)
    out += pal
    # netscape looping extension (animated)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, size_exp)
    max_sym = (1 << min_code) - 1
    for fr in frames:
        if len(fr) != width * height:
            raise GifError("frame index buffer size mismatch")
        if max(fr) > max_sym:
            # would otherwise surface as a bare KeyError inside the LZW
            # symbol table
            raise GifError(
                f"pixel index {max(fr)} exceeds the {max_sym + 1}-slot table"
            )
        out += b"\x21\xf9\x04\x00\x02\x00\x00\x00"  # GCE: no disposal, 2cs delay
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([min_code])
        lzw = _lzw_encode(min_code, fr)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i: i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)

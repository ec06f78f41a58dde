"""GIF codec (operators/gifcodec.py): LZW + frame round trips, disposal
and transparency composition, interlace, error paths — and the Spark
path: sample_frames extracting REAL frames from an animated GIF that
then feed the image stack as PNG blobs."""

from __future__ import annotations

import pytest

from gofeed_spark.operators.gifcodec import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    is_gif,
)

W, H = 8, 6


def _flat(v: int) -> bytes:
    return bytes([v]) * (W * H)


def _grad() -> bytes:
    return bytes((x * 255) // (W - 1) for _ in range(H) for x in range(W))


def _gray_of(rgb: bytes) -> bytes:
    return bytes(rgb[i * 3] for i in range(len(rgb) // 3))


def test_lzw_roundtrip_various_buffers():
    for buf in (b"", b"\x00", b"\x01\x01\x01\x01", bytes(range(16)) * 40,
                bytes([7] * 5000)):
        enc = _lzw_encode(8, buf)
        assert bytes(_lzw_decode(8, enc, len(buf))) == buf


def test_animated_roundtrip_exact():
    frames = [_flat(0), _grad(), _flat(200)]
    blob = encode_gif(W, H, frames)
    assert is_gif(blob)
    w, h, out = decode_gif(blob)
    assert (w, h, len(out)) == (W, H, 3)
    for orig, rgb in zip(frames, out):
        assert _gray_of(rgb) == orig  # grayscale palette: index == value
    # deterministic
    assert encode_gif(W, H, frames) == blob


def test_custom_palette():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0])  # R,G,B,black
    idx = bytes([0, 1, 2, 3] * (W * H // 4))
    w, h, out = decode_gif(encode_gif(W, H, [idx], palette=pal))
    assert out[0][:3] == b"\xff\x00\x00" and out[0][3:6] == b"\x00\xff\x00"


def test_transparency_composes_over_previous_frame():
    # frame 2 redraws only via transparency: transparent pixels must show
    # frame 1's pixels.  Build by hand: GCE with transparency flag.
    base = encode_gif(W, H, [_flat(10), _flat(99)])
    # rewrite the SECOND frame's graphic control to mark index 99 transparent
    gce = b"\x21\xf9\x04\x00\x02\x00\x00\x00"
    first = base.index(gce)
    second = base.index(gce, first + 1)
    patched = (
        base[:second]
        + b"\x21\xf9\x04\x01\x02\x00\x63\x00"  # flags bit0=1, transparent=99
        + base[second + 8:]
    )
    w, h, out = decode_gif(patched)
    assert _gray_of(out[1]) == _flat(10)  # fully transparent → frame 1 shows


def test_error_paths():
    with pytest.raises(GifError):
        decode_gif(b"not a gif at all")
    with pytest.raises(GifError):
        decode_gif(b"GIF89a\x08\x00\x06\x00\x00\x00\x00")  # no frames
    blob = encode_gif(W, H, [_grad()])
    with pytest.raises(GifError):
        decode_gif(blob[: len(blob) // 2])
    with pytest.raises(GifError):
        encode_gif(W, H, [])
    with pytest.raises(GifError):
        encode_gif(W, H, [b"\x00" * 3])  # size mismatch


def test_sample_frames_extracts_real_gif_frames_in_spark(spark):
    """The video-shaped operator's REAL tier: an animated GIF's sampled
    frames come back as decodable PNG blobs whose pixels match the
    composed GIF frames — and they feed media_dhash as first-class
    images (distinct frames → distant hashes)."""
    from gofeed_spark.operators.multimodal import media_dhash, sample_frames
    from gofeed_spark.operators.pngcodec import decode_png, is_png

    frames = [_grad(), _flat(0), bytes(reversed(_grad())), _flat(200)]
    gif = encode_gif(W, H, frames)
    media = spark.createDataFrame(
        [(1, "video", gif), (2, "video", b"not an animation")],
        "media_id long, media_type string, content binary",
    )
    rows_ = sample_frames(media, every_n=2, max_frames=8).collect()
    got = {(r.media_id, r.frame_idx): bytes(r.frame) for r in rows_}
    # GIF: frames 0 and 2 sampled (every_n=2), PNG-encoded, pixel-exact
    assert set(k for k in got if k[0] == 1) == {(1, 0), (1, 2)}
    for fi in (0, 2):
        blob = got[(1, fi)]
        assert is_png(blob)
        w, h, ch, px = decode_png(blob)
        assert (w, h, ch) == (W, H, 3)
        assert _gray_of(px) == _gray_of(
            decode_gif(gif)[2][fi]
        )
    # non-animation blob keeps the deterministic stub fan-out
    assert all(len(v) == 32 for k, v in got.items() if k[0] == 2)
    # sampled frames are first-class images: gradient vs reversed gradient
    fm = spark.createDataFrame(
        [(10, "image", got[(1, 0)]), (11, "image", got[(1, 2)])],
        "media_id long, media_type string, content binary",
    )
    fps = {r.media_id: (r.ph_hi << 32) | r.ph_lo for r in media_dhash(fm).collect()}
    assert bin(fps[10] ^ fps[11]).count("1") > 16


def test_out_of_palette_index_raises_gif_error_not_shrinking_canvas():
    """A pixel index past the color table must fail loudly (GifError →
    callers take their stub tier), never silently SHRINK the canvas via a
    short palette-slice assignment (round-10 review finding)."""
    import struct

    from gofeed_spark.operators.gifcodec import _lzw_encode

    w, h = 4, 4
    # 4-slot global color table, but LZW indices use an 8-bit symbol space
    # (min_code=7) so index 5 is a VALID code and an INVALID color
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0) + bytes(12)
    idx = bytes([5] * (w * h))
    lzw = _lzw_encode(7, idx)
    img = (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0) + bytes([7])
        + bytes([len(lzw)]) + lzw + b"\x00" + b"\x3b"
    )
    with pytest.raises(GifError):
        decode_gif(hdr + img)
    # encoder-side sibling: index past the emitted table is a GifError,
    # not a bare KeyError from inside the LZW symbol table
    with pytest.raises(GifError):
        encode_gif(W, H, [bytes([5]) * (W * H)],
                   palette=bytes(12))  # 4-color table, index 5

"""Baseline JPEG codec (operators/jpegcodec.py): encode/decode round
trips, sampling modes, restart markers, error paths, and — env-gated —
byte-stream interop with PIL where it exists.  No Spark needed; the
in-Spark path is covered by test_multimodal.py's decode-ladder tests."""

from __future__ import annotations

import numpy as np
import pytest

from gofeed_spark.operators.jpegcodec import (
    ZIGZAG,
    JpegError,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
    gray_strip,
    is_jpeg,
)


def _gray_gradient(w: int, h: int) -> bytes:
    return bytes((x * 255) // (w - 1) for _ in range(h) for x in range(w))


def _rgb_fixture(w: int, h: int) -> np.ndarray:
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            rgb[y, x] = ((x * 255) // (w - 1), (y * 255) // (h - 1), 128)
    return rgb


def test_zigzag_is_a_permutation_with_the_spec_prefix():
    assert sorted(ZIGZAG) == list(range(64))
    # the first diagonal steps of the T.81 scan, in natural (row*8+col) index
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


def test_gray_roundtrip_close():
    w, h = 16, 16
    grad = _gray_gradient(w, h)
    blob = encode_jpeg(w, h, 1, grad, quality=90)
    assert is_jpeg(blob)
    w2, h2, ch, px = decode_jpeg(blob)
    assert (w2, h2, ch) == (w, h, 1)
    a = np.frombuffer(grad, dtype=np.uint8).astype(int)
    b = np.frombuffer(px, dtype=np.uint8).astype(int)
    assert np.abs(a - b).max() <= 2
    # deterministic encode
    assert encode_jpeg(w, h, 1, grad, quality=90) == blob


def test_rgb_roundtrip_444_and_420():
    rgb = _rgb_fixture(20, 24)
    for sub, tol_mean in (("444", 2.0), ("420", 6.0)):
        blob = encode_jpeg(20, 24, 3, rgb.tobytes(), quality=90, subsampling=sub)
        w, h, ch, px = decode_jpeg(blob)
        assert (w, h, ch) == (20, 24, 3)
        got = np.frombuffer(px, dtype=np.uint8).reshape(24, 20, 3).astype(int)
        err = np.abs(rgb.astype(int) - got)
        assert err.mean() < tol_mean, (sub, err.mean())


def test_nonmultiple_of_8_dims():
    # 13x9 exercises edge-block padding and crop on both axes
    rgb = _rgb_fixture(13, 9)
    blob = encode_jpeg(13, 9, 3, rgb.tobytes(), quality=92)
    w, h, ch, px = decode_jpeg(blob)
    assert (w, h, ch) == (13, 9, 3)
    got = np.frombuffer(px, dtype=np.uint8).reshape(9, 13, 3).astype(int)
    assert np.abs(rgb.astype(int) - got).mean() < 4.0


def test_restart_markers_roundtrip():
    rgb = _rgb_fixture(20, 24)
    plain = decode_jpeg(encode_jpeg(20, 24, 3, rgb.tobytes(), quality=90))[3]
    with_rst = encode_jpeg(20, 24, 3, rgb.tobytes(), quality=90, restart_interval=2)
    assert b"\xff\xdd" in with_rst  # DRI emitted
    assert any(bytes([0xFF, 0xD0 + i]) in with_rst for i in range(8))
    assert decode_jpeg(with_rst)[3] == plain  # identical pixels either way


def test_quality_monotonicity_and_locality():
    grad = _gray_gradient(16, 16)
    hi = encode_jpeg(16, 16, 1, grad, quality=95)
    lo = encode_jpeg(16, 16, 1, grad, quality=30)
    assert len(hi) > len(lo)  # finer quantization → more bits
    # one-pixel tweak: decoded images stay near-identical (block-local)
    tweaked = bytearray(grad)
    tweaked[5] = min(255, tweaked[5] + 3)
    a = np.frombuffer(decode_jpeg(hi)[3], dtype=np.uint8).astype(int)
    b = np.frombuffer(
        decode_jpeg(encode_jpeg(16, 16, 1, bytes(tweaked), quality=95))[3],
        dtype=np.uint8,
    ).astype(int)
    assert np.abs(a - b).max() <= 8

def test_gray_strip_contract():
    grad = _gray_gradient(16, 16)
    strip = gray_strip(encode_jpeg(16, 16, 1, grad, quality=92), 8)
    assert len(strip) == 8 and all(0.0 <= v <= 1.0 for v in strip)
    assert strip[0] < strip[-1]  # the gradient shows through the codec


def test_error_paths():
    with pytest.raises(JpegError):
        decode_jpeg(b"plainly not a jpeg")
    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8\xff\xe0garbage that goes nowhere")
    grad = _gray_gradient(16, 16)
    blob = encode_jpeg(16, 16, 1, grad)
    with pytest.raises(JpegError):
        decode_jpeg(blob[: len(blob) // 2])  # torn stream fails loudly
    with pytest.raises(JpegError):
        encode_jpeg(4, 4, 2, b"\x00" * 32)  # bad channel count
    with pytest.raises(JpegError):
        encode_jpeg(4, 4, 1, b"\x00" * 15)  # buffer size mismatch


def test_progressive_decodes_bit_identical_to_baseline():
    """SOF2 transmits the SAME quantized coefficients as SOF0, just
    reordered across scans (DC first/refine, per-component AC
    first/refine) — so the two round trips must agree to the bit, for
    every sampling mode, edge-padding shape, and quality tier."""
    rng = np.random.default_rng(11)
    for (w, h, ch, sub) in [
        (16, 16, 1, "444"),
        (20, 12, 3, "444"),
        (24, 24, 3, "420"),   # luma MCU grid wider than its scan raster
        (37, 23, 3, "420"),   # odd dims: crop + chroma box-average
        (8, 8, 1, "444"),
    ]:
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 3 + yy * 2) % 256
        img = np.stack(
            [(base + 40 * c + rng.integers(0, 30, (h, w))) % 256 for c in range(ch)],
            axis=-1,
        ).astype(np.uint8)
        for q in (30, 85, 95):
            blob_b = encode_jpeg(w, h, ch, img.tobytes(), quality=q, subsampling=sub)
            blob_p = encode_jpeg_progressive(
                w, h, ch, img.tobytes(), quality=q, subsampling=sub
            )
            assert is_jpeg(blob_p)
            assert decode_jpeg(blob_p) == decode_jpeg(blob_b), (w, h, ch, sub, q)
            # deterministic encode
            assert (
                encode_jpeg_progressive(w, h, ch, img.tobytes(), quality=q, subsampling=sub)
                == blob_p
            )


def test_progressive_stream_structure():
    grad = _gray_gradient(16, 16)
    gray = encode_jpeg_progressive(16, 16, 1, grad)
    rgb = encode_jpeg_progressive(20, 24, 3, _rgb_fixture(20, 24).tobytes())
    assert b"\xff\xc2" in gray and b"\xff\xc0" not in gray  # SOF2, no SOF0
    # gray: DC first + AC first + DC refine + AC refine = 4 scans
    assert gray.count(b"\xff\xda") == 4
    # rgb: DC scans interleave; AC scans are per-component = 2 + 2*3
    assert rgb.count(b"\xff\xda") == 8
    # it is smaller than a spectral no-op would be and still a full image
    w, h, ch, px = decode_jpeg(gray)
    assert (w, h, ch) == (16, 16, 1) and len(px) == 256


def test_progressive_error_paths_raise_jpegerror_only():
    grad = _gray_gradient(16, 16)
    blob = encode_jpeg_progressive(16, 16, 1, grad)
    # torn at any scan boundary or mid-entropy: JpegError, never a leak
    for cut in (len(blob) // 4, len(blob) // 2, 3 * len(blob) // 4, len(blob) - 3):
        try:
            decode_jpeg(blob[:cut])
        except JpegError:
            pass  # the only permitted failure type
    # byte-flip fuzz across the whole stream: decode or JpegError, nothing else
    rng = np.random.default_rng(3)
    for _ in range(200):
        i = int(rng.integers(2, len(blob)))
        mutated = bytearray(blob)
        mutated[i] ^= int(rng.integers(1, 256))
        try:
            decode_jpeg(bytes(mutated))
        except JpegError:
            pass


def test_progressive_gray_strip_contract():
    grad = _gray_gradient(16, 16)
    strip = gray_strip(encode_jpeg_progressive(16, 16, 1, grad, quality=92), 8)
    assert len(strip) == 8 and strip[0] < strip[-1]


def _pil():
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _pil(), reason="PIL not installed (codec is self-checked)")
def test_pil_interop():  # pragma: no cover — env-gated
    from io import BytesIO

    from PIL import Image

    rgb = _rgb_fixture(20, 24)
    # PIL decodes our stream
    ours = encode_jpeg(20, 24, 3, rgb.tobytes(), quality=92)
    with Image.open(BytesIO(ours)) as im:
        theirs = np.asarray(im.convert("RGB")).astype(int)
    assert np.abs(theirs - rgb.astype(int)).mean() < 4.0
    # we decode PIL's stream
    buf = BytesIO()
    Image.fromarray(rgb, "RGB").save(buf, format="JPEG", quality=92)
    w, h, ch, px = decode_jpeg(buf.getvalue())
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch).astype(int)
    assert np.abs(got - rgb.astype(int)).mean() < 4.0
    # progressive both ways: PIL decodes our SOF2; we decode PIL's
    ours_p = encode_jpeg_progressive(20, 24, 3, rgb.tobytes(), quality=92)
    with Image.open(BytesIO(ours_p)) as im:
        theirs_p = np.asarray(im.convert("RGB")).astype(int)
    assert np.abs(theirs_p - rgb.astype(int)).mean() < 4.0
    buf = BytesIO()
    Image.fromarray(rgb, "RGB").save(buf, format="JPEG", quality=92, progressive=True)
    w, h, ch, px = decode_jpeg(buf.getvalue())
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch).astype(int)
    assert np.abs(got - rgb.astype(int)).mean() < 4.0


def test_corrupt_streams_always_raise_jpegerror_not_numpy_errors():
    """The media ladders catch JpegError to take the stub tier — a corrupt
    blob must NEVER leak a raw numpy/struct exception into a Spark task
    (round-10 review finding: a truncated DQT leaked a broadcast
    ValueError)."""
    cases = [
        b"\xff\xd8\xff\xdb\x00\x43\x00" + bytes(10),  # truncated DQT
        b"\xff\xd8\xff\xc4\x00\x05\x00\x01\x02",  # truncated DHT
        b"\xff\xd8\xff\xc0\x00\x04\x08\x00",  # truncated SOF
        b"\xff\xd8\xff\xda\x00\x03\x01",  # SOS before SOF, torn
    ]
    for blob in cases:
        with pytest.raises(JpegError):
            decode_jpeg(blob)

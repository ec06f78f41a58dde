"""Multimodal binary-column plumbing: schema, Arrow batch shape, and
deterministic stub featurizer."""

from __future__ import annotations

import hashlib

import pytest

from gofeed_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    docs_as_media,
    extract_features,
    media_byte_stats,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine"), (3, "")],
        "doc_id long, text string",
    )
    return docs_as_media(docs)


def test_media_schema_binary(media):
    assert dict(media.dtypes)["content"] == "binary"


def test_extract_features_schema_and_determinism(media):
    out = extract_features(media)
    assert out.schema == FEATURE_SCHEMA
    r = {x.media_id: x for x in out.collect()}
    assert r[1].byte_len == len(b"hello world")
    assert r[1].sha_prefix == hashlib.sha256(b"hello world").hexdigest()[:16]
    assert len(r[1].feature) == 8
    assert all(0.0 <= f <= 1.0 for f in r[1].feature)
    # empty blob still produces a row (sha of empty bytes)
    assert r[3].byte_len == 0
    assert r[3].sha_prefix == hashlib.sha256(b"").hexdigest()[:16]
    # deterministic across runs
    r2 = {x.media_id: x for x in extract_features(media).collect()}
    assert r2[1].feature == r[1].feature


def test_resize_deterministic_schema(media):
    from gofeed_spark.operators.multimodal import resize_images

    out = {r.media_id: r for r in resize_images(media, 224, 224).collect()}
    assert out[1].width == 224 and out[1].height == 224
    assert isinstance(out[1].content, (bytes, bytearray))
    out2 = {r.media_id: r for r in resize_images(media, 224, 224).collect()}
    assert bytes(out[1].content) == bytes(out2[1].content)  # deterministic
    out3 = {r.media_id: r for r in resize_images(media, 64, 64).collect()}
    assert bytes(out[1].content) != bytes(out3[1].content)  # dims matter


def test_sample_frames_fanout(media):
    from gofeed_spark.operators.multimodal import sample_frames

    rows_ = sample_frames(media, every_n=10, max_frames=8).collect()
    by_id = {}
    for r in rows_:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    # "hello world" = 11 bytes -> 1 frame; empty doc -> floor 1 frame
    assert by_id[1] == [0]
    assert by_id[3] == [0]
    # frames are distinct deterministic blobs
    frames = [bytes(r.frame) for r in rows_ if r.media_id == 1]
    assert len(set(frames)) == len(frames)


def test_media_byte_stats_jvm_side(media):
    r = {x.media_id: x for x in media_byte_stats(media).collect()}
    assert r[2].byte_len == len(b"spark engine")
    assert r[2].content_md5 == hashlib.md5(b"spark engine").hexdigest()


def test_media_dhash_deterministic_and_clone_sensitive(spark):
    """Stub dHash: identical blobs → identical fingerprints; different
    blobs → different fingerprints (sha-derived strips)."""
    from gofeed_spark.operators.multimodal import media_dhash

    media = spark.createDataFrame(
        [
            (1, "image", b"same bytes"),
            (2, "image", b"same bytes"),
            (3, "image", b"other bytes"),
        ],
        "media_id long, media_type string, content binary",
    )
    got = {r.media_id: (r.ph_hi, r.ph_lo) for r in media_dhash(media).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    assert all(0 <= h < 2**32 and 0 <= l < 2**32 for h, l in got.values())


def test_media_neardup_pairs_recovers_exact_clone_family(spark):
    from gofeed_spark.operators.multimodal import media_neardup_pairs

    rows_ = [(i, "image", b"meme template pixels") for i in range(1, 6)]
    rows_ += [(10 + i, "image", f"unique {i}".encode()) for i in range(20)]
    media = spark.createDataFrame(
        rows_, "media_id long, media_type string, content binary"
    )
    pairs = {
        (r.media_a, r.media_b)
        for r in media_neardup_pairs(media, max_hamming=0).collect()
    }
    import itertools

    assert pairs == set(itertools.combinations(range(1, 6), 2))


def test_hash64_band_pairs_recovers_hamming_family(spark):
    """The banded kernel's pigeonhole guarantee, pinned on synthetic
    fingerprints: every pair within Hamming distance 3 of a base hash
    MUST be recovered (any 3 flipped bits leave one of the 4 sixteen-bit
    bands untouched), and far-away hashes must not pair."""
    from gofeed_spark.operators.dedup import hash64_band_pairs

    base = 0x5A5A3C3CA1B2C3D4
    family = [base, base ^ 1, base ^ (1 << 20), base ^ ((1 << 40) | (1 << 63))]
    far = 0xFFFFFFFF00000000 ^ base  # hamming 32 from base
    fps = [(i, (h >> 32) & 0xFFFFFFFF, h & 0xFFFFFFFF) for i, h in enumerate(family)]
    fps.append((99, (far >> 32) & 0xFFFFFFFF, far & 0xFFFFFFFF))
    df = spark.createDataFrame(fps, "doc_id long, sim_hi long, sim_lo long")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in hash64_band_pairs(df, max_hamming=3).collect()
    }
    import itertools

    assert set(got) == set(itertools.combinations(range(4), 2))
    assert got[(0, 1)] == 1 and got[(0, 2)] == 1 and got[(0, 3)] == 2


def test_hash64_band_pairs_n_bands_guarantees_max_hamming(spark):
    """The round-12 sf0.1 gate catch, pinned: a Hamming-4 pair whose four
    differing bits hit all four default bands is INVISIBLE to 4-band
    candidate generation, and ``n_bands = max_hamming + 1`` (what
    media_neardup_pairs now passes) recovers it by pigeonhole.  Also
    pins that the generalized band slicing at n_bands=4 reproduces the
    original 16-bit layout (same pairs on the distance-3 family)."""
    from gofeed_spark.operators.dedup import hash64_band_pairs

    base = 0x123456789ABCDEF0
    # one flipped bit in EACH 16-bit band: 0, 16, 32, 48
    evil = base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))
    fps = [(i, (h >> 32) & 0xFFFFFFFF, h & 0xFFFFFFFF)
           for i, h in enumerate((base, evil))]
    df = spark.createDataFrame(fps, "doc_id long, sim_hi long, sim_lo long")

    four = hash64_band_pairs(df, max_hamming=4, n_bands=4).collect()
    assert four == []  # the documented best-effort gap
    five = {(r.doc_a, r.doc_b): r.hamming
            for r in hash64_band_pairs(df, max_hamming=4, n_bands=5).collect()}
    assert five == {(0, 1): 4}
    with pytest.raises(ValueError):
        hash64_band_pairs(df, n_bands=0)


def test_media_embedding_feeds_ann_index(spark, tmp_path):
    """The multimodal→vector bridge end-to-end: media blobs → stub
    embeddings → the SAME SRP-LSH index/probe text vectors use.  With the
    multiprobe radius opened to the full plane count the pruned probe is
    exhaustive, so it must EQUAL the brute-force top-k — plumbing
    correctness without approximation flakiness (recall at partial radius
    is the similarity suite's measured gate, on organic vectors)."""
    from gofeed_spark.operators.multimodal import docs_as_media, media_embedding
    from gofeed_spark.operators.similarity import (
        brute_topk,
        build_ann_index,
        probe_ann_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    emb = media_embedding(docs_as_media(docs), dim=8)
    path = str(tmp_path / "media_ann")
    build_ann_index(emb, path, n_planes=4, dim=8, id_col="media_id")
    qv = emb.filter("media_id = 7").collect()[0].embedding
    brute = [
        r.neighbor_id
        for r in brute_topk(
            emb, query_id=7, k=10, id_col="media_id", vec_col="embedding"
        ).collect()
    ]
    probed = [
        r.neighbor_id
        for r in probe_ann_index(
            spark, path, qv, k=10, n_planes=4, dim=8, exclude_id=7, multiprobe=4
        ).collect()
    ]
    assert probed == brute


def test_extract_audio_features_shape_and_determinism(spark):
    from gofeed_spark.operators.multimodal import extract_audio_features

    media = spark.createDataFrame(
        [(1, "audio", b"pcm bytes here"), (2, "audio", b"pcm bytes here"), (3, "audio", b"other")],
        "media_id long, media_type string, content binary",
    )
    rows_ = extract_audio_features(media, n_mfcc=13, n_frames=4).collect()
    by_id = {}
    for r in rows_:
        by_id.setdefault(r.media_id, {})[r.frame] = list(r.mfcc)
    assert set(by_id[1]) == {0, 1, 2, 3}  # 4 frames per blob
    assert all(len(v) == 13 for v in by_id[1].values())
    assert by_id[1] == by_id[2]  # identical blobs → identical matrices
    assert by_id[1] != by_id[3]
    assert all(0.0 <= x <= 1.0 for fr in by_id[3].values() for x in fr)


def test_real_png_decode_branch_in_spark(spark):
    """The real-decode branch executes END-TO-END in this container: PNG
    blobs flow through extract_features / media_dhash / resize_images as
    actual decoded pixels (pure-stdlib codec tier, operators/pngcodec.py),
    while non-PNG blobs keep the deterministic sha stub — both tiers in
    one Spark job, asserted against out-of-Spark recomputation."""
    from gofeed_spark.operators.multimodal import (
        DHASH_H,
        DHASH_W,
        media_dhash,
        resize_images,
    )
    from gofeed_spark.operators.pngcodec import (
        decode_png,
        encode_png,
        gray_strip,
        is_png,
    )

    # horizontal gradient (dhash-meaningful), a one-pixel tweak of it, a
    # reversed gradient, and a non-PNG blob
    w, h = 16, 16
    grad = bytes((x * 255) // (w - 1) for _ in range(h) for x in range(w))
    tweaked = bytearray(grad)
    tweaked[5] = min(255, tweaked[5] + 3)
    rev = bytes(reversed(grad))
    blobs = [
        (1, "image", encode_png(w, h, 1, grad)),
        (2, "image", encode_png(w, h, 1, bytes(tweaked))),
        (3, "image", encode_png(w, h, 1, rev)),
        (4, "image", b"definitely not an image"),
    ]
    media = spark.createDataFrame(
        blobs, "media_id long, media_type string, content binary"
    )

    # extract_features: PNG rows carry REAL pixel features
    feats = {r.media_id: list(r.feature) for r in extract_features(media).collect()}
    approx = pytest.approx  # feature column is array<float> (float32)
    assert feats[1] == approx(gray_strip(blobs[0][2], 8), abs=1e-6)
    assert feats[1][0] < feats[1][-1]  # the gradient shows in the strip
    assert feats[3] == approx(gray_strip(blobs[2][2], 8), abs=1e-6)
    d = hashlib.sha256(b"definitely not an image").digest()
    assert feats[4] == approx([b / 255.0 for b in d[:8]], abs=1e-6)  # stub tier

    # media_dhash: near-identical pixels → tiny Hamming; reversed → huge
    fps = {
        r.media_id: (r.ph_hi << 32) | r.ph_lo for r in media_dhash(media).collect()
    }
    ham_near = bin(fps[1] ^ fps[2]).count("1")
    ham_far = bin(fps[1] ^ fps[3]).count("1")
    assert ham_near <= 4, (ham_near, ham_far)
    assert ham_far >= 32, (ham_near, ham_far)

    # resize_images: output is a REAL decodable PNG at the target dims
    resized = {
        r.media_id: bytes(r.content)
        for r in resize_images(media, 4, 4).collect()
    }
    assert is_png(resized[1])
    rw, rh, rch, rpx = decode_png(resized[1])
    assert (rw, rh, rch) == (4, 4, 1)
    assert rpx[0] < rpx[3]  # gradient survives the resample
    assert not is_png(resized[4])  # undecodable blob → deterministic stub
    assert DHASH_W * DHASH_H == 72


def _cos(a, b):
    import math

    num = sum(x * y for x, y in zip(a, b))
    return num / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )


def test_media_embedding_content_locality(spark):
    """The content-tier encoder is locality-preserving where the sha stub
    was content-blind: near-identical PNGs land at cosine ≈ 1, structurally
    different images don't; near-identical WAVs likewise; undecodable
    blobs keep the sha tier's exact doubles (oracles over non-media
    corpora hold unchanged)."""
    from gofeed_spark.operators.multimodal import media_embedding
    from gofeed_spark.operators.pngcodec import encode_png
    from tests.test_audiocodec import _riff, _sine

    w, h = 16, 16
    grad = bytes((x * 255) // (w - 1) for _ in range(h) for x in range(w))
    tweaked = bytearray(grad)
    tweaked[5] = min(255, tweaked[5] + 3)  # one-pixel edit
    rev = bytes(reversed(grad))
    sr, n = 8000, 4000
    wav_a = _riff(sr, 16, 1, _sine(440.0, sr, n))
    tone = bytearray(_sine(440.0, sr, n))
    tone[100] ^= 1  # one-sample LSB tweak
    wav_b = _riff(sr, 16, 1, bytes(tone))
    wav_c = _riff(sr, 16, 1, _sine(1760.0, sr, n))
    text = b"definitely not decodable media"
    media = spark.createDataFrame(
        [
            (1, "image", encode_png(w, h, 1, grad)),
            (2, "image", encode_png(w, h, 1, bytes(tweaked))),
            (3, "image", encode_png(w, h, 1, rev)),
            (4, "audio", wav_a),
            (5, "audio", wav_b),
            (6, "audio", wav_c),
            (7, "text", text),
        ],
        "media_id long, media_type string, content binary",
    )
    emb = {
        r.media_id: list(r.embedding)
        for r in media_embedding(media, dim=8).collect()
    }
    assert set(emb) == {1, 2, 3, 4, 5, 6, 7}
    assert all(len(v) == 8 for v in emb.values())
    # image locality: one-pixel tweak ≈ identical, reversed gradient far
    assert _cos(emb[1], emb[2]) > 0.999
    assert _cos(emb[1], emb[3]) < 0.9
    # audio locality: LSB tweak ≈ identical; a different pitch is farther
    assert _cos(emb[4], emb[5]) > 0.999
    assert _cos(emb[4], emb[6]) < _cos(emb[4], emb[5])
    # content tiers are unit-normalized
    import math

    for mid in (1, 2, 3, 4, 5, 6):
        assert math.isclose(
            math.sqrt(sum(x * x for x in emb[mid])), 1.0, rel_tol=1e-9
        )
    # undecodable blob: the sha tier, digit-for-digit (q114 oracle contract)
    d = hashlib.sha256(text).digest()
    assert emb[7] == [b / 255.0 for b in d[:8]]
    # determinism across executions
    emb2 = {
        r.media_id: list(r.embedding)
        for r in media_embedding(media, dim=8).collect()
    }
    assert emb2 == emb


def test_media_embedding_sha_encoder_is_jvm_side(spark):
    """encoder='sha' keeps the legacy pure-codegen path: values identical
    to the python sha tier, and the plan carries no Python evaluation."""
    from gofeed_spark.operators.multimodal import media_embedding

    media = spark.createDataFrame(
        [(1, "text", b"alpha"), (2, "text", b"beta")],
        "media_id long, media_type string, content binary",
    )
    jvm = media_embedding(media, dim=8, encoder="sha")
    plan = jvm._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    got = {r.media_id: list(r.embedding) for r in jvm.collect()}
    for mid, blob in ((1, b"alpha"), (2, b"beta")):
        d = hashlib.sha256(blob).digest()
        assert got[mid] == [b / 255.0 for b in d[:8]]
    with pytest.raises(ValueError):
        media_embedding(media, encoder="clip")


def test_jpeg_decode_ladder_contract(spark):
    """The web's dominant image format decodes to REAL pixels in every
    environment: PIL when importable, else the pure-Python baseline
    codec (operators/jpegcodec.py).  A JPEG and a PNG of the SAME image
    must land nearby in dHash and feature space — cross-format
    consistency only real decoding can produce — and a corrupt
    JPEG-magic blob degrades to the sha stub with the identical output
    schema."""
    from gofeed_spark.operators.jpegcodec import encode_jpeg, encode_jpeg_progressive
    from gofeed_spark.operators.multimodal import (
        _pil_available,
        extract_features,
        media_dhash,
        media_embedding,
    )
    from gofeed_spark.operators.pngcodec import encode_png

    w, h = 16, 16
    grad = bytes((x * 255) // (w - 1) for _ in range(h) for x in range(w))
    if _pil_available():
        from io import BytesIO

        from PIL import Image

        buf = BytesIO()
        Image.frombytes("L", (w, h), grad).save(buf, format="JPEG", quality=95)
        jpeg = buf.getvalue()
    else:
        jpeg = encode_jpeg(w, h, 1, grad, quality=95)
    corrupt = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + grad  # JPEG magic, torn body
    prog = encode_jpeg_progressive(w, h, 1, grad, quality=95)  # SOF2
    media = spark.createDataFrame(
        [
            (1, "image", jpeg),
            (2, "image", encode_png(w, h, 1, grad)),
            (3, "image", corrupt),
            (4, "image", prog),
        ],
        "media_id long, media_type string, content binary",
    )
    feats = {r.media_id: r for r in extract_features(media).collect()}
    # identical schema contract across tiers
    assert set(feats) == {1, 2, 3, 4}
    for r in feats.values():
        assert len(r.feature) == 8 and r.byte_len > 0 and len(r.sha_prefix) == 16
    # real JPEG pixels ≈ the PNG of the same image (lossy but close)
    fps = {
        r.media_id: (r.ph_hi << 32) | r.ph_lo for r in media_dhash(media).collect()
    }
    assert bin(fps[1] ^ fps[2]).count("1") <= 6
    assert feats[1].feature == pytest.approx(list(feats[2].feature), abs=0.05)
    # content embedding: JPEG and PNG of one image are near-identical
    emb = {
        r.media_id: list(r.embedding)
        for r in media_embedding(media, dim=8).collect()
    }
    assert _cos(emb[1], emb[2]) > 0.995
    # corrupt blob: deterministic sha stub tier, well-formed output
    assert feats[3].feature == pytest.approx(
        [b / 255.0 for b in hashlib.sha256(corrupt).digest()[:8]], abs=1e-6
    )
    # PROGRESSIVE jpeg (the web's dominant large-image layout) engages
    # the real-decode tier too — near the PNG of the same image, and
    # nowhere near what the sha stub would produce for these bytes
    assert feats[4].feature == pytest.approx(list(feats[2].feature), abs=0.05)
    assert feats[4].feature != pytest.approx(
        [b / 255.0 for b in hashlib.sha256(prog).digest()[:8]], abs=1e-6
    )

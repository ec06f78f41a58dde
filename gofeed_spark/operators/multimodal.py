"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas UDFs via mapInPandas.

Decoding rides a tier ladder that ends in REAL pixels in any
environment: PIL when importable (all formats) → the pure-stdlib PNG
codec (operators/pngcodec.py) → the pure-Python baseline JPEG codec
(operators/jpegcodec.py) → a deterministic content-hash stub only for
genuinely undecodable bytes, with identical Spark-side plumbing (schema,
batch shape, partitioning) at every tier.  Audio gets the same treatment
(``extract_audio_features``: librosa → stdlib+numpy WAV/MFCC → stub);
frame extraction (``sample_frames``) decodes REAL frames from animated
GIFs (operators/gifcodec.py) and keeps the stub for containers that
need ffmpeg.  ``media_embedding`` bridges blobs into the
vector stack (ANN/IVF indexes, brute top-k) with content-derived
features, and ``media_dhash`` / ``media_neardup_pairs`` feed the banded
dedup kernel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", StringType()),  # binary hex placeholder in views
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", IntegerType()),
        StructField("sha_prefix", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque media blob so the
    binary pipeline is exercised by the synthetic tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
    )


def _fake_decode(content: bytes, n_feat: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 floats derived from the
    sha256 digest.  Raise NotImplementedError here to hard-fail instead."""
    d = hashlib.sha256(content).digest()
    return [b / 255.0 for b in d[:n_feat]]


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_decode(content: bytes, n_feat: int = 8) -> list[float]:
    """Real image decode (optional PIL): grayscale → resize to an
    (n_feat × 1) strip → normalized pixel row as the feature vector.
    Raises on bytes PIL cannot parse — callers fall back to the
    deterministic stub so a corrupt blob degrades instead of failing the
    task (real pipelines would also route it to an error sink)."""
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(content)) as im:
        px = list(im.convert("L").resize((n_feat, 1)).getdata())
    return [p / 255.0 for p in px]


def _decode_or_fallback(content: bytes, n_feat: int, use_pil: bool) -> list[float]:
    """Decode tiers: PIL (all formats, when importable) → the pure-stdlib
    PNG codec → the pure-Python baseline JPEG codec (REAL pixel decode
    for the web's two dominant image formats in any environment —
    operators/pngcodec.py, operators/jpegcodec.py) → the deterministic
    sha stub for undecodable bytes.  The real-decode branch is therefore
    executable and tested even in containers without an image library."""
    if use_pil:
        try:
            return _pil_decode(content, n_feat)
        except Exception:  # noqa: BLE001 — undecodable blob → next tier
            pass
    from gofeed_spark.operators import jpegcodec, pngcodec

    if pngcodec.is_png(content):
        try:
            return pngcodec.gray_strip(content, n_feat)
        except pngcodec.PngError:
            pass
    if jpegcodec.is_jpeg(content):
        try:
            return jpegcodec.gray_strip(content, n_feat)
        except jpegcodec.JpegError:
            pass
    return _fake_decode(content, n_feat)


def extract_features(media: DataFrame, n_feat: int = 8) -> DataFrame:
    """mapInPandas featurizer: (media_id, media_type, content BINARY) →
    FEATURE_SCHEMA rows.  Arrow-batched; one Python worker per task —
    scales with executor cores, never a driver loop.  Real PIL decode when
    available, real pure-stdlib PNG decode for PNG blobs otherwise
    (operators/pngcodec.py); per-blob fallback to the deterministic stub
    only for undecodable bytes (the metadata columns the oracle checks
    are decode-independent)."""
    use_pil = _pil_available()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": content.map(len).astype("int32"),
                    "sha_prefix": content.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
                    ),
                    "feature": content.map(
                        lambda b: _decode_or_fallback(bytes(b), n_feat, use_pil)
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize as Arrow-batched mapInPandas.  With PIL importable the
    transform is a true pixel resize (re-encoded PNG); without PIL, PNG
    blobs still get a REAL decode → nearest-neighbor resample → re-encode
    through the pure-stdlib codec (operators/pngcodec.py); only genuinely
    undecodable blobs fall back to a deterministic stand-in derived from
    (input sha256, target dims), so the plumbing (schema, batch shape,
    partition-parallel execution) is identical in every tier."""
    use_pil = _pil_available()

    def _stub_resize(content: bytes) -> bytes:
        seed = hashlib.sha256(content + f"{width}x{height}".encode()).digest()
        return seed  # stand-in for the resized pixel buffer

    def _resize(content: bytes) -> bytes:
        if use_pil:
            try:
                from io import BytesIO

                from PIL import Image

                with Image.open(BytesIO(content)) as im:
                    out = BytesIO()
                    im.resize((width, height)).save(out, format="PNG")
                    return out.getvalue()
            except Exception:  # noqa: BLE001 — undecodable blob → next tier
                pass
        from gofeed_spark.operators import jpegcodec, pngcodec

        if pngcodec.is_png(content):
            try:  # real pixel resize without PIL: decode → resample → encode
                w, h, ch, px = pngcodec.decode_png(content)
                return pngcodec.encode_png(
                    width,
                    height,
                    ch,
                    pngcodec.resample_nearest(w, h, ch, px, width, height),
                )
            except pngcodec.PngError:
                pass
        if jpegcodec.is_jpeg(content):
            try:  # JPEG in → resized JPEG out, still without an image lib
                w, h, ch, px = jpegcodec.decode_jpeg(content)
                return jpegcodec.encode_jpeg(
                    width,
                    height,
                    ch,
                    pngcodec.resample_nearest(w, h, ch, px, width, height),
                )
            except jpegcodec.JpegError:
                pass
        return _stub_resize(content)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "content": pdf["content"].map(lambda b: _resize(bytes(b))),
                }
            )

    return media.mapInPandas(
        run, "media_id long, width int, height int, content binary"
    )


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Video/animation frame sampling: one input blob → up to
    ``max_frames`` rows (media_id, frame_idx, frame BINARY) — a
    flatMap-shaped mapInPandas (the output rows-per-input are
    data-dependent, which is why this is not a 1:1 pandas UDF).

    ANIMATED GIF blobs extract REAL frames in any environment (the
    pure-Python codec in operators/gifcodec.py: LZW, disposal methods,
    local palettes), taking every ``every_n``-th composed frame and
    re-encoding it as a PNG blob (operators/pngcodec.py) — so sampled
    frames feed extract_features / media_dhash / media_embedding as
    first-class image media.  Other containers (mp4 etc.) keep the
    deterministic stub (no ffmpeg here); swap pyav in at this exact seam
    for a full deployment.  Scales per-blob across executor cores; no
    driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gofeed_spark.operators import gifcodec, pngcodec

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content)
                if gifcodec.is_gif(blob):
                    try:
                        w, h, frames = gifcodec.decode_gif(blob)
                        step = max(every_n, 1)
                        for k, fi in enumerate(range(0, len(frames), step)):
                            if k >= max_frames:
                                break
                            out["media_id"].append(mid)
                            out["frame_idx"].append(fi)
                            out["frame"].append(
                                pngcodec.encode_png(w, h, 3, frames[fi])
                            )
                        continue
                    except gifcodec.GifError:
                        pass  # corrupt animation → stub tier
                # stub: pretend the blob has len(blob)//every_n frames
                n = min(max_frames, max(len(blob) // max(every_n, 1), 1))
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i * every_n)
                    out["frame"].append(
                        hashlib.sha256(blob + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, "media_id long, frame_idx int, frame binary")


DHASH_W, DHASH_H = 9, 8  # 9×8 grayscale strip → 64 adjacent-pixel bits


def _dhash_bits_from_strip(px) -> int:
    """dHash (difference hash, public technique): 64-bit fingerprint from a
    9×8 row-major pixel strip — bit r*8+c set iff px[r*9+c] > px[r*9+c+1].
    Near-identical images differ in few bits, so Hamming distance is the
    similarity metric and the SimHash banded machinery applies as-is."""
    fp = 0
    for r in range(DHASH_H):
        for c in range(DHASH_W - 1):
            if px[r * DHASH_W + c] > px[r * DHASH_W + c + 1]:
                fp |= 1 << (r * 8 + c)
    return fp


def _stub_strip(content: bytes) -> list[int]:
    """Deterministic decode stub: the sha256 digest repeated to 72 bytes.
    Exact clones share strips (and therefore hashes) — so exact-duplicate
    media recovery is REAL even without an image library; near-dup
    locality needs the PIL path (real pixels)."""
    d = hashlib.sha256(content).digest()
    return list((d * 3)[: DHASH_W * DHASH_H])


def media_dhash(media: DataFrame) -> DataFrame:
    """Perceptual hash per media blob: (media_id, ph_hi, ph_lo) — the
    64-bit dHash split into 32-bit halves (the engine's BIGINT-sign-safe
    fingerprint convention, same as ``simhash64``).

    One Arrow mapInPandas pass (the per-pixel loop is exactly the
    vectorized-Python case — never a Catalyst HOF).  With PIL importable
    the strip is a real grayscale 9×8 resize; without PIL, PNG blobs
    still decode to real pixels via the pure-stdlib codec
    (operators/pngcodec.py) so re-encoded/near-identical images land
    within small Hamming distance; only genuinely undecodable blobs use
    the deterministic sha-derived stub strip, which keeps the plumbing
    and exact-clone semantics intact and oracle-checkable."""
    use_pil = _pil_available()

    def strip_of(content: bytes) -> list[int]:
        if use_pil:
            try:
                from io import BytesIO

                from PIL import Image

                with Image.open(BytesIO(content)) as im:
                    return list(
                        im.convert("L").resize((DHASH_W, DHASH_H)).getdata()
                    )
            except Exception:  # noqa: BLE001 — undecodable blob → next tier
                pass
        from gofeed_spark.operators import jpegcodec, pngcodec

        if pngcodec.is_png(content):
            try:  # real pixels for PNGs even without PIL
                w, h, ch, px = pngcodec.decode_png(content)
                gray = pngcodec.to_gray(w, h, ch, px)
                return list(
                    pngcodec.resample_nearest(
                        w, h, 1, gray, DHASH_W, DHASH_H
                    )
                )
            except pngcodec.PngError:
                pass
        if jpegcodec.is_jpeg(content):
            try:  # real pixels for JPEGs even without PIL
                w, h, ch, px = jpegcodec.decode_jpeg(content)
                gray = pngcodec.to_gray(w, h, ch, px) if ch != 1 else px
                return list(
                    pngcodec.resample_nearest(
                        w, h, 1, gray, DHASH_W, DHASH_H
                    )
                )
            except jpegcodec.JpegError:
                pass
        return _stub_strip(content)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, his, los = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                fp = _dhash_bits_from_strip(strip_of(bytes(content)))
                ids.append(mid)
                his.append((fp >> 32) & 0xFFFFFFFF)
                los.append(fp & 0xFFFFFFFF)
            yield pd.DataFrame({"media_id": ids, "ph_hi": his, "ph_lo": los})

    return media.mapInPandas(run, "media_id long, ph_hi long, ph_lo long")


def media_neardup_pairs(
    media: DataFrame,
    max_hamming: int = 4,
    df_cap: int | None = 5_000,
) -> DataFrame:
    """Near-duplicate media pairs: dHash fingerprints through the SAME
    banded-LSH kernel text SimHash uses (dedup.hash64_band_pairs —
    hot-bucket star guard, bit_count(xor) verdict).  Returns
    (media_a, media_b, hamming).  Recall is EXHAUSTIVE at the requested
    distance: ``max_hamming + 1`` bands, so by pigeonhole every pair
    within the bound shares a band (4-band best-effort missed a natural
    Hamming-4 pair whose four differing bits hit all four bands — the
    round-12 sf0.1 gate catch).  This is the scalable media-dedup shape:
    fingerprints are 8 bytes, candidates only form on band collisions,
    and a 10⁵-copy meme family costs O(m) star rows, never m² pairs."""
    from gofeed_spark.operators.dedup import hash64_band_pairs

    return (
        hash64_band_pairs(
            media_dhash(media),
            max_hamming=max_hamming,
            id_col="media_id",
            hi_col="ph_hi",
            lo_col="ph_lo",
            df_cap=df_cap,
            n_bands=max_hamming + 1,
        )
        .select(
            F.col("doc_a").alias("media_a"),
            F.col("doc_b").alias("media_b"),
            "hamming",
        )
    )


def _sha_embedding(content: bytes, dim: int) -> list[float]:
    """The undecodable-blob tier: digest byte i / 255.0 — bit-identical to
    the JVM sha2/conv expression ``media_embedding(encoder='sha')`` emits
    (both are exact small-int / 255.0 double divisions), so the DuckDB
    oracle for sha-tier rows holds digit-for-digit regardless of which
    code path produced them."""
    d = hashlib.sha256(content).digest()
    return [b / 255.0 for b in d[:dim]]


def _image_embedding(gray: "list[int] | bytes", w: int, h: int, dim: int) -> list[float]:
    """Content-derived image feature: mean luma over a g×g block grid
    (g = ceil(sqrt(dim)), first ``dim`` cells), L2-normalized.  A
    one-pixel tweak moves one cell mean by ~1/(cell_area·255), so
    near-identical images land at cosine ≈ 1 while differently-structured
    images diverge — the locality property the sha stub could never have."""
    import math

    import numpy as np

    g = math.ceil(math.sqrt(dim))
    px = np.frombuffer(bytes(gray), dtype=np.uint8).reshape(h, w).astype(np.float64)
    rows = np.linspace(0, h, g + 1).astype(int)
    cols = np.linspace(0, w, g + 1).astype(int)
    feats = []
    for r in range(g):
        for c in range(g):
            block = px[rows[r]: max(rows[r + 1], rows[r] + 1),
                       cols[c]: max(cols[c + 1], cols[c] + 1)]
            feats.append(float(block.mean()) / 255.0)
    return _unit(feats[:dim])


def _audio_embedding(y, sr: int, dim: int) -> list[float]:
    """Content-derived audio feature: MFCC matrix over the waveform
    (operators/audiocodec.py — real spectra), mean-pooled over frames,
    padded/truncated to ``dim`` and L2-normalized."""
    import numpy as np

    from gofeed_spark.operators import audiocodec

    n_mfcc = min(dim, 13)
    frames = audiocodec.mfcc_frames(y, sr, n_mfcc=n_mfcc, n_frames=8)
    pooled = np.asarray(frames, dtype=np.float64).mean(axis=0)
    v = np.zeros(dim)
    v[: pooled.size] = pooled
    return _unit(v.tolist())


def _unit(v: list[float]) -> list[float]:
    import math

    n = math.sqrt(sum(x * x for x in v))
    if n < 1e-12:
        # degenerate (e.g. all-black image): a fixed unit vector — identical
        # content still maps to identical embeddings
        out = [0.0] * len(v)
        out[0] = 1.0
        return out
    return [x / n for x in v]


def media_embedding(
    media: DataFrame, dim: int = 8, encoder: str = "content"
) -> DataFrame:
    """Media embedding column — (media_id, embedding array<double>) — the
    bridge from binary blobs into the vector stack: the output feeds
    ``similarity.brute_topk`` / ``build_ann_index`` / ``build_ivf_index``
    unchanged (pass ``id_col="media_id"``), so media similarity search and
    embedding-based media dedup ride the SAME indexes text vectors use.

    ``encoder="content"`` (default): one Arrow mapInPandas pass with the
    same tier ladder the other media ops use —

    - image blobs (PIL when importable, else the pure-stdlib PNG codec)
      → grid-pooled luma features, unit-normalized: near-identical images
      get cosine ≈ 1, unrelated ones don't (tested);
    - RIFF/WAVE blobs → frame-pooled MFCC features (real spectra via
      operators/audiocodec.py), unit-normalized;
    - undecodable bytes → the deterministic sha tier, whose doubles are
      bit-identical to the JVM expression below (oracles over non-media
      corpora hold unchanged).

    A real deployment swaps the two content tiers for an Arrow-batched
    model call (CLIP/wav2vec) — everything downstream is encoder-agnostic.

    ``encoder="sha"``: the legacy all-sha stub, computed ENTIRELY JVM-side
    (sha2 + substring + conv — whole-stage codegen, no Python) for
    pipelines that want a pure-codegen plan over non-media blobs."""
    if encoder == "sha":
        hx = F.lower(F.sha2(F.col("content"), 256))
        emb = F.array(
            *[
                F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("double")
                / F.lit(255.0)
                for i in range(dim)
            ]
        )
        return media.select("media_id", emb.alias("embedding"))
    if encoder != "content":
        raise ValueError(f"unknown encoder {encoder!r} (use 'content' or 'sha')")
    from gofeed_spark.functions.parallel import parallel_floor

    media = parallel_floor(media)  # split-starved scans → serial decode pass
    use_pil = _pil_available()

    def encode_one(content: bytes) -> list[float]:
        if use_pil:
            try:
                from io import BytesIO

                from PIL import Image

                with Image.open(BytesIO(content)) as im:
                    g = im.convert("L")
                    return _image_embedding(g.tobytes(), g.width, g.height, dim)
            except Exception:  # noqa: BLE001 — undecodable blob → next tier
                pass
        from gofeed_spark.operators import audiocodec, jpegcodec, pngcodec

        if pngcodec.is_png(content):
            try:
                w, h, ch, px = pngcodec.decode_png(content)
                return _image_embedding(pngcodec.to_gray(w, h, ch, px), w, h, dim)
            except pngcodec.PngError:
                pass
        if jpegcodec.is_jpeg(content):
            try:
                w, h, ch, px = jpegcodec.decode_jpeg(content)
                gray = pngcodec.to_gray(w, h, ch, px) if ch != 1 else px
                return _image_embedding(gray, w, h, dim)
            except jpegcodec.JpegError:
                pass
        if audiocodec.is_wav(content):
            try:
                sr, y = audiocodec.decode_wav(content)
                return _audio_embedding(y, sr, dim)
            except audiocodec.WavError:
                pass
        return _sha_embedding(content, dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "embedding": pdf["content"].map(
                        lambda b: encode_one(bytes(b))
                    ),
                }
            )

    return media.mapInPandas(run, "media_id long, embedding array<double>")


def extract_audio_features(
    media: DataFrame, n_mfcc: int = 13, n_frames: int = 4
) -> DataFrame:
    """Audio featurization: (media_id, frame, mfcc array<double>) — one row
    per analysis frame, the MFCC-matrix shape audio pipelines feed
    downstream.  Three tiers, mirroring the image path: librosa when
    importable (all formats) → a pure stdlib+numpy WAV decode + textbook
    MFCC pipeline for RIFF/WAVE PCM blobs (operators/audiocodec.py —
    REAL spectral coefficients in any environment) → a deterministic
    sha-derived stub for undecodable bytes, keeping the Spark-side
    plumbing — schema, per-frame fan-out, Arrow batch shape,
    partition-parallel execution — identical in every tier."""
    use_librosa = False
    try:  # pragma: no cover — librosa absent in this container
        import librosa  # noqa: F401

        use_librosa = True
    except ImportError:
        pass

    def stub_mfcc(content: bytes) -> list[list[float]]:
        d = hashlib.sha256(content).digest()
        return [
            [d[(f * n_mfcc + c) % 32] / 255.0 for c in range(n_mfcc)]
            for f in range(n_frames)
        ]

    def real_mfcc(content: bytes) -> list[list[float]]:  # pragma: no cover
        import io

        import librosa
        import numpy as np
        import soundfile as sf

        y, sr = sf.read(io.BytesIO(content))
        m = librosa.feature.mfcc(y=np.asarray(y, dtype=float), sr=sr, n_mfcc=n_mfcc)
        return m.T[:n_frames].tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame": [], "mfcc": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content)
                frames = None
                if use_librosa:
                    try:  # pragma: no cover
                        frames = real_mfcc(blob)
                    except Exception:  # noqa: BLE001 — undecodable → next tier
                        pass
                if frames is None:
                    from gofeed_spark.operators import audiocodec

                    if audiocodec.is_wav(blob):
                        try:  # real WAV decode + numpy MFCC, no audio stack
                            sr, y = audiocodec.decode_wav(blob)
                            frames = audiocodec.mfcc_frames(
                                y, sr, n_mfcc=n_mfcc, n_frames=n_frames
                            )
                        except audiocodec.WavError:
                            pass
                if frames is None:
                    frames = stub_mfcc(blob)
                for f, row in enumerate(frames):
                    out["media_id"].append(mid)
                    out["frame"].append(f)
                    out["mfcc"].append(row)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, "media_id long, frame int, mfcc array<double>")


def media_byte_stats(media: DataFrame) -> DataFrame:
    """JVM-side byte stats over the binary column (no Python): length and
    md5 — the portable subset used for the oracle check."""
    return media.select(
        "media_id",
        F.octet_length("content").alias("byte_len"),
        F.md5("content").alias("content_md5"),
    )

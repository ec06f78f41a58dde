"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas UDFs via mapInPandas.

The decode step itself is STUBBED (image/audio libraries are not in this
container): ``decode_stub`` produces a deterministic fake feature vector
from the byte content so the Spark-side plumbing — schema, batch shape,
partitioning — is real and testable end-to-end.  Swap ``_fake_decode`` for
PIL/librosa/ffmpeg in a real deployment; nothing else changes.
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


def extract_features(media: DataFrame, n_feat: int = 8) -> DataFrame:
    """mapInPandas featurizer: (media_id, media_type, content BINARY) →
    FEATURE_SCHEMA rows.  Arrow-batched; one Python worker per task —
    scales with executor cores, never a driver loop."""

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
                    "feature": content.map(lambda b: _fake_decode(bytes(b), n_feat)),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def media_byte_stats(media: DataFrame) -> DataFrame:
    """JVM-side byte stats over the binary column (no Python): length and
    md5 — the portable subset used for the oracle check."""
    return media.select(
        "media_id",
        F.octet_length("content").alias("byte_len"),
        F.md5("content").alias("content_md5"),
    )

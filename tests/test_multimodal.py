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


def test_media_byte_stats_jvm_side(media):
    r = {x.media_id: x for x in media_byte_stats(media).collect()}
    assert r[2].byte_len == len(b"spark engine")
    assert r[2].content_md5 == hashlib.md5(b"spark engine").hexdigest()

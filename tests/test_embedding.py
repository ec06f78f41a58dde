"""Deterministic text embeddings (operators/embedding.py): frozen-model
contract (same text → same vector, any partitioning), locality (small
edits → high cosine; unrelated text → low), drop rules, and the
cross-engine twin-SQL parity the q136/q137 oracles rest on."""

from __future__ import annotations

import duckdb
import numpy as np

from gofeed_spark.operators.embedding import (
    embedding_sql_ctes,
    text_embedding,
)

TEXTS = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank"),
    (2, "The quick brown fox jumps over the lazy cat near the river bank"),
    (3, "Completely unrelated content regarding parquet row group metadata"),
    (4, "ab"),    # shorter than the gram width -> dropped
    (5, "The quick brown fox jumps over the lazy dog near the river bank"),
]


def _vecs(spark, df, **kw):
    return {
        r[0]: np.array(r[1]) for r in text_embedding(df, **kw).collect()
    }


def test_frozen_model_and_drop_rules(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = _vecs(spark, df)
    assert set(got) == {1, 2, 3, 5}          # doc 4 dropped (no grams)
    assert np.array_equal(got[1], got[5])    # same text -> same vector
    for v in got.values():
        assert abs(np.linalg.norm(v) - 1.0) < 1e-12  # unit norm
    # partitioning invariance: the model is per-row, so any repartition
    # yields bit-identical vectors
    got8 = _vecs(spark, df.repartition(8))
    for k in got:
        assert np.array_equal(got[k], got8[k])


def test_locality(spark):
    """One-word tweak -> high cosine; unrelated text -> low (the VERDICT
    r13 item-3 acceptance check)."""
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = _vecs(spark, df)
    near = float(got[1] @ got[2])
    far = float(got[1] @ got[3])
    assert near > 0.85, near
    assert far < 0.5, far
    assert near - far > 0.4


def test_case_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello World Text"), (2, "hello world text")],
        "doc_id long, text string",
    )
    got = _vecs(spark, df)
    assert np.array_equal(got[1], got[2])


def test_twin_sql_bit_parity(spark):
    """The generated DuckDB chain must reproduce every component
    BIT-exactly (no rounding anywhere in the q136 oracle)."""
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = _vecs(spark, df, dim=32)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in TEXTS)
        + ") v(doc_id, text)"
    )
    want = {
        r[0]: np.array(r[1])
        for r in con.execute(
            "WITH " + embedding_sql_ctes(src="docs", dim=32).strip()
            + " SELECT doc_id, v FROM emb_vec"
        ).fetchall()
    }
    assert set(want) == set(got)
    for k in got:
        assert np.array_equal(got[k], want[k]), k

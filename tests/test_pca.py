"""operators/pca.py: distributed PCA fit/project vs the numpy reference."""

from __future__ import annotations

import numpy as np
import pytest

from gofeed_spark.operators.pca import pca_fit, pca_project
from tests.test_clustering import SCHEMA, _df


def _np_pca(V, k):
    mean = V.mean(axis=0)
    cov = np.cov(V, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def test_pca_fit_matches_numpy(spark):
    rng = np.random.default_rng(21)
    # anisotropic data: a dominant direction PCA must find
    V = rng.normal(size=(80, 6)) * np.array([5.0, 2.0, 1, 1, 0.5, 0.1])
    m = pca_fit(_df(spark, V), n_components=3)
    mean, comps, evals = _np_pca(V, 3)
    assert np.allclose(m["mean"], mean)
    assert np.allclose(m["eigenvalues"], evals)
    assert np.allclose(m["components"], comps)
    # variance ordering holds
    assert m["eigenvalues"][0] > m["eigenvalues"][1] > m["eigenvalues"][2]


def test_pca_project_matches_numpy_and_partitioning(spark):
    rng = np.random.default_rng(22)
    V = rng.normal(size=(60, 5)) * np.array([4.0, 2.0, 1, 0.5, 0.2])
    mean, comps, _ = _np_pca(V, 2)
    ref = (V - mean) @ comps.T
    got = {
        r.vec_id: np.array(r.proj)
        for r in pca_project(_df(spark, V, n_parts=1), n_components=2).collect()
    }
    got7 = {
        r.vec_id: np.array(r.proj)
        for r in pca_project(_df(spark, V, n_parts=7), n_components=2).collect()
    }
    for i in range(len(V)):
        assert np.allclose(got[i], ref[i], atol=1e-5)  # float32 payload
        assert np.array_equal(got[i], got7[i])  # partition-invariant


def test_pca_frozen_model_projects_new_frame(spark):
    rng = np.random.default_rng(23)
    A = rng.normal(size=(50, 4))
    model = pca_fit(_df(spark, A), n_components=2)
    B = rng.normal(size=(5, 4))
    rows = [(100 + i, [float(x) for x in v]) for i, v in enumerate(B)]
    got = {
        r.vec_id: np.array(r.proj)
        for r in pca_project(
            spark.createDataFrame(rows, SCHEMA), model=model
        ).collect()
    }
    ref = (B - model["mean"]) @ model["components"].T
    for i in range(5):
        assert np.allclose(got[100 + i], ref[i], atol=1e-5)


def test_pca_empty_corpus_raises(spark):
    with pytest.raises(ValueError, match="empty corpus"):
        pca_fit(spark.createDataFrame([], SCHEMA))


def test_pca_power_project_matches_numpy_and_margins(spark):
    """The oracle-paired form: 2-iteration power method from the all-ones
    start must equal the straight numpy replay, projections must be
    partitioning-invariant, and every gate-SF projection must sit far
    enough from a round-4 boundary that cross-engine float noise
    (measured 8.9e-16) can never flip a rounded value."""
    import os

    from pyspark.sql import functions as F

    from gofeed_spark.operators.pca import _moment_stats, pca_power_project

    rng = np.random.default_rng(41)
    A = rng.normal(size=(120, 6))
    df = _df(spark, A)
    got = {r.vec_id: r.pc1 for r in pca_power_project(df, n_iters=2).collect()}
    # numpy replay of the exact contract
    mean = A.mean(axis=0)
    cov = (A.T @ A - len(A) * np.outer(mean, mean)) / (len(A) - 1)
    v = np.ones(6)
    for _ in range(2):
        w = cov @ v
        v = w / np.linalg.norm(w)
    ref = np.round((A - mean) @ v, 4) + 0.0
    assert got == {i: ref[i] for i in range(len(A))}
    # partitioning invariance (bit-exact: driver combine is ordered)
    got12 = {
        r.vec_id: r.pc1
        for r in pca_power_project(df.repartition(12), n_iters=2).collect()
    }
    assert got12 == got

    # measured margin floor on the real gate corpus
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n, mu, C = _moment_stats(emb, "embedding")
    v = np.ones(C.shape[0])
    for _ in range(2):
        w = C @ v
        v = w / np.linalg.norm(w)
    V = np.stack(
        [r.embedding for r in emb.select("embedding").collect()]
    ).astype(np.float64)
    p = (V - mu) @ v
    margin = np.abs((np.abs(p) * 1e4 % 1.0) - 0.5).min() * 1e-4
    assert margin > 1e-10  # >= 1e5 x the measured cross-engine noise

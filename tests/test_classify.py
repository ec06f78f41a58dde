"""Fixed-iteration logistic regression: numpy-reference equality of the
trained weights, frozen-model scoring, and learning sanity on a separable
toy set."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from gofeed_spark.operators.classify import score_logreg, sigmoid, train_logreg


def _numpy_logreg(X, y, n_iters, lr):
    w = np.zeros(X.shape[1])
    for _ in range(n_iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * ((p - y)[:, None] * X).mean(axis=0)
    return w


def test_train_logreg_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    X = np.column_stack([rng.uniform(0, 1, 64), rng.uniform(0, 1, 64), np.ones(64)])
    y = (X[:, 0] + 0.5 * X[:, 1] > 0.8).astype(int)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), int(t)) for (a, b, c), t in zip(X, y)],
        "x1 double, x2 double, x0 double, y int",
    ).localCheckpoint()
    w = train_logreg(df, ["x1", "x2", "x0"], "y", n_iters=5, lr=4.0)
    ref = _numpy_logreg(X, y, n_iters=5, lr=4.0)
    assert np.allclose(w, ref, rtol=0, atol=1e-12)
    # scoring applies the frozen weights as one projection
    scored = score_logreg(df, ["x1", "x2", "x0"], w)
    got = [r["score"] for r in scored.orderBy("x1").collect()]
    want = sorted(
        1.0 / (1.0 + math.exp(-(row @ ref))) for row in X
    )
    # same multiset of scores (order by x1 vs score can differ on ties)
    assert np.allclose(sorted(got), sorted(want), atol=1e-12)


def test_logreg_learns_separable_labels(spark):
    rows = [(i, i / 100.0, 1.0, int(i >= 50)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, x1 double, x0 double, y int")
    df = df.localCheckpoint()
    w = train_logreg(df, ["x1", "x0"], "y", n_iters=20, lr=10.0)
    scored = {r["id"]: r["score"] for r in score_logreg(df, ["x1", "x0"], w).collect()}
    acc = sum(1 for i in range(100) if (scored[i] >= 0.5) == (i >= 50)) / 100
    assert acc >= 0.9
    assert w[0] > 0  # weight on the informative feature points the right way


def test_sigmoid_matches_formula(spark):
    df = spark.createDataFrame([(z,) for z in (-5.0, -1.0, 0.0, 1.0, 5.0)], "z double")
    got = [r["s"] for r in df.select(sigmoid(F.col("z")).alias("s")).orderBy("z").collect()]
    want = [1.0 / (1.0 + math.exp(-z)) for z in (-5.0, -1.0, 0.0, 1.0, 5.0)]
    # same expression tree; libm exp may differ by an ulp between JVM and CPython
    assert np.allclose(got, want, rtol=0, atol=1e-15)
    assert got[2] == 0.5  # sigma(0) is exact in any IEEE libm


def test_train_logreg_refuses_empty_frame(spark):
    import pytest

    empty = spark.createDataFrame([], "x1 double, x0 double, y int")
    with pytest.raises(ValueError, match="empty feature frame"):
        train_logreg(empty, ["x1", "x0"], "y", n_iters=1)

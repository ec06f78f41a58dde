"""operators/sketch.py: two-pass exact heavy hitters.

The exactness claim is the point: top-k must equal the naive full
GROUP BY for ANY capacity (a small capacity only widens the recounted
candidate set), any partitioning, and adversarially tied counts.
"""

from __future__ import annotations

from collections import Counter

import pytest

from gofeed_spark.operators.sketch import _compress, heavy_hitters


def _exact_topk(texts, k):
    c = Counter()
    for t in texts:
        import re

        c.update(re.findall(r"[a-z0-9]+", t.lower()))
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i + 1, t, n) for i, (t, n) in enumerate(ranked)]


def _zipf_texts():
    # zipf-ish: token_i appears ~200/i times, plus a long tail of singletons
    texts = []
    for i in range(1, 40):
        texts += [f"tok{i:02d}"] * (200 // i)
    texts += [f"tail{j}" for j in range(300)]
    # pack into multi-token docs so token arrays are non-trivial
    return [" ".join(texts[i : i + 7]) for i in range(0, len(texts), 7)]


@pytest.mark.parametrize("capacity", [8, 64, 4096])
@pytest.mark.parametrize("n_parts", [1, 5])
def test_heavy_hitters_exact_any_capacity(spark, capacity, n_parts):
    texts = _zipf_texts()
    df = spark.createDataFrame(
        [(t,) for t in texts], "text string"
    ).repartition(n_parts)
    got = [
        (r.rank, r.token, r.n)
        for r in heavy_hitters(df, k=10, capacity=capacity).collect()
    ]
    assert got == _exact_topk(texts, 10)


def test_heavy_hitters_tie_break_on_token(spark):
    df = spark.createDataFrame(
        [("b b a a c",), ("c a b",)], "text string"
    ).repartition(2)
    got = [(r.rank, r.token, r.n) for r in heavy_hitters(df, k=3).collect()]
    assert got == [(1, "a", 3), (2, "b", 3), (3, "c", 2)]


def test_heavy_hitters_fewer_tokens_than_k(spark):
    df = spark.createDataFrame([("x y x",)], "text string")
    got = [(r.rank, r.token, r.n) for r in heavy_hitters(df, k=20).collect()]
    assert got == [(1, "x", 2), (2, "y", 1)]


def test_compress_error_accounting():
    state = Counter({f"t{i}": i for i in range(1, 21)})  # t1..t20, counts 1..20
    err = _compress(state, 5)
    # (capacity+1)-th largest = 15 subtracted; survivors are counts 16..20
    assert err == 15
    assert state == {"t16": 1, "t17": 2, "t18": 3, "t19": 4, "t20": 5}
    assert _compress(state, 5) == 0  # already within capacity

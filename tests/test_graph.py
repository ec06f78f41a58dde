"""operators/graph.py: weighted PageRank with dangling-mass redistribution."""

from __future__ import annotations

import numpy as np
import pytest

from gofeed_spark.operators.graph import pagerank


def _np_pagerank(edges, n_iters=2, d=0.85):
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    W = np.zeros(N)
    for s, t, w in edges:
        W[idx[s]] += w
    r = np.full(N, 1.0 / N)
    for _ in range(n_iters):
        contrib = np.zeros(N)
        for s, t, w in edges:
            contrib[idx[t]] += r[idx[s]] * w / W[idx[s]]
        dm = r[W == 0].sum()
        r = (1 - d) / N + d * (contrib + dm / N)
    return {n: round(float(r[idx[n]]), 6) for n in nodes}


EDGES = [
    (1, 2, 3.0),
    (1, 3, 1.0),
    (2, 3, 1.0),
    (3, 1, 2.0),
    (2, 4, 1.0),  # 4 has NO out-edges: dangling, mass redistributes
]


def _edf(spark, edges, n_parts=3):
    return spark.createDataFrame(
        edges, "src long, dst long, w double"
    ).repartition(n_parts)


def test_pagerank_matches_numpy_with_dangling(spark):
    got = {
        r.node: r.pagerank
        for r in pagerank(_edf(spark, EDGES), n_iters=3, weight="w").collect()
    }
    assert got == _np_pagerank(EDGES, n_iters=3)
    # dangling redistribution keeps total rank mass at 1
    assert abs(sum(got.values()) - 1.0) < 1e-5


def test_pagerank_unweighted_default(spark):
    e = spark.createDataFrame(
        [(s, t) for s, t, _ in EDGES], "src long, dst long"
    )
    got = {r.node: r.pagerank for r in pagerank(e, n_iters=2).collect()}
    assert got == _np_pagerank([(s, t, 1.0) for s, t, _ in EDGES], n_iters=2)


def test_pagerank_partition_invariant(spark):
    a = pagerank(_edf(spark, EDGES, n_parts=1), n_iters=2, weight="w").collect()
    b = pagerank(_edf(spark, EDGES, n_parts=5), n_iters=2, weight="w").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pagerank_weight_shifts_rank(spark):
    # tripling 1->2's weight must raise node 2's rank vs the unweighted run
    heavy = {r.node: r.pagerank
             for r in pagerank(_edf(spark, EDGES), n_iters=2, weight="w").collect()}
    flat = {r.node: r.pagerank
            for r in pagerank(
                _edf(spark, [(s, t, 1.0) for s, t, _ in EDGES]),
                n_iters=2, weight="w").collect()}
    assert heavy[2] > flat[2]


def test_pagerank_empty_edges_raises(spark):
    e = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty edge set"):
        pagerank(e, n_iters=1)


def test_pagerank_zero_weight_edges_become_dangling(spark):
    """A source whose out-edges are all weight 0 must shed its mass as
    DANGLING (uniform redistribution), not lose it to a 0/0 null — total
    rank stays 1.  Its endpoints still count as nodes."""
    import numpy as np
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "a", 1.0), ("c", "a", 0.0), ("c", "b", 0.0)],
        "src string, dst string, w double",
    )
    got = {r.node: r.pagerank for r in pagerank(edges, n_iters=2, weight="w").collect()}
    assert set(got) == {"a", "b", "c"}
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
    # numpy reference with c dangling
    d, n = 0.85, 3.0
    r = {v: 1 / n for v in "abc"}
    for _ in range(2):
        dm = r["c"]
        r = {
            "a": (1 - d) / n + d * (r["b"] + dm / n),
            "b": (1 - d) / n + d * (r["a"] + dm / n),
            "c": (1 - d) / n + d * (dm / n),
        }
    for v in "abc":
        assert got[v] == round(r[v], 6), v

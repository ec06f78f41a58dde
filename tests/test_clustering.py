"""operators/clustering.py: distributed k-means + SemDeDup.

Every test pins the determinism contract the DuckDB oracles rely on:
sorted-id init, lowest-cluster tie-break, empty-cluster keep-old, and the
lower-id-witness prune rule.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gofeed_spark.operators import clustering

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _df(spark, vecs, n_parts=3):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, SCHEMA).repartition(n_parts)


def _np_kmeans(V, k, n_iters):
    """Reference Lloyd's with the same contract (keep-old on empty)."""
    C = V[:k].astype(np.float64).copy()
    for _ in range(n_iters):
        d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            if (a == j).any():
                C[j] = V[a == j].mean(axis=0)
    d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), C


def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    V = rng.normal(size=(60, 8))
    got = {
        r.vec_id: r.cluster
        for r in clustering.kmeans_assign(_df(spark, V), k=4, n_iters=3).collect()
    }
    ref, _ = _np_kmeans(V, 4, 3)
    assert got == {i: int(c) for i, c in enumerate(ref)}


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # ids 0 and 1 share a vector: both tie to cluster 0 (lowest wins), so
    # cluster 1 empties on round 1 and must keep its init centroid.
    V = np.array(
        [[0.0, 0.0], [0.0, 0.0], [5.0, 5.0], [0.1, 0.0], [5.1, 5.0]]
    )
    C = clustering.kmeans_centroids(_df(spark, V), k=3, n_iters=2)
    ref, refC = _np_kmeans(V, 3, 2)
    assert np.allclose(C, refC)
    assert np.array_equal(C[1], V[1])  # emptied → unchanged init vector


def test_kmeans_partition_invariant(spark):
    rng = np.random.default_rng(11)
    V = rng.normal(size=(50, 6))
    a = clustering.kmeans_assign(_df(spark, V, n_parts=1), k=3, n_iters=2)
    b = clustering.kmeans_assign(_df(spark, V, n_parts=7), k=3, n_iters=2)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_kmeans_k_exceeds_corpus_raises(spark):
    with pytest.raises(ValueError, match="exceeds corpus"):
        clustering.kmeans_centroids(_df(spark, np.eye(3)), k=5, n_iters=1)


def test_semdedup_matches_brute_numpy(spark):
    rng = np.random.default_rng(3)
    V = rng.normal(size=(80, 8))
    # plant near-dups across the id range so several clusters prune
    for a, b in [(10, 40), (11, 55), (25, 70)]:
        V[b] = V[a] + rng.normal(scale=0.01, size=8)
    tau = 0.8
    got = {
        r.vec_id: (r.cluster, r.dup_of)
        for r in clustering.semdedup(
            _df(spark, V), k=4, n_iters=2, tau=tau, chunk_rows=16
        ).collect()
    }
    a, _ = _np_kmeans(V, 4, 2)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    ref = {}
    for i in range(len(V)):
        w = [j for j in range(i) if a[j] == a[i] and S[i, j] >= tau]
        if w:
            ref[i] = (int(a[i]), min(w))
    assert got == ref
    assert len(ref) >= 3  # the planted pairs actually pruned


def test_semdedup_singleton_clusters_prune_nothing(spark):
    V = np.eye(4) * 10.0  # k=4 → each point its own cluster
    out = clustering.semdedup(_df(spark, V), k=4, n_iters=1, tau=0.1)
    assert out.count() == 0


def _np_assign(V, C):
    d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def test_semdedup_index_probe_matches_numpy(spark, tmp_path):
    from gofeed_spark.operators.clustering import (
        build_semdedup_index,
        probe_semdedup_index,
    )

    rng = np.random.default_rng(5)
    A = rng.normal(size=(40, 8))
    path = str(tmp_path / "semidx")
    build_semdedup_index(_df(spark, A), path, k=3, n_iters=2)

    _, C = _np_kmeans(A, 3, 2)
    B = rng.normal(size=(3, 8))
    B[0] = A[5] + rng.normal(scale=0.01, size=8)   # dup of corpus member 5
    B[1] = B[0] + rng.normal(scale=0.01, size=8)   # batch-internal dup too
    ids_b = [100, 101, 102]
    rows = [(i, [float(x) for x in v]) for i, v in zip(ids_b, B)]
    batch = spark.createDataFrame(rows, SCHEMA)

    tau = 0.8
    got = {
        r.vec_id: r.dup_of
        for r in probe_semdedup_index(spark, path, batch, tau=tau).collect()
    }
    # numpy reference: witnesses = corpus members in the same frozen-centroid
    # cluster + lower-id batch mates; dup_of = min witness id
    aA, aB = _np_assign(A, C), _np_assign(B, C)
    An = A / np.linalg.norm(A, axis=1, keepdims=True)
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    ref = {}
    for j, bid in enumerate(ids_b):
        wit = [i for i in range(40) if aA[i] == aB[j] and An[i] @ Bn[j] >= tau]
        wit += [
            ids_b[j2]
            for j2 in range(j)
            if aB[j2] == aB[j] and Bn[j2] @ Bn[j] >= tau
        ]
        if wit:
            ref[bid] = min(wit)
    assert got == ref
    assert ref[100] == 5 and ref[101] == 5 and 102 not in ref


def test_semdedup_index_append_incremental(spark, tmp_path):
    from gofeed_spark.operators.clustering import (
        build_semdedup_index,
        probe_semdedup_index,
    )

    rng = np.random.default_rng(9)
    A = rng.normal(size=(30, 8))
    path = str(tmp_path / "semidx2")
    build_semdedup_index(_df(spark, A), path, k=3, n_iters=2)

    uniq = rng.normal(size=8)
    b1 = spark.createDataFrame(
        [(100, [float(x) for x in (A[7] + rng.normal(scale=0.01, size=8))]),
         (102, [float(x) for x in uniq])],
        SCHEMA,
    )
    v1 = {r.vec_id: r.dup_of
          for r in probe_semdedup_index(spark, path, b1, tau=0.8, append=True).collect()}
    assert v1 == {100: 7}  # 102 survived and was appended

    b2 = spark.createDataFrame(
        [(200, [float(x) for x in (uniq + rng.normal(scale=0.01, size=8))])],
        SCHEMA,
    )
    v2 = {r.vec_id: r.dup_of
          for r in probe_semdedup_index(spark, path, b2, tau=0.8).collect()}
    assert v2 == {200: 102}  # found against the APPENDED survivor


def test_semdedup_index_layout_partition_prunes(spark, tmp_path):
    from gofeed_spark.fs import get_filesystem
    from gofeed_spark.operators.clustering import build_semdedup_index

    rng = np.random.default_rng(2)
    A = rng.normal(size=(30, 8))
    path = str(tmp_path / "semidx3")
    build_semdedup_index(_df(spark, A), path, k=3, n_iters=1)
    fs = get_filesystem(path)
    rd = spark.read.parquet(fs.spark_path(path)).filter(
        F.col("cluster").isin(["c0001"])
    )
    plan = rd._jdf.queryExecution().executedPlan().toString()
    # the cluster predicate must land in PartitionFilters (plan-time dir
    # pruning), naming the one touched directory value
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cluster" in pf and "c0001" in pf
    # and the probed value reads only that directory's rows
    assert rd.count() == int(
        spark.read.parquet(fs.spark_path(path))
        .filter(F.col("cluster") == "c0001")
        .count()
    )


def test_semdedup_index_probe_refuses_missing_meta(spark, tmp_path):
    from gofeed_spark.operators.clustering import probe_semdedup_index

    with pytest.raises(ValueError, match="no completed semdedup index"):
        probe_semdedup_index(
            spark, str(tmp_path / "nope"), _df(spark, np.eye(3))
        )

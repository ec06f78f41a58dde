"""Similarity operators on hand-computed vectors."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofeed_spark.operators.similarity import (
    brute_topk,
    embedding_neardup_pairs,
    ivf_topk,
    label_centroid_norms,
    lsh_bucket_topk,
    topk_pairs_lsh,
    topk_similar_pairs,
)
from tests.conftest import rows


@pytest.fixture(scope="module")
def emb(spark):
    # vec 1 is the query; 2 is parallel to 1 (cos=1), 3 orthogonal, 4 opposite,
    # 5 at 45 degrees.
    data = [
        (1, [1.0, 0.0], "a"),
        (2, [2.0, 0.0], "a"),
        (3, [0.0, 1.0], "b"),
        (4, [-1.0, 0.0], "b"),
        (5, [1.0, 1.0], "b"),
    ]
    return spark.createDataFrame(data, "vec_id long, embedding array<double>, label string")


def test_brute_topk_ranking(emb):
    out = rows(brute_topk(emb, query_id=1, k=3), "rank", "neighbor_id")
    assert out == {(1, 2), (2, 5), (3, 3)}


def test_topk_similar_pairs_exact(emb):
    out = rows(topk_similar_pairs(emb, k=2), "rank", "id_a", "id_b")
    assert out == {(1, 1, 2), (2, 2, 5)} or out == {(1, 1, 2), (2, 1, 5)}
    # (1,2) is the unique cos=1 pair; second place is a 45-degree pair —
    # ties broken by (id_a, id_b): (1,5) before (2,5)
    assert (1, 1, 2) in out


def test_lsh_bucket_topk_same_halfspace(emb):
    # The query's bucket always contains the parallel vector (identical
    # projections signs) — rank 1 must be vec 2 regardless of bucket pruning.
    out = dict(
        rows(lsh_bucket_topk(emb, query_id=1, k=3, n_planes=2, dim=2), "rank", "neighbor_id")
    )
    assert out[1] == 2


def test_topk_pairs_lsh_matches_exact(emb):
    exact = rows(topk_similar_pairs(emb, k=2), "rank", "id_a", "id_b")
    lsh = rows(topk_pairs_lsh(emb, k=2, n_planes=2, n_tables=8, dim=2), "rank", "id_a", "id_b")
    assert lsh == exact


def test_topk_pairs_lsh_no_nested_loop(emb):
    plan = topk_pairs_lsh(emb, k=2, n_planes=2, n_tables=8, dim=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_neardup_threshold(emb):
    # only the parallel pair (1,2) has cos >= 0.9; (1,5)/(2,5) are at ~0.707
    out = rows(
        embedding_neardup_pairs(emb, min_cos=0.9, n_planes=2, n_tables=8, dim=2),
        "id_a", "id_b",
    )
    assert out == {(1, 2)}


def test_ivf_topk_finds_parallel_vector(emb):
    out = dict(rows(ivf_topk(emb, query_id=1, k=2, n_cells=2, n_probe=2), "rank", "neighbor_id"))
    assert out[1] == 2  # cos=1 parallel vector ranked first


def test_label_centroid_norms(emb):
    # label a: mean([1,0],[2,0]) = [1.5, 0] -> norm 1.5
    # label b: mean([0,1],[-1,0],[1,1]) = [0, 2/3] -> norm 2/3
    out = dict(rows(label_centroid_norms(emb), "label", "centroid_norm"))
    assert out["a"] == 1.5
    assert out["b"] == round(2 / 3, 6)


def test_topk_pairs_lsh_jvm_path_matches_broadcast(emb):
    """broadcast_limit=0 forces the large-corpus branch (JVM dot products
    over the candidate join, no broadcast matrix); both paths must produce
    the exact top-k."""
    broadcast = rows(
        topk_pairs_lsh(emb, k=2, n_planes=2, n_tables=8, dim=2),
        "rank", "id_a", "id_b",
    )
    jvm = rows(
        topk_pairs_lsh(emb, k=2, n_planes=2, n_tables=8, dim=2, broadcast_limit=0),
        "rank", "id_a", "id_b",
    )
    assert jvm == broadcast
    exact = rows(topk_similar_pairs(emb, k=2), "rank", "id_a", "id_b")
    assert jvm == exact


def test_embedding_neardup_jvm_path(emb):
    out = rows(
        embedding_neardup_pairs(
            emb, min_cos=0.9, n_planes=2, n_tables=8, dim=2, broadcast_limit=0
        ),
        "id_a", "id_b",
    )
    assert out == {(1, 2)}


def test_ivf_topk_leaves_no_persisted_frames(spark, emb):
    """A query call must not grow the session's persisted-RDD set (the
    round-3 ivf_topk persisted its assignment frame per call and never
    released it — a session-lifetime cache leak at serving rates)."""
    def persisted_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    # Compare ID SETS, not sizes: the async ContextCleaner may purge
    # earlier tests' unreferenced cache entries at any moment (observed:
    # the count SHRANK mid-test under the full suite), which a size
    # equality misreads as a change.  A frame leaked by ivf_topk would
    # still appear as a NEW id immediately after the collect.
    before = persisted_ids()
    out = ivf_topk(emb, query_id=1, k=2, n_cells=2, n_probe=2)
    out.collect()
    assert not (persisted_ids() - before)


# --- driver-side row-count statistics (no COUNT job) --------------------------


def test_df_rowcount_estimate_footer_stats(spark):
    from gofeed_spark.catalog import df_rowcount_estimate, table_rowcount

    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/embeddings.parquet")
    exact = table_rowcount(sf, "embeddings")
    assert df_rowcount_estimate(df) == exact
    # projections/filters keep the same file inputs — still estimable
    assert df_rowcount_estimate(df.select("vec_id").filter("vec_id > 3")) == exact
    # in-memory relations have no file inputs: no estimate, caller counts
    assert df_rowcount_estimate(spark.range(5)) is None


def test_topk_pairs_lsh_hint_free_runs_no_sizing_job(spark):
    """Without n_hint, a parquet-backed corpus must be sized from footer
    statistics: building the plan on the (lazy) JVM path may not run ANY
    Spark job — previously this paid a full COUNT per invocation."""
    from gofeed_spark.catalog import df_rowcount_estimate

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup()
    plan = topk_pairs_lsh(emb, k=3, broadcast_limit=0)
    assert tracker.getJobIdsForGroup() == before
    # and the footer-sized plan computes the same answer as an exact hint
    hinted = topk_pairs_lsh(emb, k=3, broadcast_limit=0, n_hint=df_rowcount_estimate(emb))
    assert rows(plan, "rank", "id_a", "id_b") == rows(hinted, "rank", "id_a", "id_b")


# --- IVF codebook Lloyd refinement -------------------------------------------


@pytest.fixture(scope="module")
def two_cluster_emb(spark):
    """Two tight clusters; the n_cells=2 lowest-id seeds BOTH sit in
    cluster A, so unrefined cells split A and lump B into one of them —
    the failure mode Lloyd refinement exists to fix."""
    a = [(i, [1.0, 0.02 * i], "a") for i in range(5)]
    b = [(10 + i, [0.02 * i, 1.0], "b") for i in range(5)]
    return spark.createDataFrame(a + b, "vec_id long, embedding array<double>, label string")


def test_ivf_codebook_refinement_finds_both_clusters(two_cluster_emb):
    from gofeed_spark.operators.similarity import as_double_array, ivf_codebook

    e = two_cluster_emb.select(
        F.col("vec_id").alias("nid"), as_double_array("embedding").alias("v")
    )
    seeded = ivf_codebook(e, n_cells=2, n_iters=0)
    refined = ivf_codebook(e, n_cells=2, n_iters=2)
    # determinism: same input → byte-identical codebook
    again = ivf_codebook(e, n_cells=2, n_iters=2)
    assert np.array_equal(refined, again)

    def best_cos(cmat, target):
        t = np.asarray(target) / np.linalg.norm(target)
        c = cmat / np.linalg.norm(cmat, axis=1)[:, None]
        return float((c @ t).max())

    # both seeds point at cluster A; refinement must move one centroid to B
    assert best_cos(seeded, [0.0, 1.0]) < 0.8
    assert best_cos(refined, [0.0, 1.0]) > 0.95
    assert best_cos(refined, [1.0, 0.0]) > 0.95


def test_ivf_topk_refined_recall_at_n_probe_1(two_cluster_emb):
    """With a refined codebook one probe suffices: the query (cluster B)
    quantizes to the B centroid and its true nearest neighbor is found at
    n_probe=1 — the unrefined seeding needs wider probes for the same
    answer."""
    out = dict(
        rows(
            ivf_topk(two_cluster_emb, query_id=14, k=1, n_cells=2, n_probe=1, n_iters=2),
            "rank",
            "neighbor_id",
        )
    )
    assert out[1] == 13


# --- persisted index reuse ----------------------------------------------------


def test_ensure_indexes_reuse_until_params_change(spark, emb, tmp_path):
    from gofeed_spark.operators.similarity import (
        ensure_ann_index,
        ensure_ivf_index,
        probe_ann_index,
        probe_ivf_index,
    )

    srp = str(tmp_path / "srp")
    ensure_ann_index(emb, srp, n_planes=2, dim=2)
    sentinel = os.path.join(srp, "_sentinel")
    open(sentinel, "w").close()
    # same params: reuse (no rebuild — sentinel survives), zero Spark jobs
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup()
    ensure_ann_index(emb, srp, n_planes=2, dim=2)
    assert tracker.getJobIdsForGroup() == before
    assert os.path.exists(sentinel)
    # changed params: rebuild from scratch
    ensure_ann_index(emb, srp, n_planes=3, dim=2)
    assert not os.path.exists(sentinel)
    out = dict(
        rows(
            probe_ann_index(spark, srp, [1.0, 0.05], k=1, n_planes=3, dim=2),
            "rank",
            "neighbor_id",
        )
    )
    assert out[1] in (1, 2)  # the parallel pair dominates cosine

    ivf = str(tmp_path / "ivf")
    cb1 = ensure_ivf_index(emb, ivf, n_cells=2, n_iters=1)
    before = tracker.getJobIdsForGroup()
    cb2 = ensure_ivf_index(emb, ivf, n_cells=2, n_iters=1)
    # warm call: codebook from meta, no jobs, identical values
    assert tracker.getJobIdsForGroup() == before
    assert np.allclose(cb1, cb2)
    out = dict(
        rows(probe_ivf_index(spark, ivf, cb2, [2.0, 0.0], k=1, n_probe=2, exclude_id=2),
             "rank", "neighbor_id")
    )
    assert out[1] == 1


def test_ivf_codebook_sample_cap_path(spark):
    """Above sample_cap the refinement input thins through the
    deterministic xxhash64 id filter (parquet-backed corpora only — footer
    stats provide the bound); the codebook must stay valid, deterministic,
    and full-rank (no empty-cell collapse)."""
    from gofeed_spark.operators.similarity import as_double_array, ivf_codebook

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e = emb.select(F.col("vec_id").alias("nid"), as_double_array("embedding").alias("v"))
    a = ivf_codebook(e, n_cells=4, n_iters=2, sample_cap=100)
    b = ivf_codebook(e, n_cells=4, n_iters=2, sample_cap=100)
    assert a.shape == (4, 64)
    assert np.array_equal(a, b)
    assert np.isfinite(a).all()


# --- saturated SRP buckets: the vector clone-family guard ---------------------


@pytest.fixture(scope="module")
def vector_clone_family(spark):
    """800 identical vectors (ids 0..799) + 4 distinct ones: identical
    vectors collide in EVERY table regardless of plane count — the one
    bucket-population regime plane scaling can't bound."""
    fam = [(i, [1.0, 0.5, -0.25, 0.125]) for i in range(800)]
    others = [
        (9001, [-1.0, 0.5, 0.25, 0.125]),
        (9002, [0.0, 1.0, 0.0, 0.0]),
        (9003, [0.0, 0.0, 1.0, 0.0]),
        (9004, [0.5, -0.5, 0.5, -0.5]),
    ]
    return spark.createDataFrame(fam + others, "vec_id long, embedding array<double>")


@pytest.mark.parametrize("blimit", [1_000_000, 0], ids=["broadcast", "jvm"])
def test_bucket_cap_threshold_mode_linear_star(vector_clone_family, blimit):
    out = embedding_neardup_pairs(
        vector_clone_family, min_cos=0.99, n_planes=3, n_tables=4, dim=4,
        broadcast_limit=blimit, n_hint=804, bucket_cap=50,
    ).collect()
    fam = [(r.id_a, r.id_b) for r in out if r.id_b < 9000]
    # linear spanning star (hub = 0), not the 800*799/2 quadratic bucket
    assert len(fam) == 799
    assert all(a == 0 for a, _b in fam)
    assert all(c == 1.0 for r in out if r.id_b < 9000 for c in [r.cos])
    # the star hub connects the whole family for cluster resolution
    from gofeed_spark.operators.dedup import neardup_clusters

    labels = neardup_clusters(
        embedding_neardup_pairs(
            vector_clone_family, min_cos=0.99, n_planes=3, n_tables=4, dim=4,
            broadcast_limit=blimit, n_hint=804, bucket_cap=50,
        ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    )
    fam_labels = {r.cluster_id for r in labels.collect() if r.doc_id < 9000}
    assert fam_labels == {0}


def test_bucket_cap_topk_mode_still_exact_winners(vector_clone_family):
    out = rows(
        topk_pairs_lsh(
            vector_clone_family, k=3, n_planes=3, n_tables=4, dim=4,
            n_hint=804, bucket_cap=50,
        ),
        "rank", "id_a", "id_b",
    )
    # all clone pairs tie at cos 1; deterministic (id_a, id_b) tie-break
    # keeps the lexicographically-first retained pairs
    assert out == {(1, 0, 1), (2, 0, 2), (3, 0, 3)}


def test_bucket_cap_inert_below_cap(emb):
    capped = rows(topk_pairs_lsh(emb, k=2, n_planes=2, n_tables=8, dim=2, bucket_cap=2), "rank", "id_a", "id_b")
    default = rows(topk_pairs_lsh(emb, k=2, n_planes=2, n_tables=8, dim=2), "rank", "id_a", "id_b")
    assert capped == default


# --- round-7: small-corpus clamp, cache hygiene, trust guard, staleness ------


def test_ivf_codebook_clamps_cells_to_corpus(spark, emb):
    """n_cells above the corpus size seeds fewer centroids than asked for;
    the Lloyd refinement must clamp to the actual seed count instead of
    indexing an n_cells-length mask into the smaller matrix."""
    from gofeed_spark.operators.similarity import as_double_array, ivf_codebook

    e = emb.select(
        F.col("vec_id").alias("nid"), as_double_array("embedding").alias("v")
    )
    cb = ivf_codebook(e, n_cells=16, n_iters=2)
    assert cb.shape == (5, 2) and np.isfinite(cb).all()
    out = dict(
        rows(ivf_topk(emb, query_id=1, k=2, n_cells=16, n_probe=4), "rank", "neighbor_id")
    )
    assert out[1] == 2


def test_fits_broadcast_requires_trust_headroom():
    """The untrusted footer estimate undercounts self-union plans, so it
    only qualifies for the driver-broadcast scorer with 4x headroom."""
    from gofeed_spark.operators.similarity import _fits_broadcast

    assert _fits_broadcast(1000, True, 1000)
    assert not _fits_broadcast(1001, True, 1000)
    assert _fits_broadcast(250, False, 1000)
    assert not _fits_broadcast(251, False, 1000)


def test_corpus_broadcast_cache_evicts_and_bounds(spark, emb):
    from gofeed_spark.operators import similarity as S

    class FakeB:
        def __init__(self):
            self.destroyed = False

        def destroy(self):
            self.destroyed = True

    S._CORPUS_BROADCAST_CACHE.clear()
    dead = (FakeB(), FakeB())
    S._CORPUS_BROADCAST_CACHE[("dead-app", 1)] = dead
    app = spark.sparkContext.applicationId
    fillers = {}
    for i in range(S._CORPUS_BROADCAST_CACHE_MAX):
        fb = (FakeB(), FakeB())
        fillers[(app, -1000 - i)] = fb
        S._CORPUS_BROADCAST_CACHE[(app, -1000 - i)] = fb
    try:
        e = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
        S._corpus_broadcast(e)
        # dead-session entry destroyed on sight
        assert ("dead-app", 1) not in S._CORPUS_BROADCAST_CACHE
        assert all(b.destroyed for b in dead)
        # FIFO bound held: the oldest live entry made room for the new one —
        # dropped but NOT destroyed (a caller's lazy plan may still capture
        # it; ContextCleaner reclaims it once unreferenced)
        assert len(S._CORPUS_BROADCAST_CACHE) <= S._CORPUS_BROADCAST_CACHE_MAX
        evicted = [k for k in fillers if k not in S._CORPUS_BROADCAST_CACHE]
        assert evicted and all(not b.destroyed for k in evicted for b in fillers[k])
    finally:
        S._CORPUS_BROADCAST_CACHE.clear()


def test_ensure_index_rebuilds_on_regenerated_corpus(spark, tmp_path):
    """The index meta carries a corpus fingerprint (file paths/sizes/
    footer counts): rewriting the embeddings at the same path — the
    between-rounds testdata regeneration scenario — must trigger a rebuild
    on the next warm call instead of silently serving the stale layout."""
    from gofeed_spark.operators.similarity import (
        ensure_ann_index,
        ensure_ivf_index,
    )

    src = str(tmp_path / "corpus.parquet")
    corpus_a = [(i, [float(i), 1.0]) for i in range(1, 6)]
    corpus_b = [(i + 100, [1.0, float(i)]) for i in range(1, 9)]
    ddl = "vec_id long, embedding array<double>"
    spark.createDataFrame(corpus_a, ddl).write.mode("overwrite").parquet(src)
    srp = str(tmp_path / "srp")
    ensure_ann_index(spark.read.parquet(src), srp, n_planes=2, dim=2)
    sentinel = os.path.join(srp, "_sentinel")
    open(sentinel, "w").close()
    # unchanged corpus: fingerprint matches, layout reused
    ensure_ann_index(spark.read.parquet(src), srp, n_planes=2, dim=2)
    assert os.path.exists(sentinel)
    # regenerated corpus at the same path: warm call rebuilds
    spark.createDataFrame(corpus_b, ddl).write.mode("overwrite").parquet(src)
    ensure_ann_index(spark.read.parquet(src), srp, n_planes=2, dim=2)
    assert not os.path.exists(sentinel)
    assert {r.nid for r in spark.read.parquet(srp).collect()} == {
        i + 100 for i in range(1, 9)
    }
    # the IVF codebook rides in the meta — a stale one must not be served
    ivf = str(tmp_path / "ivf")
    cb_b = ensure_ivf_index(spark.read.parquet(src), ivf, n_cells=2, n_iters=1)
    spark.createDataFrame(corpus_a, ddl).write.mode("overwrite").parquet(src)
    cb_a = ensure_ivf_index(spark.read.parquet(src), ivf, n_cells=2, n_iters=1)
    assert not np.allclose(cb_a, cb_b)


def test_ann_recall_at_10_quality_gate(spark, tmp_path):
    """Recall@10 vs brute force on the ORGANIC sf0.1 vectors — uniformly
    random 64-dim, the hardest regime (no cluster structure, so any ANN
    scheme must widen its probe to recall the true top-10; the clustered
    regime is pinned by test_ivf_topk_refined_recall_at_n_probe_1).  Gates
    the probe dials so plane/cell tuning has a quality floor:

    - SRP multiprobe radius 3 (Hamming ball over 4 planes) >= 0.9
    - IVF n_probe=13 of 16 cells >= 0.9
    - the cheap settings (single bucket / n_probe=4) must stay strictly
      below the wide ones — the dial is real, and a regression that
      silently widens or breaks pruning shows up here."""
    from gofeed_spark.operators.similarity import (
        ensure_ann_index,
        ensure_ivf_index,
        probe_ann_index,
        probe_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    nrm = mat / np.linalg.norm(mat, axis=1)[:, None]
    qpos = list(range(0, len(ids), max(1, len(ids) // 10)))[:10]
    truth = {}
    for qi in qpos:
        s = nrm @ nrm[qi]
        s[qi] = -2.0
        truth[qi] = set(ids[np.argsort(-s)[:10]].tolist())

    srp = str(tmp_path / "srp")
    ensure_ann_index(emb, srp, n_planes=4, dim=64)
    ivf = str(tmp_path / "ivf")
    cb = ensure_ivf_index(emb, ivf, n_cells=16, n_iters=2)

    def recall(probe_fn):
        vals = []
        for qi in qpos:
            got = {r.neighbor_id for r in probe_fn(qi).collect()}
            vals.append(len(got & truth[qi]) / 10)
        return sum(vals) / len(vals)

    srp_cheap = recall(
        lambda qi: probe_ann_index(
            spark, srp, mat[qi], k=10, n_planes=4, dim=64, exclude_id=int(ids[qi])
        )
    )
    srp_wide = recall(
        lambda qi: probe_ann_index(
            spark, srp, mat[qi], k=10, n_planes=4, dim=64,
            exclude_id=int(ids[qi]), multiprobe=3,
        )
    )
    ivf_cheap = recall(
        lambda qi: probe_ivf_index(
            spark, ivf, cb, mat[qi], k=10, n_probe=4, exclude_id=int(ids[qi])
        )
    )
    ivf_wide = recall(
        lambda qi: probe_ivf_index(
            spark, ivf, cb, mat[qi], k=10, n_probe=13, exclude_id=int(ids[qi])
        )
    )
    assert srp_wide >= 0.9, f"SRP multiprobe=3 recall@10 {srp_wide}"
    assert ivf_wide >= 0.9, f"IVF n_probe=13 recall@10 {ivf_wide}"
    assert srp_cheap < srp_wide and ivf_cheap < ivf_wide


def test_semantic_contamination_flags_clones_and_parallels(spark):
    from gofeed_spark.operators.similarity import semantic_contamination

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [2.0, 0.0]),     # parallel to bench 100 -> cos 1.0
            (2, [1.0, 1.0]),     # 45 degrees -> max_cos ~0.707107
            (3, [-1.0, 0.0]),    # opposite -> max_cos 0.0 (vs [0,1])
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: (r.max_cos, r.contaminated)
        for r in semantic_contamination(corpus, bench, threshold=0.99).collect()
    }
    assert out[1] == (1.0, 1)
    assert out[2] == (0.707107, 0)
    assert out[3] == (0.0, 0)


def test_quantized_ann_index_recall_and_size(spark, tmp_path):
    """int8 scalar quantization of the SRP serving layout: the stored
    vector payload shrinks to well under half the float layout's bytes
    (the 100 TB probe-scan lever), while recall@10 at multiprobe=3 on the
    organic sf0.1 vectors stays at the same >= 0.9 floor as full precision
    (cosine is scale-invariant; only int8 rounding can hurt), and probes
    stay deterministic."""
    import os

    from gofeed_spark.operators.similarity import ensure_ann_index, probe_ann_index

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    nrm = mat / np.linalg.norm(mat, axis=1)[:, None]
    qpos = list(range(0, len(ids), max(1, len(ids) // 5)))[:5]
    truth = {}
    for qi in qpos:
        s = nrm @ nrm[qi]
        s[qi] = -2.0
        truth[qi] = set(ids[np.argsort(-s)[:10]].tolist())

    fpath = str(tmp_path / "srp_f")
    qpath = str(tmp_path / "srp_q")
    ensure_ann_index(emb, fpath, n_planes=4, dim=64)
    ensure_ann_index(emb, qpath, n_planes=4, dim=64, quantize=True)

    def tree_bytes(root):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(root) for f in fs if f.endswith(".parquet")
        )

    assert tree_bytes(qpath) < 0.5 * tree_bytes(fpath)

    vals = []
    for qi in qpos:
        got = {
            r.neighbor_id
            for r in probe_ann_index(
                spark, qpath, mat[qi], k=10, n_planes=4, dim=64,
                exclude_id=int(ids[qi]), multiprobe=3,
            ).collect()
        }
        # deterministic rerun
        got2 = {
            r.neighbor_id
            for r in probe_ann_index(
                spark, qpath, mat[qi], k=10, n_planes=4, dim=64,
                exclude_id=int(ids[qi]), multiprobe=3,
            ).collect()
        }
        assert got == got2
        vals.append(len(got & truth[qi]) / 10)
    recall = sum(vals) / len(vals)
    assert recall >= 0.9, f"quantized SRP recall@10 {recall}"


def test_quantized_ivf_index_recall_and_size(spark, tmp_path):
    """IVF twin of the quantized-SRP gate: int8 payload, full-precision
    cell assignment; recall@10 at n_probe=13 keeps the >= 0.9 floor and
    the layout stores well under half the float bytes."""
    import os

    from gofeed_spark.operators.similarity import ensure_ivf_index, probe_ivf_index

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    nrm = mat / np.linalg.norm(mat, axis=1)[:, None]
    qpos = list(range(0, len(ids), max(1, len(ids) // 5)))[:5]
    truth = {}
    for qi in qpos:
        s = nrm @ nrm[qi]
        s[qi] = -2.0
        truth[qi] = set(ids[np.argsort(-s)[:10]].tolist())

    fpath = str(tmp_path / "ivf_f")
    qpath = str(tmp_path / "ivf_q")
    cb_f = ensure_ivf_index(emb, fpath, n_cells=16, n_iters=2)
    cb_q = ensure_ivf_index(emb, qpath, n_cells=16, n_iters=2, quantize=True)
    assert (cb_f == cb_q).all()  # codebook is quantization-independent

    def tree_bytes(root):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(root) for f in fs if f.endswith(".parquet")
        )

    assert tree_bytes(qpath) < 0.5 * tree_bytes(fpath)

    vals = []
    for qi in qpos:
        got = {
            r.neighbor_id
            for r in probe_ivf_index(
                spark, qpath, cb_q, mat[qi], k=10, n_probe=13,
                exclude_id=int(ids[qi]),
            ).collect()
        }
        vals.append(len(got & truth[qi]) / 10)
    recall = sum(vals) / len(vals)
    assert recall >= 0.9, f"quantized IVF recall@10 {recall}"


def test_ivf_filtered_probe_respects_metadata_predicate(spark, tmp_path):
    import numpy as np
    from pyspark.sql import functions as F

    from gofeed_spark.operators.similarity import build_ivf_index, probe_ivf_index

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(8).tolist(), i % 2) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    path = str(tmp_path / "ivf_filtered")
    cb = build_ivf_index(emb, path, n_cells=4, meta_cols=("label",))
    out = probe_ivf_index(
        spark, path, cb, rows[0][1], k=5, n_probe=4, where=F.col("label") == 1
    )
    ids = [r.neighbor_id for r in out.collect()]
    assert ids and all(i % 2 == 1 for i in ids)  # only label-1 rows


def test_pq_codebooks_shapes_and_determinism(spark):
    from gofeed_spark.operators.similarity import as_double_array, pq_codebooks

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    e = emb.select(F.col("vec_id").alias("nid"), as_double_array("embedding").alias("v"))
    cb1 = pq_codebooks(e, n_sub=8, n_cents=16, n_iters=2)
    cb2 = pq_codebooks(e, n_sub=8, n_cents=16, n_iters=2)
    assert cb1.shape == (8, 16, 8)
    assert np.array_equal(cb1, cb2)  # deterministic end to end
    # refinement moves the seeds (the Lloyd pass is real)
    cb0 = pq_codebooks(e, n_sub=8, n_cents=16, n_iters=0)
    assert not np.array_equal(cb0, cb1)


def test_pq_codes_pack_and_reconstruct(spark):
    from gofeed_spark.operators.similarity import (
        as_double_array,
        _pq_assign,
        pq_codebooks,
        pq_codes,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    e = emb.select(F.col("vec_id").alias("nid"), as_double_array("embedding").alias("v"))
    cbs = pq_codebooks(e, n_sub=8, n_cents=16, n_iters=1)
    got = {r["nid"]: r["code"] for r in pq_codes(e, cbs).collect()}
    pdf = e.toPandas()
    vecs = np.stack(pdf["v"].to_numpy()).astype(np.float64)
    subs = vecs.reshape(len(vecs), 8, 8)
    want = np.zeros(len(vecs), dtype=np.int64)
    for si in range(8):
        want |= _pq_assign(subs[:, si, :], cbs[si]).astype(np.int64) << (4 * si)
    ref = dict(zip(pdf["nid"].tolist(), want.tolist()))
    assert got == ref  # distributed encode == numpy reference
    assert all(0 <= c < (1 << 32) for c in got.values())  # 32-bit packed


def test_pq_recall_at_10_quality_gate(spark):
    """PQ+refine recall@10 vs brute force on the organic sf0.1 64-dim
    vectors (the hard no-structure regime): the measured quality floor for
    the ADC path, plus the dial check — a starved refine must do strictly
    worse than the wide one."""
    from gofeed_spark.operators.similarity import pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    nrm = mat / np.linalg.norm(mat, axis=1)[:, None]
    qids = [int(ids[i]) for i in range(0, len(ids), max(1, len(ids) // 5))][:5]
    truth = {}
    for qid in qids:
        qi = int(np.where(ids == qid)[0][0])
        s = nrm @ nrm[qi]
        s[qi] = -2.0
        truth[qid] = set(ids[np.argsort(-s)[:10]].tolist())

    def recall(n_cents, refine):
        vals = []
        for qid in qids:
            got = {
                r["neighbor_id"]
                for r in pq_topk(
                    emb, query_id=qid, k=10, n_cents=n_cents, refine=refine
                ).collect()
            }
            vals.append(len(got & truth[qid]) / 10)
        return sum(vals) / len(vals)

    # measured r14: (64, 400) -> 0.96, (64, 200) -> 0.86, (16, 200) -> 0.78
    wide = recall(64, 400)
    cheap = recall(16, 12)
    assert wide >= 0.9, f"PQ n_cents=64 refine=400 recall@10 {wide}"
    assert cheap < wide, f"dial is dead: cheap {cheap} vs wide {wide}"


def test_pq_index_probe_equals_fused_pq_topk(spark, tmp_path):
    """The persisted layout must serve the SAME answers as the fused
    operator at the same params: codebooks survive the meta's JSON round
    trip bit-for-bit, so ADC scores and the refine cut are identical."""
    from gofeed_spark.operators.similarity import (
        build_pq_index,
        pq_topk,
        probe_pq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    path = str(tmp_path / "pq")
    meta = build_pq_index(emb, path, n_sub=8, n_cents=16, n_iters=2)
    cbs = np.array(meta["codebooks"])
    assert cbs.shape == (8, 16, 8) and cbs.dtype == np.float64
    pdf = emb.select("vec_id", "embedding").toPandas()
    for qid in (1, 7, 42):
        qv = np.array(
            pdf.loc[pdf["vec_id"] == qid, "embedding"].iloc[0], dtype=np.float64
        )
        got = [
            (r["rank"], r["neighbor_id"])
            for r in probe_pq_index(
                spark, path, qv, k=5, refine=64, exclude_id=qid
            ).collect()
        ]
        want = [
            (r["rank"], r["neighbor_id"])
            for r in pq_topk(
                emb, query_id=qid, k=5, n_sub=8, n_cents=16, refine=64
            ).collect()
        ]
        assert got == want, (qid, got, want)


def test_pq_index_probe_refine_is_partition_pruned(spark, tmp_path):
    from gofeed_spark.operators.similarity import build_pq_index, probe_pq_index

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    path = str(tmp_path / "pq")
    build_pq_index(emb, path, n_sub=8, n_cents=16, n_vec_buckets=16)
    qv = np.array(
        emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"], dtype=np.float64
    )
    out = probe_pq_index(spark, path, qv, k=3, refine=8, exclude_id=3)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "vbkt" in plan
    # the codes relation never appears in the refine plan (ADC already ran)
    assert "codes" not in plan


def test_pq_index_refuses_wrong_or_missing_meta(spark, tmp_path):
    import json
    import os

    import pytest

    from gofeed_spark.operators.similarity import probe_pq_index

    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with open(os.path.join(bad, "_index_meta.json"), "w") as f:
        json.dump({"kind": "something_else"}, f)
    with pytest.raises(ValueError, match="not a PQ index"):
        probe_pq_index(spark, bad, np.zeros(64), k=3)
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(Exception):
        probe_pq_index(spark, empty, np.zeros(64), k=3)


def test_ensure_pq_index_idempotent(spark, tmp_path):
    import os
    import time

    from gofeed_spark.operators.similarity import ensure_pq_index, probe_pq_index

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    path = str(tmp_path / "pq")
    m1 = ensure_pq_index(emb, path, n_sub=8, n_cents=16)
    mtime = os.path.getmtime(os.path.join(path, "_index_meta.json"))
    t0 = time.perf_counter()
    m2 = ensure_pq_index(emb, path, n_sub=8, n_cents=16)
    warm = time.perf_counter() - t0
    assert m2 == m1  # reused, not rebuilt
    assert os.path.getmtime(os.path.join(path, "_index_meta.json")) == mtime
    assert warm < 1.0  # no training passes on the warm call
    # parameter change rebuilds
    m3 = ensure_pq_index(emb, path, n_sub=8, n_cents=32)
    assert m3["n_cents"] == 32
    qv = np.array(
        emb.filter(F.col("vec_id") == 2).collect()[0]["embedding"], dtype=np.float64
    )
    assert probe_pq_index(spark, path, qv, k=3, exclude_id=2).count() == 3


def test_bucket_gram_einsum_bit_identical_to_pair_einsum():
    # The r17 scorer computes per-bucket cosines via the full-gram
    # einsum (ik,jk->ij) and slices the upper triangle; pin that this is
    # BIT-identical to the per-pair form (ij,ij->i over gathered rows) —
    # einsum's sequential reduction over the last axis must not change
    # with the output shape (it would flip threshold-boundary pairs).
    import numpy as np

    rng = np.random.RandomState(7)
    for m, dim in [(2, 64), (62, 64), (200, 64), (5, 7)]:
        sub = rng.standard_normal((m, dim))
        sub = sub / np.linalg.norm(sub, axis=1)[:, None]
        iu, ju = np.triu_indices(m, 1)
        pair = np.einsum("ij,ij->i", sub[iu], sub[ju])
        gram = np.einsum("ik,jk->ij", sub, sub)[iu, ju]
        assert np.array_equal(pair, gram)

"""Similarity search over an embedding column (array<float>).

- ``brute_topk``: exact cosine top-k for one query vector.  One pass over
  the corpus, TakeOrderedAndProject (per-partition heap + driver merge) —
  the correctness baseline and perfectly scalable for single queries.
- ``topk_similar_pairs``: exact top-k most-similar PAIRS (block-joined);
  quadratic — correctness oracle only, never the 100 TB path.
- ``lsh_bucket_topk``: the scale path — signed-random-projection LSH.
  Hyperplanes are deterministic (seeded numpy), shipped as a literal column
  (tiny: n_planes × dim doubles), bucket = sign-bit string.  Probing the
  query's bucket (plus optional multi-probe neighbors) turns top-k into a
  partition-pruned scan of ~corpus/2^planes rows.

All dot products run JVM-side via zip_with/aggregate in DOUBLE — see
functions/vector.py for the bit-compatibility argument vs the oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofeed_spark.functions.parallel import parallel_floor

from gofeed_spark.functions.ranking import with_rank
from gofeed_spark.functions.vector import as_double_array, cosine, dot, l2_norm


def brute_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors of one stored vector.

    Returns (rank INT, neighbor_id) — rank 1 = most similar; ties broken by
    id.  The query vector joins in via broadcast cross-join (1 row).
    """
    emb = parallel_floor(emb)  # split-starved scans → serial Arrow pass
    e = emb.select(F.col(id_col).alias("nid"), as_double_array(vec_col).alias("v"))
    q = e.filter(F.col("nid") == query_id).select(F.col("v").alias("qv"))
    scored = (
        e.filter(F.col("nid") != query_id)
        .crossJoin(F.broadcast(q))
        .select("nid", cosine(F.col("v"), F.col("qv")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("nid").asc())
        .limit(k)
    )
    return with_rank(scored, [F.col("cos").desc(), F.col("nid").asc()]).select(
        "rank", F.col("nid").alias("neighbor_id")
    )


def topk_similar_pairs(
    emb: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k most-cosine-similar pairs (rank, id_a, id_b), a < b.

    O(n²) dot products — the small-corpus oracle twin of the LSH path.

    Small-enough corpora (the only regime callers route here — q43
    self-caps at 4096 rows) score through the broadcast normalized
    matrix: one Arrow pass computes each partition's rows × corpus gram
    in numpy row blocks and emits only the block's top-k survivors under
    the global total order, so no pair row ever crosses the JVM boundary
    — the O(n²) BroadcastNestedLoopJoin + per-element-interpreted cosine
    HOF this replaces was 2 µs/pair (17 s for the capped 4096-row sample
    at sf1.0, vs ~1 Gflop of numpy).  Ties at the k-th cosine keep EVERY
    tied candidate (then the global sort tie-breaks on ids), so clone
    corpora with many cos=1.0 pairs stay exact.  Corpora above
    ``broadcast_limit`` (or with no footer estimate) keep the join form.

    Rank-boundary margin (the q139 discipline, measured r18): this path
    computes cosine as a dot of PRE-normalized vectors while the join
    fallback and the DuckDB oracle compute dot/(|a|*|b|) — a different
    FP rounding.  On the gate corpora the min nonzero adjacent-cosine
    gap at the k=10 boundary is 1.0e-5 (sf0.01, n=500) / 3.5e-7 (sf0.1,
    n=2000) with zero exact-tie rows at the boundary, against a measured
    max ordering delta between the two computations of 1.4e-15 — eight
    orders of margin, so the two forms cannot rank-disagree on these
    corpora.
    """
    emb = parallel_floor(emb)  # split-starved scans → serial Arrow pass
    e = emb.select(F.col(id_col).alias("id"), as_double_array(vec_col).alias("v"))
    from gofeed_spark.catalog import df_rowcount_estimate

    n = df_rowcount_estimate(emb)
    if n is not None and _fits_broadcast(n, False, 1_000_000):
        b_mat, b_ids = _corpus_broadcast(e)
        kk = k

        def block_topk(batches):
            import pandas as pd

            m, sids = b_mat.value, b_ids.value
            for pdf in batches:
                ids = pdf["id"].to_numpy(dtype=np.int64)
                out_a, out_b, out_c = [], [], []
                # row blocks bound the (block × corpus) gram to ~16 MB
                step = max(1, (2 << 20) // max(len(sids), 1))
                for s in range(0, len(ids), step):
                    blk = ids[s : s + step]
                    sub = m[np.searchsorted(sids, blk)]
                    g = np.einsum("ik,jk->ij", sub, m)
                    # a < b only: mask corpus columns at-or-below the row id
                    g[sids[None, :] <= blk[:, None]] = -np.inf
                    flat = g.ravel()
                    t = min(kk, flat.size)
                    if t == 0:
                        continue
                    kth = np.partition(flat, flat.size - t)[flat.size - t]
                    if kth == -np.inf:
                        # fewer than t real pairs in the block
                        cand = np.nonzero(flat > -np.inf)[0]
                    else:
                        cand = np.nonzero(flat >= kth)[0]
                    ri, ci = np.unravel_index(cand, g.shape)
                    out_a.append(blk[ri])
                    out_b.append(sids[ci])
                    out_c.append(flat[cand])
                if out_a:
                    yield pd.DataFrame(
                        {
                            "id_a": np.concatenate(out_a),
                            "id_b": np.concatenate(out_b),
                            "cos": np.concatenate(out_c),
                        }
                    )

        scored = e.select("id").mapInPandas(
            block_topk, "id_a long, id_b long, cos double"
        )
        pairs = (
            scored.orderBy(F.col("cos").desc(), F.col("id_a").asc(), F.col("id_b").asc())
            .limit(k)
        )
        return with_rank(
            pairs, [F.col("cos").desc(), F.col("id_a").asc(), F.col("id_b").asc()]
        ).select("rank", "id_a", "id_b")
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(k)
    )
    return with_rank(
        pairs, [F.col("cos").desc(), F.col("id_a").asc(), F.col("id_b").asc()]
    ).select("rank", "id_a", "id_b")


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _srp_project(vecs: np.ndarray, planes_mat: np.ndarray) -> np.ndarray:
    """SRP projections, einsum NOT gemm: einsum's per-element sequential
    summation is identical across call shapes (batch of B in an executor,
    single query vector on the driver), so a vector's sign bits — and with
    them its bucket — agree between the index writer, the scan operator,
    and the probe.  A blocked gemm can flip the sign of a near-zero
    projection between shapes."""
    return np.einsum("ij,kj->ik", vecs, planes_mat)


def _srp_bucket_strs(vecs: np.ndarray, planes_mat: np.ndarray) -> list[str]:
    proj = _srp_project(vecs, planes_mat)
    return ["".join("1" if x >= 0 else "0" for x in row) for row in proj]


def _srp_bucket_udf(planes: list[list[float]]):
    """Arrow scalar pandas UDF: SRP bucket string for an array<double>
    column, one numpy einsum per batch.  The hot-path replacement for the
    ``srp_bucket`` column expression, whose zip_with/aggregate lambdas
    Catalyst interprets PER ELEMENT (~n_planes × dim evals per row — the
    dominant cost of index builds at any scale)."""
    from pyspark.sql.functions import pandas_udf

    planes_mat = np.asarray(planes, dtype=np.float64)

    # type-hint registration (the PandasUDFType form is deprecated and
    # slated for removal in Spark 4); the stringified hints resolve via
    # the module-global `pd`
    @pandas_udf("string")
    def bucket(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        vecs = np.array(v.tolist(), dtype=np.float64)
        return pd.Series(_srp_bucket_strs(vecs, planes_mat))

    return bucket


def _ivf_sims(vecs: np.ndarray, cmat: np.ndarray, cnorm: np.ndarray) -> np.ndarray:
    """Cosine similarity of each row vector to each coarse centroid — the
    ONE formula both cell assignment (executors) and probe-cell selection
    (driver) must share, in the same einsum call shape, so the query's
    nearest cell is always among the probed cells."""
    norms = np.sqrt(np.einsum("ij,ij->i", vecs, vecs))
    return np.einsum("ij,kj->ik", vecs, cmat) / (norms[:, None] * cnorm[None, :])


def _ivf_cell_udf(cmat: np.ndarray, cnorm: np.ndarray):
    """Arrow scalar pandas UDF: nearest-centroid cell id for an
    array<double> column (one einsum per batch against the tiny broadcast
    codebook)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def cell(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        vecs = np.array(v.tolist(), dtype=np.float64)
        return pd.Series(_ivf_sims(vecs, cmat, cnorm).argmax(axis=1).astype("int32"))

    return cell


def _fits_broadcast(n: int, trusted: bool, broadcast_limit: int) -> bool:
    """Whether an n-row corpus may take the driver-broadcast scorer path.
    The untrusted parquet-footer estimate UNDERCOUNTS self-union/clone
    plans (inputFiles dedups), so it only qualifies with 4× headroom — a
    2-3× undercount can then never toPandas an over-limit corpus onto the
    driver; a trusted bound (explicit hint or exact count) uses the full
    limit."""
    return n <= (broadcast_limit if trusted else broadcast_limit // 4)


# (applicationId, analyzed-plan semantic hash) → broadcast (matrix, ids).
# The normalized corpus matrix is an INDEX artifact: rebuilding it per
# invocation pays a full Arrow collect + normalize + broadcast for bytes
# that are identical every time (inputs are immutable parquet within a
# session, the same assumption as catalog._RELATION_CACHE).  Keyed by
# applicationId so a restarted session can never see a stale broadcast;
# bounded by broadcast_limit per entry and _CORPUS_BROADCAST_CACHE_MAX
# entries (FIFO), with dead-session entries destroyed on every call.
_CORPUS_BROADCAST_CACHE: dict[tuple[str, int], tuple] = {}
_CORPUS_BROADCAST_CACHE_MAX = 8


def _evict_corpus_broadcast(key, destroy: bool = False) -> None:
    """Drop a cache entry.  ``destroy`` only for DEAD-session entries: a
    live session's evicted broadcasts may still be captured in lazy
    DataFrames a caller holds (collect after eviction) — dropping the
    reference lets Spark's ContextCleaner reclaim them once those
    closures die, instead of poisoning the pending plans."""
    for b in _CORPUS_BROADCAST_CACHE.pop(key, ()):
        if destroy:
            try:
                b.destroy()
            except Exception:
                pass  # already destroyed / context gone — nothing to free


def _corpus_broadcast(e: DataFrame) -> tuple:
    """Broadcast (id-sorted normalized matrix, sorted ids) for a corpus
    relation (id, v), cached per session + semantically-equal plan."""
    sc = e.sparkSession.sparkContext
    # Entries keyed by a dead applicationId (session restart) pin their
    # matrices on the driver for the process lifetime: destroy them the
    # moment any caller arrives with a live context.
    for stale in [k for k in _CORPUS_BROADCAST_CACHE if k[0] != sc.applicationId]:
        _evict_corpus_broadcast(stale, destroy=True)
    try:
        key = (sc.applicationId, e._jdf.queryExecution().analyzed().semanticHash())
    except Exception:
        key = None
    if key is not None and key in _CORPUS_BROADCAST_CACHE:
        return _CORPUS_BROADCAST_CACHE[key]
    # Arrow-columnar transfer (no per-row Python Row objects); the same
    # bytes a broadcast join would ship to every executor anyway.
    pdf_local = e.toPandas()
    ids_arr = pdf_local["id"].to_numpy(dtype=np.int64)
    mat = np.stack(pdf_local["v"].to_numpy()).astype(np.float64, copy=False)
    mat = mat / np.linalg.norm(mat, axis=1)[:, None]
    order = np.argsort(ids_arr)
    out = (sc.broadcast(mat[order]), sc.broadcast(ids_arr[order]))
    if key is not None:
        while len(_CORPUS_BROADCAST_CACHE) >= _CORPUS_BROADCAST_CACHE_MAX:
            _evict_corpus_broadcast(next(iter(_CORPUS_BROADCAST_CACHE)))
        _CORPUS_BROADCAST_CACHE[key] = out
    return out


def topk_pairs_lsh(
    emb: DataFrame,
    k: int = 10,
    n_planes: int | None = None,
    n_tables: int = 24,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket: int = 100,
    min_cos: float | None = None,
    broadcast_limit: int = 1_000_000,
    n_hint: int | None = None,
    bucket_cap: int = 2_000,
) -> DataFrame:
    """Top-k most-cosine-similar pairs via multi-table SRP-LSH candidates +
    exact re-rank — the 100 TB replacement for the O(n²) ``topk_similar_pairs``.

    ``n_hint``: approximate corpus row count, used to size the plane count
    and pick the scorer.  Callers that know it (parquet footer metadata, a
    table catalog) should pass it — it saves the one sizing ``count()`` job
    per invocation; only the order of magnitude matters (plane count is a
    log2, the scorer branch a coarse memory bound).

    Plan: ``n_tables`` independent sign-bucket keys per vector (deterministic
    seeded hyperplanes) → explode to (table, bucket) → self-equi-join on the
    SLIM (table, bucket, id) relation (ids only — vectors are re-joined once
    per surviving candidate, avoiding the wide-payload shuffle tax) →
    dedup candidate pairs → exact cosine re-rank → global top-k
    (TakeOrderedAndProject).

    Cost is linear in corpus size + bucket-collision pairs; no cartesian
    product ever forms.  A pair at angle θ collides in ≥1 of L tables with
    probability 1-(1-(1-θ/π)^planes)^L — with the 3×24 default that is
    ≥0.9995 even at cos 0.46 (the hardest pairs in the random test data;
    real near-dup corpora sit at cos≥0.9 where recall is ~1).  Tune planes
    UP as the corpus grows so expected bucket size stays bounded
    (buckets per table = 2^planes).  Deterministic given the seed, so the
    exact-oracle comparison at test SF is stable.

    ``bucket_cap`` bounds the one quadratic surface plane scaling can't
    reach: IDENTICAL vectors land in one bucket in every table no matter
    how many planes, so a clone/template family of m vectors is an m²/2
    pair bomb (and, on the JVM path, an m-sized aggregation buffer).  A
    bucket above the cap emits a linear spanning STAR instead (hub = min
    id, m-1 pairs) — exactly the dedup band guard, and both scorer paths
    share its semantics (``_group_pairs(hot="star")``).  In the saturated
    regime members are near-identical: threshold-mode family connectivity
    is preserved through the hub (star pairs still score exact cosine),
    and top-k mode keeps its deterministic (cos desc, id_a, id_b) winners
    among the retained pairs.  Sub-cap buckets are byte-identical to the
    uncapped behavior; a known ``n_hint <= bucket_cap`` proves no bucket
    can saturate and skips the guard entirely.
    """
    emb = parallel_floor(emb)  # split-starved scans → serial Arrow pass
    if k == -1 and min_cos is None:
        # threshold mode without a threshold would otherwise surface as a
        # TypeError deep inside an executor's pandas UDF — fail at the API
        # boundary instead
        raise ValueError("k=-1 (threshold mode) requires min_cos")
    e = emb.select(F.col(id_col).alias("id"), as_double_array(vec_col).alias("v"))
    # `trusted` marks n as a real upper bound (explicit hint or exact
    # count) vs the footer estimate, which UNDERCOUNTS self-union plans
    # (inputFiles dedups) — fine for order-of-magnitude sizing, not for
    # proving the bucket guard unnecessary.
    trusted = n_hint is not None
    if n_hint is not None:
        n = n_hint
    else:
        # No hint: try parquet footer statistics before paying a COUNT job
        # (order-of-magnitude accuracy is all the sizing below needs).
        from gofeed_spark.catalog import df_rowcount_estimate

        n = df_rowcount_estimate(emb)
        if n is None:
            n = emb.count()
            trusted = True
    if n_planes is None:
        # Bucket count tracks corpus size so expected bucket population (and
        # with it the m² in-bucket pair cost) stays ~constant: planes =
        # log2(n / target_bucket), floored at 3.
        n_planes = max(3, math.ceil(math.log2(max(n / target_bucket, 1.0))))
    # All n_tables × n_planes projections in one numpy matmul per Arrow
    # batch (mapInPandas): the interpreted per-element fold of the
    # column-expression formulation is ~10× slower for this many planes.
    # Vectors cross the Python boundary once; the output is the SLIM
    # (id, table-qualified bucket) relation.
    planes_mat = np.concatenate(
        [_hyperplanes(dim, n_planes, seed=42 + 1000 * t) for t in range(n_tables)]
    )  # (n_tables*n_planes, dim)
    bits_w = np.array([1 << b for b in range(n_planes)], dtype=np.int64)
    nt, npl = n_tables, n_planes

    def bucketize(batches):
        import pandas as pd

        for pdf in batches:
            vecs = np.array(pdf["v"].tolist(), dtype=np.float64)  # (B, dim)
            signs = (vecs @ planes_mat.T) >= 0  # (B, nt*npl)
            codes = signs.reshape(len(vecs), nt, npl) @ bits_w  # (B, nt)
            codes = codes + (np.arange(nt, dtype=np.int64) << int(npl))
            ids = np.repeat(pdf["id"].to_numpy(), nt)
            yield pd.DataFrame({"doc_id": ids, "bh": codes.reshape(-1)})

    keyed = e.mapInPandas(bucketize, "doc_id long, bh long")
    # Candidate scoring.  Small corpora (fits a broadcast comfortably):
    # shuffle ONLY the slim (doc_id, bucket) relation — hash-partitioned by
    # bucket — and score each bucket with one numpy gram matrix against the
    # broadcast normalized corpus.  Candidate PAIRS never materialize as
    # rows crossing the JVM<->Python boundary (at bench scale that was the
    # whole cost: ~1.6M pair rows through Arrow for a 2k corpus); each
    # worker emits only its buckets' top rows / threshold survivors.
    # Large corpora: JVM path — norms precomputed per vector, one dot +
    # one division per pair (no broadcast of the corpus).
    # broadcast_limit's default is sized for the REAL footprint: the matrix
    # is dim×8 bytes/vector (~0.5 GB at dim 64 for 1M) and the Arrow
    # toPandas intermediate (ndarray-of-ndarray) roughly doubles that
    # transiently — far below the multi-GB Row-object cost a .collect()
    # would pay.  (Parameterized so tests can force the JVM path.)
    # A corpus provably no bigger than the cap can't saturate any bucket:
    # skip the guard branches entirely (plan/worker code identical to
    # uncapped).  Requires a TRUSTED bound — the footer estimate alone
    # must not disable a safety guard.
    cap = None if (trusted and n <= bucket_cap) else bucket_cap
    if _fits_broadcast(n, trusted, broadcast_limit):
        b_mat, b_ids = _corpus_broadcast(e)
        keep = None if k == -1 else k * n_tables
        thresh = min_cos

        def bucket_score(batches):
            import pandas as pd

            m, sids = b_mat.value, b_ids.value
            # Concat the partition's Arrow batches BEFORE grouping: a
            # bucket whose rows straddle a batch boundary (batches cap at
            # ~10k rows) would otherwise lose its cross-batch pairs.  The
            # concat is slim — 16 bytes/row — and bounded by partition size.
            frames = list(batches)
            if frames:
                pdf = pd.concat(frames, ignore_index=True)
                out_a, out_b, out_c = [], [], []
                for _, g in pdf.groupby("bh", sort=False):
                    ids = np.unique(g["doc_id"].to_numpy())
                    if len(ids) < 2:
                        continue
                    if cap is not None and len(ids) > cap:
                        # saturated bucket (clone/template family): spanning
                        # STAR only, hub = min id — m-1 pairs instead of
                        # m²/2, the same semantics as the JVM path's
                        # _group_pairs(hot="star") and the dedup band guard
                        over = ids[1:]
                        overv = m[np.searchsorted(sids, over)]
                        hubv = m[np.searchsorted(sids, ids[:1])][0]
                        pa = np.full(len(over), ids[0], dtype=np.int64)
                        pb = over
                        cos = np.einsum("ij,j->i", overv, hubv)
                    else:
                        sub = m[np.searchsorted(sids, ids)]
                        iu, ju = np.triu_indices(len(ids), 1)
                        pa, pb = ids[iu], ids[ju]
                        # einsum (not a gram matmul): keeps the per-pair
                        # summation order identical to the previous scorer
                        # and the oracle's sequential dot — gemm's blocked
                        # accumulation flips pairs sitting exactly on the
                        # threshold boundary.  The ik,jk->ij form computes
                        # the full m×m gram with the SAME sequential
                        # per-element reduction over k (einsum never
                        # dispatches to BLAS without optimize=True), but
                        # reads m×dim rows once instead of gathering two
                        # m²/2×dim pair matrices — ~8× less memory traffic
                        # per bucket (bit-equality pinned in tests).
                        cos = np.einsum("ik,jk->ij", sub, sub)[iu, ju]
                    if keep is None:
                        sel = np.nonzero(cos >= thresh)[0]
                    elif len(cos) > keep:
                        # deterministic per-bucket top-keep under the SAME
                        # total order as the global sort (cos desc, id_a,
                        # id_b) — any globally-top row survives its bucket
                        sel = np.lexsort((pb, pa, -cos))[:keep]
                    else:
                        sel = np.arange(len(cos))
                    out_a.append(pa[sel])
                    out_b.append(pb[sel])
                    out_c.append(cos[sel])
                if out_a:
                    yield pd.DataFrame(
                        {
                            "id_a": np.concatenate(out_a),
                            "id_b": np.concatenate(out_b),
                            "cos": np.concatenate(out_c),
                        }
                    )

        # EXPLICIT partition count: a bare repartition("bh") lets AQE
        # coalesce the slim ~16-byte/row shuffle to 1-2 reducers by BYTE
        # size — but the stage's cost is the per-bucket gram compute, not
        # its bytes, and the whole scorer then ran on 2 of 32 cores
        # (profiled: 7.9 s of 8.3 s at sf1.0).  A user-specified count is
        # exempt from AQE coalescing.  Width tracks the WORK, capped at
        # the session's cores: each (id, bucket) row costs ~mean_bucket ×
        # dim flops (mean bucket ≈ target_bucket by plane sizing), so
        # rows/task is a stable work proxy — a Python-stage task carries
        # ~25 ms of fixed orchestration (measured), so tasks below ~15k
        # rows pay more in overhead than their share of the gram compute
        # returns.  At scale rows ≫ 15k·cores and this is exactly
        # defaultParallelism, the prior behavior.
        scorer_width = max(1, min(
            max(emb.sparkSession.sparkContext.defaultParallelism, 1),
            -(-(n * n_tables) // 15_000),
        ))
        scored = keyed.repartition(
            scorer_width, F.col("bh"),
        ).mapInPandas(bucket_score, "id_a long, id_b long, cos double")
    else:
        # Pair generation = the dedup inverted-index machinery verbatim
        # (one pass, no self-join), including the saturated-bucket star
        # guard: above `cap` no m-sized aggregation buffer ever forms.
        # NOTE: candidates are NOT deduplicated here — a pair colliding in
        # t tables appears t times; a dropDuplicates at this stage is a
        # full shuffle of the candidate set, so each consumer below dedups
        # at its (far smaller) natural point instead.
        from gofeed_spark.operators.dedup import _group_pairs

        cand = _group_pairs(keyed, "bh", df_cap=cap, hot="star", n=n).select(
            F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
        )
        en = e.select("id", "v", l2_norm(F.col("v")).alias("nrm")).persist()
        va = en.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
        vb = en.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
        scored = cand.join(va, "id_a").join(vb, "id_b").select(
            "id_a",
            "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
    if k == -1:
        # threshold mode (embedding_neardup_pairs): dedup AFTER the
        # threshold filter, when the set is already small
        return (
            scored.filter(F.col("cos") >= min_cos)
            .dropDuplicates(["id_a", "id_b"])
            .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
        )
    # A pair occurs at most n_tables times, so the top k·n_tables scored
    # rows are guaranteed to contain k distinct pairs: TakeOrdered that
    # tiny prefix, then dedup driver-cheap rows instead of shuffling the
    # full candidate set.
    topk = (
        scored.orderBy(F.col("cos").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(k * n_tables)
        .dropDuplicates(["id_a", "id_b"])
        .orderBy(F.col("cos").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(k)
    )
    return with_rank(
        topk, [F.col("cos").desc(), F.col("id_a").asc(), F.col("id_b").asc()]
    ).select("rank", "id_a", "id_b")


def srp_bucket(vec_col, planes: list[list[float]]):
    """Signed-random-projection bucket id (string of sign bits) for an
    array<double> column — pure column expression.

    Retained for pure-SQL/no-Python contexts; NOT the hot path.  Catalyst
    interprets the zip_with/aggregate lambdas per element, and the JVM
    fold's summation order differs from numpy's, so buckets from this
    expression and from ``_srp_bucket_udf`` may disagree on vectors whose
    projection is within float rounding of zero — never mix the two for
    one index."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_bucket_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 3,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's SRP bucket.

    At 100 TB, write the corpus bucketed/partitioned by this key so the
    probe is a partition-pruned read; here it is a filtered scan.
    """
    planes = _hyperplanes(dim, n_planes)
    e = emb.select(F.col(id_col).alias("nid"), as_double_array(vec_col).alias("v"))
    e = e.withColumn("bucket", _srp_bucket_udf(planes)(F.col("v")))
    q = e.filter(F.col("nid") == query_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    scored = (
        e.filter(F.col("nid") != query_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select("nid", cosine(F.col("v"), F.col("qv")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("nid").asc())
        .limit(k)
    )
    return with_rank(scored, [F.col("cos").desc(), F.col("nid").asc()]).select(
        "rank", F.col("nid").alias("neighbor_id")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    min_cos: float = 0.9,
    n_planes: int | None = None,
    n_tables: int = 24,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_limit: int = 1_000_000,
    n_hint: int | None = None,
    bucket_cap: int = 2_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos) with
    cos >= min_cos, id_a < id_b — the semantic-dedup operator for training
    corpora (near-identical items under paraphrase/re-encode survive text
    dedup but not this).  A clone family larger than ``bucket_cap`` emits
    hub-star pairs for the overflow (cos 1 for clones → they pass the
    threshold), so ``neardup_clusters`` still recovers the whole family
    while pair volume stays linear.

    Same LSH candidate machinery as ``topk_pairs_lsh`` (linear, slim
    shuffles) with a threshold filter instead of a global top-k.  At the
    dedup-relevant regime (cos >= 0.9) candidate recall is ~1; identical
    vectors are found with certainty (identical projections in every
    table).
    """
    emb = parallel_floor(emb)  # split-starved scans → serial Arrow pass
    all_pairs = topk_pairs_lsh(
        emb,
        k=-1,  # sentinel: no global limit (threshold filter instead)
        n_planes=n_planes,
        n_tables=n_tables,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        min_cos=min_cos,
        broadcast_limit=broadcast_limit,
        n_hint=n_hint,
        bucket_cap=bucket_cap,
    )
    return all_pairs


def ivf_codebook(
    e: DataFrame,
    n_cells: int,
    n_iters: int = 2,
    sample_cap: int = 100_000,
) -> np.ndarray:
    """Coarse IVF codebook (n_cells × dim, float64), deterministic.

    Seeding: the ``n_cells`` lowest-id vectors (reproducible without an RNG
    pass).  ``n_iters`` Lloyd iterations then tighten the cells — seeded
    centroids can all land in one dense region, leaving other regions split
    across far-away cells and forcing probes to a higher n_probe for the
    same recall.  Each iteration is ONE distributed pass: every partition
    assigns its vectors to the nearest centroid (same ``_ivf_sims`` einsum
    as the index writer) and emits per-cell partial (sum, count) — an
    (n_cells × dim) matrix per partition, never the vectors — which the
    driver reduces and divides.  No shuffle; the collected partials are
    bounded by partitions × n_cells rows.

    Determinism: fixed seeding, argmax tie→lowest cell, float64 partial
    sums reduced in collect order (stable for a deterministic input
    layout); an empty cell keeps its previous centroid.  ``sample_cap``
    bounds the refinement input — above it a deterministic xxhash64 id
    filter thins the corpus (a codebook needs a representative sample, not
    every row; the final assignment pass always sees the full corpus).
    """
    cents = e.orderBy("nid").limit(n_cells).collect()
    cmat = np.array([r.v for r in cents], dtype=np.float64)
    if n_iters <= 0 or len(cmat) == 0:
        return cmat
    # A corpus smaller than n_cells seeds fewer centroids than asked for:
    # clamp the cell count to the actual seed count so the partial-sum
    # arrays and the seed matrix agree (refining m cells of an m-row
    # corpus is the identity, but the general path handles it uniformly).
    n_cells = len(cmat)
    sample = e.select("nid", "v")
    from gofeed_spark.catalog import df_rowcount_estimate

    n_est = df_rowcount_estimate(e)
    if n_est is not None and n_est > sample_cap:
        every = max(2, n_est // sample_cap)
        sample = sample.filter(F.pmod(F.xxhash64("nid"), F.lit(every)) == 0)
    dim = cmat.shape[1]

    def make_partials(codebook: np.ndarray, codebook_norm: np.ndarray):
        def partials(batches):
            import pandas as pd

            s = np.zeros((n_cells, dim), dtype=np.float64)
            cnt = np.zeros(n_cells, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vecs = np.array(pdf["v"].tolist(), dtype=np.float64)
                a = _ivf_sims(vecs, codebook, codebook_norm).argmax(axis=1)
                np.add.at(cnt, a, 1)
                np.add.at(s, a, vecs)
            yield pd.DataFrame(
                {"cell": np.arange(n_cells, dtype=np.int32), "cnt": cnt, "s": list(s)}
            )

        return partials

    for _ in range(n_iters):
        cnorm = np.linalg.norm(cmat, axis=1)
        rows = sample.mapInPandas(
            make_partials(cmat, cnorm), "cell int, cnt long, s array<double>"
        ).collect()
        total = np.zeros((n_cells, dim), dtype=np.float64)
        counts = np.zeros(n_cells, dtype=np.int64)
        for r in rows:
            total[r.cell] += np.asarray(r.s, dtype=np.float64)
            counts[r.cell] += r.cnt
        nonempty = counts > 0
        cmat = cmat.copy()
        cmat[nonempty] = total[nonempty] / counts[nonempty, None]
    return cmat


def ivf_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer assigns
    every vector to its nearest of ``n_cells`` centroids; a query scans only
    the ``n_probe`` cells nearest to it.

    The coarse codebook comes from ``ivf_codebook`` (lowest-id seeding +
    ``n_iters`` deterministic Lloyd refinements).  At warehouse scale the
    corpus is WRITTEN partitioned by ``cell`` so the probe is partition
    pruning on disk; here it is a filtered scan.

    Cell assignment is one numpy einsum per Arrow batch against the
    broadcast centroid matrix (n_cells × dim — always tiny); the query's
    probe cells come from the SAME formula on the driver (``_ivf_sims``),
    so the query's own cell is always probed.  Scoring within probed cells
    is the same JVM dot-product path as brute_topk.  Nothing is persisted:
    the single assignment pass runs inside the caller's one action (the
    previous formulation persisted the assigned frame for a query-row
    lookup and leaked the cache for the session's lifetime).
    """
    e = emb.select(F.col(id_col).alias("nid"), as_double_array(vec_col).alias("v"))
    cmat = ivf_codebook(e, n_cells, n_iters=n_iters)
    cnorm = np.linalg.norm(cmat, axis=1)
    qv = np.array(
        e.filter(F.col("nid") == query_id).collect()[0].v, dtype=np.float64
    )
    qsims = _ivf_sims(qv[None, :], cmat, cnorm)[0]
    probe = [int(c) for c in np.argsort(-qsims)[:n_probe]]
    cells = e.withColumn("cell", _ivf_cell_udf(cmat, cnorm)(F.col("v")))
    qdf = emb.sparkSession.createDataFrame([(qv.tolist(),)], "qv array<double>")
    scored = (
        cells.filter(F.col("cell").isin(probe) & (F.col("nid") != query_id))
        .crossJoin(F.broadcast(qdf))
        .select("nid", cosine(F.col("v"), F.col("qv")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("nid").asc())
        .limit(k)
    )
    return with_rank(scored, [F.col("cos").desc(), F.col("nid").asc()]).select(
        "rank", F.col("nid").alias("neighbor_id")
    )


def _with_int8_quantization(e: DataFrame) -> DataFrame:
    """Replace the ``v`` array<double> column with int8 scalar quantization:
    per-vector ``scale`` = max|x|/127 and ``q`` = round(x/scale) as
    array<tinyint> — 8× narrower vector bytes in the stored layout (the
    100 TB serving lever: a probe's pruned read scans a quarter or less of
    the float layout's bytes; cosine is scale-invariant, so the only error
    is the rounding, measured by the quantized recall gate).

    ``scale`` is materialized as a column BEFORE the transform lambda
    references it (the inlined expression would re-evaluate the array_max
    per element).  An all-zero vector keeps scale=0 and quantizes to
    zeros."""
    e = e.withColumn(
        "scale", F.array_max(F.transform("v", lambda x: F.abs(x))) / F.lit(127.0)
    )
    return e.withColumn(
        "q",
        F.when(
            F.col("scale") == 0.0,
            F.transform("v", lambda x: F.lit(0).cast("tinyint")),
        ).otherwise(
            F.transform("v", lambda x: F.round(x / F.col("scale")).cast("tinyint"))
        ),
    ).drop("v")


def _dequantized(idx: DataFrame) -> DataFrame:
    """Reconstruct ``v`` from a quantized index read (q * scale)."""
    return idx.withColumn(
        "v", F.transform("q", lambda x: x.cast("double") * F.col("scale"))
    )


def build_ann_index(
    emb: DataFrame,
    path: str,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = False,
    meta_cols: tuple = (),
) -> None:
    """Materialize the SRP-LSH layout ``lsh_bucket_topk``'s docstring
    promises: the corpus WRITTEN partitioned by sign-bucket, so a probe is
    a partition-PRUNED read (the scan's PartitionFilters skips every other
    bucket's files on disk) instead of a filtered full scan.  This is the
    100 TB ANN serving shape: pay the layout once, then every query reads
    ~corpus/2^planes rows.

    The write repartitions BY the bucket key first: without it every input
    task writes a file into every bucket directory (tasks × 2^planes small
    files — the small-file storm that kills object-store listings); with
    it each bucket's rows are clustered into one task → O(2^planes) files
    total."""
    emb = parallel_floor(emb)  # split-starved scans → serial Arrow pass
    planes = _hyperplanes(dim, n_planes)
    # ``meta_cols`` ride into the layout as plain parquet columns: a
    # filtered probe (probe_ann_index ``where``) pushes its predicate into
    # the pruned scan — filtered vector search without a second index.
    e = emb.select(
        F.col(id_col).alias("nid"),
        as_double_array(vec_col).alias("v"),
        *[F.col(c) for c in meta_cols],
    )
    # The 'b' prefix keeps the partition value NON-NUMERIC: a bare bit
    # string ("0101") is re-inferred as INT on read, which drops leading
    # zeros — and under non-ANSI IN-list coercion the column's string form
    # ("101") then never equals the probe's ("0101"), silently losing every
    # leading-zero bucket from a multi-probe.  A string partition value is
    # byte-compared under every ANSI/coercion setting.
    e = e.withColumn(
        "bucket", F.concat(F.lit("b"), _srp_bucket_udf(planes)(F.col("v")))
    )
    if quantize:
        # bucket is computed on the FULL-precision vector (sign decisions
        # near a hyperplane must match the probe's driver-side projection);
        # only the stored payload narrows to int8
        e = _with_int8_quantization(e)
    from gofeed_spark.fs import get_filesystem
    from gofeed_spark.sources.io import write_partitioned

    write_partitioned(
        e.repartition("bucket"),
        get_filesystem(path).spark_path(path),
        partition_by=["bucket"],
    )


def _multiprobe_buckets(
    qv: np.ndarray, planes_mat: np.ndarray, radius: int
) -> list[str]:
    """The query's SRP bucket plus every bucket within Hamming distance
    ``radius``, enumerated in increasing flip-cost order: bits flip in
    ascending |projection| (the sign decisions nearest the hyperplane are
    the likeliest to differ for a true neighbor) — multi-probe LSH per Lv
    et al. (VLDB'07), public technique."""
    import itertools

    proj = _srp_project(qv[None, :], planes_mat)[0]
    base = ["1" if x >= 0 else "0" for x in proj]
    flip_order = np.argsort(np.abs(proj))
    out = ["".join(base)]
    for r in range(1, min(radius, len(base)) + 1):
        for combo in itertools.combinations(flip_order, r):
            b = list(base)
            for i in combo:
                b[i] = "0" if b[i] == "1" else "1"
            out.append("".join(b))
    return out


def probe_ann_index(
    spark,
    path: str,
    query_vec,
    k: int = 3,
    n_planes: int = 4,
    dim: int = 64,
    exclude_id: int | None = None,
    multiprobe: int = 0,
    where=None,
) -> DataFrame:
    """Top-k cosine probe against a ``build_ann_index`` layout.  The query's
    bucket is computed on the driver with the SAME einsum call shape the
    index writer's UDF used (``_srp_project`` — identical summation order,
    so the sign bit of even a near-zero projection matches; no 1-row Spark
    job).  The read prunes to that bucket's directory — verify with
    ``PartitionFilters: [isnotnull(bucket), (bucket = ...)]``.

    ``multiprobe``: also probe every bucket within that Hamming distance
    (still a partition-pruned multi-directory read, the SRP twin of IVF's
    ``n_probe``).  Recall/scan is a dial: on structured corpora the single
    bucket suffices; on unstructured ones radius r scans ~Σ C(planes,i)/2^planes
    of the corpus — see test_similarity.py's recall@10 gate for measured
    points."""
    from gofeed_spark.fs import get_filesystem

    planes = _hyperplanes(dim, n_planes)
    qv = np.asarray(query_vec, dtype=np.float64)
    planes_mat = np.asarray(planes, dtype=np.float64)
    data_path = get_filesystem(path).spark_path(path)
    if multiprobe > 0:
        probe_buckets = [
            "b" + b for b in _multiprobe_buckets(qv, planes_mat, multiprobe)
        ]
        idx = spark.read.parquet(data_path).filter(
            F.col("bucket").isin(probe_buckets)
        )
    else:
        bucket = "b" + _srp_bucket_strs(qv[None, :], planes_mat)[0]
        idx = spark.read.parquet(data_path).filter(F.col("bucket") == bucket)
    if where is not None:
        # metadata predicate (filtered vector search): applied before the
        # dequantize projection so Catalyst pushes it into the pruned scan
        # (PushedFilters on the meta column, beside the PartitionFilters)
        idx = idx.filter(where)
    if "q" in idx.columns:  # int8-quantized layout: reconstruct v in-plan
        idx = _dequantized(idx)
    if exclude_id is not None:
        idx = idx.filter(F.col("nid") != exclude_id)
    qdf = spark.createDataFrame([(qv.tolist(),)], "qv array<double>")
    scored = (
        idx.crossJoin(F.broadcast(qdf))
        .select("nid", cosine(F.col("v"), F.col("qv")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("nid").asc())
        .limit(k)
    )
    return with_rank(scored, [F.col("cos").desc(), F.col("nid").asc()]).select(
        "rank", F.col("nid").alias("neighbor_id")
    )


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 2,
    quantize: bool = False,
    meta_cols: tuple = (),
) -> np.ndarray:
    """Materialize the IVF layout (corpus partitioned by coarse cell) and
    return the codebook (n_cells × dim, Lloyd-refined via ``ivf_codebook``).
    Probes prune to n_probe cell directories — ``ivf_topk``'s
    warehouse-scale shape made real.  Rows are repartitioned by cell before
    the write (one task per cell → O(n_cells) files, not tasks ×
    n_cells).  ``quantize`` stores the int8 payload instead of the float
    vector (see ``_with_int8_quantization``) — cell assignment stays
    full-precision."""
    emb = parallel_floor(emb)  # split-starved scans → serial Arrow pass
    e = emb.select(
        F.col(id_col).alias("nid"),
        as_double_array(vec_col).alias("v"),
        *[F.col(c) for c in meta_cols],
    )
    cmat = ivf_codebook(e, n_cells, n_iters=n_iters)
    cnorm = np.linalg.norm(cmat, axis=1)
    cells = e.withColumn("cell", _ivf_cell_udf(cmat, cnorm)(F.col("v")))
    if quantize:
        cells = _with_int8_quantization(cells)
    from gofeed_spark.fs import get_filesystem
    from gofeed_spark.sources.io import write_partitioned

    write_partitioned(
        cells.repartition("cell"),
        get_filesystem(path).spark_path(path),
        partition_by=["cell"],
    )
    return cmat


def probe_ivf_index(
    spark,
    path: str,
    codebook: np.ndarray,
    query_vec,
    k: int = 3,
    n_probe: int = 4,
    exclude_id: int | None = None,
    where=None,
) -> DataFrame:
    """Top-k cosine probe over the ``n_probe`` nearest cells of a
    ``build_ivf_index`` layout — a partition-pruned multi-directory read.
    Probe cells come from the same ``_ivf_sims`` einsum the writer's cell
    assignment used, so the query's nearest cell is always probed."""
    from gofeed_spark.fs import get_filesystem

    qv = np.asarray(query_vec, dtype=np.float64)
    cmat = np.asarray(codebook, dtype=np.float64)
    qsims = _ivf_sims(qv[None, :], cmat, np.linalg.norm(cmat, axis=1))[0]
    probe = [int(c) for c in np.argsort(-qsims)[:n_probe]]
    idx = spark.read.parquet(get_filesystem(path).spark_path(path)).filter(
        F.col("cell").isin(probe)
    )
    if where is not None:
        # filtered vector search (see probe_ann_index): pushed into the
        # pruned scan beside the cell PartitionFilters
        idx = idx.filter(where)
    if "q" in idx.columns:  # int8-quantized layout: reconstruct v in-plan
        idx = _dequantized(idx)
    if exclude_id is not None:
        idx = idx.filter(F.col("nid") != exclude_id)
    qdf = spark.createDataFrame([(qv.tolist(),)], "qv array<double>")
    scored = (
        idx.crossJoin(F.broadcast(qdf))
        .select("nid", cosine(F.col("v"), F.col("qv")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("nid").asc())
        .limit(k)
    )
    return with_rank(scored, [F.col("cos").desc(), F.col("nid").asc()]).select(
        "rank", F.col("nid").alias("neighbor_id")
    )


_INDEX_META = "_index_meta.json"


def _corpus_fingerprint(emb: DataFrame) -> str | None:
    """Cheap corpus identity for index staleness: a hash over the sorted
    input file paths plus each file's size/mtime (local paths) and the
    parquet-footer row count — metadata only, no data read.  Regenerated
    input (e.g. testdata rewritten between rounds) changes the fingerprint,
    so a warm ``ensure_*`` call rebuilds instead of silently serving an
    index built from the old corpus.  Returns None for in-memory frames
    (no files to fingerprint) — those callers get the parameter-only
    match, documented as build-once semantics."""
    import hashlib
    import os

    try:
        files = sorted(emb.inputFiles())
    except Exception:
        files = []
    if not files:
        return None
    h = hashlib.sha256()
    for f in files:
        h.update(f.encode())
        local = f[7:] if f.startswith("file://") else f
        try:
            st = os.stat(local)
            h.update(f"|{st.st_size}|{st.st_mtime_ns}".encode())
        except OSError:
            pass  # non-local path: the name list still fingerprints
    from gofeed_spark.catalog import df_rowcount_estimate

    h.update(str(df_rowcount_estimate(emb)).encode())
    return h.hexdigest()


def _index_matches(path: str, meta: dict) -> dict | None:
    """Stored meta when ``path`` holds a completed index built with exactly
    ``meta``'s parameters, else None (absent, incomplete, or stale)."""
    import json

    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(path)
    try:
        stored = json.loads(fs.read_bytes(fs.join(path, _INDEX_META)))
    except (OSError, json.JSONDecodeError):
        return None
    return stored if all(stored.get(k) == v for k, v in meta.items()) else None


def _write_index_meta(path: str, meta: dict) -> None:
    """Atomic meta publish through the filesystem seam — POSIX gets
    write-temp + replace, object stores a single PUT; either way this is
    THE commit point for every pointer-flip index lifecycle."""
    import json

    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(path)
    fs.put_bytes(fs.join(path, _INDEX_META), json.dumps(meta).encode())


def ensure_ann_index(
    emb: DataFrame,
    path: str,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = False,
) -> str:
    """Idempotent ``build_ann_index``: build the SRP layout at ``path``
    once, then reuse it for every subsequent probe — the serving shape,
    where the layout cost amortizes over the probe stream instead of being
    paid per query (q79 rebuilds per run because the correctness gate
    demands self-contained queries; production callers use this).

    The build's parameters AND a corpus fingerprint (input file paths /
    sizes / footer counts) land in ``_index_meta.json`` AFTER the write
    completes (ordering = completion marker, like Spark's _SUCCESS); a
    matching meta short-circuits without reading ``emb``'s data, anything
    else (absent, interrupted build, different params, regenerated corpus
    files) rebuilds from scratch."""
    from gofeed_spark.fs import get_filesystem

    meta = {
        "kind": "srp",
        "n_planes": n_planes,
        "dim": dim,
        # bump when the on-disk bucket format changes (2 = 'b'-prefixed
        # string partition values) so stale layouts rebuild, never mismatch
        "layout": 2,
        "quantize": quantize,
        "corpus": _corpus_fingerprint(emb),
    }
    if _index_matches(path, meta) is not None:
        return path
    get_filesystem(path).delete_tree(path)
    build_ann_index(
        emb, path, n_planes=n_planes, dim=dim, id_col=id_col, vec_col=vec_col,
        quantize=quantize,
    )
    _write_index_meta(path, meta)
    return path


def ensure_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 2,
    quantize: bool = False,
) -> np.ndarray:
    """Idempotent ``build_ivf_index``: the codebook rides in the meta file,
    so a warm call returns it (and probes partition-prune the existing
    layout) with ZERO Spark jobs — probe cost only."""
    from gofeed_spark.fs import get_filesystem

    meta = {
        "kind": "ivf",
        "n_cells": n_cells,
        "n_iters": n_iters,
        "quantize": quantize,
        "corpus": _corpus_fingerprint(emb),
    }
    stored = _index_matches(path, meta)
    if stored is not None:
        return np.asarray(stored["codebook"], dtype=np.float64)
    get_filesystem(path).delete_tree(path)
    cmat = build_ivf_index(
        emb, path, n_cells=n_cells, id_col=id_col, vec_col=vec_col,
        n_iters=n_iters, quantize=quantize,
    )
    _write_index_meta(path, {**meta, "codebook": cmat.tolist()})
    return cmat


def semantic_contamination(
    emb: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic train/eval decontamination: each corpus vector's MAX cosine
    against ANY benchmark vector, plus the verdict — (id, max_cos,
    contaminated).  The embedding twin of ``dedup.contamination_check``:
    catches paraphrase/translation leaks that n-gram overlap misses.

    Scale shape (same asymmetry as the n-gram check): evaluation suites
    are bounded, so the benchmark collapses to one broadcast matrix
    (rows × dim float64 — MBs), and the 100 TB corpus pays a single Arrow
    ``mapInPandas`` pass of ``_ivf_sims`` — einsum dots over the
    norm-product, the SAME summation shape as the SQL oracle's
    ``list_dot_product / (sqrt·sqrt)``, so rounded values hash-match.  No
    join, no shuffle; the corpus never moves.  The verdict compares the
    UNROUNDED max (like the oracle); rounding is presentation only.
    """
    emb = parallel_floor(emb)  # split-starved scans → serial Arrow pass
    b_rows = benchmark.select(as_double_array(vec_col).alias("v")).collect()
    bmat = np.array([r.v for r in b_rows], dtype=np.float64)
    sc = emb.sparkSession.sparkContext
    b = sc.broadcast((bmat, np.linalg.norm(bmat, axis=1) if len(bmat) else None))

    def run(batches):
        import pandas as pd

        mat, bnorm = b.value
        for pdf in batches:
            if len(mat) == 0 or len(pdf) == 0:
                mc = np.zeros(len(pdf), dtype=np.float64)
            else:
                vecs = np.array(pdf["v"].tolist(), dtype=np.float64)
                mc = _ivf_sims(vecs, mat, bnorm).max(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "max_cos": mc,
                    "contaminated": (mc >= threshold).astype("int32"),
                }
            )

    e = emb.select(F.col(id_col).alias("id"), as_double_array(vec_col).alias("v"))
    id_type = emb.schema[id_col].dataType.simpleString()
    out = e.mapInPandas(run, f"id {id_type}, max_cos double, contaminated int")
    return out.select(
        F.col("id").alias(id_col),
        F.round("max_cos", 6).alias("max_cos"),
        "contaminated",
    )


def label_centroid_norms_udaf(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid norm via a pandas GROUPED_AGG UDAF — the
    user-defined-aggregate surface (the reference has none; Spark-native
    engines need one for vector math that built-ins can't fold).

    Semantics identical to ``label_centroid_norms``; the posexplode
    formulation remains the preferred plan for very wide groups (it never
    materializes a group's vectors in one worker), while this one is a
    single shuffle with Arrow-batched numpy per group."""
    # Series -> scalar hints select the grouped-agg type; the stringified
    # hints (`from __future__ import annotations`) resolve via the
    # module-global `pd`
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def centroid_norm(vecs: pd.Series) -> float:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        return float(np.sqrt((mat.mean(axis=0) ** 2).sum()))

    return (
        emb.select(F.col(label_col).alias("label"), as_double_array(vec_col).alias("v"))
        .groupBy("label")
        .agg(F.round(centroid_norm("v"), 6).alias("centroid_norm"))
    )


def label_centroid_norms(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid (elementwise mean) L2 norm, rounded to 1e-6.

    posexplode → (label, pos) mean → re-aggregate Σm² — two skinny shuffles,
    never materializing centroids wider than the embedding dim.
    """
    emb = parallel_floor(emb)  # split-starved scans → serial Arrow pass
    ex = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(as_double_array(vec_col)).alias("pos", "x"),
    )
    means = ex.groupBy("label", "pos").agg(F.avg("x").alias("m"))
    return (
        means.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm"))
    )


# --- Product quantization (PQ) -------------------------------------------------
def pq_codebooks(
    e: DataFrame,
    n_sub: int = 8,
    n_cents: int = 16,
    n_iters: int = 2,
    sample_cap: int = 100_000,
) -> np.ndarray:
    """Per-subspace PQ codebooks (n_sub × n_cents × sub_dim, float64),
    deterministic — the Jégou et al. 2011 layout: split each vector into
    ``n_sub`` contiguous sub-vectors and k-means each subspace
    independently (L2, the standard PQ metric).

    Same discipline as ``ivf_codebook``: lowest-id seeding (no RNG pass),
    each Lloyd iteration is ONE distributed Arrow pass emitting per-
    (subspace, cell) partial (sum, count) — n_sub·n_cents slim rows per
    partition, never the vectors — reduced on the driver; argmin ties take
    the lowest cell; an empty cell keeps its previous centroid;
    ``sample_cap`` thins the refinement input by a deterministic xxhash64
    filter above the cap.
    """
    seeds = e.orderBy("nid").limit(n_cents).collect()
    smat = np.array([r.v for r in seeds], dtype=np.float64)
    if len(smat) == 0:
        return np.zeros((n_sub, 0, 0))
    dim = smat.shape[1]
    if dim % n_sub != 0:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sub_dim = dim // n_sub
    n_cents = len(smat)  # corpus smaller than n_cents: clamp (ivf convention)
    cbs = smat.reshape(len(smat), n_sub, sub_dim).transpose(1, 0, 2).copy()
    if n_iters <= 0:
        return cbs
    sample = e.select("nid", "v")
    from gofeed_spark.catalog import df_rowcount_estimate

    n_est = df_rowcount_estimate(e)
    if n_est is not None and n_est > sample_cap:
        every = max(2, n_est // sample_cap)
        sample = sample.filter(F.pmod(F.xxhash64("nid"), F.lit(every)) == 0)

    def make_partials(codebooks: np.ndarray):
        def partials(batches):
            import pandas as pd

            s = np.zeros((n_sub, n_cents, sub_dim), dtype=np.float64)
            cnt = np.zeros((n_sub, n_cents), dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vecs = np.array(pdf["v"].tolist(), dtype=np.float64)
                subs = vecs.reshape(len(vecs), n_sub, sub_dim)
                for si in range(n_sub):
                    a = _pq_assign(subs[:, si, :], codebooks[si])
                    np.add.at(cnt[si], a, 1)
                    np.add.at(s[si], a, subs[:, si, :])
            idx = np.indices((n_sub, n_cents)).reshape(2, -1)
            yield pd.DataFrame(
                {
                    "sub": idx[0].astype(np.int32),
                    "cell": idx[1].astype(np.int32),
                    "cnt": cnt.reshape(-1),
                    "s": list(s.reshape(-1, sub_dim)),
                }
            )

        return partials

    for _ in range(n_iters):
        rows = sample.mapInPandas(
            make_partials(cbs), "sub int, cell int, cnt long, s array<double>"
        ).collect()
        total = np.zeros((n_sub, n_cents, sub_dim), dtype=np.float64)
        counts = np.zeros((n_sub, n_cents), dtype=np.int64)
        for r in rows:
            total[r.sub, r.cell] += np.asarray(r.s, dtype=np.float64)
            counts[r.sub, r.cell] += r.cnt
        nonempty = counts > 0
        cbs = cbs.copy()
        cbs[nonempty] = total[nonempty] / counts[nonempty][:, None]
    return cbs


def _pq_assign(subvecs: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """argmin L2 (ties → lowest cell): argmin |c|² − 2·x·c per sub-vector."""
    d = (cb * cb).sum(axis=1)[None, :] - 2.0 * (subvecs @ cb.T)
    return d.argmin(axis=1)


def pq_bits(n_cents: int) -> int:
    b = max(1, int(math.ceil(math.log2(max(2, n_cents)))))
    return b


def pq_codes(e: DataFrame, cbs: np.ndarray) -> DataFrame:
    """Encode every vector to ONE packed int64 code (n_sub · log2(n_cents)
    bits — 8 subspaces × 16 centroids = 32 bits, a 128× narrower scan
    payload than the raw 64-dim float64 vector).  One Arrow pass."""
    n_sub, n_cents, sub_dim = cbs.shape
    bits = pq_bits(n_cents)
    if n_sub * bits > 62:
        raise ValueError("packed code exceeds int64")

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.array(pdf["v"].tolist(), dtype=np.float64)
            subs = vecs.reshape(len(vecs), n_sub, sub_dim)
            code = np.zeros(len(vecs), dtype=np.int64)
            for si in range(n_sub):
                code |= _pq_assign(subs[:, si, :], cbs[si]).astype(np.int64) << (
                    bits * si
                )
            yield pd.DataFrame({"nid": pdf["nid"], "code": code})

    return e.select("nid", "v").mapInPandas(encode, "nid long, code long")


def pq_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 3,
    n_sub: int = 8,
    n_cents: int = 16,
    n_iters: int = 2,
    refine: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate top-k with asymmetric distance computation (ADC) +
    exact re-rank: the candidate scan touches ONLY the packed int64 codes
    (the memory-bounded 100 TB serving shape — ~16 B/vector of scan
    instead of 512 B), scoring each code against the query's per-subspace
    lookup tables (dot and ‖ĉ‖² gathers, pure numpy per Arrow batch); the
    top ``refine`` candidates by approximate cosine then pay an exact
    JVM-side cosine re-rank against their true vectors, so the final
    ranking is exact over the candidate set.  Returns (rank, neighbor_id),
    ties by id — the brute_topk contract.

    Recall floor is MEASURED in tests/test_similarity.py (organic 64-dim
    sf0.1 vectors): refine=8k recall@10, plus the clone self-match
    invariant q149 registers.  ``refine`` defaults to max(32, 8k).
    """
    refine = int(refine if refine is not None else max(32, 8 * k))
    emb = parallel_floor(emb)  # split-starved scans → serial Arrow passes
    # localCheckpoint: the normalized frame feeds ~6 jobs (seed collect,
    # each Lloyd pass, the query fetch, encode, refine) — without it every
    # job re-runs the upstream scan/union/cast (measured 12→7 s at sf1.0)
    e = emb.select(
        F.col(id_col).alias("nid"), as_double_array(vec_col).alias("v")
    ).localCheckpoint()
    cbs = pq_codebooks(e, n_sub=n_sub, n_cents=n_cents, n_iters=n_iters)
    n_sub, n_cents, sub_dim = cbs.shape
    bits = pq_bits(n_cents)
    qv = np.array(
        e.filter(F.col("nid") == query_id).collect()[0].v, dtype=np.float64
    )
    qsub = qv.reshape(n_sub, sub_dim)
    dots = np.einsum("sd,scd->sc", qsub, cbs)  # q_s · c[s,j]
    norm2 = (cbs * cbs).sum(axis=2)  # |c[s,j]|²
    qn = float(np.linalg.norm(qv))
    mask = (1 << bits) - 1

    def adc(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            code = pdf["code"].to_numpy(dtype=np.int64)
            dot = np.zeros(len(code))
            vn2 = np.zeros(len(code))
            for si in range(n_sub):
                cells = (code >> (bits * si)) & mask
                dot += dots[si][cells]
                vn2 += norm2[si][cells]
            denom = qn * np.sqrt(np.maximum(vn2, 1e-300))
            yield pd.DataFrame({"nid": pdf["nid"], "acos": dot / denom})

    codes = pq_codes(e, cbs)
    cands = (
        codes.filter(F.col("nid") != query_id)
        .mapInPandas(adc, "nid long, acos double")
        .orderBy(F.col("acos").desc(), F.col("nid").asc())
        .limit(refine)
    )
    qdf = emb.sparkSession.createDataFrame([(qv.tolist(),)], "qv array<double>")
    scored = (
        cands.join(e, "nid")
        .crossJoin(F.broadcast(qdf))
        .select("nid", cosine(F.col("v"), F.col("qv")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("nid").asc())
        .limit(k)
    )
    return with_rank(scored, [F.col("cos").desc(), F.col("nid").asc()]).select(
        "rank", F.col("nid").alias("neighbor_id")
    )


def build_pq_index(
    emb: DataFrame,
    path: str,
    n_sub: int = 8,
    n_cents: int = 16,
    n_iters: int = 2,
    n_vec_buckets: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Materialize the PQ serving layout — where ``pq_topk``'s 128×
    byte saving actually lands: the candidate-scan relation holds ONLY
    (nid, packed int64 code), the full vectors live in a SEPARATE
    relation partitioned by an id bucket so the exact re-rank reads only
    the candidates' bucket directories (PartitionFilters), and the
    codebooks travel IN the meta (exact JSON round-trip — the BM25
    frozen-stats convention), so a probe needs zero training passes.
    Meta is written LAST through the fs seam: the commit point.

    Layout: ``codes/`` (nid, code), ``vecs/`` partitioned by
    ``vbkt = 'v' + pmod(nid, n_vec_buckets)`` (prefixed NON-NUMERIC per
    the partition-value rule), ``_index_meta.json``."""
    from gofeed_spark.fs import get_filesystem
    from gofeed_spark.sources.io import write_partitioned

    emb = parallel_floor(emb)
    e = emb.select(
        F.col(id_col).alias("nid"), as_double_array(vec_col).alias("v")
    ).localCheckpoint()
    cbs = pq_codebooks(e, n_sub=n_sub, n_cents=n_cents, n_iters=n_iters)
    fs = get_filesystem(path)
    fs.makedirs(path)
    pq_codes(e, cbs).write.mode("overwrite").parquet(
        fs.spark_path(fs.join(path, "codes"))
    )
    vecs = e.withColumn(
        "vbkt",
        F.concat(F.lit("v"), F.pmod("nid", F.lit(n_vec_buckets)).cast("string")),
    )
    write_partitioned(
        vecs.repartition("vbkt"),
        fs.spark_path(fs.join(path, "vecs")),
        partition_by=["vbkt"],
    )
    meta = {
        "kind": "pq_v1",
        "n_sub": int(cbs.shape[0]),
        "n_cents": int(cbs.shape[1]),
        "sub_dim": int(cbs.shape[2]),
        "bits": pq_bits(int(cbs.shape[1])),
        "n_vec_buckets": int(n_vec_buckets),
        "codebooks": [[list(map(float, c)) for c in sub] for sub in cbs],
        "rels": {"codes": "codes", "vecs": "vecs"},
    }
    _write_index_meta(path, meta)
    return meta


def probe_pq_index(
    spark,
    path: str,
    qv: np.ndarray,
    k: int = 10,
    refine: int | None = None,
    exclude_id: int | None = None,
) -> DataFrame:
    """Serve a query from the persisted PQ layout: ADC over the slim
    ``codes/`` relation (one Arrow pass over ~16 B/vector), collect the
    top ``refine`` candidate ids (BOUNDED — this is the one driver
    transfer), then an exact cosine re-rank that reads ONLY the
    candidates' vector bucket directories (partition-pruned, plan-
    asserted in tests) with the id filter pushed into the pruned scan.
    Refuses a path without a committed meta (interrupted build)."""
    import json

    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(path)
    meta = json.loads(fs.read_bytes(fs.join(path, "_index_meta.json")))
    if meta.get("kind") != "pq_v1":
        raise ValueError(f"not a PQ index at {path}: {meta.get('kind')}")
    cbs = np.array(meta["codebooks"], dtype=np.float64)
    n_sub, n_cents, sub_dim = cbs.shape
    bits, nvb = meta["bits"], meta["n_vec_buckets"]
    refine = int(refine if refine is not None else max(32, 8 * k))
    qv = np.asarray(qv, dtype=np.float64)
    qsub = qv.reshape(n_sub, sub_dim)
    dots = np.einsum("sd,scd->sc", qsub, cbs)
    norm2 = (cbs * cbs).sum(axis=2)
    qn = float(np.linalg.norm(qv))
    mask = (1 << bits) - 1

    def adc(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            code = pdf["code"].to_numpy(dtype=np.int64)
            dot = np.zeros(len(code))
            vn2 = np.zeros(len(code))
            for si in range(n_sub):
                cells = (code >> (bits * si)) & mask
                dot += dots[si][cells]
                vn2 += norm2[si][cells]
            denom = qn * np.sqrt(np.maximum(vn2, 1e-300))
            yield pd.DataFrame({"nid": pdf["nid"], "acos": dot / denom})

    codes = spark.read.parquet(fs.spark_path(fs.join(path, meta["rels"]["codes"])))
    if exclude_id is not None:
        codes = codes.filter(F.col("nid") != int(exclude_id))
    cand_ids = [
        int(r["nid"])
        for r in codes.mapInPandas(adc, "nid long, acos double")
        .orderBy(F.col("acos").desc(), F.col("nid").asc())
        .limit(refine)
        .collect()
    ]
    buckets = sorted({f"v{i % nvb}" for i in cand_ids})
    vecs = spark.read.parquet(fs.spark_path(fs.join(path, meta["rels"]["vecs"])))
    qdf = spark.createDataFrame([(qv.tolist(),)], "qv array<double>")
    scored = (
        vecs.filter(F.col("vbkt").isin(buckets) & F.col("nid").isin(cand_ids))
        .crossJoin(F.broadcast(qdf))
        .select("nid", cosine(F.col("v"), F.col("qv")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("nid").asc())
        .limit(k)
    )
    return with_rank(scored, [F.col("cos").desc(), F.col("nid").asc()]).select(
        "rank", F.col("nid").alias("neighbor_id")
    )


def ensure_pq_index(
    emb: DataFrame,
    path: str,
    n_sub: int = 8,
    n_cents: int = 16,
    n_iters: int = 2,
    n_vec_buckets: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Idempotent ``build_pq_index`` (the ensure_ann_index convention):
    reuse a completed layout whose parameters match exactly, else build.
    Serving callers pay the training passes once per corpus."""
    import json

    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(path)
    try:
        stored = json.loads(fs.read_bytes(fs.join(path, _INDEX_META)))
    except OSError:
        stored = None
    want = {
        "kind": "pq_v1",
        "n_sub": n_sub,
        "n_cents": n_cents,
        "n_vec_buckets": n_vec_buckets,
    }
    if stored is not None and all(stored.get(k) == v for k, v in want.items()):
        return stored
    return build_pq_index(
        emb, path, n_sub=n_sub, n_cents=n_cents, n_iters=n_iters,
        n_vec_buckets=n_vec_buckets, id_col=id_col, vec_col=vec_col,
    )

"""Distributed k-means over an embedding column + SemDeDup semantic dedup.

Lloyd's algorithm re-expressed for Spark's execution model: each iteration
is ONE Arrow `mapInPandas` pass over the corpus that does the assignment
AND emits per-partition partial sums (cluster, count, sum-vector) — the
classic map-side combine, so the data that leaves an executor per
iteration is O(k · n_partitions · dim) regardless of corpus size.  The
tiny partials are combined on the driver (the treeAggregate endpoint —
the same shape MLlib's KMeans uses) and the next iteration's centroids
travel back inside the UDF closure (k·dim doubles, a few KB).

Determinism contract (what lets the DuckDB oracle hash-match): the
initial centroids are the embeddings of the k SMALLEST ids (cluster j =
j-th smallest), assignment breaks distance ties toward the lowest cluster
index, and an emptied cluster keeps its previous centroid.  Squared
Euclidean distance is expanded as |v|^2 - 2 v.c + |c|^2 on both engines;
the synthetic corpora's assignment margins (>= 7e-6 relative, measured)
dwarf cross-engine float-order noise.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus, then
prune any item whose cosine similarity to a LOWER-id item in the SAME
cluster meets the threshold.  The within-cluster pass is the published
algorithm's O(|cluster|^2) Gram matrix — tractable exactly because k
scales with the corpus (fixed expected cluster size), computed here as a
chunked numpy matmul inside one `applyInPandas` per cluster.

Reference scope note: the reference engine has no clustering surface;
this module belongs to the added LLM-pipeline surface (SURVEY.md §2.E).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofeed_spark.functions.parallel import parallel_floor


def corpus_k(
    emb: DataFrame, target_cluster_rows: int = 250, k_min: int = 8
) -> int:
    """Corpus-scaled cluster count: SemDeDup's tractability argument (the
    module docstring) requires k ∝ corpus so the expected cluster size —
    and therefore the within-cluster O(|c|^2) Gram pass — stays bounded
    as the corpus grows.  Sized from the parquet footer row-count
    estimate (catalog.df_rowcount_estimate — zero extra Spark jobs; an
    upper bound under filters, which only makes clusters smaller),
    floored at ``k_min``.  The gate corpora land exactly on the floor
    (sf0.01: 500 rows, sf0.1: 2000 rows → k=8 both), pinning the oracle
    CTEs' LIMIT 8; sf1.0's 20k rows get k=80."""
    from gofeed_spark.catalog import df_rowcount_estimate

    n = df_rowcount_estimate(emb)
    if n is None:
        n = emb.count()
    return max(k_min, int(n // target_cluster_rows))


def _vec_ddl(emb: DataFrame, vec_col: str) -> str:
    """DDL for the vector column CARRYING the input's element type —
    declaring array<float> for an array<double> input would silently
    truncate stored/shuffled vectors to float32 while assignment math
    runs in float64 (build-vs-probe drift on double-typed corpora)."""
    return emb.schema[vec_col].dataType.simpleString()


def _min_witness(
    sims: np.ndarray, ids: np.ndarray, lo: int, hi: int, tau: float
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized witness detection for one Gram chunk: for each row r in
    [lo, hi), the MIN id among columns j < r with sims >= tau.  Returns
    (row_indices_with_a_witness, min_witness_ids) — no Python loop over
    rows (the HOF-lambda rule applied to numpy)."""
    n = sims.shape[1]
    mask = np.arange(n)[None, :] < np.arange(lo, hi)[:, None]
    hits = (sims >= tau) & mask
    any_hit = hits.any(axis=1)
    big = np.iinfo(np.int64).max
    wit = np.where(hits, ids[None, :], big).min(axis=1)
    rows = np.nonzero(any_hit)[0]
    return rows + lo, wit[rows]


def _init_centroids(emb: DataFrame, k: int, id_col: str, vec_col: str) -> np.ndarray:
    """Embeddings of the k smallest ids (TakeOrdered — no full sort)."""
    rows = emb.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(rows)}")
    return np.array([r[1] for r in rows], dtype=np.float64)


def _assign_batch(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin_j |v - c_j|^2, ties to the lowest j (np.argmin's contract)."""
    d = (
        (V * V).sum(axis=1, keepdims=True)
        - 2.0 * (V @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    return d.argmin(axis=1)


def kmeans_centroids(
    emb: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Fit centroids: ``n_iters`` assign+update rounds from the sorted-id
    init.  Each round = one Arrow pass emitting per-partition partials;
    only k x n_partitions tiny rows ever reach the driver."""
    emb = parallel_floor(emb)  # single-row-group scans → serial Arrow pass
    C = _init_centroids(emb, k, id_col, vec_col)
    dim = C.shape[1]
    src = emb.select(F.col(vec_col).alias("v"))

    for _ in range(n_iters):
        C_cur = C  # bind per-iteration (closure captures the loop variable)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cnt = np.zeros(k, dtype=np.int64)
            sums = np.zeros((k, dim), dtype=np.float64)
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                a = _assign_batch(V, C_cur)
                cnt += np.bincount(a, minlength=k)
                np.add.at(sums, a, V)
            yield pd.DataFrame(
                {"cl": np.arange(k), "cnt": cnt, "s": list(sums)}
            )

        part_rows = src.mapInPandas(
            partials, schema="cl int, cnt long, s array<double>"
        ).collect()
        cnt = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        # combine in sorted order for a deterministic summation sequence
        for r in sorted(part_rows, key=lambda r: r["cl"]):
            cnt[r["cl"]] += r["cnt"]
            sums[r["cl"]] += np.asarray(r["s"], dtype=np.float64)
        nonempty = cnt > 0
        C = C.copy()
        C[nonempty] = sums[nonempty] / cnt[nonempty, None]  # empty: keep old
    return C


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) assignment to the fitted centroids — one final Arrow
    pass over the corpus, no shuffle."""
    emb = parallel_floor(emb)
    C = kmeans_centroids(emb, k, n_iters, id_col, vec_col)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "cl": _assign_batch(V, C)}
            )

    out = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).mapInPandas(assign, schema="id long, cl int")
    return out.select(
        F.col("id").alias(id_col), F.col("cl").alias("cluster")
    ).orderBy(id_col)


def semdedup(
    emb: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    tau: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = 1024,
) -> DataFrame:
    """Semantic dedup: prune every item with a LOWER-id cluster-mate at
    cosine >= tau; report the smallest such witness as ``dup_of``.

    Returns (id, cluster, dup_of), pruned rows only, ordered by id.  The
    within-cluster Gram matrix runs as a chunked matmul (memory
    O(chunk_rows x |cluster|)) inside one applyInPandas per cluster; the
    shuffle moves each row once, keyed by cluster.
    """
    emb = parallel_floor(emb)
    C = kmeans_centroids(emb, k, n_iters, id_col, vec_col)
    vec_ddl = _vec_ddl(emb, vec_col)

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "cl": _assign_batch(V, C),
                    "v": pdf["v"],
                }
            )

    tagged = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).mapInPandas(tag, schema=f"id long, cl int, v {vec_ddl}")

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        ids = pdf["id"].to_numpy()
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = np.maximum(np.linalg.norm(V, axis=1), 1e-300)
        Vn = V / nrm[:, None]
        out_id, out_dup = [], []
        cl = int(pdf["cl"].iloc[0])
        for lo in range(0, len(ids), chunk_rows):
            hi = min(lo + chunk_rows, len(ids))
            sims = Vn[lo:hi] @ Vn.T  # (chunk, cluster)
            # lower-id mates only (ids sorted): min witness, vectorized
            rows, wit = _min_witness(sims, ids, lo, hi, tau)
            out_id.append(ids[rows])
            out_dup.append(wit)
        out_ids = np.concatenate(out_id) if out_id else np.array([], dtype=np.int64)
        out_dups = np.concatenate(out_dup) if out_dup else np.array([], dtype=np.int64)
        return pd.DataFrame(
            {
                "id": out_ids.astype(np.int64),
                "cl": np.full(len(out_ids), cl, dtype=np.int32),
                "dup_of": out_dups.astype(np.int64),
            }
        )

    pruned = tagged.groupBy("cl").applyInPandas(
        prune, schema="id long, cl int, dup_of long"
    )
    return pruned.select(
        F.col("id").alias(id_col),
        F.col("cl").alias("cluster"),
        F.col("dup_of"),
    ).orderBy(id_col)


# --- persisted semantic-dedup index ------------------------------------------
# The embedding-space sibling of the MinHash index lifecycle: frozen
# k-means centroids in the meta (the commit point, written LAST through
# the fs seam) + the corpus laid out partitioned BY CLUSTER, so a probe
# is a partition-PRUNED read of only the clusters the batch touches.

_SEM_KIND = "semdedup_v1"


def _cluster_dir(cl_col):
    # non-numeric partition value by construction (the round-7 rule:
    # numeric-looking strings re-infer as INT on read)
    return F.format_string("c%04d", cl_col)


def _tag_clusters(
    emb: DataFrame, C: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    """(id, cluster-dir, v): one Arrow assignment pass against frozen
    centroids.  The vector column keeps the INPUT's element type — no
    silent float32 truncation on double-typed corpora."""
    vec_ddl = _vec_ddl(emb, vec_col)

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["id_v"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "cl": _assign_batch(V, C),
                    "v": pdf["id_v"],
                }
            )

    out = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("id_v")
    ).mapInPandas(tag, schema=f"id long, cl int, v {vec_ddl}")
    return out.select("id", _cluster_dir(F.col("cl")).alias("cluster"), "v")


def build_semdedup_index(
    emb: DataFrame,
    path: str,
    k: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Fit centroids on ``emb`` and materialize the cluster-partitioned
    layout at ``path``.  ``repartition("cluster")`` before partitionBy =
    one file per cluster (the build_ann_index small-file rule); the meta
    JSON (centroids + params) publishes LAST — an interrupted build
    leaves no meta, so probes refuse it."""
    emb = parallel_floor(emb)
    C = kmeans_centroids(emb, k, n_iters, id_col, vec_col)
    from gofeed_spark.fs import get_filesystem
    from gofeed_spark.operators.similarity import _write_index_meta
    from gofeed_spark.sources.io import write_partitioned

    tagged = _tag_clusters(emb, C, id_col, vec_col)
    write_partitioned(
        tagged.repartition("cluster"),
        get_filesystem(path).spark_path(path),
        partition_by=["cluster"],
    )
    _write_index_meta(
        path,
        {
            "kind": _SEM_KIND,
            "k": k,
            "n_iters": n_iters,
            "id_col": id_col,
            "vec_col": vec_col,
            "centroids": [[float(x) for x in row] for row in C],
        },
    )


def probe_semdedup_index(
    spark,
    path: str,
    batch: DataFrame,
    tau: float = 0.35,
    append: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = 1024,
) -> DataFrame:
    """Semantic-dup verdicts for a NEW batch against the persisted corpus:
    (id, cluster, dup_of) for every batch item with a witness at cosine
    >= tau — witnesses are the cluster's PERSISTED members plus lower-id
    batch mates (the incremental contract: the index holds the kept
    corpus; batch-internal dups resolve exactly like ``semdedup``).
    ``dup_of`` is the smallest witness id (probe_minhash convention).

    The member read is partition-pruned to the clusters the batch
    actually touches (PartitionFilters on the cluster directory key —
    asserted in tests), so probe cost is O(batch + touched clusters),
    independent of corpus size.  ``append=True`` adds the batch's
    SURVIVORS to the layout afterwards (one appending write into the
    same cluster dirs).
    """

    from gofeed_spark.fs import get_filesystem
    from gofeed_spark.operators.similarity import _index_matches
    from gofeed_spark.sources.io import write_partitioned

    meta = _index_matches(path, {"kind": _SEM_KIND})
    if meta is None:
        raise ValueError(f"no completed semdedup index at {path}")
    C = np.array(meta["centroids"], dtype=np.float64)
    fs = get_filesystem(path)

    tagged = _tag_clusters(batch, C, id_col, vec_col).localCheckpoint()
    touched = sorted(r["cluster"] for r in tagged.select("cluster").distinct().collect())
    members = (
        spark.read.parquet(fs.spark_path(path))
        .filter(F.col("cluster").isin(touched))
        .select("id", "cluster", "v", F.lit(False).alias("is_new"))
    )
    unioned = members.unionByName(
        tagged.select("id", "cluster", "v", F.lit(True).alias("is_new"))
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        # members first (all witnesses), then news ascending id: a new row
        # at combined position m+j may match any column < m+j
        pdf = pdf.sort_values(["is_new", "id"]).reset_index(drop=True)
        ids = pdf["id"].to_numpy()
        is_new = pdf["is_new"].to_numpy()
        m = int((~is_new).sum())
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = np.maximum(np.linalg.norm(V, axis=1), 1e-300)
        Vn = V / nrm[:, None]
        cluster = pdf["cluster"].iloc[0]
        out_id, out_dup = [], []
        for lo in range(m, len(ids), chunk_rows):
            hi = min(lo + chunk_rows, len(ids))
            sims = Vn[lo:hi] @ Vn.T
            # min WITNESS ID among columns < r (members block + earlier
            # news — ids are NOT globally sorted across the two blocks,
            # so _min_witness's where-min, not a first-hit argmax)
            rows, wit = _min_witness(sims, ids, lo, hi, tau)
            out_id.append(ids[rows])
            out_dup.append(wit)
        out_ids = np.concatenate(out_id) if out_id else np.array([], dtype=np.int64)
        out_dups = np.concatenate(out_dup) if out_dup else np.array([], dtype=np.int64)
        return pd.DataFrame(
            {
                "id": out_ids.astype(np.int64),
                "cluster": np.repeat(cluster, len(out_ids)),
                "dup_of": out_dups.astype(np.int64),
            }
        )

    verdicts = unioned.groupBy("cluster").applyInPandas(
        prune, schema="id long, cluster string, dup_of long"
    )
    verdicts = verdicts.select(
        F.col("id").alias(id_col), "cluster", "dup_of"
    ).orderBy(id_col).localCheckpoint()
    if append:
        survivors = tagged.join(
            verdicts.select(F.col(id_col).alias("id")), "id", "left_anti"
        )
        write_partitioned(
            survivors.repartition("cluster"),
            fs.spark_path(path),
            partition_by=["cluster"],
            mode="append",
        )
    return verdicts

"""Distributed PCA over an embedding column — the dimensionality-reduction
step a large-scale pipeline runs before clustering / ANN indexing (project
to the top-k variance directions, then index the short vectors).

Spark shape: the covariance statistics come from ONE Arrow `mapInPandas`
pass emitting per-partition partials — (count, sum-vector, sum of outer
products), O(dim^2) doubles per partition regardless of row count (the
kmeans partial-sums pattern).  The driver assembles the covariance,
eigendecomposes it (dim x dim, trivial), and the projection is one more
Arrow pass with the components as a closure constant.

Determinism: numpy's ``eigh`` is deterministic for a given matrix, but an
eigenvector's SIGN is arbitrary — each component is flipped so its
largest-|coordinate| entry is positive (the sklearn ``svd_flip``
convention), making projections reproducible across runs, partitionings
and engines.  Partials are combined in sorted partition order; the
synthetic corpora's eigen-gaps dwarf float-order noise.

Reference scope note: the reference engine has no linear-algebra surface;
this module belongs to the added LLM-pipeline surface (SURVEY.md §2.E).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofeed_spark.functions.parallel import parallel_floor


def _moment_stats(emb: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, cov) from ONE Arrow pass of per-partition (count,
    sum-vector, outer-product) partials — O(dim^2) per partition
    regardless of row count."""
    src = emb.select(F.col(vec_col).alias("v"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        o = None
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            if s is None:
                s = np.zeros(V.shape[1])
                o = np.zeros((V.shape[1], V.shape[1]))
            n += len(V)
            s += V.sum(axis=0)
            o += V.T @ V
        if s is None:
            return
        yield pd.DataFrame(
            {"n": [n], "s": [s], "o": [o.ravel()]}
        )

    rows = src.mapInPandas(
        partials, schema="n long, s array<double>, o array<double>"
    ).collect()
    if not rows:
        raise ValueError("empty corpus")
    n = sum(r["n"] for r in rows)
    dim = len(rows[0]["s"])
    s = np.zeros(dim)
    o = np.zeros((dim, dim))
    for r in rows:  # collect order = partition order (deterministic)
        s += np.asarray(r["s"])
        o += np.asarray(r["o"]).reshape(dim, dim)
    mean = s / n
    cov = (o - n * np.outer(mean, mean)) / max(n - 1, 1)
    return n, mean, cov


def pca_fit(
    emb: DataFrame,
    n_components: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Fit: returns {"mean": (dim,), "components": (k, dim),
    "eigenvalues": (k,)} as numpy arrays, components ordered by
    eigenvalue descending with the sign convention applied."""
    emb = parallel_floor(emb)
    _n, mean, cov = _moment_stats(emb, vec_col)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (k, dim)
    evals = evals[order]
    # svd_flip sign convention: largest-|coord| entry positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {"mean": mean, "components": comps, "eigenvalues": evals}


def pca_project(
    emb: DataFrame,
    model: dict | None = None,
    n_components: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, proj array<float>): center on the fitted mean, project onto the
    top components.  ``model=None`` fits on ``emb`` itself; pass a frozen
    ``pca_fit`` result to project later frames/micro-batches in the same
    basis (the dsir_model/unigram_model convention)."""
    emb = parallel_floor(emb)
    if model is None:
        model = pca_fit(emb, n_components, id_col, vec_col)
    mean, comps = model["mean"], model["components"]

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            P = (V - mean) @ comps.T
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "proj": list(P.astype(np.float32))}
            )

    return (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .mapInPandas(project, schema="id long, proj array<float>")
        .select(F.col("id").alias(id_col), "proj")
        .orderBy(id_col)
    )


def pca_power_project(
    emb: DataFrame,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Top-principal-component projection via a FIXED-iteration power
    method — the ORACLE-PAIRABLE form of PCA (the q122 k-means precedent
    applied to linear algebra): ``v_{t+1} = C v_t / ||C v_t||`` from the
    all-ones start vector is a deterministic arithmetic function of the
    covariance, so a SQL engine replaying the same CTE chain reproduces
    it — convergence is irrelevant to parity, only float noise vs the
    rounding grid (margins MEASURED: min distance of any projection to a
    round-4 boundary is 9.0e-8 at sf0.01 and 1.9e-9 at sf0.1, vs a
    measured max cross-engine delta of 8.9e-16 — 2e6x headroom;
    tests/test_pca.py asserts the floor).  Returns (id, pc1 double)
    rounded to ``round_to``
    decimals; ``+ 0.0`` normalizes IEEE -0.0 so a projection rounding to
    zero hashes identically on both engines.

    Same scale shape as ``pca_fit``: one O(dim^2)-per-partition Arrow
    moment pass, driver-side dim x dim iteration, one Arrow projection
    pass."""
    emb = parallel_floor(emb)
    _n, mean, cov = _moment_stats(emb, vec_col)
    v = np.ones(cov.shape[0])
    for _ in range(n_iters):
        w = cov @ v
        v = w / np.linalg.norm(w)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "pc1": (V - mean) @ v}
            )

    return (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .mapInPandas(project, schema="id long, pc1 double")
        .select(
            F.col("id").alias(id_col),
            (F.round("pc1", round_to) + F.lit(0.0)).alias("pc1"),
        )
        .orderBy(id_col)
    )

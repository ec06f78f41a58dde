"""Fixed-iteration logistic-regression classifier — rule-distillation for
quality filtering.

The real-pipeline shape (CCNet, fastText quality filters, phi-style
curation): a cheap rule or a labeled sample defines the target, a linear
model is trained on inexpensive document features, and the MODEL — not the
rule — scores every document (and every future micro-batch) as one codegen
projection.  Training here is full-batch gradient descent for a FIXED
iteration count from zero weights: like the q129 power method and the
q122 k-means chain, that makes the learned weights a deterministic
arithmetic function of the corpus, so the whole train+score pipeline is
oracle-pairable — a DuckDB CTE chain replays the same gradient algebra and
the scores hash-match (margins MEASURED at registration, the house rule
for float-boundary outputs).

Posture: each GD iteration is ONE map-side-combinable aggregate over the
feature frame producing d+1 scalars (the gradient) — the classic
distributed-ML pattern (a 1000-executor cluster pays d+1 doubles of
shuffle per pass); scoring is a no-shuffle projection.  The driver only
ever holds the weight vector.  Feature frames should be
``localCheckpoint``-ed by the caller: training reads them n_iters times.

Reference: no ML surface in gofeed (760-line Go ORM feed engine); this is
added LLM-pipeline surface (SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sigmoid(z: Column) -> Column:
    """1/(1+e^-z) — written exactly like the SQL twin so both engines
    evaluate the same IEEE expression tree."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _z(feature_cols: list[str], weights: list[float]) -> Column:
    z = F.lit(0.0)
    for c, w in zip(feature_cols, weights):
        z = z + F.col(c) * F.lit(float(w))
    return z


def train_logreg(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    n_iters: int = 3,
    lr: float = 2.0,
) -> list[float]:
    """Full-batch GD, fixed iterations, zero init:
    w ← w − lr · mean((σ(x·w) − y) · x).  One aggregate job per
    iteration; the collect is the (d+1)-scalar gradient, never rows."""
    weights = [0.0] * len(feature_cols)
    y = F.col(label_col).cast("double")
    for _ in range(n_iters):
        p = sigmoid(_z(feature_cols, weights))
        row = feats.agg(
            *[
                F.avg((p - y) * F.col(c)).alias(f"__g{j}")
                for j, c in enumerate(feature_cols)
            ]
        ).collect()[0]
        if row["__g0"] is None:
            raise ValueError("train_logreg: empty feature frame (no rows)")
        weights = [w - lr * row[f"__g{j}"] for j, w in enumerate(weights)]
    return weights


def score_logreg(
    feats: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    out_col: str = "score",
) -> DataFrame:
    """Apply the frozen model — a pure codegen projection (the
    frozen-stats ingest convention: q131/q133's shape for models)."""
    return feats.withColumn(out_col, sigmoid(_z(feature_cols, weights)))

"""Vector column expressions — all JVM-side (no Python UDF in the hot path).

Dot products / norms are expressed with ``zip_with`` + ``aggregate`` higher-
order functions, which Catalyst evaluates inside codegen.  Everything is
computed in DOUBLE with a sequential left-fold, which matches the DuckDB
oracle's ``list_dot_product`` over ``DOUBLE[]`` bit-for-bit — rankings are
therefore engine-identical without float tolerance games.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product over two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))

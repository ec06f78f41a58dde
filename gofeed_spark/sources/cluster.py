"""Sort-order clustering layouts for table-rewrite operations.

File skipping (Delta add-action stats, Iceberg manifest bounds) only
pays off when each file covers a NARROW slice of the probe key — a table
that accreted unordered appends has every file spanning the full key
range, and min/max pruning keeps everything.  The rewrite ops re-cluster
by routing each partition group's rewrite through one of two layouts:

- ONE key: range clustering — ``repartitionByRange(n, key)`` +
  ``sortWithinPartitions(key)`` (the cdx publish recipe).  Output file i
  covers the i-th key range; a point lookup opens exactly one file.
  Works for any orderable column type.
- MULTIPLE keys: Z-ORDER — each key quantile-codes to 8 bits (boundaries
  from one ``approxQuantile`` pass, so skew cannot collapse the grid),
  codes bit-interleave into a single z-value, and the rows range-cluster
  on it.  Every key column's bounds then narrow in every file
  simultaneously (the interleave gives each key every k-th bit), which
  is what makes multi-column point lookups prune — a lexicographic sort
  would cluster only the leading key.  Numeric keys only (quantile
  coding needs an arithmetic domain); the per-row code+interleave runs
  as one numpy pass per Arrow batch, never a per-element Catalyst
  lambda.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ZBITS = 8  # 256 quantile buckets per key — file-grained, not row-grained
_ZCOL = "__zorder"

_NUMERIC = (
    "tinyint", "smallint", "int", "bigint", "float", "double",
)


class ClusterError(ValueError):
    pass


def cluster_layout(df: DataFrame, by: list[str], n_out: int) -> DataFrame:
    """``df`` re-laid-out for clustered writes: ``n_out`` range slices of
    the single key, or of the interleaved z-value for multiple keys.
    Raises :class:`ClusterError` for unknown columns, and for non-numeric
    keys in the multi-key (z-order) form."""
    missing = [c for c in by if c not in df.columns]
    if missing:
        raise ClusterError(f"cluster keys {missing} not in {df.columns}")
    if not by:
        raise ClusterError("cluster_layout needs at least one key")
    n_out = max(1, int(n_out))
    if len(by) == 1:
        return df.repartitionByRange(n_out, F.col(by[0])).sortWithinPartitions(
            by[0]
        )
    if len(by) * _ZBITS > 62:
        raise ClusterError(f"z-order supports at most {62 // _ZBITS} keys")
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    bad = [c for c in by if types[c] not in _NUMERIC]
    if bad:
        raise ClusterError(
            f"z-order keys must be numeric, got {[(c, types[c]) for c in bad]}"
            " (single-key range clustering supports any orderable type)"
        )
    zdf = _with_zvalue(df, by)
    return (
        zdf.repartitionByRange(n_out, F.col(_ZCOL))
        .sortWithinPartitions(_ZCOL)
        .drop(_ZCOL)
    )


def _with_zvalue(df: DataFrame, by: list[str]) -> DataFrame:
    # quantile boundaries per key (one job; 1% relative error is far finer
    # than the 256-bucket grid it feeds)
    qs = [i / (1 << _ZBITS) for i in range(1, 1 << _ZBITS)]
    bnds = {c: np.asarray(df.approxQuantile(c, qs, 0.01), dtype=np.float64)
            for c in by}
    k = len(by)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(_ZCOL, T.LongType(), False)]
    )

    def add_z(batches):
        for pdf in batches:
            z = np.zeros(len(pdf), dtype=np.int64)
            for i, c in enumerate(by):
                vals = pdf[c].to_numpy(dtype=np.float64, na_value=np.nan)
                codes = np.searchsorted(bnds[c], vals, side="right").astype(
                    np.int64
                )
                # NaN (and NULL) searchsorts past the end: clip to the top
                # bucket so nulls cluster together instead of exploding
                np.clip(codes, 0, (1 << _ZBITS) - 1, out=codes)
                for b in range(_ZBITS):
                    z |= ((codes >> b) & 1) << (b * k + i)
            pdf[_ZCOL] = z
            yield pdf

    return df.mapInPandas(add_z, out_schema)

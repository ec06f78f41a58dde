"""Skew mitigation: salted equi-join.

AQE's skew-join splitting (enabled session-wide, session.py) handles most
skew at runtime by splitting oversized partitions.  The explicit salting
transform below is for the cases AQE cannot fix: a single join key hot
enough that ONE key's rows exceed an executor (AQE can split a partition,
not a key), or deterministic layout requirements where runtime re-planning
is off.

Shape: the probe side gets a random-but-deterministic salt in [0, n);
the build side is replicated n× (explode over the salt domain); the join
key becomes (key, salt), spreading each hot key over n tasks.  Cost: n×
duplication of the build side — use for dimension-sized builds only, and
size ``n_salts`` to the observed hot-key multiplicity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left (large/skewed) side salted and the
    right (small/build) side replicated across the salt domain.  Result
    equals ``left.join(right, on, how)`` for inner/left joins; the salt
    columns never escape."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (build-side replication)")
    # deterministic salt: hash of the full row's key + a per-row uniquifier
    # is unnecessary — spreading only needs uniformity, so hash the key with
    # monotonically increasing row position via spark_partition_id
    salted_left = left.withColumn(
        "__salt",
        (F.pmod(F.xxhash64(F.col(on), F.spark_partition_id(), F.monotonically_increasing_id()), F.lit(n_salts))).cast("int"),
    )
    replicated_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_left.join(replicated_right, [on, "__salt"], how)
    return out.drop("__salt")

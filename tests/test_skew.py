"""Salted join equivalence: result identical to the plain join while the
hot key spreads across the salt domain."""

from __future__ import annotations

from pyspark.sql import functions as F

from gofeed_spark.operators.skew import salted_join
from tests.conftest import rows


def test_salted_join_equals_plain_join(spark):
    # 1000 rows of one hot key + a long tail
    left = spark.createDataFrame(
        [(1, i) for i in range(1000)] + [(k, k) for k in range(2, 30)],
        "k int, payload int",
    )
    right = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 30)], "k int, dim string")
    plain = rows(left.join(right, "k", "inner"), "k", "payload", "dim")
    salted = rows(salted_join(left, right, "k", n_salts=8), "k", "payload", "dim")
    assert salted == plain


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "no-dim")], "k int, v string")
    right = spark.createDataFrame([(1, "d1")], "k int, dim string")
    out = rows(salted_join(left, right, "k", n_salts=4, how="left"), "k", "v", "dim")
    assert out == {(1, "a", "d1"), (99, "no-dim", None)}


def test_salt_spreads_hot_key(spark):
    left = spark.createDataFrame([(1, i) for i in range(500)], "k int, payload int")
    right = spark.createDataFrame([(1, "d")], "k int, dim string")
    salted = salted_join(left, right, "k", n_salts=8)
    # peek at the pre-drop salt distribution via the same salting expression
    salts = (
        left.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(F.col("k"), F.spark_partition_id(), F.monotonically_increasing_id()),
                F.lit(8),
            ).cast("int"),
        )
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(salts) > 4  # the hot key occupies most of the salt domain
    assert salted.count() == 500

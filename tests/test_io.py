"""Format-dispatched IO + partition-pruning evidence."""

from __future__ import annotations

from pyspark.sql import functions as F

from gofeed_spark.sources.io import infer_format, read_table, write_partitioned
from tests.conftest import rows


def test_roundtrip_formats(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    for fmt in ["parquet", "csv", "json"]:
        p = str(tmp_path / f"t.{fmt}")
        write_partitioned(df, p)
        back = read_table(spark, p, schema="id int, v string")
        assert rows(back) == {(1, "a"), (2, "b")}, fmt


def test_infer_format():
    assert infer_format("/x/t.csv") == "csv"
    assert infer_format("/x/t.json") == "json"
    assert infer_format("/x/whatever") == "parquet"


def test_bucketed_join_has_no_shuffle(spark):
    from gofeed_spark.sources.io import write_bucketed

    left = spark.createDataFrame([(i, i * 2) for i in range(1000)], "k long, a long")
    right = spark.createDataFrame([(i, i * 3) for i in range(1000)], "k long, b long")
    write_bucketed(left, "bkt_left", ["k"], n_buckets=8, sort_by=["k"])
    write_bucketed(right, "bkt_right", ["k"], n_buckets=8, sort_by=["k"])
    try:
        j = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-bucketed equi-join: no Exchange (shuffle) on either side
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "us" if i % 2 else "eu", i * 1.0) for i in range(100)],
        "id int, region string, v double",
    )
    p = str(tmp_path / "part")
    write_partitioned(df, p, partition_by=["region"])
    scan = read_table(spark, p).filter(F.col("region") == "us")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # the region filter lands in PartitionFilters (pruned at plan time),
    # not in the row-level data filters
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1][:200]
    assert "region" in pf
    assert scan.count() == 50


def test_compact_shrinks_file_count_preserves_data(spark, tmp_path):
    import os

    from gofeed_spark.sources.io import compact

    path = str(tmp_path / "accreted.parquet")
    df = spark.range(10_000).withColumnRenamed("id", "k")
    df.repartition(64).write.parquet(path)  # simulate small-file accretion
    before = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    assert before >= 32
    n = compact(spark, path, target_file_bytes=1 << 30)
    after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert after == n == 1
    assert spark.read.parquet(path).count() == 10_000
    assert spark.read.parquet(path).agg({"k": "sum"}).collect()[0][0] == 49995000


def test_compact_preserves_partition_layout(spark, tmp_path):
    import os

    from gofeed_spark.sources.io import compact, write_partitioned

    path = str(tmp_path / "parted.parquet")
    df = spark.range(1000).selectExpr("id AS k", "CAST(id % 4 AS INT) AS bucket")
    write_partitioned(df.repartition(16), path, partition_by=["bucket"])
    n = compact(spark, path, target_file_bytes=1 << 30)
    # layout intact: Hive-style bucket dirs still present, data identical
    assert sorted(d for d in os.listdir(path) if d.startswith("bucket=")) == [
        f"bucket={i}" for i in range(4)
    ]
    back = spark.read.parquet(path)
    assert back.count() == 1000
    # probes still prune on the partition key
    plan = back.filter("bucket = 2")._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "bucket" in pf


def test_events_ts_normalizes_under_every_read_shape(spark):
    """events.ts must land as session-zone TIMESTAMP with identical values
    whether the parquet read produced native TIMESTAMP (inferTimestampNTZ
    disabled — the fast, cast-free path), TIMESTAMP_NTZ (a session where
    that conf can't be set), or LONG nanos (old TIMESTAMP(NANOS)
    generations via nanosAsLong)."""
    from pyspark.sql import functions as F

    from gofeed_spark.catalog import load_table, normalize_events_ts

    sf = "/root/testdata/sf0.001"
    fast = load_table(spark, sf, "events")
    assert fast.schema["ts"].dataType.simpleString() == "timestamp"
    golden = {r.event_id: r.ts for r in fast.select("event_id", "ts").limit(50).collect()}

    # NTZ shape (simulated: read raw with inference on, bypassing the
    # catalog so ensure_session_confs can't flip the conf back)
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "true")
    try:
        raw = spark.read.parquet(f"{sf}/events.parquet")
        assert raw.schema["ts"].dataType.simpleString() == "timestamp_ntz"
        ntz = normalize_events_ts(raw)
    finally:
        spark.conf.set(key, old)
    assert ntz.schema["ts"].dataType.simpleString() == "timestamp"
    got = {r.event_id: r.ts for r in ntz.select("event_id", "ts").limit(50).collect()}
    assert got == golden

    # LONG-nanos shape (simulated from the same values)
    as_nanos = fast.select(
        "event_id", (F.unix_micros("ts") * 1000).alias("ts")
    )
    back = normalize_events_ts(as_nanos)
    assert back.schema["ts"].dataType.simpleString() == "timestamp"
    got = {r.event_id: r.ts for r in back.select("event_id", "ts").limit(50).collect()}
    assert got == golden


def test_dataset_diff_classifies_and_drops_unchanged(spark):
    from gofeed_spark.sources.io import dataset_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "was this"), (3, "gone soon")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "now this"), (9, "brand new")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.change for r in dataset_diff(old, new).collect()}
    assert out == {2: "modified", 3: "removed", 9: "added"}
    # identical snapshots (even re-sharded) diff empty
    assert dataset_diff(old, old.repartition(7)).count() == 0


def test_shard_for_export_deterministic_total_order(spark):
    from gofeed_spark.sources.io import shard_for_export

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    out = shard_for_export(docs, n_shards=4)
    got = {r.doc_id: (r.shard, r.pos) for r in out.collect()}
    # re-sharded input produces the IDENTICAL assignment (pure id function)
    got2 = {
        r.doc_id: (r.shard, r.pos)
        for r in shard_for_export(docs.repartition(13), n_shards=4).collect()
    }
    assert got == got2
    # per-shard positions are contiguous 1..n (loader-ready order)
    by_shard = {}
    for s, p in got.values():
        by_shard.setdefault(s, []).append(p)
    assert set(by_shard) == {0, 1, 2, 3}
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # md5 keys balance the shards (no shard starves on sequential ids)
    sizes = sorted(len(ps) for ps in by_shard.values())
    assert sizes[0] >= 25  # ~50 expected under uniform hashing

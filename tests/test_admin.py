"""DDL/migration + healthcheck tests (AutoMigrate and Healthcheck twins)."""

from __future__ import annotations

from gofeed_spark.feedstate.admin import (
    auto_migrate,
    healthcheck,
    http_healthcheck,
)


def test_auto_migrate_creates_and_evolves(spark, tmp_path):
    base = str(tmp_path / "feed")
    paths = auto_migrate(spark, base)
    items = spark.read.parquet(paths["items"])
    assert "retry_count" in items.columns and items.count() == 0

    # simulate an OLD table missing two columns, with data
    old = spark.createDataFrame(
        [("x", 0, "p", 0, 1)], "id string, version int, partition_id string, gate int, status int"
    )
    old.write.mode("overwrite").parquet(paths["items"])
    auto_migrate(spark, base)
    evolved = spark.read.parquet(paths["items"])
    assert "error_messages" in evolved.columns and "retry_count" in evolved.columns
    row = evolved.collect()[0]
    assert row.id == "x" and row.retry_count is None  # data kept, new cols NULL


def test_transactional_write_flips_all_tables(spark, tmp_path):
    from gofeed_spark.feedstate.admin import transactional_write

    base = str(tmp_path)
    a1 = spark.createDataFrame([(1, "a")], "id int, v string")
    b1 = spark.createDataFrame([(1, "b")], "id int, v string")
    transactional_write(spark, {"t1": a1, "t2": b1}, base)
    a2 = spark.createDataFrame([(2, "a2")], "id int, v string")
    b2 = spark.createDataFrame([(2, "b2")], "id int, v string")
    transactional_write(spark, {"t1": a2, "t2": b2}, base)
    assert spark.read.parquet(f"{base}/t1").collect()[0].v == "a2"
    assert spark.read.parquet(f"{base}/t2").collect()[0].v == "b2"


def test_healthcheck_all_green(spark):
    assert healthcheck(spark, processor_check=lambda: None) == []


def test_healthcheck_joins_failures(spark):
    def bad():
        raise RuntimeError("processor down")

    errs = healthcheck(spark, processor_check=bad)
    assert len(errs) == 1 and "processor down" in errs[0]


def test_http_healthcheck_status_mapping():
    ok = http_healthcheck("http://t", transport=lambda url: 200)
    ok()  # no raise
    bad = http_healthcheck("http://t", transport=lambda url: 503)
    try:
        bad()
        raise AssertionError("expected raise")
    except RuntimeError as e:
        assert "503" in str(e)

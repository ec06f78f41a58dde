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


def test_transactional_write_recovers_from_stale_dirs(spark, tmp_path):
    """A crash between os.replace and rmtree leaves *_txn_old behind; the
    next write must flip cleanly instead of wedging on ENOTEMPTY."""
    import os

    from gofeed_spark.feedstate.admin import transactional_write

    base = str(tmp_path)
    a1 = spark.createDataFrame([(1, "a")], "id int, v string")
    transactional_write(spark, {"t1": a1}, base)
    # simulate the crash: a non-empty stale _old AND a stale _staging
    os.makedirs(f"{base}/t1_txn_old", exist_ok=True)
    open(f"{base}/t1_txn_old/leftover", "w").write("x")
    os.makedirs(f"{base}/t1_txn_staging", exist_ok=True)
    open(f"{base}/t1_txn_staging/leftover", "w").write("x")
    a2 = spark.createDataFrame([(2, "a2")], "id int, v string")
    transactional_write(spark, {"t1": a2}, base)
    assert spark.read.parquet(f"{base}/t1").collect()[0].v == "a2"
    assert not os.path.exists(f"{base}/t1_txn_old")


def test_served_healthcheck_endpoint(spark):
    """GET /healthcheck → 200 'ok' when healthy, 503 + error text when a
    probe fails (main.go:99-104's served endpoint)."""
    import urllib.error
    import urllib.request

    from gofeed_spark.feedstate.admin import serve_healthcheck

    srv = serve_healthcheck(spark, port=0, processor_check=lambda: None)
    try:
        port = srv.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthcheck", timeout=30) as r:
            assert r.status == 200 and r.read() == b"ok"
    finally:
        srv.shutdown()

    def bad():
        raise RuntimeError("processor down")

    srv = serve_healthcheck(spark, port=0, processor_check=bad)
    try:
        port = srv.server_address[1]
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthcheck", timeout=30)
            raise AssertionError("expected HTTP 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503 and b"processor down" in e.read()
    finally:
        srv.shutdown()

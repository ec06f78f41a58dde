"""Operational surface of the feed engine: table DDL/migration and
healthcheck — the Spark twins of AutoMigrate (repo.go:102-104, invoked
main.go:106-108) and Watcher.Healthcheck (watcher.go:214-239).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession

from gofeed_spark.feedstate.model import ITEM_DDL, PARTITION_DDL

FEED_TABLES = {"partitions": PARTITION_DDL, "items": ITEM_DDL}


def auto_migrate(
    spark: SparkSession, base_path: str, table_prefix: str = ""
) -> dict[str, str]:
    """Create the feed-state tables (empty parquet with the declared schema)
    when absent; existing tables are evolved in-place by reading with
    mergeSchema and rewriting any missing columns as typed NULLs — the
    additive half of Gorm's AutoMigrate, which also never drops columns.

    ``table_prefix`` namespaces the table names (``{prefix}items`` ...) so
    several feed instances can cohabit one warehouse dir — the reference's
    Gorm TablePrefix knob (main.go:29, README.md:131-135); the dbapi store
    applies the same prefix to its SQL tables (dbstore.py).

    Returns {prefixed table: path}.  On a real deployment this maps to
    ``CREATE TABLE ... USING delta`` + ``mergeSchema`` evolution.
    """
    out = {}
    for bare, ddl in FEED_TABLES.items():
        name = f"{table_prefix}{bare}"
        path = os.path.join(base_path, name)
        want = spark.createDataFrame([], ddl)
        if not os.path.exists(path):
            want.write.mode("overwrite").parquet(path)
        else:
            have = spark.read.option("mergeSchema", "true").parquet(path)
            missing = [f for f in want.schema.fields if f.name not in have.columns]
            if missing:
                from pyspark.sql import functions as F

                for f in missing:
                    have = have.withColumn(f.name, F.lit(None).cast(f.dataType))
                import shutil

                tmp = path + "_migrating"
                have.select([f.name for f in want.schema.fields]).write.mode(
                    "overwrite"
                ).parquet(tmp)
                old = path + "_old"
                shutil.rmtree(old, ignore_errors=True)  # stale from a crashed run
                os.replace(path, old)
                os.replace(tmp, path)
                shutil.rmtree(old, ignore_errors=True)
        out[name] = path
    return out


def transactional_write(
    spark: SparkSession, writes: dict[str, "object"], base_path: str
) -> None:
    """Atomic multi-table write — the reference's Transaction wrapper
    (repo.go:164-170) re-expressed for immutable storage: stage every
    table first, then flip them with directory renames in staging order —
    a crash mid-flip leaves a prefix of tables fully flipped and never a
    torn single table; the next run's re-staging completes the flip
    idempotently.  (On Delta this is a single multi-table commit; the
    staging dance is the plain-parquet equivalent.)

    Stale ``*_txn_old`` / ``*_txn_staging`` directories left by a crash
    between a rename and its cleanup are removed up-front, so recovery
    never wedges on a non-empty rename target (ENOTEMPTY).

    ``writes`` maps table name (under ``base_path``) to its full new
    DataFrame contents.
    """
    import shutil

    staged = []
    for name, df in writes.items():
        target = os.path.join(base_path, name)
        staging = target + "_txn_staging"
        shutil.rmtree(staging, ignore_errors=True)  # stale from a crashed run
        df.write.mode("overwrite").parquet(staging)
        staged.append((staging, target))
    for staging, target in staged:
        old = target + "_txn_old"
        shutil.rmtree(old, ignore_errors=True)  # stale _old would wedge os.replace
        if os.path.exists(target):
            os.replace(target, old)
        os.replace(staging, target)
        shutil.rmtree(old, ignore_errors=True)


def healthcheck(
    spark: SparkSession,
    processor_check: Callable[[], None] | None = None,
    timeout: float = 10.0,
) -> list[str]:
    """Run the engine and processor health probes concurrently and join
    their failures (the fan-in of watcher.go:214-239).  Returns a list of
    error strings — empty means healthy.

    Engine probe = a trivial distributed job (the JVM/scheduler round-trip
    the reference's DB ping approximates); processor probe = the injectable
    callable (e.g. an HTTP GET against the processor's health endpoint,
    httprocessor/processor.go:88-95).
    """
    errors: list[str] = []

    def spark_ping() -> None:
        assert spark.range(1).count() == 1

    probes = {"spark": spark_ping}
    if processor_check is not None:
        probes["processor"] = processor_check
    with ThreadPoolExecutor(max_workers=len(probes)) as pool:
        futures = {name: pool.submit(fn) for name, fn in probes.items()}
        for name, fut in futures.items():
            try:
                fut.result(timeout=timeout)
            except Exception as e:  # noqa: BLE001 — join ALL failures
                errors.append(f"{name}: {e!r}")
    return errors


def serve_healthcheck(
    spark: SparkSession,
    port: int = 0,
    processor_check: Callable[[], None] | None = None,
):
    """Serve ``GET /healthcheck`` over HTTP — the reference's served
    endpoint (main.go:99-104: 200 when Watcher.Healthcheck returns no
    error, 503 with the joined error text otherwise), stdlib-only.

    Returns the started ``http.server.ThreadingHTTPServer`` (daemon
    thread); ``server.server_address[1]`` is the bound port (pass
    ``port=0`` for an ephemeral one), ``server.shutdown()`` stops it.
    """
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — stdlib contract
            if self.path.rstrip("/") != "/healthcheck":
                self.send_error(404)
                return
            errors = healthcheck(spark, processor_check=processor_check)
            body = ("ok" if not errors else "; ".join(errors)).encode()
            self.send_response(200 if not errors else 503)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet test output
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def http_healthcheck(
    target: str,
    endpoint: str = "healthcheck",
    transport: Callable[[str], int] | None = None,
    timeout: float = 10.0,
) -> Callable[[], None]:
    """Processor health probe: GET target/endpoint, raise on failure
    (httprocessor/processor.go:88-95).  ``transport(url) -> status`` is
    injectable for tests."""

    def default_transport(url: str) -> int:
        import urllib.request

        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return resp.status

    tx = transport or default_transport

    def check() -> None:
        url = target.rstrip("/") + "/" + endpoint
        status = tx(url)
        if not (200 <= status < 300):
            raise RuntimeError(f"healthcheck HTTP status {status}")

    return check

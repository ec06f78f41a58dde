"""CLI entry point e2e — ``python -m gofeed_spark`` (the reference's
runnable binary, examples/state_processor/main.go:22-112): launch the
service as a real subprocess against a seeded SQLite state store, poll the
served /healthcheck, watch the feed drain the seeded work through the
service loop, then SIGTERM and expect a clean exit."""

from __future__ import annotations

import os
import signal
import sqlite3
import subprocess
import sys
import time
import urllib.request

import pytest

pytestmark = pytest.mark.slow  # r18: excluded from the default driver tier (see pytest.ini)

from gofeed_spark.__main__ import _parse_hc_address, build_parser

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_hc_address():
    assert _parse_hc_address(":8080") == ("", 8080)
    assert _parse_hc_address("127.0.0.1:0") == ("127.0.0.1", 0)
    with pytest.raises(ValueError):
        _parse_hc_address("nope")


def test_parser_reference_flag_parity():
    """Every main.go flag (main.go:23-30) has a CLI twin."""
    args = build_parser().parse_args(
        [
            "--target", "http://x/process",
            "--sql-connection", "dsn",
            "--local",
            "--poll-interval", "2.5",
            "--batch-size", "50",
            "--table-prefix", "blue_",
            "--healthcheck-address", ":9090",
            "--db-log-level", "error",
        ]
    )
    assert args.target == "http://x/process"
    assert args.local and args.sql_connection == "dsn"
    assert args.poll_interval == 2.5 and args.batch_size == 50
    assert args.table_prefix == "blue_"
    assert args.healthcheck_address == ":9090"
    # main.go:35 db_log_level parity: gorm's four level names, mapped to
    # JVM log levels at startup
    from gofeed_spark.__main__ import _DB_LOG_LEVELS

    assert args.db_log_level == "error"
    assert _DB_LOG_LEVELS[args.db_log_level] == "ERROR"
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        build_parser().parse_args(["--db-log-level", "debug"])  # not a gorm level


def test_service_subprocess_drains_and_stops_cleanly(tmp_path):
    from gofeed_spark.feedstate.dbstore import DbApiStore
    from gofeed_spark.feedstate.model import AVAILABLE

    base = str(tmp_path / "svc")
    os.makedirs(base)
    db_path = os.path.join(base, "test.db")  # the --local path (main.go:77)
    store = DbApiStore(db_path, "sqlite3")
    n = 20
    store.seed(
        items_rows=[
            (f"i{k}", 0, 0, f"p{k % 4}", 0, AVAILABLE, "", '{"times": 1}', 0)
            for k in range(n)
        ],
        parts_rows=[(f"p{k}", 0, 0, AVAILABLE) for k in range(4)],
    )

    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "gofeed_spark",
            "--local",
            "--base-path", base,
            "--poll-interval", "0.5",
            "--db-log-level", "error",  # accepted live; quiets the driver
            "--healthcheck-address", "127.0.0.1:0",
        ],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        # Drain stdout CONTINUOUSLY in a reader thread: Spark's JVM logs
        # land on the same pipe, and once the 64 KB pipe buffer fills the
        # JVM blocks on write — the service stalls and SIGTERM can never
        # finish (observed as a TimeoutExpired under noisy suite runs).
        import threading

        lines: list[str] = []

        def drain():
            for line in proc.stdout:
                lines.append(line)

        threading.Thread(target=drain, daemon=True).start()

        # parse the bound ephemeral port from the service banner
        port, deadline = None, time.time() + 300
        while time.time() < deadline and port is None:
            assert proc.poll() is None, "".join(lines)
            for line in list(lines):
                if line.startswith("healthcheck serving on "):
                    port = int(line.rsplit(":", 1)[1])
                    break
            time.sleep(0.2)
        assert port, "".join(lines)

        # healthcheck answers 200 once the engine is up (main.go:99-104)
        deadline = time.time() + 240
        status = None
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthcheck", timeout=5
                ) as resp:
                    status = resp.status
                    break
            except Exception:
                time.sleep(1.0)
        assert status == 200

        # the service loop drains the seeded work (status 2 = Complete)
        deadline = time.time() + 300
        done = 0
        while time.time() < deadline:
            con = sqlite3.connect(db_path)
            try:
                done = con.execute(
                    "SELECT COUNT(*) FROM items WHERE status = 2"
                ).fetchone()[0]
            finally:
                con.close()
            if done == n:
                break
            time.sleep(1.0)
        assert done == n

        # SIGTERM -> clean stop (query stopped, exit 0)
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=120)
        assert rc == 0, "".join(lines)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)

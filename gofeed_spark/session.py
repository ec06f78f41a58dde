"""SparkSession factory + session-level configuration.

The reference wires its engine from CLI flags into a ``Watcher``
(``/root/reference/examples/state_processor/main.go:22-37,64-112``); our
equivalent bring-up is a configured SparkSession.  All confs chosen for a
large multi-executor cluster but harmless on local[N]:

- UTC session timezone (deterministic timestamp semantics vs the oracle),
- AQE with coalescing + skew-join splitting (runtime re-plan at 100 TB),
- Arrow for every Python<->JVM exchange (pandas UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that must hold on ANY session running our queries (set via
# spark.conf at runtime — all of these are runtime-settable SQL confs).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Respect the advisory partition size when coalescing instead of
    # maximizing parallelism: Spark's own docs recommend false — with the
    # default (true), a shuffle whose total output is a few MB still fans
    # out to defaultParallelism reducers, paying task-launch overhead per
    # reducer at small SF and producing under-filled reducers at 100 TB.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # At 100 TB the default 10 MB broadcast ceiling is too timid for the
    # dimension tables we broadcast explicitly; AQE still auto-broadcasts
    # bigger post-shuffle sides.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # ANSI off: the oracle (DuckDB) and the synthetic data never overflow,
    # and non-ANSI matches the reference's permissive Go arithmetic.
    "spark.sql.ansi.enabled": "false",
    # Some events.parquet generations carry TIMESTAMP(NANOS); Spark reads it
    # as LONG and the catalog truncates to µs (mirrors DuckDB's ns→µs
    # truncation).  µs-written generations are unaffected by this conf; the
    # catalog normalizes either form to session-zone TIMESTAMP.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as plain
    # TIMESTAMP (session zone, pinned UTC above) instead of TIMESTAMP_NTZ:
    # with the same wall-clock rendering as DuckDB's naive timestamps this
    # is semantics-neutral here, and it keeps scans cast-free — timestamp
    # predicates still push down to the parquet reader, and no per-row
    # projection rides on every events/orders/lineitem scan (the catalog's
    # NTZ cast fallback covers sessions where this conf can't be set).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}

# Build-time confs (only effective when WE create the session).
BUILDER_CONFS: dict[str, str] = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
}


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Idempotently apply runtime confs to an externally-provided session
    (the driver hands us its own SparkSession)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build — keep going
    return spark


def get_spark(
    app_name: str = "gofeed-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession configured for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when not running
    under an existing cluster session.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    for k, v in BUILDER_CONFS.items():
        builder = builder.config(k, v)
    if master.startswith("local-cluster"):
        # Separate executor JVMs with their own working dirs: executor
        # Python workers don't inherit the driver's sys.path, so the repo
        # root (gofeed_spark + vendored deps) must ride in explicitly —
        # the same thing a real cluster does with --py-files/PYTHONPATH.
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        extra = os.environ.get("PYTHONPATH", "")
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH",
            f"{repo_root}{os.pathsep}{extra}" if extra else repo_root,
        )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return ensure_session_confs(spark)

"""Catalog: the driver's synthetic parquet tables as DataFrames / temp views.

The reference's ``AutoMigrate`` declares its two-table schema from Go structs
(``/root/reference/internal/state/repo.go:102-104``); here the catalog is the
set of parquet tables in a scale-factor directory (TESTDATA.md).  Reads stay
fully declarative so Catalyst can push filters/projections into the parquet
scan (check ``PushedFilters`` / ``ReadSchema`` in ``df.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofeed_spark.session import ensure_session_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Resolved base relations, keyed per (JVM session, sf_dir, table).  A bare
# ``spark.read.parquet`` re-lists the directory and re-reads footers to
# infer the schema on EVERY call — ~0.1 s per table locally, pure overhead
# when the same immutable table backs dozens of queries.  A warehouse
# deployment gets schema + file listing from its table catalog (metastore)
# instead of per-query inference; this dict is that catalog for the
# driver's fixed parquet tables.  Safe because DataFrames are immutable
# plans and the testdata directories never change within a session.
_RELATION_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table. Lazy — no I/O until an action runs.

    ``events.ts`` normalizes to session-zone TIMESTAMP whatever the parquet
    generation wrote: TIMESTAMP(NANOS) arrives as LONG nanos (via
    ``nanosAsLong`` — Spark can't read ns natively; truncate to micros,
    exactly what DuckDB does on its side of the oracle comparison), while
    TIMESTAMP(MICROS) without UTC adjustment arrives as TIMESTAMP_NTZ (cast
    re-interprets the same wall-clock in the pinned UTC session zone, so
    both engines render identical instants).  Downstream code always sees
    plain TIMESTAMP.
    """
    ensure_session_confs(spark)
    # applicationId is unique per SparkContext: a restarted session gets a
    # fresh id, so a cached plan can never outlive its JVM session (a
    # Python id() key could be reused by the allocator after GC).
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    _RELATION_CACHE[key] = df
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-zone TIMESTAMP whatever the read
    path produced: LONG nanos (TIMESTAMP(NANOS) parquet via nanosAsLong →
    truncate to µs, mirroring DuckDB), TIMESTAMP_NTZ (a session where
    ``inferTimestampNTZ`` couldn't be disabled → re-interpret in the pinned
    UTC zone), or already TIMESTAMP (the fast path — no projection)."""
    ts_type = df.schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table_rowcount(sf_dir: str, name: str) -> int:
    """Exact row count from parquet footer metadata — no Spark job, no data
    read (the footer stores it).  The cheap statistics source for sizing
    decisions (LSH plane counts, broadcast-vs-shuffle branches): at
    warehouse scale the same number comes from the table catalog."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        return total
    return pq.ParquetFile(path).metadata.num_rows


def df_rowcount_estimate(df: DataFrame, max_files: int = 256) -> int | None:
    """Driver-side row-count ESTIMATE for a DataFrame without running a
    Spark job: sum the parquet footer counts of the plan's input files
    (``df.inputFiles()`` — public API, resolved from the already-listed
    file index, so no extra I/O beyond the footers).

    An upper bound when the plan filters rows, and an undercount when the
    plan multiplies them (explode / join / self-union) — callers use it
    only for order-of-magnitude sizing (log2 plane counts, coarse
    broadcast-vs-shuffle branches), where either error is benign and the
    alternative is a full COUNT job.

    Returns None — caller falls back to ``count()`` — when the plan has no
    file inputs (in-memory relations, streaming), uses a scheme we can't
    read driver-side (s3://..., where a real deployment asks its metastore
    instead), or spans more than ``max_files`` footers (footer reads are
    cheap but not free; a table that size deserves catalog statistics).
    """
    from urllib.parse import unquote, urlparse

    import pyarrow.parquet as pq

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or len(files) > max_files:
        return None
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None
        path = unquote(parsed.path)
        if not path.endswith(".parquet"):
            return None
        try:
            total += pq.ParquetFile(path).metadata.num_rows
        except Exception:
            return None
    return total


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every table as a temp view so ``spark.sql`` text matches the
    DuckDB oracle's table names 1:1."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

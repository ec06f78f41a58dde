"""Generic table IO: format-dispatched reads and partitioned writes.

The reference reads exactly one store (its SQL DB via the ORM); an
analytics engine needs file-format breadth and, at 100 TB, layout control:
``write_partitioned`` lays data out so later scans prune partitions
(static + dynamic partition pruning are free once the directory layout
exists — check ``PartitionFilters`` in the scan node).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {".parquet": "parquet", ".csv": "csv", ".json": "json", ".orc": "orc"}


def infer_format(path: str) -> str:
    for suffix, fmt in _FORMATS.items():
        if path.rstrip("/").endswith(suffix):
            return fmt
    return "parquet"


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Read any supported format; csv defaults to header+inferSchema unless
    an explicit schema is given (explicit schema skips the inference scan —
    always pass one on the hot path)."""
    fmt = fmt or infer_format(path)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows are hash-clustered into ``n_buckets``
    files by ``bucket_by`` at WRITE time, so an equi-join (or aggregation)
    on those keys between co-bucketed tables runs with NO shuffle — the
    exchange is pre-paid once at layout time, the cheapest join at 100 TB
    for repeatedly-joined fact tables.  ``sort_by`` additionally orders
    within buckets (sort-merge join without the sort)."""
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partition-laid-out write.  ``partition_by`` columns become directory
    keys so downstream filters on them prune at plan time;
    ``maxRecordsPerFile`` bounds file sizes (small-file storms and giant
    files both hurt at scale)."""
    out_fmt = fmt or infer_format(path)
    writer = df.write.format(out_fmt).mode(mode)
    if out_fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)


def recover_compact(path: str) -> bool:
    """Crash-restore for ``compact``'s publish window — run on entry there
    (and safe to run any time; idempotent, returns True if repaired).

    POSIX (rename swap) states: live missing + ``*_compact_old`` present →
    rename back; finished swap with lost cleanup → delete ``_old``; stray
    ``*_compact_staging`` → delete (pre-publish, live dir intact).

    Object-store (copy publish) states, keyed on the
    ``*_compact_commit.json`` marker (whose PUT is the commit point):
    marker + staging present → the copy may be partial, REDO it
    (idempotent: delete live objects, re-copy staging, delete staging,
    delete marker); marker without staging → copy completed, only the
    marker removal was lost → delete marker; staging without marker →
    incomplete staging write → delete staging."""
    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(path)
    base = path.rstrip("/")
    old, staging = base + "_compact_old", base + "_compact_staging"
    marker = base + "_compact_commit.json"
    if fs.supports_rename():
        if not fs.exists(path) and fs.exists(old):
            fs.rename(old, base)
            return True
        repaired = False
        for stray in (old, staging):
            if fs.exists(stray):
                fs.delete_tree(stray)
                repaired = True
        return repaired
    if fs.exists(marker):
        if fs.isdir(staging):
            _copy_publish(fs, staging, base, marker)
        else:
            fs.delete(marker)
        return True
    if fs.isdir(staging):
        fs.delete_tree(staging)
        return True
    return False


def _copy_publish(fs, staging: str, live: str, marker: str) -> None:
    """Rename-less publish: replace the live table's objects with the
    staging tree's, driver-side (GET+PUT per object).  Idempotent given
    the marker (redo-safe from any crash point); the byte volume is the
    COMPACTED output — acceptable for the maintenance tables this serves
    (dead-letter partitions), not a path for 100 TB fact tables, which
    live under Spark's own s3a:// data plane and compact by
    pointer-addressed layouts (see the MinHash index) instead."""
    fs.delete_tree(live)
    for rel, _size in fs.walk_files(staging):
        name = rel.rsplit("/", 1)[-1]
        if name.startswith(("_", ".")):
            continue  # _SUCCESS / hidden markers don't publish
        fs.put_bytes(fs.join(live, rel), fs.read_bytes(fs.join(staging, rel)))
    fs.delete_tree(staging)
    fs.delete(marker)


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str | None = None,
) -> int:
    """Small-file compaction: rewrite a table directory into
    ``ceil(total_bytes / target_file_bytes)`` files and atomically swap it
    in.  Returns the new file count.

    Streaming sinks and incremental upserts accrete small files; at 100 TB
    the scan's task count (and the namenode/object-store listing cost)
    tracks file count, not byte count, so periodic compaction is part of
    the table lifecycle (Delta/Iceberg call it OPTIMIZE / rewriteFiles —
    this is the plain-parquet equivalent, single-writer like the other
    staging flips; run it from the maintenance job, not the hot path).

    All artifact ops go through ``gofeed_spark.fs``.  Publish is
    backend-shaped: POSIX swaps directories by rename (parking the live
    dir at ``*_compact_old`` for crash recovery); a rename-less object
    store commits by PUTting a ``*_compact_commit.json`` marker and
    copy-publishing the staging objects over the live prefix —
    ``recover_compact`` redoes the copy from any crash point, so readers
    see either the old files or the new files plus a redo, never a
    half-published table without a recovery path."""
    import json
    import math

    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(path)
    recover_compact(path)
    base = path.rstrip("/")
    old, staging = base + "_compact_old", base + "_compact_staging"
    marker = base + "_compact_commit.json"

    out_fmt = fmt or infer_format(path)
    total = sum(
        size
        for rel, size in fs.walk_files(base)
        if not rel.rsplit("/", 1)[-1].startswith(("_", "."))
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    # Preserve a partitioned layout: discover the Hive-style key=value
    # directory chain and re-apply it — compacting an ANN/partitioned table
    # must never flatten the layout its pruned probes depend on.
    part_cols: list[str] = []
    probe = base
    while True:
        subs = [
            d
            for d in fs.listdir(probe)
            if "=" in d and fs.isdir(fs.join(probe, d))
        ]
        if not subs:
            break
        part_cols.append(subs[0].split("=", 1)[0])
        probe = fs.join(probe, subs[0])
    df = read_table(spark, fs.spark_path(base), fmt=out_fmt)
    fs.delete_tree(staging)
    if part_cols:
        # repartition BY the partition keys: one shuffled write produces
        # ≤ n_files files per partition directory without a global sort
        df = df.repartition(n_files, *part_cols)
    else:
        df = df.repartition(n_files)
    writer = df.write.format(out_fmt).mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    if out_fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(fs.spark_path(staging))
    if fs.supports_rename():
        fs.delete_tree(old)
        fs.rename(base, old)
        fs.rename(staging, base)
        fs.delete_tree(old)
    else:
        fs.put_bytes(marker, json.dumps({"staging": staging}).encode())
        _copy_publish(fs, staging, base, marker)
    return n_files


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Version-over-version corpus audit: one row per id whose MEMBERSHIP
    or CONTENT changed between two snapshots — change ∈ {added, removed,
    modified} (unchanged rows are dropped; the diff of two near-identical
    100 TB snapshots is small, and that asymmetry is the point).  The
    table-lifecycle companion to ``compact``: run it before publishing a
    regenerated corpus to see exactly what a rebuild touched.

    Plan: each side collapses to (id, md5(content)) — the only full-corpus
    work is the fingerprint projection inside the scan — then ONE
    full-outer shuffle on the id and a CASE.  Fingerprints compare
    content, so a re-shard/rewrite with identical rows diffs empty.
    """
    from pyspark.sql import functions as F

    o = old.select(F.col(id_col).alias("__id"), F.md5(F.col(content_col)).alias("__ofp"))
    n = new.select(F.col(id_col).alias("__id"), F.md5(F.col(content_col)).alias("__nfp"))
    change = (
        F.when(F.col("__ofp").isNull(), "added")
        .when(F.col("__nfp").isNull(), "removed")
        .when(F.col("__ofp") != F.col("__nfp"), "modified")
    )
    return (
        o.join(n, "__id", "full_outer")
        .select(F.col("__id").alias(id_col), change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


def shard_for_export(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "x",
) -> DataFrame:
    """Deterministic global shuffle + shard/position assignment for
    training export: shard = content-addressed hash of the id mod
    ``n_shards``; ``pos`` = the row's rank (by the same hash) within its
    shard.  Together (shard, pos) define a total order over the corpus
    that is a pure function of the ids — reproducible across engines,
    re-shards, and re-runs, unlike ``repartition`` (partitioner-dependent)
    or ``rand()`` (seed-per-partitioning).  Downstream,
    ``df.write.partitionBy('shard')`` (or repartition(n, 'shard') +
    sortWithinPartitions('pos')) materializes exactly the files a training
    loader consumes in order.

    Posture: one hash shuffle into ``n_shards`` groups + a per-shard sort
    (Spark's external sort — spills, never buffers); the md5 key is
    uniform so shards balance regardless of id distribution or source
    skew.  Tie-break on the id keeps ranks unique for duplicate hashes.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy(shard).orderBy(h, F.col(id_col))
    return docs.withColumn("shard", shard).withColumn(
        "pos", F.row_number().over(w).cast("int")
    )

"""Open-table-format queries: the Delta Lake (q156) and Apache Iceberg
(q158) interop lifecycles.

The engine's own upsert sink keeps a bespoke manifest (streaming/sinks.py);
``sources/delta.py`` and ``sources/iceberg.py`` speak the PUBLIC protocols
so the same engine reads and writes tables any Delta/Iceberg deployment
produces.  q156 drives the Delta lifecycle — multi-commit appends across a
parquet checkpoint, a partitioned layout, log-level time travel — and
hash-checks the result against an oracle that recomputes both snapshots
from the source rows, proving every log-replay path (checkpoint + JSON
tail, pre-checkpoint JSON-only) reconstructs exactly the rows each commit
added.  q158 does the same for Iceberg's metadata tree (manifest lists
carrying prior manifests by pointer, Avro manifests via the pure-Python
codec, snapshot time travel).

Reference: no table format exists in the reference (one ORM store,
repo.go); this is §2.E added surface closing VERDICT r13 missing item 3.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gofeed_spark.queries.registry import query


def T(spark, sf_dir, name):
    from gofeed_spark.catalog import load_table

    return load_table(spark, sf_dir, name)


@query(
    "q156_delta_time_travel",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_latest,
       CAST(SUM(n_chars) AS BIGINT) AS chars_latest,
       CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_v0
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q156(spark, sf_dir):
    """DELTA LAKE LIFECYCLE — write the documents corpus into a
    source-partitioned Delta table in three residue-class commits
    (doc_id % 3 = 0/1/2), checkpoint the log mid-stream (after commit 1),
    then read BOTH snapshots back through the protocol reader: HEAD
    resolves from checkpoint + JSON tail, version 0 proves pre-checkpoint
    time travel ignores the newer checkpoint and replays JSON alone.
    Output: per-source row count + char sum at HEAD joined with the
    version-0 row count.  The oracle recomputes both snapshots directly
    from documents — hash equality means the log replay reconstructed the
    commit contents exactly (eager at construction, like q118/q127: the
    table builds in a temp dir when the callable runs)."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q156_") + "/tbl"
    try:
        for residue in (0, 1, 2):
            D.write_delta(
                docs.filter(F.col("doc_id") % 3 == residue),
                work,
                partition_by=["source"],
            )
            if residue == 1:
                D.checkpoint_delta(work)
        head = (
            D.read_delta(spark, work)
            .groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_latest"),
                F.sum("n_chars").cast("long").alias("chars_latest"),
            )
        )
        v0 = (
            D.read_delta(spark, work, version=0)
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("n_v0"))
        )
        return head.join(v0, "source").orderBy("source").localCheckpoint()
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q158_iceberg_time_travel",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_latest,
       CAST(SUM(n_chars) AS BIGINT) AS chars_latest,
       CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_s1
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q158(spark, sf_dir):
    """APACHE ICEBERG LIFECYCLE — the q156 discipline applied to the
    second open table format: write the documents corpus into a
    source-partitioned Iceberg table in three residue-class commits
    (doc_id % 3 = 0/1/2; each manifest list carries the prior commits'
    manifests BY POINTER, so commit metadata I/O is O(new files)), then
    read BOTH snapshots back through the metadata tree: HEAD walks
    metadata JSON → manifest list → Avro manifests (pure-Python codec) →
    parquet file set, and snapshot 1 proves time travel replays the
    first commit's manifest list alone.  Output: per-source row count +
    char sum at HEAD joined with the snapshot-1 row count.  The oracle
    recomputes both snapshots directly from documents — hash equality
    means the manifest walk reconstructed the commit contents exactly
    (eager at construction, like q156)."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q158_") + "/tbl"
    try:
        first = None
        for residue in (0, 1, 2):
            sid = I.write_iceberg(
                docs.filter(F.col("doc_id") % 3 == residue),
                work,
                partition_by=["source"],
            )
            first = first if first is not None else sid
        head = (
            I.read_iceberg(spark, work)
            .groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_latest"),
                F.sum("n_chars").cast("long").alias("chars_latest"),
            )
        )
        s1 = (
            I.read_iceberg(spark, work, snapshot_id=first)
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("n_s1"))
        )
        # LEFT join: a source with zero residue-0 docs has no s1 row, but
        # the oracle still emits it with n_s1 = 0 (possible at non-gate SFs)
        return (
            head.join(s1, "source", "left")
            .select(
                "source",
                "n_latest",
                "chars_latest",
                F.coalesce("n_s1", F.lit(0)).cast("long").alias("n_s1"),
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q160_table_changes",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(COUNT(DISTINCT doc_id % 3) AS BIGINT) AS n_delta_commits,
       CAST(COUNT(DISTINCT doc_id % 3) AS BIGINT) AS n_iceberg_snaps
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q160(spark, sf_dir):
    """INCREMENTAL CHANGE READS on both open table formats — the
    primitive that lets a downstream pipeline (index append, dedup
    probe, ingest scoring) process O(new data) instead of rescanning a
    table another engine keeps appending to: the corpus lands in three
    residue-class append commits per format, then
    ``read_delta_changes(-1)`` / ``read_iceberg_changes(0)`` reconstruct
    the FULL table purely from per-commit add actions / per-snapshot
    added manifests, each row labeled with its commit.  Per source the
    output proves (a) no increment was lost or double-counted (counts +
    char sums match the documents table exactly) and (b) every one of
    the three commits contributed (distinct commit labels == distinct
    residues).  Carried-forward Iceberg manifests double-count increments
    unless filtered by added_snapshot_id — exactly what the hash check
    pins.  (The d⋈i inner join is residue-safe at ANY SF: both sides
    aggregate the FULL corpus, so they carry identical source sets.)"""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D
    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q160_")
    dt, it = f"{work}/delta", f"{work}/ice"
    try:
        for residue in (0, 1, 2):
            part = docs.filter(F.col("doc_id") % 3 == residue)
            D.write_delta(part, dt, partition_by=["source"])
            I.write_iceberg(part, it, partition_by=["source"])
        d = (
            D.read_delta_changes(spark, dt, -1)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("chars_total"),
                F.countDistinct("_commit_version")
                .cast("long")
                .alias("n_delta_commits"),
            )
        )
        i = (
            I.read_iceberg_changes(spark, it, 0)
            .groupBy("source")
            .agg(
                F.countDistinct("_snapshot_id")
                .cast("long")
                .alias("n_iceberg_snaps"),
            )
        )
        return d.join(i, "source").orderBy("source").localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q161_oracle():
    # identical semantics to q100: the probe corpus/batch construction and
    # the one-witness fingerprint-equality verdict — only the TRANSPORT
    # differs (rows arrive through Delta commits instead of direct frames)
    from gofeed_spark.queries.registry import ORACLES

    return ORACLES["q100_incremental_dedup"]


@query("q161_table_fed_dedup", oracle=_q161_oracle())
def q161(spark, sf_dir):
    """CHANGE-FED INCREMENTAL DEDUP — the q100 probe driven end-to-end
    from an open table format, composing this round's pieces into the
    production shape: another engine keeps APPENDING crawl batches to a
    Delta table; the curation pipeline remembers the last version it
    processed and each tick reads ONLY the new rows
    (``read_delta_changes``), probing them against the persisted MinHash
    index without ever rescanning or re-shuffling either the standing
    corpus or the table.  Here: commit 0 lands the standing corpus (90%
    of docs), commit 1 lands the incoming batch (every 10th doc, every
    20th a planted clone); the index builds from the v0 window, the
    probe consumes the (0, HEAD] window, and the verdicts hash-match
    q100's oracle exactly — proving the table transport changes nothing
    about dedup semantics.  At 100 TB each tick's cost is O(batch +
    collisions): the change read lists the new commit's files only, the
    probe broadcasts batch bands against index scans."""
    import shutil
    import tempfile

    from gofeed_spark.operators import dedup
    from gofeed_spark.sources import delta as D

    docs = T(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    src = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("src_text")
    )
    batch = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .join(src, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 20 == 0) & F.col("src_text").isNotNull(),
                F.col("src_text"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    work = tempfile.mkdtemp(prefix="gofeed_q161_")
    tbl, idx = f"{work}/landing", f"{work}/mh_index"
    try:
        D.write_delta(corpus, tbl)      # v0: the standing corpus
        D.write_delta(batch, tbl)       # v1: the incoming crawl batch
        standing = D.read_delta_changes(spark, tbl, -1, end_version=0).select(
            "doc_id", "text"
        )
        dedup.build_minhash_index(standing, idx, num_hashes=64, bands=16, k=5)
        incoming = D.read_delta_changes(spark, tbl, 0).select("doc_id", "text")
        out = dedup.probe_minhash_index(spark, idx, incoming, threshold=1.0)
        return (
            out.select("new_id", "dup_of")
            .orderBy("new_id", "dup_of")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q165_schema_evolution",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_chars,
       CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
         AS chars_sum,
       CAST(COUNT(*) AS BIGINT) AS n_docs_ice,
       CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
         AS chars_sum_ice
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q165(spark, sf_dir):
    """ADDITIVE SCHEMA EVOLUTION on both open formats — the first
    deployment question after basic read/write: a table created WITHOUT
    a column accretes a commit that brings it (evolve_schema=True; the
    mergeSchema shape).  Delta re-emits the metaData action with the
    widened schema (appended columns forced nullable — old files read
    them as NULL); Iceberg appends a NEW schema object with a new
    schema-id and fresh field ids while existing ids stay stable (the
    spec's evolution form).  Per source the output proves (a) every row
    from both eras is present, (b) exactly the post-evolution rows carry
    values, and (c) the values survived — on BOTH formats in one
    hash-checked result.  Pre-evolution time travel keeps the narrow
    schema (pinned in tests).  (The d⋈i inner join is era-safe at ANY SF:
    both sides aggregate the full two-era table, so they carry identical
    source sets.)"""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D
    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents")
    narrow = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source")
    wide = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    work = tempfile.mkdtemp(prefix="gofeed_q165_")
    dt, it = f"{work}/delta", f"{work}/ice"
    try:
        D.write_delta(narrow, dt, partition_by=["source"])
        D.write_delta(wide, dt, partition_by=["source"], evolve_schema=True)
        I.write_iceberg(narrow, it, partition_by=["source"])
        I.write_iceberg(wide, it, partition_by=["source"], evolve_schema=True)
        d = (
            D.read_delta(spark, dt)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.count("n_chars").cast("long").alias("n_with_chars"),
                F.sum("n_chars").cast("long").alias("chars_sum"),
            )
        )
        i = (
            I.read_iceberg(spark, it)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs_ice"),
                F.sum("n_chars").cast("long").alias("chars_sum_ice"),
            )
        )
        return d.join(i, "source").orderBy("source").localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q167_iceberg_position_deletes",
    oracle="""
SELECT source,
       CAST(COUNT(CASE WHEN doc_id % 7 <> 0 THEN 1 END) AS BIGINT) AS n_live,
       CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN n_chars END) AS BIGINT)
         AS chars_live,
       CAST(COUNT(*) AS BIGINT) AS n_before
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q167(spark, sf_dir):
    """MERGE-ON-READ POSITION DELETES (Iceberg v2) — the top real-user
    interop gap from VERDICT r14: tables other engines mutate with
    row-level deletes.  The corpus lands in two append commits
    (source-partitioned), then ``delete_iceberg_rows`` commits
    spec-shaped position-delete files (content=1 manifest; (file_path,
    pos) parquet sorted per the spec) hiding every ``doc_id % 7 = 0``
    row WITHOUT rewriting any data file.  The HEAD read applies the
    deletes as one distributed anti join on (file, _metadata.row_index)
    with sequence-number scoping; the pre-delete snapshot still sees
    every row (time travel over merge-on-read state).  Output per
    source: surviving count + char sum LEFT-joined (a source whose docs
    are ALL deleted must still appear with n_live=0) with the pre-delete
    count.  Eager at construction like q156/q158."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q167_") + "/tbl"
    try:
        last = None
        for residue in (0, 1):
            last = I.write_iceberg(
                docs.filter(F.col("doc_id") % 2 == residue),
                work,
                partition_by=["source"],
            )
        I.delete_iceberg_rows(spark, work, "doc_id % 7 = 0")
        live = (
            I.read_iceberg(spark, work)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_live"),
                F.sum("n_chars").cast("long").alias("chars_live"),
            )
        )
        before = (
            I.read_iceberg(spark, work, snapshot_id=last)
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_before"))
        )
        return (
            before.join(live, "source", "left")
            .select(
                "source",
                F.coalesce("n_live", F.lit(0)).cast("long").alias("n_live"),
                "chars_live",
                "n_before",
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q168_iceberg_day_transform",
    oracle="""
WITH d AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS DOUBLE)
         AS value_sum
FROM events, d
WHERE CAST(ts AS DATE) = d.d0
GROUP BY event_type
ORDER BY event_type
""",
)
def q168(spark, sf_dir):
    """NON-IDENTITY PARTITION TRANSFORMS (Iceberg spec §Partition
    Transforms) — real Iceberg tables are overwhelmingly ``day(ts)``- or
    ``bucket(N, id)``-partitioned, not identity (VERDICT r14 missing
    item 2).  The events table lands in a ``day(ts)``-partitioned
    Iceberg table in two commits (the staged write computes days-since-
    epoch per row in pure codegen; the source ``ts`` column STAYS in the
    data files per the spec); the read then prunes to the corpus's FIRST
    day at the MANIFEST level — the transformed where-value is computed
    driver-side by the pure-Python transform twin
    (``icetransforms.transform_value``), no Spark job, and only that
    day's files enter the relation.  Output: per-event-type count + value
    sum over the pruned day, hash-checked against the oracle's
    ``CAST(ts AS DATE) = MIN(...)`` filter — equality proves the
    transform partitioning routed every row to the right day AND the
    pruned read lost none of them.  Eager at construction like q158."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I
    from gofeed_spark.sources import icetransforms as X

    ev = T(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    work = tempfile.mkdtemp(prefix="gofeed_q168_") + "/tbl"
    try:
        for residue in (0, 1):
            I.write_iceberg(
                ev.filter(F.col("event_id") % 2 == residue),
                work,
                partition_by=["day(ts)"],
            )
        d0 = ev.agg(F.min(F.to_date("ts")).alias("d")).collect()[0]["d"]
        day = X.transform_value("day", "date", d0)
        return (
            I.read_iceberg(spark, work, where={"ts_day": str(day)})
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                # exact fixed-point in LONG cents (the q01 convention):
                # integer addition is order-independent, so the hash is
                # stable across engines and partitionings
                (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0)
                .cast("double")
                .alias("value_sum"),
            )
            .orderBy("event_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q169_delta_column_mapping",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_v0
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q169(spark, sf_dir):
    """DELTA COLUMN MAPPING (name mode) — the Databricks-default layout
    for new tables (VERDICT r14 next-round item 3): every data file
    carries ONLY opaque ``col-<uuid>`` physical column names, partition
    directories and partitionValues use physical names, and the
    logical→physical map lives in the schema metadata.  The corpus lands
    in a column-mapped source-partitioned table in two commits with a
    log CHECKPOINT between them (the mapping must survive checkpoint
    replay — dropping ``configuration`` there would silently misread),
    then HEAD and version-0 reads aggregate per source.  Hash equality
    against the plain documents oracle proves the physical→logical
    round trip is lossless end to end.  Eager at construction like
    q156."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q169_") + "/tbl"
    try:
        D.write_delta(
            docs.filter(F.col("doc_id") % 2 == 0),
            work,
            partition_by=["source"],
            column_mapping=True,
        )
        D.checkpoint_delta(work)
        D.write_delta(
            docs.filter(F.col("doc_id") % 2 == 1), work, partition_by=["source"]
        )
        head = (
            D.read_delta(spark, work)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("chars_total"),
            )
        )
        v0 = (
            D.read_delta(spark, work, version=0)
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_v0"))
        )
        return (
            head.join(v0, "source", "left")
            .select(
                "source",
                "n_docs",
                "chars_total",
                F.coalesce("n_v0", F.lit(0)).cast("long").alias("n_v0"),
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q170_delta_change_data_feed",
    oracle="""
SELECT ct AS change_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(chars) AS BIGINT) AS chars_total,
       CAST(COUNT(DISTINCT src) AS BIGINT) AS n_sources
FROM (
  SELECT 'insert' AS ct, n_chars AS chars, source AS src FROM documents
  UNION ALL
  SELECT 'update_preimage', n_chars, source
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT 'update_postimage', n_chars + 1000, source
  FROM documents WHERE doc_id % 5 = 0
)
GROUP BY ct
ORDER BY ct
""",
)
def q170(spark, sf_dir):
    """UPDATE-BEARING CHANGE DATA FEED (Delta cdc actions) — the
    reference's change feed is precisely about rows that get UPDATED
    (repo.go polls on updated_at); this is that semantics in the open
    log format (VERDICT r14 next-round item 5).  The corpus lands in two
    insert commits (source-partitioned), then ``update_delta`` bumps
    ``n_chars`` by 1000 on every ``doc_id % 5 = 0`` row — rewriting only
    the affected files and committing ``_change_data/`` cdc files with
    the changed rows as preimage/postimage.  ``read_delta_changes(-1,
    cdf=True)`` over the full window emits the two insert commits' rows
    as ``insert`` and the update commit's rows from its cdc files ONLY —
    the rewritten-but-unchanged neighbors never appear (the protocol's
    cdc-wins rule, which is exactly what the hash pins: counting the
    rewritten rows would inflate n_rows).  Partition values on cdc rows
    restore from the action's partitionValues (n_sources proves it).
    Eager at construction like q156."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D

    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    work = tempfile.mkdtemp(prefix="gofeed_q170_") + "/tbl"
    try:
        for residue in (0, 1):
            D.write_delta(
                docs.filter(F.col("doc_id") % 2 == residue),
                work,
                partition_by=["source"],
            )
        D.update_delta(
            spark, work, "doc_id % 5 = 0", {"n_chars": "n_chars + 1000"}
        )
        return (
            D.read_delta_changes(spark, work, -1, cdf=True)
            .groupBy(F.col("_change_type").alias("change_type"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("n_chars").cast("long").alias("chars_total"),
                F.countDistinct("source").cast("long").alias("n_sources"),
            )
            .orderBy("change_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q171_iceberg_compaction",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(COUNT(DISTINCT doc_id % 3) AS BIGINT) AS n_change_snaps,
       CAST(COUNT(*) AS BIGINT) AS n_pre_rewrite
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q171(spark, sf_dir):
    """ICEBERG COMPACTION (``rewrite_iceberg`` — the rewrite_data_files
    twin of Delta OPTIMIZE, VERDICT r14 next-round item 7): three
    residue-class append commits land the corpus as many small files per
    partition; ONE ``replace`` snapshot then bin-packs each partition,
    carrying every untouched entry as EXISTING with its original data
    sequence number.  The output proves the three contracts at once:
    (a) HEAD contents are byte-identical to pre-rewrite (counts + char
    sums match the raw corpus), (b) incremental consumers SKIP the
    replace snapshot — the change feed still sees exactly the three
    append snapshots (n_change_snaps), and (c) time travel below the
    rewrite still resolves (n_pre_rewrite).  Eager at construction like
    q158."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q171_") + "/tbl"
    try:
        last = None
        for residue in (0, 1, 2):
            last = I.write_iceberg(
                docs.filter(F.col("doc_id") % 3 == residue),
                work,
                partition_by=["source"],
            )
        res = I.rewrite_iceberg(
            spark, work, target_file_bytes=1 << 30, min_files=2
        )
        assert res["rewritten"] > 0, "rewrite was a no-op; fixture too small"
        head = (
            I.read_iceberg(spark, work)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("chars_total"),
            )
        )
        ch = (
            I.read_iceberg_changes(spark, work, 0)
            .groupBy("source")
            .agg(
                F.countDistinct("_snapshot_id")
                .cast("long")
                .alias("n_change_snaps")
            )
        )
        pre = (
            I.read_iceberg(spark, work, snapshot_id=last)
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pre_rewrite"))
        )
        return (
            head.join(ch, "source").join(pre, "source")
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q173_delta_delete_cdf",
    oracle="""
SELECT ct AS change_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(chars) AS BIGINT) AS chars_total,
       CAST(COUNT(DISTINCT src) AS BIGINT) AS n_sources
FROM (
  SELECT 'insert' AS ct, n_chars AS chars, source AS src FROM documents
  UNION ALL
  SELECT 'delete', n_chars, source FROM documents WHERE doc_id % 6 = 0
)
GROUP BY ct
ORDER BY ct
""",
)
def q173(spark, sf_dir):
    """ROW-LEVEL DELETE with change-feed output (Delta) — the companion
    of q170's UPDATE: ``delete_delta_rows`` rewrites only the affected
    files WITHOUT the matching rows and commits ``_change_data/`` cdc
    files carrying exactly the deleted rows as ``_change_type='delete'``.
    ``read_delta_changes(cdf=True)`` over the full window emits the
    insert commits' rows plus the delete commit's cdc rows ONLY — the
    surviving rewritten neighbors never appear (counting them would
    inflate n_rows, which is what the hash pins).  Partition values on
    cdc rows restore from partitionValues (n_sources).  Eager at
    construction like q170."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D

    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    work = tempfile.mkdtemp(prefix="gofeed_q173_") + "/tbl"
    try:
        for residue in (0, 1):
            D.write_delta(
                docs.filter(F.col("doc_id") % 2 == residue),
                work,
                partition_by=["source"],
            )
        D.delete_delta_rows(spark, work, "doc_id % 6 = 0")
        return (
            D.read_delta_changes(spark, work, -1, cdf=True)
            .groupBy(F.col("_change_type").alias("change_type"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("n_chars").cast("long").alias("chars_total"),
                F.countDistinct("source").cast("long").alias("n_sources"),
            )
            .orderBy("change_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q174_iceberg_equality_deletes",
    oracle="""
SELECT source,
       CAST(COUNT(CASE WHEN doc_id % 9 <> 0 OR doc_id % 18 = 0 THEN 1 END)
            AS BIGINT) AS n_live,
       CAST(SUM(CASE WHEN doc_id % 9 <> 0 OR doc_id % 18 = 0
                     THEN n_chars END) AS BIGINT) AS chars_live,
       CAST(COUNT(*) AS BIGINT) AS n_before
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q174(spark, sf_dir):
    """EQUALITY DELETES (Iceberg content=2) — the CDC-upsert primitive:
    delete rows BY KEY with zero data-file reads (``delete_iceberg_
    equality`` commits one sorted key file + equality_ids manifest
    entry; a position delete needs coordinates, an equality delete just
    needs the key).  The corpus lands in two append commits, every
    ``doc_id % 9 = 0`` key is equality-deleted, then the ``doc_id % 18
    = 0`` rows are RE-APPENDED — and survive, because equality deletes
    hide rows only in data files sequenced STRICTLY BELOW them (the
    spec rule that makes delete-then-reinsert an upsert; the hash pins
    both directions: old key rows gone, re-appended ones present
    exactly once).  Reads apply the deletes as one null-safe anti join
    per equality-column set.  Pre-delete time travel sees every row.
    Eager at construction like q167."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q174_") + "/tbl"
    try:
        last = None
        for residue in (0, 1):
            last = I.write_iceberg(
                docs.filter(F.col("doc_id") % 2 == residue),
                work,
                partition_by=["source"],
            )
        keys = docs.filter(F.col("doc_id") % 9 == 0).select("doc_id")
        I.delete_iceberg_equality(spark, work, keys)
        I.write_iceberg(
            docs.filter(F.col("doc_id") % 18 == 0), work, partition_by=["source"]
        )
        live = (
            I.read_iceberg(spark, work)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_live"),
                F.sum("n_chars").cast("long").alias("chars_live"),
            )
        )
        before = (
            I.read_iceberg(spark, work, snapshot_id=last)
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_before"))
        )
        return (
            before.join(live, "source", "left")
            .select(
                "source",
                F.coalesce("n_live", F.lit(0)).cast("long").alias("n_live"),
                "chars_live",
                "n_before",
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q175_delta_deletion_vectors",
    oracle="""
SELECT source,
       CAST(COUNT(CASE WHEN doc_id % 7 <> 0 THEN 1 END) AS BIGINT) AS n_live,
       CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN n_chars END) AS BIGINT)
         AS chars_live,
       CAST(COUNT(*) AS BIGINT) AS n_before
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q175(spark, sf_dir):
    """DELETION VECTORS (Delta) — the last named refusal closed: the
    corpus lands in two append commits, then ``delete_delta_rows(dv=
    True)`` hides every ``doc_id % 7 = 0`` row by RE-ADDING the affected
    files with storageType-'u' descriptors into one roaring-compressed
    ``deletion_vector_<uuid>.bin`` (positions encoded per file ON
    EXECUTORS; the protocol upgrades to the feature-gated 3/7 +
    deletionVectors form) — zero data-file rewrite.  The HEAD read
    fetches each DV's compressed payload driver-side (byte slice +
    CRC), explodes it to positions on executors, and anti-joins against
    ``_metadata.row_index``; pre-DV time travel still sees every row.
    Hash equality against the plain documents oracle proves the roaring
    codec + framing + application round trip end to end.  Eager at
    construction like q167 (its Iceberg position-delete twin)."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q175_") + "/tbl"
    try:
        for residue in (0, 1):
            D.write_delta(
                docs.filter(F.col("doc_id") % 2 == residue),
                work,
                partition_by=["source"],
            )
        D.delete_delta_rows(spark, work, "doc_id % 7 = 0", dv=True)
        live = (
            D.read_delta(spark, work)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_live"),
                F.sum("n_chars").cast("long").alias("chars_live"),
            )
        )
        before = (
            D.read_delta(spark, work, version=1)
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_before"))
        )
        return (
            before.join(live, "source", "left")
            .select(
                "source",
                F.coalesce("n_live", F.lit(0)).cast("long").alias("n_live"),
                "chars_live",
                "n_before",
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q176_iceberg_changelog",
    oracle="""
SELECT ct AS change_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(chars) AS BIGINT) AS chars_total,
       CAST(COUNT(DISTINCT snap) AS BIGINT) AS n_snaps,
       CAST(COUNT(DISTINCT src) AS BIGINT) AS n_sources
FROM (
  SELECT 'insert' AS ct, n_chars AS chars, doc_id % 2 AS snap, source AS src
  FROM documents
  UNION ALL
  SELECT 'delete', n_chars, 10, source FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT 'delete', n_chars, 11, source
  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 5 <> 0
)
GROUP BY ct
ORDER BY ct
""",
)
def q176(spark, sf_dir):
    """ICEBERG CHANGELOG over delete-bearing snapshots — the Delta-CDF
    twin on the second format, closing VERDICT r14 missing item 3 in
    BOTH directions: ``read_iceberg_changes(cdf=True)`` emits append
    snapshots' rows as ``insert`` and each DELETE snapshot's hidden rows
    as ``delete``, computed by semi-joining the snapshot's NEW delete
    files against the PARENT state — so the position-delete snapshot
    contributes exactly the ``doc_id % 5 = 0`` rows, and the LATER
    equality-delete snapshot contributes only the ``% 7`` keys STILL
    LIVE at its parent (the %35 overlap must NOT double-report; that
    parent-state semantics is precisely what the hash pins, along with
    per-snapshot labels and partition restore on delete rows).  Eager
    at construction like q170."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    work = tempfile.mkdtemp(prefix="gofeed_q176_") + "/tbl"
    try:
        for residue in (0, 1):
            I.write_iceberg(
                docs.filter(F.col("doc_id") % 2 == residue),
                work,
                partition_by=["source"],
            )
        I.delete_iceberg_rows(spark, work, "doc_id % 5 = 0")
        I.delete_iceberg_equality(
            spark, work, docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
        )
        return (
            I.read_iceberg_changes(spark, work, 0, cdf=True)
            .groupBy(F.col("_change_type").alias("change_type"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("n_chars").cast("long").alias("chars_total"),
                F.countDistinct("_snapshot_id").cast("long").alias("n_snaps"),
                F.countDistinct("source").cast("long").alias("n_sources"),
            )
            .orderBy("change_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q177_restore_rollback",
    oracle="""
SELECT source,
       CAST(COUNT(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS BIGINT)
         AS n_restored,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN n_chars END) AS BIGINT)
         AS chars_restored,
       CAST(COUNT(CASE WHEN doc_id % 5 <> 0 THEN 1 END) AS BIGINT)
         AS n_forward,
       CAST(COUNT(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS BIGINT)
         AS n_restored_ice
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q177(spark, sf_dir):
    """RESTORE / ROLLBACK — the time-travel WRITE half of the lifecycle
    (history reads existed since q156/q158; this makes an old state the
    table's PRESENT): both tables take two append commits plus a
    row-level delete, then Delta RESTOREs to version 0 (one commit whose
    remove/add actions are exactly the file-set diff vs the target —
    files re-added with their as-of metadata, deletion-vector
    descriptors included) and Iceberg ROLLS BACK to snapshot 1 (a pure
    metadata repoint — zero data or manifest I/O, because snapshots are
    immutable).  The output proves per source that (a) both HEADs equal
    the first commit exactly, and (b) the rolled-back-FROM state still
    time-travels (n_forward reads the pre-restore Delta version) —
    restore preserves history, never erases it.  Eager at construction
    like q156."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D
    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q177_")
    dt, it = f"{work}/delta", f"{work}/ice"
    try:
        first = None
        for residue in (0, 1):
            D.write_delta(
                docs.filter(F.col("doc_id") % 2 == residue),
                dt,
                partition_by=["source"],
            )
            sid = I.write_iceberg(
                docs.filter(F.col("doc_id") % 2 == residue),
                it,
                partition_by=["source"],
            )
            first = first if first is not None else sid
        D.delete_delta_rows(spark, dt, "doc_id % 5 = 0")
        I.delete_iceberg_rows(spark, it, "doc_id % 5 = 0")
        pre_restore = D.latest_version(dt)
        D.restore_delta(spark, dt, 0)
        I.rollback_iceberg(it, first)
        restored = (
            D.read_delta(spark, dt)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_restored"),
                F.sum("n_chars").cast("long").alias("chars_restored"),
            )
        )
        forward = (
            D.read_delta(spark, dt, version=pre_restore)
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_forward"))
        )
        ice = (
            I.read_iceberg(spark, it)
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_restored_ice"))
        )
        # base = every source the FULL table ever had (version 1 = both
        # commits): the corpus assigns sources by doc_id residue, so the
        # restored state and even the forward state can each MISS whole
        # sources — the oracle still emits them with zero counts
        base = (
            D.read_delta(spark, dt, version=1).select("source").distinct()
        )
        return (
            base.join(forward, "source", "left")
            .join(restored, "source", "left")
            .join(ice, "source", "left")
            .select(
                "source",
                F.coalesce("n_restored", F.lit(0)).cast("long").alias("n_restored"),
                "chars_restored",
                F.coalesce("n_forward", F.lit(0)).cast("long").alias("n_forward"),
                F.coalesce("n_restored_ice", F.lit(0))
                .cast("long")
                .alias("n_restored_ice"),
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q178_timestamp_time_travel",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_head,
       CAST(COUNT(CASE WHEN doc_id % 3 IN (0, 1) THEN 1 END) AS BIGINT)
         AS n_delta_ts,
       CAST(COUNT(CASE WHEN doc_id % 3 IN (0, 1) THEN 1 END) AS BIGINT)
         AS n_ice_ts,
       CAST(COUNT(CASE WHEN doc_id % 3 = 0 THEN 1 END) AS BIGINT)
         AS n_ice_rb
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q178(spark, sf_dir):
    """TIMESTAMP TIME TRAVEL — the ``AS OF TIMESTAMP`` form users
    actually type (r15 verdict missing item 3), on BOTH formats: three
    residue-class commits each; Delta resolves a between-commits
    timestamp through the protocol rule (commitInfo/inCommitTimestamp
    when present, else MONOTONIZED commit-file mtimes — pinned here via
    os.utime, the clock-free fixture convention), Iceberg through the
    SNAPSHOT LOG (timestamp-ms = sequence number by the engine's
    clock-free convention), including the rollback repoint: after
    rollback_iceberg the snapshot-log's newest entry re-points
    timestamps at/after it to the RESTORED snapshot, exactly like real
    readers.  Output per source: HEAD count, both formats' counts at a
    timestamp between commits 2 and 3 (= residues 0+1), and the
    post-rollback iceberg count (= residue 0).  Eager at construction
    like q156."""
    import os
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D
    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    work = tempfile.mkdtemp(prefix="gofeed_q178_")
    dt, it = f"{work}/delta", f"{work}/ice"
    try:
        sids = []
        for residue in (0, 1, 2):
            D.write_delta(
                docs.filter(F.col("doc_id") % 3 == residue),
                dt,
                partition_by=["source"],
            )
            os.utime(
                f"{dt}/_delta_log/{residue:020d}.json",
                ((residue + 1) * 1000, (residue + 1) * 1000),
            )
            sids.append(
                I.write_iceberg(
                    docs.filter(F.col("doc_id") % 3 == residue),
                    it,
                    partition_by=["source"],
                )
            )
        head = (
            D.read_delta(spark, dt)
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_head"))
        )
        # between commits 1 and 2 (mtimes 2000 s and 3000 s) → version 1
        d_ts = (
            D.read_delta(spark, dt, as_of_ts=2500_000)
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_delta_ts"))
        )
        i_ts = (
            I.read_iceberg(spark, it, as_of_ts=sids[1])
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_ice_ts"))
        )
        I.rollback_iceberg(it, sids[0])
        # the rollback's snapshot-log entry stamps last-seq: timestamps
        # after it resolve to the restored first snapshot
        i_rb = (
            I.read_iceberg(spark, it, as_of_ts=sids[2] + 1)
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_ice_rb"))
        )
        # base = every source at HEAD (all residues): earlier states may
        # miss whole sources — the oracle still emits them with zeros
        return (
            head.join(d_ts, "source", "left")
            .join(i_ts, "source", "left")
            .join(i_rb, "source", "left")
            .select(
                "source",
                "n_head",
                F.coalesce("n_delta_ts", F.lit(0)).cast("long").alias("n_delta_ts"),
                F.coalesce("n_ice_ts", F.lit(0)).cast("long").alias("n_ice_ts"),
                F.coalesce("n_ice_rb", F.lit(0)).cast("long").alias("n_ice_rb"),
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q179_delta_merge_upsert",
    oracle="""
SELECT source,
       CAST(COUNT(*) + COUNT(CASE WHEN doc_id % 7 = 4 THEN 1 END) AS BIGINT)
         AS n_head,
       CAST(SUM(n_chars)
            + 100000 * COUNT(CASE WHEN doc_id % 7 = 2 THEN 1 END)
            + SUM(CASE WHEN doc_id % 7 = 4 THEN n_chars + 7 ELSE 0 END)
         AS BIGINT) AS chars_head,
       CAST(COUNT(CASE WHEN doc_id % 7 = 2 THEN 1 END) AS BIGINT) AS n_upd,
       CAST(COUNT(CASE WHEN doc_id % 7 = 4 THEN 1 END) AS BIGINT) AS n_ins
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q179(spark, sf_dir):
    """DELTA MERGE (keyed upsert) — the open-format form of the
    reference's OCC Save upsert (reference internal/state/repo.go:125-138;
    r15 verdict missing item 1): seed a Delta table with documents, then
    ONE merge_delta commit that UPDATES the %7=2 class (n_chars+100000,
    full-row replacement, copy-on-write rewrites only the affected
    files) and INSERTS clones of the %7=4 class under offset ids —
    verifying the merged HEAD per source (row count + char sum) plus the
    commit's CHANGE DATA FEED (update pre/post pairs count as n_upd,
    inserts as n_ins).  Eager at construction like q156."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q179_") + "/tbl"
    try:
        D.write_delta(docs, work)
        upd = docs.filter(F.col("doc_id") % 7 == 2).select(
            "doc_id", "source", (F.col("n_chars") + 100000).alias("n_chars")
        )
        ins = docs.filter(F.col("doc_id") % 7 == 4).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            "source",
            (F.col("n_chars") + 7).alias("n_chars"),
        )
        v = D.merge_delta(spark, work, upd.unionByName(ins), on=["doc_id"])
        head = (
            D.read_delta(spark, work)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_head"),
                F.sum("n_chars").cast("long").alias("chars_head"),
            )
        )
        cdf = (
            D.read_delta_changes(spark, work, v - 1, cdf=True)
            .groupBy("source")
            .agg(
                (
                    F.count(
                        F.when(F.col("_change_type") == "update_postimage", 1)
                    )
                ).cast("long").alias("n_upd"),
                (
                    F.count(F.when(F.col("_change_type") == "insert", 1))
                ).cast("long").alias("n_ins"),
            )
        )
        return (
            head.join(cdf, "source", "left")
            .select(
                "source",
                "n_head",
                "chars_head",
                F.coalesce("n_upd", F.lit(0)).cast("long").alias("n_upd"),
                F.coalesce("n_ins", F.lit(0)).cast("long").alias("n_ins"),
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q180_iceberg_merge_upsert",
    oracle="""
SELECT source,
       CAST(COUNT(*) + COUNT(CASE WHEN doc_id % 7 = 4 THEN 1 END) AS BIGINT)
         AS n_head,
       CAST(SUM(n_chars)
            + 100000 * COUNT(CASE WHEN doc_id % 7 = 2 THEN 1 END)
            + SUM(CASE WHEN doc_id % 7 = 4 THEN n_chars + 7 ELSE 0 END)
         AS BIGINT) AS chars_head,
       CAST(COUNT(CASE WHEN doc_id % 7 = 2 THEN 1 END) AS BIGINT) AS n_cl_del,
       CAST(COUNT(CASE WHEN doc_id % 7 IN (2, 4) THEN 1 END) AS BIGINT)
         AS n_cl_ins
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q180(spark, sf_dir):
    """ICEBERG MERGE — the format's NATURAL upsert (r15 verdict item 6):
    the q179 scenario through merge_iceberg, which commits an
    equality-delete file of the source keys PLUS the new rows in ONE
    snapshot — the strictly-below sequence rule hides old versions while
    the same-snapshot appends stay visible, O(source) with zero target
    reads or rewrites (merge-on-read; contrast delta's copy-on-write).
    The changelog reads the merge as delete(old)+insert(new): matched
    %7=2 keys count in BOTH n_cl_del and n_cl_ins, fresh %7=4 clones in
    n_cl_ins only.  Eager at construction like q158."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q180_") + "/tbl"
    try:
        s1 = I.write_iceberg(docs, work)
        upd = docs.filter(F.col("doc_id") % 7 == 2).select(
            "doc_id", "source", (F.col("n_chars") + 100000).alias("n_chars")
        )
        ins = docs.filter(F.col("doc_id") % 7 == 4).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            "source",
            (F.col("n_chars") + 7).alias("n_chars"),
        )
        I.merge_iceberg(spark, work, upd.unionByName(ins), on=["doc_id"])
        head = (
            I.read_iceberg(spark, work)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_head"),
                F.sum("n_chars").cast("long").alias("chars_head"),
            )
        )
        cl = (
            I.read_iceberg_changes(spark, work, s1, cdf=True)
            .groupBy("source")
            .agg(
                (
                    F.count(F.when(F.col("_change_type") == "delete", 1))
                ).cast("long").alias("n_cl_del"),
                (
                    F.count(F.when(F.col("_change_type") == "insert", 1))
                ).cast("long").alias("n_cl_ins"),
            )
        )
        return (
            head.join(cl, "source", "left")
            .select(
                "source",
                "n_head",
                "chars_head",
                F.coalesce("n_cl_del", F.lit(0)).cast("long").alias("n_cl_del"),
                F.coalesce("n_cl_ins", F.lit(0)).cast("long").alias("n_cl_ins"),
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q181_delta_apply_changes",
    oracle="""
SELECT source,
       CAST(COUNT(CASE WHEN doc_id % 5 <> 2 THEN 1 END)
            + COUNT(CASE WHEN doc_id % 5 = 3 THEN 1 END) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN doc_id % 5 <> 2 THEN n_chars ELSE 0 END)
            + 555 * COUNT(CASE WHEN doc_id % 5 = 1 THEN 1 END)
            + SUM(CASE WHEN doc_id % 5 = 3 THEN n_chars + 3 ELSE 0 END)
         AS BIGINT) AS chars
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q181(spark, sf_dir):
    """APPLY CHANGES — the CDC capstone (r15 verdict missing item 1's
    'done' shape): one Delta table takes an UPDATE (%5 IN (1,2):
    n_chars+555), a DELETE (%5=2 — overlapping the update, so the NET
    effect per key is the delete), and an INSERT commit (%5=3 clones
    under offset ids); apply_changes_delta then consumes the change feed
    window and MERGEs the net effect into a SECOND table seeded at the
    v0 state.  The oracle recomputes the final target per source — hash
    equality proves the window reduction (latest commit per key wins,
    postimage over preimage) and both merges.  Eager at construction."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q181_")
    src_t, dst_t = f"{work}/src", f"{work}/dst"
    try:
        D.write_delta(docs, src_t)
        D.write_delta(docs, dst_t)
        D.update_delta(
            spark, src_t, "doc_id % 5 IN (1, 2)", {"n_chars": "n_chars + 555"}
        )
        D.delete_delta_rows(spark, src_t, "doc_id % 5 = 2")
        D.write_delta(
            docs.filter(F.col("doc_id") % 5 == 3).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                "source",
                (F.col("n_chars") + 3).alias("n_chars"),
            ),
            src_t,
        )
        D.apply_changes_delta(spark, src_t, dst_t, ["doc_id"], start_version=0)
        agg = (
            D.read_delta(spark, dst_t)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("n_chars").cast("long").alias("chars"),
            )
        )
        # base = every source in documents: the corpus assigns sources by
        # doc_id residue, so the %5=2 delete can erase WHOLE sources from
        # the target — the oracle still emits them with zeros (the q177
        # base-join convention)
        base = docs.select("source").distinct()
        return (
            base.join(agg, "source", "left")
            .select(
                "source",
                F.coalesce("n_rows", F.lit(0)).cast("long").alias("n_rows"),
                F.coalesce("chars", F.lit(0)).cast("long").alias("chars"),
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q184_iceberg_apply_changes",
    oracle="""
SELECT source,
       CAST(COUNT(CASE WHEN doc_id % 5 <> 2 THEN 1 END)
            + COUNT(CASE WHEN doc_id % 5 = 3 THEN 1 END) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN doc_id % 5 <> 2 THEN n_chars ELSE 0 END)
            + 555 * COUNT(CASE WHEN doc_id % 5 = 1 THEN 1 END)
            + SUM(CASE WHEN doc_id % 5 = 3 THEN n_chars + 3 ELSE 0 END)
         AS BIGINT) AS chars
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q184(spark, sf_dir):
    """ICEBERG APPLY CHANGES — q181's CDC capstone on the second format:
    the source table takes a MERGE (%5 IN (1,2): n_chars+555, committed
    as one eq-delete+append overwrite snapshot), an equality DELETE
    (%5=2 — overlapping the merge, so the net effect per key is the
    delete; sequence order decides, not snapshot-id luck), and an append
    (%5=3 clones); apply_changes_iceberg consumes the changelog window
    and lands the net effect in a second table via merge_iceberg +
    delete_iceberg_equality.  The oracle recomputes the final target —
    hash equality proves changelog assembly (merge read as
    delete+insert), the sequence-ordered window reduction, and both
    write paths.  Eager at construction."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q184_")
    src_t, dst_t = f"{work}/src", f"{work}/dst"
    try:
        s0 = I.write_iceberg(docs, src_t)
        I.write_iceberg(docs, dst_t)
        I.merge_iceberg(
            spark,
            src_t,
            docs.filter(F.col("doc_id") % 5 < 3)
            .filter(F.col("doc_id") % 5 >= 1)
            .select(
                "doc_id", "source", (F.col("n_chars") + 555).alias("n_chars")
            ),
            on=["doc_id"],
        )
        I.delete_iceberg_equality(
            spark,
            src_t,
            docs.filter(F.col("doc_id") % 5 == 2).select("doc_id"),
        )
        I.write_iceberg(
            docs.filter(F.col("doc_id") % 5 == 3).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                "source",
                (F.col("n_chars") + 3).alias("n_chars"),
            ),
            src_t,
        )
        I.apply_changes_iceberg(
            spark, src_t, dst_t, ["doc_id"], from_snapshot_id=s0
        )
        agg = (
            I.read_iceberg(spark, dst_t)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("n_chars").cast("long").alias("chars"),
            )
        )
        base = docs.select("source").distinct()
        return (
            base.join(agg, "source", "left")
            .select(
                "source",
                F.coalesce("n_rows", F.lit(0)).cast("long").alias("n_rows"),
                F.coalesce("chars", F.lit(0)).cast("long").alias("chars"),
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q185_stats_point_lookup",
    oracle="""
SELECT doc_id, source,
       CAST(n_chars AS BIGINT) AS chars_delta,
       CAST(n_chars AS BIGINT) AS chars_ice
FROM documents WHERE doc_id = 42
""",
)
def q185(spark, sf_dir):
    """STATS-PRUNED POINT LOOKUP on both formats (the r16 file-skipping
    surface): documents land in three RANGE-clustered commits per format
    (so per-file key ranges are disjoint), then ``where={"doc_id": ...}``
    — a DATA column, not a partition — resolves through the add actions'
    stats (Delta) / the manifests' lower/upper bounds (Iceberg): only
    the overlapping files enter the plan, and the equality row-filters
    exactly.  Output: the looked-up row with each format's char count.
    Eager at construction like q156."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D
    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    n = docs.count()
    work = tempfile.mkdtemp(prefix="gofeed_q185_")
    dt, it = f"{work}/delta", f"{work}/ice"
    try:
        cut1, cut2 = n // 3, 2 * n // 3
        for lo, hi in ((0, cut1), (cut1, cut2), (cut2, n + 1)):
            part = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            D.write_delta(part, dt)
            I.write_iceberg(part, it)
        d = D.read_delta(spark, dt, where={"doc_id": "42"}).select(
            "doc_id", "source", F.col("n_chars").cast("long").alias("chars_delta")
        )
        i = I.read_iceberg(spark, it, where={"doc_id": "42"}).select(
            "doc_id", "source", F.col("n_chars").cast("long").alias("chars_ice")
        )
        return d.join(i, ["doc_id", "source"]).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q186_cluster_rewrite",
    oracle="""
SELECT doc_id, source,
       CAST(n_chars AS BIGINT) AS chars_delta,
       CAST(n_chars AS BIGINT) AS chars_ice,
       CAST(1 AS BOOLEAN) AS pruned
FROM documents WHERE doc_id = 77
""",
)
def q186(spark, sf_dir):
    """SORT-ORDER CLUSTERING REWRITE on both formats (r16 verdict item
    2): documents accrete in three UNORDERED commits per format (each
    commit takes a doc_id residue class, so every file spans the full
    key range and stats pruning keeps everything), then
    ``optimize_delta(zorder_by=)`` / ``rewrite_iceberg(sort_by=)``
    re-cluster into >=4 range-disjoint files.  The post-rewrite point
    lookup resolves through the REWRITTEN stats/bounds, and the
    ``pruned`` column is the oracle-checked proof: it is TRUE only when
    the where= relation contains STRICTLY fewer files than the table on
    both formats — a vacuous rewrite (no re-clustering, or stats lost in
    the rewrite) hash-mismatches instead of passing silently.  Eager at
    construction like q185."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D
    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q186_")
    dt, it = f"{work}/delta", f"{work}/ice"
    try:
        # unordered accretion: residue classes interleave the key space
        for r in range(3):
            part = docs.filter(F.col("doc_id") % 3 == r)
            D.write_delta(part, dt)
            I.write_iceberg(part, it)
        size = sum(
            a.get("size", 0)
            for a in D._snapshot(D.get_filesystem(dt), dt).adds.values()
        )
        tfb = max(1, size // 4)  # >=4 clustered output files
        D.optimize_delta(spark, dt, target_file_bytes=tfb, zorder_by=["doc_id"])
        I.rewrite_iceberg(spark, it, target_file_bytes=tfb, sort_by=["doc_id"])
        d_all = D.read_delta(spark, dt)
        i_all = I.read_iceberg(spark, it)
        d_hit = D.read_delta(spark, dt, where={"doc_id": "77"})
        i_hit = I.read_iceberg(spark, it, where={"doc_id": "77"})
        pruned = bool(
            0 < len(d_hit.inputFiles()) < len(d_all.inputFiles())
            and 0 < len(i_hit.inputFiles()) < len(i_all.inputFiles())
        )
        d = d_hit.select(
            "doc_id", "source", F.col("n_chars").cast("long").alias("chars_delta")
        )
        i = i_hit.select(
            "doc_id", "source", F.col("n_chars").cast("long").alias("chars_ice")
        )
        return (
            d.join(i, ["doc_id", "source"])
            .withColumn("pruned", F.lit(pruned))
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q187_rest_catalog",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY source ORDER BY source
""",
)
def q187(spark, sf_dir):
    """REST CATALOG LIFECYCLE (r16 verdict missing item 1): a catalog
    server (directory-backed reference implementation of the public REST
    spec subset) arbitrates the table — create registers the metadata
    location, two appends go up as add-snapshot/set-snapshot-ref update
    sets guarded by assert-ref-snapshot-id, and the read resolves
    ``ns.documents`` through one load RPC (no version-hint I/O).  The
    final catalog-mediated read must equal the source table exactly.
    Eager at construction like q185/q186."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I
    from gofeed_spark.sources.icecatalog import (
        RestCatalog,
        RestCatalogServer,
        commit_iceberg_rest,
        create_iceberg_rest,
        read_iceberg_rest,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q187_")
    try:
        with RestCatalogServer(work) as srv:
            cat = RestCatalog(srv.uri)
            cat.create_namespace("ns")
            loc = f"{srv.warehouse}/ns/documents"
            part = lambda r: docs.filter(F.col("doc_id") % 3 == r)  # noqa: E731
            create_iceberg_rest(
                cat, "ns.documents", loc,
                lambda p: I.write_iceberg(part(0), p),
            )
            for r in (1, 2):
                commit_iceberg_rest(
                    cat, "ns.documents",
                    lambda p, r=r: I.write_iceberg(part(r), p),
                )
            return (
                read_iceberg_rest(spark, cat, "ns.documents")
                .groupBy("source")
                .agg(
                    F.count("*").alias("n_docs"),
                    F.sum("n_chars").cast("long").alias("chars"),
                )
                .localCheckpoint()
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q188_conditional_merge",
    oracle="""
SELECT doc_id, source,
       CAST(CASE WHEN doc_id % 2 = 0 THEN n_chars + 100 ELSE n_chars END
            AS BIGINT) AS chars_delta,
       CAST(CASE WHEN doc_id % 2 = 0 THEN n_chars + 100 ELSE n_chars END
            AS BIGINT) AS chars_ice
FROM documents ORDER BY doc_id
""",
)
def q188(spark, sf_dir):
    """CONDITIONAL + PARTIAL-COLUMN MERGE on both formats (r16 verdict
    missing item 4, the SQL MERGE surface a user ports): documents land
    as the target; the source proposes n_chars+100 for EVEN doc_ids and
    n_chars-100 for ODD ones, and the merge runs with
    ``when_matched=("update", "s.n_chars > t.n_chars")`` +
    ``set_cols=["n_chars"]`` — so the guard REJECTS every odd row (the
    matched-but-unchanged branch, non-vacuous at every SF by residue
    construction) and the partial SET proves the untouched ``source``
    column survives (the source frame never carries it).  Eager at
    construction like q185-q187."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D
    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    proposal = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.col("n_chars") + 100
        ).otherwise(F.col("n_chars") - 100).alias("n_chars"),
    )
    work = tempfile.mkdtemp(prefix="gofeed_q188_")
    dt, it = f"{work}/delta", f"{work}/ice"
    try:
        D.write_delta(docs, dt)
        I.write_iceberg(docs, it)
        D.merge_delta(
            spark, dt, proposal, ["doc_id"],
            when_matched=("update", "s.n_chars > t.n_chars"),
            when_not_matched=None, set_cols=["n_chars"],
        )
        I.merge_iceberg(
            spark, it, proposal, ["doc_id"],
            when_matched=("update", "s.n_chars > t.n_chars"),
            when_not_matched=None, set_cols=["n_chars"],
        )
        d = D.read_delta(spark, dt).select(
            "doc_id", "source", F.col("n_chars").cast("long").alias("chars_delta")
        )
        i = I.read_iceberg(spark, it).select(
            "doc_id", F.col("n_chars").cast("long").alias("chars_ice")
        )
        return d.join(i, ["doc_id"]).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q189_iceberg_v3_lineage",
    oracle="""
WITH ec AS (SELECT COUNT(*) AS n FROM documents WHERE doc_id % 2 = 0),
evens AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rid, 1 AS lseq
  FROM documents WHERE doc_id % 2 = 0
),
odds AS (
  SELECT d.doc_id, d.source,
         ec.n + ROW_NUMBER() OVER (ORDER BY d.doc_id) - 1 AS rid, 2 AS lseq
  FROM documents d, ec WHERE d.doc_id % 2 = 1
),
all_rows AS (
  SELECT * FROM evens UNION ALL SELECT * FROM odds
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_live,
       CAST(SUM(rid) AS BIGINT) AS rowid_sum,
       CAST(SUM(CASE WHEN lseq = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_first_batch
FROM all_rows
WHERE doc_id % 7 <> 0
GROUP BY source
ORDER BY source
""",
)
def q189(spark, sf_dir):
    """ICEBERG FORMAT-VERSION 3: row lineage + deletion vectors (spec
    §Row Lineage / §Deletion Vectors — VERDICT r16 missing item 5).  The
    corpus lands in two single-file appends on a v3 table (even doc_ids
    sorted, then odd), so every row's durable ``_row_id`` is a known
    function of the append order: the file's explicit ``first_row_id``
    (assigned from the table's ``next-row-id``) plus the row's position.
    ``delete_iceberg_rows`` then commits a Puffin DELETION VECTOR (one
    roaring bitmap per affected file, superseding rule enforced) hiding
    every ``doc_id % 7 = 0`` row without touching data files.  The
    lineage read exposes ``_row_id`` / ``_last_updated_sequence_number``;
    the oracle recomputes both id assignments with window functions and
    the per-source aggregate pins every surviving row id and each row's
    originating commit (lseq 1 = the even append, 2 = the odd).  Eager
    at construction like q167."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    work = tempfile.mkdtemp(prefix="gofeed_q189_") + "/tbl"
    try:
        for residue in (0, 1):
            I.write_iceberg(
                docs.filter(F.col("doc_id") % 2 == residue)
                .repartition(1)
                .sortWithinPartitions("doc_id"),
                work,
                format_version=3,
            )
        I.delete_iceberg_rows(spark, work, "doc_id % 7 = 0")
        return (
            I.read_iceberg(spark, work, row_lineage=True)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_live"),
                F.sum("_row_id").cast("long").alias("rowid_sum"),
                F.sum(
                    F.when(
                        F.col("_last_updated_sequence_number") == 1, 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_first_batch"),
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


from gofeed_spark.queries.registry import ORACLES as _ORACLES  # noqa: E402


@query(
    "q190_delta_row_tracking",
    # the SAME oracle as q189: Delta row tracking assigns ids by the
    # identical scheme (even append first, base advances by file rows),
    # and lseq 1 ≙ _row_commit_version 0 (the even-batch create commit)
    oracle=_ORACLES["q189_iceberg_v3_lineage"],
)
def q190(spark, sf_dir):
    """DELTA ROW TRACKING — the Iceberg-v3-lineage twin (protocol §Row
    Tracking): ``write_delta(row_tracking=True)`` assigns ``baseRowId``/
    ``defaultRowCommitVersion`` per added file and records the id
    high-water mark in the ``delta.rowTracking`` domain; the DV delete
    (``dv=True`` — REQUIRED on tracked tables, copy-on-write would
    rewrite positions) hides ``doc_id % 7 = 0`` rows while every
    surviving row keeps its durable ``_row_id``.  Same corpus layout and
    aggregate as q189, and literally the same oracle — the two formats'
    lineage surfaces are value-identical by construction, which is
    itself the interop claim.  Eager at construction."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D

    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    work = tempfile.mkdtemp(prefix="gofeed_q190_") + "/tbl"
    try:
        for residue in (0, 1):
            D.write_delta(
                docs.filter(F.col("doc_id") % 2 == residue)
                .repartition(1)
                .sortWithinPartitions("doc_id"),
                work,
                row_tracking=True,
            )
        D.delete_delta_rows(spark, work, "doc_id % 7 = 0", dv=True)
        return (
            D.read_delta(spark, work, row_lineage=True)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_live"),
                F.sum("_row_id").cast("long").alias("rowid_sum"),
                F.sum(
                    F.when(F.col("_row_commit_version") == 0, 1).otherwise(0)
                )
                .cast("long")
                .alias("n_first_batch"),
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q191_lineage_through_rewrites",
    oracle="""
WITH ec AS (SELECT COUNT(*) AS n FROM documents WHERE doc_id % 2 = 0),
evens AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rid
  FROM documents WHERE doc_id % 2 = 0
),
odds AS (
  SELECT d.doc_id, d.source, d.n_chars,
         ec.n + ROW_NUMBER() OVER (ORDER BY d.doc_id) - 1 AS rid
  FROM documents d, ec WHERE d.doc_id % 2 = 1
),
fin AS (
  SELECT doc_id, source, rid,
         CASE WHEN doc_id % 5 = 2 THEN n_chars + 1000 ELSE n_chars END AS nc,
         CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END AS upd
  FROM (SELECT * FROM evens UNION ALL SELECT * FROM odds)
  WHERE doc_id % 7 <> 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_live,
       CAST(SUM(rid) AS BIGINT) AS rowid_sum_delta,
       CAST(SUM(rid) AS BIGINT) AS rowid_sum_ice,
       CAST(SUM(upd) AS BIGINT) AS n_upd_delta,
       CAST(SUM(upd) AS BIGINT) AS n_upd_ice,
       CAST(SUM(nc) AS BIGINT) AS chars_live
FROM fin
GROUP BY source
ORDER BY source
""",
)
def q191(spark, sf_dir):
    """ROW LINEAGE THROUGH REWRITES, BOTH FORMATS (the r17 preservation
    machinery end to end): each format gets the corpus in two sorted
    single-file appends (Delta row-tracked / Iceberg v3), then a
    full-row MERGE updates every ``doc_id % 5 = 2`` row (+1000 chars),
    compaction rewrites the table (optimize_delta / rewrite_iceberg —
    both materialize preserved ids), and a deletion-vector DELETE hides
    ``doc_id % 7 = 0``.  After all four mutations every surviving row
    must still carry its ORIGINAL ``_row_id`` (the append-time
    assignment the oracle recomputes with window functions) and the
    updated rows must be stamped with the merge commit/sequence — the
    per-source aggregate pins id sums, update counts, and updated
    contents for BOTH formats against ONE truth, so cross-format
    equality of the lineage surfaces is itself what the hash check
    proves.  Eager at construction."""
    import shutil
    import tempfile

    from gofeed_spark.sources import delta as D
    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    upd = docs.filter(F.col("doc_id") % 5 == 2).withColumn(
        "n_chars", F.col("n_chars") + 1000
    )
    work = tempfile.mkdtemp(prefix="gofeed_q191_")
    dt, it = f"{work}/delta", f"{work}/ice"
    try:
        for residue in (0, 1):
            batch = (
                docs.filter(F.col("doc_id") % 2 == residue)
                .repartition(1)
                .sortWithinPartitions("doc_id")
            )
            D.write_delta(batch, dt, row_tracking=True)
            I.write_iceberg(batch, it, format_version=3)
        dmv = D.merge_delta(spark, dt, upd, ["doc_id"], when_not_matched=None)
        imv = I.merge_iceberg(spark, it, upd, ["doc_id"], when_not_matched=None)
        iseq = next(
            s["sequence-number"]
            for s in I._load_metadata(I.get_filesystem(it), it)[0]["snapshots"]
            if s["snapshot-id"] == imv
        )
        D.optimize_delta(spark, dt, min_files=2)
        I.rewrite_iceberg(spark, it, min_files=2)
        D.delete_delta_rows(spark, dt, "doc_id % 7 = 0", dv=True)
        I.delete_iceberg_rows(spark, it, "doc_id % 7 = 0")
        d = (
            D.read_delta(spark, dt, row_lineage=True)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_live"),
                F.sum("_row_id").cast("long").alias("rowid_sum_delta"),
                F.sum(
                    F.when(F.col("_row_commit_version") == dmv, 1).otherwise(0)
                ).cast("long").alias("n_upd_delta"),
                F.sum("n_chars").cast("long").alias("chars_live"),
            )
        )
        i = (
            I.read_iceberg(spark, it, row_lineage=True)
            .groupBy("source")
            .agg(
                F.sum("_row_id").cast("long").alias("rowid_sum_ice"),
                F.sum(
                    F.when(
                        F.col("_last_updated_sequence_number") == iseq, 1
                    ).otherwise(0)
                ).cast("long").alias("n_upd_ice"),
            )
        )
        return (
            d.join(i, "source")
            .select(
                "source", "n_live", "rowid_sum_delta", "rowid_sum_ice",
                "n_upd_delta", "n_upd_ice", "chars_live",
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q192_iceberg_wap_branch",
    oracle="""
SELECT source,
       CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_main_before,
       CAST(COUNT(*) AS BIGINT) AS n_branch_staged,
       CAST(COUNT(*) AS BIGINT) AS n_main_after,
       CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tag,
       CAST(SUM(n_chars) AS BIGINT) AS chars_after
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q192(spark, sf_dir):
    """WRITE-AUDIT-PUBLISH via SNAPSHOT REFERENCES (Iceberg spec
    §Snapshot References — branches and tags): the base corpus
    (``doc_id % 3 = 0``) lands on main and is TAGGED; the rest stages in
    two commits on an ``audit`` BRANCH (each parenting from the branch
    head, main's snapshot log untouched); main readers keep seeing ONLY
    the base until ``fast_forward_iceberg`` publishes the branch as one
    atomic metadata move.  The output pins all four visibility states —
    main before, branch staged, main after, and the tag (which still
    reads the pre-publish state AFTER publishing) — per source against
    the corpus arithmetic.  Eager at construction."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q192_") + "/tbl"
    try:
        I.write_iceberg(
            docs.filter(F.col("doc_id") % 3 == 0), work
        )
        I.set_iceberg_ref(work, "base", ref_type="tag")
        I.set_iceberg_ref(work, "audit", ref_type="branch")
        for residue in (1, 2):
            I.write_iceberg(
                docs.filter(F.col("doc_id") % 3 == residue),
                work,
                branch="audit",
            )

        def per_source(df, col):
            return df.groupBy("source").agg(
                F.count(F.lit(1)).cast("long").alias(col)
            )

        before = per_source(I.read_iceberg(spark, work), "n_main_before")
        staged = per_source(
            I.read_iceberg(spark, work, ref="audit"), "n_branch_staged"
        )
        I.fast_forward_iceberg(work, "main", "audit")
        after_df = I.read_iceberg(spark, work)
        after = after_df.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_main_after"),
            F.sum("n_chars").cast("long").alias("chars_after"),
        )
        tag = per_source(I.read_iceberg(spark, work, ref="base"), "n_tag")
        return (
            before.join(staged, "source")
            .join(after, "source")
            .join(tag, "source")
            .select(
                "source", "n_main_before", "n_branch_staged",
                "n_main_after", "n_tag", "chars_after",
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q193_iceberg_metadata_tables",
    oracle="""
SELECT source,
       CAST(2 AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(2 AS BIGINT) AS n_snapshots,
       CAST(2 AS BIGINT) AS n_manifests
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q193(spark, sf_dir):
    """METADATA TABLES (the ``SELECT * FROM tbl.files`` / ``.snapshots``
    / ``.partitions`` / ``.manifests`` surface every Iceberg engine
    exposes): a source-partitioned table lands in two appends (each
    repartitioned by the partition key, so exactly ONE file per source
    per commit — the file counts are corpus arithmetic), then the
    answer is assembled ENTIRELY from ``read_iceberg_meta`` — per-source
    file and row counts from ``partitions``, the snapshot count from
    ``snapshots``, the manifest count from ``manifests`` — with ZERO
    data-file reads (metadata stays metadata-sized at any table size).
    The oracle recomputes every number from the corpus.  Eager at
    construction."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    work = tempfile.mkdtemp(prefix="gofeed_q193_") + "/tbl"
    try:
        # split by BLOCK, not parity: source is doc_id % 20, so a parity
        # split would give each source to exactly one append and the
        # per-source file count would read 1, not 2
        for residue in (0, 1):
            I.write_iceberg(
                docs.filter(F.expr("(doc_id div 20) % 2") == residue)
                .repartition("source"),
                work,
                partition_by=["source"],
            )
        parts = (
            I.read_iceberg_meta(spark, work, "partitions")
            .select(
                F.get_json_object("partition", "$.source").alias("source"),
                F.col("file_count").alias("n_files"),
                F.col("record_count").alias("n_rows"),
            )
        )
        n_snaps = I.read_iceberg_meta(spark, work, "snapshots").count()
        n_mfs = I.read_iceberg_meta(spark, work, "manifests").count()
        return (
            parts.withColumn("n_snapshots", F.lit(n_snaps).cast("long"))
            .withColumn("n_manifests", F.lit(n_mfs).cast("long"))
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q194_partition_evolution",
    oracle="""
WITH l AS (SELECT COUNT(*) AS n FROM documents WHERE source = 'src7')
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(d.n_chars) AS BIGINT) AS chars_sum,
       CAST(l.n AS BIGINT) AS n_lookup,
       TRUE AS pruned
FROM documents d, l
GROUP BY d.source, l.n
ORDER BY d.source
""",
)
def q194(spark, sf_dir):
    """PARTITION SPEC EVOLUTION (Iceberg spec §Partition Evolution): the
    first half of the corpus lands UNPARTITIONED (one file), then the
    spec evolves to identity(source) and the second half lands
    partitioned — old manifests keep spec 0 by pointer, new ones stamp
    spec 1.  The full read proves NOTHING is lost across generations
    (identity values coalesce from data columns on old files, manifest
    partition records on new ones); the ``where={'source': 'src7'}``
    lookup proves pruning still works on the MIXED table — the old-spec
    file is kept conservatively (its value is unknown to the manifests)
    and row-filtered, while the new generation opens exactly one
    partition directory, so the lookup's file list is strictly smaller
    than the table's (the oracle-checked ``pruned`` boolean).  Eager at
    construction."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q194_") + "/tbl"
    try:
        I.write_iceberg(
            docs.filter(F.expr("(doc_id div 20) % 2 = 0")).repartition(1),
            work,
        )
        I.write_iceberg(
            docs.filter(F.expr("(doc_id div 20) % 2 = 1"))
            .repartition("source"),
            work,
            partition_by=["source"],
            evolve_partition=True,
        )
        full = I.read_iceberg(spark, work)
        lookup = I.read_iceberg(spark, work, where={"source": "src7"})
        n_lookup = lookup.count()
        pruned = len(lookup.inputFiles()) < len(full.inputFiles())
        return (
            full.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_total"),
                F.sum("n_chars").cast("long").alias("chars_sum"),
            )
            .withColumn("n_lookup", F.lit(n_lookup).cast("long"))
            .withColumn("pruned", F.lit(bool(pruned)))
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)


@query(
    "q195_iceberg_update",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % 6 = 3 THEN n_chars + 500
                     ELSE n_chars END) AS BIGINT) AS chars_after,
       CAST(SUM(CASE WHEN doc_id % 6 = 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_upd,
       CAST(SUM(n_chars) AS BIGINT) AS chars_before
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q195(spark, sf_dir):
    """MERGE-ON-READ UPDATE (the update_delta twin in Iceberg's idiom):
    ``update_iceberg`` commits ONE overwrite snapshot that hides every
    ``doc_id % 6 = 3`` row via position deletes and appends the updated
    versions (``n_chars + 500`` evaluated against the OLD row) — no
    untouched file is rewritten, O(matched) I/O.  The per-source
    aggregate pins the updated contents, the update count, and — via
    snapshot time travel below the update — the untouched pre-update
    chars, all against corpus arithmetic.  Eager at construction."""
    import shutil
    import tempfile

    from gofeed_spark.sources import iceberg as I

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    work = tempfile.mkdtemp(prefix="gofeed_q195_") + "/tbl"
    try:
        base = I.write_iceberg(docs, work, partition_by=["source"])
        I.update_iceberg(
            spark, work, "doc_id % 6 = 3", {"n_chars": "n_chars + 500"}
        )
        after = (
            I.read_iceberg(spark, work)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("chars_after"),
                F.sum(
                    F.when(F.col("doc_id") % 6 == 3, 1).otherwise(0)
                ).cast("long").alias("n_upd"),
            )
        )
        before = (
            I.read_iceberg(spark, work, snapshot_id=base)
            .groupBy("source")
            .agg(F.sum("n_chars").cast("long").alias("chars_before"))
        )
        return (
            after.join(before, "source")
            .select(
                "source", "n_docs", "chars_after", "n_upd", "chars_before",
            )
            .orderBy("source")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work.rsplit("/", 1)[0], ignore_errors=True)

"""Delta ROW TRACKING (sources/delta.py, protocol §Row Tracking — the
Iceberg v3 row-lineage twin): baseRowId/defaultRowCommitVersion
assignment on adds, the delta.rowTracking domainMetadata high-water
mark, _row_id/_row_commit_version lineage reads, DV-delete id
stability, checkpoint survival of the tracking state, the
enable_row_tracking backfill, and id PRESERVATION through every
rewriting op (OPTIMIZE/MERGE/UPDATE/copy-on-write DELETE write the
lineage view into the table's hidden materialized columns).  Plus the
read_delta_meta inspection surface.  Reference: delta.io PROTOCOL.md;
no counterpart in the reference repo (§2.E north-star surface)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gofeed_spark.fs import get_filesystem
from gofeed_spark.sources import delta as D


def _kv(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartition(1)
        .sortWithinPartitions("k")
    )


def _snap(root):
    return D._snapshot(get_filesystem(root), root)


def test_create_append_lineage(spark, tmp_path):
    root = str(tmp_path / "tbl")
    D.write_delta(_kv(spark, 0, 10), root, row_tracking=True)
    D.write_delta(_kv(spark, 10, 15), root)

    snap = _snap(root)
    assert snap.row_tracking and snap.row_hwm == 14
    proto = snap.protocol
    assert proto["minWriterVersion"] == 7
    assert {"rowTracking", "domainMetadata"} <= set(proto["writerFeatures"])
    assert proto["minReaderVersion"] == 1  # readers are unaffected
    assert all(
        a.get("baseRowId") is not None for a in snap.adds.values()
    )

    rows = (
        D.read_delta(spark, root, row_lineage=True).orderBy("k").collect()
    )
    assert [(r["k"], r["_row_id"]) for r in rows] == [(i, i) for i in range(15)]
    assert {r["_row_commit_version"] for r in rows[:10]} == {0}
    assert {r["_row_commit_version"] for r in rows[10:]} == {1}

    # overwrite keeps advancing: ids are never reused
    D.write_delta(_kv(spark, 0, 3), root, mode="overwrite")
    rows = (
        D.read_delta(spark, root, row_lineage=True).orderBy("k").collect()
    )
    assert [(r["k"], r["_row_id"]) for r in rows] == [(0, 15), (1, 16), (2, 17)]
    assert _snap(root).row_hwm == 17


def test_dv_delete_keeps_ids_and_checkpoint_survives(spark, tmp_path):
    root = str(tmp_path / "tbl")
    D.write_delta(_kv(spark, 0, 10), root, row_tracking=True)
    D.write_delta(_kv(spark, 10, 15), root)
    D.delete_delta_rows(spark, root, "k % 3 = 0", dv=True)

    want = {k: k for k in [1, 2, 4, 5, 7, 8, 10, 11, 13, 14]}
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    assert {r["k"]: r["_row_id"] for r in rows} == want

    # checkpoint must carry baseRowId + the domain high-water mark, or a
    # truncated log would silently re-id every row
    D.checkpoint_delta(root)
    fs = get_filesystem(root)
    # force checkpoint-only resolution: replay from the checkpoint alone
    snap = _snap(root)
    assert snap.row_hwm == 14 and snap.row_tracking
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    assert {r["k"]: r["_row_id"] for r in rows} == want
    # another append continues the sequence across the checkpoint
    D.write_delta(_kv(spark, 15, 17), root)
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    by_k = {r["k"]: r["_row_id"] for r in rows}
    assert by_k[15] == 15 and by_k[16] == 16
    assert fs  # silence linters


def test_enable_row_tracking_backfills(spark, tmp_path):
    root = str(tmp_path / "tbl")
    D.write_delta(_kv(spark, 0, 6), root)
    D.write_delta(_kv(spark, 6, 9), root)
    with pytest.raises(D.DeltaUnsupported, match="row-tracked|row lineage"):
        D.read_delta(spark, root, row_lineage=True)
    # appends cannot silently opt in on an untracked table
    with pytest.raises(D.DeltaUnsupported, match="enable_row_tracking"):
        D.write_delta(_kv(spark, 9, 10), root, row_tracking=True)

    v = D.enable_row_tracking(root)
    assert D.enable_row_tracking(root) == v  # idempotent
    rows = (
        D.read_delta(spark, root, row_lineage=True).orderBy("k").collect()
    )
    # existing rows get ids immediately (file order = sorted add paths)
    assert sorted(r["_row_id"] for r in rows) == list(range(9))
    assert {r["_row_commit_version"] for r in rows} == {v}

    # the backfill is invisible to incremental consumers
    ch = D.read_delta_changes(spark, root, start_version=v)
    assert ch.count() == 0

    # post-backfill appends continue from the mark
    D.write_delta(_kv(spark, 9, 12), root)
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    by_k = {r["k"]: r["_row_id"] for r in rows}
    assert [by_k[9], by_k[10], by_k[11]] == [9, 10, 11]


def test_update_and_cow_delete_preserve_ids(spark, tmp_path):
    """Copy-on-write UPDATE and DELETE on a row-tracked table preserve
    lineage through the materialized columns: updated rows keep their
    _row_id with _row_commit_version bumped; survivors of a delete keep
    BOTH.  (DV deletes remain available and id-stable too.)"""
    root = str(tmp_path / "tbl")
    D.write_delta(_kv(spark, 0, 6), root, row_tracking=True)
    uv = D.update_delta(spark, root, "k = 1", {"v": "v + 100"})
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    got = {r["k"]: (r["v"], r["_row_id"], r["_row_commit_version"]) for r in rows}
    assert got[1] == (102, 1, uv)
    assert got[2] == (4, 2, 0)  # untouched rows keep id AND version

    D.delete_delta_rows(spark, root, "k IN (0, 5)")  # copy-on-write form
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    by_k = {r["k"]: r["_row_id"] for r in rows}
    assert by_k == {1: 1, 2: 2, 3: 3, 4: 4}

    assert D.delete_delta_rows(spark, root, "k = 4", dv=True) > 0
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    assert {r["k"]: r["_row_id"] for r in rows} == {1: 1, 2: 2, 3: 3}

    with pytest.raises(D.DeltaUnsupported, match="column_mapping"):
        D.write_delta(
            _kv(spark, 0, 3), str(tmp_path / "cm"),
            row_tracking=True, column_mapping=True,
        )


def test_optimize_preserves_row_ids_via_materialized_columns(spark, tmp_path):
    """OPTIMIZE on a row-tracked table rewrites through the lineage view
    and writes preserved ids into the table's hidden MATERIALIZED
    columns (protocol §Row Tracking): every surviving row keeps its
    durable _row_id AND its original _row_commit_version, the packed
    file gets a fresh baseRowId range (the mark only advances), and
    later appends/DV deletes compose."""
    root = str(tmp_path / "tbl")
    D.write_delta(_kv(spark, 0, 10), root, row_tracking=True)
    D.write_delta(_kv(spark, 10, 15), root)
    D.delete_delta_rows(spark, root, "k % 3 = 0", dv=True)

    res = D.optimize_delta(spark, root, min_files=2)
    assert res["packed"] == 1 and res["rewritten"] == 2

    rows = D.read_delta(spark, root, row_lineage=True).collect()
    got = {r["k"]: (r["_row_id"], r["_row_commit_version"]) for r in rows}
    want = {
        k: (k, 0 if k < 10 else 1)
        for k in [1, 2, 4, 5, 7, 8, 10, 11, 13, 14]
    }
    assert got == want

    # packed file consumed fresh ids 15..24 (10 surviving rows)
    snap = _snap(root)
    assert snap.row_hwm == 24 and len(snap.adds) == 1
    add = next(iter(snap.adds.values()))
    assert add["baseRowId"] == 15

    # post-optimize append continues above the advanced mark; a DV
    # delete on the packed file keeps the materialized ids
    D.write_delta(_kv(spark, 15, 17), root)
    D.delete_delta_rows(spark, root, "k = 2", dv=True)
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    by_k = {r["k"]: r["_row_id"] for r in rows}
    assert 2 not in by_k and by_k[1] == 1 and by_k[15] == 25 and by_k[16] == 26

    # checkpoint keeps the materialized config + ids working
    D.checkpoint_delta(root)
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    assert {r["k"]: r["_row_id"] for r in rows} == by_k


def test_merge_preserves_row_ids(spark, tmp_path):
    """MERGE on a row-tracked table is the feature's whole point:
    UPDATED rows keep their durable _row_id (materialized into the
    rewritten files) with _row_commit_version bumped to the merge;
    carried (unmatched-in-file) rows keep BOTH; inserted rows take
    fresh ids from the new file's baseRowId."""
    root = str(tmp_path / "tbl")
    D.write_delta(_kv(spark, 0, 10), root, row_tracking=True)
    src = spark.createDataFrame(
        [(3, 999), (5, 555), (20, 20), (21, 21)], "k bigint, v bigint"
    )
    mv = D.merge_delta(spark, root, src, on=["k"])
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    got = {
        r["k"]: (r["v"], r["_row_id"], r["_row_commit_version"])
        for r in rows
    }
    for k in range(10):
        if k in (3, 5):
            continue
        assert got[k] == (2 * k, k, 0)  # carried: id AND version kept
    assert got[3] == (999, 3, mv) and got[5] == (555, 5, mv)  # id kept
    ins_ids = {got[20][1], got[21][1]}
    assert all(i > 9 for i in ins_ids) and len(ins_ids) == 2  # fresh
    assert _snap(root).row_hwm >= max(ins_ids)

    # delete-mode merge: survivors keep ids, CDF carries only deletes
    keys = spark.createDataFrame([(0,), (21,)], "k bigint")
    D.merge_delta(
        spark, root, keys, on=["k"],
        when_matched="delete", when_not_matched=None,
    )
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    by_k = {r["k"]: r["_row_id"] for r in rows}
    assert 0 not in by_k and 21 not in by_k and by_k[3] == 3
    ch = D.read_delta_changes(spark, root, start_version=mv, cdf=True)
    assert sorted(r["k"] for r in ch.collect()) == [0, 21]

    # conditional + partial merge composes with lineage
    prop = spark.createDataFrame([(1, 1000), (2, 1)], "k bigint, v bigint")
    D.merge_delta(
        spark, root, prop, on=["k"],
        when_matched=("update", "s.v > t.v"),
        when_not_matched=None, set_cols=["v"],
    )
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    got = {r["k"]: (r["v"], r["_row_id"]) for r in rows}
    assert got[1] == (1000, 1)  # updated, id kept
    assert got[2] == (4, 2)  # guarded out, untouched


def test_foreign_row_tracked_table_reads(spark, tmp_path):
    """A table written by a foreign writer with row tracking: files
    WITHOUT baseRowId (added before enablement, never backfilled) read
    NULL _row_id; the domain survives replay."""
    root = str(tmp_path / "tbl")
    D.write_delta(_kv(spark, 0, 4), root, row_tracking=True)
    fs = get_filesystem(root)
    # foreign append without row-tracking fields (a writer that predates
    # the feature would be refused by writerFeatures, but a BUGGY or
    # partial writer may leave gaps — reads must not invent ids)
    snap = _snap(root)
    rel, add = next(iter(snap.adds.items()))
    import shutil as _sh

    src = f"{root}/{rel}"
    _sh.copyfile(src, f"{root}/part-extra-foreign.snappy.parquet")
    naked = {
        "path": "part-extra-foreign.snappy.parquet",
        "partitionValues": {},
        "size": add["size"],
        "modificationTime": 0,
        "dataChange": True,
    }
    fs.put_bytes(
        f"{root}/_delta_log/{1:020d}.json",
        (json.dumps({"add": naked}) + "\n").encode(),
    )
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    with_id = [r for r in rows if r["_row_id"] is not None]
    without = [r for r in rows if r["_row_id"] is None]
    assert len(with_id) == 4 and len(without) == 4


def test_read_delta_meta(spark, tmp_path):
    """read_delta_meta (the read_iceberg_meta twin): history / files /
    partitions from the log alone — files carries DV cardinality and
    the row-tracking base ids."""
    root = str(tmp_path / "tbl")
    D.write_delta(
        _kv(spark, 0, 6).withColumn("p", (F.col("k") % 2).cast("string")),
        root, partition_by=["p"], row_tracking=True,
    )
    D.write_delta(
        _kv(spark, 6, 10).withColumn("p", (F.col("k") % 2).cast("string")),
        root,
    )
    D.delete_delta_rows(spark, root, "k = 1", dv=True)

    hist = D.read_delta_meta(spark, root, "history").collect()
    assert [r["operation"] for r in hist] == [
        "DELETE", "WRITE", "CREATE TABLE AS SELECT"
    ]

    files = D.read_delta_meta(spark, root, "files").collect()
    assert sum(r["record_count"] for r in files) == 10
    assert all(r["base_row_id"] is not None for r in files)
    assert sum(r["dv_cardinality"] or 0 for r in files) == 1

    parts = D.read_delta_meta(spark, root, "partitions").collect()
    assert len(parts) == 2
    assert {r["record_count"] for r in parts} == {5}
    assert all(r["file_count"] == 2 for r in parts)

    with pytest.raises(D.DeltaError, match="unknown metadata table"):
        D.read_delta_meta(spark, root, "nope")


def test_reenable_after_restore_never_reuses_ids(spark, tmp_path):
    """A RESTORE across the enablement boundary turns tracking off (the
    target's configuration comes back) while the delta.rowTracking
    domain's high-water mark survives the log — re-enabling must
    backfill ABOVE it: row ids are never reused, even across config
    flips."""
    root = str(tmp_path / "tbl")
    D.write_delta(_kv(spark, 0, 4), root)  # v0, untracked
    D.enable_row_tracking(root)  # v1: ids 0..3
    D.write_delta(_kv(spark, 4, 6), root)  # v2: ids 4, 5
    assert _snap(root).row_hwm == 5

    D.restore_delta(spark, root, 0)
    snap = _snap(root)
    assert not snap.row_tracking  # config restored to untracked
    assert snap.row_hwm == 5  # ... but the mark survives the log

    D.enable_row_tracking(root)
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    ids = sorted(r["_row_id"] for r in rows)
    assert ids == [6, 7, 8, 9]  # backfill starts above the old mark


def test_streaming_upsert_sink_preserves_ids(spark, tmp_path):
    """DeltaUpsertSink (the exactly-once streaming MERGE) composes with
    row tracking: upserted keys keep their durable _row_id across
    micro-batches, new keys take fresh ids, and re-delivered batches
    skip on the txn watermark without disturbing either."""
    from gofeed_spark.streaming.sinks import DeltaUpsertSink

    root = str(tmp_path / "tbl")
    D.write_delta(_kv(spark, 0, 6), root, row_tracking=True)  # ids 0..5

    sink = DeltaUpsertSink(root, on=["k"], app_id="app")
    b0 = spark.createDataFrame([(1, 111), (10, 100)], "k bigint, v bigint")
    sink(b0, 0)
    b1 = spark.createDataFrame([(1, 222), (11, 110)], "k bigint, v bigint")
    sink(b1, 1)
    sink(b1, 1)  # re-delivery: skipped on the txn watermark

    rows = D.read_delta(spark, root, row_lineage=True).collect()
    got = {r["k"]: (r["v"], r["_row_id"]) for r in rows}
    assert got[1] == (222, 1)  # upserted twice, durable id kept
    assert got[2] == (4, 2)  # untouched
    fresh = {got[10][1], got[11][1]}
    assert len(fresh) == 2 and all(i > 5 for i in fresh)
    assert D.last_txn_version(root, "app") == 1


def test_dv_update_preserves_ids(spark, tmp_path):
    """update_delta(dv=True) on a tracked table: matched rows keep their
    durable _row_id (materialized into the new files) with the commit
    version bumped; untouched rows keep both; repeat DV updates
    compose."""
    root = str(tmp_path / "tbl")
    D.write_delta(_kv(spark, 0, 6), root, row_tracking=True)
    uv = D.update_delta(spark, root, "k IN (1, 4)", {"v": "v * 10"}, dv=True)
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    got = {r["k"]: (r["v"], r["_row_id"], r["_row_commit_version"]) for r in rows}
    assert got[1] == (20, 1, uv) and got[4] == (80, 4, uv)
    assert got[0] == (0, 0, 0)
    D.update_delta(spark, root, "k = 1", {"v": "v + 1"}, dv=True)
    rows = D.read_delta(spark, root, row_lineage=True).collect()
    assert {r["k"]: r["_row_id"] for r in rows} == {i: i for i in range(6)}
    assert {r["v"] for r in rows if r["k"] == 1} == {21}

"""Iceberg FORMAT-VERSION 3 writer surface (sources/iceberg.py): row
lineage (spec §Row Lineage — explicit ``first_row_id`` assignment,
``next-row-id`` advance, ``_row_id``/``_last_updated_sequence_number``
read columns) and deletion vectors (spec §Deletion Vectors — Puffin
``deletion-vector-v1`` blobs, one live DV per data file, merge-and-
replace on re-delete), plus the v2→v3 upgrade rules and lineage
PRESERVATION through every rewriting op (rewrite/MERGE materialize
``_row_id`` into new files).  Reference behaviors: iceberg.apache.org/spec
(format-version 3); no counterpart exists in the reference repo (the
lakehouse surface is declared north-star scope, SURVEY.md §2.E)."""

from __future__ import annotations

import posixpath
from collections import Counter

import pytest
from pyspark.sql import functions as F

from gofeed_spark.fs import get_filesystem
from gofeed_spark.sources import iceberg as I
from gofeed_spark.sources import puffin as P


def _kv(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartition(1)
        .sortWithinPartitions("k")
    )


def _meta(root):
    return I._load_metadata(get_filesystem(root), root)[0]


def _live(root):
    fs = get_filesystem(root)
    meta = _meta(root)
    return I._live_entries(fs, I._snapshot_of(meta, None))


def test_v3_create_append_lineage(spark, tmp_path):
    root = str(tmp_path / "tbl")
    s1 = I.write_iceberg(_kv(spark, 0, 10), root, format_version=3)
    s2 = I.write_iceberg(_kv(spark, 10, 15), root)

    meta = _meta(root)
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 15
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    assert by_id[s1]["first-row-id"] == 0
    assert by_id[s2]["first-row-id"] == 10

    # every data file carries an EXPLICIT first_row_id
    entries, _dels = _live(root)
    assert all(e.get("_frid") is not None for e in entries)

    rows = (
        I.read_iceberg(spark, root, row_lineage=True).orderBy("k").collect()
    )
    assert [(r["k"], r["_row_id"]) for r in rows] == [(i, i) for i in range(15)]
    # _last_updated_sequence_number inherits the file's data seq
    assert {r["_last_updated_sequence_number"] for r in rows[:10]} == {1}
    assert {r["_last_updated_sequence_number"] for r in rows[10:]} == {2}

    # ids are never reused: an overwrite keeps advancing the assignment
    I.write_iceberg(_kv(spark, 0, 3), root, mode="overwrite")
    rows = (
        I.read_iceberg(spark, root, row_lineage=True).orderBy("k").collect()
    )
    assert [(r["k"], r["_row_id"]) for r in rows] == [(0, 15), (1, 16), (2, 17)]
    assert _meta(root)["next-row-id"] == 18


def test_v3_dv_delete_merge_and_supersede(spark, tmp_path):
    root = str(tmp_path / "tbl")
    I.write_iceberg(_kv(spark, 0, 10), root, format_version=3)
    s2 = I.write_iceberg(_kv(spark, 10, 15), root)

    d1 = I.delete_iceberg_rows(spark, root, "k % 3 = 0")
    assert d1 > 0
    left = sorted(r["k"] for r in I.read_iceberg(spark, root).collect())
    assert left == [1, 2, 4, 5, 7, 8, 10, 11, 13, 14]

    # second delete hits BOTH files again: each file's DV is merged and
    # the superseded one dropped — exactly one live DV per data file
    d2 = I.delete_iceberg_rows(spark, root, "k IN (1, 13)")
    assert d2 == d1 + 1
    entries, dels = _live(root)
    dvs = [d for d in dels if d.get("_dv")]
    per_file = Counter(
        posixpath.basename(d["referenced_data_file"]) for d in dvs
    )
    assert set(per_file.values()) == {1}
    assert not [d for d in dels if d.get("content") == 1 and not d.get("_dv")]
    # merged cardinality rides record_count (the broadcast-decision input)
    by_ref = {
        posixpath.basename(d["referenced_data_file"]): d for d in dvs
    }
    first_file = posixpath.basename(
        sorted(entries, key=lambda e: e["_seq"])[0]["file_path"]
    )
    assert by_ref[first_file]["record_count"] == 5  # {0,3,6,9} ∪ {1}

    # blob metadata carries the spec properties
    fs = get_filesystem(root)
    pf = fs.read_bytes(dvs[0]["file_path"])
    foot = P.read_footer(pf)
    props = {b["properties"]["referenced-data-file"] for b in foot["blobs"]}
    assert all(p.endswith(".parquet") for p in props)

    left = sorted(r["k"] for r in I.read_iceberg(spark, root).collect())
    assert left == [2, 4, 5, 7, 8, 10, 11, 14]
    # row ids are stable through deletes; time travel below still full
    rows = I.read_iceberg(spark, root, row_lineage=True).collect()
    assert {r["k"]: r["_row_id"] for r in rows} == {k: k for k in left}
    assert I.read_iceberg(spark, root, snapshot_id=s2).count() == 15

    # deleting nothing commits nothing
    assert I.delete_iceberg_rows(spark, root, "k = 999") == -1


def test_v3_dv_changelog_per_snapshot(spark, tmp_path):
    root = str(tmp_path / "tbl")
    I.write_iceberg(_kv(spark, 0, 10), root, format_version=3)
    s2 = I.write_iceberg(_kv(spark, 10, 15), root)
    d1 = I.delete_iceberg_rows(spark, root, "k % 3 = 0")
    d2 = I.delete_iceberg_rows(spark, root, "k = 1")
    ch = I.read_iceberg_changes(spark, root, from_snapshot_id=s2, cdf=True)
    got = sorted(
        (r["k"], r["_change_type"], r["_snapshot_id"]) for r in ch.collect()
    )
    # each DV snapshot reports ONLY its newly hidden rows even though the
    # merged DV physically carries the earlier positions too
    assert got == [
        (0, "delete", d1),
        (1, "delete", d2),
        (3, "delete", d1),
        (6, "delete", d1),
        (9, "delete", d1),
        (12, "delete", d1),
    ]


def test_v3_equality_delete(spark, tmp_path):
    root = str(tmp_path / "tbl")
    I.write_iceberg(_kv(spark, 0, 6), root, format_version=3)
    keys = spark.createDataFrame([(2,), (4,)], "k bigint")
    assert I.delete_iceberg_equality(spark, root, keys) > 0
    assert sorted(r["k"] for r in I.read_iceberg(spark, root).collect()) == [
        0, 1, 3, 5,
    ]
    # manifests are stamped with the table's format version
    fs = get_filesystem(root)
    meta = _meta(root)
    _s, _m, mfs = I._read_avro(fs, I._snapshot_of(meta, None)["manifest-list"])
    del_mf = next(mf for mf in mfs if mf.get("content") == 1)
    import json as _json

    from gofeed_spark.sources.avrocodec import read_container

    _sch, hdr, _recs = read_container(fs.read_bytes(del_mf["manifest_path"]))
    assert hdr["format-version"] == b"3"
    assert _json.loads(hdr["schema"].decode())  # embedded table schema


def test_upgrade_2_to_3(spark, tmp_path):
    root = str(tmp_path / "tbl")
    I.write_iceberg(_kv(spark, 0, 10), root)
    I.upgrade_iceberg_format(root)
    meta = _meta(root)
    assert meta["format-version"] == 3 and meta["next-row-id"] == 0
    I.upgrade_iceberg_format(root)  # idempotent no-op

    # pre-upgrade files carry NO lineage (NULL _row_id forever);
    # post-upgrade commits assign it
    I.write_iceberg(_kv(spark, 10, 13), root)
    rows = (
        I.read_iceberg(spark, root, row_lineage=True).orderBy("k").collect()
    )
    assert [r["_row_id"] for r in rows[:10]] == [None] * 10
    assert [r["_row_id"] for r in rows[10:]] == [0, 1, 2]

    # DV deletes work on the upgraded table, including pre-lineage files
    I.delete_iceberg_rows(spark, root, "k IN (0, 11)")
    assert sorted(r["k"] for r in I.read_iceberg(spark, root).collect()) == [
        1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12,
    ]


def test_upgrade_refuses_live_parquet_position_deletes(spark, tmp_path):
    root = str(tmp_path / "tbl")
    I.write_iceberg(_kv(spark, 0, 6), root)
    I.delete_iceberg_rows(spark, root, "k = 0")
    with pytest.raises(I.IcebergUnsupported, match="position-delete"):
        I.upgrade_iceberg_format(root)


def test_v3_guards(spark, tmp_path):
    root = str(tmp_path / "tbl")
    I.write_iceberg(_kv(spark, 0, 6), root, format_version=3)

    # explicit version mismatch on an existing table refuses loudly
    with pytest.raises(I.IcebergError, match="format-version 3"):
        I.write_iceberg(_kv(spark, 6, 9), root, format_version=2)
    with pytest.raises(I.IcebergUnsupported, match="2 or 3"):
        I.write_iceberg(_kv(spark, 6, 9), root, format_version=4)


    # row_lineage read on a v2 table refuses
    v2 = str(tmp_path / "v2")
    I.write_iceberg(_kv(spark, 0, 3), v2)
    with pytest.raises(I.IcebergUnsupported, match="format-version 3"):
        I.read_iceberg(spark, v2, row_lineage=True)


def test_v3_inheritance_read(spark, tmp_path):
    """A foreign v3 writer may leave data-file ``first_row_id`` NULL and
    let readers inherit from the manifest-list row (spec inheritance):
    null-id ADDED files consume ids sequentially from the manifest's
    ``first_row_id``."""
    root = str(tmp_path / "tbl")
    I.write_iceberg(_kv(spark, 0, 10), root, format_version=3)
    fs = get_filesystem(root)
    meta = _meta(root)
    snap = I._snapshot_of(meta, None)

    import json as _json

    from gofeed_spark.sources.avrocodec import read_container, write_container

    # strip the explicit per-file ids, keep the list row's base
    _sch, hdr, mfs = read_container(fs.read_bytes(snap["manifest-list"]))
    assert mfs[0]["first_row_id"] == 0
    sch_e, hdr_e, entries = read_container(
        fs.read_bytes(mfs[0]["manifest_path"])
    )
    for e in entries:
        e["data_file"]["first_row_id"] = None
    fs.put_bytes(
        mfs[0]["manifest_path"],
        write_container(
            _json.dumps(sch_e),
            entries,
            meta={k: v for k, v in hdr_e.items() if not k.startswith("avro.")},
        ),
    )
    rows = (
        I.read_iceberg(spark, root, row_lineage=True).orderBy("k").collect()
    )
    assert [(r["k"], r["_row_id"]) for r in rows] == [(i, i) for i in range(10)]


def test_v3_merge_preserves_row_ids(spark, tmp_path):
    """MERGE on a v3 table preserves row lineage: updated rows carry
    their OLD _row_id materialized into the merge data files (with
    _last_updated_sequence_number falling back to the merge's sequence
    number), inserts take fresh ids from the file's first_row_id, and
    untouched rows keep id AND seq.  The blind mode pays one
    bounds-pruned key+id scan for this — zero-scan is a v2-only
    property."""
    root = str(tmp_path / "tbl")
    I.write_iceberg(_kv(spark, 0, 10), root, format_version=3)
    src = spark.createDataFrame(
        [(3, 999), (5, 555), (20, 20), (21, 21)], "k bigint, v bigint"
    )
    mv = I.merge_iceberg(spark, root, src, on=["k"])
    seq_of = {s["snapshot-id"]: s["sequence-number"] for s in _meta(root)["snapshots"]}
    rows = I.read_iceberg(spark, root, row_lineage=True).collect()
    got = {
        r["k"]: (r["v"], r["_row_id"], r["_last_updated_sequence_number"])
        for r in rows
    }
    for k in range(10):
        if k in (3, 5):
            continue
        assert got[k] == (2 * k, k, 1)  # untouched: id AND seq kept
    assert got[3] == (999, 3, seq_of[mv])
    assert got[5] == (555, 5, seq_of[mv])
    ins_ids = {got[20][1], got[21][1]}
    assert len(ins_ids) == 2 and all(i >= 10 for i in ins_ids)
    assert _meta(root)["next-row-id"] > max(ins_ids)

    # conditional + partial merge composes with lineage
    prop = spark.createDataFrame([(1, 1000), (2, 1)], "k bigint, v bigint")
    I.merge_iceberg(
        spark, root, prop, on=["k"],
        when_matched=("update", "s.v > t.v"),
        when_not_matched=None, set_cols=["v"],
    )
    rows = I.read_iceberg(spark, root, row_lineage=True).collect()
    got = {r["k"]: (r["v"], r["_row_id"]) for r in rows}
    assert got[1] == (1000, 1)  # updated, id kept
    assert got[2] == (4, 2)  # guarded out, untouched

    # delete+insert: survivors keep ids, the insert is fresh
    d = spark.createDataFrame([(0, 0), (30, 30)], "k bigint, v bigint")
    I.merge_iceberg(spark, root, d, on=["k"], when_matched="delete")
    rows = I.read_iceberg(spark, root, row_lineage=True).collect()
    by_k = {r["k"]: r["_row_id"] for r in rows}
    assert 0 not in by_k and by_k[3] == 3 and by_k[30] >= 10


def test_v3_rewrite_materializes_lineage(spark, tmp_path):
    """Compaction on a v3 table preserves row lineage by MATERIALIZING
    _row_id / _last_updated_sequence_number into the packed files (spec
    §Row Lineage: rewrites must not re-id rows).  Packed files carry
    NULL first_row_id — a fresh base would invent ids for pre-lineage
    rows — so next-row-id is unchanged and later appends continue the
    sequence exactly."""
    root = str(tmp_path / "tbl")
    I.write_iceberg(_kv(spark, 0, 10), root, format_version=3)
    I.write_iceberg(_kv(spark, 10, 15), root)
    I.delete_iceberg_rows(spark, root, "k % 3 = 0")

    res = I.rewrite_iceberg(spark, root, min_files=2)
    assert res["packed"] == 1 and res["rewritten"] == 2

    rows = I.read_iceberg(spark, root, row_lineage=True).collect()
    got = {
        r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in rows
    }
    assert got == {
        k: (k, 1 if k < 10 else 2)
        for k in [1, 2, 4, 5, 7, 8, 10, 11, 13, 14]
    }
    assert _meta(root)["next-row-id"] == 15  # no ids consumed

    entries, dels = _live(root)
    assert len(entries) == 1 and entries[0].get("_frid") is None
    assert not dels  # DVs died with the rewritten files' compaction

    # appends continue the id sequence; DV deletes hit the packed file
    I.write_iceberg(_kv(spark, 15, 17), root)
    I.delete_iceberg_rows(spark, root, "k = 2")
    rows = I.read_iceberg(spark, root, row_lineage=True).collect()
    by_k = {r["k"]: r["_row_id"] for r in rows}
    assert 2 not in by_k and by_k[1] == 1 and by_k[15] == 15 and by_k[16] == 16

    # an UPGRADED table's pre-lineage rows stay NULL through a sorted
    # rewrite (the resurrection hazard the null base exists to prevent)
    w2 = str(tmp_path / "up")
    I.write_iceberg(_kv(spark, 0, 6), w2)
    I.upgrade_iceberg_format(w2)
    I.write_iceberg(_kv(spark, 6, 9), w2)
    I.rewrite_iceberg(spark, w2, min_files=2, sort_by=["k"])
    rows = I.read_iceberg(spark, w2, row_lineage=True).orderBy("k").collect()
    assert [r["_row_id"] for r in rows] == [None] * 6 + [0, 1, 2]


def test_v3_through_rest_catalog(spark, tmp_path):
    """v3 commits through the REST catalog ship ``upgrade-format-version``
    / ``set-next-row-id`` updates — the id high-water mark must advance
    server-side or a later append would re-assign the same row ids."""
    from gofeed_spark.sources.icecatalog import (
        RestCatalog,
        RestCatalogServer,
        commit_iceberg_rest,
        create_iceberg_rest,
        read_iceberg_rest,
    )

    with RestCatalogServer(str(tmp_path / "wh")) as server:
        cat = RestCatalog(server.uri)
        cat.create_namespace("ns")
        loc = f"{server.warehouse}/ns/t1"
        create_iceberg_rest(
            cat, "ns.t1", loc,
            lambda p: I.write_iceberg(_kv(spark, 0, 5), p, format_version=3),
        )
        t = commit_iceberg_rest(
            cat, "ns.t1", lambda p: I.write_iceberg(_kv(spark, 5, 8), p)
        )
        meta = t["metadata"]
        assert meta["format-version"] == 3
        assert meta["next-row-id"] == 8
        rows = (
            read_iceberg_rest(spark, cat, "ns.t1", row_lineage=True)
            .orderBy("k")
            .collect()
        )
        assert [r["_row_id"] for r in rows] == list(range(8))
        # DV delete arbitrated by the catalog too
        commit_iceberg_rest(
            cat, "ns.t1",
            lambda p: I.delete_iceberg_rows(spark, p, "k IN (2, 6)"),
        )
        got = sorted(
            r["k"] for r in read_iceberg_rest(spark, cat, "ns.t1").collect()
        )
        assert got == [0, 1, 3, 4, 5, 7]


def test_v3_reserved_column_names_refused(spark, tmp_path):
    bad = spark.createDataFrame([(1, 2)], "k bigint, _row_id bigint")
    with pytest.raises(I.IcebergError, match="reserved lineage"):
        I.write_iceberg(bad, str(tmp_path / "t"), format_version=3)
    # fine on v2 (no lineage machinery touches the name)
    I.write_iceberg(bad, str(tmp_path / "t2"))
    assert I.read_iceberg(spark, str(tmp_path / "t2")).count() == 1


def test_v3_update_preserves_ids(spark, tmp_path):
    """UPDATE on v3: DV leg + data leg in one snapshot, updated rows
    keep their durable _row_id (materialized) with the last-updated
    sequence bumped; repeat updates supersede cleanly."""
    root = str(tmp_path / "tbl")
    I.write_iceberg(_kv(spark, 0, 6), root, format_version=3)
    u1 = I.update_iceberg(spark, root, "k IN (1, 4)", {"v": "v * 10"})
    seq_of = {
        s["snapshot-id"]: s["sequence-number"] for s in _meta(root)["snapshots"]
    }
    rows = I.read_iceberg(spark, root, row_lineage=True).collect()
    got = {
        r["k"]: (r["v"], r["_row_id"], r["_last_updated_sequence_number"])
        for r in rows
    }
    assert got[1] == (20, 1, seq_of[u1]) and got[4] == (80, 4, seq_of[u1])
    assert got[0] == (0, 0, 1)  # untouched: id AND seq kept

    # a second update hits a row living in the previous update's file
    I.update_iceberg(spark, root, "k = 1", {"v": "v + 1"})
    rows = I.read_iceberg(spark, root, row_lineage=True).collect()
    got = {r["k"]: (r["v"], r["_row_id"]) for r in rows}
    assert got[1] == (21, 1) and got[4] == (80, 4)
    entries, dels = _live(root)
    from collections import Counter as _C

    per_file = _C(
        posixpath.basename(d["referenced_data_file"])
        for d in dels
        if d.get("_dv")
    )
    assert set(per_file.values()) == {1}  # one live DV per file

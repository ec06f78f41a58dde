"""Filesystem-seam tests: the artifact lifecycle (index metas, pointer
flips, staging reclamation, WARC archives) must run entirely through
``gofeed_spark.fs`` — proven by running it against a fake REMOTE scheme
(``fakefs://``) whose logical paths do not exist on the local filesystem,
so any residual raw ``os.*`` / ``open()`` on an index/archive path fails
loudly (FileNotFoundError) instead of passing by accident.

The fake backend is ``DirObjectStoreFileSystem``: object-store semantics
enforced (whole-object PUT only, virtual directories, NO rename) over a
local backing directory that Spark's data plane reads via ``spark_path``
— the same split a real S3/GCS deployment has (SDK for artifacts, s3a://
for parquet)."""

from __future__ import annotations

import json
import os

import pytest

from gofeed_spark.fs import (
    DirObjectStoreFileSystem,
    FsUnsupported,
    LocalFileSystem,
    get_filesystem,
    register_filesystem,
    unregister_filesystem,
)

from tests.conftest import rows


@pytest.fixture()
def fakefs(tmp_path):
    fs = DirObjectStoreFileSystem("fakefs", str(tmp_path / "backing"))
    register_filesystem("fakefs", fs)
    yield fs
    unregister_filesystem("fakefs")


# --- backend semantics -------------------------------------------------------


def test_local_fs_roundtrip_and_atomic_put(tmp_path):
    fs = LocalFileSystem()
    p = str(tmp_path / "a" / "b.json")
    fs.put_bytes(p, b'{"x": 1}')
    assert fs.read_bytes(p) == b'{"x": 1}'
    assert not os.path.exists(p + ".tmp")  # temp cleaned by the replace
    assert fs.stat(p)[0] == len(b'{"x": 1}')
    assert fs.listdir(str(tmp_path)) == ["a"]
    assert fs.listdir(str(tmp_path / "missing")) == []
    fs.rename(p, str(tmp_path / "a" / "c.json"))
    assert fs.supports_rename()
    fs.delete_tree(str(tmp_path / "a"))
    assert not fs.exists(str(tmp_path / "a"))


def test_object_store_semantics(fakefs):
    fs = fakefs
    fs.put_bytes("fakefs://bucket/idx/_meta.json", b"{}")
    fs.put_bytes("fakefs://bucket/idx/sigs/part-0.parquet", b"pq" * 100)
    fs.put_bytes("fakefs://bucket/idx/sigs/part-1.parquet", b"pq" * 50)
    # virtual directories: exists/isdir/listdir from prefix listings
    assert fs.isdir("fakefs://bucket/idx")
    assert fs.isdir("fakefs://bucket/idx/sigs")
    assert not fs.isdir("fakefs://bucket/idx/_meta.json")
    assert fs.exists("fakefs://bucket/idx/_meta.json")
    assert fs.listdir("fakefs://bucket/idx") == ["_meta.json", "sigs"]
    # object stats + parquet tree stats
    assert fs.stat("fakefs://bucket/idx/_meta.json") == fs.stat(
        "fakefs://bucket/idx/_meta.json"
    )
    n, nbytes = fs.tree_stats("fakefs://bucket/idx")
    assert (n, nbytes) == (2, 300)
    # rename is a hard error — the pointer-flip publish exists because of this
    with pytest.raises(FsUnsupported):
        fs.rename("fakefs://bucket/idx/sigs", "fakefs://bucket/idx/sigs2")
    assert not fs.supports_rename()
    fs.delete_tree("fakefs://bucket/idx/sigs")
    assert not fs.isdir("fakefs://bucket/idx/sigs")
    assert fs.listdir("fakefs://bucket/idx") == ["_meta.json"]
    # the LOGICAL path never exists locally: raw os.* access would fail
    assert not os.path.exists("fakefs://bucket/idx/_meta.json")


def test_scheme_resolution(fakefs):
    assert isinstance(get_filesystem("/tmp/x"), LocalFileSystem)
    assert isinstance(get_filesystem("file:/tmp/x"), LocalFileSystem)
    assert get_filesystem("fakefs://b/k") is fakefs
    with pytest.raises(ValueError, match="no filesystem registered"):
        get_filesystem("s3missing://b/k")


# --- MinHash index lifecycle on the fake remote ------------------------------

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "the quick brown fox jumps over the lazy dog tonight"),
    (3, "an entirely different document about spark shuffle partitions"),
    (4, "yet another unrelated text concerning parquet row groups"),
]


def test_minhash_index_lifecycle_on_object_store(spark, fakefs):
    """build → probe → append → probe → compact → probe, all at a
    fakefs:// path: every meta read/write, dir listing, and reclamation
    goes through the seam (a single surviving os.* call on the logical
    path would raise), while parquet relations land in the backing store
    via spark_path."""
    from gofeed_spark.operators.dedup import (
        append_minhash_index,
        build_minhash_index,
        compact_minhash_index,
        probe_minhash_index,
        recover_minhash_index,
    )

    path = "fakefs://bucket/minhash_idx"
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_minhash_index(docs, path, df_cap=None)
    probe = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    got = rows(probe_minhash_index(spark, path, probe, threshold=1.0),
               "new_id", "dup_of")
    assert got == {(100, 1)}
    append_minhash_index(
        spark, path,
        spark.createDataFrame(
            [(200, "freshly appended corpus material rides the same lifecycle")],
            "doc_id long, text string",
        ),
    )
    probe2 = spark.createDataFrame(
        [(300, "freshly appended corpus material rides the same lifecycle")],
        "doc_id long, text string",
    )
    got2 = rows(probe_minhash_index(spark, path, probe2, threshold=1.0),
                "new_id", "dup_of")
    assert got2 == {(300, 200)}
    stats = compact_minhash_index(spark, path)
    assert set(stats) == {"sigs", "bands", "fps"}
    # pointer flip published: meta names version dirs, old dirs reclaimed
    meta = json.loads(fakefs.read_bytes(f"{path}/_index_meta.json"))
    assert meta["rels"]["sigs"] == "sigs_v0001"
    assert not fakefs.isdir(f"{path}/sigs")
    assert rows(probe_minhash_index(spark, path, probe, threshold=1.0),
                "new_id", "dup_of") == {(100, 1)}
    # recovery reclaims an unreferenced (crashed) version dir objectwise
    fakefs.put_bytes(f"{path}/sigs_v0099/part-0.parquet", b"junk")
    assert recover_minhash_index(path) is True
    assert not fakefs.isdir(f"{path}/sigs_v0099")


def test_staging_marker_protects_live_compaction(spark, fakefs, tmp_path):
    """A FRESH _staging.json marker (a live compactor's) protects its
    named dirs from entry-point reclamation; a STALE one is a crashed
    compaction and reclaims normally — the race ADVICE r10 flagged."""
    from gofeed_spark.operators.dedup import (
        build_minhash_index,
        recover_minhash_index,
    )

    path = "fakefs://bucket/race_idx"
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_minhash_index(docs, path, df_cap=None)
    # simulate a live compactor: marker down, staging dir being written
    fakefs.put_bytes(
        f"{path}/_staging.json", json.dumps({"dirs": ["sigs_v0001"]}).encode()
    )
    fakefs.put_bytes(f"{path}/sigs_v0001/part-0.parquet", b"inprogress")
    recover_minhash_index(path)  # a concurrent probe's entry recovery
    assert fakefs.isdir(f"{path}/sigs_v0001"), "live staging dir was reclaimed"
    assert fakefs.stat(f"{path}/_staging.json") is not None
    # now the marker goes stale (crashed compactor): TTL 0 ⇒ reclaim
    assert recover_minhash_index(path, staging_ttl_sec=0.0) is True
    assert not fakefs.isdir(f"{path}/sigs_v0001")
    assert fakefs.stat(f"{path}/_staging.json") is None


def test_compaction_lease_renewed_and_publish_verified(spark, tmp_path):
    """The _staging.json marker is a LEASE: renewed before each relation
    rewrite (so a long compaction stays protected past one TTL), and
    re-read before the meta flip — if a recovery reclaimed it mid-run,
    the publish ABORTS with the old relations still live instead of
    pointing the meta at deleted dirs (ADVICE r11, medium)."""
    from gofeed_spark.fs import register_filesystem, unregister_filesystem
    from gofeed_spark.operators.dedup import (
        build_minhash_index,
        compact_minhash_index,
        probe_minhash_index,
    )

    class LossyFS(DirObjectStoreFileSystem):
        """Drops the staging marker after ``drop_after`` marker PUTs —
        simulating a concurrent recovery reclaiming an expired lease
        while the compactor is mid-rewrite."""

        drop_after = None
        marker_puts = 0

        def put_bytes(self, path, data):
            if path.endswith("_staging.json"):
                type(self).marker_puts += 1
                if (
                    self.drop_after is not None
                    and type(self).marker_puts > self.drop_after
                ):
                    return  # swallowed: marker looks reclaimed from here on
            super().put_bytes(path, data)

        def read_bytes(self, path):
            if (
                path.endswith("_staging.json")
                and self.drop_after is not None
                and type(self).marker_puts > self.drop_after
            ):
                raise FileNotFoundError(path)
            return super().read_bytes(path)

    fs = LossyFS("lossyfs", str(tmp_path / "backing"))
    register_filesystem("lossyfs", fs)
    try:
        path = "lossyfs://bucket/lease_idx"
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        build_minhash_index(docs, path, df_cap=None)
        meta_before = json.loads(fs.read_bytes(f"{path}/_index_meta.json"))
        # healthy run: initial PUT + one renewal per relation (3) = 4
        compact_minhash_index(spark, path)
        assert LossyFS.marker_puts >= 4, "lease was not renewed per relation"
        # reclaimed-lease run: marker vanishes after the initial PUT
        LossyFS.marker_puts, LossyFS.drop_after = 0, 1
        meta_live = json.loads(fs.read_bytes(f"{path}/_index_meta.json"))
        with pytest.raises(RuntimeError, match="lease.*reclaimed"):
            compact_minhash_index(spark, path)
        meta_after = json.loads(fs.read_bytes(f"{path}/_index_meta.json"))
        assert meta_after["rels"] == meta_live["rels"], "meta flipped on abort"
        # the index still probes correctly through the surviving rels
        LossyFS.drop_after = None
        probe = spark.createDataFrame([DOCS[0]], "doc_id long, text string")
        assert probe_minhash_index(spark, path, probe, threshold=0.5).count() >= 1
        assert meta_before is not None
    finally:
        unregister_filesystem("lossyfs")


def test_staging_staleness_uses_store_clock(tmp_path):
    """Marker freshness is judged in the STORE's clock: a backend whose
    stat timestamps run behind the driver's clock must not make a live
    lease look expired (ADVICE r11, low).  Skew is observed via a probe
    PUT and subtracted from the naive age."""
    import time

    from gofeed_spark.fs import register_filesystem, unregister_filesystem
    from gofeed_spark.operators.dedup import _staging_protected

    SKEW_NS = int(3600 * 1e9)  # store clock 1h behind the driver

    class SkewFS(DirObjectStoreFileSystem):
        def stat(self, path):
            st = super().stat(path)
            return None if st is None else (st[0], st[1] - SKEW_NS)

    fs = SkewFS("skewfs", str(tmp_path / "backing"))
    register_filesystem("skewfs", fs)
    try:
        marker = "skewfs://bucket/idx/_staging.json"
        fs.put_bytes(marker, json.dumps({"dirs": ["sigs_v0001"]}).encode())
        # naive age ≈ 1h > ttl 60s, but the probe reveals the skew
        protected, stale = _staging_protected(
            fs, "skewfs://bucket/idx", marker, staging_ttl_sec=60.0
        )
        assert not stale and protected == {"sigs_v0001"}
        # a genuinely stale marker is still reclaimed under the same skew
        real_mtime = time.time_ns() - int(120 * 1e9)

        class OldMarkerFS(SkewFS):
            def stat(self, path):
                st = super().stat(path)
                if st is not None and path.endswith("_staging.json"):
                    return (st[0], real_mtime - SKEW_NS)
                return st

        fs2 = OldMarkerFS("skewfs", str(tmp_path / "backing"))
        register_filesystem("skewfs", fs2)
        protected, stale = _staging_protected(
            fs2, "skewfs://bucket/idx", marker, staging_ttl_sec=60.0
        )
        assert stale and protected == set()
    finally:
        unregister_filesystem("skewfs")


def test_compact_on_object_store_with_kill_windows(spark, fakefs):
    """io.compact on a rename-less backend publishes by marker +
    copy-publish (the dead-letter maintenance path through the fs seam):
    partitioned layout preserved, and every crash window in the publish
    redoes or rolls back cleanly via recover_compact."""
    from gofeed_spark.sources.io import compact, recover_compact

    fs = fakefs
    path = "fakefs://bucket/dead/writer=w1"
    rows_in = [(i, f"payload {i}", "w1") for i in range(40)]
    df = spark.createDataFrame(rows_in, "id long, payload string, writer string")
    # accrete small files the way per-batch appends do
    for lo in range(0, 40, 10):
        part = df.filter((df.id >= lo) & (df.id < lo + 10)).coalesce(1)
        part.write.mode("append").parquet(fs.spark_path(path))
    n_before, _ = fs.tree_stats(path)
    assert n_before >= 4
    n_files = compact(spark, path)
    assert n_files == 1
    n_after, _ = fs.tree_stats(path)
    assert n_after == 1
    back = spark.read.parquet(fs.spark_path(path))
    assert sorted(r["id"] for r in back.collect()) == list(range(40))
    assert not fs.exists(path + "_compact_staging")
    assert not fs.exists(path + "_compact_commit.json")

    # kill window 1: staging written, NO marker yet → recover deletes
    # staging, live table untouched
    fs.put_bytes(path + "_compact_staging/part-0.parquet", b"half")
    assert recover_compact(path) is True
    assert not fs.exists(path + "_compact_staging")
    assert spark.read.parquet(fs.spark_path(path)).count() == 40

    # kill window 2: marker PUT + live deleted mid-copy → recover REDOES
    # the copy from staging (idempotent)
    staging = path + "_compact_staging"
    for rel, _size in fs.walk_files(path):
        fs.put_bytes(fs.join(staging, rel), fs.read_bytes(fs.join(path, rel)))
    fs.put_bytes(
        path + "_compact_commit.json", json.dumps({"staging": staging}).encode()
    )
    fs.delete_tree(path)  # the crash point: live gone, copy not started
    assert recover_compact(path) is True
    assert sorted(
        r["id"] for r in spark.read.parquet(fs.spark_path(path)).collect()
    ) == list(range(40))
    assert not fs.exists(staging) and not fs.exists(path + "_compact_commit.json")

    # kill window 3: copy finished, staging gone, marker removal lost
    fs.put_bytes(
        path + "_compact_commit.json", json.dumps({"staging": staging}).encode()
    )
    assert recover_compact(path) is True
    assert not fs.exists(path + "_compact_commit.json")
    assert spark.read.parquet(fs.spark_path(path)).count() == 40


def test_compact_partitioned_layout_preserved_on_object_store(spark, fakefs):
    """Partition-directory discovery and re-application work through the
    seam: a writer=-partitioned dead-letter root compacts without
    flattening its pruning layout."""
    from gofeed_spark.sources.io import compact

    fs = fakefs
    path = "fakefs://bucket/dead_all"
    df = spark.createDataFrame(
        [(i, f"p{i}", f"w{i % 3}") for i in range(30)],
        "id long, payload string, writer string",
    )
    df.write.mode("overwrite").partitionBy("writer").parquet(fs.spark_path(path))
    compact(spark, path)
    assert {d for d in fs.listdir(path) if d.startswith("writer=")} == {
        "writer=w0", "writer=w1", "writer=w2"
    }
    back = spark.read.parquet(fs.spark_path(path))
    assert back.count() == 30
    assert {r["writer"] for r in back.collect()} == {"w0", "w1", "w2"}


def test_upsert_sink_on_object_store_with_crash_windows(spark, fakefs):
    """ParquetUpsertSink publishes by ONE atomic manifest PUT (batch ids +
    the bucket pointer table together) — so the streaming sink lands on a
    rename-less backend, re-delivered batches skip idempotently, a crash
    between the data write and the PUT leaves only unreferenced versioned
    subdirs (reclaimed by the next commit's sweep), and untouched buckets
    carry by NAME across commits (no rewrite)."""
    import json as _json

    from gofeed_spark.streaming.sinks import ParquetUpsertSink

    fs = fakefs
    path = "fakefs://bucket/sink"
    sink = ParquetUpsertSink(path, key="k")
    b0 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    sink(b0, 0)
    b1 = spark.createDataFrame([("b", 20), ("c", 3)], "k string, v int")
    sink(b1, 1)
    got = {(r.k, r.v) for r in sink.read(spark).collect()}
    assert got == {("a", 1), ("b", 20), ("c", 3)}
    assert sink.committed() == [0, 1]
    # idempotent re-delivery: same batch id, different rows -> skipped
    sink(spark.createDataFrame([("a", 999)], "k string, v int"), 1)
    assert {(r.k, r.v) for r in sink.read(spark).collect()} == got
    # crash window: versioned dir written but manifest PUT lost -> the
    # next commit reclaims it and the table stays consistent
    fs.put_bytes(f"{path}/data_v000007/part-0.parquet", b"garbage")
    sink(spark.createDataFrame([("d", 4)], "k string, v int"), 2)
    assert not fs.isdir(f"{path}/data_v000007")
    assert {(r.k, r.v) for r in sink.read(spark).collect()} == got | {("d", 4)}
    # every manifest-referenced bucket dir exists, and nothing else lives
    # under the table (untouched buckets legitimately point at OLD
    # versioned dirs — the manifest-by-name carry)
    state = _json.loads(fs.read_bytes(f"{path}/_committed_batches.json"))
    assert state["n_buckets"] == 32 and state["batches"] == [0, 1, 2]
    live = set(state["buckets"].values())
    assert all(fs.isdir(f"{path}/{rel}") for rel in live)
    for top in fs.listdir(path):
        if not top.startswith("data_v"):
            continue
        for sub in fs.listdir(f"{path}/{top}"):
            if sub.startswith("pbkt="):
                assert f"{top}/{sub}" in live


def test_upsert_sink_touched_buckets_write_volume(spark, tmp_path):
    """The scale contract: after settling a large state table, a 2-key
    micro-batch rewrites ONLY the ≤2 buckets holding those keys — write
    bytes per batch track the batch, not total state (the streaming twin
    of the round-8 feedstate measurement, 1.47 MB → 25 KB)."""
    from gofeed_spark.streaming.sinks import ParquetUpsertSink

    base = str(tmp_path / "bucketed_sink")
    sink = ParquetUpsertSink(base, key="k", n_buckets=16)
    settle = spark.createDataFrame(
        [(f"key{i:05d}", i) for i in range(5000)], "k string, v int"
    )
    sink(settle, 0)
    settled_bytes = sink.last_write_bytes
    assert sink.last_buckets_written == 16
    sink(spark.createDataFrame([("key00001", -1), ("key00002", -2)],
                               "k string, v int"), 1)
    assert sink.last_buckets_written <= 2
    assert sink.last_write_bytes < settled_bytes / 4
    # the merge is still correct and complete
    got = {r.k: r.v for r in sink.read(spark).collect()}
    assert len(got) == 5000
    assert got["key00001"] == -1 and got["key00002"] == -2 and got["key00003"] == 3


def test_upsert_sink_reads_round11_pointer_layout(spark, tmp_path):
    """A round-11/12 single-pointer sink table ({"batches","data"} manifest)
    stays readable and converts to the bucketed layout on its first new
    commit, with the old versioned dir reclaimed."""
    import json as _json
    import os as _os

    from gofeed_spark.streaming.sinks import ParquetUpsertSink

    base = str(tmp_path / "pointer_sink")
    _os.makedirs(base)
    spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int").write.parquet(
        _os.path.join(base, "data_v000003")
    )
    with open(_os.path.join(base, "_committed_batches.json"), "w") as f:
        _json.dump({"batches": [0, 3], "data": "data_v000003"}, f)
    sink = ParquetUpsertSink(base, key="k")
    assert sink.committed() == [0, 3]
    assert {(r.k, r.v) for r in sink.read(spark).collect()} == {("a", 1), ("b", 2)}
    sink(spark.createDataFrame([("b", 20)], "k string, v int"), 4)
    assert {(r.k, r.v) for r in sink.read(spark).collect()} == {("a", 1), ("b", 20)}
    state = _json.loads(open(_os.path.join(base, "_committed_batches.json")).read())
    assert state["buckets"]  # converted
    # the pre-conversion pointer dir held no live bucket -> swept; its
    # replacement (data_v000004) holds every bucket
    assert not any(v.startswith("data_v000003/") for v in state["buckets"].values())


def test_upsert_sink_reads_legacy_layout(spark, tmp_path):
    """A pre-pointer sink table (bare-list manifest + fixed data/ dir)
    stays readable and upgrades on its first new commit."""
    import json as _json
    import os as _os

    from gofeed_spark.streaming.sinks import ParquetUpsertSink

    base = str(tmp_path / "legacy_sink")
    _os.makedirs(base)
    spark.createDataFrame([("a", 1)], "k string, v int").write.parquet(
        _os.path.join(base, "data")
    )
    with open(_os.path.join(base, "_committed_batches.json"), "w") as f:
        _json.dump([0], f)
    sink = ParquetUpsertSink(base, key="k")
    assert sink.committed() == [0]
    assert {(r.k, r.v) for r in sink.read(spark).collect()} == {("a", 1)}
    sink(spark.createDataFrame([("b", 2)], "k string, v int"), 1)
    assert {(r.k, r.v) for r in sink.read(spark).collect()} == {("a", 1), ("b", 2)}
    assert not _os.path.exists(_os.path.join(base, "data"))  # upgraded


# --- ANN index + WARC export on the fake remote ------------------------------


def test_ann_index_lifecycle_on_object_store(spark, fakefs):
    from gofeed_spark.operators.similarity import (
        ensure_ann_index,
        probe_ann_index,
    )

    import numpy as np

    rng = np.random.default_rng(7)
    vecs = [(i, rng.normal(size=8).tolist()) for i in range(50)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    path = "fakefs://bucket/ann_idx"
    ensure_ann_index(emb, path, n_planes=3, dim=8)
    meta = json.loads(fakefs.read_bytes(f"{path}/_index_meta.json"))
    assert meta["kind"] == "srp"
    got = probe_ann_index(spark, path, vecs[5][1], k=3, n_planes=3, dim=8)
    hit = [r["neighbor_id"] for r in got.collect()]
    assert hit and hit[0] == 5  # the vector finds itself first
    # warm call short-circuits (meta matches) without error
    ensure_ann_index(emb, path, n_planes=3, dim=8)


def test_warc_export_read_roundtrip_on_object_store(spark, fakefs):
    from gofeed_spark.sources.warc import export_warc, read_warc

    docs = spark.createDataFrame(
        [(f"http://ex.com/{i}", f"document body {i}") for i in range(20)],
        "url string, body string",
    )
    out = "fakefs://bucket/warc_out"
    manifest = export_warc(docs, out, n_archives=3).collect()
    written = {r["archive"] for r in manifest if r["archive"] is not None}
    assert written and all(a.startswith("fakefs://") for a in written)
    assert sum(r["n_records"] for r in manifest if r["archive"]) == 20
    back = read_warc(spark, out + "/*")
    got = {(r["url"], bytes(r["body"]).decode()) for r in back.collect()}
    assert got == {(f"http://ex.com/{i}", f"document body {i}") for i in range(20)}


def test_upsert_sink_rejects_reserved_bucket_column(spark, tmp_path):
    """A data column named like the sink's bucket partition key would be
    silently overwritten by the bucketing expression — refuse it loudly."""
    import pytest as _pytest

    from gofeed_spark.streaming.sinks import ParquetUpsertSink

    sink = ParquetUpsertSink(str(tmp_path / "clash"), key="k")
    df = spark.createDataFrame([("a", 1)], "k string, pbkt int")
    with _pytest.raises(ValueError, match="reserved"):
        sink(df, 0)


def test_upsert_sink_bounds_committed_id_retention(spark, tmp_path):
    """The manifest must stay O(n_buckets + retain_batches) on an
    arbitrarily long stream: old committed ids collapse into a FLOOR
    (monotone single-writer ids ⇒ anything at or below it is committed),
    and idempotent skip still holds for ancient, recent, and fresh ids."""
    import json as _json

    from gofeed_spark.streaming.sinks import ParquetUpsertSink

    base = str(tmp_path / "long_stream")
    sink = ParquetUpsertSink(base, key="k", n_buckets=4)
    sink.retain_batches = 5
    for b in range(12):
        sink(spark.createDataFrame([(f"k{b}", b)], "k string, v int"), b)
    state = _json.loads(open(f"{base}/_committed_batches.json").read())
    assert len(state["batches"]) < 12 and state["floor"] >= 0
    assert max(state["batches"]) == 11
    rows_before = {(r.k, r.v) for r in sink.read(spark).collect()}
    assert len(rows_before) == 12
    # ancient id (below floor), recent id (in tail): both skip
    sink(spark.createDataFrame([("poison", 999)], "k string, v int"), 0)
    sink(spark.createDataFrame([("poison", 999)], "k string, v int"), 11)
    assert {(r.k, r.v) for r in sink.read(spark).collect()} == rows_before
    # a fresh id still commits
    sink(spark.createDataFrame([("k12", 12)], "k string, v int"), 12)
    assert len({(r.k, r.v) for r in sink.read(spark).collect()}) == 13


def test_upsert_sink_seq_col_pins_within_batch_winner(spark, tmp_path):
    """Multi-row-per-key batches: with seq_col the LARGEST seq wins
    (deterministic last-writer-wins, ADVICE r13); without seq_col the
    sink refuses the ambiguous batch loudly instead of picking an
    arbitrary winner."""
    import pytest as _pytest

    from gofeed_spark.streaming.sinks import ParquetUpsertSink

    base = str(tmp_path / "seq_sink")
    sink = ParquetUpsertSink(base, key="k", seq_col="seq")
    b0 = spark.createDataFrame(
        [("a", 1, "v1"), ("a", 3, "v3"), ("a", 2, "v2"), ("b", 1, "w1")],
        "k string, seq int, v string",
    )
    sink(b0, 0)
    got = {(r.k, r.seq, r.v) for r in sink.read(spark).collect()}
    assert got == {("a", 3, "v3"), ("b", 1, "w1")}
    # seq ties break deterministically on the remaining columns (struct
    # ordering): the lexicographically largest payload wins
    sink(spark.createDataFrame(
        [("c", 5, "x1"), ("c", 5, "x9")], "k string, seq int, v string"), 1)
    got = {(r.k, r.v) for r in sink.read(spark).collect()}
    assert ("c", "x9") in got
    # no seq_col + ambiguous batch -> loud refusal, not silent dedup
    strict = ParquetUpsertSink(str(tmp_path / "strict_sink"), key="k")
    dup = spark.createDataFrame(
        [("a", 1), ("a", 2)], "k string, v int")
    with _pytest.raises(ValueError, match="seq_col"):
        strict(dup, 0)


def test_upsert_sink_detects_fresh_checkpoint_restart(spark, tmp_path):
    """A NEW stream (fresh checkpoint, batch ids restarted at 0) pointed
    at an EXISTING table must fail loudly — its batches would otherwise
    be silently discarded as re-deliveries (ADVICE r13).  A legitimate
    restart (new sink instance re-delivering the NEWEST committed id)
    still skips idempotently."""
    import pytest as _pytest

    from gofeed_spark.streaming.sinks import ParquetUpsertSink

    base = str(tmp_path / "fresh_ckpt")
    sink = ParquetUpsertSink(base, key="k")
    for b in range(3):
        sink(spark.createDataFrame([(f"k{b}", b)], "k string, v int"), b)
    # legitimate restart: a NEW instance re-delivers the newest batch (2)
    resumed = ParquetUpsertSink(base, key="k")
    resumed(spark.createDataFrame([("k2", 99)], "k string, v int"), 2)
    assert {(r.k, r.v) for r in resumed.read(spark).collect()} == {
        ("k0", 0), ("k1", 1), ("k2", 2)}
    # and continues committing fresh ids afterwards
    resumed(spark.createDataFrame([("k3", 3)], "k string, v int"), 3)
    # fresh checkpoint: a NEW instance starts over at batch 0 -> refuse
    repointed = ParquetUpsertSink(base, key="k")
    with _pytest.raises(ValueError, match="fresh checkpoint"):
        repointed(spark.createDataFrame([("new", 1)], "k string, v int"), 0)
    # the floor case too: ancient id below the retention floor
    deep = ParquetUpsertSink(str(tmp_path / "deep"), key="k")
    deep.retain_batches = 2
    for b in range(6):
        deep(spark.createDataFrame([(f"k{b}", b)], "k string, v int"), b)
    repointed2 = ParquetUpsertSink(str(tmp_path / "deep"), key="k")
    repointed2.retain_batches = 2
    with _pytest.raises(ValueError, match="fresh checkpoint"):
        repointed2(spark.createDataFrame([("new", 1)], "k string, v int"), 1)


def test_upsert_sink_lsm_mode_delta_appends(spark, tmp_path):
    """LSM mode (VERDICT r13 item 2): each trigger appends only its
    per-bucket DELTA — write bytes track the BATCH even when the batch's
    keys spread across every bucket (the q120 profile where merge mode
    rewrites ~O(total state) per trigger); reads merge last-writer-wins;
    compaction bounds every bucket's pointer-list depth."""
    import json as _json

    from gofeed_spark.streaming.sinks import ParquetUpsertSink

    base = str(tmp_path / "lsm_sink")
    sink = ParquetUpsertSink(base, key="k", n_buckets=8, mode="lsm",
                             compact_threshold=3)
    n = 40000
    settle = spark.range(n).selectExpr(
        "concat('key', lpad(cast(id as string), 5, '0')) as k",
        "cast(id as int) as v",
        "repeat('x', 64) as payload",
    )
    sink(settle, 0)
    settled_bytes = sink.last_write_bytes
    # spread-key batches: 32 keys hitting ALL 8 buckets
    for b in range(1, 3):
        delta = spark.createDataFrame(
            [(f"key{i * 100:05d}", -b, "y" * 64) for i in range(32)],
            "k string, v int, payload string",
        )
        sink(delta, b)
        assert sink.last_buckets_written == 8          # all buckets touched
        assert sink.last_write_bytes < settled_bytes / 10  # ...but O(batch)
    got = {r.k: r.v for r in sink.read(spark).collect()}
    assert len(got) == n
    assert got["key00100"] == -2 and got["key00000"] == -2 and got["key00001"] == 1
    # depth now 3 per touched bucket; one more spread batch crosses the
    # threshold -> compaction folds those buckets back to ONE relation
    sink(spark.createDataFrame([("key00100", 77, "z")],
                               "k string, v int, payload string"), 3)
    state = _json.loads(open(f"{base}/_committed_batches.json").read())
    assert state["mode"] == "lsm"
    assert all(len(lst) <= 3 for lst in state["buckets"].values())
    assert any(rel.startswith("compact_v") for lst in state["buckets"].values()
               for rel in lst)
    got = {r.k: r.v for r in sink.read(spark).collect()}
    assert len(got) == 40000 and got["key00100"] == 77 and got["key00200"] == -2
    # nothing unreferenced survives the sweep
    live = {r for lst in state["buckets"].values() for r in lst}
    import os as _os
    for top in _os.listdir(base):
        if top.startswith(("data_v", "compact_v")):
            for sub in _os.listdir(f"{base}/{top}"):
                if sub.startswith("pbkt="):
                    assert f"{top}/{sub}" in live


def test_upsert_sink_lsm_settled_read_is_plain_scan(spark, tmp_path):
    """After compaction settles every bucket to one relation, read()
    degrades to the plain scan — no merge shuffle in the plan."""
    from gofeed_spark.streaming.sinks import ParquetUpsertSink

    base = str(tmp_path / "lsm_settled")
    sink = ParquetUpsertSink(base, key="k", n_buckets=4, mode="lsm")
    sink(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"), 0)
    plan = sink.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert "max_by" not in plan and "Exchange" not in plan


def test_upsert_sink_lsm_converts_merge_table_and_refuses_reverse(spark, tmp_path):
    """A merge-layout table opened in lsm mode converts transparently
    (pointers become one-element lists); opening an lsm table in merge
    mode refuses loudly."""
    import json as _json

    import pytest as _pytest

    from gofeed_spark.streaming.sinks import ParquetUpsertSink

    base = str(tmp_path / "convert")
    m = ParquetUpsertSink(base, key="k")
    m(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"), 0)
    lsm = ParquetUpsertSink(base, key="k", mode="lsm")
    lsm(spark.createDataFrame([("b", 20), ("c", 3)], "k string, v int"), 1)
    state = _json.loads(open(f"{base}/_committed_batches.json").read())
    assert state["mode"] == "lsm"
    assert all(isinstance(lst, list) for lst in state["buckets"].values())
    got = {(r.k, r.v) for r in lsm.read(spark).collect()}
    assert got == {("a", 1), ("b", 20), ("c", 3)}
    back = ParquetUpsertSink(base, key="k", mode="merge")
    with _pytest.raises(ValueError, match="LSM"):
        back(spark.createDataFrame([("d", 4)], "k string, v int"), 2)


def test_upsert_sink_lsm_seq_col_and_idempotency(spark, tmp_path):
    """LSM mode composes with seq_col (within-batch winner) and keeps the
    idempotent re-delivery skip."""
    from gofeed_spark.streaming.sinks import ParquetUpsertSink

    base = str(tmp_path / "lsm_seq")
    sink = ParquetUpsertSink(base, key="k", mode="lsm", seq_col="seq")
    sink(spark.createDataFrame(
        [("a", 1, "v1"), ("a", 2, "v2")], "k string, seq int, v string"), 0)
    sink(spark.createDataFrame(
        [("a", 9, "v9")], "k string, seq int, v string"), 1)
    sink(spark.createDataFrame(  # re-delivery of batch 1: skipped
        [("a", 99, "poison")], "k string, seq int, v string"), 1)
    got = {(r.k, r.seq, r.v) for r in sink.read(spark).collect()}
    assert got == {("a", 9, "v9")}

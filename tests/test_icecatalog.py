"""Iceberg REST catalog (sources/icecatalog.py): client + reference
server against a warehouse directory — load/register/commit with
requirements-based arbitration, catalog-mediated reads and writes, and
interop with the direct HadoopCatalog path (same tables, same layout)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gofeed_spark.sources import iceberg as I
from gofeed_spark.sources.icecatalog import (
    NoSuchTable,
    RestCatalog,
    RestCatalogServer,
    commit_iceberg_rest,
    create_iceberg_rest,
    read_iceberg_rest,
    _apply_updates,
    _check_requirements,
    _updates_between,
)


@pytest.fixture()
def server(tmp_path):
    with RestCatalogServer(str(tmp_path / "wh")) as srv:
        yield srv


@pytest.fixture()
def cat(server):
    return RestCatalog(server.uri)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_create_load_read_roundtrip(spark, server, cat):
    cat.create_namespace("ns")
    loc = f"{server.warehouse}/ns/t1"
    create_iceberg_rest(
        cat, "ns.t1", loc, lambda p: I.write_iceberg(_df(spark, 0, 10), p)
    )
    assert cat.list_namespaces() == ["ns"]
    assert cat.list_tables("ns") == ["ns.t1"]
    t = cat.load_table("ns.t1")
    assert t["metadata"]["location"] == loc
    assert t["metadata-location"].endswith(".metadata.json")
    out = read_iceberg_rest(spark, cat, "ns.t1")
    assert {r.k: r.v for r in out.collect()} == {i: i * 10 for i in range(10)}
    with pytest.raises(NoSuchTable):
        cat.load_table("ns.nope")
    with pytest.raises(I.IcebergError, match="ns.table"):
        cat.load_table("justtable")


def test_commit_through_catalog_and_hadoop_interop(spark, server, cat):
    cat.create_namespace("ns")
    loc = f"{server.warehouse}/ns/t2"
    create_iceberg_rest(
        cat, "ns.t2", loc, lambda p: I.write_iceberg(_df(spark, 0, 5), p)
    )
    before = cat.load_table("ns.t2")
    commit_iceberg_rest(
        cat, "ns.t2", lambda p: I.write_iceberg(_df(spark, 5, 10), p)
    )
    after = cat.load_table("ns.t2")
    assert after["metadata"]["current-snapshot-id"] != before["metadata"][
        "current-snapshot-id"
    ]
    assert len(after["metadata"]["snapshots"]) == 2
    assert read_iceberg_rest(spark, cat, "ns.t2").count() == 10
    # the SAME table stays readable through the direct HadoopCatalog path
    # (the server published the metadata + hint in the table dir)
    assert I.read_iceberg(spark, loc).count() == 10
    # and a MERGE runs as a catalog commit too (any write op composes)
    commit_iceberg_rest(
        cat,
        "ns.t2",
        lambda p: I.merge_iceberg(
            spark, p,
            spark.createDataFrame([(1, 999), (100, 1000)], "k long, v long"),
            on=["k"],
        ),
    )
    out = {r.k: r.v for r in read_iceberg_rest(spark, cat, "ns.t2").collect()}
    assert out[1] == 999 and out[100] == 1000 and len(out) == 11


def test_commit_arbitration_stale_loser(spark, server, cat):
    """Two committers, one table: the one whose assert-ref-snapshot-id
    is stale loses with 409 -> IcebergConcurrentWrite; a retry on fresh
    state wins."""
    cat.create_namespace("ns")
    loc = f"{server.warehouse}/ns/t3"
    create_iceberg_rest(
        cat, "ns.t3", loc, lambda p: I.write_iceberg(_df(spark, 0, 5), p)
    )
    stale = cat.load_table("ns.t3")  # A loads state S0
    # B commits first
    commit_iceberg_rest(
        cat, "ns.t3", lambda p: I.write_iceberg(_df(spark, 5, 10), p)
    )
    # A's commit carries the stale snapshot-id -> server refuses
    with pytest.raises(I.IcebergConcurrentWrite, match="ref main moved"):
        cat.commit_table(
            "ns.t3",
            requirements=[
                {
                    "type": "assert-ref-snapshot-id",
                    "ref": "main",
                    "snapshot-id": stale["metadata"]["current-snapshot-id"],
                }
            ],
            updates=[],
        )
    # A retries through the normal flow (fresh load inside) and wins
    commit_iceberg_rest(
        cat, "ns.t3", lambda p: I.write_iceberg(_df(spark, 10, 12), p)
    )
    assert read_iceberg_rest(spark, cat, "ns.t3").count() == 12
    # uuid requirement is also enforced
    with pytest.raises(I.IcebergConcurrentWrite, match="uuid"):
        cat.commit_table(
            "ns.t3",
            requirements=[{"type": "assert-table-uuid", "uuid": "wrong"}],
            updates=[],
        )


def test_schema_evolution_through_catalog(spark, server, cat):
    cat.create_namespace("ns")
    loc = f"{server.warehouse}/ns/t4"
    create_iceberg_rest(
        cat, "ns.t4", loc, lambda p: I.write_iceberg(_df(spark, 0, 3), p)
    )
    wide = spark.range(3, 6).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
        F.lit("x").alias("tag"),
    )
    commit_iceberg_rest(
        cat, "ns.t4",
        lambda p: I.write_iceberg(wide, p, evolve_schema=True),
    )
    meta = cat.load_table("ns.t4")["metadata"]
    assert len(meta["schemas"]) == 2
    assert meta["current-schema-id"] == meta["schemas"][-1]["schema-id"]
    out = read_iceberg_rest(spark, cat, "ns.t4")
    assert out.columns == ["k", "v", "tag"]
    rows = {r.k: r.tag for r in out.collect()}
    assert rows[0] is None and rows[4] == "x"  # old files read null


def test_register_conflicts_and_updates_unit(spark, server, cat, tmp_path):
    cat.create_namespace("ns")
    loc = f"{server.warehouse}/ns/t5"
    create_iceberg_rest(
        cat, "ns.t5", loc, lambda p: I.write_iceberg(_df(spark, 0, 2), p)
    )
    t = cat.load_table("ns.t5")
    with pytest.raises(I.IcebergConcurrentWrite, match="registered"):
        cat.register_table("ns.t5", t["metadata-location"])
    # delta -> updates -> apply is a fixpoint on the fields we manage
    old = t["metadata"]
    import copy

    new = copy.deepcopy(old)
    snap = dict(new["snapshots"][-1])
    snap["snapshot-id"] = 999
    snap["sequence-number"] = int(new["last-sequence-number"]) + 1
    snap["timestamp-ms"] = snap["sequence-number"]
    new["snapshots"].append(snap)
    new["current-snapshot-id"] = 999
    new["last-sequence-number"] = snap["sequence-number"]
    ups = _updates_between(old, new)
    assert [u["action"] for u in ups] == ["add-snapshot", "set-snapshot-ref"]
    applied = _apply_updates(old, ups)
    assert applied["current-snapshot-id"] == 999
    assert applied["last-sequence-number"] == snap["sequence-number"]
    _check_requirements(
        old,
        [
            {
                "type": "assert-ref-snapshot-id",
                "ref": "main",
                "snapshot-id": old["current-snapshot-id"],
            }
        ],
    )
    with pytest.raises(I.IcebergError, match="unsupported update"):
        _apply_updates(old, [{"action": "weird-op"}])


def test_catalog_read_kwargs_passthrough(spark, server, cat):
    """read_iceberg_rest forwards snapshot/where kwargs — time travel
    and point lookups work through the catalog identifier."""
    cat.create_namespace("ns")
    loc = f"{server.warehouse}/ns/t6"
    create_iceberg_rest(
        cat, "ns.t6", loc, lambda p: I.write_iceberg(_df(spark, 0, 5), p)
    )
    first = cat.load_table("ns.t6")["metadata"]["current-snapshot-id"]
    commit_iceberg_rest(
        cat, "ns.t6", lambda p: I.write_iceberg(_df(spark, 5, 10), p)
    )
    assert read_iceberg_rest(spark, cat, "ns.t6").count() == 10
    assert read_iceberg_rest(
        spark, cat, "ns.t6", snapshot_id=first
    ).count() == 5
    got = read_iceberg_rest(spark, cat, "ns.t6", where={"k": "7"}).collect()
    assert [(r.k, r.v) for r in got] == [(7, 70)]

"""Phase-level profile of merge_delta's internals on the q191 shape."""
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from gofeed_spark.session import get_spark
from gofeed_spark.catalog import load_table
from pyspark.sql import functions as F
from gofeed_spark.sources import delta as D

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf1.0"
spark = get_spark("profile-merge")
load_table(spark, sf_dir, "documents").count()

docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
upd = docs.filter(F.col("doc_id") % 5 == 2).withColumn("n_chars", F.col("n_chars") + 1000)
work = tempfile.mkdtemp(prefix="prof_merge_")
dt = f"{work}/delta"
last = [time.time()]


def lap(label):
    now = time.time()
    print(f"{label:38s} {now - last[0]:7.2f}s", flush=True)
    last[0] = now


try:
    for residue in (0, 1):
        batch = (
            docs.filter(F.col("doc_id") % 2 == residue)
            .repartition(1)
            .sortWithinPartitions("doc_id")
        )
        D.write_delta(batch, dt, row_tracking=True)
    lap("setup writes")

    # === replicate merge_delta(update, no insert) phases ===
    import posixpath
    fs = D.get_filesystem(dt)
    snap = D._snapshot(fs, dt)
    lap("snapshot")
    schema, pcols = snap.schema, snap.partition_columns
    mat = snap.row_materialized_cols
    by_type = {f.name: f.dataType for f in schema.fields}
    on = ["doc_id"]
    src = upd.localCheckpoint()
    lap("src localCheckpoint")
    dupchk = src.groupBy(*on).count().filter(F.col("count") > 1).limit(1).count()
    lap("uniqueness check")
    bounds = src.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in on],
        *[F.max(c).alias(f"__hi_{c}") for c in on],
    ).collect()[0]
    lap("bounds agg")
    items = list(snap.adds.items())
    lo = {c: bounds[f"__lo_{c}"] for c in on}
    hi = {c: bounds[f"__hi_{c}"] for c in on}
    candidates = D._prune_adds_by_key_range(items, on, lo, hi)
    skeys = src.select(*on)
    working = D._assemble(spark, fs, dt, schema, pcols, candidates, keep_file=True)
    hits = {
        r["__file"]
        for r in working.join(skeys, on, "left_semi").select("__file").distinct().collect()
    }
    lap("candidate file scan")
    affected = [(rel, add) for rel, add in items if posixpath.basename(rel) in hits]
    tgt = D._assemble(spark, fs, dt, schema, pcols, affected, lineage=True, lineage_cols=mat)
    val_cols = [c for c in schema.names if c not in on]
    srcren = src.select(*on, *[F.col(c).alias(f"__src_{c}") for c in val_cols], F.lit(True).alias("__m"))
    j = tgt.join(srcren, on, "left").withColumn("__upd", F.coalesce(F.col("__m"), F.lit(False)))
    j = j.localCheckpoint()
    lap("rewrite join + j localCheckpoint")
    n_matched = j.filter(F.col("__upd")).count()
    lap("n_matched count")
    repl = [
        F.col(c) if c not in val_cols
        else F.when(F.col("__upd"), F.col(f"__src_{c}")).otherwise(F.col(c)).cast(by_type[c]).alias(c)
        for c in schema.names
    ]
    lin_out = [
        F.col("_row_id").alias(mat[0]),
        F.when(F.col("__upd"), F.lit(None).cast("long")).otherwise(F.col("_row_commit_version")).alias(mat[1]),
    ]
    rewritten = j.select(*repl, *lin_out)
    updated = j.filter(F.col("__upd"))
    cdc = updated.select(*schema.names).withColumn("_change_type", F.lit("update_preimage")).unionByName(
        updated.select(*repl).withColumn("_change_type", F.lit("update_postimage"))
    )
    import uuid
    token = uuid.uuid4().hex
    new_adds = D._stage_and_publish(fs, dt, rewritten, pcols, token, "mrg", "", True)
    lap("stage data write")
    cdc_adds = D._stage_and_publish(fs, dt, cdc, pcols, token, "cdc", "_change_data/", False)
    lap("stage cdc write")
    version = snap.version + 1
    row_dom = D._assign_fresh_row_ids(snap.row_hwm, new_adds, version)
    actions = [{"commitInfo": {"operation": "MERGE", "operationParameters": {}, "engineInfo": "x"}}]
    for rel, add in affected:
        actions.append({"remove": {"path": add["path"], "dataChange": True, "partitionValues": add.get("partitionValues") or {}}})
    actions.extend({"add": a} for a in new_adds)
    actions.extend({"cdc": c} for c in cdc_adds)
    actions.append(row_dom)
    D._publish_commit(fs, dt, version, actions)
    lap("publish commit")
    print("n_matched", n_matched, "files", len(new_adds))
finally:
    shutil.rmtree(work, ignore_errors=True)

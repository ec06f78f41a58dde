"""Distributed Bloom filter: sizing, zero-false-negative contract, measured
false-positive rate, inline/relation probe equivalence, mergeability, and
exactness of the bloom-pruned seen-gate composition (q147's kernel)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gofeed_spark.operators.bloom import (
    BloomFilter,
    bloom_hit_expr,
    bloom_hit_join,
    bloom_new_keys,
    bloom_params,
    build_bloom,
    build_bloom_relation,
    with_bloom_hit,
)


def test_bloom_params_sizing():
    m1, k1 = bloom_params(1000, 0.01)
    m2, k2 = bloom_params(10000, 0.01)
    m3, _ = bloom_params(1000, 0.001)
    assert m2 > m1 and m3 > m1  # grows with n and with shrinking fpp
    assert 5 <= k1 <= 10  # ~ -log2(fpp)
    assert bloom_params(0, 0.01)[0] >= 64  # floor


def _seen_frontier(spark, n=2000):
    seen = spark.createDataFrame(
        [(f"key-{i}",) for i in range(0, n, 2)], "k string"
    )
    frontier = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(n)], "id long, k string"
    )
    return seen, frontier


def test_bloom_no_false_negatives_and_fp_rate(spark):
    seen, frontier = _seen_frontier(spark)
    bf = build_bloom(seen, "k", fpp=0.01)
    res = {
        r["id"]: r["hit"]
        for r in with_bloom_hit(frontier, bf, "k", out_col="hit").collect()
    }
    members = [i for i in range(0, 2000, 2)]
    non_members = [i for i in range(1, 2000, 2)]
    assert all(res[i] for i in members)  # the hard contract: zero FN
    fp = sum(1 for i in non_members if res[i])
    assert fp / len(non_members) <= 0.03  # nominal 1%, 3x headroom


def test_bloom_inline_equals_relation_probe(spark):
    seen, frontier = _seen_frontier(spark, n=600)
    bf = build_bloom(seen, "k", fpp=0.02)
    inline = {
        r["id"]: r["hit"]
        for r in frontier.withColumn("hit", bloom_hit_expr(bf, F.col("k"))).collect()
    }
    words, m, k = build_bloom_relation(seen, "k", fpp=0.02, n_items=300)
    assert (m, k) == (bf.m, bf.k)
    joined = {
        r["id"]: r["bloom_hit"]
        for r in bloom_hit_join(frontier, "k", words, m, k).collect()
    }
    broadcast_form = {
        r["id"]: r["hit"]
        for r in with_bloom_hit(frontier, bf, "k", out_col="hit").collect()
    }
    assert inline == joined == broadcast_form


def test_bloom_merge_two_builds_equals_one(spark):
    """Two relations built from disjoint corpora at the SAME (m, k) union +
    bit_or-regroup into exactly the single-build relation (mergeability —
    the property that lets shards build independently)."""
    a = spark.createDataFrame([(f"a{i}",) for i in range(100)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(100)], "k string")
    both = a.unionByName(b)
    n, fpp = 200, 0.01
    wa, m, k = build_bloom_relation(a, "k", fpp=fpp, n_items=n)
    wb, m2, k2 = build_bloom_relation(b, "k", fpp=fpp, n_items=n)
    assert (m, k) == (m2, k2)
    merged = (
        wa.unionByName(wb).groupBy("word_idx").agg(F.bit_or("word").alias("word"))
    )
    single, _, _ = build_bloom_relation(both, "k", fpp=fpp, n_items=n)
    lhs = {(r["word_idx"], r["word"]) for r in merged.collect()}
    rhs = {(r["word_idx"], r["word"]) for r in single.collect()}
    assert lhs == rhs


def test_bloom_new_keys_exact_vs_anti_join(spark):
    seen, frontier = _seen_frontier(spark)
    got = sorted(r["id"] for r in bloom_new_keys(frontier, "k", seen).collect())
    want = sorted(
        r["id"] for r in frontier.join(seen, frontier["k"] == seen["k"], "left_anti").collect()
    )
    assert got == want == list(range(1, 2000, 2))


def test_bloom_probe_is_codegen_projection(spark):
    """The inline probe must stay a whole-stage-codegen projection: no
    shuffle, no Python, no cartesian product in the plan."""
    seen, frontier = _seen_frontier(spark, n=200)
    bf = build_bloom(seen, "k", fpp=0.01)
    probed = with_bloom_hit(frontier, bf, "k")
    probed.collect()  # finalize AQE so the executed plan is the real one
    plan = probed._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BatchEvalPython", "ShuffleExchange"):
        assert bad not in plan
    # the dense word array binds ONCE (a column reference per bit test,
    # not k literal copies)
    assert plan.count("__bloom_words#") >= bf.k  # referenced in every test
    assert plan.count("[" + str(bf.words[0])) <= 1  # the array itself: once
    # empty seen-set: nothing is a member, everything is new
    empty = spark.createDataFrame([], "k string")
    bf0 = build_bloom(empty, "k", fpp=0.01, n_items=0)
    assert isinstance(bf0, BloomFilter)
    out = with_bloom_hit(frontier, bf0, "k", out_col="hit")
    assert all(not r["hit"] for r in out.collect())


def test_bloom_index_build_append_probe_exact(spark, tmp_path):
    from gofeed_spark.operators.bloom import (
        append_bloom_index,
        build_bloom_index,
        probe_bloom_index,
        recover_bloom_index,
    )

    run1 = spark.createDataFrame([(f"u{i}",) for i in range(0, 300, 3)], "url string")
    run2 = spark.createDataFrame(
        [(f"u{i}",) for i in range(0, 300, 5)], "url string"  # overlaps run1
    )
    frontier = spark.createDataFrame(
        [(i, f"u{i}") for i in range(300)], "id long, url string"
    )
    path = str(tmp_path / "seen")
    m0 = build_bloom_index(run1, "url", path, fpp=0.01)
    m1 = append_bloom_index(run2, "url", path)
    assert m1["version"] == m0["version"] + 1
    assert (m1["m"], m1["k"]) == (m0["m"], m0["k"])  # frozen across appends
    seen_ids = {i for i in range(300) if i % 3 == 0 or i % 5 == 0}
    assert m1["n_keys"] == len(seen_ids)
    got = sorted(r["id"] for r in probe_bloom_index(spark, path, frontier, "url").collect())
    assert got == sorted(set(range(300)) - seen_ids)
    assert recover_bloom_index(path) == []  # append cleaned up after itself


def test_bloom_index_append_equals_one_shot_words(spark, tmp_path):
    """The persisted mergeability contract: appending run2 into run1's
    index yields BIT-IDENTICAL words to a one-shot build over the union at
    the same (m, k)."""
    from gofeed_spark.operators.bloom import (
        _bloom_words_from_keys,
        _bloom_meta,
        append_bloom_index,
        build_bloom_index,
    )
    from gofeed_spark.fs import get_filesystem

    a = spark.createDataFrame([(f"a{i}",) for i in range(150)], "url string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(150)], "url string")
    path = str(tmp_path / "seen")
    build_bloom_index(a, "url", path, fpp=0.01, n_items=300)
    append_bloom_index(b, "url", path)
    fs = get_filesystem(path)
    meta = _bloom_meta(path)
    stored = {
        (r["word_idx"], r["word"])
        for r in spark.read.parquet(
            fs.spark_path(fs.join(path, meta["rels"]["words"]))
        ).collect()
    }
    union_keys = a.unionByName(b).select(F.col("url").alias("key"))
    oneshot = {
        (r["word_idx"], r["word"])
        for r in _bloom_words_from_keys(union_keys, meta["m"], meta["k"]).collect()
    }
    assert stored == oneshot


def test_bloom_index_recovery_and_refusal(spark, tmp_path):
    from gofeed_spark.operators.bloom import (
        _bloom_meta,
        build_bloom_index,
        probe_bloom_index,
        recover_bloom_index,
    )

    a = spark.createDataFrame([("x1",), ("x2",)], "url string")
    path = str(tmp_path / "seen")
    build_bloom_index(a, "url", path)
    # crash debris: an unreferenced version dir gets swept
    import os

    os.makedirs(os.path.join(path, "words_v9999"))
    assert recover_bloom_index(path) == ["words_v9999"]
    # entry-point recovery: an append sweeps debris by itself
    os.makedirs(os.path.join(path, "keys_v8888"))
    from gofeed_spark.operators.bloom import append_bloom_index

    append_bloom_index(
        spark.createDataFrame([("x3",)], "url string"), "url", path
    )
    assert not os.path.exists(os.path.join(path, "keys_v8888"))
    # a non-bloom meta refuses
    import json

    bad = str(tmp_path / "other")
    os.makedirs(bad)
    with open(os.path.join(bad, "_index_meta.json"), "w") as f:
        json.dump({"kind": "something_else"}, f)
    import pytest

    with pytest.raises(ValueError, match="not a bloom"):
        _bloom_meta(bad)
    # missing meta (interrupted build) refuses too
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(Exception):
        probe_bloom_index(spark, empty, a, "url")


def test_bloom_index_streaming_ingest_e2e(spark, tmp_path):
    """Crawl micro-batches append to the persisted seen-set inside
    foreachBatch (the minhash ingest-with-append shape applied to
    membership): build an empty index sized for the stream's lifetime,
    drain three one-file micro-batches through availableNow, and the
    final probe must equal the plain batch anti-join; re-delivering a
    micro-batch is value-idempotent (set semantics — the anti-join makes
    the re-append a no-op)."""
    from gofeed_spark.operators.bloom import (
        append_bloom_index,
        _bloom_meta,
        build_bloom_index,
        probe_bloom_index,
    )

    stage = str(tmp_path / "stage")
    path = str(tmp_path / "seen")
    batches = [
        [(f"u{i}",) for i in range(0, 100)],
        [(f"u{i}",) for i in range(80, 180)],   # overlaps batch 0
        [(f"u{i}",) for i in range(160, 260)],  # overlaps batch 1
    ]
    for rows in batches:
        spark.createDataFrame(rows, "url string").coalesce(1).write.mode(
            "append"
        ).parquet(stage)
    empty = spark.createDataFrame([], "url string")
    build_bloom_index(empty, "url", path, fpp=0.01, n_items=300)

    src = (
        spark.readStream.schema("url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        src.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(lambda df, bid: append_bloom_index(df, "url", path))
        .start()
    )
    assert q.awaitTermination(120)

    meta = _bloom_meta(path)
    assert meta["version"] == 3 and meta["n_keys"] == 260
    frontier = spark.createDataFrame(
        [(i, f"u{i}") for i in range(400)], "id long, url string"
    )
    got = sorted(
        r["id"] for r in probe_bloom_index(spark, path, frontier, "url").collect()
    )
    assert got == list(range(260, 400))
    # re-delivered micro-batch: a no-op by value
    append_bloom_index(
        spark.createDataFrame(batches[0], "url string"), "url", path
    )
    meta2 = _bloom_meta(path)
    assert meta2["n_keys"] == 260
    got2 = sorted(
        r["id"] for r in probe_bloom_index(spark, path, frontier, "url").collect()
    )
    assert got2 == got


def test_bloom_index_append_detects_lost_update(spark, tmp_path):
    """Single-writer contract: if another writer flips the meta while an
    append is in flight, the pre-flip check refuses instead of silently
    publishing over the other writer's keys."""
    import json
    import os

    import pytest

    from gofeed_spark.operators.bloom import append_bloom_index, build_bloom_index

    path = str(tmp_path / "seen")
    build_bloom_index(
        spark.createDataFrame([("a",)], "url string"), "url", path
    )
    meta_file = os.path.join(path, "_index_meta.json")

    calls = {"n": 0}

    # simulate the interleave: bump the stored version right after this
    # append reads its BASE meta (call 1 = recovery sweep, call 2 = the
    # base read, call 3 = the pre-flip check)
    orig = open(meta_file).read()

    def bump():
        m = json.loads(orig)
        m["version"] += 1
        with open(meta_file, "w") as f:
            json.dump(m, f)

    import gofeed_spark.operators.bloom as B

    real_meta = B._bloom_meta

    def racy_meta(p):
        m = real_meta(p)
        calls["n"] += 1
        if calls["n"] == 2:
            bump()
        return m

    B._bloom_meta = racy_meta
    try:
        with pytest.raises(ValueError, match="concurrent append"):
            append_bloom_index(
                spark.createDataFrame([("b",)], "url string"), "url", path
            )
    finally:
        B._bloom_meta = real_meta

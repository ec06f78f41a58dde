"""Distributed Bloom filter — the seen-set gate of a recrawl/dedup pipeline.

A crawl frontier at 100 TB cannot afford a full shuffle anti-join of
frontier × seen on every recrawl pass.  The Bloom filter replaces it with a
compact bit array built ONCE from the seen set (bit-parallel, distributed,
mergeable) and a pure-codegen membership probe on the frontier: bloom says
"definitely new" for the overwhelming majority of rows with zero false
negatives, so only the bloom-POSITIVE sliver (true members + the fpp
false-positive tail) pays an exact verify join.  Composed that way the
final output is EXACT — the approximate structure only prunes the plan
(q147 registers the composition with a plain anti-join oracle).

Two probe shapes, both zero-Python:

- inline (``bloom_hit_expr``): the dense word array rides the plan as an
  array<bigint> literal; the k bit tests are whole-stage-codegen column
  expressions — NO shuffle, NO join, the probe is a projection.  Right
  whenever the bit array fits a broadcast-sized literal (default build
  path; a 10M-key / 1% filter is ~12 MB).
- relation (``bloom_hit_join``): the nonzero words stay a (word_idx, word)
  DataFrame; the frontier explodes its k positions (slim 16-byte rows),
  broadcast-joins the words, and folds ALL-bits-set per key.  Right for
  billion-key filters whose bit array is GB-sized — nothing ever
  collects to the driver.

Hashing: double hashing (Kirsch & Mitzenmacher 2006) over Spark's
``xxhash64`` — position_i = (h1 + i*h2) mod m with h1 = xxhash64(key),
h2 = xxhash64(key, 1), both reduced mod m BEFORE the combine so the
arithmetic never overflows (exact under Spark 4's ANSI mode) and build
and probe agree bit-for-bit by construction.

Reference: the gofeed engine keeps no seen-set structure (its dedup is the
OCC primary key, repo.go); this operator is part of the added LLM/crawl
surface (SURVEY.md §2.E).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard sizing: m = ceil(-n ln p / ln2²) bits, k = round(m/n ln2)."""
    n = max(1, int(n_items))
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _positions(col, m: int, k: int) -> list:
    """The k probe positions for one key column (pure codegen).

    Both hashes reduce mod m BEFORE the combine — (h1 + i·h2) mod m ==
    (h1 mod m + i·(h2 mod m)) mod m, and the reduced form never exceeds
    (k+1)·m, so it is exact under ANSI arithmetic (no wrapping multiply)."""
    h1 = F.pmod(F.xxhash64(col), F.lit(m))
    h2 = F.pmod(F.xxhash64(col, F.lit(1)), F.lit(m))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]


def build_bloom_relation(
    df: DataFrame, col: str, fpp: float = 0.01, n_items: int | None = None
) -> tuple[DataFrame, int, int]:
    """Build the filter as a (word_idx, word) relation of NONZERO 64-bit
    words — fully distributed, nothing on the driver.  One slim explode
    (k positions per key) + one map-side-combinable ``bit_or`` aggregate;
    two relations built from disjoint corpora merge with a union + bit_or
    regroup (the mergeable-sketch property).

    ``n_items=None`` counts distinct keys first (one job, eager)."""
    keys = df.select(F.col(col).alias("__key")).distinct()
    if n_items is None:
        n_items = keys.count()
    m, k = bloom_params(n_items, fpp)
    pos = keys.select(
        F.explode(F.array(*_positions(F.col("__key"), m, k))).alias("__pos")
    )
    words = (
        pos.select(
            F.shiftright("__pos", 6).alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod("__pos", F.lit(64)).cast("int")
            ).alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("word"))
    )
    return words, m, k


@dataclass(frozen=True)
class BloomFilter:
    """Driver-side compact form: the DENSE word array (m/64 longs).

    Bounded by construction — collecting it is collecting the filter, not
    the data (a 1%/1M-key filter is 150k longs ≈ 1.2 MB)."""

    m: int
    k: int
    words: tuple

    @property
    def n_bits_set(self) -> int:
        return sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in self.words)


def build_bloom(
    df: DataFrame, col: str, fpp: float = 0.01, n_items: int | None = None
) -> BloomFilter:
    """Distributed build + dense driver-side form for the inline probe."""
    words, m, k = build_bloom_relation(df, col, fpp=fpp, n_items=n_items)
    dense = [0] * ((m + 63) // 64)
    for r in words.collect():  # bounded: nonzero words of the bit array
        dense[r["word_idx"]] = r["word"]
    return BloomFilter(m=m, k=k, words=tuple(dense))


def bloom_hit_expr(bf: BloomFilter, col) -> "F.Column":
    """Pure-codegen membership test: True = maybe-member (fpp false
    positives), False = DEFINITELY absent (zero false negatives).  The
    word array inlines as a literal into each of the k bit tests — use
    ``with_bloom_hit`` for non-tiny filters (array rides the plan once)."""
    return _hit_from_words(F.lit(list(bf.words)), col, bf.m, bf.k)


def _hit_from_words(words_col, col, m: int, k: int):
    hit = F.lit(True)
    for pos in _positions(col, m, k):
        word = F.element_at(words_col, (F.shiftright(pos, 6) + 1).cast("int"))
        bit = F.call_function(
            "shiftright", word, F.pmod(pos, F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1))
        hit = hit & (bit == 1)
    return hit


def with_bloom_hit(
    df: DataFrame, bf: BloomFilter, col: str, out_col: str = "bloom_hit"
) -> DataFrame:
    """Attach the membership verdict with the dense word array riding ONCE
    as a one-row broadcast relation (``bloom_hit_expr`` inlines the array
    as a literal into EVERY one of the k bit tests — fine for tiny
    filters, plan-bloat for real ones).  The probe itself stays a
    whole-stage-codegen projection; the broadcast is one row."""
    wdf = df.sparkSession.createDataFrame(
        [(list(bf.words),)], "__bloom_words array<bigint>"
    )
    out = df.crossJoin(F.broadcast(wdf))
    hit = _hit_from_words(F.col("__bloom_words"), F.col(col), bf.m, bf.k)
    return out.withColumn(out_col, hit).drop("__bloom_words")


def bloom_hit_join(
    df: DataFrame, col: str, words: DataFrame, m: int, k: int,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Relation-shaped probe for GB-scale filters: explode the k positions
    per DISTINCT key (slim rows), broadcast-join the nonzero words, fold
    all-bits-set per key, join the verdict back.  One key shuffle on the
    distinct-key side; the input df never reshuffles."""
    keys = df.select(F.col(col).alias("__key")).distinct()
    pos = keys.select(
        "__key", F.explode(F.array(*_positions(F.col("__key"), m, k))).alias("__pos")
    ).select(
        "__key",
        F.shiftright("__pos", 6).alias("word_idx"),
        F.pmod("__pos", F.lit(64)).cast("int").alias("__bit"),
    )
    j = pos.join(F.broadcast(words), "word_idx", "left")
    hit_i = F.when(
        F.col("word").isNotNull()
        & (F.call_function("shiftright", F.col("word"), F.col("__bit")).bitwiseAND(F.lit(1)) == 1),
        1,
    ).otherwise(0)
    verdict = j.groupBy("__key").agg((F.min(hit_i) == 1).alias(out_col))
    return df.join(verdict, df[col] == verdict["__key"]).drop("__key")


def bloom_new_keys(
    frontier: DataFrame, col: str, seen: DataFrame,
    fpp: float = 0.01, bf: BloomFilter | None = None,
) -> DataFrame:
    """EXACT not-yet-seen gate, bloom-pruned: rows whose key the bloom
    rejects are definitely new (no join at all); bloom-positive rows —
    true members plus the fpp tail — pay the exact anti-join against
    ``seen``.  Zero false negatives make the union exactly
    ``frontier ANTI JOIN seen``; the bloom only shrinks the join input
    from |frontier| to ~|seen|·(1+fpp)."""
    if bf is None:
        bf = build_bloom(seen, col, fpp=fpp)
    probed = with_bloom_hit(frontier, bf, col, out_col="__bloom_hit")
    definitely_new = probed.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
    candidates = probed.filter(F.col("__bloom_hit")).drop("__bloom_hit")
    verified_new = candidates.join(
        seen.select(col).distinct(), col, "left_anti"
    )
    return definitely_new.unionByName(verified_new)


# --- Persisted seen-set index ---------------------------------------------------
# The cross-run shape (the MinHash/SemDeDup/BM25 index family, applied to
# membership): a crawl run builds the seen-set ONCE, later runs append only
# their new keys and probe without rebuilding.  Layout at `path`:
#   keys_vNNNN/   the exact key set (parquet, one `key` column) — the verify side
#   words_vNNNN/  the nonzero bloom words (word_idx, word)
#   _index_meta.json  {m, k, fpp, design_n, n_keys, version, rels} — written
#                     LAST through the fs seam: THE commit point (an
#                     interrupted build/append leaves no meta flip; stale
#                     version dirs are reclaimed by recover_bloom_index).
# Appends keep (m, k) frozen — the merged words relation is BIT-IDENTICAL to
# a one-shot build over the union (test-pinned), and the fp rate degrades
# gracefully as n_keys outgrows design_n (meta records both so callers can
# schedule a rebuild).

_BLOOM_KIND = "bloom_seen_v1"


def _bloom_meta(path: str) -> dict:
    import json

    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(path)
    raw = fs.read_bytes(fs.join(path, "_index_meta.json"))
    meta = json.loads(raw)
    if meta.get("kind") != _BLOOM_KIND:
        raise ValueError(f"not a bloom seen-set index at {path}: {meta.get('kind')}")
    return meta


def _bloom_words_from_keys(keys: DataFrame, m: int, k: int) -> DataFrame:
    pos = keys.select(
        F.explode(F.array(*_positions(F.col("key"), m, k))).alias("__pos")
    )
    return (
        pos.select(
            F.shiftright("__pos", 6).alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod("__pos", F.lit(64)).cast("int")
            ).alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("word"))
    )


def build_bloom_index(
    df: DataFrame, col: str, path: str, fpp: float = 0.01, n_items: int | None = None
) -> dict:
    """Build the persisted seen-set at ``path`` (keys + bloom words), meta
    last.  ``n_items`` sizes the filter (defaults to the distinct count —
    one job); size it for the EXPECTED lifetime key count when appends are
    planned."""
    from gofeed_spark.fs import get_filesystem
    from gofeed_spark.operators.similarity import _write_index_meta

    fs = get_filesystem(path)
    fs.makedirs(path)
    keys = df.select(F.col(col).alias("key")).distinct()
    if n_items is None:
        n_items = keys.count()
    m, k = bloom_params(n_items, fpp)
    rels = {"keys": "keys_v0000", "words": "words_v0000"}
    keys.write.mode("overwrite").parquet(fs.spark_path(fs.join(path, rels["keys"])))
    stored_keys = df.sparkSession.read.parquet(
        fs.spark_path(fs.join(path, rels["keys"]))
    )
    _bloom_words_from_keys(stored_keys, m, k).write.mode("overwrite").parquet(
        fs.spark_path(fs.join(path, rels["words"]))
    )
    n_keys = stored_keys.count()
    meta = {
        "kind": _BLOOM_KIND,
        "m": m,
        "k": k,
        "fpp": fpp,
        "design_n": int(n_items),
        "n_keys": int(n_keys),
        "version": 0,
        "rels": rels,
    }
    _write_index_meta(path, meta)
    return meta


def append_bloom_index(df: DataFrame, col: str, path: str) -> dict:
    """Fold a batch's NEW keys into the index at the frozen (m, k): union
    keys, bit_or-merge words, publish version+1 rels by one atomic meta
    flip, then reclaim the old version dirs (a crash before the flip
    leaves the old index intact; after it, stale dirs are garbage
    recover_bloom_index sweeps).

    SINGLE-WRITER contract (the foreachBatch shape provides it by
    construction): two concurrent appenders would write the same
    version-named rel dirs.  A lost-update pre-flip check raises if the
    meta moved while this append was running — detection, not
    arbitration (use one writer, or serialize externally)."""
    from gofeed_spark.fs import get_filesystem
    from gofeed_spark.operators.similarity import _write_index_meta

    fs = get_filesystem(path)
    recover_bloom_index(path)  # sweep debris from a crash-interrupted append
    meta = _bloom_meta(path)
    m, k, ver = meta["m"], meta["k"], meta["version"] + 1
    spark = df.sparkSession
    old_keys = spark.read.parquet(
        fs.spark_path(fs.join(path, meta["rels"]["keys"]))
    )
    batch = df.select(F.col(col).alias("key")).distinct()
    new_keys = batch.join(old_keys, "key", "left_anti")
    rels = {"keys": f"keys_v{ver:04d}", "words": f"words_v{ver:04d}"}
    old_keys.unionByName(new_keys).write.mode("overwrite").parquet(
        fs.spark_path(fs.join(path, rels["keys"]))
    )
    merged_keys = spark.read.parquet(fs.spark_path(fs.join(path, rels["keys"])))
    _bloom_words_from_keys(merged_keys, m, k).write.mode("overwrite").parquet(
        fs.spark_path(fs.join(path, rels["words"]))
    )
    n_keys = merged_keys.count()
    if _bloom_meta(path)["version"] != meta["version"]:  # lost-update check
        raise ValueError(
            f"concurrent append detected at {path}: meta moved past "
            f"version {meta['version']} — append_bloom_index is single-writer"
        )
    new_meta = {**meta, "n_keys": int(n_keys), "version": ver, "rels": rels}
    _write_index_meta(path, new_meta)  # the commit point
    for rel in meta["rels"].values():  # post-commit cleanup
        fs.delete_tree(fs.join(path, rel))
    return new_meta


def recover_bloom_index(path: str) -> list[str]:
    """Reclaim version dirs the meta doesn't reference (crash debris from
    an interrupted append — the minhash-index recovery discipline)."""
    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(path)
    meta = _bloom_meta(path)
    live = set(meta["rels"].values())
    removed = []
    for name in fs.listdir(path):
        if name.startswith(("keys_v", "words_v")) and name not in live:
            fs.delete_tree(fs.join(path, name))
            removed.append(name)
    return removed


def load_bloom(spark, path: str) -> BloomFilter:
    """Dense driver-side form of the stored filter (bounded: m/64 longs)."""
    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(path)
    meta = _bloom_meta(path)
    dense = [0] * ((meta["m"] + 63) // 64)
    words = spark.read.parquet(fs.spark_path(fs.join(path, meta["rels"]["words"])))
    for r in words.collect():
        dense[r["word_idx"]] = r["word"]
    return BloomFilter(m=meta["m"], k=meta["k"], words=tuple(dense))


def probe_bloom_index(
    spark, path: str, frontier: DataFrame, col: str
) -> DataFrame:
    """EXACT not-yet-seen rows of ``frontier`` against the persisted index:
    codegen bloom prefilter (stored words ride once as a one-row
    broadcast), exact anti-join verify of the positives against keys/ —
    the bloom's zero false negatives make the union exact while the
    verify join input shrinks from |frontier| to ~|seen|·(1+fpp)."""
    from gofeed_spark.fs import get_filesystem

    fs = get_filesystem(path)
    recover_bloom_index(path)  # entry-point recovery, the minhash convention
    meta = _bloom_meta(path)
    bf = load_bloom(spark, path)
    keys = spark.read.parquet(
        fs.spark_path(fs.join(path, meta["rels"]["keys"]))
    ).withColumnRenamed("key", col)
    probed = with_bloom_hit(frontier, bf, col, out_col="__bloom_hit")
    definitely_new = probed.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
    candidates = probed.filter(F.col("__bloom_hit")).drop("__bloom_hit")
    return definitely_new.unionByName(candidates.join(keys, col, "left_anti"))

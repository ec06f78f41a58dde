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
h2 = xxhash64(key, 1).  Java long overflow in h1 + i*h2 wraps
deterministically, so build and probe agree bit-for-bit by construction.

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

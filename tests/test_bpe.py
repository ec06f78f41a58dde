"""BPE operators (operators/bpe.py): hand-computed merge training,
reversible encoding, determinism under re-sharding, and the distributed
word-frequency stage."""

from __future__ import annotations

from gofeed_spark.operators.bpe import (
    EOW,
    _encode_word,
    bpe_segments,
    train_bpe,
    word_frequencies,
)
from tests.conftest import rows


def test_train_bpe_hand_computed_merge_sequence(spark):
    # corpus = "aaab" x3: pairs (a,a)=6 beat (a,b</w>)=3; then the 3-3 tie
    # breaks lexicographically to (a, b</w>); then (aa, ab</w>) closes the
    # word.  Every step hand-derived.
    docs = spark.createDataFrame([(i, "aaab") for i in range(3)], "doc_id long, text string")
    merges = train_bpe(docs, num_merges=10)
    assert merges == [("a", "a"), ("a", "b" + EOW), ("aa", "ab" + EOW)]


def test_train_stops_when_nothing_repeats(spark):
    docs = spark.createDataFrame([(1, "xy"), (2, "zq")], "doc_id long, text string")
    # every pair occurs once -> top count < 2 -> no merges at all
    assert train_bpe(docs, num_merges=10) == []


def test_encode_word_applies_ranked_merges():
    ranks = {("a", "a"): 0, ("a", "b" + EOW): 1, ("aa", "ab" + EOW): 2}
    assert _encode_word("aaab", ranks) == ["aaab" + EOW]
    assert _encode_word("aab", ranks) == ["aa", "b" + EOW]  # rank 0 then stop
    assert _encode_word("ba", ranks) == ["b", "a" + EOW]  # nothing applies


def test_segments_reversible_and_counted(spark):
    corpus = [
        (1, "the quick brown fox"),
        (2, "the the the lazy dog"),
        (3, ""),
        (4, "   "),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = train_bpe(docs, num_merges=50)
    seg = {r.doc_id: (list(r.tokens), r.n_tokens) for r in bpe_segments(docs, merges).collect()}
    assert set(seg) == {1, 2, 3, 4}
    for did, text in corpus:
        toks, n = seg[did]
        assert n == len(toks)
        # reversibility: concatenated tokens reproduce the word stream
        # with one EOW per word
        expect = "".join(w + EOW for w in text.lower().split())
        assert "".join(toks) == expect, did
    assert seg[3] == ([], 0) and seg[4] == ([], 0)


def test_segments_deterministic_under_resharding(spark):
    docs = spark.createDataFrame(
        [(i, f"token stream number {i % 7} repeats across docs") for i in range(40)],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, num_merges=64)
    a = rows(bpe_segments(docs, merges).select("doc_id", "n_tokens"), "doc_id", "n_tokens")
    b = rows(
        bpe_segments(docs.repartition(13), merges).select("doc_id", "n_tokens"),
        "doc_id", "n_tokens",
    )
    assert a == b
    # merges themselves are independent of input sharding
    assert train_bpe(docs.repartition(17), num_merges=64) == merges


def test_word_frequencies_exact_and_capped(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b C c x"), (2, "b a  a")], "doc_id long, text string"
    )
    got = rows(word_frequencies(docs), "word", "n")
    assert got == {("a", 5), ("b", 3), ("c", 2), ("x", 1)}
    # cap keeps the most frequent, ties by word
    capped = rows(word_frequencies(docs, max_words=2), "word", "n")
    assert capped == {("a", 5), ("b", 3)}


def test_more_merges_never_increase_token_count(spark):
    docs = spark.createDataFrame(
        [(i, "subword units compress repeated subword units") for i in range(5)],
        "doc_id long, text string",
    )
    short = train_bpe(docs, num_merges=4)
    long_ = train_bpe(docs, num_merges=64)
    assert long_[: len(short)] == short  # training is a prefix-stable ranking
    n_short = sum(r.n_tokens for r in bpe_segments(docs, short).collect())
    n_long = sum(r.n_tokens for r in bpe_segments(docs, long_).collect())
    assert n_long <= n_short


def test_segments_respects_custom_id_column_name_and_type(spark):
    docs = spark.createDataFrame(
        [("m1", "subword units"), ("m2", "units units")],
        "media_id string, body string",
    )
    merges = train_bpe(docs, num_merges=8, text_col="body")
    out = bpe_segments(docs, merges, text_col="body", id_col="media_id")
    assert [f.name for f in out.schema.fields] == ["media_id", "tokens", "n_tokens"]
    assert dict(out.dtypes)["media_id"] == "string"
    got = {r.media_id: r.n_tokens for r in out.collect()}
    assert set(got) == {"m1", "m2"} and all(n > 0 for n in got.values())


def test_merge_artifact_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "subword units compress repeated subword units") for i in range(5)],
        "doc_id long, text string",
    )
    from gofeed_spark.operators.bpe import load_merges, save_merges

    merges = train_bpe(docs, num_merges=32)
    p = save_merges(merges, str(tmp_path / "merges.txt"))
    assert load_merges(p) == merges
    # encoding under the loaded artifact is identical
    a = rows(bpe_segments(docs, merges).select("doc_id", "n_tokens"),
             "doc_id", "n_tokens")
    b = rows(bpe_segments(docs, load_merges(p)).select("doc_id", "n_tokens"),
             "doc_id", "n_tokens")
    assert a == b

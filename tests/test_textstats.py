"""Text-analysis expressions on hand-computed strings."""

from __future__ import annotations

from pyspark.sql import functions as F

from gofeed_spark.functions.text import normalized_text, shingles, ws_tokens
from gofeed_spark.operators.textstats import (
    fingerprint_expr,
    lang_id_expr,
    quality_features,
    with_token_counts,
)
from tests.conftest import rows


def test_token_counts(spark):
    d = spark.createDataFrame(
        [(1, "one two three"), (2, "word"), (3, "a-b c,d e!")],
        "doc_id long, text string",
    )
    out = rows(with_token_counts(d), "doc_id", "n_tokens_ws", "n_tokens_re")
    assert out == {(1, 3, 3), (2, 1, 1), (3, 3, 5)}


def test_lang_id_markers(spark):
    d = spark.createDataFrame(
        [
            (1, "the cat and the hat of doom"),
            (2, "el gato y la casa de los perros"),
            (3, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    out = rows(d.select("doc_id", lang_id_expr().alias("lang")))
    assert out == {(1, "en"), (2, "es"), (3, "unknown")}


def test_quality_degenerate_short_doc_flagged(spark):
    d = spark.createDataFrame(
        [(1, "hi"), (2, "a perfectly reasonable sentence with several words")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.quality for r in quality_features(d).collect()}
    assert out[1] == "low"
    assert out[2] == "ok"


def test_fingerprint_invariant_to_case_and_whitespace(spark):
    d = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "other text")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fp for r in d.select("doc_id", fingerprint_expr().alias("fp")).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_shingles_short_doc_empty(spark):
    d = spark.createDataFrame([(1, "only four words here")], "doc_id long, text string")
    out = d.select(shingles(ws_tokens("text"), 5).alias("sh")).collect()[0].sh
    assert out == []


def test_shingles_distinct_and_ordered_window(spark):
    d = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    out = d.select(shingles(ws_tokens("text"), 2).alias("sh")).collect()[0].sh
    assert sorted(out) == ["a b", "b a"]


def test_normalized_text(spark):
    d = spark.createDataFrame([(1, "  A\t\tB  c ")], "doc_id long, text string")
    assert d.select(normalized_text("text").alias("n")).collect()[0].n == " a b c "


def test_redact_pii_counts_and_replacement_order(spark):
    from gofeed_spark.operators.textstats import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@d-e.org and x@y.io, call 555-123-4567, host 10.0.0.1"),
            (2, "no pii here at all"),
            # the email's digits must be consumed by the EMAIL pass, never
            # clipped into a phone/ip match later
            (3, "u555.123.4567@ex.org"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ip) == (2, 1, 1)
    assert "<EMAIL>" in out[1].redacted and "<PHONE>" in out[1].redacted
    assert "555-123-4567" not in out[1].redacted and "10.0.0.1" not in out[1].redacted
    assert (out[2].n_email, out[2].n_phone, out[2].n_ip) == (0, 0, 0)
    assert out[2].redacted == "no pii here at all"
    assert out[3].redacted == "<EMAIL>" and out[3].n_email == 1


def test_redact_pii_idempotent(spark):
    """Redaction is a fixpoint: the replacement tokens contain no digits or
    @, so a second pass must change nothing — the property that makes the
    scrub safe to re-run over partially-processed corpora."""
    from gofeed_spark.operators.textstats import redact_pii

    docs = spark.createDataFrame(
        [(1, "a@b.io 555-123-4567 10.0.0.1 plain tail")],
        "doc_id long, text string",
    )
    once = redact_pii(docs)
    twice = redact_pii(once.select(F.col("doc_id"), F.col("redacted").alias("text")))
    r1 = once.collect()[0]
    r2 = twice.collect()[0]
    assert r2.redacted == r1.redacted
    assert (r2.n_email, r2.n_phone, r2.n_ip) == (0, 0, 0)


def test_remove_frequent_lines_boilerplate(spark):
    """Per-group frequent lines are removed (df >= ceil(0.5*n_docs)),
    infrequent repeats and unique bodies survive in original order, and
    every input doc appears in the output."""
    from gofeed_spark.operators.textstats import remove_frequent_lines
    from tests.conftest import rows

    docs = spark.createDataFrame(
        [
            (1, "sA", "HEAD\nbody one\nPROMO"),
            (2, "sA", "HEAD\nbody two"),
            (3, "sA", "HEAD\nbody three"),
            (4, "sA", "HEAD\nbody four"),
            (5, "sB", "HEAD\nbody five"),  # other group: HEAD df=1 there
        ],
        "doc_id long, source string, text string",
    )
    out = {r.doc_id: (r.clean_text, r.n_removed) for r in
           remove_frequent_lines(docs, min_frac=0.5).collect()}
    # group sA: HEAD df=4/4 removed; PROMO df=1/4 kept; bodies kept in order
    assert out[1] == ("body one\nPROMO", 1)
    assert out[2] == ("body two", 1)
    # group sB has ONE doc: the df>=2 floor keeps every line (nothing can
    # be boilerplate on a single-doc domain)
    assert out[5] == ("HEAD\nbody five", 0)
    # a doc that is ALL boilerplate comes back empty, not missing
    docs2 = spark.createDataFrame(
        [(1, "s", "X"), (2, "s", "X"), (3, "s", "X\nkeep me... wait")],
        "doc_id long, source string, text string",
    )
    out2 = {r.doc_id: (r.clean_text, r.n_removed) for r in
            remove_frequent_lines(docs2, min_frac=0.5).collect()}
    assert out2[1] == ("", 1)
    assert out2[3] == ("keep me... wait", 1)


def test_gopher_rules_hand_computed(spark):
    from gofeed_spark.operators.textstats import gopher_rules

    d = spark.createDataFrame(
        [
            # clean prose: 11 words, 34 non-space chars, 6 stopword hits
            (1, "the cat and that dog have fun with all of it"),
            # symbol spam: 2 of 4 tokens are '#', mean word length 7/4
            (2, "# # the of"),
            # every line ellipsis-ended (both ASCII and unicode forms)
            (3, "to be or not...\nthe end of it…"),
        ],
        "doc_id long, text string",
    )
    out = rows(gopher_rules(d))
    assert out == {
        (1, 3.090909, 0.0, 0.0, 0.0, 6, 1),
        (2, 1.75, 0.5, 0.0, 0.0, 2, 0),
        # the unicode ellipsis char itself also counts as a symbol: 1/8 words
        (3, 2.875, 0.125, 0.0, 1.0, 4, 0),
    }


def test_gopher_rules_bullet_majority_fails(spark):
    from gofeed_spark.operators.textstats import gopher_rules

    bullets = "\n".join("- bullet item number ten" for _ in range(10))
    d = spark.createDataFrame(
        [(1, "intro line with the stuff of it\n" + bullets)],
        "doc_id long, text string",
    )
    row = gopher_rules(d).collect()[0]
    assert row.bullet_frac == 0.909091  # 10 of 11 lines
    assert row.gopher_ok == 0
    # same doc with only 4 bullet lines is under the 0.9 cap
    d2 = spark.createDataFrame(
        [(1, "intro line with the stuff of it\n" + "\n".join(
            "- bullet item number ten" for _ in range(4)))],
        "doc_id long, text string",
    )
    assert gopher_rules(d2).collect()[0].gopher_ok == 1


def test_dup_ngram_char_fraction_hand_computed(spark):
    from gofeed_spark.operators.textstats import dup_ngram_char_fraction

    d = spark.createDataFrame(
        [
            # grams: "a b a" x2, "b a b" x2 -> dup chars 4*5=20 over 11 chars
            (1, "a b a b a b"),
            (2, "one two three four"),  # all grams unique
            (3, "hi there"),            # fewer than n tokens
            (4, ""),                    # empty doc
        ],
        "doc_id long, text string",
    )
    out = rows(dup_ngram_char_fraction(d))
    assert out == {(1, 20 / 11), (2, 0.0), (3, 0.0), (4, 0.0)}


def test_mixture_sample_rates_and_clip(spark):
    """rate_s = min(1, budget*share_s/T_s): the over-weighted small source
    clips at 1 (kept whole); the big source down-samples deterministically."""
    from pyspark.sql import functions as F

    from gofeed_spark.operators.mixing import mixture_sample

    ten = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = spark.createDataFrame(
        [(i, "A", ten) for i in range(1, 5)] + [(9, "B", ten)],
        "doc_id long, source string, text string",
    )
    w = F.when(F.col("source") == "B", 3).otherwise(1)
    out = mixture_sample(docs, w, budget_frac=0.6)
    rows_out = sorted((r.doc_id, r.source, r.rate) for r in out.collect())
    # T=50 tokens, W=4: rate_A = 0.6*50*1/4/40 = 0.1875, rate_B = 2.25 -> 1.0
    assert (9, "B", 1.0) in rows_out
    for did, src, rate in rows_out:
        if src == "A":
            assert rate == 0.1875
    # content-addressed: identical output on a rerun
    assert rows_out == sorted((r.doc_id, r.source, r.rate) for r in out.collect())


def test_bm25_scores_hand_computed(spark):
    import math

    from gofeed_spark.operators.search import bm25_scores

    d = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog bird"), (3, "fish")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.score for r in bm25_scores(d, ["cat", "dog"]).collect()}
    # N=3, avgdl=2.0, df(cat)=1, df(dog)=2
    idf_cat = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1)
    idf_dog = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)
    d1 = idf_cat * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.0)) \
        + idf_dog * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 3 / 2.0))
    d2 = idf_dog * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 2 / 2.0))
    assert out == {1: round(d1, 6), 2: round(d2, 6)}
    assert 3 not in out  # no query term -> no row


def test_tfidf_keywords_hand_computed(spark):
    import math

    from gofeed_spark.operators.search import tfidf_keywords

    d = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "dog bird"), (3, "cat fish")],
        "doc_id long, text string",
    )
    out = [
        (r.doc_id, r.rank, r.token, r.score)
        for r in tfidf_keywords(d, top_k=2).collect()
    ]
    # N=3; df: cat=2, dog=2, bird=1, fish=1
    idf2 = math.log(4 / 3) + 1  # df=2
    idf1 = math.log(4 / 2) + 1  # df=1
    assert out == [
        (1, 1, "cat", round(2 * idf2, 6)),   # tf=2 beats dog's tf=1
        (1, 2, "dog", round(1 * idf2, 6)),
        (2, 1, "bird", round(idf1, 6)),      # rarer token outranks dog
        (2, 2, "dog", round(idf2, 6)),
        (3, 1, "fish", round(idf1, 6)),
        (3, 2, "cat", round(idf2, 6)),
    ]


def test_tfidf_keywords_tie_breaks_on_token(spark):
    from gofeed_spark.operators.search import tfidf_keywords

    # two tokens with identical tf and df in one doc: token ASC decides
    d = spark.createDataFrame(
        [(1, "zebra apple"), (2, "zebra apple")], "doc_id long, text string"
    )
    out = [(r.doc_id, r.rank, r.token) for r in tfidf_keywords(d, top_k=2).collect()]
    assert out == [
        (1, 1, "apple"), (1, 2, "zebra"), (2, 1, "apple"), (2, 2, "zebra")
    ]


def test_unigram_logprob_exact_powers_of_two(spark):
    from gofeed_spark.operators.textstats import unigram_logprob_score

    # freq: a=2, b=1, c=1, T=4 -> p(a)=1/2 (1 bit), p(b)=p(c)=1/4 (2 bits)
    docs = spark.createDataFrame(
        [(1, "a a"), (2, "b c")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.xent_bits, r.keep)
        for r in unigram_logprob_score(docs).collect()
    }
    assert got == {1: (2, 1.0, 1), 2: (2, 2.0, 1)}


def test_unigram_logprob_flags_rare_token_soup(spark):
    from gofeed_spark.operators.textstats import unigram_logprob_score

    common = [(i, "the cat sat on the mat in the hat") for i in range(1, 40)]
    soup = [(100, "zxqv wkjh pqrs mnbv lkyt")]  # every token unique in corpus
    docs = spark.createDataFrame(common + soup, "doc_id long, text string")
    out = {r.doc_id: r.keep for r in unigram_logprob_score(docs, max_xent_bits=6.0).collect()}
    assert out[100] == 0  # rare-token soup exceeds the entropy budget
    assert all(v == 1 for k, v in out.items() if k != 100)


def test_bigram_logprob_exact_and_short_doc_dropped(spark):
    from gofeed_spark.operators.textstats import bigram_logprob_score

    # bigrams: (a,b)x2 from docs 1&2, (a,c)x1, (c,a)x1 from doc 2;
    # c(a.)=3, c(c.)=1 -> p(b|a)=2/3, p(c|a)=1/3, p(a|c)=1
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c a b"), (3, "solo")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_bigrams, r.xent2_bits)
           for r in bigram_logprob_score(docs).collect()}
    import math
    e1 = round(-math.log2(2 / 3), 6)
    e2 = round(-(math.log2(1 / 3) + math.log2(1.0) + math.log2(2 / 3)) / 3, 6)
    assert got == {1: (1, e1), 2: (3, e2)}  # doc 3: no bigrams, dropped


def test_keyword_classify_argmax_ties_and_default(spark):
    from gofeed_spark.operators.textstats import keyword_classify

    tax = {"b_topic": ("cat", "dog"), "a_topic": ("fish", "bird")}
    docs = spark.createDataFrame(
        [(1, "cat dog here"),          # b_topic wins 2-0
         (2, "fish and cat"),          # 1-1 tie -> lexicographic a_topic
         (3, "nothing relevant")],     # no hits -> other
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.label, r.label_hits)
           for r in keyword_classify(docs, tax).collect()}
    assert got == {1: ("b_topic", 2), 2: ("a_topic", 1), 3: ("other", 0)}


def test_compression_ratio_flags_repetitive_text(spark):
    from gofeed_spark.operators.textstats import compression_ratio

    docs = spark.createDataFrame(
        [(1, "spam " * 400),                       # templated -> tiny ratio
         (2, "x"),                                  # incompressible stub
         (3, "")],                                  # empty -> ratio 0, dropped
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.ratio, r.keep) for r in compression_ratio(docs).collect()}
    assert got[1][0] < 0.05 and got[1][1] == 0
    assert got[2][0] > 1.0 and got[2][1] == 1  # header overhead > 1 on tiny docs
    assert got[3] == (0.0, 0)
    # deterministic across re-shards (pure function of the text)
    again = {r.doc_id: (r.ratio, r.keep)
             for r in compression_ratio(docs.repartition(5)).collect()}
    assert again == got


def test_relative_length_filter_approx_mode_tracks_exact(spark):
    """approx=True (percentile_approx sketch) must track the exact mode:
    per-source bounds within one percentile's worth of the length
    distribution, and the keep set near-identical on sf0.01 volume."""
    from gofeed_spark.operators.textstats import relative_length_filter

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "source", "n_chars")
    )
    exact = relative_length_filter(docs).collect()
    approx = relative_length_filter(docs, approx=True).collect()
    eb = {(r.source): (r.lo_bound, r.hi_bound) for r in exact}
    ab = {(r.source): (r.lo_bound, r.hi_bound) for r in approx}
    assert eb.keys() == ab.keys()
    # one percentile of RANK slack per source (exact interpolates between
    # data points, the sketch returns a data value — value-space gaps can
    # be arbitrarily wide in sparse regions, rank is the sketch's actual
    # guarantee)
    import bisect

    spans = {}
    for r in exact:
        spans.setdefault(r.source, []).append(r.length)
    for src in eb:
        lengths = sorted(spans[src])
        n = len(lengths)
        slack = max(2.0, n / 100.0)
        for (ev, av), p in zip(zip(eb[src], ab[src]), (0.05, 0.95)):
            rank = bisect.bisect_left(lengths, av)
            assert abs(rank - p * n) <= slack, (src, p, av, rank, p * n)
    # keep decisions: a flip is legitimate ONLY for a boundary doc — one
    # whose rank within its source sits within a percentile (+1 rank for
    # interpolation) of a bound; anything interior flipping means the
    # sketch broke
    ek = {r.doc_id: (r.keep, r.source, r.length) for r in exact}
    ak = {r.doc_id: r.keep for r in approx}
    for d, (keep, src, length) in ek.items():
        if keep == ak[d]:
            continue
        lengths = sorted(spans[src])
        n = len(lengths)
        rank = bisect.bisect_left(lengths, length)
        slack = n / 100.0 + 1.0
        near_bound = (
            abs(rank - 0.05 * n) <= slack or abs(rank - 0.95 * n) <= slack
        )
        assert near_bound, (d, src, length, rank, n)


def test_dsir_select_hand_computed(spark):
    import math

    from pyspark.sql import functions as F

    from gofeed_spark.operators.mixing import dsir_select

    d = spark.createDataFrame(
        [(1, "a a b", 1), (2, "a b", 1), (3, "c c", 0), (4, "a c", 0)],
        "doc_id long, text string, tgt int",
    )
    out = {
        r.doc_id: (r.n_tokens, r.log_ratio_bits, r.keep)
        for r in dsir_select(d, target=F.col("tgt") == 1).collect()
    }
    # vocab {a,b,c}: cs a=4 b=2 c=3 (Ts=9); ct a=3 b=2 (Tt=5); V=3
    r = {
        "a": math.log2(((3 + 1) / 8) / ((4 + 1) / 12)),
        "b": math.log2(((2 + 1) / 8) / ((2 + 1) / 12)),
        "c": math.log2(((0 + 1) / 8) / ((3 + 1) / 12)),
    }
    lrs = {
        1: (r["a"] + r["a"] + r["b"]) / 3,
        2: (r["a"] + r["b"]) / 2,
        3: r["c"],
        4: (r["a"] + r["c"]) / 2,
    }
    s = sorted(lrs.values())
    q80 = round(s[2] + 0.4 * (s[3] - s[2]), 6)  # (n-1)*0.8 = 2.4
    for did, lr in lrs.items():
        n, got_lr, keep = out[did]
        assert got_lr == round(lr, 6)
        assert keep == int(round(lr, 6) >= q80)
    assert sum(v[2] for v in out.values()) == 1  # only the top doc survives
    assert out[1][0] == 3 and out[3][0] == 2  # n_tokens


def test_dsir_select_keep_fraction_and_determinism(spark):
    from pyspark.sql import functions as F

    from gofeed_spark.operators.mixing import dsir_select

    rows = [
        (i, " ".join(f"w{(i * j) % 17}" for j in range(1, 12)), i % 3 == 0)
        for i in range(60)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = dsir_select(d.repartition(5), target=F.col("tgt"))
    got = [tuple(r) for r in out.collect()]
    kept = sum(r[3] for r in got)
    assert 0 < kept <= 0.25 * 60 + 1  # ~top 20%, quantile ties may widen
    # partition-invariant
    got2 = [
        tuple(r)
        for r in dsir_select(d.repartition(1), target=F.col("tgt")).collect()
    ]
    assert got == got2


def test_bm25_index_probe_equals_full_scan(spark, tmp_path):
    """The persisted posting index must reproduce bm25_scores
    BIT-FOR-BIT (shared contribution expression, exact round-trip corpus
    stats), and the probe's tf read must partition-prune to the query
    terms' md5 buckets."""
    from gofeed_spark.operators.search import (
        _term_bucket_py,
        bm25_scores,
        build_bm25_index,
        probe_bm25_index,
    )

    d = spark.createDataFrame(
        [(1, "cat dog cat mouse"), (2, "dog bird"), (3, "fish pond weed"),
         (4, "cat fish dog cat cat")],
        "doc_id long, text string",
    ).repartition(3)
    idx = str(tmp_path / "bm25idx")
    build_bm25_index(d, idx)
    terms = ["cat", "fish", "zebra"]  # zebra: absent from the corpus
    probe = probe_bm25_index(spark, idx, terms)
    got = {r.doc_id: r.score for r in probe.collect()}
    want = {r.doc_id: r.score for r in bm25_scores(d, terms).collect()}
    assert got == want and len(got) == 3  # docs 1, 3, 4
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "tb" in pf and _term_bucket_py("cat") in pf
    assert "PushedFilters" in plan  # term equality reaches the pruned scan


def test_bm25_ingest_scorer_frozen_stats_and_pruning(spark, tmp_path):
    """bm25_score_docs (the ingest-time scorer): arriving docs score with
    tf local and EVERY corpus stat frozen — same corpus => equals the
    full-scan scorer bit-for-bit; a frozen-corpus-unseen term takes df=0;
    and its df read partition-prunes to the terms' buckets."""
    from gofeed_spark.operators.search import (
        _term_bucket_py,
        bm25_score_docs,
        bm25_scores,
        build_bm25_index,
    )

    d = spark.createDataFrame(
        [(1, "cat dog cat mouse"), (2, "dog bird"), (3, "fish pond weed"),
         (4, "cat fish dog cat cat")],
        "doc_id long, text string",
    ).repartition(3)
    idx = str(tmp_path / "bm25idx_ing")
    build_bm25_index(d, idx)
    terms = ["cat", "fish"]
    out = bm25_score_docs(spark, d, idx, terms)
    got = {r.doc_id: r.score for r in out.collect()}
    want = {r.doc_id: r.score for r in bm25_scores(d, terms).collect()}
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "tb" in pf and _term_bucket_py("cat") in pf
    # a NEW doc with a frozen-unseen term still scores (df=0 idf path)
    new = spark.createDataFrame([(9, "zebra zebra cat")], "doc_id long, text string")
    srow = bm25_score_docs(spark, new, idx, ["zebra", "cat"]).collect()
    assert len(srow) == 1 and srow[0].doc_id == 9 and srow[0].score > 0


def test_bm25_index_probe_refuses_missing_meta(spark, tmp_path):
    import pytest as _pytest

    from gofeed_spark.operators.search import probe_bm25_index

    with _pytest.raises(ValueError, match="no completed bm25 index"):
        probe_bm25_index(spark, str(tmp_path / "nope"), ["cat"])


def test_bm25_index_build_refuses_empty_corpus(spark, tmp_path):
    import pytest as _pytest

    from gofeed_spark.operators.search import build_bm25_index

    empty = spark.createDataFrame([], "doc_id long, text string")
    with _pytest.raises(ValueError, match="empty corpus"):
        build_bm25_index(empty, str(tmp_path / "e"))


def test_frozen_unseen_term_cross_engine_formula(spark, tmp_path):
    """The q131/q133 df=0 COALESCE branch, pinned through BOTH engines'
    formulas with a term GUARANTEED absent from the frozen corpus
    (VERDICT r13 item 7: the gate split only covers this branch if the
    20% split happens to contain unseen terms — this fixture does not
    depend on that luck)."""
    import duckdb

    from gofeed_spark.operators.search import (
        bm25_score_docs,
        build_bm25_index,
        tfidf_keywords_score,
        tfidf_model,
    )

    frozen = [(1, "cat dog cat mouse"), (2, "dog bird cat"), (3, "fish pond")]
    arriving = [(10, "zebra zebra cat pond")]  # 'zebra' unseen in frozen
    d_frozen = spark.createDataFrame(frozen, "doc_id long, text string")
    d_arr = spark.createDataFrame(arriving, "doc_id long, text string")

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in frozen + arriving)
        + ") v(doc_id, text)"
    )

    # --- BM25 (q131's oracle formula, split at doc_id 10) ---
    idx = str(tmp_path / "unseen_bm25")
    build_bm25_index(d_frozen, idx)
    got = {
        r.doc_id: r.score
        for r in bm25_score_docs(spark, d_arr, idx, ["zebra", "cat"]).collect()
    }
    want = dict(con.execute(r"""
WITH base AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM docs),
corp AS (SELECT * FROM base WHERE doc_id < 10),
arr AS (SELECT * FROM base WHERE doc_id >= 10),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(len(tk) AS DOUBLE)) AS avgdl FROM corp),
dfreq AS (SELECT t.tok, COUNT(DISTINCT c.doc_id) AS df
          FROM corp c, LATERAL UNNEST(c.tk) AS t(tok)
          WHERE t.tok IN ('zebra', 'cat') GROUP BY t.tok),
hits AS (SELECT a.doc_id, len(a.tk) AS len_d, t.tok
         FROM arr a, LATERAL UNNEST(a.tk) AS t(tok)
         WHERE t.tok IN ('zebra', 'cat')),
tf AS (SELECT doc_id, len_d, tok, COUNT(*) AS tf FROM hits GROUP BY 1, 2, 3)
SELECT tf.doc_id,
       ROUND(SUM(
         ln((CAST(s.n_docs AS DOUBLE) - COALESCE(CAST(d.df AS DOUBLE), 0.0) + 0.5)
            / (COALESCE(CAST(d.df AS DOUBLE), 0.0) + 0.5) + 1.0)
         * (tf.tf * CAST(2.2 AS DOUBLE))
         / (tf.tf + CAST(1.2 AS DOUBLE)
            * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * tf.len_d / s.avgdl))
       ), 6) AS score
FROM tf LEFT JOIN dfreq d USING (tok), stats s
GROUP BY tf.doc_id
""").fetchall())
    assert got == want and 10 in got and got[10] > 0

    # --- TF-IDF (q133's oracle formula) ---
    model = tfidf_model(d_frozen)
    got_kw = {
        (r.doc_id, r.rank): (r.token, round(r.score, 6))
        for r in tfidf_keywords_score(d_arr, model, top_k=2).collect()
    }
    want_kw = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute("""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM docs,
       LATERAL (SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-z0-9]+')) AS tok) t
),
ctf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        WHERE doc_id < 10 GROUP BY doc_id, tok),
dfreq AS (SELECT tok, COUNT(*) AS df FROM ctf GROUP BY tok),
nd AS (SELECT COUNT(*) AS n_docs FROM docs WHERE doc_id < 10),
atf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        WHERE doc_id >= 10 GROUP BY doc_id, tok),
scored AS (
  SELECT atf.doc_id, atf.tok,
         atf.tf * (LN((nd.n_docs + 1.0) / (COALESCE(dfreq.df, 0) + 1.0)) + 1.0)
           AS score
  FROM atf LEFT JOIN dfreq USING (tok), nd
)
SELECT doc_id, CAST(rn AS INT) AS rank, tok, ROUND(score, 6) AS score
FROM (SELECT doc_id, tok, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rn
      FROM scored) x
WHERE rn <= 2
""").fetchall()
    }
    assert got_kw == want_kw
    # the UNSEEN term must be the top keyword (tf=2, max idf)
    assert got_kw[(10, 1)][0] == "zebra"


def test_chunk_documents_boundaries_overlap_and_tail(spark):
    """chunk_documents (q145): chunk starts step by stride, consecutive
    chunks share exactly `overlap` tokens, the union of chunks covers
    every token in order, tails clamp, and short docs yield one chunk."""
    import pytest as _pytest

    from gofeed_spark.operators.packing import chunk_documents

    toks = [f"t{i}" for i in range(23)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b c"), (3, "solo")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, window=10, overlap=4)  # stride 6
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text) for r in out.collect())
    )
    d1 = [r for r in rows if r[0] == 1]
    # n=23, stride=6: ceil((23-4)/6) = 4 chunks
    assert [r[1] for r in d1] == [0, 1, 2, 3]
    chunks = [r[3].split(" ") for r in d1]
    assert chunks[0] == toks[0:10] and chunks[1] == toks[6:16]
    assert chunks[2] == toks[12:22] and chunks[3] == toks[18:23]  # tail clamps
    assert d1[-1][2] == 5  # tail length
    for a, b in zip(chunks, chunks[1:]):
        assert a[-4:] == b[:4]  # exactly `overlap` shared tokens
    covered = []
    for i, c in enumerate(chunks):
        covered.extend(c if i == 0 else c[4:])
    assert covered == toks  # full in-order coverage, nothing lost
    # short docs -> exactly one whole chunk
    assert [r[3] for r in rows if r[0] == 2] == ["a b c"]
    assert [r[3] for r in rows if r[0] == 3] == ["solo"]
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, window=8, overlap=8)


def test_perplexity_buckets_equal_depth_and_tiers(spark):
    from gofeed_spark.operators.textstats import perplexity_buckets

    # two sources x 7 docs each: clean repeated-vocab docs score low xent,
    # rare-token soup scores high; 7 rows -> NTILE(3) depths 3/2/2.
    docs = []
    common = "alpha beta gamma delta alpha beta"
    for s in ("a", "b"):
        base = 0 if s == "a" else 100
        for i in range(6):
            docs.append((base + i, s, common + f" tok{i % 2}"))
        docs.append((base + 6, s, f"zzz{base} qqq{base} xxy{base} rare{base} uniq{base}"))
    d = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = rows(perplexity_buckets(d), "doc_id", "source", "bucket", "tier")
    by_src = {}
    for doc_id, src, bucket, tier in out:
        by_src.setdefault(src, []).append((doc_id, bucket, tier))
        assert tier == {1: "head", 2: "middle", 3: "tail"}[bucket]
    for src, members in by_src.items():
        depths = {b: 0 for b in (1, 2, 3)}
        for _, b, _ in members:
            depths[b] += 1
        assert depths == {1: 3, 2: 2, 3: 2}  # NTILE remainder to earlier tiers
        # the rare-token doc has the highest xent -> tail
        rare_id = max(m[0] for m in members)
        assert [m for m in members if m[0] == rare_id][0][1] == 3

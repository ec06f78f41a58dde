"""Text-analysis operators: token counting, language-ID heuristic, quality
scoring, document fingerprinting.  All pure column expressions (codegen) —
these run on every document of a 100 TB corpus, so no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofeed_spark.functions.parallel import parallel_floor
from gofeed_spark.functions.text import TOKEN_RE, normalized_text, re_tokens, ws_tokens

# Stopword marker sets for the portable language-ID heuristic.  Deliberately
# tiny and LIKE-based so the identical logic is expressible in ANSI SQL for
# the oracle; a real n-gram profile model would be a broadcast lookup table
# with the same plan shape.
_EN_MARKERS = (" the ", " and ", " of ")
_ES_MARKERS = (" el ", " la ", " los ", " de ")


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens_ws (whitespace) and n_tokens_re (regex word) columns.

    ``regexp_count`` counts matches without materializing the token array
    (regexp_extract_all + size allocates every token string just to throw
    it away — measurably slower on a full-corpus pass)."""
    t = F.col(text_col)
    ws = (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1).cast("int")
    return docs.withColumn("n_tokens_ws", ws).withColumn(
        "n_tokens_re", F.regexp_count(F.lower(t), F.lit(TOKEN_RE)).cast("int")
    )


def lang_id_expr(text_col: str = "text"):
    """Marker-based language guess — deterministic, SQL-portable."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    en_hits = sum(F.when(padded.contains(m), 1).otherwise(0) for m in _EN_MARKERS)
    es_hits = sum(F.when(padded.contains(m), 1).otherwise(0) for m in _ES_MARKERS)
    return (
        F.when(en_hits >= es_hits + 1, "en")
        .when(es_hits >= 1, "es")
        .otherwise("unknown")
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / word-shape quality features + a quality flag.

    punct_ratio  = chars outside [a-z0-9 ] (lower-cased) / total chars
    avg_word_len = non-space chars / whitespace tokens
    quality      = 'ok' unless too short or degenerate word shape
    """
    t = F.col(text_col)
    lower = F.lower(t)
    total = F.length(t).cast("double")
    nonspace = F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double")
    n_tokens = (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1).cast(
        "double"
    )
    punct = F.length(F.regexp_replace(lower, "[a-z0-9 ]", "")).cast("double")
    punct_ratio = F.round(punct / total, 6)
    avg_wl = F.round(nonspace / n_tokens, 6)
    quality = (
        F.when((n_tokens >= 5) & (avg_wl >= 2.0) & (avg_wl <= 12.0), "ok").otherwise("low")
    )
    return docs.select(
        "doc_id",
        punct_ratio.alias("punct_ratio"),
        avg_wl.alias("avg_word_len"),
        quality.alias("quality"),
    )


def winnowing_fingerprints(
    docs: DataFrame, k: int = 5, window: int = 4,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
    every k-gram, slide a window of ``window`` consecutive k-gram hashes,
    keep each window's minimum — guarantees any match of length
    >= k+window-1 shares a fingerprint, with ~2/(window+1) selection
    density.  The standard local-document-fingerprinting algorithm (the
    rolling-hash fingerprint the plain md5 ``fingerprint_expr``
    approximates globally).

    Plan: positional k-gram md5s (codegen) → running window MIN per doc →
    distinct.  One narrow shuffle on doc_id for the window; md5 hex keeps
    the hash oracle-expressible (lexicographic MIN agrees across engines).
    """
    docs = parallel_floor(docs)  # split-starved scans → serial regex/Arrow pass
    from pyspark.sql import Window as W

    # Materialize the token array as a projection column FIRST: referencing
    # the split(...) expression tree inside the transform lambda inlines it
    # and re-evaluates the split per k-gram (O(tokens²) per doc).
    with_toks = docs.select(
        F.col(id_col).alias("doc_id"), ws_tokens(text_col).alias("toks")
    )
    n = F.size("toks")
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = with_toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                idx, lambda i: F.md5(F.array_join(F.slice("toks", i, k), " "))
            )
        ).alias("pos", "h"),
    )
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    return (
        grams.select("doc_id", F.min("h").over(w).alias("fp"))
        .distinct()
    )


def fingerprint_expr(text_col: str = "text"):
    """Deterministic content fingerprint: md5 of the normalized text.

    (The reference has no fingerprinting; md5-of-normalized is the portable
    stand-in for a rolling hash — identical output in any engine.)
    """
    return F.md5(normalized_text(text_col).cast("binary"))


# PII patterns chosen for IDENTICAL semantics in Java regex (Spark) and
# RE2 (the DuckDB oracle): character classes, bounded repetition and \b
# only — no backrefs or lookaround (RE2 has neither).  Replacement order
# matters (email first: its local part can contain digit runs a later
# pattern could clip) and is part of the operator contract.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
)


def redact_pii(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII scrub for training corpora: emails/phones/IPv4s replaced by
    typed tokens, with per-class match counts (counted on the ORIGINAL
    text, before any replacement).  Returns (id, redacted, n_email,
    n_phone, n_ip).

    Pure column expressions — regexp_count + chained regexp_replace stay
    in whole-stage codegen, the mandatory shape for an every-document pass
    at 100 TB (same rule as the rest of this module).
    """
    docs = parallel_floor(docs)  # split-starved scans → serial regex/Arrow pass
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("int").alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    redacted = t
    for name, pat in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return docs.select(id_col, redacted.alias("redacted"), *counts)


# Gopher-style rule constants (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1): the word
# lengths, symbol ratios, bullet/ellipsis line fractions and stopword
# requirement used to filter MassiveWeb.  Kept as module constants so the
# oracle SQL and any caller agree on the exact thresholds.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_BULLET_PREFIXES = ("- ", "* ", "• ")
GOPHER_ELLIPSIS_SUFFIXES = ("...", "…")


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_stopwords: int = 2,
    stopwords: tuple = GOPHER_STOPWORDS,
    keep_cols: tuple = (),
) -> DataFrame:
    r"""Gopher-style repetition/format quality rules — the document-shape
    filters (distinct from q38's length gate) a web-scale pipeline applies
    before training: mean word length in [3,10], '#'/'…' symbol-to-word
    ratio <= 0.1, <= 90% of lines bullet-led, <= 30% of lines
    ellipsis-ended, and at least ``min_stopwords`` of the required
    ``stopwords`` present (defaults to Gopher's 8 English words — a
    language/corpus-specific knob, like the language-adapted lists real
    pipelines swap in).

    Returns (id, mean_wl, symbol_ratio, bullet_frac, ellipsis_frac,
    stop_hits, gopher_ok) with ratios rounded to 6 for hash stability;
    rule comparisons use the UNROUNDED values.

    ``keep_cols``: caller columns passed through to the output — this
    operator is a pure per-row projection, so a downstream that needs its
    own columns alongside the verdict composes them here instead of
    re-joining (and re-computing) its upstream subtree on ``id_col``.

    Everything is whole-stage codegen, and regex is almost gone (profiled
    in round 7 as this operator's constant-factor gap vs its oracle): the
    word count is ONE ``regexp_count(\S+)`` pass — no token-array
    materialization at all — and everything else is literal string ops:
    ``translate`` normalizes whitespace in one pass, non-space chars are
    a length-of-replace diff on it, and the stopword test is 8 literal
    ``contains`` probes of the space-padded normalized text (`` w ``
    present ⟺ token ``w`` present — exact distinct-membership semantics
    without building the token array).  Line arrays are materialized as
    projection columns BEFORE the filter lambdas reference them (an
    inlined split would re-evaluate per element).  No Python, no shuffle,
    one corpus pass.
    """
    docs = parallel_floor(docs)  # split-starved scans → serial regex/Arrow pass
    t = F.col(text_col)
    # Java \s = [ \t\n\x0B\f\r]; translate maps each to ' ' in one
    # literal pass.  Materialized as projection columns so the multiple
    # references below read, not re-evaluate.
    with_arrays = docs.select(
        F.col(id_col).alias("__id"),
        *keep_cols,  # caller pass-through (composition without a re-join)
        t.alias("__text"),
        F.translate(F.lower(t), "\t\n\x0b\f\r", "     ").alias("__wsnorm"),
        F.split(t, r"\n").alias("__lines"),
    )
    txt = F.col("__text")
    ws_norm = F.col("__wsnorm")
    # words = \S+ runs (greatest(...,1) keeps empty/all-ws docs at the
    # old 0.0 mean); counting runs skips the split's per-token allocs
    n_words = F.greatest(F.regexp_count(txt, F.lit(r"\S+")), F.lit(1)).cast(
        "double"
    )
    nonspace = F.length(F.replace(ws_norm, F.lit(" "), F.lit(""))).cast("double")
    mean_wl = nonspace / n_words
    n_symbols = (
        (F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit(""))))
        + (F.length(txt) - F.length(F.replace(txt, F.lit("…"), F.lit(""))))
    ).cast("double")
    symbol_ratio = n_symbols / n_words
    n_lines = F.size("__lines").cast("double")

    def _frac(pred):
        return F.size(F.filter(F.col("__lines"), pred)).cast("double") / n_lines

    def _bullet(line):
        out = F.lit(False)
        for p in GOPHER_BULLET_PREFIXES:
            out = out | line.startswith(p)
        return out

    def _ellipsis(line):
        out = F.lit(False)
        for s in GOPHER_ELLIPSIS_SUFFIXES:
            out = out | line.endswith(s)
        return out

    bullet_frac = _frac(_bullet)
    ellipsis_frac = _frac(_ellipsis)
    # distinct-stopword count as literal substring probes: token w is
    # present ⟺ ' w ' occurs in the space-padded whitespace-normalized
    # text (runs of spaces still contain ' w '); plain indexOf, no regex,
    # no token array
    padded = F.concat(F.lit(" "), ws_norm, F.lit(" "))
    hits = [
        F.contains(padded, F.lit(f" {s} ")).cast("int") for s in stopwords
    ]
    stop_hits = hits[0]
    for h in hits[1:]:
        stop_hits = stop_hits + h
    ok = (
        (mean_wl >= min_mean_wl)
        & (mean_wl <= max_mean_wl)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (stop_hits >= min_stopwords)
    )
    return with_arrays.select(
        F.col("__id").alias(id_col),
        *keep_cols,
        F.round(mean_wl, 6).alias("mean_wl"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        stop_hits.cast("int").alias("stop_hits"),
        ok.cast("int").alias("gopher_ok"),
    )


def remove_frequent_lines(
    docs: DataFrame,
    min_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    sep: str = "\n",
) -> DataFrame:
    """Line-level boilerplate removal (the CCNet/RefinedWeb preprocessing
    step): drop every line whose document frequency within its
    ``group_col`` (source/domain — boilerplate is per-site) reaches
    ``min_frac`` of the group's docs, and reassemble each doc in original
    line order.  Returns (id, clean_text, n_removed) for EVERY input doc.

    A line must appear in at least TWO docs to ever count as boilerplate
    (threshold = max(2, ceil(min_frac·n_docs))): without the floor, a
    1-doc group would have every unique line at df = 1 = 100% and the
    whole doc would vanish.

    Plan, sized for 100 TB: lines explode once; the frequency aggregation
    shuffles slim (group, xxhash64(line), doc_id) triples — never the
    line text; the surviving BOILERPLATE relation (df >= threshold) is
    tiny on organic corpora and joins a flag onto the corpus lines (AQE
    broadcasts it when small; a degenerate duplicate-heavy corpus falls
    back to a shuffle join), so the ONLY full-corpus shuffle is the single
    per-doc aggregation that reassembles the doc (array_sort over
    (pos, line) structs, kept lines only — collect_list drops the
    flagged ones as nulls) and counts removals in the same pass.  The
    threshold compares df >= ceil(min_frac * group_docs) in both this
    plan and the SQL oracle, so boundary groups agree exactly.
    """
    docs = parallel_floor(docs)  # split-starved scans → serial regex/Arrow pass
    import re as _re

    t = F.col(text_col)
    # F.split takes a REGEX; escape so any literal separator (including
    # metacharacters like '|') splits exactly where concat_ws rejoins
    lines = docs.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        F.posexplode(F.split(t, _re.escape(sep))).alias("pos", "line"),
    ).withColumn("__h", F.xxhash64("line"))
    gsize = docs.groupBy(F.col(group_col).alias("__g")).agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    freq = lines.groupBy("__g", "__h").agg(F.countDistinct("__id").alias("df"))
    boiler = (
        freq.join(gsize, "__g")
        .filter(
            F.col("df")
            >= F.greatest(F.lit(2), F.ceil(F.lit(min_frac) * F.col("n_docs")))
        )
        .select("__g", "__h", F.lit(1).alias("__b"))
    )
    # no forced broadcast: the boilerplate relation is typically tiny (a
    # site has few mastheads) and AQE broadcasts it when so — but this
    # operator runs BEFORE dedup, where a duplicate-heavy corpus can push
    # most distinct lines over the threshold; forcing a broadcast there
    # would OOM the driver instead of degrading to a shuffle join
    flagged = lines.join(boiler, ["__g", "__h"], "left")
    per_doc = flagged.groupBy("__id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__b").isNull(), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
        F.count("__b").cast("int").alias("n_removed"),
    )
    return (
        docs.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_removed", F.lit(0)).cast("int").alias("n_removed"),
        )
    )


def dup_ngram_char_fraction(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher duplicate-n-gram repetition metric (Rae et al. 2021): the
    fraction of a document's characters covered by word n-grams that occur
    more than once WITHIN the document (every occurrence of a duplicated
    n-gram contributes its character length; denominator = total chars).
    Catches looping generations and spammy phrase repetition that the
    type-token ratio (q85) smooths over.

    Computed in one Arrow mapInPandas pass — the per-token Counter loop is
    the documented exception to "stay JVM-side" (a sequence/slice HOF
    formulation is interpreted per element by Catalyst; see _doc_shingles
    in dedup.py for the measurement).  No shuffle: the corpus never moves,
    so the plan is identical at 100 TB.  Tokenization is lower-case \\s+
    split (the ws_tokens/oracle convention); the fraction is an exact
    integer ratio evaluated in ONE double division, so Spark and any
    oracle engine produce bit-identical values with no rounding step.
    """
    docs = parallel_floor(docs)  # split-starved scans → serial regex/Arrow pass
    import re

    id_type = docs.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, dup_ngram_frac double"

    def run(batches):
        from collections import Counter

        import pandas as pd

        ws = re.compile(r"\s+")
        for pdf in batches:
            ids, fracs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                total = len(text) if text else 0
                frac = 0.0
                if total:
                    toks = ws.split(text.lower())
                    if len(toks) >= n:
                        cnt = Counter(
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        )
                        dup = sum(len(g) * c for g, c in cnt.items() if c > 1)
                        frac = dup / total
                ids.append(did)
                fracs.append(frac)
            yield pd.DataFrame({id_col: ids, "dup_ngram_frac": fracs})

    return docs.select(id_col, text_col).mapInPandas(run, schema)


def unigram_logprob_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_xent_bits: float = 12.0,
    model: DataFrame | None = None,
) -> DataFrame:
    """Corpus-trained unigram LM quality score — the CCNet/KenLM filter
    shape (Wenzek et al. 2020) with the LM trained ON the corpus itself:
    per-doc cross-entropy (bits/token) under the corpus unigram
    distribution, plus a keep flag at ``max_xent_bits``.  High-entropy
    docs are gibberish/rare-token soup; the classic LM-perplexity filter
    uses an external 5-gram model, but the 1-gram self-trained variant
    needs no model artifact and is fully engine-checkable.

    Returns (id, n_tokens, xent_bits, keep) with xent rounded to 6.

    ``model``: a frozen frequency table from ``unigram_model`` (profile
    once on a reference corpus, score any later frame or micro-batch —
    the ``mixture_rates``/``mixture_filter`` split).  Default trains on
    ``docs`` itself.  A scored token absent from the model is dropped
    from the average (frozen-model semantics; the self-trained path
    never hits this).

    Posture: tokens explode ONCE into slim (doc_id, xxhash64(token))
    rows; the frequency table aggregates map-side-combined on the 8-byte
    key (vocabulary is sublinear in corpus size), the scalar total rides
    a broadcast, and the score join is an ordinary equi-join AQE
    broadcasts when the vocab is small.  No Python anywhere.
    """
    docs = parallel_floor(docs)  # split-starved scans → serial regex/Arrow pass
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(ws_tokens(text_col)).alias("__tok"),
    ).select("__id", F.xxhash64("__tok").alias("__h"))
    freq = model if model is not None else toks.groupBy("__h").agg(
        F.count("*").alias("__c")
    )
    tot = freq.agg(F.sum("__c").alias("__T"))
    scored = (
        toks.join(freq, "__h")
        .crossJoin(F.broadcast(tot))
        .groupBy("__id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            (-F.avg(F.log2(F.col("__c").cast("double") / F.col("__T")))).alias(
                "__xent"
            ),
        )
    )
    return scored.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        F.round("__xent", 6).alias("xent_bits"),
        (F.col("__xent") <= max_xent_bits).cast("int").alias("keep"),
    )


def bigram_logprob_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_xent_bits: float = 8.0,
) -> DataFrame:
    """Bigram twin of ``unigram_logprob_score``: per-doc cross-entropy in
    bits/bigram under the corpus CONDITIONAL bigram model
    p(w₂|w₁) = c(w₁w₂)/c(w₁·), where c(w₁·) counts w₁ as a bigram left
    context.  Catches locally-incoherent text (shuffled words, template
    stitching) that unigram frequencies score as fluent.  Docs with < 2
    tokens have no bigrams and are dropped — compose with the unigram
    score, which covers them.

    Returns (id, n_bigrams, xent2_bits, keep).

    Posture: the token stream explodes ONCE with positions; bigrams form
    by joining the stream to itself shifted by one — implemented as a
    projection over ``slice``d token arrays, so the only wide plans are
    the two count aggregates (8-byte hashed keys, map-side combinable)
    and the slim score joins.
    """
    docs = parallel_floor(docs)  # split-starved scans → serial regex/Arrow pass
    toks = docs.select(
        F.col(id_col).alias("__id"), ws_tokens(text_col).alias("__t")
    ).filter(F.size("__t") >= 2)
    # (doc, left-hash, pair-hash) per bigram: transform over index range
    # keeps everything in one projection (arrays materialized first —
    # the inlined-lambda re-evaluation trap)
    pairs = toks.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__t") - 1),
                lambda i: F.struct(
                    F.xxhash64(F.element_at("__t", i)).alias("h1"),
                    F.xxhash64(
                        F.element_at("__t", i), F.element_at("__t", i + 1)
                    ).alias("h12"),
                ),
            )
        ).alias("bg"),
    ).select("__id", F.col("bg.h1").alias("__h1"), F.col("bg.h12").alias("__h12"))
    c12 = pairs.groupBy("__h12").agg(F.count("*").alias("__c12"))
    c1 = pairs.groupBy("__h1").agg(F.count("*").alias("__c1"))
    scored = (
        pairs.join(c12, "__h12")
        .join(c1, "__h1")
        .groupBy("__id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            (
                -F.avg(
                    F.log2(F.col("__c12").cast("double") / F.col("__c1"))
                )
            ).alias("__x"),
        )
    )
    return scored.select(
        F.col("__id").alias(id_col),
        "n_bigrams",
        F.round("__x", 6).alias("xent2_bits"),
        (F.col("__x") <= max_xent_bits).cast("int").alias("keep"),
    )


def unigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The frozen corpus unigram model for ``unigram_logprob_score``'s
    ``model`` param: (token-hash, count).  Profile once on a reference
    corpus (persist or write it), then score later frames / streaming
    micro-batches against it — scores stay comparable across batches
    because the distribution no longer drifts with the batch."""
    return (
        docs.select(F.explode(ws_tokens(text_col)).alias("__tok"))
        .select(F.xxhash64("__tok").alias("__h"))
        .groupBy("__h")
        .agg(F.count("*").alias("__c"))
    )


def keyword_classify(
    docs: DataFrame,
    taxonomy: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    default: str = "other",
) -> DataFrame:
    """Rule-based topic tagging — the cheap classifier-apply shape of a
    curation pipeline (domain tagging before mixture weighting; a learned
    classifier deploys as the same plan with a model UDF): per label,
    count how many of its keywords appear as TOKENS in the doc; assign
    the label with the most hits, ties broken lexicographically, no hits
    → ``default``.

    Returns (id, label, label_hits).  One projection pass: the token
    array materializes once, each label's score is an unrolled
    array_contains sum (taxonomies are tens of labels × tens of keywords
    — comfortably codegen; a 10⁵-keyword taxonomy would switch to an
    explode + broadcast keyword join with the same output contract).
    """
    docs = parallel_floor(docs)  # split-starved scans → serial regex/Arrow pass
    toks_df = docs.select(
        F.col(id_col).alias("__id"), ws_tokens(text_col).alias("__toks")
    )
    scores = {
        label: sum(
            F.when(F.array_contains("__toks", kw), 1).otherwise(0)
            for kw in kws
        ).cast("int")
        for label, kws in sorted(taxonomy.items())
    }
    # best = max hits, lexicographic tiebreak: fold labels in REVERSE order
    # so an equal-score earlier label overwrites a later one
    best_label, best_hits = F.lit(default), F.lit(0)
    for label in sorted(scores, reverse=True):
        s = scores[label]
        cond = s >= F.greatest(best_hits, F.lit(1))
        best_label = F.when(cond, F.lit(label)).otherwise(best_label)
        best_hits = F.when(cond, s).otherwise(best_hits)
    return toks_df.select(
        F.col("__id").alias(id_col),
        best_label.alias("label"),
        best_hits.alias("label_hits"),
    )


def relative_length_filter(
    docs: DataFrame,
    lo: float = 0.05,
    hi: float = 0.95,
    len_col: str = "n_chars",
    source_col: str = "source",
    id_col: str = "doc_id",
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """ADAPTIVE length filtering — per-source percentile bounds instead of
    one global threshold (the FineWeb lesson: absolute thresholds tuned on
    one source mis-filter another; a code corpus and a news corpus have
    different length norms).  Keeps docs inside [p_lo, p_hi] of their OWN
    source's length distribution.

    Returns (id, source, length, lo_bound, hi_bound, keep); bounds are
    exact interpolated percentiles (rounded to 4 for output stability;
    the keep comparison uses unrounded values).

    Posture: one map-side-combinable percentile aggregate to a
    |sources|-row bounds table that broadcasts back — the corpus pays a
    scan + broadcast join, no shuffle of doc rows.  Exact percentile
    state is O(rows per source) on the agg side; ``approx=True`` swaps in
    ``percentile_approx`` (Greenwald-Khanna sketch — state O(accuracy),
    rank error ≤ 1/accuracy regardless of per-source volume), the setting
    for extreme per-source row counts.  Same plan either way.
    """
    ln = F.col(len_col).cast("double")
    if approx:
        p_lo = f"percentile_approx({len_col}, {lo}, {int(accuracy)})"
        p_hi = f"percentile_approx({len_col}, {hi}, {int(accuracy)})"
    else:
        p_lo = f"percentile({len_col}, {lo})"
        p_hi = f"percentile({len_col}, {hi})"
    bounds = docs.groupBy(source_col).agg(
        F.expr(p_lo).cast("double").alias("__lo"),
        F.expr(p_hi).cast("double").alias("__hi"),
    )
    keep = (ln >= F.col("__lo")) & (ln <= F.col("__hi"))
    return (
        docs.join(F.broadcast(bounds), source_col)
        .select(
            F.col(id_col),
            F.col(source_col),
            F.col(len_col).cast("int").alias("length"),
            F.round("__lo", 4).alias("lo_bound"),
            F.round("__hi", 4).alias("hi_bound"),
            keep.cast("int").alias("keep"),
        )
    )


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_ratio: float = 0.25,
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio per doc — the classic templated/degenerate
    text detector (highly repetitive text compresses far below natural
    prose; used alongside the Gopher rules in web-corpus stacks): ratio =
    deflate(utf8(text)) / len(utf8(text)), ``keep`` = ratio >= min_ratio
    (empty docs ratio 0, dropped by keep).  Deterministic for a fixed
    zlib level — stable across runs and re-shards, but NOT
    SQL-expressible, so this ships with unit + property tests instead of
    a DuckDB oracle (the one operator class where that trade is right).

    One no-shuffle Arrow mapInPandas pass (zlib is C); ratio rounded to 6.
    """
    docs = parallel_floor(docs)  # split-starved scans → serial regex/Arrow pass
    import zlib

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, ratios = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                r = (len(zlib.compress(raw, level)) / len(raw)) if raw else 0.0
                ids.append(did)
                ratios.append(round(r, 6))
            if ids:
                yield pd.DataFrame({id_col: ids, "ratio": ratios})

    idt = docs.schema[id_col].dataType.simpleString()
    out = docs.select(id_col, text_col).mapInPandas(
        run, f"{id_col} {idt}, ratio double"
    )
    return out.select(
        id_col, "ratio", (F.col("ratio") >= min_ratio).cast("int").alias("keep")
    )


def perplexity_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    n_buckets: int = 3,
    model: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): rank
    every document within its ``group_col`` group (CCNet: language; here:
    source) by LM cross-entropy and cut the group into ``n_buckets``
    equal-depth tiers — head (lowest perplexity, cleanest), middle, tail.
    Training mixtures keep head+middle and drop or down-weight tail; the
    tier label is the downstream mixture key (``mixing.mixture_sample``).

    Determinism contract: the tier window orders by the ROUNDED score
    (``xent_bits``, 6 decimals — the grid q104 already hash-matches
    cross-engine) with id tiebreak, so boundaries are reproducible in any
    engine; NTILE's earlier-buckets-take-the-remainder split is the
    standard SQL semantics on both sides.

    Posture: one unigram-score pass (see ``unigram_logprob_score``:
    slim hashed-token explode, map-side-combined vocab, broadcast
    total), then a single window shuffle partitioned by the group key.
    Group count is small (languages/sources) but groups are corpus-sized,
    so the per-group sort is the cost — the same sort CCNet itself pays
    per language shard.  At extreme scale swap the exact NTILE for
    approx-quantile cutoffs + a projection (loses exact equal-depth).
    """
    from pyspark.sql import Window as W

    scored = unigram_logprob_score(
        docs, text_col=text_col, id_col=id_col, model=model
    ).select(id_col, "n_tokens", "xent_bits")
    meta = docs.select(id_col, group_col)
    w = W.partitionBy(group_col).orderBy("xent_bits", id_col)
    bucket = F.ntile(n_buckets).over(w)
    tier = (
        F.when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") == n_buckets, "tail")
        .otherwise("middle")
        if n_buckets == 3
        else F.concat(F.lit("q"), F.col("bucket").cast("string"))
    )
    return (
        scored.join(meta, id_col)
        .withColumn("bucket", bucket)
        .select(id_col, group_col, "xent_bits", "bucket", tier.alias("tier"))
    )

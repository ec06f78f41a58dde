"""Dataset mixing: deterministic weighted down-sampling of sources to a
target mixture — the step that turns N crawled/curated sources into ONE
training corpus with chosen proportions (the Pile/Dolma/DoReMi recipe
shape).

Reference scope note: the reference engine (a change-feed poller) has no
mixing surface; this module belongs to the added LLM-pipeline surface
(SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gofeed_spark.functions.text import ws_tokens


def _keep_hash(id_col: str, salt: str):
    """The content-addressed keep decision (md5 of the salted id, the q81
    convention) — one function so the batch sampler and the streaming
    filter can never drift apart."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )


def mixture_rates(
    docs: DataFrame,
    weight_expr: Column,
    budget_frac: float = 0.6,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source acceptance rates (source, rate) for ``mixture_sample``'s
    formula — tiny (|sources| rows); collect it once from a profile
    corpus and hand the dict to ``mixture_filter`` at ingest time."""
    toks = F.size(ws_tokens(text_col))
    base = docs.select(source_col, toks.alias("__t"), weight_expr.alias("__w"))
    per_src = base.groupBy(source_col).agg(
        F.max("__w").alias("__w"), F.sum("__t").alias("__src_toks")
    )
    totals = per_src.agg(
        F.sum("__src_toks").alias("__T"), F.sum("__w").alias("__W")
    )
    # totals derives from per_src, so the cross join is a self-join: alias
    # both sides or attribute resolution sees two lineages for __w
    return (
        per_src.alias("p")
        .crossJoin(F.broadcast(totals.alias("g")))
        .select(
            F.col("p." + source_col).alias(source_col),
            F.least(
                F.lit(1.0),
                F.lit(budget_frac)
                * F.col("g.__T")
                * F.col("p.__w")
                / F.col("g.__W")
                / F.col("p.__src_toks"),
            ).alias("rate"),
        )
    )


def mixture_filter(
    docs: DataFrame,
    rates: dict,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "m",
) -> DataFrame:
    """Apply precomputed per-source rates (``mixture_rates`` collected to a
    dict) as a stateless projection — works identically on a static frame
    or a readStream (the ingest-time mixing filter: no join, no state, no
    shuffle; rates ride the plan as a literal map).  Same hash, same
    comparison as ``mixture_sample``, so the kept set is identical."""
    pairs: list = []
    for src, rate in sorted(rates.items()):
        pairs.extend([F.lit(src), F.lit(float(rate))])
    rate = F.element_at(F.create_map(*pairs), F.col(source_col))
    return (
        docs.withColumn("rate", rate)
        .filter(
            F.col("rate").isNotNull()
            & (_keep_hash(id_col, salt).cast("double") < F.col("rate") * 1_000_000)
        )
        .select(id_col, source_col, "rate")
    )


def mixture_sample(
    docs: DataFrame,
    weight_expr: Column,
    budget_frac: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "m",
) -> DataFrame:
    """Sample each source at the rate that hits its target mixture share.

    Given per-source weights ``weight_expr`` (any integer expression over
    the source row; normalized internally) and a global token budget of
    ``budget_frac`` × the corpus total, each source s with token mass T_s
    gets acceptance rate  min(1, budget·share_s / T_s)  — sources smaller
    than their target share keep everything (rate clips at 1: sampling
    without replacement cannot upsample; the shortfall is reported via the
    emitted rate so a caller can re-weight or replicate).

    The keep decision is content-addressed (md5 of the salted id, the q81
    convention), so the sample is reproducible across engines, runs, and
    re-shards.  Plan, sized for 100 TB: one tiny per-source aggregation
    (|sources| rows) + one 1-row total, broadcast back onto the corpus —
    the corpus itself pays a single filter pass, no shuffle.  The rate
    arithmetic is a fixed left-associative chain over exact integers, so
    any engine computes bit-identical doubles.

    Returns (id, source, rate) for every kept doc.
    """
    rates = mixture_rates(
        docs, weight_expr, budget_frac, text_col=text_col, source_col=source_col
    )
    return (
        docs.select(id_col, source_col)
        .join(F.broadcast(rates), source_col)
        .filter(
            _keep_hash(id_col, salt).cast("double") < F.col("rate") * 1_000_000
        )
        .select(id_col, source_col, "rate")
    )


def source_cap(
    docs: DataFrame,
    cap: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "c",
) -> DataFrame:
    """EXACT per-source document cap (the RefinedWeb/CCNet per-domain
    quota): keep at most ``cap`` docs per source, chosen content-addressed
    — rank within each source by md5(salted id) and keep the first
    ``cap``.  The selection is a property of the ids alone, so it is
    reproducible across engines, re-shards, and re-runs, and adding NEW
    sources never changes which docs survive in old ones (``mixture_*``
    is the rate-based sibling; this is the hard-quota one).

    Returns docs' rows with a ``keep`` bit (filter upstream, audit
    downstream).  Posture: ONE hash-partitioned sort per source via a
    window — no per-group buffering (row_number is streaming over the
    sorted run, Spark's sort spills), so a mega-source costs an external
    sort of its own rows, never memory.  The md5 tiebreak makes ranks
    unique for distinct ids; duplicate ids tie-break on the id itself.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(h, F.col(id_col))
    return docs.withColumn(
        "keep", (F.row_number().over(w) <= cap).cast("int")
    )


def dsir_model(
    docs: DataFrame, target: Column, text_col: str = "text"
) -> DataFrame:
    """The frozen DSIR importance model: one row per token hash with its
    full-corpus count and its target-sub-corpus count — (__h, __cs,
    __ct nullable).  Profile ONCE on a reference corpus (persist or
    write it), then ``dsir_score`` any later frame or streaming
    micro-batch against it: frozen weights keep scores comparable
    across batches (the ``unigram_model`` convention).

    ``target`` is a boolean Column over ``docs`` selecting the target
    sub-corpus (e.g. ``F.col("lang") == "en"``).
    """
    from gofeed_spark.functions.parallel import parallel_floor

    docs = parallel_floor(docs)
    toks = docs.select(
        target.alias("__tgt"),
        F.explode(ws_tokens(text_col)).alias("__tok"),
    ).select("__tgt", F.xxhash64("__tok").alias("__h"))
    cs = toks.groupBy("__h").agg(F.count("*").alias("__cs"))
    ct = (
        toks.filter(F.col("__tgt"))
        .groupBy("__h")
        .agg(F.count("*").alias("__ct"))
    )
    return cs.join(ct, "__h", "left")


def dsir_score(
    docs: DataFrame,
    model: DataFrame,
    cut: float | None = None,
    quantile: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score ``docs`` against a frozen ``dsir_model``:

        lr(d) = avg_tokens log2( p_t(w) / p_s(w) )
        p_x(w) = (c_x(w) + 1) / (T_x + V)      (add-one over joint vocab)

    Tokens absent from the model score with both counts 0 — exactly what
    the add-one smoothing is for (frozen-model semantics; a self-trained
    model never hits this).  The three scalars (T_t, T_s, V) are read
    off the vocab-sized model up front (one tiny job at construction)
    and travel as literals, so the scorer works unchanged inside a
    foreachBatch micro-batch.

    ``cut``: an explicit keep threshold (the frozen, arrival-invariant
    streaming form — freeze it from the training corpus's quantile); or
    None to cut at this frame's own exact ``quantile`` (batch form).
    Both sides of the comparison round to 6 so the keep bit is
    hash-stable.  The exact ``percentile`` buffers per-doc scores on one
    reducer — engine-checkable here; at 100 TB use approx_percentile or
    a frozen ``cut``.

    Returns (id, n_tokens, log_ratio_bits, keep) ordered by id.
    """
    srow = model.agg(
        F.sum("__cs").alias("s"), F.sum("__ct").alias("t"), F.count("*").alias("v")
    ).collect()[0]
    Ts, Tt, V = float(srow["s"] or 0), float(srow["t"] or 0), float(srow["v"])
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(ws_tokens(text_col)).alias("__tok"),
    ).select("__id", F.xxhash64("__tok").alias("__h"))
    lr = F.log2(
        ((F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(1.0)) / F.lit(Tt + V))
        / ((F.coalesce(F.col("__cs"), F.lit(0)) + F.lit(1.0)) / F.lit(Ts + V))
    )
    scored = (
        toks.join(model, "__h", "left")
        .groupBy("__id")
        .agg(F.count("*").cast("int").alias("n_tokens"), F.avg(lr).alias("__lr"))
    )
    if cut is None:
        cut_df = scored.agg(
            F.round(F.expr(f"percentile(__lr, {quantile!r})"), 6).alias("__q")
        )
        scored = scored.crossJoin(F.broadcast(cut_df))
    else:
        scored = scored.withColumn("__q", F.lit(round(cut, 6)))
    return scored.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        F.round("__lr", 6).alias("log_ratio_bits"),
        (F.round("__lr", 6) >= F.col("__q")).cast("int").alias("keep"),
    ).orderBy(id_col)


def dsir_select(
    docs: DataFrame,
    target: Column,
    quantile: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-shaped data selection (Xie et al. 2023, arXiv:2302.03169),
    self-trained: score every document by how much more likely its
    tokens are under the TARGET language model than under the
    full-corpus source model, keep the top ``1 - quantile`` fraction.
    DSIR's hashed-ngram features reduce to unigrams here so the score is
    fully engine-checkable; the paper's Gumbel resampling is replaced by
    a deterministic exact-quantile cut.  ``dsir_model`` + ``dsir_score``
    are the split (train-once / score-streams) form.

    Posture: the same slim plan as unigram_logprob_score — tokens
    explode ONCE into 8-byte hashed keys, both count relations aggregate
    map-side-combined, the scalars travel as literals, the score join is
    an ordinary equi-join.
    """
    from gofeed_spark.functions.parallel import parallel_floor

    docs = parallel_floor(docs)
    return dsir_score(
        docs,
        dsir_model(docs, target, text_col),
        cut=None,
        quantile=quantile,
        text_col=text_col,
        id_col=id_col,
    )

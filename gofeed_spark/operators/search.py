"""Keyword retrieval over the corpus: BM25 scoring — the standard lexical
ranking function (Robertson/Sparck Jones probabilistic model, the Lucene
default), here as a distributed one-pass scorer for corpus exploration and
query-based subsetting of a training corpus.

Reference scope note: the reference engine has no retrieval surface; this
module belongs to the added LLM-pipeline surface (SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gofeed_spark.functions.parallel import parallel_floor

from gofeed_spark.functions.text import re_tokens, ws_tokens


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 score of every document containing at least one query term.

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·|d|/avgdl))
        idf(t)   = ln((N − df + 0.5)/(df + 0.5) + 1)      (Lucene's form)

    Plan, sized for 100 TB: the corpus pays ONE scan; only tokens matching
    the (tiny, broadcast-literal) term list explode into the tf
    aggregation, so the shuffle carries hits — not the corpus; document
    frequency and the (N, avgdl) corpus stats are two map-side-combinable
    aggregates whose outputs broadcast back onto the hit relation.  The
    float chain is fixed left-associative so any engine computes the same
    doubles (score rounded to 6 after the per-doc sum).

    Returns (id, score), one row per matching doc.
    """
    docs = parallel_floor(docs)  # split-starved scans → serial Arrow/regex pass
    base = docs.select(
        F.col(id_col).alias("doc_id"), ws_tokens(text_col).alias("__toks")
    ).withColumn("len_d", F.size("__toks"))
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("len_d").cast("double")).alias("avgdl"),
    )
    hits = base.select(
        "doc_id", "len_d", F.explode("__toks").alias("tok")
    ).filter(F.col("tok").isin(list(terms)))
    tf = hits.groupBy("doc_id", "len_d", "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.alias("t").join(F.broadcast(dfreq.alias("d")), "tok").crossJoin(
        F.broadcast(stats.alias("g"))
    )
    # the contribution expression is shared with probe_bm25_index so the
    # full-scan and index-probe float chains cannot drift apart
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum(_bm25_contrib(k1, b)), 6).alias("score"))
        .select(F.col("doc_id").alias(id_col), "score")
    )


def tfidf_keywords(
    docs: DataFrame,
    top_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF keywords per document — the standard per-doc keyword
    metadata a curation pipeline attaches before routing/sampling.

        score(t, d) = tf(t, d) · (ln((N + 1)/(df(t) + 1)) + 1)

    (the smoothed sklearn form, so unseen-token idf stays finite).

    Plan, sized for 100 TB: the corpus pays ONE tokenizing scan; tf is a
    map-side-combinable count on (doc, token); document frequency is a
    second partial-agg over the already-distinct tf relation.  The df
    relation scales with the VOCABULARY, so it is NOT broadcast — the
    tf⋈df join shuffles on the token key (AQE handles the head-word
    skew: it is a bare count join, no row explosion).  Only the corpus
    count N (one row) broadcasts.  Rank ties break on the token string,
    which both engines compare bytewise (ASCII-only tokens).

    Returns (id, rank, token, score) with score rounded to 6, top_k rows
    per doc, ordered by (id, rank).
    """
    docs = parallel_floor(docs)  # split-starved scans → serial tokenize pass
    base = docs.select(
        F.col(id_col).alias("doc_id"), re_tokens(text_col).alias("__toks")
    )
    nd = base.agg(F.count("*").alias("n_docs"))
    tf = (
        base.select("doc_id", F.explode("__toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        # tf feeds BOTH the df aggregation and the score join: without
        # the persist the tokenize+explode+agg subtree executes twice and
        # AQE (planning from estimates) broadcast the corpus-sized tf as
        # the join build side (profiled: 1.16M-row broadcast, 9.5 s at
        # sf1.0 vs 7.0 persisted).  Spills under pressure; at warehouse
        # scale materialize it as a table instead.
        # NOTE (r17 advice): the returned frame is lazy, so there is no
        # eager unpersist path — each distinct input frame adds one
        # persisted subtree for the session's lifetime.  This is a known,
        # accepted exception to the ivf-style persisted-frames leak
        # invariant (do not extend that regression test to cover it);
        # long-lived serving sessions should call
        # spark.catalog.clearCache() between corpora or use the bm25
        # build (which unpersists after its writes).
        .persist()
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "token").crossJoin(F.broadcast(nd))
    score = F.col("tf") * (
        F.log(
            (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
        )
        + F.lit(1.0)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("__score"), F.asc("token")
    )
    return (
        scored.withColumn("__score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("doc_id").alias(id_col),
            F.col("rank"),
            "token",
            F.round("__score", 6).alias("score"),
        )
        .orderBy(id_col, "rank")
    )


# --- persisted BM25 index -----------------------------------------------------
# The lexical-retrieval member of the persisted-index family (MinHash =
# near-dup, SRP/IVF = vectors, k-means = semantic): pay one corpus scan
# at build time, then every keyword probe reads only the term buckets it
# touches instead of re-scanning the corpus.

_BM25_KIND = "bm25_v1"


def _term_bucket_py(token: str, n_hex: int = 2) -> str:
    """Driver-side twin of the build's bucket expression (md5 prefix —
    computable identically in Python and Spark SQL, the _keep_hash
    convention)."""
    import hashlib

    return "t" + hashlib.md5(token.encode()).hexdigest()[:n_hex]


def _term_bucket_col(tok_col, n_hex: int = 2):
    return F.concat(F.lit("t"), F.substring(F.md5(tok_col), 1, n_hex))


def _bm25_contrib(k1: float, b: float):
    """The BM25 per-(doc, term) contribution as a Column over columns
    (tf, df, len_d, n_docs, avgdl) — ONE definition shared by the
    full-scan scorer and the index probe, so their float chains cannot
    drift apart."""
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("len_d") / F.col("avgdl")
    )
    return idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom


def build_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the BM25 posting layout: the (token, doc, tf, len_d)
    relation and the (token, df) relation, both partitioned by a 256-way
    md5 term bucket so a probe's term set prunes to its buckets at plan
    time; corpus stats (N, avgdl — exact JSON round-trip) live in the
    meta, written LAST (the index-family commit point)."""
    from gofeed_spark.fs import get_filesystem
    from gofeed_spark.operators.similarity import _write_index_meta
    from gofeed_spark.sources.io import write_partitioned

    docs = parallel_floor(docs)
    base = docs.select(
        F.col(id_col).alias("doc_id"), ws_tokens(text_col).alias("__toks")
    ).withColumn("len_d", F.size("__toks"))
    srow = base.agg(
        F.count("*").alias("n"), F.avg(F.col("len_d").cast("double")).alias("a")
    ).collect()[0]
    if not srow["n"]:
        raise ValueError("cannot build a bm25 index over an empty corpus")
    tf = (
        base.select("doc_id", "len_d", F.explode("__toks").alias("tok"))
        .groupBy("doc_id", "len_d", "tok")
        .agg(F.count("*").alias("tf"))
        .withColumn("tb", _term_bucket_col(F.col("tok")))
        # tf feeds its own partitioned write AND the df aggregation —
        # persisted, the tokenize+explode+count subtree runs once instead
        # of twice (build-time only; unpersisted after the writes)
        .persist()
    )
    dfreq = (
        tf.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .withColumn("tb", _term_bucket_col(F.col("tok")))
    )
    fs = get_filesystem(path)
    write_partitioned(
        tf.repartition("tb"), fs.spark_path(fs.join(path, "tf")),
        partition_by=["tb"],
    )
    write_partitioned(
        dfreq.repartition("tb"), fs.spark_path(fs.join(path, "df")),
        partition_by=["tb"],
    )
    tf.unpersist()
    _write_index_meta(
        path,
        {
            "kind": _BM25_KIND,
            "n_docs": int(srow["n"]),
            "avgdl": float(srow["a"]),
            "id_col": id_col,
        },
    )


def probe_bm25_index(
    spark,
    path: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 scores for ``terms`` off the persisted layout — NO corpus
    scan: the tf/df reads partition-prune to the terms' md5 buckets
    (PartitionFilters) and push the term equality into the pruned scan
    (PushedFilters); corpus stats ride as literals from the meta.  Score
    doubles equal the full-scan ``bm25_scores`` bit-for-bit (shared
    contribution expression, exact-round-trip stats)."""
    from gofeed_spark.fs import get_filesystem
    from gofeed_spark.operators.similarity import _index_matches

    meta = _index_matches(path, {"kind": _BM25_KIND})
    if meta is None:
        raise ValueError(f"no completed bm25 index at {path}")
    fs = get_filesystem(path)
    terms = sorted(set(terms))
    buckets = sorted({_term_bucket_py(t) for t in terms})
    tf = (
        spark.read.parquet(fs.spark_path(fs.join(path, "tf")))
        .filter(F.col("tb").isin(buckets) & F.col("tok").isin(terms))
    )
    dfreq = (
        spark.read.parquet(fs.spark_path(fs.join(path, "df")))
        .filter(F.col("tb").isin(buckets) & F.col("tok").isin(terms))
        .select("tok", "df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .withColumn("n_docs", F.lit(meta["n_docs"]))
        .withColumn("avgdl", F.lit(meta["avgdl"]))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum(_bm25_contrib(k1, b)), 6).alias("score"))
        .select(F.col("doc_id").alias(meta["id_col"]), "score")
    )


# --- ingest-time scoring against frozen stats ---------------------------------
# The dsir_model/dsir_score convention applied to lexical retrieval:
# freeze the corpus statistics once (the persisted index's meta + df
# relation), then score arriving frames / foreachBatch micro-batches with
# those stats as constants — per-doc tf is batch-local, so the drained
# union over any batching equals the one-shot batch scorer exactly.


def bm25_score_docs(
    spark,
    docs: DataFrame,
    path: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """BM25 scores for the documents IN ``docs`` (an arriving frame or a
    foreachBatch micro-batch) against the FROZEN stats of the persisted
    index at ``path``: n_docs/avgdl ride as literals from the meta, df
    for the probe terms comes from one partition-pruned read of the df
    relation (<= len(terms) rows, broadcast), and tf is computed from the
    batch itself.  Shares ``_bm25_contrib`` with the batch scorers, so
    when the frozen stats were built on the same corpus the drained
    per-doc scores equal ``bm25_scores`` bit-for-bit regardless of how
    the stream was batched (streaming-equals-batch test).  A term absent
    from the frozen df scores with df=0 (the smoothed idf's job —
    frozen-model semantics, the dsir_score convention)."""
    from gofeed_spark.fs import get_filesystem
    from gofeed_spark.operators.similarity import _index_matches

    meta = _index_matches(path, {"kind": _BM25_KIND})
    if meta is None:
        raise ValueError(f"no completed bm25 index at {path}")
    fs = get_filesystem(path)
    terms = sorted(set(terms))
    buckets = sorted({_term_bucket_py(t) for t in terms})
    dfreq = (
        spark.read.parquet(fs.spark_path(fs.join(path, "df")))
        .filter(F.col("tb").isin(buckets) & F.col("tok").isin(terms))
        .select("tok", "df")
    )
    base = docs.select(
        F.col(meta["id_col"]).alias("doc_id"), ws_tokens(text_col).alias("__toks")
    ).withColumn("len_d", F.size("__toks"))
    hits = base.select(
        "doc_id", "len_d", F.explode("__toks").alias("tok")
    ).filter(F.col("tok").isin(terms))
    tf = hits.groupBy("doc_id", "len_d", "tok").agg(F.count("*").alias("tf"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok", "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
        .withColumn("n_docs", F.lit(meta["n_docs"]))
        .withColumn("avgdl", F.lit(meta["avgdl"]))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum(_bm25_contrib(k1, b)), 6).alias("score"))
        .select(F.col("doc_id").alias(meta["id_col"]), "score")
    )


def tfidf_model(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, int]:
    """The frozen TF-IDF statistics: (df relation (token, df), n_docs) —
    profile once on a reference corpus (persist or write the relation),
    then ``tfidf_keywords_score`` any later frame or micro-batch against
    it.  The df relation is VOCABULARY-scaled, so it stays a DataFrame
    (shuffle-joined by the scorer), never a collected literal — the
    dsir_model convention."""
    docs = parallel_floor(docs)
    base = docs.select(re_tokens(text_col).alias("__toks"))
    n_docs = base.count()
    dfreq = (
        base.select(F.explode(F.array_distinct("__toks")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    return dfreq, n_docs


def tfidf_keywords_score(
    docs: DataFrame,
    model: tuple[DataFrame, int],
    top_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF keywords for the documents IN ``docs`` against a
    FROZEN ``tfidf_model``: per-doc tf is batch-local, df/N come from the
    model, so scores are arrival-invariant and the drained union over any
    batching equals ``tfidf_keywords`` on the same corpus when the model
    was frozen on it (streaming-equals-batch test).  Unseen tokens take
    df=0 — the smoothed idf keeps them finite (frozen-model
    semantics)."""
    dfreq, n_docs = model
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(re_tokens(text_col)).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    score = F.col("tf") * (
        F.log(
            (F.lit(float(n_docs)) + F.lit(1.0))
            / (F.coalesce(F.col("df"), F.lit(0)) + F.lit(1.0))
        )
        + F.lit(1.0)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("__score"), F.asc("token"))
    return (
        tf.join(dfreq, "token", "left")
        .withColumn("__score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("doc_id").alias(id_col),
            F.col("rank"),
            "token",
            F.round("__score", 6).alias("score"),
        )
        .orderBy(id_col, "rank")
    )

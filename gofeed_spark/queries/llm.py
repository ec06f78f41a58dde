"""LLM-data-pipeline queries: dedup (Q27/Q28 + MinHash/SimHash/Jaccard),
text analysis (Q29/Q30 + token/lang/quality/fingerprint), similarity search
(Q34 + pair ranking + LSH), multimodal plumbing, centroids (Q35).

Exact/deterministic operators carry a DuckDB oracle; the approximate LSH
variants (whose outputs depend on engine-internal hashing) are registered
without one → the driver applies the rows-only check, and the exact twins
cover correctness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gofeed_spark.catalog import load_table
from gofeed_spark.functions.ranking import with_rank
from gofeed_spark.functions.text import ws_tokens
from gofeed_spark.operators import bpe, dedup, multimodal, similarity, textstats
from gofeed_spark.queries.registry import query


def T(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- Q27 exact dup groups ---------------------------------------------------
@query(
    "q27_dedup_exact",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 50 = 3
)
SELECT text, COUNT(*) AS n, MIN(doc_id) AS keep_id FROM corpus
GROUP BY text HAVING COUNT(*) > 1 ORDER BY keep_id
""",
)
def q27(spark, sf_dir):
    """Exact dup groups over documents PLUS planted clones (the %50=3
    residue class re-appended under offset ids) — the synthetic corpus
    has ZERO byte-identical texts at sf0.01, so a broken groupBy that
    returned nothing would have 'passed' against the empty oracle (the
    r16 non-vacuity audit's second catch, after q14); planting scales
    with SF and leaves natural dup groups (higher SFs) in the result."""
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    clones = d.filter(F.col("doc_id") % 50 == 3).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    return dedup.exact_dup_groups(d.unionByName(clones))


# --- Q28 keep-first dedup -----------------------------------------------------
@query(
    "q28_dedup_keep_first",
    oracle="""
SELECT doc_id FROM (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents) t
WHERE rn = 1 ORDER BY doc_id
""",
)
def q28(spark, sf_dir):
    return dedup.dedup_keep_first(T(spark, sf_dir, "documents"))


# --- Q29 per-doc text stats ------------------------------------------------------
@query(
    "q29_text_analysis",
    oracle="""
SELECT doc_id, CAST(LENGTH(text) AS INTEGER) AS n_chars_q,
       CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS INTEGER) AS n_tokens_approx,
       lang
FROM documents ORDER BY doc_id
""",
)
def q29(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).alias("n_chars_q"),
        (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1)
        .cast("int")
        .alias("n_tokens_approx"),
        "lang",
    )


# --- Q30 grouped text stats ---------------------------------------------------------
@query(
    "q30_grouped_text_stats",
    oracle="""
SELECT lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars, MIN(doc_id) AS first_doc
FROM documents GROUP BY lang ORDER BY lang
""",
)
def q30(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_chars").alias("chars"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# --- Q34 exact brute-force k-NN of one vector ------------------------------------------
@query(
    "q34_knn_brute",
    oracle="""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 1),
s AS (
  SELECT e.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
           / (SQRT(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * SQRT(list_dot_product(q.qe, q.qe))) AS cos
  FROM embeddings e, q WHERE e.vec_id <> 1)
SELECT CAST(rn AS INTEGER) AS rank, vec_id AS neighbor_id
FROM (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS rn FROM s) t
WHERE rn <= 3 ORDER BY rank
""",
)
def q34(spark, sf_dir):
    return similarity.brute_topk(T(spark, sf_dir, "embeddings"), query_id=1, k=3)


# --- Q35 label centroid norms -------------------------------------------------------------
@query(
    "q35_label_centroids",
    oracle="""
SELECT label, ROUND(SQRT(SUM(m*m)), 6) AS centroid_norm
FROM (SELECT label, i, AVG(CAST(embedding[i] AS DOUBLE)) AS m
      FROM embeddings, LATERAL (SELECT UNNEST(range(1, len(embedding)+1)) AS i) t
      GROUP BY label, i) s
GROUP BY label ORDER BY label
""",
)
def q35(spark, sf_dir):
    return similarity.label_centroid_norms(T(spark, sf_dir, "embeddings"))


# --- Q68 label centroids via pandas UDAF (same oracle as Q35) ----------------
@query(
    "q68_centroids_udaf",
    oracle="""
SELECT label, ROUND(SQRT(SUM(m*m)), 6) AS centroid_norm
FROM (SELECT label, i, AVG(CAST(embedding[i] AS DOUBLE)) AS m
      FROM embeddings, LATERAL (SELECT UNNEST(range(1, len(embedding)+1)) AS i) t
      GROUP BY label, i) s
GROUP BY label ORDER BY label
""",
)
def q68(spark, sf_dir):
    """The UDAF surface: grouped-agg pandas UDF computing the same centroid
    norms as Q35's posexplode plan — two independent formulations, one
    oracle."""
    return similarity.label_centroid_norms_udaf(T(spark, sf_dir, "embeddings"))


# --- token counting ---------------------------------------------------------------------------
@query(
    "q36_token_count",
    oracle="""
SELECT doc_id,
       CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS INTEGER) AS n_tokens_ws,
       CAST(LEN(regexp_extract_all(LOWER(text), '[a-z0-9]+')) AS INTEGER) AS n_tokens_re
FROM documents ORDER BY doc_id
""",
)
def q36(spark, sf_dir):
    d = textstats.with_token_counts(T(spark, sf_dir, "documents"))
    return d.select("doc_id", "n_tokens_ws", "n_tokens_re")


# --- language-ID heuristic ----------------------------------------------------------------------
@query(
    "q37_lang_id",
    oracle="""
SELECT doc_id,
  CASE WHEN (CASE WHEN padded LIKE '% the %' THEN 1 ELSE 0 END
           + CASE WHEN padded LIKE '% and %' THEN 1 ELSE 0 END
           + CASE WHEN padded LIKE '% of %' THEN 1 ELSE 0 END)
         >= (CASE WHEN padded LIKE '% el %' THEN 1 ELSE 0 END
           + CASE WHEN padded LIKE '% la %' THEN 1 ELSE 0 END
           + CASE WHEN padded LIKE '% los %' THEN 1 ELSE 0 END
           + CASE WHEN padded LIKE '% de %' THEN 1 ELSE 0 END) + 1 THEN 'en'
       WHEN (CASE WHEN padded LIKE '% el %' THEN 1 ELSE 0 END
           + CASE WHEN padded LIKE '% la %' THEN 1 ELSE 0 END
           + CASE WHEN padded LIKE '% los %' THEN 1 ELSE 0 END
           + CASE WHEN padded LIKE '% de %' THEN 1 ELSE 0 END) >= 1 THEN 'es'
       ELSE 'unknown' END AS lang_guess
FROM (SELECT doc_id, ' ' || LOWER(text) || ' ' AS padded FROM documents) p
ORDER BY doc_id
""",
)
def q37(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", textstats.lang_id_expr("text").alias("lang_guess"))


# --- quality scoring ------------------------------------------------------------------------------
@query(
    "q38_quality_score",
    oracle="""
SELECT doc_id,
       ROUND(CAST(LENGTH(regexp_replace(LOWER(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
             / CAST(LENGTH(text) AS DOUBLE), 6) AS punct_ratio,
       ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS DOUBLE), 6) AS avg_word_len,
       CASE WHEN (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) >= 5
              AND CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                  / CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS DOUBLE)
                  BETWEEN 2.0 AND 12.0
            THEN 'ok' ELSE 'low' END AS quality
FROM documents ORDER BY doc_id
""",
)
def q38(spark, sf_dir):
    return textstats.quality_features(T(spark, sf_dir, "documents"))


# --- fingerprinting ---------------------------------------------------------------------------------
@query(
    "q39_fingerprint",
    oracle="""
SELECT doc_id, md5(LOWER(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
FROM documents ORDER BY doc_id
""",
)
def q39(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", textstats.fingerprint_expr("text").alias("fp"))


# --- Q72 the composed training-corpus pipeline --------------------------------
@query(
    "q72_clean_corpus",
    oracle="""
WITH scored AS (
  SELECT doc_id, text, lang,
         (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS n_toks,
         CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
           / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS awl
  FROM documents
),
kept AS (
  SELECT doc_id, text FROM scored
  WHERE n_toks >= 5 AND awl BETWEEN 2.0 AND 12.0 AND lang = 'en'
),
deduped AS (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM kept
)
SELECT doc_id FROM deduped WHERE rn = 1 ORDER BY doc_id
""",
)
def q72(spark, sf_dir):
    """The end-to-end corpus-prep pipeline in one plan: quality gate →
    language filter → exact keep-first dedup → survivor ids.  Each stage is
    the registered operator composed, not re-implemented — the pipeline a
    training-data user actually runs."""
    d = T(spark, sf_dir, "documents")
    q = textstats.quality_features(d).select("doc_id", "quality")
    kept = (
        d.join(q, "doc_id")
        .filter((F.col("quality") == "ok") & (F.col("lang") == "en"))
        .select("doc_id", "text")
    )
    return dedup.dedup_keep_first(kept)


# --- Q73 text cleaning / redaction --------------------------------------------
@query(
    "q73_redact_clean",
    oracle=r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\d{3}[- .]\d{3,4}[- .]\d{4}', '<PHONE>', 'g') AS redacted,
       LENGTH(text) - LENGTH(regexp_replace(text, '\d', '', 'g')) AS n_digits
FROM documents ORDER BY doc_id
""",
)
def q73(spark, sf_dir):
    """PII-shaped redaction (emails, phone-number shapes) + digit counting —
    pure codegen regexp over every document; the shape of any
    normalization/scrubbing pass at corpus scale."""
    d = T(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\d{3}[- .]\d{3,4}[- .]\d{4}"
    red = F.regexp_replace(
        F.regexp_replace("text", email, "<EMAIL>"), phone, "<PHONE>"
    )
    return d.select(
        "doc_id",
        red.alias("redacted"),
        (F.length("text") - F.length(F.regexp_replace("text", r"\d", ""))).alias(
            "n_digits"
        ),
    )


# --- Q75 deterministic train/validation split ---------------------------------
@query(
    "q75_train_test_split",
    oracle="""
SELECT doc_id,
       CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 8
            THEN 'train' ELSE 'val' END AS split
FROM documents ORDER BY doc_id
""",
)
def q75(spark, sf_dir):
    """Content-addressed 80/20 split: the assignment is a pure function of
    the id (md5 prefix mod 10), so it is reproducible across engines, runs,
    and re-shards — the property random samplers lack.  No shuffle at all:
    a projection over the scan."""
    d = T(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 10
    return d.select(
        "doc_id", F.when(bucket < 8, "train").otherwise("val").alias("split")
    )


# --- Q76 greedy token packing --------------------------------------------------
@query(
    "q76_token_packing",
    oracle="""
SELECT doc_id, n_toks,
       CAST(FLOOR((run - n_toks) / 2048) AS BIGINT) AS pack_id
FROM (
  SELECT doc_id, n_toks,
         SUM(n_toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM (SELECT doc_id, LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_toks FROM documents) t
) s ORDER BY doc_id
""",
)
def q76(spark, sf_dir):
    """Sequence packing for training: documents stream in id order and a
    running token count assigns each to a ~2048-token pack (the standard
    streaming approximation of bin packing).  pack_id =
    floor(tokens-before-this-doc / budget).

    The running count uses the distributed two-pass cumulative sum
    (operators/packing.py) — NOT a global un-partitioned window, which
    would move the whole corpus to one partition at scale."""
    from gofeed_spark.operators.packing import global_running_sum

    d = T(spark, sf_dir, "documents")
    n_toks = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1
    )
    base = d.select("doc_id", n_toks.alias("n_toks"))
    return global_running_sum(base, "doc_id", "n_toks").select(
        "doc_id",
        "n_toks",
        F.floor((F.col("run") - F.col("n_toks")) / 2048).alias("pack_id"),
    )


# --- Q78 UDTF surface: sentence splitting as a table function ------------------
@query(
    "q78_udtf_sentences",
    oracle="""
SELECT * FROM (VALUES
  (1, 0, 'First sentence.', 15),
  (1, 1, 'Second one!', 11),
  (1, 2, 'And a third?', 12),
  (2, 0, 'Only one here.', 14),
  (3, 0, 'Trailing spaces handled.', 24)
) AS g(doc_id, pos, sentence, n_chars)
ORDER BY doc_id, pos
""",
)
def q78(spark, sf_dir):
    """Python UDTF (one row in, N rows out) driven through SQL LATERAL —
    checked against golden outputs on a fixed fixture (sentence splitting
    uses lookbehind, which DuckDB's RE2 cannot express directly)."""
    from gofeed_spark.functions.udtf_text import register_udtfs

    register_udtfs(spark)
    fixture = spark.createDataFrame(
        [
            (1, "First sentence. Second one! And a third?"),
            (2, "Only one here."),
            (3, "Trailing spaces handled.   "),
        ],
        "doc_id int, text string",
    )
    fixture.createOrReplaceTempView("udtf_fixture")
    return spark.sql(
        """
        SELECT f.doc_id, s.pos, s.sentence, s.n_chars
        FROM udtf_fixture f, LATERAL split_sentences(f.text) s
        ORDER BY f.doc_id, s.pos
        """
    )


# --- Q69 winnowing fingerprints ----------------------------------------------
@query(
    "q69_winnowing",
    oracle=r"""
WITH g AS (
  SELECT doc_id, i AS pos, md5(array_to_string(words[i:i+4], ' ')) AS h
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM documents),
       LATERAL (SELECT UNNEST(range(1, GREATEST(len(words)-4, 0)+1)) AS i) t
)
SELECT DISTINCT doc_id,
       MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
FROM g ORDER BY doc_id, fp
""",
)
def q69(spark, sf_dir):
    """Winnowing (k=5 grams, window 4): the guarantee-bearing local
    fingerprinting algorithm; matched against a window-function oracle."""
    return textstats.winnowing_fingerprints(
        T(spark, sf_dir, "documents"), k=5, window=4
    ).orderBy("doc_id", "fp")


# --- n-gram Jaccard near-dup pairs (EXACT — the LSH twins below approximate it) ----------------------
@query(
    "q40_ngram_jaccard_pairs",
    oracle=r"""
WITH s AS (
  SELECT doc_id, UNNEST(list_distinct([array_to_string(words[i:i+4], ' ')
                                       FOR i IN range(1, GREATEST(len(words)-4, 0)+1)])) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM documents)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM s GROUP BY doc_id),
shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
           FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b,
       ROUND(CAST(shared AS DOUBLE) / (na.n_sh + nb.n_sh - shared), 6) AS jac
FROM shared
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE CAST(shared AS DOUBLE) / (na.n_sh + nb.n_sh - shared) >= 0.6
ORDER BY doc_a, doc_b
""",
)
def q40(spark, sf_dir):
    from gofeed_spark.catalog import table_rowcount

    # exact corpus count from footer stats: below df_cap it PROVES no
    # shingle can be hot, dropping the hot-key detection jobs from the plan
    return dedup.ngram_jaccard_pairs(
        T(spark, sf_dir, "documents"), threshold=0.6, k=5,
        n_hint=table_rowcount(sf_dir, "documents"),
    )


# --- MinHash-LSH near-dup pairs (approximate → rows-only check) ---------------------------------------
@query("q41_minhash_lsh_pairs")
def q41(spark, sf_dir):
    from gofeed_spark.catalog import table_rowcount

    return dedup.minhash_lsh_pairs(
        T(spark, sf_dir, "documents"), num_hashes=64, bands=16, k=5, threshold=0.5,
        n_hint=table_rowcount(sf_dir, "documents"),
    )


# --- SimHash near-dup pairs (approximate → rows-only check) --------------------------------------------
@query("q42_simhash_neardup")
def q42(spark, sf_dir):
    from gofeed_spark.catalog import table_rowcount

    return dedup.simhash_neardup_pairs(
        T(spark, sf_dir, "documents"), max_hamming=8,
        n_hint=table_rowcount(sf_dir, "documents"),
    )


# --- exact top-k most similar embedding pairs ------------------------------------------------------------
@query(
    "q43_topk_similar_pairs",
    oracle="""
WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.e, b.e)
               / (SQRT(list_dot_product(a.e, a.e)) * SQRT(list_dot_product(b.e, b.e))) AS cos
      FROM d a JOIN d b ON a.vec_id < b.vec_id)
SELECT CAST(rn AS INTEGER) AS rank, id_a, id_b
FROM (SELECT id_a, id_b, ROW_NUMBER() OVER (ORDER BY cos DESC, id_a, id_b) AS rn FROM p) t
WHERE rn <= 10 ORDER BY rank
""",
)
def q43(spark, sf_dir):
    """Exact all-pairs top-k — the small-corpus oracle twin.  The primary
    scale path is q58 (LSH candidates + exact re-rank); this brute variant
    exists to pin the oracle and for corpora small enough to block-join.
    Above ``cap`` rows (bench SFs only — it WAS the single most expensive
    query at sf1.0, 164 s of declared O(n^2)) the corpus bounds itself by
    a content-addressed sample (_keep_hash, the q81 convention —
    deterministic, arrival/partitioning-invariant); both gate SFs
    (500/2000 rows) sit under the cap, so the oracle pair is untouched.

    When the sample DOES engage, the Spark result diverges from the
    exact all-pairs oracle BY DESIGN — so the result carries an extra
    ``sampled`` marker column in that case, making any value comparison
    beyond gate SFs fail loudly as a self-describing COLS_MISMATCH
    (and letting gate tooling skip the value check outright) instead of
    a hash mismatch that looks like a real bug (ADVICE r13)."""
    from gofeed_spark.catalog import df_rowcount_estimate
    from gofeed_spark.operators.mixing import _keep_hash

    emb = T(spark, sf_dir, "embeddings")
    cap = 4096
    n = df_rowcount_estimate(emb)
    if n is None:
        n = emb.count()
    out = similarity.topk_similar_pairs(
        emb.filter(
            _keep_hash("vec_id", "q43").cast("double") < cap / n * 1_000_000
        ) if n > cap else emb,
        k=10,
    )
    if n > cap:
        out = out.withColumn("sampled", F.lit(True))
    return out


# --- PRIMARY top-k pair search: multi-table LSH candidates + exact re-rank ---
@query(
    "q58_topk_pairs_lsh",
    oracle="""
WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.e, b.e)
               / (SQRT(list_dot_product(a.e, a.e)) * SQRT(list_dot_product(b.e, b.e))) AS cos
      FROM d a JOIN d b ON a.vec_id < b.vec_id)
SELECT CAST(rn AS INTEGER) AS rank, id_a, id_b
FROM (SELECT id_a, id_b, ROW_NUMBER() OVER (ORDER BY cos DESC, id_a, id_b) AS rn FROM p) t
WHERE rn <= 10 ORDER BY rank
""",
)
def q58(spark, sf_dir):
    """Scale-path pair search: SRP-LSH candidate generation (24 tables × 3
    planes, slim id-only bucket join) + exact cosine re-rank, checked
    against the exact all-pairs oracle — no nested-loop join in the plan.
    Corpus size comes from parquet footer metadata (no sizing job)."""
    from gofeed_spark.catalog import table_rowcount

    return similarity.topk_pairs_lsh(
        T(spark, sf_dir, "embeddings"), k=10, n_hint=table_rowcount(sf_dir, "embeddings")
    )


# --- LSH-bucketed ANN (approximate → rows-only check) ------------------------------------------------------
@query("q44_ann_lsh")
def q44(spark, sf_dir):
    return similarity.lsh_bucket_topk(
        T(spark, sf_dir, "embeddings"), query_id=1, k=3, n_planes=4, dim=64
    )


# --- multimodal: JVM-side byte stats over the binary column -------------------------------------------------
@query(
    "q45_multimodal_bytes",
    oracle="""
SELECT doc_id AS media_id, CAST(strlen(text) AS INTEGER) AS byte_len, md5(text) AS content_md5
FROM documents ORDER BY media_id
""",
)
def q45(spark, sf_dir):
    media = multimodal.docs_as_media(T(spark, sf_dir, "documents"))
    return multimodal.media_byte_stats(media)


# --- multimodal: pandas-UDF featurizer (decode stubbed; the metadata columns
# are DuckDB-expressible, so the Arrow plumbing IS hash-checked) ----------------------------------------------
@query(
    "q46_multimodal_features",
    oracle="""
SELECT doc_id AS media_id, 'image' AS media_type,
       CAST(strlen(text) AS INTEGER) AS byte_len,
       substr(sha256(text), 1, 16) AS sha_prefix
FROM documents ORDER BY media_id
""",
)
def q46(spark, sf_dir):
    media = multimodal.docs_as_media(T(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media)
    return feats.select("media_id", "media_type", "byte_len", "sha_prefix")


# --- multimodal: video frame sampling (flatMap-shaped mapInPandas; frame
# indices are DuckDB-expressible so the fan-out plumbing is hash-checked) -----
@query(
    "q61_frame_sample",
    oracle="""
SELECT doc_id AS media_id, CAST((i - 1) * 10 AS INTEGER) AS frame_idx
FROM documents,
     LATERAL (SELECT UNNEST(range(1, LEAST(8, GREATEST(strlen(text) // 10, 1)) + 1)) AS i) t
ORDER BY media_id, frame_idx
""",
)
def q61(spark, sf_dir):
    media = multimodal.docs_as_media(T(spark, sf_dir, "documents"))
    return multimodal.sample_frames(media, every_n=10, max_frames=8).select(
        "media_id", "frame_idx"
    )


# =============================================================================
# Non-vacuous dedup + LSH invariant checks.  The synthetic documents table has
# ZERO exact duplicates (q27/q28 pass vacuously), so these queries build a
# corpus that provably contains them: every doc (or every 5th) unioned back in
# under doc_id + CLONE_OFFSET.  Identical docs have identical shingle sets →
# identical MinHash signatures → collide in EVERY band, and identical SimHash
# fingerprints → Hamming 0 — so "LSH finds every clone pair" is an exact,
# hash-checkable invariant, not a probabilistic one.
# =============================================================================

CLONE_OFFSET = 10_000_000


def _with_clones(docs, every: int = 1):
    clones = docs.filter((F.col("doc_id") % every) == 0).select(
        (F.col("doc_id") + CLONE_OFFSET).alias("doc_id"), "text"
    )
    return docs.select("doc_id", "text").unionByName(clones)


_CORPUS_SQL = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {CLONE_OFFSET} AS doc_id, text FROM documents WHERE doc_id % 5 = 0
"""


@query(
    "q53_dedup_exact_dups",
    oracle=f"""
WITH corpus AS ({_CORPUS_SQL})
SELECT md5(text) AS fp, COUNT(*) AS n, MIN(doc_id) AS keep_id
FROM corpus GROUP BY text HAVING COUNT(*) > 1 ORDER BY keep_id
""",
)
def q53(spark, sf_dir):
    """Exact dedup on a corpus that HAS duplicates (every 5th doc cloned)."""
    corpus = _with_clones(T(spark, sf_dir, "documents"), every=5)
    return (
        dedup.exact_dup_groups(corpus)
        .select(F.md5(F.col("text").cast("binary")).alias("fp"), "n", "keep_id")
    )


@query(
    "q54_dedup_keep_first_dups",
    oracle=f"""
WITH corpus AS ({_CORPUS_SQL})
SELECT doc_id FROM (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM corpus) t
WHERE rn = 1 ORDER BY doc_id
""",
)
def q54(spark, sf_dir):
    """Keep-first dedup over the cloned corpus: survivors are the originals."""
    corpus = _with_clones(T(spark, sf_dir, "documents"), every=5)
    return dedup.dedup_keep_first(corpus)


@query(
    "q55_minhash_lsh_clone_recall",
    oracle=r"""
SELECT doc_id AS doc_a FROM documents
WHERE len(regexp_split_to_array(lower(text), '\s+')) >= 5 AND doc_id % 5 = 0
ORDER BY doc_a
""",
)
def q55(spark, sf_dir):
    """MinHash-LSH must recover EVERY (doc, clone) pair: identical shingle
    sets give identical signatures, which collide in all 16 bands — a
    deterministic invariant of the banding implementation (dedup.py), not a
    probabilistic recall estimate.  Docs under 5 tokens have no shingles and
    are excluded on both sides.  Every 5th doc is cloned (like q53/q54) to
    keep the driver-sweep cost low while exercising the same code path."""
    corpus = _with_clones(T(spark, sf_dir, "documents"), every=5)
    # df_cap=None: this is an exact every-clone-pair invariant; the capped
    # default's spanning-star emission only guarantees hub-member pairs, so a
    # hot band bucket would (legitimately) drop clone pairs where neither
    # member is the hub.  Production callers keep the capped default.
    pairs = dedup.minhash_lsh_pairs(
        corpus, num_hashes=64, bands=16, k=5, threshold=1.0, df_cap=None
    )
    return (
        pairs.filter(F.col("doc_b") == F.col("doc_a") + CLONE_OFFSET)
        .select("doc_a")
        .orderBy("doc_a")
    )


@query(
    "q56_simhash_clone_recall",
    oracle="""
SELECT doc_id AS doc_a FROM documents WHERE doc_id % 5 = 0 ORDER BY doc_a
""",
)
def q56(spark, sf_dir):
    """SimHash clone recall: identical docs fingerprint identically →
    Hamming 0 → band collision guaranteed; every cloned doc must pair with
    its clone (every 5th doc cloned, q53/q54 pattern, for sweep cost)."""
    corpus = _with_clones(T(spark, sf_dir, "documents"), every=5)
    # df_cap=None for the same reason as q55: exact invariant check.
    pairs = dedup.simhash_neardup_pairs(corpus, max_hamming=0, df_cap=None)
    return (
        pairs.filter(F.col("doc_b") == F.col("doc_a") + CLONE_OFFSET)
        .select("doc_a")
        .orderBy("doc_a")
    )


@query(
    "q83_neardup_clusters",
    oracle=r"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 20000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
),
s AS (
  SELECT doc_id, UNNEST(list_distinct([array_to_string(words[i:i+4], ' ')
                                       FOR i IN range(1, GREATEST(len(words)-4, 0)+1)])) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM corpus)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM s GROUP BY doc_id),
shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
           FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b FROM shared
  JOIN sizes na ON na.doc_id = doc_a
  JOIN sizes nb ON nb.doc_id = doc_b
  WHERE CAST(shared AS DOUBLE) / (na.n_sh + nb.n_sh - shared) >= 0.6
),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
  WHERE r.label < e.b
),
cc AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node)
SELECT d.doc_id,
       COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
       CASE WHEN COALESCE(cc.cluster_id, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS keep
FROM corpus d LEFT JOIN cc ON cc.node = d.doc_id
ORDER BY doc_id
""",
)
def q83(spark, sf_dir):
    """Pair → cluster → survivor: near-dup PAIRS (exact n-gram Jaccard, the
    q40 operator) resolved into connected components by min-label
    propagation (dedup.neardup_clusters), emitting the per-doc dedup
    verdict (doc_id, cluster_id, keep).  The corpus clones every 5th doc
    once and every 10th doc TWICE, so 3-member families exist and the
    transitive closure is non-trivial — keeping "first of each pair" would
    disagree with the oracle's recursive CTE here.  Generalizes q28/q54's
    keep-first semantics to fuzzy duplicates."""
    d = T(spark, sf_dir, "documents")
    c1 = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + CLONE_OFFSET).alias("doc_id"), "text"
    )
    c2 = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2 * CLONE_OFFSET).alias("doc_id"), "text"
    )
    corpus = d.select("doc_id", "text").unionByName(c1).unionByName(c2)
    from gofeed_spark.catalog import table_rowcount

    # exact corpus bound: n + n/5 + n/10 rows (footer count + arithmetic)
    n = table_rowcount(sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        corpus, threshold=0.6, k=5, n_hint=n + n // 5 + n // 10 + 2
    )
    return dedup.neardup_clusters(pairs, docs=corpus)


@query(
    "q59_embedding_neardup",
    oracle="""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id % 10 = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.e, b.e)
             / (SQRT(list_dot_product(a.e, a.e)) * SQRT(list_dot_product(b.e, b.e))), 6) AS cos
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e)
      / (SQRT(list_dot_product(a.e, a.e)) * SQRT(list_dot_product(b.e, b.e))) >= 0.9
ORDER BY id_a, id_b
""",
)
def q59(spark, sf_dir):
    """Embedding-cosine near-dup (semantic dedup) on a corpus with cloned
    vectors: LSH candidates + threshold filter must recover exactly the
    pairs the exact O(n²) oracle finds at cos >= 0.9 (the clones, found
    with certainty — identical vectors share every bucket)."""
    emb = T(spark, sf_dir, "embeddings")
    clones = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(clones)
    from gofeed_spark.catalog import table_rowcount

    n = table_rowcount(sf_dir, "embeddings")
    return similarity.embedding_neardup_pairs(
        corpus, min_cos=0.9, n_hint=n + n // 10
    ).orderBy("id_a", "id_b")


@query(
    "q60_ivf_self_match",
    oracle="""
SELECT 1 AS rank, MAX(vec_id) + 10000000 AS neighbor_id FROM embeddings
""",
)
def q60(spark, sf_dir):
    """IVF coarse-quantized ANN: a clone of the query vector quantizes to
    the query's own cell, so probing must rank it first — checks cell
    assignment + probe + scoring end-to-end."""
    emb = T(spark, sf_dir, "embeddings")
    max_id = int(emb.agg(F.max("vec_id")).collect()[0][0])
    clone = emb.filter(F.col("vec_id") == 1).select(
        F.lit(max_id + 10_000_000).cast("long").alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(clone)
    out = similarity.ivf_topk(corpus, query_id=1, k=3, n_cells=16, n_probe=4)
    return out.filter(F.col("rank") == 1)


@query(
    "q79_ann_index_probe",
    oracle="""
SELECT 1 AS rank, MAX(vec_id) + 10000000 AS neighbor_id FROM embeddings
""",
)
def q79(spark, sf_dir):
    """Partition-pruned SRP index probe: the corpus (plus a clone of the
    query vector) is WRITTEN partitioned by sign bucket
    (similarity.build_ann_index) and the probe reads ONLY the query's
    bucket directory (PartitionFilters — asserted in tests/test_plans.py).
    The clone shares the query's bucket and scores cosine 1.0 → rank 1.
    The serving-layout twin of q57's filtered-scan path."""
    import shutil
    import tempfile

    emb = T(spark, sf_dir, "embeddings")
    # one scalar job for both the max id and the query vector
    agg = emb.agg(
        F.max("vec_id").alias("max_id"),
        F.first(F.when(F.col("vec_id") == 1, F.col("embedding")), ignorenulls=True).alias("qv"),
    ).collect()[0]
    max_id, query_vec = int(agg["max_id"]), agg["qv"]
    clone = emb.filter(F.col("vec_id") == 1).select(
        F.lit(max_id + 10_000_000).cast("long").alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(clone)
    path = tempfile.mkdtemp(prefix="gofeed_q79_")
    try:
        similarity.build_ann_index(corpus, path, n_planes=4, dim=64)
        out = similarity.probe_ann_index(
            spark, path, query_vec, k=3, n_planes=4, dim=64, exclude_id=1
        )
        return out.filter(F.col("rank") == 1).localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "q80_ivf_index_probe",
    oracle="""
SELECT 1 AS rank, MAX(vec_id) + 10000000 AS neighbor_id FROM embeddings
""",
)
def q80(spark, sf_dir):
    """Partition-pruned IVF index probe: corpus written partitioned by
    coarse cell (similarity.build_ivf_index); the probe prunes to the
    n_probe nearest cell directories.  A clone of the query quantizes to
    the query's cell and scores cosine 1.0 → rank 1 (q60's layout twin)."""
    import shutil
    import tempfile

    emb = T(spark, sf_dir, "embeddings")
    # one scalar job for both the max id and the query vector
    agg = emb.agg(
        F.max("vec_id").alias("max_id"),
        F.first(F.when(F.col("vec_id") == 1, F.col("embedding")), ignorenulls=True).alias("qv"),
    ).collect()[0]
    max_id, query_vec = int(agg["max_id"]), agg["qv"]
    clone = emb.filter(F.col("vec_id") == 1).select(
        F.lit(max_id + 10_000_000).cast("long").alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(clone)
    path = tempfile.mkdtemp(prefix="gofeed_q80_")
    try:
        codebook = similarity.build_ivf_index(corpus, path, n_cells=16)
        out = similarity.probe_ivf_index(
            spark, path, codebook, query_vec, k=3, n_probe=4, exclude_id=1
        )
        return out.filter(F.col("rank") == 1).localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "q57_ann_lsh_self_match",
    oracle="""
SELECT 1 AS rank, MAX(vec_id) + 10000000 AS neighbor_id FROM embeddings
""",
)
def q57(spark, sf_dir):
    """SRP-LSH self-match: a clone of the query vector lands in the query's
    bucket (identical projections) and scores cosine 1.0 → must be ranked
    first.  Checks bucketing + scoring end-to-end with a deterministic
    outcome."""
    emb = T(spark, sf_dir, "embeddings")
    # scalar max id (tiny agg, not a data-path collect)
    max_id = int(emb.agg(F.max("vec_id")).collect()[0][0])
    clone = emb.filter(F.col("vec_id") == 1).select(
        F.lit(max_id + 10_000_000).cast("long").alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(clone)
    out = similarity.lsh_bucket_topk(corpus, query_id=1, k=3, n_planes=4, dim=64)
    return out.filter(F.col("rank") == 1)


# --- Q81 deterministic stratified sampling (data mixing) ----------------------
@query(
    "q81_stratified_sample",
    oracle="""
WITH lang AS (
  SELECT doc_id,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 20
              THEN 'head' ELSE 'tail' END AS stratum
  FROM documents
)
SELECT doc_id, stratum FROM lang
WHERE (stratum = 'head')
   OR (stratum = 'tail'
       AND CAST(('0x' || substr(md5('s' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 25)
ORDER BY doc_id
""",
)
def q81(spark, sf_dir):
    """Deterministic stratified sampling — the data-mixing primitive of a
    training pipeline: keep ALL of the minority stratum, a fixed fraction
    of the majority one.  Both the stratum assignment and the keep
    decision are content-addressed (md5 of the id), so the sample is
    reproducible across engines, runs, and re-shards and needs NO shuffle:
    one projection + filter over the scan (Spark's sampleBy is
    seed-dependent per partitioning — useless for an oracle or a rerun).
    Strata here derive from the id hash (a stand-in for any label)."""
    d = T(spark, sf_dir, "documents")
    h1 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % 100
    stratum = F.when(h1 < 20, "head").otherwise("tail")
    h2 = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("s"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    return (
        d.select("doc_id", stratum.alias("stratum"), h2.alias("__h2"))
        .filter((F.col("stratum") == "head") | (F.col("__h2") < 25))
        .select("doc_id", "stratum")
    )


# --- Q82 heavy-hitter tokens per language (vocabulary head) -------------------
@query(
    "q82_token_heavy_hitters",
    oracle=r"""
WITH toks AS (
  SELECT d.doc_id, lower(t.tok) AS tok
  FROM documents d, LATERAL UNNEST(regexp_split_to_array(lower(d.text), '\s+')) AS t(tok)
  WHERE length(t.tok) >= 2
),
counts AS (
  SELECT tok, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS df
  FROM toks GROUP BY tok
),
ranked AS (
  SELECT tok, n, df,
         ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rnk
  FROM counts
)
SELECT CAST(rnk AS BIGINT) AS rnk, tok, CAST(n AS BIGINT) AS n, CAST(df AS BIGINT) AS df
FROM ranked WHERE rnk <= 20 ORDER BY rnk
""",
)
def q82(spark, sf_dir):
    """Corpus vocabulary head: top-20 tokens by total occurrences with
    document frequency — the profiling pass every tokenizer/quality
    pipeline starts from.  Plan shape at 100 TB: explode to tokens, ONE
    map-side-combinable groupBy over (token), TakeOrdered for the head —
    no window over the full vocabulary, no driver-side loops."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
    ).filter(F.length("tok") >= 2)
    counts = toks.groupBy("tok").agg(
        F.count("*").alias("n"), F.countDistinct("doc_id").alias("df")
    )
    top = counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(20)
    return with_rank(
        top, [F.col("n").desc(), F.col("tok").asc()], rank_col="rnk", cast="long"
    ).select("rnk", "tok", "n", "df")


# --- Q82a sketch-based vocabulary head (the 100 TB default) -------------------
@query(
    "q82a_heavy_hitters_approx",
    oracle=r"""
WITH toks AS (
  SELECT d.doc_id, lower(t.tok) AS tok
  FROM documents d, LATERAL UNNEST(regexp_split_to_array(lower(d.text), '\s+')) AS t(tok)
  WHERE length(t.tok) >= 2
),
counts AS (
  SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
),
ranked AS (
  SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rnk
  FROM counts
)
SELECT CAST(rnk AS BIGINT) AS rnk, tok, CAST(n AS BIGINT) AS n, TRUE AS df_ok
FROM ranked WHERE rnk <= 20 ORDER BY rnk
""",
)
def q82a(spark, sf_dir):
    """q82's document frequency via approx_count_distinct (HyperLogLog++,
    rsd 5%) — the heavy-hitter-profiling DEFAULT at corpus scale: the exact
    countDistinct expands every (tok, doc_id) row through a two-phase
    distinct aggregate (2× the shuffled rows of the plain count), while the
    HLL sketch is one fixed-width buffer per token, map-side combinable.

    The sketch value itself is engine-internal (not oracle-comparable), so
    the registered contract is a TOLERANCE INVARIANT: for the top-20 tokens
    by exact occurrence count, |approx_df − exact df| must stay within 15%
    of the exact df (3× the configured rsd — HLL++ deviations beyond that
    are vanishingly rare, and small cardinalities are exact in sparse
    mode).  The oracle emits TRUE per row; a sketch drifting out of
    tolerance hash-mismatches.  The exact df here exists only to judge the
    sketch — the production form drops it."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
    ).filter(F.length("tok") >= 2)
    counts = toks.groupBy("tok").agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("df"),
        F.approx_count_distinct("doc_id", 0.05).alias("adf"),
    )
    top = counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(20)
    return with_rank(
        top, [F.col("n").desc(), F.col("tok").asc()], rank_col="rnk", cast="long"
    ).select(
        "rnk",
        "tok",
        "n",
        (F.abs(F.col("adf") - F.col("df")) <= 0.15 * F.col("df")).alias("df_ok"),
    )


# --- PII redaction ------------------------------------------------------------
@query(
    "q84_pii_redaction",
    oracle=r"""
WITH corpus AS (
  SELECT doc_id,
         text || ' reach u' || CAST(doc_id AS VARCHAR)
              || '@ex.org or 555-123-4567 from 10.0.0.1' AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
       CAST(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS INTEGER) AS n_phone,
       CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ip
FROM corpus ORDER BY doc_id
""",
)
def q84(spark, sf_dir):
    """PII scrub (textstats.redact_pii) over a corpus with deterministic
    injected PII — the synthetic documents carry none, so each doc gets a
    doc_id-derived email plus a constant phone and IPv4 appended; counts
    must come out (1,1,1) per doc and the redacted strings hash-match the
    oracle's chained RE2 replacements (patterns restricted to the
    Java-regex ∩ RE2 dialect)."""
    d = T(spark, sf_dir, "documents")
    corpus = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach u"),
            F.col("doc_id").cast("string"),
            F.lit("@ex.org or 555-123-4567 from 10.0.0.1"),
        ).alias("text"),
    )
    return textstats.redact_pii(corpus)


# --- repetition filter --------------------------------------------------------
@query(
    "q85_repetition_ratio",
    oracle=r"""
SELECT doc_id,
       ROUND(CAST(len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS DOUBLE)
             / CAST(len(regexp_split_to_array(lower(text), '\s+')) AS DOUBLE), 6) AS ttr,
       CASE WHEN CAST(len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS DOUBLE)
                 / CAST(len(regexp_split_to_array(lower(text), '\s+')) AS DOUBLE) < 0.3
            THEN 1 ELSE 0 END AS repetitive
FROM documents ORDER BY doc_id
""",
)
def q85(spark, sf_dir):
    """Repetition filter via type-token ratio (distinct tokens / total
    tokens): boilerplate and looping generations collapse toward 0 while
    organic prose sits high — the standard cheap repetition signal in
    training-data quality pipelines.  Token convention = ws_tokens (the
    shingle/oracle convention); pure array expressions, JVM-side."""
    toks = ws_tokens("text")
    ttr = F.round(
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double"), 6
    )
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ttr.alias("ttr"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double") < 0.3)
        .cast("int")
        .alias("repetitive"),
    )


# --- corpus filter: the composed keep/drop verdict ----------------------------
@query(
    "q86_corpus_filter",
    oracle=r"""
WITH feats AS (
  SELECT doc_id, text,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn,
         CASE WHEN (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) >= 5
                AND CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                    / CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS DOUBLE)
                    BETWEEN 2.0 AND 12.0
              THEN 'ok' ELSE 'low' END AS quality,
         CAST(len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS DOUBLE)
           / CAST(len(regexp_split_to_array(lower(text), '\s+')) AS DOUBLE) AS ttr
  FROM documents
)
SELECT doc_id,
       CASE WHEN rn > 1 THEN 'dup'
            WHEN quality <> 'ok' THEN 'quality'
            WHEN ttr < 0.3 THEN 'repetitive'
            ELSE 'keep' END AS verdict,
       CASE WHEN rn = 1 AND quality = 'ok' AND ttr >= 0.3 THEN 1 ELSE 0 END AS keep
FROM feats ORDER BY doc_id
""",
)
def q86(spark, sf_dir):
    """The composed corpus-filter verdict a training pipeline actually
    applies: exact-dup keep-first (first reason checked, like a pipeline's
    dedup-first ordering) → quality gate (q38's flag) → repetition gate
    (q85's type-token ratio).  One row per doc with the FIRST failing
    reason and the final keep bit — demonstrates that every signal in this
    module composes into a single declarative pass (one window + column
    expressions, no Python)."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    t = F.col("text")
    n_tok = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    awl = F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double") / n_tok.cast("double")
    quality = F.when((n_tok >= 5) & awl.between(2.0, 12.0), "ok").otherwise("low")
    toks = ws_tokens("text")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")
    rn = F.row_number().over(Window.partitionBy("text").orderBy("doc_id"))
    feats = d.select("doc_id", rn.alias("rn"), quality.alias("quality"), ttr.alias("ttr"))
    verdict = (
        F.when(F.col("rn") > 1, "dup")
        .when(F.col("quality") != "ok", "quality")
        .when(F.col("ttr") < 0.3, "repetitive")
        .otherwise("keep")
    )
    return feats.select(
        "doc_id",
        verdict.alias("verdict"),
        (verdict == "keep").cast("int").alias("keep"),
    )


# --- Q87 benchmark decontamination -------------------------------------------
@query(
    "q87_decontamination",
    oracle=r"""
WITH s AS (
  SELECT doc_id, UNNEST(list_distinct([array_to_string(words[i:i+4], ' ')
        FOR i IN range(1, GREATEST(len(words)-4, 0)+1)])) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
        FROM documents)
),
bench AS (SELECT DISTINCT sh FROM s WHERE doc_id % 20 = 0),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_shared
  FROM (SELECT * FROM s WHERE doc_id % 20 <> 0) t
  JOIN bench b USING (sh) GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_shared, 0) AS n_shared,
       CAST(COALESCE(h.n_shared, 0) > 0 AS INT) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 20 <> 0
ORDER BY d.doc_id
""",
)
def q87(spark, sf_dir):
    """Benchmark decontamination (train/eval overlap): every 20th doc plays
    the held-out evaluation set; every TRAINING doc reports how many of its
    distinct 5-gram shingles appear anywhere in the benchmark, plus the
    contaminated verdict — the pre-ship check that keeps eval answers out
    of training corpora.  The benchmark's hashed shingle set broadcasts as
    one sorted int64 array and the corpus pays a single no-shuffle Arrow
    pass (dedup.contamination_check) — the corpus never moves, so the plan
    is identical at 100 TB."""
    d = T(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    train = d.filter(F.col("doc_id") % 20 != 0)
    return dedup.contamination_check(train, bench, k=5)


# --- Q88 semantic decontamination --------------------------------------------
@query(
    "q88_semantic_decontamination",
    oracle="""
WITH bench AS (
  SELECT CAST(embedding AS DOUBLE[]) AS be FROM embeddings WHERE vec_id % 20 = 0
),
corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 20 <> 0
  UNION ALL
  SELECT vec_id + 10000000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 20 = 0
),
s AS (
  SELECT c.vec_id,
         MAX(list_dot_product(c.v, b.be)
             / (SQRT(list_dot_product(c.v, c.v))
                * SQRT(list_dot_product(b.be, b.be)))) AS mc
  FROM corpus c, bench b GROUP BY c.vec_id
)
SELECT vec_id, ROUND(mc, 6) AS max_cos, CAST(mc >= 0.99 AS INT) AS contaminated
FROM s ORDER BY vec_id
""",
)
def q88(spark, sf_dir):
    """Semantic decontamination (q87's embedding twin): every 20th vector
    plays the held-out benchmark; the training corpus — the remaining
    vectors PLUS exact clones of the benchmark re-labeled past
    CLONE_OFFSET, so true leaks exist and the check is non-vacuous —
    reports its max cosine against any benchmark vector and the verdict at
    0.99.  Catches paraphrase-shaped leaks n-gram overlap misses.  The
    benchmark broadcasts as one matrix; the corpus pays a single
    no-shuffle Arrow pass (similarity.semantic_contamination)."""
    e = T(spark, sf_dir, "embeddings")
    bench = e.filter(F.col("vec_id") % 20 == 0)
    clones = bench.select(
        (F.col("vec_id") + CLONE_OFFSET).alias("vec_id"), "embedding"
    )
    corpus = (
        e.filter(F.col("vec_id") % 20 != 0)
        .select("vec_id", "embedding")
        .unionByName(clones)
    )
    return similarity.semantic_contamination(corpus, bench, threshold=0.99)


# --- Q89 line-level boilerplate removal --------------------------------------
@query(
    "q89_boilerplate_removal",
    oracle=r"""
WITH corpus AS (
  SELECT doc_id, source,
         '== ' || source || ' masthead ==' || chr(10) ||
         CASE WHEN doc_id % 5 = 0
              THEN 'subscribe to ' || source || chr(10) ELSE '' END ||
         text AS text
  FROM documents
),
parts AS (SELECT doc_id, source, string_split(text, chr(10)) AS ls FROM corpus),
lines AS (
  SELECT doc_id, source, i AS pos, ls[i] AS line
  FROM parts, LATERAL (SELECT UNNEST(range(1, len(ls)+1)) AS i) t
),
gsize AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs FROM corpus GROUP BY source),
freq AS (SELECT source, line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY 1, 2),
boiler AS (
  SELECT f.source, f.line FROM freq f JOIN gsize g USING (source)
  WHERE f.df >= GREATEST(2, CEIL(0.5 * g.n_docs))
),
kept AS (
  SELECT l.* FROM lines l
  WHERE NOT EXISTS (SELECT 1 FROM boiler b
                    WHERE b.source = l.source AND b.line = l.line)
),
agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT c.doc_id,
       COALESCE(a.clean_text, '') AS clean_text,
       CAST(t.n_lines - COALESCE(a.n_kept, 0) AS INT) AS n_removed
FROM corpus c
JOIN tot t USING (doc_id)
LEFT JOIN agg a USING (doc_id)
ORDER BY c.doc_id
""",
)
def q89(spark, sf_dir):
    """Line-level boilerplate removal (the CCNet/RefinedWeb preprocessing
    step): every doc gets a per-source masthead injected (df = 100% of its
    source, removed) and every 5th doc a promo line (df = 20%, below the
    0.5 threshold — KEPT, pinning that merely-repeated content survives);
    textstats.remove_frequent_lines drops the frequent lines per source
    and reassembles docs in line order.  The corpus-side frequency shuffle
    carries xxhash64 line keys, the boilerplate relation broadcasts, and
    the only full-corpus shuffle is the per-doc reassembly."""
    d = T(spark, sf_dir, "documents")
    corpus = d.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("== "), F.col("source"), F.lit(" masthead =="), F.lit("\n"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit("subscribe to "), F.col("source"), F.lit("\n")),
            ).otherwise(F.lit("")),
            F.col("text"),
        ).alias("text"),
    )
    return textstats.remove_frequent_lines(corpus, min_frac=0.5)


# --- Q90 per-source corpus report --------------------------------------------
@query(
    "q90_source_report",
    oracle=r"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS dup_docs,
       CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS BIGINT)
         AS total_tokens,
       ROUND(AVG(CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS DOUBLE)), 6)
         AS avg_tokens,
       CAST(SUM(CASE WHEN (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) >= 5
                      AND CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                          / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                          BETWEEN 2.0 AND 12.0
                THEN 1 ELSE 0 END) AS BIGINT) AS quality_ok_n,
       CAST(SUM(CASE WHEN CAST(len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS DOUBLE)
                          / CAST(len(regexp_split_to_array(lower(text), '\s+')) AS DOUBLE) < 0.3
                THEN 1 ELSE 0 END) AS BIGINT) AS repetitive_n,
       COUNT(DISTINCT lang) AS n_langs
FROM documents GROUP BY source ORDER BY source
""",
)
def q90(spark, sf_dir):
    """The per-source dataset card a pipeline emits before a corpus ships:
    doc/dup counts, token volume, mean length, quality-pass and
    repetition-flag counts (the q38/q85 signals as aggregates), and
    language spread — ONE grouped pass over the corpus, every signal
    whole-stage codegen, counts (not ratios) so the output hash is
    integer-stable."""
    d = T(spark, sf_dir, "documents")
    t = F.col("text")
    n_tok = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    nonspace = F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double")
    awl = nonspace / n_tok.cast("double")
    q_ok = ((n_tok >= 5) & (awl >= 2.0) & (awl <= 12.0)).cast("int")
    toks = ws_tokens("text")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")
    feats = d.select(
        "source", "lang", "text",
        n_tok.alias("n_tok"), q_ok.alias("q_ok"), (ttr < 0.3).cast("int").alias("rep"),
    )
    return feats.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - F.countDistinct("text")).alias("dup_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.round(F.avg(F.col("n_tok").cast("double")), 6).alias("avg_tokens"),
        F.sum("q_ok").cast("long").alias("quality_ok_n"),
        F.sum("rep").cast("long").alias("repetitive_n"),
        F.countDistinct("lang").alias("n_langs"),
    )


# --- Q91 Gopher-style format/quality rules ------------------------------------
_Q91_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed eiusmod"
    " tempor incididunt labore"
)
_Q91_BULLETS = (
    "\n- alpha\n- beta\n- gamma\n- delta\n- epsilon"
    "\n- zeta\n- eta\n- theta\n- iota\n- kappa"
)
_Q91_ELLIPSES = "\nto be continued...\nthe story goes on…"
# The required-stopword list is language/corpus-specific (Gopher's 8 English
# words never occur in the synthetic vocabulary, which would make the PASS
# branch vacuous): this list matches the corpus so most organic docs pass,
# while the %17 lorem replacement (0 hits) still fails the rule.
_Q91_STOPS = ("a", "hash", "join", "value", "row", "table", "spark", "key")


@query(
    "q91_gopher_rules",
    oracle=r"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 17 = 0
              THEN 'lorem ipsum dolor sit amet consectetur adipiscing elit sed eiusmod tempor incididunt labore'
              ELSE text
                || CASE WHEN doc_id % 7 = 0
                        THEN chr(10)||'- alpha'||chr(10)||'- beta'||chr(10)||'- gamma'
                           ||chr(10)||'- delta'||chr(10)||'- epsilon'||chr(10)||'- zeta'
                           ||chr(10)||'- eta'||chr(10)||'- theta'||chr(10)||'- iota'
                           ||chr(10)||'- kappa'
                        ELSE '' END
                || CASE WHEN doc_id % 11 = 0
                        THEN chr(10)||'to be continued...'||chr(10)||'the story goes on…'
                        ELSE '' END
                || CASE WHEN doc_id % 13 = 0 THEN ' ' || repeat('#', 30) ELSE '' END
         END AS text
  FROM documents
),
f AS (
  SELECT doc_id,
         CAST(GREATEST(len(regexp_extract_all(text, '\S+')), 1) AS DOUBLE) AS n_words,
         CAST(LENGTH(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS nonspace,
         CAST((LENGTH(text) - LENGTH(REPLACE(text, '#', '')))
              + (LENGTH(text) - LENGTH(REPLACE(text, '…', ''))) AS DOUBLE) AS n_sym,
         string_split(text, chr(10)) AS ls,
         ' ' || regexp_replace(lower(text), '\s', ' ', 'g') || ' ' AS padded
  FROM corpus
),
g AS (
  SELECT doc_id,
         nonspace / n_words AS mean_wl,
         n_sym / n_words AS symbol_ratio,
         CAST(len(list_filter(ls, x -> starts_with(x, '- ')
                                    OR starts_with(x, '* ')
                                    OR starts_with(x, '• '))) AS DOUBLE)
           / len(ls) AS bullet_frac,
         CAST(len(list_filter(ls, x -> ends_with(x, '...')
                                    OR ends_with(x, '…'))) AS DOUBLE)
           / len(ls) AS ellipsis_frac,
         (CASE WHEN contains(padded, ' a ')     THEN 1 ELSE 0 END
        + CASE WHEN contains(padded, ' hash ')  THEN 1 ELSE 0 END
        + CASE WHEN contains(padded, ' join ')  THEN 1 ELSE 0 END
        + CASE WHEN contains(padded, ' value ') THEN 1 ELSE 0 END
        + CASE WHEN contains(padded, ' row ')   THEN 1 ELSE 0 END
        + CASE WHEN contains(padded, ' table ') THEN 1 ELSE 0 END
        + CASE WHEN contains(padded, ' spark ') THEN 1 ELSE 0 END
        + CASE WHEN contains(padded, ' key ')   THEN 1 ELSE 0 END) AS stop_hits
  FROM f
)
SELECT doc_id,
       ROUND(mean_wl, 6) AS mean_wl,
       ROUND(symbol_ratio, 6) AS symbol_ratio,
       ROUND(bullet_frac, 6) AS bullet_frac,
       ROUND(ellipsis_frac, 6) AS ellipsis_frac,
       CAST(stop_hits AS INT) AS stop_hits,
       CASE WHEN mean_wl >= 3.0 AND mean_wl <= 10.0
             AND symbol_ratio <= 0.1
             AND bullet_frac <= 0.9
             AND ellipsis_frac <= 0.3
             AND stop_hits >= 2
            THEN 1 ELSE 0 END AS gopher_ok
FROM g ORDER BY doc_id
""",
)
def q91(spark, sf_dir):
    """Gopher-style format rules (textstats.gopher_rules) — the MassiveWeb
    document-shape filters: mean word length, symbol-to-word ratio,
    bullet/ellipsis line fractions, required-stopword presence.  The
    synthetic docs are single-line prose that trips none of the line
    rules, so each rule gets deterministic violators injected: every 7th
    doc ten bullet lines (10/11 > 0.9), every 11th two ellipsis-ended
    lines, every 13th a 30-char '#' run, every 17th a stopword-free lorem
    replacement — both engines build the same corpus, so every rule branch
    is non-vacuous."""
    d = T(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(did % 7 == 0, F.lit(_Q91_BULLETS)).otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit(_Q91_ELLIPSES)).otherwise(F.lit("")),
        F.when(did % 13 == 0, F.lit(" " + "#" * 30)).otherwise(F.lit("")),
    )
    corpus = d.select(
        "doc_id",
        F.when(did % 17 == 0, F.lit(_Q91_LOREM)).otherwise(injected).alias("text"),
    )
    return textstats.gopher_rules(corpus, stopwords=_Q91_STOPS)


# --- Q92 duplicate n-gram character fraction ----------------------------------
_Q92_SPAM = " click here to win click here to win click here to win"


@query(
    "q92_dup_ngram_fraction",
    oracle=r"""
WITH corpus AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 6 = 0
                      THEN ' click here to win click here to win click here to win'
                      ELSE '' END AS text
  FROM documents
),
toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk,
         LENGTH(text) AS n_chars
  FROM corpus
),
grams AS (
  SELECT doc_id, n_chars, array_to_string(tk[i:i+2], ' ') AS gram
  FROM toks, LATERAL (SELECT UNNEST(range(1, len(tk) - 1)) AS i) t
),
cnt AS (SELECT doc_id, n_chars, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3),
agg AS (
  SELECT doc_id, n_chars,
         SUM(CASE WHEN c > 1 THEN LENGTH(gram) * c ELSE 0 END) AS dup_chars
  FROM cnt GROUP BY 1, 2
)
SELECT doc_id, CAST(dup_chars AS DOUBLE) / CAST(n_chars AS DOUBLE) AS dup_ngram_frac
FROM agg ORDER BY doc_id
""",
)
def q92(spark, sf_dir):
    """Duplicate-3-gram character fraction (textstats.dup_ngram_char_fraction)
    — the Gopher rep-ngram repetition signal.  Every 6th doc gets a
    thrice-repeated spam phrase appended (both engines build the same
    corpus) so duplicated grams exist by construction; the rest measure
    the organic corpus.  The Spark side is one no-shuffle Arrow pass; the
    oracle pays an UNNEST + two aggregations for the same integers."""
    d = T(spark, sf_dir, "documents")
    corpus = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 6 == 0, F.lit(_Q92_SPAM)).otherwise(F.lit("")),
        ).alias("text"),
    )
    return textstats.dup_ngram_char_fraction(corpus)


# --- Q93 weighted mixture sampling --------------------------------------------
@query(
    "q93_mixture_sample",
    oracle=r"""
WITH base AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(lower(text), '\s+')) AS t,
         1 + (CAST(substr(source, 4) AS INT) % 4) AS w
  FROM documents
),
per_src AS (SELECT source, MAX(w) AS w, SUM(t) AS src_toks FROM base GROUP BY source),
tot AS (SELECT SUM(src_toks) AS tot_toks, SUM(w) AS tot_w FROM per_src),
rates AS (
  SELECT source,
         LEAST(CAST(1.0 AS DOUBLE),
               CAST(0.6 AS DOUBLE) * tot_toks * w / tot_w / src_toks) AS rate
  FROM per_src, tot
)
SELECT b.doc_id, b.source, r.rate
FROM base b JOIN rates r USING (source)
WHERE CAST(CAST(('0x' || substr(md5('m' || CAST(b.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 1000000 AS DOUBLE) < r.rate * 1000000
ORDER BY b.doc_id
""",
)
def q93(spark, sf_dir):
    """Weighted mixture sampling (mixing.mixture_sample) — the data-mixing
    step: per-source target weights derived from the source number (1 + n%4,
    so targets are deliberately non-uniform over near-uniform sources),
    global budget 60% of corpus tokens.  Over-weighted small sources clip
    at rate 1 (kept whole), the rest down-sample content-addressed; both
    branches are live on the test corpus.  The corpus pays one filter
    pass; the rate table is two tiny broadcast aggregates."""
    from gofeed_spark.operators import mixing

    d = T(spark, sf_dir, "documents")
    w = 1 + (F.substring("source", 4, 10).cast("int") % 4)
    return mixing.mixture_sample(d, w, budget_frac=0.6)


# --- Q94 span-level exact-substring dedup -------------------------------------
_Q94_SHARED = " subscribe to our newsletter today for fresh updates and offers"


@query(
    "q94_duplicate_spans",
    oracle=r"""
WITH corpus AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 4 = 0
                 THEN ' subscribe to our newsletter today for fresh updates and offers'
                 ELSE '' END
         || CASE WHEN doc_id % 9 = 0
                 THEN ' unique trailing sentence number ' || CAST(doc_id AS VARCHAR)
                      || ' written just for this document'
                 ELSE '' END AS text
  FROM documents
),
toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM corpus),
sh AS (SELECT doc_id, i AS spos, array_to_string(tk[i:i+7], ' ') AS g
       FROM toks, LATERAL (SELECT UNNEST(range(1, len(tk) - 6)) AS i) t),
freq AS (SELECT g FROM sh GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
fl AS (SELECT DISTINCT s.doc_id, s.spos FROM sh s JOIN freq f USING (g)),
tokrows AS (SELECT doc_id, i AS tpos, tk[i] AS tok
            FROM toks, LATERAL (SELECT UNNEST(range(1, len(tk) + 1)) AS i) t),
kept AS (
  SELECT tr.doc_id, tr.tpos, tr.tok
  FROM tokrows tr
  WHERE NOT EXISTS (SELECT 1 FROM fl
                    WHERE fl.doc_id = tr.doc_id
                      AND tr.tpos BETWEEN fl.spos AND fl.spos + 7)
),
agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, len(tk) AS n_toks FROM toks)
SELECT c.doc_id, COALESCE(a.clean_text, '') AS clean_text,
       CAST(t.n_toks - COALESCE(a.n_kept, 0) AS INT) AS n_removed_tokens
FROM corpus c JOIN tot t USING (doc_id) LEFT JOIN agg a USING (doc_id)
ORDER BY c.doc_id
""",
)
def q94(spark, sf_dir):
    """Span-level exact-substring dedup (dedup.strip_duplicate_spans, the
    Lee et al. 2022 shape): cross-doc duplicated 8-token spans are removed
    from every doc.  Every 4th doc gets a shared 10-token promo sentence
    appended (3 fully-interior spans flag, their union strips all 10
    tokens while the organic prefix survives — boundary spans have df=1);
    every 9th doc gets a doc-unique 10-token tail (df=1, KEPT, pinning
    that merely-appended content survives).  Both engines build the same
    corpus; positions never cross engines, only the reassembled text."""
    d = T(spark, sf_dir, "documents")
    did = F.col("doc_id")
    corpus = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 4 == 0, F.lit(_Q94_SHARED)).otherwise(F.lit("")),
            F.when(
                did % 9 == 0,
                F.concat(
                    F.lit(" unique trailing sentence number "),
                    did.cast("string"),
                    F.lit(" written just for this document"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return dedup.strip_duplicate_spans(corpus, k=8)


# --- Q95 interval-containment join --------------------------------------------
@query(
    "q95_interval_join",
    oracle="""
WITH iv AS (
  SELECT user_id AS iv_id, MIN(ts) AS ivstart,
         MIN(ts) + INTERVAL 30 MINUTE AS ivend
  FROM events GROUP BY user_id
)
SELECT iv.iv_id, COUNT(*) AS n_overlap, MIN(e.event_id) AS first_event
FROM iv JOIN events e ON e.ts >= iv.ivstart AND e.ts <= iv.ivend
GROUP BY iv.iv_id ORDER BY iv.iv_id
""",
)
def q95(spark, sf_dir):
    """Interval-containment join WITHOUT an equi key (asof.interval_join):
    each user's first-30-minutes window joined against ALL events falling
    inside it (any user) — the op a naive formulation plans as a
    nested-loop cross product and the oracle states as a theta join; the
    engine runs it as a bin-bucketed equi-join (plan-lint clean).  µs
    epoch clock per the q31/q33 convention."""
    from gofeed_spark.operators.asof import interval_join

    e = T(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    iv = e.groupBy(F.col("user_id").alias("iv_id")).agg(
        F.min("ts_us").alias("start_us")
    ).withColumn("end_us", F.col("start_us") + F.lit(1_800_000_000))
    joined = interval_join(
        e.select("event_id", "ts_us"), iv, "ts_us", "start_us", "end_us"
    )
    return joined.groupBy("iv_id").agg(
        F.count("*").alias("n_overlap"),
        F.min("event_id").alias("first_event"),
    )


# --- Q96 cross-corpus fuzzy join ----------------------------------------------
@query(
    "q96_fuzzy_join",
    oracle=r"""
WITH ext AS (
  SELECT doc_id AS ext_id,
         array_to_string(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                     (x, i) -> i % 25 != 0), ' ') AS text
  FROM documents WHERE doc_id % 3 = 0
),
ls AS (
  SELECT doc_id, UNNEST(list_distinct([array_to_string(w[i:i+4], ' ')
                                       FOR i IN range(1, GREATEST(len(w)-4, 0)+1)])) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM documents)
),
rs AS (
  SELECT ext_id, UNNEST(list_distinct([array_to_string(w[i:i+4], ' ')
                                       FOR i IN range(1, GREATEST(len(w)-4, 0)+1)])) AS sh
  FROM (SELECT ext_id, regexp_split_to_array(lower(text), '\s+') AS w FROM ext)
),
lsz AS (SELECT doc_id, COUNT(*) AS n FROM ls GROUP BY doc_id),
rsz AS (SELECT ext_id, COUNT(*) AS n FROM rs GROUP BY ext_id),
shared AS (SELECT l.doc_id, r.ext_id, COUNT(*) AS shared
           FROM ls l JOIN rs r ON l.sh = r.sh GROUP BY 1, 2)
SELECT s.doc_id AS left_id, s.ext_id AS right_id,
       ROUND(CAST(shared AS DOUBLE) / (a.n + b.n - shared), 6) AS jac
FROM shared s JOIN lsz a USING (doc_id) JOIN rsz b USING (ext_id)
WHERE CAST(shared AS DOUBLE) / (a.n + b.n - shared) >= 0.5
ORDER BY left_id, right_id
""",
)
def q96(spark, sf_dir):
    """Cross-corpus fuzzy join (dedup.fuzzy_join_jaccard): the corpus
    matched against an 'external' table built from every 3rd doc with
    every 25th token dropped — perturbed clones land at Jaccard ~0.75+
    against their source (short docs match exactly), organic cross pairs
    are rare; threshold 0.5.  The shuffle-scale sibling of q87's
    broadcast decontamination: same banded machinery as q40, pairs
    restricted to cross-side before scoring."""
    from gofeed_spark.catalog import table_rowcount

    d = T(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    ext = d.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.array_join(
            F.filter(toks, lambda x, i: i % 25 != 24), " "
        ).alias("text"),
    )
    n = table_rowcount(sf_dir, "documents")
    return dedup.fuzzy_join_jaccard(
        d, ext, threshold=0.5, k=5, n_hint=n + (n // 3 + 1)
    )


# --- Q97 BM25 keyword retrieval -----------------------------------------------
@query(
    "q97_bm25_search",
    oracle=r"""
WITH base AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
lens AS (SELECT doc_id, len(tk) AS len_d FROM base),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(len_d AS DOUBLE)) AS avgdl FROM lens),
hits AS (SELECT b.doc_id, t.tok FROM base b, LATERAL UNNEST(b.tk) AS t(tok)
         WHERE t.tok IN ('hash', 'join', 'spark')),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM hits GROUP BY 1, 2),
dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok)
SELECT tf.doc_id,
       ROUND(SUM(
         ln((CAST(s.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)
            / (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0)
         * (tf.tf * CAST(2.2 AS DOUBLE))
         / (tf.tf + CAST(1.2 AS DOUBLE)
            * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * l.len_d / s.avgdl))
       ), 6) AS score
FROM tf JOIN dfreq USING (tok) JOIN lens l ON l.doc_id = tf.doc_id, stats s
GROUP BY tf.doc_id ORDER BY tf.doc_id
""",
)
def q97(spark, sf_dir):
    """BM25 keyword retrieval (search.bm25_scores) for the query
    ['hash', 'join', 'spark'] over the corpus — one corpus scan, hit-only
    shuffle, broadcast df/corpus stats; the oracle states the identical
    left-associative float chain, so scores hash-match at 6 decimals."""
    from gofeed_spark.operators.search import bm25_scores

    return bm25_scores(T(spark, sf_dir, "documents"), ["hash", "join", "spark"])


# --- Q98 dataset diff ---------------------------------------------------------
@query(
    "q98_dataset_diff",
    oracle="""
WITH v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN text || ' (edited)' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 20
),
o AS (SELECT doc_id, md5(text) AS ofp FROM documents),
n AS (SELECT doc_id, md5(text) AS nfp FROM v2)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.ofp <> n.nfp THEN 'modified' END AS change
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
WHERE (o.doc_id IS NULL OR n.doc_id IS NULL OR o.ofp <> n.nfp)
ORDER BY doc_id
""",
)
def q98(spark, sf_dir):
    """Dataset diff (io.dataset_diff) between the corpus and a simulated
    regeneration: every 13th doc dropped (removed), every 10th edited
    (modified), the first 20 re-issued under new ids (added) — both
    engines build the same v2, and unchanged docs produce NO rows (the
    audit of a 100 TB rebuild is its delta, not a full dump)."""
    from gofeed_spark.sources.io import dataset_diff

    d = T(spark, sf_dir, "documents")
    did = F.col("doc_id")
    v2 = (
        d.filter(did % 13 != 0)
        .select(
            "doc_id",
            F.when(did % 10 == 0, F.concat(F.col("text"), F.lit(" (edited)")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            d.filter(did < 20).select(
                (did + 1_000_000).alias("doc_id"), "text"
            )
        )
    )
    return dataset_diff(d, v2)


# --- Q99 composed pipeline: span dedup -> format rules -> verdict -------------
@query(
    "q99_pipeline_verdict",
    oracle=r"""
WITH corpus AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 4 = 0
                      THEN ' subscribe to our newsletter today for fresh updates and offers'
                      ELSE '' END AS text
  FROM documents
),
toks0 AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM corpus),
sh AS (SELECT doc_id, i AS spos, array_to_string(tk[i:i+7], ' ') AS g
       FROM toks0, LATERAL (SELECT UNNEST(range(1, len(tk) - 6)) AS i) t),
freq AS (SELECT g FROM sh GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
fl AS (SELECT DISTINCT s.doc_id, s.spos FROM sh s JOIN freq f USING (g)),
tokrows AS (SELECT doc_id, i AS tpos, tk[i] AS tok
            FROM toks0, LATERAL (SELECT UNNEST(range(1, len(tk) + 1)) AS i) t),
keptt AS (
  SELECT tr.doc_id, tr.tpos, tr.tok
  FROM tokrows tr
  WHERE NOT EXISTS (SELECT 1 FROM fl
                    WHERE fl.doc_id = tr.doc_id
                      AND tr.tpos BETWEEN fl.spos AND fl.spos + 7)
),
agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
               COUNT(*) AS n_kept
        FROM keptt GROUP BY doc_id),
tot AS (SELECT doc_id, len(tk) AS n_toks FROM toks0),
cleaned AS (
  SELECT c.doc_id, COALESCE(a.clean_text, '') AS text,
         CAST(t.n_toks - COALESCE(a.n_kept, 0) AS INT) AS n_removed_tokens
  FROM corpus c JOIN tot t USING (doc_id) LEFT JOIN agg a USING (doc_id)
),
f AS (
  SELECT doc_id, n_removed_tokens, LENGTH(text) AS n_chars,
         CAST(len(regexp_split_to_array(lower(text), '\s+')) AS DOUBLE) AS n_words,
         CAST(LENGTH(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS nonspace,
         CAST((LENGTH(text) - LENGTH(REPLACE(text, '#', '')))
              + (LENGTH(text) - LENGTH(REPLACE(text, '…', ''))) AS DOUBLE) AS n_sym,
         string_split(text, chr(10)) AS ls,
         regexp_split_to_array(lower(text), '\s+') AS toks
  FROM cleaned
),
g AS (
  SELECT doc_id, n_removed_tokens, n_chars,
         nonspace / n_words AS mean_wl,
         n_sym / n_words AS symbol_ratio,
         CAST(len(list_filter(ls, x -> starts_with(x, '- ')
                                    OR starts_with(x, '* ')
                                    OR starts_with(x, '• '))) AS DOUBLE)
           / len(ls) AS bullet_frac,
         CAST(len(list_filter(ls, x -> ends_with(x, '...')
                                    OR ends_with(x, '…'))) AS DOUBLE)
           / len(ls) AS ellipsis_frac,
         (CASE WHEN list_contains(toks, 'a')     THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'hash')  THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'join')  THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'value') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'row')   THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'table') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'key')   THEN 1 ELSE 0 END) AS stop_hits
  FROM f
)
SELECT doc_id, n_removed_tokens,
       CASE WHEN mean_wl >= 3.0 AND mean_wl <= 10.0
             AND symbol_ratio <= 0.1
             AND bullet_frac <= 0.9
             AND ellipsis_frac <= 0.3
             AND stop_hits >= 2
            THEN 1 ELSE 0 END AS gopher_ok,
       CASE WHEN mean_wl >= 3.0 AND mean_wl <= 10.0
             AND symbol_ratio <= 0.1
             AND bullet_frac <= 0.9
             AND ellipsis_frac <= 0.3
             AND stop_hits >= 2
             AND n_chars > 0
            THEN 1 ELSE 0 END AS keep
FROM g ORDER BY doc_id
""",
)
def q99(spark, sf_dir):
    """The composed corpus-prep pipeline as ONE declarative plan: span-level
    dedup strips the injected cross-doc promo (q94's machinery), the
    CLEANED text — not the raw text — then flows through the Gopher format
    rules (q91's operator), and the verdict keeps docs that pass the rules
    with content remaining.  Proves the operators compose: clean_text is a
    first-class column any downstream op consumes; Catalyst plans the
    whole chain in one job graph."""
    d = T(spark, sf_dir, "documents")
    did = F.col("doc_id")
    corpus = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 4 == 0, F.lit(_Q94_SHARED)).otherwise(F.lit("")),
        ).alias("text"),
    )
    cleaned = dedup.strip_duplicate_spans(corpus, k=8)
    # gopher_rules is a pure per-row projection, so the verdict composes
    # directly over the cleaned frame (keep_cols pass-through) — the
    # previous doc_id self-join recomputed the whole span-dedup subtree
    # on BOTH join sides (two extra shuffled passes at any scale).
    rules = textstats.gopher_rules(
        cleaned.select(
            "doc_id",
            "n_removed_tokens",
            F.length("clean_text").alias("__clen"),
            F.col("clean_text").alias("text"),
        ),
        stopwords=_Q91_STOPS,
        keep_cols=("n_removed_tokens", "__clen"),
    )
    keep = ((F.col("gopher_ok") == 1) & (F.col("__clen") > 0)).cast("int")
    return rules.select(
        "doc_id",
        "n_removed_tokens",
        "gopher_ok",
        keep.alias("keep"),
    )


# --- q100 incremental dedup: batch probe against a persisted MinHash index ---
@query(
    "q100_incremental_dedup",
    oracle=r"""
WITH batch AS (
  SELECT b.doc_id,
         CASE WHEN b.doc_id % 20 = 0 AND s.text IS NOT NULL
              THEN s.text ELSE b.text END AS text
  FROM documents b LEFT JOIN documents s ON s.doc_id = b.doc_id + 1
  WHERE b.doc_id % 10 = 0
),
corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
bfp AS (
  SELECT doc_id, md5(string_agg(DISTINCT sh, '|' ORDER BY sh)) AS fp
  FROM (SELECT doc_id, UNNEST(list_distinct([array_to_string(words[i:i+4], ' ')
                                             FOR i IN range(1, GREATEST(len(words)-4, 0)+1)])) AS sh
        FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM batch))
  GROUP BY doc_id
),
cfp AS (
  SELECT doc_id, md5(string_agg(DISTINCT sh, '|' ORDER BY sh)) AS fp
  FROM (SELECT doc_id, UNNEST(list_distinct([array_to_string(words[i:i+4], ' ')
                                             FOR i IN range(1, GREATEST(len(words)-4, 0)+1)])) AS sh
        FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM corpus))
  GROUP BY doc_id
)
SELECT b.doc_id AS new_id, MIN(c.doc_id) AS dup_of
FROM bfp b JOIN cfp c ON b.fp = c.fp
GROUP BY b.doc_id
ORDER BY new_id, dup_of
""",
)
def q100(spark, sf_dir):
    """Incremental near-dup detection — the append-only-corpus shape: the
    standing corpus (90% of docs) is signed ONCE into a persisted MinHash
    index (dedup.build_minhash_index), and an incoming batch (every 10th
    doc, with every 20th carrying a clone of corpus doc id+1 so true
    duplicates exist) probes it WITHOUT re-shuffling the corpus
    (dedup.probe_minhash_index: batch bands broadcast against two straight
    index scans).  threshold=1.0 makes the check exact: LSH bands find the
    candidates, but the verdict verifies on the index's stored shingle-set
    fingerprint (natural jac-0.99 pairs pass all 64 minhashes with p ≈ 0.5
    — estimator-only "exact" over-matches, measured on this corpus) —
    precisely the oracle's shingle-set-fingerprint equality join, so BOTH
    recall (every planted clone recovered) and precision (no spurious
    matches) are hash-checked.  The verdict is ONE witness per batch doc:
    fps/ keeps the MIN doc_id per distinct fingerprint (the clone-family
    representative — r8's fan-out cap), so the oracle groups its join to
    MIN(c.doc_id) too; at sf0.1 the corpus contains natural multi-member
    clone families (e.g. docs 669 and 1641 share a shingle set) where
    the enumerate-all form and the one-witness form genuinely differ.
    Rebuilds per run because the gate demands self-contained queries;
    production callers use ensure_minhash_index (fingerprint-guarded
    build-once).
    Reference parity: the change-feed model (watcher.go:89-122, new rows
    streaming past standing state) applied to corpus curation."""
    import shutil
    import tempfile

    docs = T(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    src = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("src_text")
    )
    batch = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .join(src, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 20 == 0) & F.col("src_text").isNotNull(),
                F.col("src_text"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    path = tempfile.mkdtemp(prefix="gofeed_q100_")
    try:
        dedup.build_minhash_index(corpus, path, num_hashes=64, bands=16, k=5)
        out = dedup.probe_minhash_index(spark, path, batch, threshold=1.0)
        return (
            out.select("new_id", "dup_of")
            .orderBy("new_id", "dup_of")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- q101 exact per-source cap (RefinedWeb per-domain quota) -----------------
@query(
    "q101_source_cap",
    oracle="""
SELECT doc_id, source,
       CAST(CASE WHEN ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('c' || CAST(doc_id AS VARCHAR)), doc_id) <= 20
         THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM documents ORDER BY doc_id
""",
)
def q101(spark, sf_dir):
    """Exact per-source document cap — the RefinedWeb/CCNet per-domain
    quota that stops any one domain dominating the training mix.
    Content-addressed selection (rank by md5 of the salted id within each
    source) so the surviving set is a pure function of the ids:
    reproducible across engines/re-shards, and stable as OTHER sources
    grow.  cap=20 against ~25 docs/source keeps both branches live.
    mixture_sample (q93) is the rate-based sibling; this is the hard
    quota (one windowed sort per source, externally spilled — no
    per-group buffering at any source size)."""
    from gofeed_spark.operators.mixing import source_cap

    return source_cap(T(spark, sf_dir, "documents"), cap=20).select(
        "doc_id", "source", "keep"
    ).orderBy("doc_id")


# --- q102 deterministic shard export -----------------------------------------
@query(
    "q102_shard_export",
    oracle="""
WITH h AS (
  SELECT doc_id, md5('x' || CAST(doc_id AS VARCHAR)) AS hx
  FROM documents
),
s AS (
  SELECT doc_id, hx,
         CAST(CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 8 AS INTEGER) AS shard
  FROM h
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS INTEGER) AS pos
FROM s ORDER BY doc_id
""",
)
def q102(spark, sf_dir):
    """Deterministic global shuffle for training export (io.shard_for_export):
    every doc gets a content-addressed (shard, pos) — a total order that is
    a pure function of the ids, so the exported file layout reproduces
    bit-identically on any engine or cluster size (rand()/repartition
    cannot).  One hash shuffle into 8 balanced shards + a per-shard
    external sort; `write.partitionBy('shard')` downstream materializes
    loader-ready files."""
    from gofeed_spark.sources.io import shard_for_export

    return shard_for_export(T(spark, sf_dir, "documents"), n_shards=8).select(
        "doc_id", "shard", "pos"
    ).orderBy("doc_id")


# --- q103 end-to-end curation export pipeline --------------------------------
@query(
    "q103_curation_export",
    oracle=r"""
WITH corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text, source FROM documents WHERE doc_id % 5 = 0
),
dedup AS (
  SELECT doc_id, text, source FROM (
    SELECT doc_id, text, source,
           ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM corpus) t
  WHERE rn = 1
),
f AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(lower(text), '\s+')) AS DOUBLE) AS n_words,
         CAST(LENGTH(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS nonspace,
         CAST((LENGTH(text) - LENGTH(REPLACE(text, '#', '')))
              + (LENGTH(text) - LENGTH(REPLACE(text, '…', ''))) AS DOUBLE) AS n_sym,
         string_split(text, chr(10)) AS ls,
         regexp_split_to_array(lower(text), '\s+') AS toks
  FROM dedup
),
g AS (
  SELECT doc_id FROM f
  WHERE nonspace / n_words >= 3.0 AND nonspace / n_words <= 10.0
    AND n_sym / n_words <= 0.1
    AND CAST(len(list_filter(ls, x -> starts_with(x, '- ')
                                   OR starts_with(x, '* ')
                                   OR starts_with(x, '• '))) AS DOUBLE) / len(ls) <= 0.9
    AND CAST(len(list_filter(ls, x -> ends_with(x, '...')
                                   OR ends_with(x, '…'))) AS DOUBLE) / len(ls) <= 0.3
    AND (CASE WHEN list_contains(toks, 'a')     THEN 1 ELSE 0 END
       + CASE WHEN list_contains(toks, 'hash')  THEN 1 ELSE 0 END
       + CASE WHEN list_contains(toks, 'join')  THEN 1 ELSE 0 END
       + CASE WHEN list_contains(toks, 'value') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(toks, 'row')   THEN 1 ELSE 0 END
       + CASE WHEN list_contains(toks, 'table') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(toks, 'key')   THEN 1 ELSE 0 END) >= 2
),
quality AS (SELECT d.doc_id, d.text, d.source FROM dedup d JOIN g USING (doc_id)),
base AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(lower(text), '\s+')) AS t,
         1 + (CAST(substr(source, 4) AS INT) % 4) AS w
  FROM quality
),
per_src AS (SELECT source, MAX(w) AS w, SUM(t) AS src_toks FROM base GROUP BY source),
tot AS (SELECT SUM(src_toks) AS tot_toks, SUM(w) AS tot_w FROM per_src),
rates AS (
  SELECT source,
         LEAST(CAST(1.0 AS DOUBLE),
               CAST(0.6 AS DOUBLE) * tot_toks * w / tot_w / src_toks) AS rate
  FROM per_src, tot
),
mixed AS (
  SELECT b.doc_id, b.source
  FROM base b JOIN rates r USING (source)
  WHERE CAST(CAST(('0x' || substr(md5('m' || CAST(b.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 1000000 AS DOUBLE) < r.rate * 1000000
),
s AS (
  SELECT doc_id, source, md5('x' || CAST(doc_id AS VARCHAR)) AS hx,
         CAST(CAST(('0x' || substr(md5('x' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % 8 AS INTEGER) AS shard
  FROM mixed
)
SELECT doc_id, source, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS INTEGER) AS pos
FROM s ORDER BY doc_id
""",
)
def q103(spark, sf_dir):
    """The END-TO-END curation-export pipeline as ONE declarative plan —
    the job a training-data team actually ships: exact dedup keep-first
    (clone-bearing corpus, q53's fixture) → Gopher format gate (q91's
    operator, corpus-adapted stopwords) → weighted mixture sampling to a
    60% token budget (q93's operator) → deterministic shard export
    (q102's operator).  Every stage is a registered operator; Catalyst
    fuses the whole chain into one job graph (the dedup window, the
    codegen quality pass, two tiny rate aggregates broadcast back, one
    hash shuffle for the export sort).  Content-addressed decisions at
    every stage mean the exported (shard, pos) layout reproduces
    bit-identically on any engine or cluster size — verified against the
    fully-composed SQL oracle."""
    from gofeed_spark.operators import mixing
    from gofeed_spark.sources.io import shard_for_export

    docs = T(spark, sf_dir, "documents").select("doc_id", "text", "source")
    clones = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + CLONE_OFFSET).alias("doc_id"), "text", "source"
    )
    corpus = docs.unionByName(clones)
    # Every stage COMPOSES over the previous frame instead of emitting an
    # id relation re-joined onto it (r17 optimization): the three
    # doc_id self-joins planned 3x the upstream subtree (AQE's
    # ReusedExchange recovered some at runtime, but the joins and their
    # exchanges were real).  Identical rows at every stage: the window is
    # dedup_keep_first's exact definition, the verdict is gopher_rules
    # with pass-through columns, the sample is mixture_sample's own
    # broadcast-rates filter (shared _keep_hash/mixture_rates code).
    from gofeed_spark.operators.mixing import _keep_hash, mixture_rates
    from pyspark.sql import Window

    kw = Window.partitionBy("text").orderBy("doc_id")
    deduped = (
        corpus.withColumn("__rn", F.row_number().over(kw))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    quality = textstats.gopher_rules(
        deduped, stopwords=_Q91_STOPS, keep_cols=("text", "source")
    ).filter(F.col("gopher_ok") == 1).select("doc_id", "text", "source")
    w = 1 + (F.substring("source", 4, 10).cast("int") % 4)
    rates = mixture_rates(quality, w, budget_frac=0.6)
    survivors = quality.join(F.broadcast(rates), "source").filter(
        _keep_hash("doc_id", "m").cast("double") < F.col("rate") * 1_000_000
    )
    return (
        shard_for_export(survivors, n_shards=8)
        .select("doc_id", "source", "shard", "pos")
        .orderBy("doc_id")
    )


# --- q104 corpus-trained unigram LM quality score -----------------------------
@query(
    "q104_unigram_logprob",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(lower(text), '\s+')) AS tok
  FROM documents
),
freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT SUM(c) AS T FROM freq),
scored AS (
  SELECT t.doc_id,
         COUNT(*) AS n_tokens,
         -AVG(log2(CAST(f.c AS DOUBLE) / tt.T)) AS xent
  FROM toks t JOIN freq f USING (tok), tot tt
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       ROUND(xent, 6) AS xent_bits,
       CAST(CASE WHEN xent <= 12.0 THEN 1 ELSE 0 END AS INT) AS keep
FROM scored ORDER BY doc_id
""",
)
def q104(spark, sf_dir):
    """Corpus-trained unigram LM quality score (textstats.unigram_logprob_score)
    — the CCNet LM-perplexity filter shape with the model trained on the
    corpus itself: per-doc cross-entropy in bits/token under the corpus
    unigram distribution + keep flag.  One slim hashed-token explode, a
    map-side-combinable vocab aggregate, broadcast scalar total, equi-join
    score — no Python, no model artifact."""
    return textstats.unigram_logprob_score(
        T(spark, sf_dir, "documents")
    ).orderBy("doc_id")


# --- q105 URL hygiene: canonicalize + domain + blocklist ----------------------
@query(
    "q105_url_canonicalize",
    oracle=r"""
WITH raw AS (
  SELECT doc_id,
         'HTTPS://WWW.' || upper(source) || '.Example.COM/docs/'
         || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 3 = 0
                 THEN '/?utm_source=feed&utm_campaign=x&ref=' || CAST(doc_id AS VARCHAR)
                 ELSE '/' END
         || CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END AS url
  FROM documents
),
c1 AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(url, '#.*$', ''),
                   '([?&])utm_[A-Za-z_]+=[^&]*', '\1', 'g'),
                 '&&+', '&', 'g'),
               '\?&', '?'),
             '[?&]+$', ''),
           '/+(\?|$)', '\1', 'g') AS u
  FROM raw
),
c2 AS (
  SELECT doc_id,
         lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)', 1))
           || substr(u, LENGTH(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)', 1)) + 1)
           AS url_canon
  FROM c1
),
c3 AS (
  SELECT doc_id, url_canon,
         regexp_extract(url_canon, '^[a-z][a-z0-9+.-]*://(?:www\.)?([^/:?]+)', 1) AS domain
  FROM c2
)
SELECT doc_id, url_canon, domain,
       CAST(CASE WHEN domain IN ('src3.example.com', 'src7.example.com')
            THEN 1 ELSE 0 END AS INT) AS blocked
FROM c3 ORDER BY doc_id
""",
)
def q105(spark, sf_dir):
    """URL hygiene (operators/urls.py) — the pre-content gate of a web
    pipeline: canonicalize (fragment dropped, utm_* stripped with
    separator cleanup, scheme+host lowercased, trailing slash removed),
    extract the domain, verdict against a blocklist.  URLs are
    synthesized deterministically from (source, doc_id) — mixed-case
    host, tracking params on every 3rd doc, fragments on every 5th, so
    every canonicalization rule fires on real rows.  One codegen
    projection pass, no shuffle, no Python."""
    from gofeed_spark.operators.urls import with_url_verdict

    d = T(spark, sf_dir, "documents").select("doc_id", "source")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper("source"),
        F.lit(".Example.COM/docs/"),
        sid,
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("/?utm_source=feed&utm_campaign=x&ref="), sid),
        ).otherwise(F.lit("/")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    out = with_url_verdict(
        d.withColumn("url", url),
        blocklist=("src3.example.com", "src7.example.com"),
    )
    return out.select("doc_id", "url_canon", "domain", "blocked").orderBy("doc_id")


# --- q106 corpus-trained bigram LM coherence score ----------------------------
@query(
    "q106_bigram_logprob",
    oracle=r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM documents
),
bg AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM t, UNNEST(range(1, len(w))) AS r(i)
  WHERE len(w) >= 2
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
scored AS (
  SELECT b.doc_id, COUNT(*) AS n,
         -AVG(log2(CAST(x.c12 AS DOUBLE) / y.c1)) AS xent
  FROM bg b JOIN c12 x USING (w1, w2) JOIN c1 y USING (w1)
  GROUP BY b.doc_id
)
SELECT doc_id, CAST(n AS INT) AS n_bigrams,
       ROUND(xent, 6) AS xent2_bits,
       CAST(CASE WHEN xent <= 8.0 THEN 1 ELSE 0 END AS INT) AS keep
FROM scored ORDER BY doc_id
""",
)
def q106(spark, sf_dir):
    """Bigram LM coherence score (textstats.bigram_logprob_score) — q104's
    conditional twin: cross-entropy under p(w2|w1) trained on the corpus,
    catching locally-incoherent text unigram frequency misses.  Bigrams
    form in one array projection (no token self-join); only the two count
    aggregates and slim hashed-key score joins go wide."""
    return textstats.bigram_logprob_score(
        T(spark, sf_dir, "documents")
    ).orderBy("doc_id")


# --- q107 rule-based topic tagging -------------------------------------------
_Q107_TAXONOMY = {
    "compute": ("spark", "hash", "join", "scan"),
    "data": ("data", "stream", "key", "value"),
    "storage": ("table", "row", "batch", "part"),
}


@query(
    "q107_keyword_classify",
    oracle=r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents
),
s AS (
  SELECT doc_id,
         (CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'hash')  THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'join')  THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'scan')  THEN 1 ELSE 0 END) AS s_compute,
         (CASE WHEN list_contains(toks, 'data')   THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'stream') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'key')    THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'value')  THEN 1 ELSE 0 END) AS s_data,
         (CASE WHEN list_contains(toks, 'table') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'row')   THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'batch') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(toks, 'part')  THEN 1 ELSE 0 END) AS s_storage
  FROM t
)
SELECT doc_id,
       CASE WHEN GREATEST(s_compute, s_data, s_storage) = 0 THEN 'other'
            WHEN s_compute = GREATEST(s_compute, s_data, s_storage) THEN 'compute'
            WHEN s_data = GREATEST(s_compute, s_data, s_storage) THEN 'data'
            ELSE 'storage' END AS label,
       CAST(GREATEST(s_compute, s_data, s_storage) AS INT) AS label_hits
FROM s ORDER BY doc_id
""",
)
def q107(spark, sf_dir):
    """Rule-based topic tagging (textstats.keyword_classify) — domain
    labels before mixture weighting, the cheap classifier-apply shape (a
    learned model deploys as the same plan): per-label keyword-hit
    counts, argmax with lexicographic ties, no hits → 'other'.  One
    codegen projection, taxonomy keyed to the corpus vocabulary so all
    labels (and the tie path) occur."""
    return textstats.keyword_classify(
        T(spark, sf_dir, "documents"), _Q107_TAXONOMY
    ).orderBy("doc_id")


# --- q108 adaptive per-source length filter ----------------------------------
@query(
    "q108_relative_length_filter",
    oracle="""
WITH b AS (
  SELECT source,
         quantile_cont(n_chars, 0.05) AS lo_b,
         quantile_cont(n_chars, 0.95) AS hi_b
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, CAST(d.n_chars AS INT) AS length,
       ROUND(b.lo_b, 4) AS lo_bound, ROUND(b.hi_b, 4) AS hi_bound,
       CAST(CASE WHEN d.n_chars >= b.lo_b AND d.n_chars <= b.hi_b
            THEN 1 ELSE 0 END AS INT) AS keep
FROM documents d JOIN b USING (source)
ORDER BY d.doc_id
""",
)
def q108(spark, sf_dir):
    """Adaptive per-source length filter (textstats.relative_length_filter)
    — percentile bounds per source instead of a global threshold, so no
    source's length norm mis-filters another's.  One percentile aggregate
    to a tiny bounds table broadcast back over the scan; exact
    interpolated percentiles match quantile_cont (q64's precedent)."""
    return textstats.relative_length_filter(
        T(spark, sf_dir, "documents")
    ).orderBy("doc_id")


# --- q109 filtered ANN: metadata predicate inside the pruned probe -----------
@query(
    "q109_filtered_ann",
    oracle="""
SELECT 1 AS rank, MAX(vec_id) + 10000000 AS neighbor_id FROM embeddings
""",
)
def q109(spark, sf_dir):
    """FILTERED vector search — the metadata-predicate probe every vector
    store ships (search only rows with label = X): q79's partition-pruned
    SRP layout built with `meta_cols=('label',)`, probed with a `where`
    on the metadata column.  The predicate lands in the scan's
    PushedFilters BESIDE the bucket PartitionFilters (plan-asserted in
    tests/test_plans.py), so the filter costs row-group pruning, not a
    post-scan pass.  The query's clone carries a label no corpus row has
    (99) — the filtered probe must return exactly it, while unfiltered
    it would tie with the query's own bucket cohort."""
    import shutil
    import tempfile

    emb = T(spark, sf_dir, "embeddings")
    agg = emb.agg(
        F.max("vec_id").alias("max_id"),
        F.first(
            F.when(F.col("vec_id") == 1, F.col("embedding")), ignorenulls=True
        ).alias("qv"),
    ).collect()[0]
    max_id, query_vec = int(agg["max_id"]), agg["qv"]
    clone = emb.filter(F.col("vec_id") == 1).select(
        F.lit(max_id + 10_000_000).cast("long").alias("vec_id"),
        "embedding",
        F.lit(99).cast("int").alias("label"),
    )
    corpus = emb.unionByName(clone)
    path = tempfile.mkdtemp(prefix="gofeed_q109_")
    try:
        similarity.build_ann_index(
            corpus, path, n_planes=4, dim=64, meta_cols=("label",)
        )
        out = similarity.probe_ann_index(
            spark, path, query_vec, k=3, n_planes=4, dim=64,
            where=F.col("label") == 99,
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- q110 zlib compression-ratio quality signal (rows-only: zlib has no
# SQL twin; semantics carried by unit + determinism tests) --------------------
@query("q110_compression_ratio")
def q110(spark, sf_dir):
    """zlib compression-ratio quality signal (textstats.compression_ratio)
    — the templated/degenerate-text detector beside the Gopher rules:
    ratio = deflate(text)/len(text), keep at >= 0.25.  One no-shuffle
    Arrow pass; deterministic for the fixed zlib level (re-shard-invariant,
    asserted in tests).  Registered rows-only: zlib is not SQL-expressible,
    so the driver checks row count/schema and the unit tests carry the
    semantics (the one operator class where that trade is right)."""
    return textstats.compression_ratio(
        T(spark, sf_dir, "documents")
    ).orderBy("doc_id")


# --- q111 URL-level recrawl dedup --------------------------------------------
@query(
    "q111_url_recrawl_dedup",
    oracle=r"""
WITH raw AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/'
         || CAST(doc_id % 100 AS VARCHAR)
         || CASE WHEN doc_id % 2 = 0 THEN '/?utm_ref=' || CAST(doc_id AS VARCHAR)
                 ELSE '/' END AS url
  FROM documents
),
canon AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(url, '([?&])utm_[A-Za-z_]+=[^&]*', '\1', 'g'),
                 '&&+', '&', 'g'),
               '\?&', '?'),
             '[?&]+$', ''),
           '/+(\?|$)', '\1', 'g') AS url_canon
  FROM raw
)
SELECT doc_id, url_canon,
       CAST(CASE WHEN ROW_NUMBER() OVER (
           PARTITION BY url_canon ORDER BY doc_id) = 1
         THEN 1 ELSE 0 END AS INT) AS keep
FROM canon ORDER BY doc_id
""",
)
def q111(spark, sf_dir):
    """URL-level recrawl dedup — the FIRST dedup stage of a web pipeline
    (strictly cheaper than any content pass: recrawls and tracking-param
    variants collapse on the canonical URL before a byte of text is
    compared).  URLs synthesize so each canonical collides across ~5
    recrawls (path = id mod 100 per source; odd/even ids differ only by a
    utm param the canonicalizer strips); keep = first doc id per
    canonical.  One projection + one hash-partitioned window — no joins,
    no Python."""
    from pyspark.sql import Window

    from gofeed_spark.operators.urls import canonicalize_url

    d = T(spark, sf_dir, "documents").select("doc_id", "source")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        (F.col("doc_id") % 100).cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.lit("/?utm_ref="), sid)
        ).otherwise(F.lit("/")),
    )
    canon = d.select("doc_id", canonicalize_url(url).alias("url_canon"))
    w = Window.partitionBy("url_canon").orderBy("doc_id")
    return canon.select(
        "doc_id",
        "url_canon",
        (F.row_number().over(w) == 1).cast("int").alias("keep"),
    ).orderBy("doc_id")


# --- q112/q113 perceptual-hash media dedup -----------------------------------
# The oracle must REPRODUCE the stub dHash in SQL: strip byte i =
# sha256-digest byte (i mod 32); bit r*8+c set iff strip[r*9+c] >
# strip[r*9+c+1].  Byte values come from the hex string via a
# position-in-'0123456789abcdef' lookup; the 32 byte columns and 64 bit
# terms are GENERATED here so both q112 and q113 share one definition.
def _phash_oracle_cte(corpus_sql: str) -> str:
    hv = "(strpos('0123456789abcdef', substr(hx, {pos}, 1)) - 1)"
    bytes_sql = ",\n         ".join(
        f"({hv.format(pos=2 * i + 1)} * 16 + {hv.format(pos=2 * i + 2)}) AS b{i}"
        for i in range(32)
    )
    hi_terms, lo_terms = [], []
    for r in range(8):
        for c in range(8):
            k = r * 8 + c
            i1 = (r * 9 + c) % 32
            i2 = (r * 9 + c + 1) % 32
            term = (
                f"(CASE WHEN b{i1} > b{i2} THEN CAST(1 AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END << {k if k < 32 else k - 32})"
            )
            (lo_terms if k < 32 else hi_terms).append(term)
    return f"""
h AS (SELECT media_id, sha256(text) AS hx FROM ({corpus_sql})),
b AS (SELECT media_id,
         {bytes_sql}
      FROM h),
p AS (SELECT media_id,
         {" + ".join(hi_terms)} AS ph_hi,
         {" + ".join(lo_terms)} AS ph_lo
      FROM b)"""


@query(
    "q112_media_phash",
    oracle="WITH "
    + _phash_oracle_cte("SELECT doc_id AS media_id, text FROM documents")
    + "\nSELECT media_id, ph_hi, ph_lo FROM p ORDER BY media_id",
)
def q112(spark, sf_dir):
    """Perceptual media hash (multimodal.media_dhash): every document's
    bytes as an opaque media blob → 64-bit dHash over the decoded pixel
    strip, as (ph_hi, ph_lo) 32-bit halves.  In this container the decode
    is the deterministic sha-derived stub strip — which the DuckDB oracle
    reproduces bit-for-bit (hex-digit arithmetic + the same 64
    adjacent-byte comparisons), so the whole hash path is value-checked,
    not just row-counted.  One Arrow pass, no shuffle.
    Reference parity: none (the reference has no media surface); public
    technique (difference hash)."""
    media = multimodal.docs_as_media(T(spark, sf_dir, "documents"))
    return multimodal.media_dhash(media).orderBy("media_id")


@query(
    "q113_media_phash_dedup",
    oracle="WITH corpus AS (\n"
    "  SELECT d.doc_id AS media_id,\n"
    "         CASE WHEN d.doc_id % 10 = 0 AND s.text IS NOT NULL\n"
    "              THEN s.text ELSE d.text END AS text\n"
    "  FROM documents d LEFT JOIN documents s ON s.doc_id = d.doc_id - 1\n"
    "),\n"
    + _phash_oracle_cte("SELECT media_id, text FROM corpus")
    + """
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(bit_count(xor(a.ph_hi, b.ph_hi))
          + bit_count(xor(a.ph_lo, b.ph_lo)) AS BIGINT) AS hamming
FROM p a JOIN p b ON a.media_id < b.media_id
WHERE bit_count(xor(a.ph_hi, b.ph_hi)) + bit_count(xor(a.ph_lo, b.ph_lo)) <= 4
ORDER BY media_a, media_b
""",
)
def q113(spark, sf_dir):
    """Media near-dup dedup end-to-end: every 10th doc's media blob is an
    EXACT clone of its predecessor's, and the banded perceptual-hash
    kernel (multimodal.media_neardup_pairs → dedup.hash64_band_pairs, the
    same 16-bit-band + star-guard machinery text SimHash uses) must
    recover exactly those pairs.  The oracle computes the same stub
    hashes in SQL and takes ALL pairs within Hamming 4 — so the check
    also proves the banded candidate generation loses nothing the
    brute-force all-pairs scan finds (with stub hashes only exact clones
    land within the bound; real decoders put re-encoded images there
    too).  100 TB posture: 8-byte fingerprints, band-collision
    candidates only, hot meme families star-compressed."""
    d = T(spark, sf_dir, "documents")
    src = d.select(
        (F.col("doc_id") + 1).alias("media_id"), F.col("text").alias("src_text")
    )
    corpus = (
        d.select(F.col("doc_id").alias("media_id"), "text")
        .join(src, "media_id", "left")
        .select(
            "media_id",
            F.when(
                (F.col("media_id") % 10 == 0) & F.col("src_text").isNotNull(),
                F.col("src_text"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    media = corpus.select(
        "media_id", F.encode("text", "utf-8").alias("content")
    ).withColumn("media_type", F.lit("image"))
    return (
        multimodal.media_neardup_pairs(media, max_hamming=4)
        .select("media_a", "media_b", F.col("hamming").cast("long").alias("hamming"))
        .orderBy("media_a", "media_b")
    )


# --- q114/q115 media embeddings + audio features ------------------------------
def _sha_vec_sql(dim: int) -> str:
    """DuckDB list literal reproducing media_embedding's JVM stub exactly:
    element i = digest byte i / 255.0 (exact double arithmetic both
    sides — no float32 in the path)."""
    hv = "(strpos('0123456789abcdef', substr(hx, {pos}, 1)) - 1)"
    elems = ", ".join(
        f"CAST({hv.format(pos=2 * i + 1)} * 16 + {hv.format(pos=2 * i + 2)} AS DOUBLE) / 255.0"
        for i in range(dim)
    )
    return f"[{elems}]"


@query(
    "q114_media_knn",
    oracle=f"""
WITH h AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents),
v AS (SELECT media_id, {_sha_vec_sql(8)} AS vec FROM h),
q AS (SELECT vec AS qe FROM v WHERE media_id = 7),
s AS (
  SELECT v.media_id,
         list_dot_product(v.vec, q.qe)
           / (SQRT(list_dot_product(v.vec, v.vec))
              * SQRT(list_dot_product(q.qe, q.qe))) AS cos
  FROM v, q WHERE v.media_id <> 7)
SELECT CAST(rn AS INTEGER) AS rank, media_id AS neighbor_id
FROM (SELECT media_id, ROW_NUMBER() OVER (ORDER BY cos DESC, media_id) AS rn FROM s) t
WHERE rn <= 10 ORDER BY rank
""",
)
def q114(spark, sf_dir):
    """Media similarity search end-to-end: blobs → media_embedding (the
    content-tier encoder; these text-byte blobs are neither PNG nor WAV,
    so every row takes the deterministic sha tier, whose doubles the
    oracle reproduces digit-for-digit — real image/audio blobs get
    grid-luma / pooled-MFCC content features instead, locality-tested in
    tests/test_multimodal.py) → the SAME brute top-k cosine kernel text
    vectors use (similarity.brute_topk, q34's operator).  Proves the
    multimodal column feeds the vector stack unchanged; the ANN-index
    variant over the same embeddings is recall-gated in
    tests/test_multimodal.py (approximate — outside the exact oracle).
    Reference parity: none (no media surface in the reference)."""
    media = multimodal.docs_as_media(T(spark, sf_dir, "documents"))
    emb = multimodal.media_embedding(media, dim=8)
    return similarity.brute_topk(
        emb, query_id=7, k=10, id_col="media_id", vec_col="embedding"
    )


@query(
    "q115_audio_features",
    oracle="WITH "
    + _phash_oracle_cte("SELECT doc_id AS media_id, text FROM documents").split(
        ",\nb AS"
    )[0]
    + """,
b AS (SELECT media_id,
         """
    + ",\n         ".join(
        f"((strpos('0123456789abcdef', substr(hx, {2 * i + 1}, 1)) - 1) * 16 + "
        f"(strpos('0123456789abcdef', substr(hx, {2 * i + 2}, 1)) - 1)) AS b{i}"
        for i in range(32)
    )
    + """
      FROM h)
SELECT media_id, CAST(f.f AS INT) AS frame, CAST(c.c AS INT) AS coeff,
       CAST(CASE (f.f * 13 + c.c) % 32
"""
    + "".join(f"         WHEN {i} THEN b{i}\n" for i in range(32))
    + """       END AS DOUBLE) / 255.0 AS value
FROM b,
     (SELECT UNNEST(range(0, 4)) AS f) f,
     (SELECT UNNEST(range(0, 13)) AS c) c
ORDER BY media_id, frame, coeff
""",
)
def q115(spark, sf_dir):
    """Audio featurization plumbing (multimodal.extract_audio_features):
    one MFCC-shaped row per analysis frame per blob, flattened to
    (media_id, frame, coeff, value) so the DuckDB oracle can value-check
    the WHOLE stub matrix (librosa is absent in this container; the stub
    derives each coefficient from the digest byte (frame*13+coeff) mod 32
    — the oracle reproduces it with hex arithmetic + a CASE over the 32
    bytes).  Arrow-batched per-frame fan-out, no shuffle."""
    media = multimodal.docs_as_media(T(spark, sf_dir, "documents"))
    af = multimodal.extract_audio_features(media, n_mfcc=13, n_frames=4)
    return af.select(
        "media_id",
        "frame",
        F.posexplode("mfcc").alias("coeff", "value"),
    ).orderBy("media_id", "frame", "coeff")


# --- q116/q117 real BPE tokenization -----------------------------------------
@query(
    "q116_bpe_word_freqs",
    oracle="""
WITH words AS (
  SELECT w AS word FROM documents,
         UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS t(w)
  WHERE w <> ''
)
SELECT word, COUNT(*) AS n FROM words
GROUP BY word ORDER BY n DESC, word LIMIT 2000
""",
)
def q116(spark, sf_dir):
    """The distributed stage of BPE training (operators/bpe.py): exact
    corpus word frequencies — explode + one map-side-combinable wide
    aggregate, capped deterministically (count desc, word) so the
    driver-side merge trainer sees a bounded table at ANY corpus size.
    This is the only part of tokenizer training that touches the corpus;
    it is SQL-exact, so it carries the oracle for the BPE stack.
    Reference parity: none (no tokenizer surface in the reference)."""
    return bpe.word_frequencies(
        T(spark, sf_dir, "documents"), max_words=2000
    ).orderBy(F.desc("n"), "word")


@query("q117_bpe_tokens")
def q117(spark, sf_dir):
    """Distributed BPE encode under a corpus-trained merge list
    (operators/bpe.py, Sennrich et al. 2016): train on the exact
    frequency table (driver-side, deterministic — ties lexicographic),
    then one Arrow mapInPandas pass encodes every doc; the merges ride
    as a closure constant, zero shuffles.  Registered rows-only — the
    per-word merge reduction is iterative, not SQL-expressible; the
    semantics are pinned by unit tests (hand-computed merges,
    reversibility: a word's tokens concatenate back to the word) and a
    re-shard determinism twin, the q110 trade."""
    docs = T(spark, sf_dir, "documents")
    merges = bpe.train_bpe(docs, num_merges=200, max_words=2000)
    seg = bpe.bpe_segments(docs, merges)
    return seg.select(
        "doc_id",
        "n_tokens",
        F.size(F.array_distinct("tokens")).alias("n_unique"),
    ).orderBy("doc_id")


# --- q118 WARC ingest round trip ---------------------------------------------
@query(
    "q118_warc_ingest",
    oracle="""
SELECT 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
       'response' AS rec_type,
       CAST(200 AS INTEGER) AS http_status,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS body_len
FROM documents
ORDER BY url
""",
)
def q118(spark, sf_dir):
    """WARC container round trip (sources/warc.py — ISO 28500, the
    format web corpora arrive in): the documents table exports as
    gzip-member WARC archives DISTRIBUTED (one archive per partition,
    response records with HTTP envelopes), then reads back through the
    binaryFile + Arrow parse path; the oracle reproduces the surviving
    metadata (url, status, byte length) straight from the table, so the
    whole container encode→decode→HTTP-strip chain is value-checked.
    Reference parity: none (the reference ingests from SQL, not crawls)."""
    import shutil
    import tempfile

    from gofeed_spark.sources import warc as W

    docs = T(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode("text", "utf-8").alias("body"),
    )
    out_dir = tempfile.mkdtemp(prefix="gofeed_q118_")
    try:
        # archives are the read-side parallelism unit (one task each):
        # scale their count with the corpus (~5k records per archive,
        # Common Crawl keeps archives bounded the same way) — at the
        # sf0.01 gate this stays 4, so oracle outputs are unchanged
        n_arch = W.archive_count(docs.count(), spark.sparkContext.defaultParallelism)
        W.export_warc(docs, out_dir, n_archives=n_arch).collect()  # materialize
        back = W.read_warc(spark, out_dir + "/*.warc.gz")
        return (
            back.select(
                "url",
                "rec_type",
                "http_status",
                F.octet_length("body").cast("long").alias("body_len"),
            )
            .orderBy("url")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


# --- q119 composed crawl-ingest pipeline -------------------------------------
@query(
    "q119_crawl_pipeline",
    oracle=r"""
WITH raw AS (
  SELECT doc_id, text,
         'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
  UNION ALL
  SELECT doc_id, text,
         'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
           || '?utm_src=recrawl' AS url
  FROM documents WHERE doc_id % 5 = 0
),
canon AS (
  SELECT text, url,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(url, '([?&])utm_[A-Za-z_]+=[^&]*', '\1', 'g'),
                 '&&+', '&', 'g'),
               '\?&', '?'),
             '[?&]+$', ''),
           '/+(\?|$)', '\1', 'g') AS url_canon
  FROM raw
),
kept AS (
  SELECT url_canon, text,
         ROW_NUMBER() OVER (PARTITION BY url_canon ORDER BY url) AS rn
  FROM canon
)
SELECT url_canon,
       CAST(length(string_split_regex(trim(text), '\s+')) AS INT) AS n_words
FROM kept WHERE rn = 1 ORDER BY url_canon
""",
)
def q119(spark, sf_dir):
    """The composed CRAWL-INGEST pipeline as one declarative chain — the
    ingestion-side sibling of q103's curation-export: WARC archives
    (sources/warc.py; the corpus exported WITH recrawl records — every
    5th doc appears again under a tracking-param URL variant) → read back
    distributed → URL canonicalization (q105 operator) → recrawl
    keep-first per canonical URL (q111 shape; the variant rows vanish
    here, non-vacuously) → token-count quality signal.  Catalyst plans
    everything after the archive scan as one job graph; the oracle
    reproduces the canonical-URL chain, the dedup window and the counts
    straight from the documents table, value-checking the WHOLE path
    including the container round trip."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from gofeed_spark.operators.urls import canonicalize_url
    from gofeed_spark.sources import warc as W

    docs = T(spark, sf_dir, "documents")
    base = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode("text", "utf-8").alias("body"),
    )
    recrawls = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"), F.lit("?utm_src=recrawl"),
        ).alias("url"),
        F.encode("text", "utf-8").alias("body"),
    )
    out_dir = tempfile.mkdtemp(prefix="gofeed_q119_")
    try:
        crawl = base.unionByName(recrawls)
        # ~5k records per archive (see q118): read-side parallelism
        # scales with the corpus; 4 at the sf0.01 gate (outputs unchanged)
        n_arch = W.archive_count(crawl.count(), spark.sparkContext.defaultParallelism)
        W.export_warc(crawl, out_dir, n_archives=n_arch).collect()
        back = W.read_warc(spark, out_dir + "/*.warc.gz").select(
            "url", F.decode("body", "utf-8").alias("text")
        )
        canon = back.withColumn("url_canon", canonicalize_url(F.col("url")))
        kept = (
            canon.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("url_canon").orderBy("url")
                ),
            )
            .filter(F.col("rn") == 1)
        )
        return (
            kept.select(
                "url_canon",
                F.size(F.split(F.trim("text"), r"\s+")).alias("n_words"),
            )
            .orderBy("url_canon")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


# --- q121 TF-IDF keyword extraction ------------------------------------------
@query(
    "q121_tfidf_keywords",
    oracle="""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents,
       LATERAL (SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-z0-9]+')) AS tok) t
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         tf.tf * (LN((nd.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0) AS score
  FROM tf JOIN dfreq USING (tok), nd
)
SELECT doc_id, CAST(rn AS INT) AS rank, tok AS token, ROUND(score, 6) AS score
FROM (SELECT doc_id, tok, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rn
      FROM scored) x
WHERE rn <= 3 ORDER BY doc_id, rank
""",
)
def q121(spark, sf_dir):
    """Per-doc keyword metadata (operators/search.py:tfidf_keywords) —
    smoothed TF-IDF, top-3 per doc, rank ties on the token string.  The
    df relation scales with vocabulary so it shuffles (never broadcast);
    only the 1-row corpus count N broadcasts."""
    from gofeed_spark.operators.search import tfidf_keywords

    return tfidf_keywords(T(spark, sf_dir, "documents"), top_k=3)


# Shared CTE chain for q122/q123: 2 Lloyd iterations from the sorted-id
# init, ties to the lowest cluster, emptied clusters keep the previous
# centroid — the exact contract operators/clustering.py implements.
_KMEANS_SRC = "embeddings"  # q127 substitutes a filtered sub-corpus

_KMEANS_CTES = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src}),
c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cl, v
       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8) t),
a0 AS (SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
       FROM (SELECT e.vec_id, c.cl,
                    list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c.v)
                      + list_dot_product(c.v, c.v) AS d
             FROM e, c0 c) s),
a0f AS (SELECT vec_id, cl FROM a0 WHERE rn = 1),
m1 AS (SELECT a.cl, t.i, AVG(e.v[t.i]) AS m
       FROM a0f a JOIN e USING (vec_id),
            LATERAL (SELECT UNNEST(range(1, len(e.v)+1)) AS i) t
       GROUP BY a.cl, t.i),
c1n AS (SELECT cl, list(m ORDER BY i) AS v FROM m1 GROUP BY cl),
c1 AS (SELECT c0.cl, COALESCE(c1n.v, c0.v) AS v FROM c0 LEFT JOIN c1n USING (cl)),
a1 AS (SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
       FROM (SELECT e.vec_id, c.cl,
                    list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c.v)
                      + list_dot_product(c.v, c.v) AS d
             FROM e, c1 c) s),
a1f AS (SELECT vec_id, cl FROM a1 WHERE rn = 1),
m2 AS (SELECT a.cl, t.i, AVG(e.v[t.i]) AS m
       FROM a1f a JOIN e USING (vec_id),
            LATERAL (SELECT UNNEST(range(1, len(e.v)+1)) AS i) t
       GROUP BY a.cl, t.i),
c2n AS (SELECT cl, list(m ORDER BY i) AS v FROM m2 GROUP BY cl),
c2 AS (SELECT c1.cl, COALESCE(c2n.v, c1.v) AS v FROM c1 LEFT JOIN c2n USING (cl)),
a2 AS (SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
       FROM (SELECT e.vec_id, c.cl,
                    list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c.v)
                      + list_dot_product(c.v, c.v) AS d
             FROM e, c2 c) s),
a2f AS (SELECT vec_id, cl FROM a2 WHERE rn = 1)
"""


# --- q122 distributed k-means over the embedding corpus ----------------------
@query(
    "q122_kmeans_embeddings",
    oracle=_KMEANS_CTES.format(src=_KMEANS_SRC)
    + """
SELECT vec_id, CAST(cl AS INT) AS cluster FROM a2f ORDER BY vec_id
""",
)
def q122(spark, sf_dir):
    """Iterative Lloyd's k-means (operators/clustering.py) — each round is
    ONE Arrow map pass emitting k x n_partitions partial sums (map-side
    combine), so per-iteration traffic is independent of corpus size.
    Assignment margins >= 7e-6 relative (measured at every SF) make the
    integer output hash-stable across engines.  k is CORPUS-SCALED
    (clustering.corpus_k, footer row estimate / 250-row target) so
    per-cluster work stays bounded at 100x; the gate SFs land exactly on
    the k_min=8 floor, pinning the oracle CTE's LIMIT 8."""
    from gofeed_spark.operators import clustering

    emb = T(spark, sf_dir, "embeddings")
    return clustering.kmeans_assign(emb, k=clustering.corpus_k(emb), n_iters=2)


# --- q123 SemDeDup: within-cluster semantic dedup ------------------------------
@query(
    "q123_semdedup",
    oracle=_KMEANS_CTES.format(src=_KMEANS_SRC)
    + """,
ev AS (SELECT a.vec_id, a.cl, e.v, SQRT(list_dot_product(e.v, e.v)) AS nrm
       FROM a2f a JOIN e USING (vec_id)),
pairs AS (SELECT x.vec_id, x.cl, y.vec_id AS w
          FROM ev x JOIN ev y ON x.cl = y.cl AND y.vec_id < x.vec_id
          WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= CAST(0.35 AS DOUBLE))
SELECT vec_id, CAST(cl AS INT) AS cluster, MIN(w) AS dup_of
FROM pairs GROUP BY vec_id, cl ORDER BY vec_id
""",
)
def q123(spark, sf_dir):
    """SemDeDup (Abbas 2023): k-means partition, then prune items with a
    lower-id cluster-mate at cosine >= 0.35 (min-id witness, the
    probe_minhash_index convention).  The quadratic Gram pass stays
    within clusters — bounded because k scales with the corpus
    (clustering.corpus_k; gate SFs pin the oracle's k=8 floor) — as a
    chunked numpy matmul per cluster.  Threshold margins >= 3.6e-5
    (measured) dwarf cross-engine float noise."""
    from gofeed_spark.operators import clustering

    emb = T(spark, sf_dir, "embeddings")
    return clustering.semdedup(
        emb, k=clustering.corpus_k(emb), n_iters=2, tau=0.35
    )


# --- q125 heavy hitters: exact top-k tokens via two-pass Misra-Gries ----------
@query(
    "q125_heavy_hitters",
    oracle="""
WITH toks AS (
  SELECT t.tok
  FROM documents,
       LATERAL (SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-z0-9]+')) AS tok) t
),
cnt AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok)
SELECT CAST(rn AS INT) AS rank, tok AS token, n
FROM (SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rn FROM cnt) x
WHERE rn <= 20 ORDER BY rank
""",
)
def q125(spark, sf_dir):
    """EXACT top-20 corpus tokens through the sketch path
    (operators/sketch.py): pass 1 = capacity-bounded Misra-Gries per
    partition (only <= capacity candidate rows/partition shuffle, memory
    independent of vocabulary size); pass 2 = exact recount restricted
    to the provably-sufficient candidate set.  The oracle is the naive
    full-vocabulary GROUP BY the sketch avoids shuffling."""
    from gofeed_spark.operators.sketch import heavy_hitters

    return heavy_hitters(T(spark, sf_dir, "documents"), k=20, capacity=4096)


# --- q126 DSIR importance selection -------------------------------------------
@query(
    "q126_dsir_select",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, lang, UNNEST(regexp_split_to_array(lower(text), '\s+')) AS tok
  FROM documents
),
ct AS (SELECT tok, COUNT(*) AS c FROM toks WHERE lang = 'en' GROUP BY tok),
cs AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vocab FROM cs),
tt AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM ct),
ts AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM cs),
scored AS (
  SELECT k.doc_id, COUNT(*) AS n_tokens,
         AVG(LOG2(((COALESCE(ct.c, 0) + 1.0) / (tt.t + v.vocab))
                  / ((cs.c + 1.0) / (ts.t + v.vocab)))) AS lr
  FROM toks k JOIN cs ON k.tok = cs.tok
       LEFT JOIN ct ON k.tok = ct.tok, tt, ts, v
  GROUP BY k.doc_id
),
q AS (SELECT ROUND(quantile_cont(lr, 0.8), 6) AS q80 FROM scored)
SELECT s.doc_id, CAST(s.n_tokens AS INT) AS n_tokens,
       ROUND(s.lr, 6) AS log_ratio_bits,
       CAST(CASE WHEN ROUND(s.lr, 6) >= q.q80 THEN 1 ELSE 0 END AS INT) AS keep
FROM scored s, q ORDER BY s.doc_id
""",
)
def q126(spark, sf_dir):
    """DSIR-shaped data selection (mixing.dsir_select): per-doc average
    log2 likelihood ratio of an add-one-smoothed target unigram LM
    (lang='en' docs) over the full-corpus source LM, deterministic
    exact-quantile top-20% keep.  Same slim plan family as q104: one
    hashed-token explode, map-side-combined counts, broadcast scalars."""
    from gofeed_spark.operators.mixing import dsir_select

    return dsir_select(
        T(spark, sf_dir, "documents"), target=F.col("lang") == "en"
    )


# --- q127 incremental semantic dedup: persisted-index probe --------------------
_Q127_SPLIT = (
    "(SELECT CAST(FLOOR((MAX(vec_id) + 1) * 0.8) AS BIGINT) FROM embeddings)"
)

@query(
    "q127_semdedup_probe",
    oracle=_KMEANS_CTES.format(
        src=f"(SELECT * FROM embeddings WHERE vec_id < {_Q127_SPLIT}) corp"
    )
    + f""",
bt AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       WHERE vec_id >= {_Q127_SPLIT}),
ba AS (SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
       FROM (SELECT b.vec_id, c.cl,
                    list_dot_product(b.v, b.v) - 2*list_dot_product(b.v, c.v)
                      + list_dot_product(c.v, c.v) AS d
             FROM bt b, c2 c) s),
baf AS (SELECT vec_id, cl FROM ba WHERE rn = 1),
corpm AS (SELECT a.vec_id, a.cl, e.v, SQRT(list_dot_product(e.v, e.v)) AS nrm
          FROM a2f a JOIN e USING (vec_id)),
bm AS (SELECT b.vec_id, f.cl, b.v, SQRT(list_dot_product(b.v, b.v)) AS nrm
       FROM bt b JOIN baf f USING (vec_id)),
wits AS (
  SELECT x.vec_id, x.cl, y.vec_id AS w
  FROM bm x JOIN corpm y ON x.cl = y.cl
  WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= CAST(0.35 AS DOUBLE)
  UNION ALL
  SELECT x.vec_id, x.cl, y.vec_id AS w
  FROM bm x JOIN bm y ON x.cl = y.cl AND y.vec_id < x.vec_id
  WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= CAST(0.35 AS DOUBLE))
SELECT vec_id, printf('c%04d', cl) AS cluster, MIN(w) AS dup_of
FROM wits GROUP BY vec_id, cl ORDER BY vec_id
""",
)
def q127(spark, sf_dir):
    """Incremental semantic dedup through the PERSISTED index
    (clustering.build_semdedup_index / probe_semdedup_index — the
    embedding-space sibling of q100's MinHash index): centroids frozen on
    the first 80% of the corpus, the remaining 20% probed as an arriving
    batch.  The member read partition-prunes to the clusters the batch
    touches, so probe cost is O(batch + touched clusters), corpus-size
    independent.  Eager at construction (builds the tmp index), the
    q100/q118 convention."""
    import shutil
    import tempfile

    from gofeed_spark.operators.clustering import (
        build_semdedup_index,
        probe_semdedup_index,
    )

    from gofeed_spark.operators.clustering import corpus_k

    emb = T(spark, sf_dir, "embeddings")
    split = int(
        (emb.agg(F.max("vec_id").alias("m")).collect()[0]["m"] + 1) * 0.8
    )
    idx = tempfile.mkdtemp(prefix="gofeed_q127_")
    try:
        # corpus_k sizes from the FULL table's footers (the filtered 80%
        # shares the files) — an upper bound, which only shrinks clusters
        build_semdedup_index(
            emb.filter(F.col("vec_id") < split), idx, k=corpus_k(emb), n_iters=2
        )
        return probe_semdedup_index(
            spark, idx, emb.filter(F.col("vec_id") >= split), tau=0.35
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


# --- q133 ingest-time TF-IDF keywords against a frozen model --------------------
# (same 80% doc_id split as q131; spelled out here because q131's constant
# is defined further down the module)
_Q133_SPLIT = (
    "(SELECT CAST(FLOOR((MAX(doc_id) + 1) * 0.8) AS BIGINT) FROM documents)"
)

@query(
    "q133_tfidf_ingest_keywords",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents,
       LATERAL (SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-z0-9]+')) AS tok) t
),
ctf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        WHERE doc_id < {_Q133_SPLIT} GROUP BY doc_id, tok),
dfreq AS (SELECT tok, COUNT(*) AS df FROM ctf GROUP BY tok),
nd AS (SELECT COUNT(*) AS n_docs FROM documents WHERE doc_id < {_Q133_SPLIT}),
atf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        WHERE doc_id >= {_Q133_SPLIT} GROUP BY doc_id, tok),
scored AS (
  SELECT atf.doc_id, atf.tok,
         atf.tf * (LN((nd.n_docs + 1.0) / (COALESCE(dfreq.df, 0) + 1.0)) + 1.0)
           AS score
  FROM atf LEFT JOIN dfreq USING (tok), nd
)
SELECT doc_id, CAST(rn AS INT) AS rank, tok AS token, ROUND(score, 6) AS score
FROM (SELECT doc_id, tok, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rn
      FROM scored) x
WHERE rn <= 3 ORDER BY doc_id, rank
""",
)
def q133(spark, sf_dir):
    """INGEST-TIME TF-IDF keywords: the frozen-model scoring path
    (search.tfidf_model / tfidf_keywords_score — the dsir shape).  The
    vocabulary-scaled df relation and N freeze on the first 80% of the
    corpus; the remaining 20% arrives as a batch and ranks its own
    tokens against them (tf batch-local, frozen-unseen tokens df=0 under
    the smoothed idf) — the exact foreachBatch operation, oracle-paired
    with a LEFT JOIN df CTE (streaming-equals-batch proof in
    tests/test_streaming.py).  Margins MEASURED (the q121 discipline):
    min nonzero rank-3/4 score gap 3.3e-3 sf0.01 / 3.2e-4 sf0.1 (exact
    ties break bytewise on the token), min round-6 boundary distance
    3.2e-9 — both >= 1e5x the ~7e-15 one-ulp cross-engine ln noise."""
    from gofeed_spark.operators.search import tfidf_keywords_score, tfidf_model

    docs = T(spark, sf_dir, "documents")
    split = int(
        (docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"] + 1) * 0.8
    )
    model = tfidf_model(docs.filter(F.col("doc_id") < split))
    return tfidf_keywords_score(
        docs.filter(F.col("doc_id") >= split), model, top_k=3
    )


# --- q128 PageRank centrality over the nation trade graph ----------------------
@query(
    "q128_pagerank_trade",
    oracle="""
WITH edges AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM orders o
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2),
nodes AS (SELECT DISTINCT n FROM (SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges) u),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ncnt FROM nodes),
ow AS (SELECT src, SUM(w) AS W FROM edges GROUP BY src),
r0 AS (SELECT n, 1.0 / nn.ncnt AS r FROM nodes, nn),
c1 AS (SELECT e.dst AS n, SUM(r0.r * e.w / ow.W) AS contrib
       FROM edges e JOIN r0 ON e.src = r0.n JOIN ow ON e.src = ow.src GROUP BY e.dst),
d1 AS (SELECT COALESCE(SUM(r0.r), 0.0) AS dm FROM r0 LEFT JOIN ow ON r0.n = ow.src
       WHERE ow.src IS NULL),
r1 AS (SELECT nodes.n, (1.0 - 0.85) / nn.ncnt + 0.85 * (COALESCE(c1.contrib, 0.0) + d1.dm / nn.ncnt) AS r
       FROM nodes LEFT JOIN c1 ON nodes.n = c1.n, nn, d1),
c2 AS (SELECT e.dst AS n, SUM(r1.r * e.w / ow.W) AS contrib
       FROM edges e JOIN r1 ON e.src = r1.n JOIN ow ON e.src = ow.src GROUP BY e.dst),
d2 AS (SELECT COALESCE(SUM(r1.r), 0.0) AS dm FROM r1 LEFT JOIN ow ON r1.n = ow.src
       WHERE ow.src IS NULL),
r2 AS (SELECT nodes.n, (1.0 - 0.85) / nn.ncnt + 0.85 * (COALESCE(c2.contrib, 0.0) + d2.dm / nn.ncnt) AS r
       FROM nodes LEFT JOIN c2 ON nodes.n = c2.n, nn, d2)
SELECT CAST(n AS INT) AS node, ROUND(r, 6) AS pagerank FROM r2 ORDER BY node
""",
)
def q128(spark, sf_dir):
    """Weighted PageRank (operators/graph.py) over the customer-nation →
    supplier-nation trade graph (edge weight = lineitem count) — the
    crawl-graph centrality class: each iteration is one edges⋈ranks
    shuffle on the source key + a map-side-combinable destination sum,
    ranks checkpointed per round so the iterative plan stays flat."""
    from gofeed_spark.operators.graph import pagerank

    o, c = T(spark, sf_dir, "orders"), T(spark, sf_dir, "customer")
    l, s = T(spark, sf_dir, "lineitem"), T(spark, sf_dir, "supplier")
    edges = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("w"))
    )
    pr = pagerank(edges, n_iters=2, damping=0.85, weight="w")
    return pr.select(F.col("node").cast("int").alias("node"), "pagerank")


# --- q129 PCA projection, ORACLE-PAIRED via the power method --------------------
@query(
    "q129_pca_project",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e),
d AS (SELECT UNNEST(range(1, 65)) AS i),
mu AS (SELECT d.i, SUM(e.v[d.i]) / (SELECT n FROM nn) AS m FROM e, d GROUP BY d.i),
s2 AS (SELECT di.i AS i, dj.i AS j, SUM(e.v[di.i] * e.v[dj.i]) AS s
       FROM e, d di, d dj GROUP BY di.i, dj.i),
cv AS (SELECT s2.i, s2.j,
              (s2.s - (SELECT n FROM nn) * mi.m * mj.m)
                / ((SELECT n FROM nn) - 1) AS c
       FROM s2 JOIN mu mi ON mi.i = s2.i JOIN mu mj ON mj.i = s2.j),
w1 AS (SELECT i, SUM(c) AS w FROM cv GROUP BY i),
n1 AS (SELECT SQRT(SUM(w * w)) AS nrm FROM w1),
v1 AS (SELECT i, w / (SELECT nrm FROM n1) AS x FROM w1),
w2 AS (SELECT cv.i, SUM(cv.c * v1.x) AS w
       FROM cv JOIN v1 ON v1.i = cv.j GROUP BY cv.i),
n2 AS (SELECT SQRT(SUM(w * w)) AS nrm FROM w2),
v2 AS (SELECT i, w / (SELECT nrm FROM n2) AS x FROM w2),
proj AS (SELECT e.vec_id, SUM((e.v[v2.i] - mu.m) * v2.x) AS p
         FROM e, v2 JOIN mu ON mu.i = v2.i GROUP BY e.vec_id)
SELECT vec_id, ROUND(p, 4) + 0.0 AS pc1 FROM proj ORDER BY vec_id
""",
)
def q129(spark, sf_dir):
    """Distributed PCA, hash-checked (operators/pca.py
    ``pca_power_project``): covariance from ONE Arrow pass of
    per-partition (count, sum, outer-product) partials, then a FIXED
    2-iteration power method from the all-ones start — a deterministic
    arithmetic function of the covariance, which DuckDB replays as a CTE
    chain over the (i, j, c) covariance relation (the q122 k-means
    precedent applied to linear algebra; eigen-CONVERGENCE is irrelevant
    to parity).  Projections round to 4 decimals with MEASURED boundary
    margins (tests/test_pca.py) dwarfing cross-engine float noise; the
    full-rank eigh form stays available as ``pca_fit``/``pca_project``
    with numpy-equality tests."""
    from gofeed_spark.operators.pca import pca_power_project

    return pca_power_project(T(spark, sf_dir, "embeddings"), n_iters=2)


# --- q130 BM25 probe off the persisted posting index ---------------------------
@query(
    "q130_bm25_index_probe",
    oracle=r"""
WITH base AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
lens AS (SELECT doc_id, len(tk) AS len_d FROM base),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(len_d AS DOUBLE)) AS avgdl FROM lens),
hits AS (SELECT b.doc_id, t.tok FROM base b, LATERAL UNNEST(b.tk) AS t(tok)
         WHERE t.tok IN ('hash', 'join', 'spark')),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM hits GROUP BY 1, 2),
dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok)
SELECT tf.doc_id,
       ROUND(SUM(
         ln((CAST(s.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)
            / (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0)
         * (tf.tf * CAST(2.2 AS DOUBLE))
         / (tf.tf + CAST(1.2 AS DOUBLE)
            * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * l.len_d / s.avgdl))
       ), 6) AS score
FROM tf JOIN dfreq USING (tok) JOIN lens l ON l.doc_id = tf.doc_id, stats s
GROUP BY tf.doc_id ORDER BY tf.doc_id
""",
)
def q130(spark, sf_dir):
    """q97's retrieval through the PERSISTED posting index
    (search.build_bm25_index / probe_bm25_index — the lexical member of
    the persisted-index family): the probe never rescans the corpus, it
    reads only the query terms' md5 buckets (PartitionFilters) with the
    term equality pushed into the pruned scan, and reproduces the
    full-scan scores bit-for-bit (shared contribution expression, exact
    round-trip corpus stats).  Eager at construction (builds the tmp
    index), the q100/q127 convention."""
    import shutil
    import tempfile

    from gofeed_spark.operators.search import build_bm25_index, probe_bm25_index

    idx = tempfile.mkdtemp(prefix="gofeed_q130_")
    try:
        build_bm25_index(T(spark, sf_dir, "documents"), idx)
        return probe_bm25_index(
            spark, idx, ["hash", "join", "spark"]
        ).orderBy("doc_id").localCheckpoint()
    finally:
        shutil.rmtree(idx, ignore_errors=True)


# --- q131 ingest-time BM25 scoring against frozen index stats -------------------
_Q131_SPLIT = (
    "(SELECT CAST(FLOOR((MAX(doc_id) + 1) * 0.8) AS BIGINT) FROM documents)"
)

@query(
    "q131_bm25_ingest_score",
    oracle=rf"""
WITH base AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tk FROM documents),
corp AS (SELECT * FROM base WHERE doc_id < {_Q131_SPLIT}),
arr AS (SELECT * FROM base WHERE doc_id >= {_Q131_SPLIT}),
stats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(len(tk) AS DOUBLE)) AS avgdl FROM corp),
dfreq AS (SELECT t.tok, COUNT(DISTINCT c.doc_id) AS df
          FROM corp c, LATERAL UNNEST(c.tk) AS t(tok)
          WHERE t.tok IN ('hash', 'join', 'spark') GROUP BY t.tok),
hits AS (SELECT a.doc_id, len(a.tk) AS len_d, t.tok
         FROM arr a, LATERAL UNNEST(a.tk) AS t(tok)
         WHERE t.tok IN ('hash', 'join', 'spark')),
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
GROUP BY tf.doc_id ORDER BY tf.doc_id
""",
)
def q131(spark, sf_dir):
    """INGEST-TIME BM25: the frozen-stats scoring path (search.
    bm25_score_docs — the dsir_score shape applied to retrieval).  The
    index freezes n_docs/avgdl/df on the first 80% of the corpus; the
    remaining 20% arrives as a batch and scores with tf computed locally
    and every corpus statistic taken from the frozen meta + one
    partition-pruned df read — the exact operation a foreachBatch
    micro-batch runs (streaming-equals-batch proof in
    tests/test_streaming.py).  A term unseen in the frozen corpus takes
    df=0 (smoothed idf).  Eager at construction, the q127/q130
    convention."""
    import shutil
    import tempfile

    from gofeed_spark.operators.search import bm25_score_docs, build_bm25_index

    docs = T(spark, sf_dir, "documents")
    split = int(
        (docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"] + 1) * 0.8
    )
    idx = tempfile.mkdtemp(prefix="gofeed_q131_")
    try:
        build_bm25_index(docs.filter(F.col("doc_id") < split), idx)
        return (
            bm25_score_docs(
                spark,
                docs.filter(F.col("doc_id") >= split),
                idx,
                ["hash", "join", "spark"],
            )
            .orderBy("doc_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


# --- q136/q137 deterministic text embeddings (operators/embedding.py) --------
from gofeed_spark.operators.embedding import embedding_sql_ctes  # noqa: E402


@query(
    "q136_text_embedding",
    oracle="WITH "
    + embedding_sql_ctes(src="documents", dim=64).strip()
    + "\nSELECT doc_id, j, val FROM emb_long ORDER BY doc_id, j",
)
def q136(spark, sf_dir):
    """Hashed char-trigram random-projection embedding (frozen model,
    operators/embedding.py) over every document, emitted LONG-FORM
    (doc_id, j, val) so all 64 components hash-check against the
    generated md5-hex-arithmetic oracle.  No rounding is needed: both
    engines accumulate exactly-representable integer gram counts and
    finish with the same single IEEE divide, so the doubles are
    BIT-IDENTICAL (measured delta 0.0 at both gate SFs).  One Arrow scan
    pass, no shuffle — embeddings leave the scan assembled."""
    from gofeed_spark.operators.embedding import text_embedding

    emb = text_embedding(T(spark, sf_dir, "documents"), dim=64)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("j", "val")
    ).orderBy("doc_id", "j")


@query(
    "q137_text_clusters",
    oracle="WITH "
    + embedding_sql_ctes(src="documents", dim=64).strip()
    + ","
    + _KMEANS_CTES.format(
        src="(SELECT doc_id AS vec_id, v AS embedding FROM emb_vec) esrc"
    ).replace("WITH e AS", "e AS", 1)
    + """
SELECT vec_id, CAST(cl AS INT) AS cluster FROM a2f ORDER BY vec_id
""",
)
def q137(spark, sf_dir):
    """The documents-only semantic chain (VERDICT r13 item 3's
    composition): text_embedding → corpus-scaled k-means, END TO END from
    raw text — no precomputed embeddings table anywhere.  The oracle
    rebuilds the frozen embedding model (generated md5 arithmetic) and
    feeds it through the SAME 2-iteration Lloyd CTE chain as q122.
    Margins measured before registration: argmin
    relative margin ≥ 2.9e-4 at sf0.01 and ≥ 4.1e-6 at sf0.1 vs ~1e-13
    cross-engine float noise.  target_cluster_rows=625 lands BOTH gate
    SFs (500/5000 docs) on the k_min=8 floor, pinning the oracle's
    LIMIT 8; sf1.0's 50k docs scale to k=80 (oracle gate-SF-only by
    design, the q122 convention)."""
    from gofeed_spark.operators import clustering
    from gofeed_spark.operators.embedding import text_embedding

    docs = T(spark, sf_dir, "documents")
    # localCheckpoint: k-means consumes the corpus once per pass (init +
    # n_iters + assign); without it every pass re-runs the embedding
    # kernel over the raw text
    emb = (
        text_embedding(docs, dim=64)
        .withColumnRenamed("doc_id", "vec_id")
        .localCheckpoint()
    )
    k = clustering.corpus_k(docs, target_cluster_rows=625)
    return clustering.kmeans_assign(emb, k=k, n_iters=2)


@query(
    "q139_text_semantic_search",
    oracle="WITH "
    + embedding_sql_ctes(src="documents", dim=64).strip()
    + """,
q AS (SELECT v AS qe FROM emb_vec WHERE doc_id = 1),
s AS (SELECT e.doc_id,
             list_dot_product(e.v, q.qe)
               / (SQRT(list_dot_product(e.v, e.v)) * SQRT(list_dot_product(q.qe, q.qe))) AS cos
      FROM emb_vec e, q WHERE e.doc_id <> 1)
SELECT CAST(rn AS INTEGER) AS rank, doc_id AS neighbor_id
FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rn FROM s) t
WHERE rn <= 5 ORDER BY rank
""",
)
def q139(spark, sf_dir):
    """SEMANTIC SEARCH end-to-end from raw text — no precomputed
    embeddings anywhere: text_embedding over the corpus, then exact
    cosine top-5 for doc 1's vector through the same brute kernel as q34,
    hash-checked against the generated embedding CTEs + ranking SQL.
    Rank-boundary margins MEASURED before registration (the q43/q58
    discipline): min nonzero adjacent cosine gap in the top-8 is 8.5e-4
    (sf0.01) / 6.1e-4 (sf0.1) with zero exact ties — ~1e11× the
    cross-engine dot-product noise (k=10 was REJECTED: sf0.1 has an
    exact clone-family tie at that boundary).  localCheckpoint: the
    brute kernel reads the corpus twice (query row + scan)."""
    from gofeed_spark.operators.embedding import text_embedding

    emb = (
        text_embedding(T(spark, sf_dir, "documents"), dim=64)
        .withColumnRenamed("doc_id", "vec_id")
        .localCheckpoint()
    )
    return similarity.brute_topk(emb, query_id=1, k=5)


@query(
    "q145_doc_chunking",
    oracle=r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
c AS (SELECT doc_id, toks,
             GREATEST(1, CAST(CEIL(CAST(len(toks) - 8 AS DOUBLE) / 24) AS INT)) AS nc
      FROM t),
s AS (SELECT doc_id, toks, UNNEST(range(0, nc)) AS i FROM c),
x AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
             list_slice(toks, i * 24 + 1, i * 24 + 32) AS ctoks
      FROM s)
SELECT doc_id, chunk_idx, CAST(len(ctoks) AS INT) AS n_tokens,
       md5(array_to_string(ctoks, ' ')) AS chunk_md5
FROM x ORDER BY doc_id, chunk_idx
""",
)
def q145(spark, sf_dir):
    """Sliding-window document CHUNKING (operators/packing.py
    ``chunk_documents``) — the context-window preparation step between
    curation and training/RAG indexing: 32-token chunks every 24 tokens
    (8-token overlap, tails clamped; sized to the synthetic docs'
    10-100-token range so multi-chunk splitting, overlap and tails are
    all NON-VACUOUS at the gate SFs — up to 4 chunks per doc).  Pure codegen (split once, a
    per-CHUNK transform + posexplode, no shuffle — chunks leave the scan
    assembled); the oracle replays the same start-sequence arithmetic
    with list_slice, and chunk_md5 hashes each chunk's exact text, so
    boundaries, overlap and tail clamping are value-checked
    token-for-token."""
    from gofeed_spark.operators.packing import chunk_documents

    out = chunk_documents(
        T(spark, sf_dir, "documents"), window=32, overlap=8
    )
    return out.select(
        "doc_id", "chunk_idx", "n_tokens",
        F.md5(F.col("chunk_text").cast("binary")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


# --- q146 CCNet-style perplexity buckets --------------------------------------
@query(
    "q146_perplexity_buckets",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(lower(text), '\s+')) AS tok
  FROM documents
),
freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT SUM(c) AS T FROM freq),
scored AS (
  SELECT t.doc_id, -AVG(log2(CAST(f.c AS DOUBLE) / tt.T)) AS xent
  FROM toks t JOIN freq f USING (tok), tot tt
  GROUP BY t.doc_id
),
r AS (
  SELECT s.doc_id, d.source, ROUND(s.xent, 6) AS xent_bits
  FROM scored s JOIN documents d USING (doc_id)
),
b AS (
  SELECT doc_id, source, xent_bits,
         NTILE(3) OVER (PARTITION BY source ORDER BY xent_bits, doc_id) AS bucket
  FROM r
)
SELECT doc_id, source, xent_bits, CAST(bucket AS INT) AS bucket,
       CASE bucket WHEN 1 THEN 'head' WHEN 3 THEN 'tail' ELSE 'middle' END AS tier
FROM b ORDER BY doc_id
""",
)
def q146(spark, sf_dir):
    """CCNet-style PERPLEXITY BUCKETS (textstats.perplexity_buckets,
    Wenzek et al. 2020 §4.3): per-source equal-depth head/middle/tail
    tiers over the corpus-trained unigram cross-entropy — the mixture
    key a CCNet-shaped pipeline feeds into sampling.  Tier boundaries
    order by the ROUNDED xent_bits (the 6-decimal grid q104 already
    hash-matches cross-engine) with doc_id tiebreak, so NTILE is
    value-deterministic on both engines; the whole plan is one scored
    pass + one per-source window sort, no Python.  Grid margin MEASURED
    before registration (the q129 discipline): min distance of raw xent
    to a rounding midpoint is 5.7e-9 (sf0.01) / 4.4e-11 (sf0.1) absolute
    vs ~1e-12 cross-engine AVG noise — and q104 has shipped this exact
    grid hash-green on the same values since r9."""
    return textstats.perplexity_buckets(
        T(spark, sf_dir, "documents")
    ).orderBy("doc_id")


# --- q147 bloom-pruned URL-seen recrawl gate -----------------------------------
@query(
    "q147_bloom_url_seen",
    oracle=r"""
WITH u AS (
  SELECT doc_id,
         'https://www.' || source || '.example.com/docs/'
         || CASE WHEN doc_id % 13 = 5 THEN 'u/' || CAST(doc_id AS VARCHAR)
                 ELSE CAST(doc_id % 97 AS VARCHAR) END AS url
  FROM documents
),
seen AS (SELECT DISTINCT url FROM u WHERE doc_id % 7 = 0)
SELECT doc_id, url
FROM u
WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.url = u.url)
ORDER BY doc_id
""",
)
def q147(spark, sf_dir):
    """Bloom-pruned URL-SEEN gate (operators/bloom.py) — the recrawl
    frontier filter: a distributed Bloom filter built from the
    crawled-URL log (bit-parallel ``bit_or`` build, double-hashed
    xxhash64 positions) probes the frontier in one whole-stage-codegen
    projection; only the bloom-POSITIVE sliver (true members + the ~1%
    false-positive tail) pays the exact anti-join verify, so the final
    output is EXACT — the oracle is the plain NOT EXISTS.  URLs are
    synthesized deterministically from (source, doc_id % 97) so distinct
    docs genuinely share URLs and the seen-set covers ~38% of the
    frontier at both gate SFs (never vacuous).  At 100 TB the bloom
    (one compact broadcast) replaces a full frontier × seen shuffle
    anti-join; measured FP rate and the zero-false-negative contract are
    pinned in tests/test_bloom.py."""
    from gofeed_spark.operators.bloom import bloom_new_keys

    d = T(spark, sf_dir, "documents").select("doc_id", "source")
    # docs in the doc_id % 13 == 5 residue class get a UNIQUE url, so
    # the unseen output scales with the corpus instead of vanishing once
    # the 20x97 shared-url space saturates at large SF (the q14
    # residue-fixture convention; r16 verdict item 7)
    url = F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".example.com/docs/"),
        F.when(
            F.col("doc_id") % 13 == 5,
            F.concat(F.lit("u/"), F.col("doc_id").cast("string")),
        ).otherwise((F.col("doc_id") % 97).cast("string")),
    )
    u = d.select("doc_id", url.alias("url"))
    seen = u.filter(F.col("doc_id") % 7 == 0).select("url")
    return bloom_new_keys(u, "url", seen, fpp=0.01).orderBy("doc_id")


# --- q148 fixed-iteration logistic-regression quality classifier --------------
def _logreg_sql(n_iters: int, lr: float) -> str:
    """Generated DuckDB twin of classify.train_logreg + score_logreg: the
    same gradient algebra as a CTE chain (the _KMEANS_CTES convention —
    one template emits the oracle, so Spark and SQL can't drift)."""
    L = repr(float(lr))
    parts = [
        r"""WITH f AS (
  SELECT doc_id,
         (LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1) AS n_tok,
         CAST(LENGTH(REPLACE(text,' ','')) AS DOUBLE)
            / (LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1) AS awl,
         CAST(len(list_distinct(regexp_split_to_array(lower(text),'\s+'))) AS DOUBLE)
            / len(regexp_split_to_array(lower(text),'\s+')) AS ttr
  FROM documents),
x AS (
  SELECT doc_id, n_tok / 100.0 AS x1, awl / 6.0 AS x2, ttr AS x3,
         CAST(1.0 AS DOUBLE) AS x0,
         CASE WHEN ttr >= CAST(0.6 AS DOUBLE) THEN 1 ELSE 0 END AS y
  FROM f)""",
        f"""w1 AS (
  SELECT {' , '.join(f'-{L}*AVG((0.5 - y)*x{j}) AS a{j}' for j in (1, 2, 3, 0))}
  FROM x)""",
    ]
    for it in range(2, n_iters + 1):
        parts.append(f"""s{it} AS (
  SELECT x.*, {' , '.join(f'w.a{j} AS b{j}' for j in (1, 2, 3, 0))},
         1.0/(1.0 + EXP(-(x1*w.a1 + x2*w.a2 + x3*w.a3 + x0*w.a0))) AS p
  FROM x, w{it - 1} w)""")
        parts.append(f"""w{it} AS (
  SELECT {' , '.join(f'ANY_VALUE(b{j}) - {L}*AVG((p - y)*x{j}) AS a{j}' for j in (1, 2, 3, 0))}
  FROM s{it})""")
    return ",\n".join(parts) + f"""
SELECT doc_id, y,
       ROUND(1.0/(1.0 + EXP(-(x1*w.a1 + x2*w.a2 + x3*w.a3 + x0*w.a0))), 6) AS score,
       CAST(CASE WHEN 1.0/(1.0 + EXP(-(x1*w.a1 + x2*w.a2 + x3*w.a3 + x0*w.a0)))
                      >= 0.5 THEN 1 ELSE 0 END AS INT) AS pred
FROM x, w{n_iters} w ORDER BY doc_id
"""


@query("q148_logreg_quality", oracle=_logreg_sql(n_iters=6, lr=8.0))
def q148(spark, sf_dir):
    """Fixed-iteration LOGISTIC-REGRESSION quality classifier
    (operators/classify.py) — rule distillation, the CCNet/fastText
    filter shape: cheap codegen features (token count, avg word length,
    type-token ratio — each reusing a q86-proven SQL twin), a rule label
    (ttr >= 0.6, ~26% positive at both gate SFs), 6 full-batch GD
    iterations at lr=8 from zero weights, then one codegen scoring
    projection.  Fixed iterations from a fixed start make the weights a
    deterministic arithmetic function of the corpus (the q129
    power-method precedent), so train+score oracle-pairs end-to-end.
    Margins MEASURED at registration: cross-engine score delta ≤ 2.2e-16
    (one ulp); min distance to the ROUND(·,6) grid midpoint 1.4e-9 /
    1.2e-11 (sf0.01/sf0.1); min |score − 0.5| for pred 1.8e-3 / 1.5e-5 —
    every boundary ≥ 10⁴× the noise.  Posture: each GD pass is ONE
    map-side-combinable 4-scalar aggregate (the driver holds only the
    weight vector); scoring never shuffles."""
    from gofeed_spark.operators.classify import score_logreg, train_logreg

    docs = T(spark, sf_dir, "documents")
    t = F.col("text")
    n_tok = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    awl = F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double") / n_tok
    toks = ws_tokens("text")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")
    feats = docs.select(
        "doc_id",
        (n_tok / F.lit(100.0)).alias("x1"),
        (awl / F.lit(6.0)).alias("x2"),
        ttr.alias("x3"),
        F.lit(1.0).alias("x0"),
        (ttr >= F.lit(0.6)).cast("int").alias("y"),
    ).localCheckpoint()  # training reads the frame once per iteration
    cols = ["x1", "x2", "x3", "x0"]
    w = train_logreg(feats, cols, "y", n_iters=6, lr=8.0)
    scored = score_logreg(feats, cols, w, out_col="__raw")
    return scored.select(
        "doc_id",
        "y",
        F.round("__raw", 6).alias("score"),
        (F.col("__raw") >= 0.5).cast("int").alias("pred"),
    ).orderBy("doc_id")


# --- q149 product-quantization ANN self-match ---------------------------------
@query(
    "q149_pq_self_match",
    oracle="""
SELECT 1 AS rank, MAX(vec_id) + 10000000 AS neighbor_id FROM embeddings
""",
)
def q149(spark, sf_dir):
    """Product-quantization ANN (similarity.pq_topk, Jégou et al. 2011):
    per-subspace deterministic k-means codebooks, every vector packed to
    ONE int64 code (8 subspaces × 16 centroids = 32 bits — the candidate
    scan reads ~16 B/vector instead of 512 B, the memory-bounded serving
    layout), ADC candidate scoring via per-subspace lookup-table gathers,
    exact cosine re-rank of the top candidates.  A clone of the query
    vector encodes to the query's own code, so it must survive the ADC
    cut and the exact re-rank ranks it first — checks codebook training,
    packing, ADC and refine end-to-end (the q60 IVF invariant, applied
    to the PQ path).  Measured recall floors live in
    tests/test_similarity.py."""
    emb = T(spark, sf_dir, "embeddings")
    max_id = int(emb.agg(F.max("vec_id")).collect()[0][0])
    clone = emb.filter(F.col("vec_id") == 1).select(
        F.lit(max_id + 10_000_000).cast("long").alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(clone)
    out = similarity.pq_topk(corpus, query_id=1, k=3, n_sub=8, n_cents=16)
    return out.filter(F.col("rank") == 1)


# --- q150 chunked semantic retrieval (RAG chain) -------------------------------
@query(
    "q150_chunk_retrieval",
    oracle=r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
c AS (SELECT doc_id, toks,
             GREATEST(1, CAST(CEIL(CAST(len(toks) - 8 AS DOUBLE) / 24) AS INT)) AS nc
      FROM t),
s AS (SELECT doc_id, toks, UNNEST(range(0, nc)) AS i FROM c),
chunks AS (SELECT doc_id * 1000 + CAST(i AS INT) AS chunk_id,
                  array_to_string(list_slice(toks, i * 24 + 1, i * 24 + 32), ' ') AS chunk_text
           FROM s),
"""
    + embedding_sql_ctes(src="chunks", dim=64, id_col="chunk_id", text_col="chunk_text").strip()
    + r""",
q AS (SELECT v AS qe FROM emb_vec WHERE doc_id = 1000),
sc AS (SELECT e.doc_id AS chunk_id,
              list_dot_product(e.v, q.qe)
                / (SQRT(list_dot_product(e.v, e.v)) * SQRT(list_dot_product(q.qe, q.qe))) AS cos
      FROM emb_vec e, q WHERE e.doc_id // 1000 <> 1)
SELECT CAST(rn AS INTEGER) AS rank,
       chunk_id // 1000 AS doc_id,
       CAST(chunk_id % 1000 AS INT) AS chunk_idx
FROM (SELECT chunk_id, ROW_NUMBER() OVER (ORDER BY cos DESC, chunk_id) AS rn FROM sc) z
WHERE rn <= 5 ORDER BY rank
""",
)
def q150(spark, sf_dir):
    """Chunked SEMANTIC RETRIEVAL — the complete RAG indexing chain from
    raw documents in one plan: sliding-window chunking (q145's operator,
    32/8) → chunk ids packed as doc_id·1000 + idx → frozen text embedding
    per CHUNK (q136's bit-identical kernel) → exact cosine top-5 for the
    query chunk (doc 1, chunk 0) over every OTHER document's chunks, with
    (doc_id, chunk_idx) provenance — what a retriever returns.  Rank
    margins MEASURED at registration (the q139 discipline): min adjacent
    top-12 gap 1.8e-3 (sf0.01) / 2.0e-3 (sf0.1) vs ~1e-15 noise; sf0.1's
    one EXACT tie (clone chunks → bit-identical embeddings on both
    engines) breaks on chunk_id identically by construction.
    localCheckpoint: the embedded chunk frame is read twice (query row +
    scan)."""
    from gofeed_spark.operators.embedding import text_embedding
    from gofeed_spark.operators.packing import chunk_documents

    chunks = chunk_documents(
        T(spark, sf_dir, "documents"), window=32, overlap=8
    ).select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("chunk_id"),
        "chunk_text",
    )
    emb = text_embedding(
        chunks, dim=64, id_col="chunk_id", text_col="chunk_text"
    ).localCheckpoint()
    q = emb.filter(F.col("chunk_id") == 1000).select(F.col("embedding").alias("qe"))
    from gofeed_spark.functions.vector import cosine

    scored = (
        emb.filter(F.floor(F.col("chunk_id") / 1000) != 1)
        .crossJoin(F.broadcast(q))
        .select(
            "chunk_id", cosine(F.col("embedding"), F.col("qe")).alias("cos")
        )
        .orderBy(F.col("cos").desc(), F.col("chunk_id").asc())
        .limit(5)
    )
    ranked = with_rank(scored, [F.col("cos").desc(), F.col("chunk_id").asc()])
    return ranked.select(
        "rank",
        F.floor(F.col("chunk_id") / 1000).cast("long").alias("doc_id"),
        F.pmod(F.col("chunk_id"), F.lit(1000)).cast("int").alias("chunk_idx"),
    ).orderBy("rank")


# --- q151 persisted bloom seen-set index ---------------------------------------
@query(
    "q151_bloom_index_probe",
    oracle=r"""
WITH u AS (
  SELECT doc_id,
         'https://www.' || source || '.example.com/docs/'
         || CASE WHEN doc_id % 13 = 5 THEN 'u/' || CAST(doc_id AS VARCHAR)
                 ELSE CAST(doc_id % 97 AS VARCHAR) END AS url
  FROM documents
),
seen AS (SELECT DISTINCT url FROM u WHERE doc_id % 7 = 0 OR doc_id % 13 = 0)
SELECT doc_id, url
FROM u
WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.url = u.url)
ORDER BY doc_id
""",
)
def q151(spark, sf_dir):
    """PERSISTED bloom seen-set index (operators/bloom.py
    build/append/probe_bloom_index) — the cross-RUN recrawl shape, the
    membership member of the persisted-index family (MinHash q100 /
    SemDeDup q127 / BM25 q130): run 1 builds the index from its crawl log
    (doc_id % 7 urls), run 2 APPENDS only its new keys at the frozen
    (m, k) — the merged words relation is bit-identical to a one-shot
    build (test-pinned mergeability) and the flip is one atomic meta
    publish — and the probe is exact: codegen bloom prefilter over the
    stored words (one-row broadcast) + anti-join verify of the positives
    against the stored key relation.  Eager at construction (the q100
    convention: builds its tmp index when the callable runs, then
    localCheckpoints and removes it)."""
    import shutil
    import tempfile

    from gofeed_spark.operators.bloom import (
        append_bloom_index,
        build_bloom_index,
        probe_bloom_index,
    )

    d = T(spark, sf_dir, "documents").select("doc_id", "source")
    # docs in the doc_id % 13 == 5 residue class get a UNIQUE url, so
    # the unseen output scales with the corpus instead of vanishing once
    # the 20x97 shared-url space saturates at large SF (the q14
    # residue-fixture convention; r16 verdict item 7)
    url = F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".example.com/docs/"),
        F.when(
            F.col("doc_id") % 13 == 5,
            F.concat(F.lit("u/"), F.col("doc_id").cast("string")),
        ).otherwise((F.col("doc_id") % 97).cast("string")),
    )
    u = d.select("doc_id", url.alias("url"))
    run1 = u.filter(F.col("doc_id") % 7 == 0).select("url")
    run2 = u.filter(F.col("doc_id") % 13 == 0).select("url")
    path = tempfile.mkdtemp(prefix="gofeed_q151_")
    try:
        build_bloom_index(run1, "url", path, fpp=0.01)
        append_bloom_index(run2, "url", path)
        out = probe_bloom_index(spark, path, u, "url")
        return out.orderBy("doc_id").localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- q155 persisted PQ index probe ---------------------------------------------
@query(
    "q155_pq_index_probe",
    oracle="""
SELECT 1 AS rank, MAX(vec_id) + 10000000 AS neighbor_id FROM embeddings
""",
)
def q155(spark, sf_dir):
    """PERSISTED product-quantization index (similarity.build_pq_index /
    probe_pq_index) — the PQ serving layout joining the persisted-index
    family (SRP q79, IVF q80, MinHash q100, SemDeDup q127, BM25 q130,
    bloom q151): the candidate scan touches ONLY the packed-code relation
    (~16 B/vector), the codebooks ride the meta (exact JSON round-trip,
    zero training passes at probe time), and the exact re-rank reads ONLY
    the candidates' vector bucket directories (PartitionFilters,
    plan-asserted in tests/test_similarity.py).  The query-clone invariant
    checks build + meta round-trip + ADC + pruned refine end to end.
    Eager at construction (the q100 convention)."""
    import shutil
    import tempfile

    import numpy as np

    emb = T(spark, sf_dir, "embeddings")
    max_id = int(emb.agg(F.max("vec_id")).collect()[0][0])
    clone = emb.filter(F.col("vec_id") == 1).select(
        F.lit(max_id + 10_000_000).cast("long").alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(clone)
    qv = np.array(
        emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"], dtype=np.float64
    )
    path = tempfile.mkdtemp(prefix="gofeed_q155_")
    try:
        similarity.build_pq_index(corpus, path, n_sub=8, n_cents=16)
        out = similarity.probe_pq_index(spark, path, qv, k=3, exclude_id=1)
        return out.filter(F.col("rank") == 1).localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)

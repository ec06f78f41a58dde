"""Deterministic text embeddings — hashed character-n-gram random
projection (the "hashing trick", Weinberger et al. 2009, over char
n-grams), unit-normalized.  The FROZEN-MODEL convention: the projection
is a pure function of the bytes (md5-derived bucket + sign per n-gram),
carries no trained state, and therefore produces the SAME vector for the
same text on any cluster, any partitioning, any day — the text twin of
``multimodal.media_embedding``'s content ladder.

This closes the documents → semantic-ops gap (VERDICT r13 item 3): the
semantic family (SemDeDup, ANN, decontamination, k-means, PCA) previously
assumed a precomputed ``embeddings`` table; with this operator they run
end-to-end from raw text.

Model definition (frozen; any change is a NEW model):

- normalize: ``s = lower(text)`` (full string, spaces/punctuation kept —
  they carry word-boundary signal);
- n-grams: every ``s[i : i + n]``, i = 0 .. len(s) - n (count-weighted);
- per gram ``g``: ``hx = md5(utf8(g))`` hex; bucket = first 8 hex digits
  as an integer, mod ``dim``; sign = +1 if the 9th hex digit is even
  else -1 (md5 rather than xxhash64 because md5 has an exact driver-side
  AND SQL twin — the bm25-index bucket-routing recipe);
- ``v[bucket] += sign * count(g)``; output ``v / ||v||``.

Docs with no n-grams (len < n) or a zero vector (fully cancelling signs —
not observed on any test corpus, handled for completeness) are DROPPED,
the minhash_signatures convention.

Spark-first shape: gram extraction + hashing + accumulation run in ONE
Arrow ``mapInPandas`` pass (per-element work never goes through Catalyst
HOF lambdas — the engine-wide rule), with a per-executor gram→(bucket,
sign) cache so each distinct n-gram hashes once per worker.  No shuffle:
embeddings leave the scan stage assembled.  ``embedding_sql_ctes``
generates the DuckDB twin (md5 hex-digit arithmetic, the q112 generated-
SQL precedent), so the whole model is hash-checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from gofeed_spark.functions.parallel import parallel_floor

_HEX = "0123456789abcdef"


def text_embedding(
    docs: DataFrame,
    dim: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
) -> DataFrame:
    """(id, embedding array<double>) — unit-norm hashed char-n-gram
    embedding per document (model definition in the module doc)."""
    docs = parallel_floor(docs)  # one-row-group scans -> serial otherwise
    import hashlib

    import numpy as np

    def run(batches):
        import pandas as pd

        cache: dict[str, tuple[int, int]] = {}

        def gram_key(g: str) -> tuple[int, int]:
            got = cache.get(g)
            if got is None:
                hx = hashlib.md5(g.encode("utf-8")).hexdigest()
                got = (int(hx[:8], 16) % dim, 1 if int(hx[8], 16) % 2 == 0 else -1)
                cache[g] = got
            return got

        for pdf in batches:
            ids, vecs = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                s = (txt or "").lower()
                if len(s) < n:
                    continue
                # C-level count of the doc's grams (one value_counts per
                # doc, not a Python tally per occurrence — the q125 rule),
                # then one scatter-add over the <= len(s) UNIQUE grams
                vc = pd.Series(
                    [s[i : i + n] for i in range(len(s) - n + 1)]
                ).value_counts()
                keys = [gram_key(g) for g in vc.index]
                v = np.zeros(dim, dtype=np.float64)
                np.add.at(
                    v,
                    np.fromiter((b for b, _ in keys), dtype=np.int64, count=len(keys)),
                    np.fromiter((sg for _, sg in keys), dtype=np.float64, count=len(keys))
                    * vc.to_numpy(dtype=np.float64),
                )
                nrm = float(np.sqrt((v * v).sum()))
                if nrm == 0.0:
                    continue
                ids.append(did)
                vecs.append((v / nrm).tolist())
            if not ids:
                continue  # empty float64 frame breaks Arrow array<double>
            yield pd.DataFrame({id_col: ids, out_col: vecs})

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        run, f"{id_col} {id_type}, {out_col} array<double>"
    )


def _hex_val_sql(hx: str, pos: int) -> str:
    return f"(strpos('{_HEX}', substr({hx}, {pos}, 1)) - 1)"


def embedding_sql_ctes(
    src: str = "documents",
    dim: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB CTE chain computing the SAME frozen model over ``src``
    (columns ``id_col``/``text_col``) — generated, so the oracle can
    never drift from the kernel.  Ends with two CTEs:

    - ``emb_long(doc_id, j, val)`` — all ``dim`` components per kept doc
      (j is 0-based, val unit-norm, NOT rounded);
    - ``emb_vec(doc_id, v)`` — the same as a DOUBLE[] for composition
      into the k-means/SemDeDup CTE chains.
    """
    # first 8 hex digits of md5 as an integer: Σ digit_i * 16^(8-i)
    val = " + ".join(
        f"{_hex_val_sql('hx', i + 1)} * {16 ** (7 - i)}" for i in range(8)
    )
    return f"""
emb_t AS (SELECT {id_col} AS doc_id, lower({text_col}) AS s FROM {src}),
emb_g AS (SELECT doc_id, unnest([substr(s, i, {n}) FOR i IN range(1, length(s) - {n - 2})]) AS g
          FROM emb_t WHERE length(s) >= {n}),
emb_h AS (SELECT doc_id, md5(g) AS hx FROM emb_g),
emb_b AS (SELECT doc_id,
                 CAST(({val}) % {dim} AS INT) AS b,
                 CASE WHEN {_hex_val_sql('hx', 9)} % 2 = 0 THEN 1.0 ELSE -1.0 END AS sg
          FROM emb_h),
emb_w AS (SELECT doc_id, b, CAST(SUM(sg) AS DOUBLE) AS w FROM emb_b GROUP BY doc_id, b),
emb_n AS (SELECT doc_id, SQRT(SUM(w * w)) AS nr FROM emb_w GROUP BY doc_id HAVING SUM(w * w) > 0),
emb_long AS (SELECT n.doc_id, CAST(r.j AS INT) AS j,
                    COALESCE(w.w, 0.0) / n.nr AS val
             FROM emb_n n CROSS JOIN range(0, {dim}) r(j)
             LEFT JOIN emb_w w ON w.doc_id = n.doc_id AND w.b = r.j),
emb_vec AS (SELECT doc_id, list(val ORDER BY j) AS v FROM emb_long GROUP BY doc_id)
"""

"""Byte-pair-encoding tokenization as engine operators.

The training-data stack's ``token_count`` (textstats.py) estimates with a
regex; this module carries a REAL trained subword tokenizer (Sennrich et
al. 2016, the public BPE algorithm GPT-2-family tokenizers build on),
split the way a production pipeline splits it:

- ``word_frequencies``: EXACT distributed word counting (explode +
  map-side-combinable groupBy) with a deterministic top-N cap — the only
  stage that touches the full corpus, one aggregate wide.
- ``train_bpe``: classic merge training over the (word → count) table,
  driver-side — the frequency table is bounded by the cap, not the
  corpus, so a 100 TB corpus trains from the same small table a 1 GB one
  does.  Deterministic: ties in pair counts break lexicographically.
- ``bpe_segments``: distributed Arrow encode — the ranked merge list
  rides into the workers as a closure constant (broadcast-sized: it IS
  the vocabulary) and each doc's words reduce per the merge ranks.
  O(corpus) with zero shuffles; composes with any downstream op.

Encoding is reversible by construction (tokens of a word concatenate
back to the word + end-of-word marker), which the tests assert — the
invariant that stands in for a SQL oracle (per-word merge reduction is
iterative and not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# end-of-word marker, appended to each word's final symbol (the classic
# formulation: lets merges distinguish suffixes from infixes)
EOW = "</w>"

WORD_SPLIT = r"\s+"


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    max_words: int = 65_536,
) -> DataFrame:
    """(word, n) — exact corpus word counts, lowercased, whitespace-split,
    capped deterministically at the ``max_words`` most frequent (ties by
    word) so the driver-side training table is bounded regardless of
    corpus size.  One wide aggregate; the explode never leaves the map
    side un-combined (Spark plans partial aggregation for count)."""
    words = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), WORD_SPLIT)
        ).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count("*").alias("n"))
    return counts.orderBy(F.desc("n"), "word").limit(max_words)


def train_bpe(
    docs: DataFrame,
    num_merges: int = 256,
    text_col: str = "text",
    max_words: int = 65_536,
) -> list[tuple[str, str]]:
    """Train a ranked BPE merge list on the corpus (Sennrich et al. 2016).

    The distributed stage is ``word_frequencies``; merge selection runs
    driver-side over that bounded table: repeatedly merge the most
    frequent adjacent symbol pair (count ties broken lexicographically —
    fully deterministic), stopping early when no pair repeats."""
    freqs = {r["word"]: int(r["n"]) for r in word_frequencies(docs, text_col, max_words).collect()}
    # each word as a tuple of symbols; last symbol carries the EOW marker
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in freqs.items():
        syms = tuple(w[:-1]) + (w[-1] + EOW,)
        vocab[syms] = vocab.get(syms, 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        # deterministic arg-max: highest count, ties to the
        # lexicographically smallest pair
        top = max(pair_counts.values())
        if top < 2:
            break  # nothing repeats — further merges are noise
        best_pair = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best_pair[0]
                    and syms[i + 1] == best_pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reduce one word by the ranked merges (lowest rank first) — the
    standard BPE apply loop."""
    syms = list(word[:-1]) + [word[-1] + EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_segments(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — distributed BPE encode.

    One Arrow mapInPandas pass; the ranked merges travel as a closure
    constant (vocabulary-sized).  Per-word results are memoized per
    batch (Zipf makes the hit rate high), and the reduction is exactly
    ``_encode_word``, so concatenating a word's tokens reproduces the
    word + EOW marker (the reversibility invariant the tests pin)."""
    from gofeed_spark.functions.parallel import parallel_floor

    docs = parallel_floor(docs)
    ranks = {p: i for i, p in enumerate(merges)}
    import re

    split = re.compile(WORD_SPLIT)
    # carry the caller's id column through by ITS name and type (a
    # hard-coded "doc_id long" would break any other id column at runtime)
    id_type = docs.schema[id_col].dataType.simpleString()

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, counts = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                out: list[str] = []
                for w in split.split(str(text).lower().strip()):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    out.extend(got)
                ids.append(did)
                toks.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {id_col: ids, "tokens": toks, "n_tokens": counts}
            )

    return docs.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(run, f"{id_col} {id_type}, tokens array<string>, n_tokens int")


def save_merges(merges: list[tuple[str, str]], path: str) -> str:
    """Persist a ranked merge list as the classic one-pair-per-line text
    artifact (rank = line order) — the frozen-tokenizer file a pipeline
    ships so streaming ingest and later batches encode identically.
    Symbols are tab-separated (BPE symbols can contain spaces only via
    merged EOW forms, never tabs)."""
    with open(path, "w", encoding="utf-8") as f:
        for a, b in merges:
            f.write(f"{a}\t{b}\n")
    return path


def load_merges(path: str) -> list[tuple[str, str]]:
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            a, sep, b = line.partition("\t")
            if not sep:
                raise ValueError(f"malformed merge line: {line!r}")
            out.append((a, b))
    return out

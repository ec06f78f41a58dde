"""Text column expressions for the LLM-pipeline operators.

Everything here is built-in-function based (split / transform / sequence /
xxhash64) so it runs in whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def ws_tokens(text: Column | str) -> Column:
    """Lower-cased whitespace tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), r"\s+")


def re_tokens(text: Column | str) -> Column:
    """Alphanumeric regex tokens (the BPE-ish portable tokenizer)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), F.lit(0))


def shingles(tokens: Column, k: int = 5) -> Column:
    """Distinct k-word shingles (space-joined) from a token array.

    ``sequence(1, n-k+1)`` + ``slice`` keeps the whole construction inside
    codegen; empty when the doc has fewer than k tokens.
    """
    n = F.size(tokens)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(idx, lambda i: F.array_join(F.slice(tokens, i, k), " "))
    return F.array_distinct(sh)


def normalized_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lower-case, whitespace collapsed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.lower(F.regexp_replace(c, r"\s+", " "))

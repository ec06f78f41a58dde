"""Python UDTF surface (Spark 4 ``@udtf``): table-valued functions for
row-expanding text transforms.  Completes the UDF matrix alongside the
scalar/pandas UDFs (processors), the grouped-map operators (mapInPandas),
and the grouped-agg UDAF (q68).  The reference's only UDF shape is its
Processor interface (processor.go:10-13); UDTFs are the north-star
extension for one-row-in/many-rows-out text work that SQL callers need
composable as ``FROM split_sentences(...)``.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="pos int, sentence string, n_chars int")
class SplitSentences:
    """text -> one row per sentence (ordinal, text, length)."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract
        if not text:
            return
        pos = 0
        for part in _SENT_RE.split(text):
            s = part.strip()
            if s:
                yield pos, s, len(s)
                pos += 1


def register_udtfs(spark: SparkSession) -> None:
    """Register the text UDTFs for SQL callers (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)

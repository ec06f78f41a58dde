"""Query registry: every declared operator/query from SURVEY.md §2.

Each entry pairs a Spark DataFrame implementation with (when expressible)
the ANSI-SQL oracle text DuckDB runs on the same parquet tables.  The
driver's correctness gate compares the two at sf0.01.
"""

from gofeed_spark.queries.registry import (
    MIN_ROWS,
    ORACLES,
    QUERIES,
    get_query,
    query,
)
import gofeed_spark.queries.relational  # noqa: F401  (Q01-Q26, Q62-Q66, Q70/Q71, Q74, Q77)
import gofeed_spark.queries.llm  # noqa: F401  (Q27-Q46, Q53-Q61, Q68/Q69, Q72/Q73, Q75/Q76)
import gofeed_spark.queries.feed  # noqa: F401  (Q47-Q51, Q67 feed-state layer)
import gofeed_spark.queries.streaming_q  # noqa: F401  (Q52 streaming gate)
import gofeed_spark.queries.web  # noqa: F401  (Q134/Q135 HTML extraction)
import gofeed_spark.queries.tables  # noqa: F401  (Q156 Delta Lake interop)

__all__ = ["QUERIES", "ORACLES", "MIN_ROWS", "query", "get_query"]

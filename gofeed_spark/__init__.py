"""gofeed_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``steeling/gofeed`` reference system,
re-expressed Spark-first (DataFrame / Spark SQL / Catalyst / Structured
Streaming) and extended with the relational + LLM-data-pipeline surface
declared in SURVEY.md §2.

Design principles (see SURVEY.md §7):
- Declarative DataFrame plans; Catalyst owns optimization (pushdown, pruning,
  join selection, AQE). No hand-scheduled execution.
- JVM-side built-in functions in hot paths; Arrow-batched pandas UDFs only
  where built-ins cannot express semantics (HTTP map operator, multimodal
  featurizers).
- No ``collect()`` on data paths; everything partitions to 1000-executor
  scale (broadcast small dims, salt skew, LSH instead of brute force).
"""

from gofeed_spark.session import get_spark, ensure_session_confs
from gofeed_spark.catalog import load_table, register_views, TABLES

__all__ = [
    "get_spark",
    "ensure_session_confs",
    "load_table",
    "register_views",
    "TABLES",
]

__version__ = "0.1.0"

"""Feed-state layer: the reference's partition/item change-feed semantics
(gate state machine, retry engine, OCC upsert, pluggable processor)
re-expressed as set-based Spark operations.

Reference provenance (semantics only, no code ported):
- gate decision ladder  /root/reference/internal/state/watcher.go:147-161
- item retry/error      /root/reference/internal/state/item.go:27-38
- OCC save              /root/reference/internal/state/repo.go:125-138
- processor interface   /root/reference/internal/state/processor.go:10-13
- HTTP processor        /root/reference/internal/processors/httprocessor/processor.go:62-86
"""

from gofeed_spark.feedstate.engine import (
    apply_process_results,
    feed_step,
    gate_decision,
    occ_upsert,
    run_feed_to_fixpoint,
)
from gofeed_spark.feedstate.model import (
    AVAILABLE,
    COMPLETE,
    FAILED,
    UNKNOWN,
    item_fixture_rows,
    partition_fixture_rows,
    seed_dataframes,
)
from gofeed_spark.feedstate.processors import (
    http_processor,
    json_times_processor,
    process_items,
)

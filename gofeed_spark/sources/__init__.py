"""Custom sources.  ``feed_cdc`` is the incremental change-feed source —
the one genuinely custom connector this engine needs (SURVEY §4: "DB-CDC
source ... custom Python DataSource"), replacing the reference's poll loop
(watcher.go:89-122) with a Structured Streaming source whose offset is the
high-water mark of ``updated_at``.
"""

from gofeed_spark.sources.feed_cdc import FeedCDCDataSource, register_feed_cdc

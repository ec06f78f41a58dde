"""Watermarked streaming window aggregations — the streaming twins of the
batch queries Q31 (sessionization) and Q32 (tumbling hourly rollup).

The reference has no event time at all (SURVEY §2.B); these are declared
north-star extensions.  Late data beyond the watermark is dropped — the
batch twins are the ground truth the tests compare against when every
event arrives inside the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_tumbling_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Hourly tumbling count+sum per event_type (streaming Q32).

    groupBy(window) shuffles on (window, event_type) with partial
    aggregation map-side; the watermark bounds state retention.  ``sv``
    is the exact decimal(18,4) sum cast to double — IDENTICAL in form to
    batch q32's, so the streaming-equals-batch test compares raw values
    (no compensating rounds on either side)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sv"),
        )
        .select(F.col("w.start").alias("h"), "event_type", "n", "sv")
    )


def streaming_dedup(
    events: DataFrame, key_cols: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each key wins, state
    bounded by the watermark (``dropDuplicatesWithinWatermark`` expires
    seen-keys once they age out) — the streaming twin of the batch
    keep-first dedup, and the dedup story for a continuously-ingested
    training corpus."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_stream_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: each purchase joins
    clicks by the same user within ``horizon`` BEFORE it (click-through
    attribution).  Watermarks on both sides bound the join state — without
    the time bound a stream-stream join is unbounded-state and rejected.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        F.expr(
            f"""c_user = p_user AND
                click_ts <= purchase_ts AND
                click_ts >= purchase_ts - INTERVAL {horizon}"""
        ),
    ).select("p_user", "purchase_id", "click_id", "click_ts", "purchase_ts")


def streaming_session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap (streaming
    Q31 twin) via the built-in session_window — state merges adjacent
    windows per key and expires on watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.min("event_id").alias("first_event"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "first_event",
        )
    )


def streaming_sliding_counts(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (hopping) count+sum per event_type — the streaming twin of
    batch q124.  Every event lands in width/slide windows; the watermark
    bounds how long each open window's state is retained.  Window start
    is emitted as epoch seconds, and ``sv`` is the exact decimal(18,4)
    sum cast to double — both IDENTICAL in form to q124's output, so the
    twins compare raw (no compensating rounds)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sv"),
        )
        .select(
            F.col("w.start").cast("long").alias("ws"), "event_type", "n", "sv"
        )
    )

"""Watermarked streaming window aggregations over an event stream.

These are the streaming twins of the batch corpus queries q36-q38
(queries/windows.py) — same window semantics, expressed against a
streaming DataFrame with ``withWatermark`` bounding state for late data.
The reference's late-data story is "re-run MSCK + DLQ" (README.md:139);
Structured Streaming replaces that with watermark-bounded incremental
state.

All builders take any streaming DataFrame with (ts timestamp, user_id,
event_type, value) — tests feed them a file stream of the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window counts (append-able once watermark passes)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def sessionized_counts(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows with a dynamic gap — merge-on-watermark state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful dedup within the watermark horizon — the idempotent-ingest
    primitive for at-least-once sources."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])

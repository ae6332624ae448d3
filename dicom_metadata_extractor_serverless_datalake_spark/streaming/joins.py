"""Streaming joins: stream-static enrichment and watermarked
stream-stream interval joins.

The reference has no streaming joins (its "join" is Athena SQL over the
finished lake, SURVEY §2.B); these complete the Structured Streaming
surface a lake-ingest engine needs:

- stream-static: enrich in-flight events against a dimension table. The
  static side re-resolves per micro-batch (a dim update is picked up on
  the next batch) and is broadcast, so the stream side never shuffles.
- stream-stream: correlate two live streams (e.g. error events with the
  click that preceded them). Both sides are watermarked and the join
  carries an event-time interval condition so state is provably
  bounded: rows age out once the watermark passes ``ts + upper``.

Scale notes (100 TB/day streams): the interval condition is what keeps
executor state finite — an unconstrained stream-stream equi-join buffers
both streams forever. State size ~ rate x (watermark + interval) per
key, independent of total history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: per-micro-batch broadcast lookup against a
    (small) dimension. No state, no watermark needed — the static side
    is re-read each batch, so slowly-changing dims stay fresh."""
    # drop the dim side's key by column reference: when stream_key and
    # dim_key share a name, a string-based drop would remove BOTH copies
    # (silently losing the stream's join key from the output)
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], how
    ).drop(dim[dim_key])


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 15 MINUTES",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: match right rows occurring within
    (left_ts + lower, left_ts + upper] of a left row with the same key.

    Both inputs must expose ``key`` plus their ts column (pre-renamed so
    the joined schema is unambiguous). The time bound + watermarks bound
    the join state; ``how`` may be "inner" or "leftOuter" (outer rows
    emit once the watermark passes their horizon)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] > F.expr(f"{left_ts} + {lower}"))
        & (rw[right_ts] <= F.expr(f"{left_ts} + {upper}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])

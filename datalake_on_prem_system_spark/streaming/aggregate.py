"""Watermarked streaming aggregation (beyond-reference: SURVEY §2.12 notes
the reference has no event-time windows; this is the scalable shape for
T6-style late/duplicate handling on event streams)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling-window counts/sums with a watermark bounding state for late
    data. Works on both batch and streaming DataFrames (same plan; the
    watermark is a no-op in batch)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, window_size).alias("w")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )


def session_event_agg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Per-key SESSION windows (dynamic-length, inactivity-gap-closed) via
    Spark's native ``session_window`` — the streaming form of the batch
    gaps-and-islands sessionization (``operators/relational.py::
    w_sessionize``). State per key is one open session, evicted when the
    watermark passes its close — bounded by active keys, not stream length.

    Boundary contract: ``session_window`` MERGES a successor arriving
    exactly ``gap`` later (a new session starts only when the silence is
    STRICTLY greater than the gap) — the same rule as the batch
    gaps-and-islands operator, pinned by the edge-events fixture whose
    user 3 has an exactly-at-gap successor. The session end is
    ``last event + gap`` (the oracle adds the gap to ``max(ts)``)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("session_value"),
    )

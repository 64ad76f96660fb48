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

"""Stream-stream interval join (beyond-reference: SURVEY §2.12 — the
reference's streaming surface is CDC-merge only; this is the scalable shape
for correlating two live event streams, e.g. attribution: purchase within
an hour of a click).

Scale design: Structured Streaming's stream-stream join shuffles both sides
on the equi-key (user_id), so state and matching are per-key-partition —
no broadcast, no cross product. The time-range condition PLUS watermarks on
both sides bound the join state: a buffered left row is evicted once the
right watermark passes ``left_ts + upper``, so state is
O(rate × (watermark + interval)) per key-partition regardless of total
stream length. Without the range condition Spark would keep unbounded state
— this module makes the bound mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    equi_cond: str,
    max_delay: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """INNER-join two (streaming or batch) frames on ``equi_cond`` with the
    right event occurring within [left_ts, left_ts + max_delay].

    Watermarks are applied on both sides when streaming (required by Spark
    for state eviction in stream-stream joins; a no-op in batch, so the
    same plan is batch-testable against a SQL oracle).
    """
    lf, rf = left, right
    if lf.isStreaming:
        lf = lf.withWatermark(left_ts, watermark)
    if rf.isStreaming:
        rf = rf.withWatermark(right_ts, watermark)
    # equi_cond is parenthesized: an OR inside it must not outbind the ANDed
    # time-range (AND binds tighter than OR — an unparenthesized OR branch
    # would join with NO time bound, i.e. unbounded stream state)
    cond = F.expr(
        f"({equi_cond}) AND {right_ts} >= {left_ts} "
        f"AND {right_ts} <= {left_ts} + INTERVAL {max_delay}"
    )
    return lf.join(rf, cond)

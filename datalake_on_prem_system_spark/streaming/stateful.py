"""Custom stateful streaming operators via ``applyInPandasWithState``.

Beyond-reference capability (the reference's only cross-batch state is the
MERGE target table itself): arbitrary per-key state kept by Spark's state
store across micro-batches, checkpoint-recoverable. The example operator
maintains per-user running counters/sums — the building block for
streaming feature computation, rate limiting, or incremental sessionization.

Scale notes: state is partitioned by the grouping key across executors;
each micro-batch shuffles only that batch's rows to their key's partition.
GroupStateTimeout can evict idle keys to bound the store.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd
    from pyspark.sql import DataFrame

STATE_SCHEMA = "n bigint, total double"
OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"


def _update_user_totals(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: "DataFrame") -> "DataFrame":
    """Per-user running (count, sum) across all micro-batches seen so far.
    Emits one updated row per key per batch (use outputMode='update')."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

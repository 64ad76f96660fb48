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


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_STATE_SCHEMA = "stage int, t bigint"
FUNNEL_OUTPUT_SCHEMA = "user_id bigint, stage int"


def _advance_funnel(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    """Fold this batch's events (time-sorted; (ts_us, event_type) tiebreak
    matching the batch operator's struct sort) through the per-user
    (stage, t) funnel state. A step counts only STRICTLY AFTER the
    previous step's completion — the same contract as
    ``operators/analytics.py::ev_funnel``. t=-1 encodes "no step yet"."""
    import pandas as pd

    stage, t = state.get if state.exists else (0, -1)
    # one user's batch arrives as MULTIPLE Arrow chunks (split at
    # maxRecordsPerBatch) — the time sort must span all of them, or a
    # later chunk's earlier event would fold out of order
    chunks = list(pdfs)  # NoTimeout ⇒ called only with data, but stay safe
    batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    if len(batch):
        for row in batch.sort_values(["ts_us", "event_type"]).itertuples():
            if stage < len(FUNNEL_STEPS) and row.event_type == FUNNEL_STEPS[stage]:
                if stage == 0 or row.ts_us > t:
                    stage, t = stage + 1, int(row.ts_us)
    state.update((stage, t))
    yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})


EMA_ALPHA = 0.2
EMA_STATE_SCHEMA = "n bigint, ema double"
EMA_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, ema double"


def _advance_ema(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    """Fold this batch's values (sorted by (ts_us, event_id), the batch
    operator's struct order) through the per-user (n, ema) state with the
    SAME per-step semantics as ``operators/analytics.py::w_ema``,
    INCLUDING nulls: in the batch fold a NULL value nulls the accumulator
    (0.2·NULL + 0.8·acc is NULL) and the next non-null value restarts the
    EMA via the acc-is-null branch — so the state here is the accumulator
    itself (nullable), NOT an every-row counter, or one null-valued event
    would NaN-poison the stream forever while the batch tier recovers.
    6-decimal rounding per step: binary ties at 1e-6 are impossible for
    doubles, so Python round == the engines' HALF_UP here."""
    import pandas as pd

    n, ema = state.get if state.exists else (0, None)
    chunks = list(pdfs)
    batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    if len(batch):
        for row in batch.sort_values(["ts_us", "event_id"]).itertuples():
            if pd.isna(row.value):
                ema = None  # NULL value nulls the accumulator (batch parity)
            elif ema is None:
                ema = round(float(row.value), 6)
            else:
                ema = round(0.2 * float(row.value) + 0.8 * ema, 6)
            n += 1
    state.update((n, ema))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ema": [ema]})


def ema_stream(events: "DataFrame") -> "DataFrame":
    """Per-user exponential moving average maintained ACROSS micro-batches
    — the streaming tier of the batch ``w_ema`` fold. State is two scalars
    per user (the recursion's whole memory), so an unbounded stream smooths
    in O(keys) state; the batch form must collect each user's full history.
    Same ordering contract as ``funnel_stage_stream``: time-ordered within
    a batch, arrival-ordered across batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _advance_ema,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_stage_stream(events: "DataFrame") -> "DataFrame":
    """Per-user conversion-funnel stage maintained ACROSS micro-batches —
    the streaming form of the batch ``ev_funnel`` fold, with the state
    store holding each user's (stage, last-step-time) instead of a
    collected event array. Emits each user's current stage per batch
    (outputMode='update'); state is one tiny tuple per user, partitioned
    by user across executors.

    Ordering contract: events are folded in time order WITHIN each batch;
    cross-batch order is the arrival order (a step event arriving in a
    later batch than a chronologically-later one can over-advance the
    funnel). Equivalence with the batch oracle therefore holds when the
    source delivers batches in event-time order — the availableNow
    single-batch harness pins that, and the multi-batch pytest feeds
    time-ordered files."""
    return events.groupBy("user_id").applyInPandasWithState(
        _advance_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

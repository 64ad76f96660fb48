"""Physical-plan audit helpers.

``.explain()`` prints; these return the plan as data so tests can assert
the properties that matter at 100 TB: filters pushed to the parquet scan,
small sides broadcast, whole-stage codegen covering the hot path, and no
more exchanges (shuffles) than the query semantically needs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def capture_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The formatted physical plan as a string (what .explain prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001 — public-API gap
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanAudit:
    n_exchanges: int
    n_broadcasts: int
    n_codegen_spans: int
    pushed_filters: list[str]
    read_schemas: list[str]
    has_take_ordered: bool
    has_partial_agg: bool
    has_batched_scan: bool

    def summary(self) -> str:
        return (
            f"exchanges={self.n_exchanges} broadcasts={self.n_broadcasts} "
            f"codegen={self.n_codegen_spans} pushed={len(self.pushed_filters)} "
            f"topk={self.has_take_ordered}"
        )


def audit_plan(df: DataFrame) -> PlanAudit:
    plan = capture_plan(df)
    return PlanAudit(
        # broadcast exchanges move only the small side; count real shuffles
        # ("BroadcastExchange (" must not match the formatted-node pattern)
        n_exchanges=len(re.findall(r"\bExchange (?:hash|range|SinglePartition)", plan))
        + len(re.findall(r"(?<!Broadcast)Exchange \(", plan)),
        n_broadcasts=plan.count("BroadcastExchange") + plan.count("BroadcastHashJoin"),
        n_codegen_spans=len(
            set(re.findall(r"\[codegen id : (\d+)\]", plan))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
        pushed_filters=[
            m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m.strip()
        ],
        read_schemas=re.findall(r"ReadSchema: (\S+)", plan),
        has_take_ordered="TakeOrderedAndProject" in plan,
        # map-side combine: partial_* aggregate functions below the exchange
        has_partial_agg="partial_" in plan,
        # vectorized parquet reader feeding whole-stage codegen
        has_batched_scan="Batched: true" in plan,
    )

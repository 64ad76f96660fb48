"""Operator inventory (SURVEY.md §2) + LLM-pipeline extensions.

Each module exposes:

- ``QUERIES``: dict[name -> Callable[(SparkSession, sf_dir) -> DataFrame]]
- ``ORACLE``:  dict[name -> ANSI SQL string] (DuckDB-runnable oracle; a name
  missing here is a rows-only operator — non-SQL-expressible or intentionally
  Spark-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytics,
    curation,
    dedup,
    facade_ops,
    ingest_ops,
    lakehouse_ops,
    multimodal,
    pipeline_ops,
    relational,
    search,
    similarity,
    streaming_ops,
    textops,
    tpch,
    tpch2,
)

# Registration order drives the order external harnesses sweep queries in.
# The sweep is budget-capped (~50 queries/round), so we ROTATE which families
# lead each round: whichever family's driver row is oldest goes first, so no
# family's correctness row ages more than ~2 rounds. Round 6 refreshed
# relational/tpch/search; the 30 round-6 additions (tpch2 q12-q22, analytics
# windows/grouping-sets, lh_changes_feed/lh_clone_divergence, streaming
# interval-join/dedup/enrich, in_jsonl/in_orc/in_jdbc, dd_components,
# pl_dedup_canonical/pl_sequence_pack) have never had a driver row, so round 7
# fronts exactly those families, smallest-first so all 30 fit the budget.
_MODULES = (
    pipeline_ops,
    dedup,
    tpch2,
    analytics,
    streaming_ops,
    ingest_ops,
    lakehouse_ops,
    relational,
    tpch,
    search,
    facade_ops,
    similarity,
    multimodal,
    curation,
    textops,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out

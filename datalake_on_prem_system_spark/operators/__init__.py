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
# family's correctness row ages more than ~2 rounds. Round 5 refreshed
# lakehouse/streaming/ingest/facade/dedup/similarity/multimodal/pipeline/
# curation/textops; the relational/tpch/search rows date to r2/r3, so round 6
# puts them in front.
_MODULES = (
    relational,
    tpch,
    search,
    tpch2,
    analytics,
    lakehouse_ops,
    streaming_ops,
    ingest_ops,
    facade_ops,
    dedup,
    similarity,
    multimodal,
    pipeline_ops,
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

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
)

_MODULES = (
    relational,
    tpch,
    search,
    textops,
    dedup,
    similarity,
    multimodal,
    lakehouse_ops,
    ingest_ops,
    streaming_ops,
    facade_ops,
    pipeline_ops,
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

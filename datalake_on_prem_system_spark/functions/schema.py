"""Column-name sanitization + schema evolution.

- ``sanitize_column_name``: Avro-safe names (spaces → ``_``; strip ``.``,
  ``/``, parentheses) — ingest_csv_hudi.py:63-64.
- ``evolve_to_union``: align a batch to the union of (existing, new)
  columns, filling missing historical columns with typed NULLs —
  ingest_csv_hudi.py:112-146.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_BAD = re.compile(r"[./()\[\]{}]")


def sanitize_column_name(name: str) -> str:
    out = name.strip().replace(" ", "_")
    out = _BAD.sub("", out)
    return out or "_col"


def sanitize_columns(df: DataFrame) -> DataFrame:
    """toDF(*sanitized) rename-all (F8, ingest_csv_hudi.py:63-64).

    Distinct raw headers can sanitize to the SAME name ('a b' and 'a_b');
    duplicates get a positional suffix so the frame never carries ambiguous
    columns that break every later select-by-name."""
    seen: dict[str, int] = {}
    names = []
    for c in df.columns:
        base = sanitize_column_name(c)
        n = seen.get(base, 0)
        seen[base] = n + 1
        names.append(base if n == 0 else f"{base}_{n + 1}")
    return df.toDF(*names)


def evolve_to_union(df: DataFrame, existing_schema: StructType) -> DataFrame:
    """Align ``df`` to union(existing, new) column order: existing columns
    first (typed NULL where the batch lacks them), then genuinely new
    columns — the Hudi schema-evolution union (ingest_csv_hudi.py:112-146).
    """
    cols = []
    for field in existing_schema.fields:
        if field.name in df.columns:
            # keep the BATCH's own type: append/merge detect a type
            # conflict themselves (_union_schema_json → None) and resolve
            # it with a widening rewrite; a forced cast here would
            # ANSI-throw on unparseable values (or silently NULL them with
            # ANSI off) before that machinery ever ran
            cols.append(F.col(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    for c in df.columns:
        if c not in existing_schema.fieldNames():
            cols.append(F.col(c))
    return df.select(*cols)

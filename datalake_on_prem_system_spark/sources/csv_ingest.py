"""CSV ingestion — the reference's front door (S1/K1-K3/F8).

Mirrors ``ingest_to_iceberg.py:43-52`` (header + inferSchema read, then
create-or-replace) and ``ingest_csv_hudi.py`` (column sanitization :63-64,
schema evolution :112-146, upsert mode :80-99) on the LakeTable substrate.

Scale notes: ``spark.read.csv`` splits large files by byte ranges and
distributes inference's sampling pass; at 100 TB you'd pass an explicit
schema (skip the inference scan) and partition the output by an ingest key —
both are options here, neither changes the call shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.schema import evolve_to_union, sanitize_columns
from ..lakehouse.table import LakeTable


def read_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Header + inferred-schema CSV read with Avro-safe column names."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return sanitize_columns(reader.csv(path))


def ingest_csv(
    table: LakeTable,
    path: str,
    mode: str = "create",
    pk: str | None = None,
    precombine: str | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Ingest a CSV into a versioned table.

    mode='create'  → create-or-replace (K1, ingest_to_iceberg.py:52)
    mode='append'  → append with schema evolution (K2 + union-of-columns)
    mode='upsert'  → keyed MERGE with optional precombine dedup (K3,
                     ingest_csv_hudi.py:80-99)

    ``partition_by`` is the Hudi partition-path analog
    (ingest_csv_hudi.py:101-103 PARTITIONPATH_FIELD): the created table is
    hive-partitioned on those columns so partition-key filters prune files
    at the scan. On append/upsert the table's existing layout is kept.

    Returns the read-back table (the reference count-verifies every ingest,
    ingest_to_iceberg.py:55-56).
    """
    if mode not in ("create", "append", "upsert"):
        # validate BEFORE the exists() short-circuit: a typo'd mode must
        # not silently create the table
        raise ValueError(f"unknown mode: {mode}")
    df = read_csv(table.spark, path)
    if precombine == "_ingest_ts":
        # F5: synthesize the precombine column when the CSV has none
        # (ingest_csv_hudi.py:68-69: current_timestamp().cast("string"))
        from pyspark.sql import functions as F

        df = df.withColumn("_ingest_ts", F.current_timestamp().cast("string"))
    if mode == "create" or (mode == "append" and not table.exists()):
        table.create_or_replace(df, partition_by=partition_by)
    elif mode == "append":
        table.append(evolve_to_union(df, table.read().schema))
    else:  # upsert — ALWAYS routed through merge, including a missing
        # table: merge's bootstrap enforces the pk, applies the precombine
        # dedup to the first batch, and lays the table out pk-bucketed —
        # a create_or_replace short-circuit would persist duplicate keys
        if pk is None:
            raise ValueError("upsert mode requires pk")
        if partition_by and not table.exists():
            raise ValueError(
                "partition_by applies to create mode; create the partitioned "
                "table first, then upsert into it"
            )
        src = df if not table.exists() else evolve_to_union(df, table.read().schema)
        table.merge(src, pk=pk, precombine=precombine)
    return table.read()

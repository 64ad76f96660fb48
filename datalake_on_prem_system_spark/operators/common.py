"""Shared helpers for operator modules."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (parquet; column pruning + predicate pushdown
    handled by the DSv2 parquet source)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

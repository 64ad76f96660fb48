"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datalake_on_prem_system_spark import operators

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    """Session configs the engine needs when the driver owns the session.
    nanosAsLong covers the legacy INT64 TIMESTAMP(NANOS) fixture shape (a
    no-op for the current timestamp[us] fixtures); UTC pins the session tz
    so operators.common.t()'s TIMESTAMP_NTZ→timestamp normalization is
    wall-clock-identical to DuckDB's naive timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # right-size shuffles for the sweep's data scale: AQE coalesces batch
    # shuffles anyway, but stateful STREAMING aggregations cannot use AQE —
    # in a bare driver session they would otherwise run 200 state-store
    # partitions per micro-batch (fresh checkpoints per query, so changing
    # this is safe)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: TPC-H Q3-shape top-revenue orders
    (dim-filtered broadcast join → agg → distributed top-k)."""
    _configure(spark)
    from datalake_on_prem_system_spark.operators.tpch import q3_top_revenue_orders

    return q3_top_revenue_orders(spark, _SMOKE_SF_DIR)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_configure(spark), sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-pipeline
    extensions). Each callable takes (spark, sf_dir) and returns a DataFrame."""
    return {name: _wrap(fn) for name, fn in operators.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query — every registered query has
    one. The approximate operators (SimHash, ANN-LSH, ANN-IVF) are
    hash-checked too: their hashing / plane signatures / index training are
    deterministic and engine-portable, so the oracle replays the identical
    algorithm. ``a_hll_distinct`` (DataSketches HLL, engine-native
    estimate) is checked through its error-bound CONTRACT instead: the
    query emits (exact, within_bound) and the oracle emits (exact, TRUE)."""
    return operators.all_oracle_sql()

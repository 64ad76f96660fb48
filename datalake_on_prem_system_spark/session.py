"""SparkSession factory.

Mirrors the reference's session bootstrap (``cdc_merger_optimized.py:80-112``:
shuffle partitions matched to source parallelism, adaptive writes, object-store
tuning) re-expressed for idiomatic Spark:

- AQE on (runtime re-plan, skew-join handling, partition coalescing) instead
  of hand-tuned ``spark.sql.shuffle.partitions=64``.
- UTC session timezone so timestamp semantics are engine-independent.
- Arrow enabled for the Pandas-UDF slow path.

On a real cluster the same builder is used with ``master`` unset (picked up
from spark-submit) — nothing here is local-mode-specific except the default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "datalake_on_prem_system_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster
    manager supplied one; on a 1000-executor cluster, leave it unset.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        # In local mode every task runs in the driver JVM, whose default 1g
        # heap starves N concurrent parquet writers (MemoryManager row-group
        # downscaling → tiny row groups → slow reads) and forces GC churn.
        # 8g measured best: a 24g heap let G1 accumulate huge mixed
        # collections (identical CDC batches swung 1.8s→14.6s; at 8g the
        # spread was 2.0s→3.6s). Only effective before the JVM starts — a
        # no-op under spark-submit with an explicit --driver-memory, and
        # irrelevant on a real cluster where executors own the task heap.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # On a cluster, pair this with a high
        # spark.sql.adaptive.coalescePartitions.initialPartitionNum and let
        # AQE coalesce to the advisory size; at local fixture scale the
        # extra shuffle buckets are measured pure overhead (+50% on the
        # bench), so local runs keep the fixed core-count sizing.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Legacy fixture shape: INT64 TIMESTAMP(NANOS), which Spark 4 refuses
        # unless read as long. Harmless no-op for the current timestamp[us]
        # fixtures; operators.common.t() normalizes either shape.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER_SET"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""JDBC federation (S6) and CSV→DB load (S7).

The reference federates live MySQL/Postgres through Trino catalogs
(``trino/etc/catalog/mysql.properties``, ``postgresql.properties``) and
loads CSVs into the source DBs with pandas ``to_sql``
(``csv_to_sql.py:32-37``). Spark-native equivalents are the built-in JDBC
source/sink; this module is the thin policy layer (partitioned reads,
append-mode loads).

In this sandbox the paths run LIVE against embedded Apache Derby (bundled
with Spark as the metastore dependency): ``in_jdbc_roundtrip`` loads a
fixture table through ``write_jdbc`` and federates it back through a
partitioned ``read_jdbc``, hash-checked against the DuckDB oracle.
MySQL/Postgres are the same code with a different URL/driver pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Federated table scan. With ``partition_column`` bounds, the read is
    split into ``num_partitions`` range queries executed in parallel —
    without it, a JDBC read is a single-connection bottleneck at scale."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    **options: str,
) -> None:
    """CSV→DB load tail (S7): ``df.write.jdbc(mode='append')`` — the
    distributed replacement for pandas ``to_sql(if_exists='append')``."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()

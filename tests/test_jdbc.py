"""Live JDBC federation (S6) and DB load (S7) against embedded Derby — the
driver jar Spark itself ships. The oracle sweep checks values; this pins
the SCALE properties: the federated read is genuinely split into parallel
range partitions, and the post-read filter is pushed into the JDBC source
(not evaluated Spark-side over the full table)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from datalake_on_prem_system_spark.operators.common import t
from datalake_on_prem_system_spark.operators.ingest_ops import _DERBY_DRIVER
from datalake_on_prem_system_spark.sources.jdbc import read_jdbc, write_jdbc


def test_jdbc_partitioned_read_and_pushdown(spark, sf_dir):
    db = os.path.join(tempfile.mkdtemp(prefix="derby_t_"), "db")
    url = f"jdbc:derby:{db};create=true"
    src = t(spark, sf_dir, "nation")
    write_jdbc(src, url, "nation_t", mode="overwrite", driver=_DERBY_DRIVER)

    back = read_jdbc(
        spark, url, "nation_t",
        partition_column="n_nationkey", num_partitions=4,
        lower_bound=0, upper_bound=25, driver=_DERBY_DRIVER,
    )
    # S6 scale contract: 4 parallel range connections, not one socket
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == src.count()

    filtered = back.filter(F.col("n_regionkey") == 2)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # the filter must reach the JDBC source as a pushed predicate
    assert "PushedFilters" in plan and "n_regionkey" in plan.split("PushedFilters")[1][:200], plan
    got = {r.n_nationkey for r in filtered.collect()}
    want = {r.n_nationkey for r in src.filter(F.col("n_regionkey") == 2).collect()}
    assert got == want


def test_jdbc_append_mode(spark, sf_dir):
    db = os.path.join(tempfile.mkdtemp(prefix="derby_t_"), "db")
    url = f"jdbc:derby:{db};create=true"
    region = t(spark, sf_dir, "region")
    write_jdbc(region, url, "region_t", mode="overwrite", driver=_DERBY_DRIVER)
    write_jdbc(region, url, "region_t", mode="append", driver=_DERBY_DRIVER)
    back = read_jdbc(spark, url, "region_t", driver=_DERBY_DRIVER)
    assert back.count() == 2 * region.count()

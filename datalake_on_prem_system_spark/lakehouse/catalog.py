"""LakeCatalog: namespace → table directory mapping + metadata queries.

The reference's catalog surface (Hive Metastore behind Trino) reduced to
what its API actually uses: SHOW TABLES (api_poc.py:131,280-281), DESCRIBE
(api_poc.py:382-389), CREATE NAMESPACE (cdc_merger_optimized.py:189),
table-name validation (api_poc.py:304 ``isidentifier``).
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable

if TYPE_CHECKING:
    from .format import TableFormat


class LakeCatalog:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        namespace: str = "db",
        table_format=None,
    ):
        """``table_format`` is a ``(spark, path) -> TableFormat`` factory —
        the seam that swaps the bundled ``LakeTable`` for a connector-backed
        binding (``DeltaTableFormat``) without touching anything above."""
        self.spark = spark
        self.warehouse = warehouse
        self.namespace = namespace
        self.table_format = table_format or LakeTable

    def _ns_dir(self) -> str:
        return os.path.join(self.warehouse, self.namespace)

    def create_namespace(self) -> None:
        """CREATE NAMESPACE IF NOT EXISTS."""
        os.makedirs(self._ns_dir(), exist_ok=True)

    @staticmethod
    def _validate(name: str) -> str:
        if not name.isidentifier():
            raise ValueError(f"invalid table name: {name!r}")
        return name

    def table(self, name: str) -> "TableFormat":
        return self.table_format(
            self.spark, os.path.join(self._ns_dir(), self._validate(name))
        )

    def list_tables(self) -> list[str]:
        """SHOW TABLES."""
        ns = self._ns_dir()
        if not os.path.isdir(ns):
            return []
        return sorted(
            d
            for d in os.listdir(ns)
            if self.table_format(self.spark, os.path.join(ns, d)).exists()
        )

    def describe(self, name: str) -> DataFrame:
        """DESCRIBE t → (col_name, data_type) rows."""
        df = self.table(name).read()
        return self.spark.createDataFrame(
            [(f.name, f.dataType.simpleString()) for f in df.schema],
            "col_name string, data_type string",
        )

    def register_views(self) -> None:
        """Bridge every table into Spark SQL as a temp view (D7,
        cdc_merger_optimized.py:169) so ``spark.sql`` passthrough (S5) sees
        the catalog."""
        for name in self.list_tables():
            self.table(name).read().createOrReplaceTempView(name)

"""The ``TableFormat`` seam (SURVEY.md §7): the protocol every table-format
binding must satisfy.

The engine, catalog, CLI, and HTTP API depend ONLY on this surface — never on
``LakeTable`` internals — so a table format backed by a real connector
(delta-spark's ``DeltaTable``, Iceberg's Spark catalog) is a drop-in: a
binding maps each method onto the connector's own primitives and everything
above the seam keeps working. ``LakeTable`` is the bundled, zero-dependency
implementation (parquet + JSON commit log).

``DeltaTableFormat`` below is the delta-spark binding: a full
implementation of the protocol over these primitives (delta-spark is not
installable in this environment, so its conformance tests importorskip —
the signature-level conformance still runs everywhere):

====================  ==========================================
protocol method       delta-spark primitive
====================  ==========================================
create_or_replace     ``df.write.format("delta").mode("overwrite")``
append                ``df.write.format("delta").mode("append")``
merge                 ``DeltaTable.merge().whenMatched...`` chains
delete_where          ``DeltaTable.delete(condition)``
update_where          ``DeltaTable.update(condition, set)``
insert_rows           ``df.write.format("delta").mode("append")``
read(version=)        ``spark.read.option("versionAsOf", v)``
read_as_of            ``option("timestampAsOf", ts)``
history               ``DeltaTable.history()``
compact               ``OPTIMIZE`` (``DeltaTable.optimize()``)
expire_snapshots      ``VACUUM`` + log retention
====================  ==========================================
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Protocol, runtime_checkable

from pyspark.sql import DataFrame

if TYPE_CHECKING:
    from .table import Commit


@runtime_checkable
class TableFormat(Protocol):
    """Structural protocol for a versioned lakehouse table.

    Write methods return the format's commit/snapshot descriptor (``Commit``
    for ``LakeTable``; bindings may return their own snapshot type — callers
    above the seam only rely on reads, not on commit internals).
    """

    # the table's storage location — part of the protocol because the
    # engine keys derived state (the materialized search index) on it
    root: str

    # ---- existence / lineage
    def exists(self) -> bool: ...
    def versions(self) -> list[int]: ...
    def latest_version(self) -> int | None: ...

    # ---- reads
    def read(
        self, version: int | None = None, fallback_to_latest: bool = False
    ) -> DataFrame: ...
    def read_as_of(self, ts: float) -> DataFrame: ...
    def history(self) -> DataFrame: ...

    # ---- writes
    def create_or_replace(self, df: DataFrame, **kwargs: Any) -> "Commit": ...
    def append(self, df: DataFrame) -> "Commit": ...
    def merge(
        self,
        source: DataFrame,
        pk: str,
        op_col: str | None = None,
        precombine: str | None = None,
        n_buckets: int | None = None,
        mode: str | None = None,
    ) -> "Commit": ...
    def delete_where(self, condition) -> "Commit": ...
    def update_where(self, condition, assignments: dict[str, Any]) -> "Commit": ...
    def insert_rows(self, rows: list[dict[str, Any]]) -> "Commit": ...

    # ---- maintenance
    def compact(
        self,
        target_partitions: int | None = None,
        cluster_by: list[str] | None = None,
    ) -> "Commit": ...
    def expire_snapshots(self, keep_last: int = 2) -> list[int]: ...


class DeltaTableFormat:
    """delta-spark binding of the ``TableFormat`` protocol (method mapping
    in the module docstring). Construction requires the ``delta`` package —
    callers in environments without it (this sandbox) importorskip; the
    class itself imports lazily so signature-level conformance tests run
    everywhere.

    Semantics parity notes vs ``LakeTable``:

    - ``merge`` replicates the same MERGE branches (op='d' deletes, any
      other op upserts null-safely, precombine = last-writer-wins per key)
      via ``DeltaTable.merge`` chains; Delta handles file-granular COW /
      deletion vectors itself, so ``n_buckets``/``mode`` are accepted and
      ignored — the connector owns the layout.
    - ``versions``/``history`` come from the Delta log; ``parent`` is
      version-1 (the log is linear).
    - ``expire_snapshots`` maps to VACUUM: Delta's retention is time-based,
      so the count-based contract is approximated — returned versions are
      the ones beyond ``keep_last``, whose data files VACUUM may remove
      once out of retention. Reads of expired versions raise and
      ``fallback_to_latest`` routes to the live table, matching
      ``LakeTable``'s observable contract.
    """

    def __init__(self, spark, path: str):
        import delta  # noqa: F401 — ImportError here is the importorskip signal

        self.spark = spark
        self.root = path

    # ------------------------------------------------------------ internals

    def _dt(self):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, self.root)

    # ---- existence / lineage

    def exists(self) -> bool:
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(self.spark, self.root)

    def versions(self) -> list[int]:
        if not self.exists():
            return []
        return sorted(
            r.version for r in self._dt().history().select("version").collect()
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    # ---- reads

    def read(
        self, version: int | None = None, fallback_to_latest: bool = False
    ) -> DataFrame:
        reader = self.spark.read.format("delta")
        if version is None:
            return reader.load(self.root)
        try:
            df = reader.option("versionAsOf", version).load(self.root)
            df.schema  # force analysis so a missing version raises HERE
            return df
        except Exception as exc:
            # fall back ONLY for expired/absent versions (LakeTable's
            # contract) — a transient analysis failure must surface, not
            # silently serve the latest state
            from pyspark.errors import AnalysisException

            is_version_miss = isinstance(exc, AnalysisException) and (
                "version" in str(exc).lower() or "time travel" in str(exc).lower()
            )
            if fallback_to_latest and is_version_miss:
                return self.spark.read.format("delta").load(self.root)
            raise

    def read_as_of(self, ts: float) -> DataFrame:
        from datetime import datetime, timezone

        stamp = datetime.fromtimestamp(ts, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S.%f"
        )
        return (
            self.spark.read.format("delta")
            .option("timestampAsOf", stamp)
            .load(self.root)
        )

    def history(self) -> DataFrame:
        from pyspark.sql import functions as F

        return (
            self._dt()
            .history()
            .select(
                F.col("version").cast("int").alias("version"),
                F.when(F.col("version") > 0, F.col("version") - 1)
                .cast("int")
                .alias("parent"),
                F.col("operation").alias("operation"),
                F.coalesce(
                    F.element_at("operationMetrics", "numOutputRows").cast("bigint"),
                    F.lit(-1),
                ).alias("n_rows"),
                F.unix_timestamp("timestamp").cast("double").alias("committed_at"),
            )
            .orderBy(F.desc("version"))
        )

    # ---- writes

    def create_or_replace(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
        bucket_by: tuple[str, int] | None = None,
    ):
        writer = (
            df.write.format("delta").mode("overwrite").option("overwriteSchema", "true")
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(self.root)
        if properties:
            esc = lambda s: str(s).replace("'", "''")  # noqa: E731 — SQL literal escape
            props = ", ".join(
                f"'{esc(k)}'='{esc(v)}'" for k, v in properties.items()
            )
            self.spark.sql(
                f"ALTER TABLE delta.`{self.root}` SET TBLPROPERTIES ({props})"
            )
        return self.latest_version()

    def append(self, df: DataFrame):
        df.write.format("delta").mode("append").option("mergeSchema", "true").save(
            self.root
        )
        return self.latest_version()

    def merge(
        self,
        source: DataFrame,
        pk: str,
        op_col: str | None = None,
        precombine: str | None = None,
        n_buckets: int | None = None,
        mode: str | None = None,
    ):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        if precombine is not None:
            w = Window.partitionBy(pk).orderBy(F.desc(precombine))
            source = (
                source.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        if not self.exists():
            upserts = source
            if op_col is not None:
                upserts = upserts.filter(~F.col(op_col).eqNullSafe("d")).drop(op_col)
            if precombine is not None:
                upserts = upserts.drop(precombine)
            upserts.write.format("delta").save(self.root)
            return self.latest_version()
        target_cols = set(self.read().columns)
        if precombine is not None and precombine not in target_cols:
            source = source.drop(precombine)
        merge = (
            self._dt()
            .alias("t")
            .merge(source.alias("s"), f"t.`{pk}` = s.`{pk}`")
        )
        if op_col is not None:
            data_cols = [c for c in source.columns if c != op_col]
            assign = {c: f"s.`{c}`" for c in data_cols}
            not_delete = f"s.`{op_col}` IS DISTINCT FROM 'd'"
            merge = (
                merge.whenMatchedDelete(condition=f"s.`{op_col}` = 'd'")
                .whenMatchedUpdate(condition=not_delete, set=assign)
                .whenNotMatchedInsert(condition=not_delete, values=assign)
            )
        else:
            merge = merge.whenMatchedUpdateAll().whenNotMatchedInsertAll()
        # LakeTable parity: source columns absent from the target are ADDED
        # (existing rows read NULL) — Delta's schema evolution flag, scoped
        # to this merge and restored after
        evolve_key = "spark.databricks.delta.schema.autoMerge.enabled"
        prev = self.spark.conf.get(evolve_key, None)
        self.spark.conf.set(evolve_key, "true")
        try:
            merge.execute()
        finally:
            if prev is None:
                self.spark.conf.unset(evolve_key)
            else:
                self.spark.conf.set(evolve_key, prev)
        return self.latest_version()

    def delete_where(self, condition):
        self._dt().delete(condition)
        return self.latest_version()

    def update_where(self, condition, assignments: dict[str, Any]):
        from pyspark.sql import functions as F

        self._dt().update(condition, {k: F.lit(v) for k, v in assignments.items()})
        return self.latest_version()

    def insert_rows(self, rows: list[dict[str, Any]]):
        schema = self.read().schema
        unknown = {k for r in rows for k in r} - set(schema.fieldNames())
        if unknown:
            raise ValueError(f"unknown columns: {sorted(unknown)}")
        df = self.spark.createDataFrame(
            [tuple(r.get(c) for c in schema.fieldNames()) for r in rows], schema
        )
        df.write.format("delta").mode("append").save(self.root)
        return self.latest_version()

    # ---- maintenance

    def compact(
        self,
        target_partitions: int | None = None,
        cluster_by: list[str] | None = None,
    ):
        opt = self._dt().optimize()
        if cluster_by:
            opt.executeZOrderBy(*cluster_by)
        else:
            opt.executeCompaction()
        return self.latest_version()

    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        if keep_last < 1:  # LakeTable parity: never expire the live state
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        expired = vs[:-keep_last]
        self._dt().vacuum()
        return expired

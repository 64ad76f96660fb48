"""The ``TableFormat`` seam (SURVEY.md §7): the protocol every table-format
binding must satisfy.

The engine, catalog, CLI, and HTTP API depend ONLY on this surface — never on
``LakeTable`` internals — so a table format backed by a real connector
(delta-spark's ``DeltaTable``, Iceberg's Spark catalog) is a drop-in: a
binding maps each method onto the connector's own primitives and everything
above the seam keeps working. ``LakeTable`` is the bundled, zero-dependency
implementation (parquet + JSON commit log).

Mapping sketch for a delta-spark binding (the package is not installable in
this environment, so the binding ships as a documented stub —
``DeltaTableFormat`` below — rather than a tested implementation):

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
    """Documented binding stub for delta-spark (see module docstring for the
    method mapping). Instantiable only where the ``delta`` package exists —
    this sandbox has no way to install it, so the binding raises immediately
    instead of pretending: the seam is real, the connector is absent."""

    def __init__(self, spark, path: str):
        try:
            import delta  # noqa: F401
        except ImportError as exc:  # pragma: no cover - no delta in sandbox
            raise NotImplementedError(
                "delta-spark is not installed; DeltaTableFormat documents the "
                "binding surface (module docstring) but cannot run here"
            ) from exc
        raise NotImplementedError("binding implementation pending delta-spark availability")

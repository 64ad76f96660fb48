"""LakeTable: a versioned table = parquet data files + a JSON commit log.

Re-expresses the reference's Iceberg table semantics (snapshot lineage
``api_poc.py:426-428``, time travel ``api_poc.py:374-376``, expired-snapshot
fallback ``api_poc.py:462-468``, CDC MERGE branches
``cdc_merger_optimized.py:171-183``, keyed delete ``delete_hudi.py:45-91``,
Hudi precombine upsert ``ingest_csv_hudi.py:78-99``) on plain Spark.

Layout:

    <root>/data/<version>-<uuid>.parquet/   (one Spark parquet dir per commit)
    <root>/_commits/<version>.json          (version, parent, op, data path,
                                             row count, schema, committed_at)

Every commit is copy-on-write: it references exactly one data directory
holding the full table state at that version. Commit publication is an
atomic ``os.rename`` of the JSON file, so a reader never sees a
half-written commit.

Scale notes (100 TB): full-state COW per commit is the fixture-sized
simplification of Iceberg's file-granular COW — the public interface
(version read / merge / history / diff) is unchanged by swapping in
partition-granular rewrite (repartition by pk → rewrite only partitions
containing matched keys), which is the production path. MERGE itself is
pure distributed algebra: one shuffle of each side on the pk; the
anti-join's build side broadcasts when the change-set is small (AQE
decides), which is the common CDC case.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass
class Commit:
    version: int
    parent: int | None
    operation: str
    data_path: str
    n_rows: int
    schema_json: str
    committed_at: float
    # D4 parity: CREATE TABLE ... PARTITIONED BY ... TBLPROPERTIES(...)
    # (cdc_merger_optimized.py:191-203); carried forward commit-to-commit
    partition_by: list[str] | None = None
    properties: dict[str, str] | None = None


class ExpiredVersionError(LookupError):
    pass


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first (optimistic concurrency:
    the Iceberg commit-conflict model — caller re-reads and retries)."""


class LakeTable:
    """One versioned table rooted at ``root`` (a local or object-store path)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._commits_dir = os.path.join(root, "_commits")
        self._data_dir = os.path.join(root, "data")

    # ---------------------------------------------------------------- commits

    def _commit_files(self) -> list[str]:
        if not os.path.isdir(self._commits_dir):
            return []
        return sorted(
            (f for f in os.listdir(self._commits_dir) if f.endswith(".json")),
            key=lambda f: int(f.split(".")[0]),
        )

    def versions(self) -> list[int]:
        return [int(f.split(".")[0]) for f in self._commit_files()]

    def _read_commit(self, version: int) -> Commit:
        path = os.path.join(self._commits_dir, f"{version}.json")
        if not os.path.exists(path):
            raise ExpiredVersionError(f"version {version} not found at {self.root}")
        with open(path) as fh:
            return Commit(**json.load(fh))

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def exists(self) -> bool:
        return self.latest_version() is not None

    def _publish(
        self,
        df: DataFrame,
        operation: str,
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
    ) -> Commit:
        os.makedirs(self._commits_dir, exist_ok=True)
        os.makedirs(self._data_dir, exist_ok=True)
        parent = self.latest_version()
        version = 0 if parent is None else parent + 1
        # carry table config forward for incremental commits (D4 semantics);
        # CREATE OR REPLACE defines the config anew — inheriting there would
        # make partitioning impossible to ever unset
        if parent is not None and operation != "create_or_replace":
            prev = self._read_commit(parent)
            partition_by = partition_by or prev.partition_by
            properties = properties or prev.properties
        data_path = os.path.join(self._data_dir, f"{version}-{uuid.uuid4().hex[:8]}.parquet")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_path)
        n_rows = self._count_from_footers(data_path)
        commit = Commit(
            version=version,
            parent=parent,
            operation=operation,
            data_path=data_path,
            n_rows=n_rows,
            schema_json=df.schema.json(),
            committed_at=time.time(),
            partition_by=partition_by,
            properties=properties,
        )
        tmp = os.path.join(self._commits_dir, f".{version}-{uuid.uuid4().hex[:8]}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(commit.__dict__, fh)
        final = os.path.join(self._commits_dir, f"{version}.json")
        try:
            # atomic publish that REFUSES to clobber: link fails if a racing
            # writer already committed this version (os.rename would
            # silently overwrite — a lost update)
            os.link(tmp, final)
        except FileExistsError as exc:
            import shutil

            # the loser must not leak its fully-written data directory —
            # one orphaned table copy per lost race otherwise
            shutil.rmtree(data_path, ignore_errors=True)
            raise ConcurrentCommitError(
                f"version {version} was committed concurrently at {self.root}; "
                "re-read the table and retry"
            ) from exc
        finally:
            os.unlink(tmp)
        return commit

    @staticmethod
    def _count_from_footers(data_path: str) -> int:
        """Row count from parquet footer metadata — no Spark job, no second
        scan of the just-written table state (material on the CDC hot path
        where every micro-batch commits)."""
        import pyarrow.parquet as pq

        total = 0
        for dirpath, _dirs, files in os.walk(data_path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(dirpath, f)).metadata.num_rows
        return total

    # ---------------------------------------------------------------- reads

    def read(self, version: int | None = None, fallback_to_latest: bool = False) -> DataFrame:
        """Table state at ``version`` (default: latest). With
        ``fallback_to_latest`` an expired/unknown version degrades to the
        latest snapshot — the reference's expired-snapshot behavior
        (api_poc.py:462-468)."""
        latest = self.latest_version()
        if latest is None:
            raise ExpiredVersionError(f"no commits at {self.root}")
        if version is None:
            version = latest
        try:
            commit = self._read_commit(version)
        except ExpiredVersionError:
            if not fallback_to_latest:
                raise
            commit = self._read_commit(latest)
        return self._read_data(commit)

    def _read_data(self, commit: Commit) -> DataFrame:
        """Read a commit's data applying its STORED schema: without it,
        hive-partition column values are re-inferred from directory names
        (string '0123' → int 123, leading zeros lost) and partition columns
        migrate to the end of the row."""
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(commit.schema_json))
        return self.spark.read.schema(schema).parquet(commit.data_path)

    def history(self) -> DataFrame:
        """Commit history, newest first — the ``$snapshots`` metadata table
        (api_poc.py:426-428, 490-493)."""
        rows = [self._read_commit(v).__dict__ for v in self.versions()]
        return self.spark.createDataFrame(
            [
                (c["version"], c["parent"], c["operation"], c["n_rows"], c["committed_at"])
                for c in rows
            ],
            "version int, parent int, operation string, n_rows bigint, committed_at double",
        ).orderBy(F.desc("version"))

    # ---------------------------------------------------------------- writes

    def create_or_replace(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
    ) -> Commit:
        """K1 + D4: full-table materialization, optionally hive-partitioned
        with table properties recorded in the commit log."""
        return self._publish(
            df, "create_or_replace", partition_by=partition_by, properties=properties
        )

    def properties(self) -> dict[str, str]:
        latest = self.latest_version()
        if latest is None:
            return {}
        return self._read_commit(latest).properties or {}

    def read_as_of(self, ts: float) -> DataFrame:
        """P11: commit-time travel — the state as of wall-clock ``ts``
        (latest commit with committed_at <= ts), the Hudi
        ``_hoodie_commit_time <= '<ts>'`` idiom (lake_shell.py:268)."""
        eligible = [
            c for v in self.versions() if (c := self._read_commit(v)).committed_at <= ts
        ]
        if not eligible:
            raise ExpiredVersionError(f"no commit at or before {ts} in {self.root}")
        return self._read_data(eligible[-1])

    def append(self, df: DataFrame) -> Commit:
        cur = self.read() if self.exists() else None
        out = cur.unionByName(df, allowMissingColumns=True) if cur is not None else df
        return self._publish(out, "append")

    def merge(
        self,
        source: DataFrame,
        pk: str,
        op_col: str | None = None,
        precombine: str | None = None,
    ) -> Commit:
        """MERGE INTO target USING source ON target.pk = source.pk
        (cdc_merger_optimized.py:171-183):

            WHEN MATCHED AND source.op = 'd' THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED AND source.op != 'd' THEN INSERT *

        ``op_col`` names the CDC op column ('c'/'u'/'d'); absent ⇒ pure
        upsert. Any op other than 'd' (including NULL/unknown tokens)
        upserts — MERGE's WHEN MATCHED THEN UPDATE branch — so a malformed
        op can never silently delete a row. ``precombine`` dedups the
        source last-writer-wins per key first (Hudi precombine,
        ingest_csv_hudi.py:78,85) — W1 semantics.

        Schema evolution: source columns absent from the target are ADDED
        (existing rows take NULL), matching append's union-of-columns
        semantics; a first merge into a never-created table bootstraps it
        (CREATE TABLE IF NOT EXISTS parity, cdc_merger_optimized.py:191).
        """
        if precombine is not None:
            w = Window.partitionBy(pk).orderBy(F.desc(precombine))
            source = (
                source.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        if op_col is not None:
            # null-safe: op IS DISTINCT FROM 'd' upserts; only op == 'd' deletes
            upserts = source.filter(~F.col(op_col).eqNullSafe("d")).drop(op_col)
        else:
            upserts = source
        if not self.exists():  # bootstrap from a pure-insert change stream
            if precombine is not None:
                upserts = upserts.drop(precombine)
            return self._publish(upserts, "merge")
        target = self.read()
        # precombine is merge metadata, not data — drop unless the table
        # itself carries that column
        if precombine is not None and precombine not in target.columns:
            upserts = upserts.drop(precombine)
        # survivors of target: keys not touched by any change (update or delete)
        touched = source.select(pk)
        untouched = target.join(touched, pk, "left_anti")
        # unionByName with missing columns = schema evolution on both sides
        result = untouched.unionByName(upserts, allowMissingColumns=True)
        return self._publish(result, "merge")

    def delete_where(self, condition) -> Commit:
        """DELETE FROM t WHERE cond (delete_hudi.py:45-91 / api_poc.py:816-823).
        SQL semantics: only rows where the condition is TRUE are removed —
        a NULL predicate keeps the row (plain ``~cond`` would drop it)."""
        return self._publish(
            self.read().filter(~condition.eqNullSafe(True)), "delete"
        )

    def update_where(self, condition, assignments: dict[str, Any]) -> Commit:
        """UPDATE t SET c=v,... WHERE cond (api_poc.py:743-756; pk never
        updated by the facade)."""
        cur = self.read()
        unknown = set(assignments) - set(cur.columns)
        if unknown:
            raise ValueError(f"unknown columns: {sorted(unknown)}")
        out = cur.select(
            *[
                F.when(condition, F.lit(assignments[c]).cast(cur.schema[c].dataType))
                .otherwise(F.col(c))
                .alias(c)
                if c in assignments
                else F.col(c)
                for c in cur.columns
            ]
        )
        return self._publish(out, "update")

    def insert_rows(self, rows: list[dict[str, Any]]) -> Commit:
        """INSERT INTO t VALUES ... with typed casting against the table
        schema (api_poc.py:781-795 + get_cast_val :704-726)."""
        cur = self.read()
        unknown = {k for r in rows for k in r} - set(cur.columns)
        if unknown:
            raise ValueError(f"unknown columns: {sorted(unknown)}")
        new = self.spark.createDataFrame(
            [tuple(r.get(c) for c in cur.columns) for r in rows], cur.schema
        )
        return self._publish(cur.unionByName(new), "insert")

    # ---------------------------------------------------------- maintenance

    def compact(self, target_partitions: int | None = None, cluster_by: list[str] | None = None) -> Commit:
        """OPTIMIZE / rewrite_data_files analog: rewrite the current state
        into ``target_partitions`` files, optionally sorted within files by
        ``cluster_by`` so min/max stats enable data skipping on those
        columns (the poor man's Z-order; Iceberg tables in the reference
        claim 'partitioning & compaction', OZONE_ARCHITECTURE.md:76)."""
        df = self.read()
        n = target_partitions or max(1, self.spark.sparkContext.defaultParallelism // 4)
        df = df.repartition(n)
        if cluster_by:
            df = df.sortWithinPartitions(*cluster_by)
        return self._publish(df, "compact")

    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        """Metadata/data GC: drop all but the newest ``keep_last`` commits
        (Iceberg ``write.metadata.delete-after-commit`` +
        ``previous-versions-max``, cdc_merger_optimized.py:108,200).
        Returns the expired version numbers; subsequent reads of an expired
        version raise, or fall back to latest when requested — exactly the
        reference's expired-snapshot UX (api_poc.py:462-468)."""
        import shutil

        if keep_last < 1:
            # Iceberg-style expiry never removes the current snapshot;
            # keep_last=0 would delete the whole table
            raise ValueError("keep_last must be >= 1")
        versions = self.versions()
        expired = versions[:-keep_last]
        live = {self._read_commit(v).data_path for v in versions[len(expired):]}
        for v in expired:
            commit = self._read_commit(v)
            if commit.data_path not in live and os.path.isdir(commit.data_path):
                shutil.rmtree(commit.data_path)
            os.remove(os.path.join(self._commits_dir, f"{v}.json"))
        return expired

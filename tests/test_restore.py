"""RESTORE (Delta RESTORE / Iceberg rollback parity): O(metadata) rollback
as a NEW commit, history append-only, expiry keeping re-referenced
segments alive, and the facade surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_on_prem_system_spark.lakehouse import LakeTable
from datalake_on_prem_system_spark.lakehouse.table import ExpiredVersionError


def _mk(spark, root) -> LakeTable:
    t = LakeTable(spark, str(root))
    t.create_or_replace(
        spark.createDataFrame(
            [(i, f"v{i}", i * 10.0) for i in range(20)],
            "id bigint, s string, x double",
        )
    )
    return t


def _state(t: LakeTable, version=None):
    return sorted((r.id, r.s, r.x) for r in t.read(version=version).collect())


def test_restore_returns_pre_damage_state_without_rewrite(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v0_state = _state(t)
    v0_paths = {e["path"] for e in t.commit_at(0).files}
    t.update_where(F.col("id") % 2 == 0, {"x": -1.0})
    t.delete_where(F.col("id") % 3 == 0)
    commit = t.restore(0)
    assert commit.operation == "restore" and commit.version == 3
    assert _state(t) == v0_state
    # O(metadata): the restore commit re-references v0's segments verbatim
    assert {e["path"] for e in commit.files} == v0_paths


def test_restore_keeps_botched_interval_time_travelable(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.update_where(F.col("id") == 1, {"x": 999.0})
    t.restore(0)
    # the bad version is still a readable snapshot — restore appends, never
    # rewrites history
    assert (1, "v1", 999.0) in _state(t, version=1)
    assert (1, "v1", 10.0) in _state(t)
    ops = [r.operation for r in t.history().orderBy("version").collect()]
    assert ops == ["create_or_replace", "update", "restore"]


def test_restore_then_write_then_expire_keeps_restored_segments(spark, tmp_path):
    """After expiry drops the pre-restore commits, the restored state must
    survive: the restore commit's file list keeps v0's segments in the
    live set."""
    t = _mk(spark, tmp_path / "t")
    v0_state = _state(t)
    t.update_where(F.col("id") % 2 == 0, {"x": -1.0})
    t.restore(0)
    t.append(spark.createDataFrame([(100, "new", 1.0)], "id bigint, s string, x double"))
    expired = t.expire_snapshots(keep_last=2)
    assert expired == [0, 1]
    assert _state(t) == v0_state + [(100, "new", 1.0)]
    with pytest.raises(ExpiredVersionError):
        t.read(version=0)


def test_restore_expired_target_raises(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.update_where(F.col("id") == 1, {"x": 999.0})
    t.append(spark.createDataFrame([(100, "new", 1.0)], "id bigint, s string, x double"))
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ExpiredVersionError):
        t.restore(0)


def test_restore_current_version_is_noop_commit(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    before = _state(t)
    commit = t.restore(0)
    assert commit.version == 1 and _state(t) == before


def test_restore_preserves_layout_and_properties(spark, tmp_path):
    """A restore across a layout-destroying interval brings the layout
    back: v0 bucketed+bloomed, v1 compact_clustered (drops bucket spec),
    restore → bucket spec and properties are v0's again."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create_or_replace(
        spark.createDataFrame(
            [(i, f"v{i}", float(i)) for i in range(20)],
            "id bigint, s string, x double",
        ),
        bucket_by=("id", 4),
        properties={"bloom.columns": "s"},
    )
    t.compact_clustered("x", n_ranges=2)
    restored = t.restore(0)
    assert restored.bucket_spec == t.commit_at(0).bucket_spec
    assert restored.properties == {"bloom.columns": "s"}
    # bucket-pruned point reads work again against the restored layout
    assert [r.s for r in t.read_where(F.col("id") == 7).collect()] == ["v7"]


def test_restore_mor_table_with_pending_deltas(spark, tmp_path):
    """Restoring TO a version whose state includes unmerged MOR deltas
    must re-reference base + delta entries and resolve identically."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create_or_replace(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id bigint, x double"
        ),
        properties={"write.merge.mode": "mor"},
    )
    t.merge(spark.createDataFrame([(1, -1.0)], "id bigint, x double"), pk="id")
    t.merge(spark.createDataFrame([(2, -2.0)], "id bigint, x double"), pk="id")
    mor_version = t.latest_version()
    mor_state = sorted((r.id, r.x) for r in t.read().collect())
    assert any(e.get("delta") is not None for e in t.commit_at(mor_version).files)
    t.delete_where(F.col("id") < 100)  # wipe everything
    t.restore(mor_version)
    assert sorted((r.id, r.x) for r in t.read().collect()) == mor_state


def test_vacuum_orphans_removes_only_old_unreferenced_segments(spark, tmp_path):
    """A crashed writer's unpublished segment is removed once old enough;
    live segments and young orphans survive."""
    import os
    import time

    t = _mk(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(100, "new", 1.0)], "id bigint, s string, x double"))
    before = _state(t)
    data_dir = os.path.join(str(tmp_path / "t"), "data")
    old_orphan = os.path.join(data_dir, "9-deadbeef.parquet")
    young_orphan = os.path.join(data_dir, "9-cafebabe.parquet")
    for d in (old_orphan, young_orphan):
        os.makedirs(d)
        with open(os.path.join(d, "part-0.parquet"), "wb") as fh:
            fh.write(b"junk")
    past = time.time() - 7200

    def age(d):
        # the age test takes the NEWEST mtime in the tree (in-flight-writer
        # guard), so aging a segment means aging every node in it
        os.utime(os.path.join(d, "part-0.parquet"), (past, past))
        os.utime(d, (past, past))

    age(old_orphan)
    removed = t.vacuum_orphans(older_than_s=3600)
    assert removed == [old_orphan]
    assert not os.path.exists(old_orphan) and os.path.exists(young_orphan)
    assert _state(t) == before  # every referenced segment untouched
    # an old dir with one YOUNG inner file is an in-flight writer: kept
    os.utime(young_orphan, (past, past))
    assert t.vacuum_orphans(older_than_s=3600) == []
    # second pass once the whole tree ages out
    age(young_orphan)
    assert t.vacuum_orphans(older_than_s=3600) == [young_orphan]
    assert _state(t) == before


def test_engine_facade_restore(spark, tmp_path):
    from datalake_on_prem_system_spark.engine import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.write_table(
        "items",
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string"),
    )
    eng.update("items", "1", {"s": "oops"})
    eng.restore("items", 0)
    assert sorted((r.id, r.s) for r in eng.read("items").collect()) == [
        (1, "a"),
        (2, "b"),
    ]

"""Shallow clone (Delta CLONE parity): zero data copy, independent writes,
as-of cloning, and the expiry ownership guard that keeps a clone's GC from
deleting source segments it references but does not own."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from datalake_on_prem_system_spark.lakehouse import LakeTable


def _mk_source(spark, root) -> LakeTable:
    t = LakeTable(spark, str(root))
    df = spark.createDataFrame(
        [(i, f"v{i}", i * 10.0) for i in range(20)], "id bigint, s string, x double"
    )
    t.create_or_replace(df, bucket_by=("id", 4))
    t.merge(
        spark.createDataFrame([(1, "v1b", 99.0)], "id bigint, s string, x double"),
        pk="id",
    )
    return t


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    clone = src.clone_to(str(tmp_path / "clone"))
    # no data files were copied — the clone owns only metadata
    assert glob.glob(str(tmp_path / "clone" / "data" / "**" / "*.parquet"), recursive=True) == []
    a = {(r.id, r.s, r.x) for r in src.read().collect()}
    b = {(r.id, r.s, r.x) for r in clone.read().collect()}
    assert a == b and len(a) == 20


def test_clone_writes_are_independent(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    clone = src.clone_to(str(tmp_path / "clone"))
    clone.merge(
        spark.createDataFrame([(2, "CLONED", -1.0)], "id bigint, s string, x double"),
        pk="id",
    )
    assert {r.s for r in clone.read().filter(F.col("id") == 2).collect()} == {"CLONED"}
    # source unchanged
    assert {r.s for r in src.read().filter(F.col("id") == 2).collect()} == {"v2"}
    # the clone's new segment lives under the clone's root
    assert glob.glob(str(tmp_path / "clone" / "data" / "*")) != []


def test_clone_as_of_version(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")  # v0 create, v1 merge
    old = src.clone_to(str(tmp_path / "old_clone"), version=0)
    assert {r.s for r in old.read().filter(F.col("id") == 1).collect()} == {"v1"}
    assert {r.s for r in src.read().filter(F.col("id") == 1).collect()} == {"v1b"}


def test_engine_clone_facade(spark, tmp_path):
    from datalake_on_prem_system_spark.engine import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    eng.write_table("orig", df)
    eng.clone("orig", "fork")
    assert sorted(eng.list_tables()) == ["fork", "orig"]
    assert {(r.id, r.s) for r in eng.read("fork").collect()} == {(1, "a"), (2, "b")}
    # divergence: updating the fork leaves the original untouched
    eng.update("fork", "1", {"s": "FORKED"})
    assert {r.s for r in eng.read("fork").collect()} == {"FORKED", "b"}
    assert {r.s for r in eng.read("orig").collect()} == {"a", "b"}


def test_clone_expiry_never_deletes_source_segments(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    clone = src.clone_to(str(tmp_path / "clone"))
    # two clone-local rewrites so expiry drops the bootstrap commit that
    # references source segments
    for i in range(2):
        clone.merge(
            spark.createDataFrame([(i, f"c{i}", 0.0)], "id bigint, s string, x double"),
            pk="id",
        )
    expired = clone.expire_snapshots(keep_last=1)
    assert expired  # the bootstrap version was expired
    # the SOURCE still reads perfectly — its segments were foreign to the
    # clone's GC and must not have been touched
    assert src.read().count() == 20
    # and the clone still reads its own latest state
    assert clone.read().count() == 20


def test_clone_of_mor_table_with_pending_deltas(spark, tmp_path):
    """Regression (review-found, reproduced): a clone of a merge-on-read
    source with PENDING delta commits must order its own writes after the
    carried source deltas. The bootstrap commit now continues the source's
    version counter, so clone deltas always get higher MOR seq values than
    carried ones — a bootstrap at version 0 served BOTH the stale source
    row and the clone's new row for the same key."""
    src = LakeTable(spark, str(tmp_path / "src"))
    src.create_or_replace(
        spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id bigint, s string"),
        bucket_by=("id", 4),
        properties={"write.merge.mode": "mor"},
    )
    # pending MOR deltas (below the compact threshold)
    src.merge(spark.createDataFrame([(3, "src_d1")], "id bigint, s string"), pk="id")
    src.merge(spark.createDataFrame([(5, "src_d2")], "id bigint, s string"), pk="id")

    clone = src.clone_to(str(tmp_path / "clone"))
    clone.merge(
        spark.createDataFrame([(3, "CLONE_NEW")], "id bigint, s string"), pk="id"
    )
    got = {r.id: r.s for r in clone.read().collect()}
    rows = clone.read().filter(F.col("id") == 3).collect()
    assert len(rows) == 1, rows  # no duplicate: clone delta wins outright
    assert got[3] == "CLONE_NEW" and got[5] == "src_d2"
    # inserts of fresh keys must not be swallowed by carried deltas either
    clone.insert_rows([{"id": 100, "s": "ins"}])
    assert {r.s for r in clone.read().filter(F.col("id") == 100).collect()} == {"ins"}
    # source state untouched throughout
    assert {r.s for r in src.read().filter(F.col("id") == 3).collect()} == {"src_d1"}


def test_clone_rejects_nested_dest_root(spark, tmp_path):
    """A clone root inside the source root (or containing it) would make
    the clone's expiry ownership test claim source segments — both
    directions must be rejected up front, in any path spelling."""
    import pytest

    src = _mk_source(spark, tmp_path / "src")
    with pytest.raises(ValueError, match="nested"):
        src.clone_to(str(tmp_path / "src" / "inner_clone"))
    with pytest.raises(ValueError, match="nested"):
        src.clone_to(str(tmp_path))  # contains the source root
    with pytest.raises(ValueError, match="nested"):
        # same root under a different spelling (trailing sep + dot segment)
        src.clone_to(str(tmp_path / "src") + os.sep + "." + os.sep)


def test_expiry_gc_works_through_symlinked_root(spark, tmp_path):
    """Opening a table through a symlink (or trailing-sep) spelling of its
    root must not silently skip GC of owned segments: the ownership test
    compares realpaths, not raw string prefixes."""
    real_root = tmp_path / "real_tbl"
    t = LakeTable(spark, str(real_root))
    t.create_or_replace(
        spark.createDataFrame([(i, f"v{i}") for i in range(8)], "id bigint, s string")
    )
    link = tmp_path / "alias_tbl"
    os.symlink(str(real_root), str(link))
    alias = LakeTable(spark, str(link) + os.sep)  # symlink + trailing sep
    # two full rewrites via the alias spelling → v0/v1 segments become dead
    for i in range(2):
        alias.create_or_replace(
            spark.createDataFrame([(i, "rw")], "id bigint, s string")
        )
    n_before = len(
        glob.glob(str(real_root / "data" / "**" / "*.parquet"), recursive=True)
    )
    expired = alias.expire_snapshots(keep_last=1)
    assert expired  # something actually expired
    n_after = len(
        glob.glob(str(real_root / "data" / "**" / "*.parquet"), recursive=True)
    )
    assert n_after < n_before, "symlink-spelling expiry leaked dead segments"
    # the surviving version still reads correctly through both spellings
    assert alias.read().count() == 1 and t.read().count() == 1

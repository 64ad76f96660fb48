"""Tags (Iceberg named-ref parity): read-by-tag resolution, retagging,
GC-root retention through expire_snapshots, and the facade surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_on_prem_system_spark.lakehouse import LakeTable
from datalake_on_prem_system_spark.lakehouse.table import ExpiredVersionError


def _mk(spark, root) -> LakeTable:
    t = LakeTable(spark, str(root))
    t.create_or_replace(
        spark.createDataFrame([(i, i * 10.0) for i in range(5)], "id bigint, x double")
    )
    t.update_where(F.col("id") == 1, {"x": 111.0})
    t.append(spark.createDataFrame([(9, 90.0)], "id bigint, x double"))
    return t


def test_tag_resolves_and_reads(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    assert t.tag("baseline", 0) == 0
    assert t.tag("head") == 2  # default: latest
    assert t.tags() == {"baseline": 0, "head": 2}
    base = {r.id: r.x for r in t.read(version="baseline").collect()}
    assert base[1] == 10.0 and 9 not in base
    head = {r.id: r.x for r in t.read(version="head").collect()}
    assert head[1] == 111.0 and head[9] == 90.0
    # read_where resolves tags through the same path
    assert t.read_where(F.col("id") == 1, version="baseline").collect()[0].x == 10.0


def test_retag_moves_and_digit_strings_are_versions(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.tag("rel", 0)
    t.tag("rel", 1)  # retag
    assert t.tags() == {"rel": 1}
    assert {r.id: r.x for r in t.read(version="1").collect()}[1] == 111.0


def test_invalid_and_unknown_tags(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    with pytest.raises(ValueError):
        t.tag("0release")  # must start with a letter
    with pytest.raises(ValueError):
        t.tag("has space")
    with pytest.raises(ExpiredVersionError):
        t.tag("ok", 99)  # target must exist
    with pytest.raises(ExpiredVersionError):
        t.read(version="nosuch")
    # unknown tag degrades to latest under the fallback flag
    assert t.read(version="nosuch", fallback_to_latest=True).count() == 6
    assert t.delete_tag("nosuch") is False
    with pytest.raises(ValueError):
        t.delete_tag("../_commits/2")  # traversal must never reach os.remove
    with pytest.raises(ExpiredVersionError):
        t.read(version="²")  # unicode digit: isdecimal guard, not a crash


def test_tagged_version_survives_expiry_until_untagged(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.tag("pinned", 0)
    expired = t.expire_snapshots(keep_last=1)
    assert expired == [1]  # v0 is a GC root, v2 is the retained tail
    assert {r.id: r.x for r in t.read(version="pinned").collect()}[1] == 10.0
    with pytest.raises(ExpiredVersionError):
        t.read(version=1)
    # untag → the version becomes expirable and its data is GC'd
    assert t.delete_tag("pinned") is True
    assert t.expire_snapshots(keep_last=1) == [0]
    with pytest.raises(ExpiredVersionError):
        t.read(version=0)
    assert t.read().count() == 6  # latest untouched


def test_engine_facade_tag_and_travel(spark, tmp_path):
    from datalake_on_prem_system_spark.engine import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.write_table(
        "items", spark.createDataFrame([(1, "a")], "id bigint, s string")
    )
    eng.update("items", "1", {"s": "b"})
    assert eng.tag("items", "v_first", version=0) == 0
    assert eng.time_travel("items", "v_first").collect()[0].s == "a"
    assert eng.time_travel("items", "1").collect()[0].s == "b"  # digit string

"""Composite primary keys (round-7): merge/delete/point-read keyed on a
2-column key, with bucket layout + pruning on the LEADING column. A real
CDC user hits (entity_id, sub_id)-shaped keys quickly — rows sharing the
leading key must be individually addressable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_on_prem_system_spark.lakehouse import LakeTable

_PK = ["k1", "k2"]


def _seed(spark, root, **kwargs) -> LakeTable:
    t = LakeTable(spark, str(root))
    t.create_or_replace(
        spark.createDataFrame(
            [(1, "a", 10.0), (1, "b", 11.0), (2, "a", 20.0), (3, "a", 30.0)],
            "k1 bigint, k2 string, v double",
        ),
        bucket_by=(("k1", "k2"), 4),
        **kwargs,
    )
    return t


def _state(t: LakeTable) -> dict:
    return {(r.k1, r.k2): r.v for r in t.read().collect()}


def test_cow_merge_update_and_delete_by_full_key(spark, tmp_path):
    t = _seed(spark, tmp_path / "cow")
    t.merge(
        spark.createDataFrame([(1, "a", 99.0, "u"), (1, "c", 12.0, "c")],
                              "k1 bigint, k2 string, v double, op string"),
        pk=_PK, op_col="op",
    )
    assert _state(t) == {(1, "a"): 99.0, (1, "b"): 11.0, (1, "c"): 12.0,
                         (2, "a"): 20.0, (3, "a"): 30.0}
    # delete targets EXACTLY (1,'a'); the sibling (1,'b') with the same
    # leading key must survive
    t.merge(
        spark.createDataFrame([(1, "a", 0.0, "d")],
                              "k1 bigint, k2 string, v double, op string"),
        pk=_PK, op_col="op",
    )
    assert _state(t) == {(1, "b"): 11.0, (1, "c"): 12.0, (2, "a"): 20.0,
                         (3, "a"): 30.0}


def test_mor_deltas_resolve_on_full_key(spark, tmp_path):
    t = _seed(spark, tmp_path / "mor",
              properties={"write.merge.mode": "mor"})
    assert t.mor_ready(_PK)
    assert not t.mor_ready("k1")  # different key list ⇒ not the MOR layout
    assert not t.mor_ready(["k2", "k1"])  # order matters (leading key owns layout)
    for i in range(3):  # three delta commits against the SAME composite key
        t.merge(
            spark.createDataFrame([(1, "a", 100.0 + i)],
                                  "k1 bigint, k2 string, v double"),
            pk=_PK,
        )
    hist_ops = [r.operation for r in t.history().collect()]
    assert hist_ops.count("merge") == 3  # all went through (delta commits)
    assert _state(t) == {(1, "a"): 102.0, (1, "b"): 11.0, (2, "a"): 20.0,
                         (3, "a"): 30.0}
    # MOR delete of one sub-key leaves the leading-key sibling alone
    t.merge(
        spark.createDataFrame([(1, "b", 0.0, "d")],
                              "k1 bigint, k2 string, v double, op string"),
        pk=_PK, op_col="op",
    )
    assert _state(t) == {(1, "a"): 102.0, (2, "a"): 20.0, (3, "a"): 30.0}


def test_precombine_dedups_on_full_key(spark, tmp_path):
    t = _seed(spark, tmp_path / "pc")
    t.merge(
        spark.createDataFrame(
            [(1, "a", 50.0, 1), (1, "a", 60.0, 2), (1, "b", 70.0, 1)],
            "k1 bigint, k2 string, v double, seq int",
        ),
        pk=_PK, precombine="seq",
    )
    st = _state(t)
    assert st[(1, "a")] == 60.0 and st[(1, "b")] == 70.0


def test_point_read_prunes_on_leading_key(spark, tmp_path):
    t = _seed(spark, tmp_path / "pr")
    t.merge(  # establish more data across buckets
        spark.createDataFrame([(k, "z", float(k)) for k in range(4, 40)],
                              "k1 bigint, k2 string, v double"),
        pk=_PK,
    )
    got = {(r.k1, r.k2) for r in t.read_where(F.col("k1") == 1).collect()}
    assert got == {(1, "a"), (1, "b")}
    # pruning really happened: the leading-key literal resolves to a strict
    # subset of the bucket ids
    commit = t.commit_at()
    touched = t._buckets_for_literals([1], commit.bucket_spec["pk"],
                                      commit.bucket_spec["n"], commit)
    all_buckets = {e["bucket"] for e in commit.files if e["bucket"] is not None}
    assert touched is not None and set(touched) < all_buckets


def test_pk_validation(spark, tmp_path):
    t = _seed(spark, tmp_path / "val")
    src = spark.createDataFrame([(1, "a", 1.0)], "k1 bigint, k2 string, v double")
    with pytest.raises(ValueError, match="at least one"):
        t.merge(src, pk=[])
    with pytest.raises(ValueError, match="duplicate"):
        t.merge(src, pk=["k1", "k1"])


def test_null_key_component_rows_are_inert(spark, tmp_path):
    """SQL equality matches nothing on a NULL key component: base rows with
    a NULL k2 survive merges, a NULL-component delete removes nothing, and
    NULL-component upserts insert (COW/MOR parity)."""
    for mode, props in (("cow", None), ("mor", {"write.merge.mode": "mor"})):
        t = LakeTable(spark, str(tmp_path / f"nk_{mode}"))
        t.create_or_replace(
            spark.createDataFrame([(1, None, 1.0), (1, "a", 2.0)],
                                  "k1 bigint, k2 string, v double"),
            bucket_by=(("k1", "k2"), 4),
            properties=props,
        )
        t.merge(
            spark.createDataFrame([(1, None, 9.0, "d")],
                                  "k1 bigint, k2 string, v double, op string"),
            pk=_PK, op_col="op",
        )
        rows = sorted(
            ((r.k1, r.k2, r.v) for r in t.read().collect()),
            key=lambda x: (x[0], x[1] or ""),
        )
        assert rows == [(1, None, 1.0), (1, "a", 2.0)], (mode, rows)


def test_changes_feed_replay_on_composite_key(spark, tmp_path):
    """The CDF replay invariant holds for composite keys: folding the feed
    (keyed on the full column list) over the starting snapshot rebuilds
    the ending snapshot exactly."""
    import json

    from datalake_on_prem_system_spark.lakehouse.diff import changes_feed

    t = _seed(spark, tmp_path / "feed")
    t.merge(
        spark.createDataFrame(
            [(1, "a", 99.0, "u"), (1, "b", 0.0, "d"), (4, "x", 40.0, "c")],
            "k1 bigint, k2 string, v double, op string",
        ),
        pk=_PK, op_col="op",
    )
    t.merge(
        spark.createDataFrame([(2, "a", 21.0)], "k1 bigint, k2 string, v double"),
        pk=_PK,
    )

    def snap(version):
        df = t.read(version=version)
        rows = (
            df.groupBy(*_PK)
            .agg(F.to_json(F.sort_array(F.collect_list(F.struct(*df.columns)))).alias("j"))
            .collect()
        )
        return {(r.k1, r.k2): json.loads(r.j) for r in rows}

    state = snap(0)
    for rec in sorted(
        changes_feed(t, 0, t.latest_version(), pk=_PK).collect(),
        key=lambda r: r._commit_version,
    ):
        key = (rec.k1, rec.k2)
        if rec._change_type == "delete":
            state.pop(key, None)
        else:
            state[key] = json.loads(rec.row_json)
    assert state == snap(t.latest_version())

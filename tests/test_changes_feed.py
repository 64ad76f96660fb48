"""Change-data-feed replay property: folding the feed's records over the
starting snapshot must reconstruct the ending snapshot EXACTLY — for random
programs of merge/update/delete/insert commits. This is the contract that
makes the feed consumable by an incremental downstream (a sink applying
upserts/deletes) without ever reading the table itself."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from datalake_on_prem_system_spark.lakehouse import LakeTable
from datalake_on_prem_system_spark.lakehouse.diff import changes_feed


def _snapshot_json(table: LakeTable, version: int, pk: str) -> dict:
    """pk → that key's row SET as the feed renders it (sorted JSON array —
    duplicate-pk appends are legal, so a key maps to a list of rows)."""
    df = table.read(version=version)
    rows = (
        df.groupBy(pk)
        .agg(F.to_json(F.sort_array(F.collect_list(F.struct(*df.columns)))).alias("j"))
        .collect()
    )
    return {r[pk]: json.loads(r.j) for r in rows}


def _apply_program(spark, table: LakeTable, rng: random.Random) -> None:
    """3-5 random commits over a small keyed table."""
    for _ in range(rng.randint(3, 5)):
        op = rng.choice(["merge", "merge_del", "update", "delete", "insert"])
        ks = rng.sample(range(30), rng.randint(1, 5))
        if op == "merge":
            table.merge(
                spark.createDataFrame(
                    [(k, f"m{rng.randint(0, 9)}", rng.randint(0, 99)) for k in ks],
                    "id bigint, s string, x bigint",
                ),
                pk="id",
            )
        elif op == "merge_del":
            table.merge(
                spark.createDataFrame(
                    [(k, "gone", 0, "d") for k in ks],
                    "id bigint, s string, x bigint, op string",
                ),
                pk="id",
                op_col="op",
            )
        elif op == "update":
            table.update_where(F.col("id").isin(ks), {"s": f"u{rng.randint(0, 9)}"})
        elif op == "delete":
            table.delete_where(F.col("id").isin(ks))
        else:
            table.insert_rows(
                [{"id": 1000 + rng.randint(0, 50), "s": "ins", "x": 1}]
            )


def test_feed_replay_reconstructs_final_state(spark, tmp_path):
    rng = random.Random(7)
    for trial in range(3):
        table = LakeTable(spark, str(tmp_path / f"t{trial}"))
        base = spark.createDataFrame(
            [(i, f"v{i}", i) for i in range(0, 30, 2)], "id bigint, s string, x bigint"
        )
        table.create_or_replace(base, bucket_by=("id", 4))
        _apply_program(spark, table, rng)

        v_from, v_to = 0, table.latest_version()
        state = _snapshot_json(table, v_from, "id")
        feed = changes_feed(table, v_from, v_to, pk="id").collect()
        # apply in commit order (order within a commit is irrelevant — one
        # record per key per step)
        for rec in sorted(feed, key=lambda r: r._commit_version):
            if rec._change_type == "delete":
                state.pop(rec.id, None)
            else:
                state[rec.id] = json.loads(rec.row_json)
        want = _snapshot_json(table, v_to, "id")
        assert state == want, (
            f"trial {trial}: replayed state diverges; "
            f"extra={set(state) - set(want)}, missing={set(want) - set(state)}"
        )


def test_compact_contributes_no_change_records(spark, tmp_path):
    """OPTIMIZE rewrites bytes, not content: a compact commit must appear
    in the feed as ZERO records — an incremental consumer sees no phantom
    updates from maintenance."""
    table = LakeTable(spark, str(tmp_path / "c"))
    table.create_or_replace(
        spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id bigint, s string"),
        bucket_by=("id", 4),
    )
    table.merge(spark.createDataFrame([(3, "v3b")], "id bigint, s string"), pk="id")
    compact_v = table.compact().version
    feed = changes_feed(table, 0, compact_v, pk="id").collect()
    assert all(r._commit_version != compact_v for r in feed), feed
    assert {(r.id, r._change_type) for r in feed} == {(3, "update")}


def test_compact_silent_on_duplicate_pk_table(spark, tmp_path):
    """The zero-records-from-compaction contract must hold for tables that
    HOLD duplicate-pk rows: the diff compares per-key row SETS, so a key
    with two identical-content rows on both sides joins 1:1 instead of
    cross-producting into phantom MODIFIED records on the compact step."""
    table = LakeTable(spark, str(tmp_path / "cd"))
    table.create_or_replace(
        spark.createDataFrame([(1, "a"), (2, "x")], "id bigint, s string"),
        bucket_by=("id", 4),
    )
    table.insert_rows([{"id": 1, "s": "b"}, {"id": 1, "s": "c"}])  # id=1 → 3 rows
    compact_v = table.compact().version
    feed = changes_feed(table, 0, compact_v, pk="id").collect()
    assert all(r._commit_version != compact_v for r in feed), (
        f"compaction produced phantom records: {feed}"
    )
    # the only real change is id=1 growing from 1 to 3 rows — ONE record
    recs = [r for r in feed if r._commit_version == 1]
    assert {(r.id, r._change_type) for r in recs} == {(1, "update")}
    assert len(recs) == 1  # per-key set diff: no cross-product fanout
    # unrelated row pairs must not fabricate cell diffs on multi-row keys
    assert recs[0].changed_cells == {}


def test_snapshot_diff_multirow_key_set_semantics(spark, tmp_path):
    """snapshot_diff emits one row per changed KEY and stays silent for a
    key whose row multiset is unchanged, even when that key holds several
    rows (duplicate-pk appends are legal)."""
    from datalake_on_prem_system_spark.lakehouse.diff import snapshot_diff

    table = LakeTable(spark, str(tmp_path / "sd"))
    table.create_or_replace(
        spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "x"), (3, "q")], "id bigint, s string"
        )
    )
    # v1: id=1 keeps the same two rows (rewritten), id=2 gains a row,
    # id=3 loses its row, id=4 appears
    table.create_or_replace(
        spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "x"), (2, "y"), (4, "n")],
            "id bigint, s string",
        )
    )
    d = {r.id: r for r in snapshot_diff(table, 0, 1, pk="id").collect()}
    assert set(d) == {2, 3, 4}, d  # id=1 unchanged as a SET → no record
    assert d[2].status == "MODIFIED" and d[2].changed_cells == {}
    assert d[3].status == "DELETED"
    assert d[4].status == "NEW"


def test_feed_replays_over_expired_intermediate_versions(spark, tmp_path):
    """Expiring intermediate snapshots collapses feed steps into the
    surviving neighbors; the replay invariant must still hold end-to-end."""
    table = LakeTable(spark, str(tmp_path / "e"))
    table.create_or_replace(
        spark.createDataFrame([(i, f"v{i}") for i in range(12)], "id bigint, s string"),
        bucket_by=("id", 4),
    )
    table.merge(spark.createDataFrame([(1, "m1")], "id bigint, s string"), pk="id")
    table.delete_where(F.col("id") == 2)
    table.merge(spark.createDataFrame([(99, "new")], "id bigint, s string"), pk="id")
    # keep v0 and the last two commits; v1 (the first merge) expires
    table.expire_snapshots(keep_last=2)
    retained = table.versions()
    assert 0 not in retained or len(retained) == 2  # v0 gone with keep_last=2

    v_from, v_to = retained[0], retained[-1]
    state = _snapshot_json(table, v_from, "id")
    for rec in sorted(
        changes_feed(table, v_from, v_to, pk="id").collect(),
        key=lambda r: r._commit_version,
    ):
        if rec._change_type == "delete":
            state.pop(rec.id, None)
        else:
            state[rec.id] = json.loads(rec.row_json)
    assert state == _snapshot_json(table, v_to, "id")


def test_feed_with_duplicate_pk_appends(spark, tmp_path):
    """Duplicate-key appends are legal table states ('duplicate-key appends
    must all survive' — table.py _resolve); the feed renders such a key's
    post-image as the full row SET, identically on every record for that
    key, so replay converges instead of keeping an arbitrary row."""
    table = LakeTable(spark, str(tmp_path / "d"))
    table.create_or_replace(
        spark.createDataFrame([(1, "a"), (2, "x")], "id bigint, s string")
    )
    table.insert_rows([{"id": 1, "s": "b"}])  # id=1 now has TWO rows
    feed = changes_feed(table, 0, 1, pk="id").collect()
    recs = [r for r in feed if r.id == 1]
    assert recs and len({r.row_json for r in recs}) == 1  # one consistent image
    assert sorted(row["s"] for row in json.loads(recs[0].row_json)) == ["a", "b"]
    # replay over v0 reconstructs the 2-row final state
    state = _snapshot_json(table, 0, "id")
    for rec in feed:
        if rec._change_type == "delete":
            state.pop(rec.id, None)
        else:
            state[rec.id] = json.loads(rec.row_json)
    assert state == _snapshot_json(table, 1, "id")


def test_feed_rejects_non_retained_endpoints(spark, tmp_path):
    """A truncated feed replays to wrong state with no error — non-retained
    endpoints must raise instead."""
    import pytest

    from datalake_on_prem_system_spark.lakehouse.table import ExpiredVersionError

    table = LakeTable(spark, str(tmp_path / "r"))
    table.create_or_replace(
        spark.createDataFrame([(1, "a")], "id bigint, s string")
    )
    for i in range(3):
        table.merge(
            spark.createDataFrame([(1, f"m{i}")], "id bigint, s string"), pk="id"
        )
    table.expire_snapshots(keep_last=2)
    with pytest.raises(ExpiredVersionError):
        changes_feed(table, 0, table.latest_version(), pk="id")
    with pytest.raises(ExpiredVersionError):
        changes_feed(table, table.versions()[0], 999, pk="id")

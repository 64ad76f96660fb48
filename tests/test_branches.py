"""Branches (Iceberg branch-ref parity): isolation of branch commits from
main, fast-forward merge, conflict detection, GC safety of the shared
data/ dir across chains, and branch lifecycle (list/delete/vacuum)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_on_prem_system_spark.lakehouse import LakeTable
from datalake_on_prem_system_spark.lakehouse.table import (
    BranchConflictError,
    ExpiredVersionError,
)


def _mk(spark, root) -> LakeTable:
    t = LakeTable(spark, str(root))
    t.create_or_replace(
        spark.createDataFrame([(i, i * 10.0) for i in range(5)], "id bigint, x double")
    )
    return t


def _rows(df) -> dict:
    return {r.id: r.x for r in df.collect()}


def test_branch_isolates_main_and_merges_fast_forward(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    br = t.create_branch("etl")
    assert t.branches() == {"etl": 0}
    assert t.fork_version("etl") == 0

    br.append(spark.createDataFrame([(9, 90.0)], "id bigint, x double"))
    br.update_where(F.col("id") == 1, {"x": 111.0})
    br.delete_where(F.col("id") == 3)
    # three branch commits; main untouched
    assert t.latest_version() == 0
    assert _rows(t.read()) == {i: i * 10.0 for i in range(5)}
    assert t.branches() == {"etl": 3}

    merged = t.merge_branch("etl")
    assert merged.operation == "merge_branch:etl@3"
    # merge version continues past the branch head so carried MOR seq
    # values stay below future commit stamps
    assert merged.version == 4 and merged.parent == 0
    want = {0: 0.0, 1: 111.0, 2: 20.0, 4: 40.0, 9: 90.0}
    assert _rows(t.read()) == want
    # pre-merge main stays time-travelable
    assert _rows(t.read(version=0)) == {i: i * 10.0 for i in range(5)}
    # main keeps writing past the merge with correct MOR ordering
    t.update_where(F.col("id") == 9, {"x": 99.0})
    assert _rows(t.read())[9] == 99.0


def test_merge_conflict_when_main_advances(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    br = t.create_branch("etl")
    br.append(spark.createDataFrame([(9, 90.0)], "id bigint, x double"))
    t.append(spark.createDataFrame([(7, 70.0)], "id bigint, x double"))
    with pytest.raises(BranchConflictError):
        t.merge_branch("etl")
    # main is intact after the refused merge
    assert _rows(t.read())[7] == 70.0 and 9 not in _rows(t.read())


def test_branch_lifecycle_and_guards(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.create_branch("dev")
    with pytest.raises(ValueError):
        t.create_branch("dev")  # duplicate
    with pytest.raises(ValueError):
        t.create_branch("0dev")  # must start with a letter
    with pytest.raises(ValueError):
        t.delete_branch("../_commits")  # traversal must never reach rmtree
    with pytest.raises(ExpiredVersionError):
        t.branch_table("nosuch")
    assert t.delete_branch("dev") is True
    assert t.delete_branch("dev") is False
    assert t.branches() == {}


def test_gc_never_collects_segments_other_chains_reference(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    br = t.create_branch("etl")
    br.append(spark.createDataFrame([(9, 90.0)], "id bigint, x double"))

    # main churns past retention: branch fork data must survive main expiry
    for i in range(3):
        t.append(spark.createDataFrame([(100 + i, 1.0)], "id bigint, x double"))
    t.expire_snapshots(keep_last=1)
    assert _rows(br.read())[9] == 90.0 and _rows(br.read())[0] == 0.0

    # main vacuum must not treat branch-only segments as orphans even
    # with a zero age guard
    removed = t.vacuum_orphans(older_than_s=-1.0)
    assert removed == []
    assert _rows(br.read())[9] == 90.0

    # deleting the branch orphans its exclusive segment; vacuum then
    # collects it without touching main's live data
    t.delete_branch("etl")
    removed = t.vacuum_orphans(older_than_s=-1.0)
    assert len(removed) >= 1
    assert 100 in _rows(t.read())


def test_branch_expiry_keeps_main_segments(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    br = t.create_branch("etl")
    for i in range(3):
        br.append(spark.createDataFrame([(200 + i, 2.0)], "id bigint, x double"))
    br.expire_snapshots(keep_last=1)
    # the branch bootstrap (which referenced main's base segment) expired,
    # but main's chain still owns that segment — it must survive
    assert _rows(t.read()) == {i: i * 10.0 for i in range(5)}
    assert 202 in _rows(br.read())


def test_engine_and_cli_branch_surface(spark, tmp_path, capsys):
    from datalake_on_prem_system_spark.cli import main
    from datalake_on_prem_system_spark.engine import LakeEngine

    wh = str(tmp_path / "wh")
    eng = LakeEngine(spark, wh)
    csv = tmp_path / "in.csv"
    csv.write_text("id,name\n1,one\n2,two\n")
    eng.ingest("items", str(csv), mode="direct")

    assert eng.create_branch("items", "dev") == 0
    # branch writes go through the table API; the facade reads them
    eng.catalog.table("items").branch_table("dev").insert_rows(
        [{"id": 3, "name": "three"}]
    )
    assert {r.id for r in eng.read_branch("items", "dev").collect()} == {1, 2, 3}
    assert {r.id for r in eng.read("items").collect()} == {1, 2}
    assert eng.merge_branch("items", "dev") >= 1
    assert {r.id for r in eng.read("items").collect()} == {1, 2, 3}

    assert main(["--warehouse", wh, "branch", "items", "create", "cli-b"]) == 0
    assert "branched items" in capsys.readouterr().out
    assert main(["--warehouse", wh, "branch", "items", "list"]) == 0
    out = capsys.readouterr().out
    assert "dev" in out and "cli-b" in out
    assert main(["--warehouse", wh, "branch", "items", "read", "cli-b"]) == 0
    assert "three" in capsys.readouterr().out
    assert main(["--warehouse", wh, "branch", "items", "merge", "cli-b"]) == 0
    assert "merged cli-b" in capsys.readouterr().out
    assert main(["--warehouse", wh, "branch", "items", "delete", "cli-b"]) == 0
    assert "deleted branch cli-b" in capsys.readouterr().out


def test_branch_of_branch_and_gap_versions(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    br = t.create_branch("a")
    br.append(spark.createDataFrame([(9, 90.0)], "id bigint, x double"))
    # fork a second branch from the first chain's head
    br2 = br.create_branch("b")
    br2.update_where(F.col("id") == 9, {"x": 91.0})
    assert _rows(br2.read())[9] == 91.0
    assert _rows(br.read())[9] == 90.0  # parent branch isolated
    # ff-merge b back into a (a has not advanced past b's fork)
    br.merge_branch("b")
    assert _rows(br.read())[9] == 91.0
    assert os.path.isdir(os.path.join(str(tmp_path / "t"), "_branches", "b"))


def test_merge_rejects_branch_forked_from_another_chain(spark, tmp_path):
    """A branch forked from chain 'a' must not fast-forward into main just
    because the version NUMBERS line up — main's own commits never flowed
    into it and would silently vanish (review-pass repro)."""
    t = _mk(spark, tmp_path / "t")
    a = t.create_branch("a")
    a.append(spark.createDataFrame([(9, 90.0)], "id bigint, x double"))
    b = a.create_branch("b")  # forked FROM CHAIN a at version 1
    b.update_where(F.col("id") == 9, {"x": 91.0})
    t.append(spark.createDataFrame([(7, 70.0)], "id bigint, x double"))  # main at v1
    with pytest.raises(BranchConflictError, match="forked from"):
        t.merge_branch("b")
    assert _rows(t.read())[7] == 70.0  # main intact
    a.merge_branch("b")  # the chain it WAS forked from accepts it
    assert _rows(a.read())[9] == 91.0


def test_merge_withdraws_when_a_commit_races_the_publish(spark, tmp_path, monkeypatch):
    """A commit landing between merge_branch's precondition check and its
    publish lands at a different version filename, so the rename collision
    can't fire — the merge must detect the interloper afterwards, withdraw
    its commit, and raise instead of silently dropping the racer's rows."""
    from datalake_on_prem_system_spark.lakehouse.table import (
        ConcurrentCommitError,
        LakeTable as LT,
    )

    t = _mk(spark, tmp_path / "t")
    br = t.create_branch("etl")
    br.append(spark.createDataFrame([(9, 90.0)], "id bigint, x double"))
    br.append(spark.createDataFrame([(8, 80.0)], "id bigint, x double"))  # head=2

    real_publish = LT._publish_commit
    raced = {"done": False}

    def racing_publish(self, commit, new_paths):
        if not raced["done"] and commit.operation.startswith("merge_branch"):
            raced["done"] = True
            racer = LakeTable(spark, str(tmp_path / "t"))
            racer.append(spark.createDataFrame([(7, 70.0)], "id bigint, x double"))
        return real_publish(self, commit, new_paths)

    monkeypatch.setattr(LT, "_publish_commit", racing_publish)
    with pytest.raises(ConcurrentCommitError):
        t.merge_branch("etl")
    monkeypatch.undo()
    # the racer's commit survives and the merge commit is gone
    assert _rows(t.read())[7] == 70.0 and 9 not in _rows(t.read())
    assert not any(
        t._read_commit(v).operation.startswith("merge_branch") for v in t.versions()
    )


def test_write_audit_publish_via_branch_cdc(spark, tmp_path):
    """The WAP (write-audit-publish) workflow: a CDC stream applies its
    merges to a STAGING BRANCH, an audit query validates the branch, and
    only then does a fast-forward merge publish to main — main never sees
    unaudited data."""
    import json as _json
    import os

    from datalake_on_prem_system_spark.streaming.cdc import run_cdc_file_stream

    t = _mk(spark, tmp_path / "t")  # ids 0..4, x = id*10.0
    staging = t.create_branch("staging")

    src = str(tmp_path / "cdc")
    os.makedirs(src)
    with open(os.path.join(src, "b.jsonl"), "w") as fh:
        for rec in (
            {"op": "u", "after": {"id": 1, "x": 111.0, "ts_ms": 1}},
            {"op": "c", "after": {"id": 9, "x": 90.0, "ts_ms": 2}},
            {"op": "d", "before": {"id": 3, "x": 30.0, "ts_ms": 3}, "after": None},
        ):
            fh.write(_json.dumps(rec) + "\n")

    run_cdc_file_stream(
        spark,
        staging,
        pk="id",
        row_ddl="id bigint, x double, ts_ms bigint",
        src_dir=src,
        checkpoint_dir=str(tmp_path / "ck"),
        order_cols=["ts_ms"],
        drop_cols=["ts_ms"],
    )
    # audit on the branch: expected row count and no negative values
    audited = staging.read()
    assert audited.count() == 5 and audited.filter("x < 0").count() == 0
    # main is still pre-publish
    assert _rows(t.read()) == {i: i * 10.0 for i in range(5)}
    t.merge_branch("staging")
    got = _rows(t.read())
    assert got[1] == 111.0 and got[9] == 90.0 and 3 not in got


def test_legacy_fork_metadata_refuses_merge(spark, tmp_path):
    """A FORK file without chain identity must refuse to merge anywhere —
    accepting it as 'from main' would re-open the silent cross-chain drop
    for pre-upgrade branches."""
    import json as _json
    import os

    t = _mk(spark, tmp_path / "t")
    t.create_branch("old")
    fork = os.path.join(str(tmp_path / "t"), "_branches", "old", "FORK")
    with open(fork, "w") as fh:
        _json.dump({"fork_version": 0}, fh)  # pre-upgrade shape
    with pytest.raises(BranchConflictError, match="pre-chain-identity"):
        t.merge_branch("old")

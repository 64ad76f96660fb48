"""SCD Type 2 semantics not expressible through the SQL oracle: idempotent
batch redelivery, brand-new-key inserts, point-in-time (as-of) lookups, and
the single-commit atomicity of a close+open transition."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from datalake_on_prem_system_spark.lakehouse import LakeTable
from datalake_on_prem_system_spark.lakehouse.scd import (
    scd2_apply,
    scd2_as_of,
    scd2_init,
)


@pytest.fixture()
def dim(spark):
    table = LakeTable(spark, tempfile.mkdtemp(prefix="scd2_t_"))
    base = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "A", 30.0)],
        "k int, seg string, bal double",
    )
    table.create_or_replace(scd2_init(base, "2020-01-01"))
    return table


def _rows(df):
    return {
        (r.k, r.seg, r.bal, r.effective_from, r.effective_to, r.is_current)
        for r in df.collect()
    }


def test_scd2_close_open_single_commit(spark, dim):
    v_before = dim.latest_version()
    upd = spark.createDataFrame([(1, "Z", 10.0)], "k int, seg string, bal double")
    scd2_apply(dim, upd, "k", ["seg", "bal"], "2024-01-01")
    # the whole transition (close old + open new) is ONE commit
    assert dim.latest_version() == v_before + 1
    rows = _rows(dim.read().filter("k = 1"))
    assert rows == {
        (1, "A", 10.0, "2020-01-01", "2024-01-01", False),
        (1, "Z", 10.0, "2024-01-01", None, True),
    }


def test_scd2_noop_batch_commits_nothing(spark, dim):
    v_before = dim.latest_version()
    same = spark.createDataFrame([(2, "B", 20.0)], "k int, seg string, bal double")
    assert scd2_apply(dim, same, "k", ["seg", "bal"], "2024-01-01") is None
    assert dim.latest_version() == v_before  # idempotent redelivery


def test_scd2_brand_new_key_inserted_current(spark, dim):
    upd = spark.createDataFrame([(9, "N", 90.0)], "k int, seg string, bal double")
    scd2_apply(dim, upd, "k", ["seg", "bal"], "2024-01-01")
    rows = _rows(dim.read().filter("k = 9"))
    assert rows == {(9, "N", 90.0, "2024-01-01", None, True)}


def test_scd2_as_of_lookup(spark, dim):
    upd1 = spark.createDataFrame([(1, "X", 11.0)], "k int, seg string, bal double")
    scd2_apply(dim, upd1, "k", ["seg", "bal"], "2024-01-01")
    upd2 = spark.createDataFrame([(1, "Y", 12.0)], "k int, seg string, bal double")
    scd2_apply(dim, upd2, "k", ["seg", "bal"], "2024-06-01")
    for ts, want_seg in [
        ("2021-05-05", "A"),  # before any change
        ("2024-01-01", "X"),  # inclusive lower bound
        ("2024-05-31", "X"),  # day before second change
        ("2024-06-01", "Y"),  # open-ended current
        ("2030-01-01", "Y"),
    ]:
        got = scd2_as_of(dim, "k", ts).filter("k = 1").collect()
        assert len(got) == 1, ts
        assert got[0].seg == want_seg, ts


def test_scd2_engine_and_cli_facade(spark, tmp_path, capsys):
    """The engine/CLI surface: init from CSV, apply a batch, as-of read."""
    from datalake_on_prem_system_spark.cli import main

    wh = str(tmp_path / "wh")
    base = tmp_path / "base.csv"
    base.write_text("k,seg,bal\n1,A,10.0\n2,B,20.0\n")
    upd = tmp_path / "upd.csv"
    upd.write_text("k,seg,bal\n1,Z,10.0\n2,B,20.0\n")

    assert main(["--warehouse", wh, "scd2", "dim", "init",
                 "--csv", str(base), "--ts", "2020-01-01"]) == 0
    assert "initialized" in capsys.readouterr().out
    assert main(["--warehouse", wh, "scd2", "dim", "apply",
                 "--csv", str(upd), "--key", "k", "--attrs", "seg,bal",
                 "--ts", "2024-01-01"]) == 0
    assert "applied batch" in capsys.readouterr().out
    # idempotent redelivery through the facade
    assert main(["--warehouse", wh, "scd2", "dim", "apply",
                 "--csv", str(upd), "--key", "k", "--attrs", "seg,bal",
                 "--ts", "2024-02-01"]) == 0
    assert "no-op batch" in capsys.readouterr().out
    assert main(["--warehouse", wh, "scd2", "dim", "asof",
                 "--key", "k", "--ts", "2021-06-01"]) == 0
    out = capsys.readouterr().out
    assert "A" in out and "Z" not in out
    assert main(["--warehouse", wh, "scd2", "dim", "asof",
                 "--key", "k", "--ts", "2024-06-01"]) == 0
    assert "Z" in capsys.readouterr().out


def test_scd2_duplicate_key_batch_rejected(spark, dim):
    dup = spark.createDataFrame(
        [(1, "X", 1.0), (1, "Y", 2.0)], "k int, seg string, bal double"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        scd2_apply(dim, dup, "k", ["seg", "bal"], "2024-01-01")


def test_scd2_null_attr_change_detection(spark, dim):
    # NULL -> value and value -> NULL are both real changes (eqNullSafe)
    upd = spark.createDataFrame([(3, None, 30.0)], "k int, seg string, bal double")
    scd2_apply(dim, upd, "k", ["seg", "bal"], "2024-01-01")
    rows = _rows(dim.read().filter("k = 3"))
    assert (3, None, 30.0, "2024-01-01", None, True) in rows
    # redelivering the NULL tuple is now a no-op
    assert scd2_apply(dim, upd, "k", ["seg", "bal"], "2024-02-01") is None

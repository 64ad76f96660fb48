"""Bloom-filter file skipping: build/probe parity, manifest plumbing, and
the soundness rules (base-only pruning, type-mismatch conservatism).

The scenario every test builds on: segments whose min/max RANGES overlap
(so stats skipping can never help) but whose value MEMBERSHIP differs —
the point-predicate shape blooms exist for.
"""

from __future__ import annotations

import hashlib
import tempfile

import pytest
from pyspark.sql import functions as F

from datalake_on_prem_system_spark.lakehouse.bloom import (
    DEFAULT_K,
    DEFAULT_M,
    _canonical_str,
    _positions,
    bloom_config,
    bloom_excludes,
)
from datalake_on_prem_system_spark.lakehouse.table import LakeTable


def _mk(spark, clerks, base):
    return spark.createDataFrame(
        [(base + i, c, float(base + i)) for i, c in enumerate(clerks)],
        "pk long, clerk string, v double",
    )


@pytest.fixture(scope="module")
def bloom_table(spark):
    """Three base segments with overlapping clerk ranges, disjoint beyond
    the shared endpoints: v0={a,c,e} v1={a,b,f} v2={b,e,z}."""
    root = tempfile.mkdtemp(prefix="lake_bloom_")
    t = LakeTable(spark, root)
    t.create_or_replace(_mk(spark, ["a", "c", "e"], 0), properties={"bloom.columns": "clerk"})
    t.append(_mk(spark, ["a", "b", "f"], 10))
    t.append(_mk(spark, ["b", "e", "z"], 20))
    return t


def test_every_base_entry_carries_a_bloom(bloom_table):
    commit = bloom_table.commit_at()
    assert len(commit.files) == 3
    for e in commit.files:
        info = e["bloom"]["clerk"]
        assert info["m"] == DEFAULT_M and info["k"] == DEFAULT_K and info["t"] == "s"


def test_no_false_negatives_on_present_values(bloom_table):
    """A value present in a segment must never be excluded by its bloom —
    the correctness-critical direction of the JVM-build/Python-probe
    hash-parity contract."""
    commit = bloom_table.commit_at()
    membership = {0: "ace", 1: "abf", 2: "bez"}
    for e in commit.files:
        version = int(e["seq"])
        for clerk in membership[version]:
            assert not bloom_excludes(e, "clerk", clerk)


def test_point_read_skips_bloom_excluded_segments(bloom_table):
    """clerk='c' lives only in v0, but every segment's [min,max] range
    covers 'c' — only the bloom can prune v1/v2, and it does."""
    commit = bloom_table.commit_at()
    for e in commit.files:
        lo, hi = e["stats"]["clerk"]
        assert lo <= "c" <= hi  # stats alone prune nothing
    df = bloom_table.read_where(F.col("clerk") == "c")
    assert sorted(r["pk"] for r in df.collect()) == [1]
    v0_entry = next(e for e in commit.files if int(e["seq"]) == 0)
    assert all(f.replace("file:", "").replace("///", "/").startswith(v0_entry["path"]) for f in df.inputFiles())


def test_absent_value_prunes_every_segment(bloom_table):
    df = bloom_table.read_where(F.col("clerk") == "nowhere")
    assert df.count() == 0
    assert df.inputFiles() == []


def test_results_match_full_scan_for_all_values(bloom_table):
    for clerk in "abcefz":
        pruned = sorted(
            r["pk"] for r in bloom_table.read_where(F.col("clerk") == clerk).collect()
        )
        full = sorted(
            r["pk"]
            for r in bloom_table.read().filter(F.col("clerk") == clerk).collect()
        )
        assert pruned == full, clerk


def test_blooms_survive_carry_and_respect_conjunctions(spark, bloom_table):
    """Carried entries keep their blooms verbatim; a bloom conjunct
    composes with an unrelated comparison conjunct."""
    df = bloom_table.read_where((F.col("clerk") == "z") & (F.col("v") >= 0.0))
    assert [r["pk"] for r in df.collect()] == [22]
    commit = bloom_table.commit_at()
    v2 = next(e for e in commit.files if int(e["seq"]) == 2)
    assert all(f.replace("file:", "").replace("///", "/").startswith(v2["path"]) for f in df.inputFiles())


def test_in_list_prunes_by_membership(bloom_table):
    """IN-list pruning: an entry survives iff SOME element may be present.
    {'c','nope'} keeps only v0; {'no1','no2'} prunes everything; results
    always equal the full scan."""
    df = bloom_table.read_where(F.col("clerk").isin("c", "nope"))
    assert sorted(r["pk"] for r in df.collect()) == [1]
    commit = bloom_table.commit_at()
    v0 = next(e for e in commit.files if int(e["seq"]) == 0)
    assert all(
        f.replace("file:", "").replace("///", "/").startswith(v0["path"])
        for f in df.inputFiles()
    )
    empty = bloom_table.read_where(F.col("clerk").isin("no1", "no2"))
    assert empty.count() == 0 and empty.inputFiles() == []
    # multi-segment membership stays complete
    multi = bloom_table.read_where(F.col("clerk").isin("a", "z"))
    assert sorted(r["pk"] for r in multi.collect()) == [0, 10, 22]


def test_or_predicates_prune_by_disjunct_union(bloom_table):
    """OR-of-point-lookups (the multi-tenant shape): an entry survives iff
    SOME branch may match it — segments containing neither clerk drop."""
    commit = bloom_table.commit_at()
    # 'c' only in v0, 'z' only in v2 → v1 {a,b,f} must be skipped
    df = bloom_table.read_where((F.col("clerk") == "c") | (F.col("clerk") == "z"))
    assert sorted(r["pk"] for r in df.collect()) == [1, 22]
    v1 = next(e for e in commit.files if int(e["seq"]) == 1)
    assert not any(
        f.replace("file:", "").replace("///", "/").startswith(v1["path"])
        for f in df.inputFiles()
    )
    # neither branch present anywhere → everything prunes
    none = bloom_table.read_where((F.col("clerk") == "q1") | (F.col("clerk") == "q2"))
    assert none.count() == 0 and none.inputFiles() == []
    # an OR with an unprunable branch must not prune at all — pin via
    # inputFiles: every segment stays in the scan, not just the right rows
    mixed = bloom_table.read_where(
        (F.col("clerk") == "nowhere") | F.col("clerk").startswith("z")
    )
    assert sorted(r["pk"] for r in mixed.collect()) == [22]
    scanned_dirs = {
        f.replace("file:", "").replace("///", "/").rsplit("/", 1)[0]
        for f in mixed.inputFiles()
    }
    assert scanned_dirs == {e["path"] for e in commit.files}
    # AND-of-OR composes: (c|z) AND v >= 20 → only v2 rows
    both = bloom_table.read_where(
        ((F.col("clerk") == "c") | (F.col("clerk") == "z")) & (F.col("v") >= 20.0)
    )
    assert sorted(r["pk"] for r in both.collect()) == [22]


def test_type_mismatched_literal_never_prunes(spark):
    """An int literal probed against a string-column bloom must be ignored
    (conservative), not hashed into a spurious exclusion."""
    root = tempfile.mkdtemp(prefix="lake_bloom_ty_")
    t = LakeTable(spark, root)
    t.create_or_replace(
        spark.createDataFrame([(1, "123")], "pk long, code string"),
        properties={"bloom.columns": "code"},
    )
    e = t.commit_at().files[0]
    assert not bloom_excludes(e, "code", 123)  # int vs string-kind bloom
    assert not bloom_excludes(e, "code", None)
    assert bloom_excludes(e, "code", "124")


def test_integer_and_boolean_columns(spark):
    root = tempfile.mkdtemp(prefix="lake_bloom_ib_")
    t = LakeTable(spark, root)
    t.create_or_replace(
        spark.createDataFrame(
            [(1, 7, True), (2, -40, True)], "pk long, n long, flag boolean"
        ),
        properties={"bloom.columns": "n,flag"},
    )
    e = t.commit_at().files[0]
    assert not bloom_excludes(e, "n", 7)
    assert not bloom_excludes(e, "n", -40)
    assert bloom_excludes(e, "n", 8)
    assert not bloom_excludes(e, "flag", True)
    assert bloom_excludes(e, "flag", False)
    # bool literal against the int bloom: ignored, not treated as 0/1
    assert not bloom_excludes(e, "n", True)


def test_mor_delta_entries_have_no_bloom_and_are_always_read(spark):
    """Soundness: a MOR delta deleting clerk 'c' must be consulted by the
    clerk='c' read even though the delta batch's own values say nothing
    about 'c' membership of other rows. Deltas carry no bloom (never
    built) and the read path exempts them from pruning, so the delete is
    honored."""
    root = tempfile.mkdtemp(prefix="lake_bloom_mor_")
    t = LakeTable(spark, root)
    t.create_or_replace(
        _mk(spark, ["a", "c", "e"], 0),
        properties={"bloom.columns": "clerk", "write.merge.mode": "mor"},
    )
    t.merge(_mk(spark, ["a", "b"], 10), pk="pk")  # bucketize
    # MOR delete of pk=1 (the clerk='c' row) via op column
    chg = spark.createDataFrame(
        [(1, "c", 1.0, "d")], "pk long, clerk string, v double, op string"
    )
    t.merge(chg, pk="pk", op_col="op")
    commit = t.commit_at()
    deltas = [e for e in commit.files if e.get("delta") is not None]
    assert deltas and all("bloom" not in e for e in deltas)
    assert t.read_where(F.col("clerk") == "c").count() == 0


def test_hive_partitioned_single_entry_bloom(spark):
    """A hive-layout segment is one manifest entry whose files live in
    partition SUBDIRS — leaf-dir groups must roll up to the entry by
    prefix."""
    root = tempfile.mkdtemp(prefix="lake_bloom_hive_")
    t = LakeTable(spark, root)
    df = spark.createDataFrame(
        [(1, "x", "p1"), (2, "y", "p2"), (3, "z", "p1")],
        "pk long, code string, part string",
    )
    t.create_or_replace(df, partition_by=["part"], properties={"bloom.columns": "code"})
    e = t.commit_at().files[0]
    for present in "xyz":
        assert not bloom_excludes(e, "code", present)
    assert bloom_excludes(e, "code", "w")


def test_delete_all_and_empty_partitioned_writes_survive_blooms(spark):
    """Zero-row segments emit no parquet files under dynamic-partition
    writes — bloom building must short-circuit, not fail schema inference
    (regression: DELETE matching every row of a bloom-configured bucketed
    table crashed instead of committing)."""
    root = tempfile.mkdtemp(prefix="lake_bloom_del_")
    t = LakeTable(spark, root)
    t.create_or_replace(
        _mk(spark, ["a", "b", "c"], 0), properties={"bloom.columns": "clerk"}
    )
    t.merge(_mk(spark, ["d"], 10), pk="pk")  # bucketize
    t.delete_where(F.col("pk") >= 0)  # wipes every touched bucket
    assert t.read().count() == 0
    # empty partitioned create with blooms configured
    root2 = tempfile.mkdtemp(prefix="lake_bloom_empty_")
    t2 = LakeTable(spark, root2)
    t2.create_or_replace(
        spark.createDataFrame([], "pk long, code string, part string"),
        partition_by=["part"],
        properties={"bloom.columns": "code"},
    )
    assert t2.read().count() == 0


def test_probe_matches_reference_hash():
    """Pin the probe's position derivation to the documented sha256-slice
    scheme so a refactor can't silently break parity with written blooms."""
    d = hashlib.sha256("abc".encode()).hexdigest()
    assert _positions("abc", 1 << 15, 4) == [
        int(d[0:12], 16) % (1 << 15),
        int(d[12:24], 16) % (1 << 15),
        int(d[24:36], 16) % (1 << 15),
        int(d[36:48], 16) % (1 << 15),
    ]
    assert _canonical_str(True, "b") == "true"
    assert _canonical_str(True, "i") is None
    assert _canonical_str(5, "i") == "5"
    assert _canonical_str("5", "i") is None


def test_bloom_config_validation():
    assert bloom_config(None) is None
    assert bloom_config({"bloom.columns": "  "}) is None
    cols, m, k = bloom_config({"bloom.columns": "a, b", "bloom.m": "1024", "bloom.k": "2"})
    assert cols == ["a", "b"] and m == 1024 and k == 2
    with pytest.raises(ValueError):
        bloom_config({"bloom.columns": "a", "bloom.k": "9"})  # 9*12 > 64 hex


def test_read_for_join_prunes_by_dim_membership(spark, bloom_table):
    """DPP-lite (round-13 verdict #8): the small side's distinct join
    keys probe the fact manifest's blooms — segments holding none of the
    dim's keys are never scanned (inputFiles pin), the joined result is
    identical to the unpruned join, and an over-cap dimension raises
    instead of silently collecting a fact-sized side."""
    dim = spark.createDataFrame(
        [("c", 1), ("c", 2), ("e", 3), (None, 4)], "clerk string, x long"
    )
    fact = bloom_table.read_for_join("clerk", dim)
    # c lives only in v0, e in v0+v2 — v1 ({a,b,f}) must never be read
    assert sorted(r["pk"] for r in fact.collect()) == [1, 2, 21]
    commit = bloom_table.commit_at()
    v1 = next(e for e in commit.files if int(e["seq"]) == 1)
    touched = {
        f.replace("file:", "").replace("///", "/") for f in fact.inputFiles()
    }
    assert touched and not any(f.startswith(v1["path"]) for f in touched)

    full = (
        bloom_table.read()
        .join(dim.select("clerk").distinct(), "clerk")
        .select("pk")
    )
    assert sorted(r["pk"] for r in full.collect()) == sorted(
        r["pk"] for r in fact.join(dim.select("clerk").distinct(), "clerk").select("pk").collect()
    )

    # all-NULL key side → empty frame, no scan
    nulls = spark.createDataFrame([(None,)], "clerk string")
    assert bloom_table.read_for_join("clerk", nulls).count() == 0

    # over-cap guard
    big = spark.range(50).select(F.col("id").cast("string").alias("clerk"))
    with pytest.raises(ValueError, match="max_keys"):
        bloom_table.read_for_join("clerk", big, max_keys=10)

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal

from datalake_on_prem_system_spark.functions import (
    find_id_col,
    get_cast_val,
    sanitize_column_name,
)


def test_find_id_col_known_names():
    assert find_id_col(["name", "id", "x"]) == "id"
    assert find_id_col(["Customer_ID", "name"]) == "Customer_ID"
    assert find_id_col(["uid", "other"]) == "uid"


def test_find_id_col_suffix_and_fallback():
    assert find_id_col(["name", "order_id"]) == "order_id"
    assert find_id_col(["c_custkey", "c_name"]) == "c_custkey"
    assert find_id_col(["alpha", "beta"]) == "alpha"
    assert find_id_col([]) is None


def test_get_cast_val_types():
    assert get_cast_val("42", "bigint") == 42
    assert get_cast_val("3.5", "double") == 3.5
    assert get_cast_val("3.5", "decimal(10,2)") == Decimal("3.5")
    assert isinstance(get_cast_val("3.5", "decimal(10,2)"), Decimal)
    assert get_cast_val("yes", "boolean") is True
    assert get_cast_val("no", "boolean") is False
    assert get_cast_val("2024-01-02T03:04:05", "timestamp") == datetime(2024, 1, 2, 3, 4, 5)
    assert get_cast_val("2024-01-02", "date") == date(2024, 1, 2)
    assert get_cast_val("plain", "string") == "plain"
    assert get_cast_val(None, "bigint") is None


def test_get_cast_val_string_fallback_on_bad_input():
    assert get_cast_val("not-a-number", "bigint") == "not-a-number"
    assert get_cast_val("not-a-date", "timestamp") == "not-a-date"
    assert get_cast_val("not-a-decimal", "decimal(10,2)") == "not-a-decimal"


def test_sanitize_column_name():
    assert sanitize_column_name("Customer Key") == "Customer_Key"
    assert sanitize_column_name("Name.Full") == "NameFull"
    assert sanitize_column_name("acct (bal)") == "acct_bal"
    assert sanitize_column_name("a/b") == "ab"
    assert sanitize_column_name("  x  ") == "x"


def test_sanitize_columns_deduplicates_collisions(spark):
    from datalake_on_prem_system_spark.functions.schema import sanitize_columns

    df = spark.createDataFrame([(1, 2, 3)], ["a b", "a_b", "a.b"])
    assert sanitize_columns(df).columns == ["a_b", "a_b_2", "ab"]
    df2 = spark.createDataFrame([(1, 2)], ["x.", "x"])
    assert sanitize_columns(df2).columns == ["x", "x_2"]


def test_find_id_col_does_not_claim_ordinary_key_words():
    from datalake_on_prem_system_spark.functions.keys import find_id_col

    # TPC-H style pks still recognized
    assert find_id_col(["c_name", "c_custkey"]) == "c_custkey"
    assert find_id_col(["o_orderkey", "o_comment"]) == "o_orderkey"
    assert find_id_col(["a", "session_key"]) == "session_key"
    # ordinary words ending in 'key' are NOT pks
    assert find_id_col(["name", "whiskey", "row_num"]) == "name"


def test_upsert_ingest_bootstraps_with_precombine_dedup(spark, tmp_path):
    """First-ever upsert ingest must route through merge's bootstrap:
    duplicate keys dedup by precombine and the table comes out pk-bucketed,
    not a raw create_or_replace of the duplicates."""
    from datalake_on_prem_system_spark.lakehouse import LakeTable
    from datalake_on_prem_system_spark.sources.csv_ingest import ingest_csv

    p = tmp_path / "dup.csv"
    p.write_text("id,v,seq\n1,old,1\n1,new,5\n2,only,1\n")
    t = LakeTable(spark, str(tmp_path / "t"))
    out = ingest_csv(t, str(p), mode="upsert", pk="id", precombine="seq")
    rows = {r.id: r.v for r in out.collect()}
    assert rows == {1: "new", 2: "only"}  # last-writer-wins applied
    assert t._read_commit(t.latest_version()).bucket_spec["pk"] == "id"


def test_engine_numeric_filter_unparseable_value_is_empty_not_error(spark, tmp_path):
    """Reference parity: filtering a numeric column by a non-numeric string
    returns no rows (not an ANSI CAST_INVALID_INPUT crash)."""
    from datalake_on_prem_system_spark.engine import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"), namespace="nf")
    eng.write_table(
        "t1", spark.createDataFrame([(1, "a")], "item_id int, v string")
    )
    assert eng.read("t1", filter_col="item_id", filter_val="abc").count() == 0
    assert eng.read("t1", filter_col="item_id", filter_val="1").count() == 1

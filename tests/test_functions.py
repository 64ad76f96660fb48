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

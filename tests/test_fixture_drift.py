"""Fixture-drift smoke test.

The driver regenerates /root/testdata per round and has already changed the
physical shape of ``events.ts`` once (INT64 TIMESTAMP(NANOS) → timestamp[us]
TIMESTAMP_NTZ), which silently broke every ``unix_micros`` call site across
6 queries plus the bench (round-4 regression). This test pins the
*normalized* dtype of every fixture column the operators depend on, so the
next driver-side format change fails ONE named test that says which column
drifted, instead of scattered AnalysisExceptions.
"""

from __future__ import annotations

import pytest

from datalake_on_prem_system_spark.operators.common import t

# (table, column) -> normalized Spark simpleString dtype the operators
# assume. `t()` is the single normalization chokepoint, so asserting its
# output covers every downstream query.
EXPECTED = {
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # normalized by t() whatever the physical shape
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_shipdate": "timestamp_ntz",
        "l_returnflag": "string",
        "l_linestatus": "string",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderdate": "timestamp_ntz",
        "o_totalprice": "double",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_columns_normalized(spark, sf_dir, table):
    df = t(spark, sf_dir, table)
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for col, want in EXPECTED[table].items():
        assert col in actual, (
            f"fixture drift: {table}.{col} missing — driver changed the "
            f"fixture schema; update operators + this test together"
        )
        assert actual[col] == want, (
            f"fixture drift: {table}.{col} normalizes to {actual[col]!r}, "
            f"operators assume {want!r} — fix the normalization in "
            f"operators/common.py::t before anything else"
        )

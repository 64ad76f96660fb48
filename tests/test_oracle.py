"""Every oracle-checked query must match DuckDB at sf0.001 (the sf0.01 run
is the driver's job; this is the fast regression net)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from check_correctness import compare

_QS = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = _QS[name](spark, sf_dir).toPandas()
    ddf = duck.sql(_ORACLES[name]).df()
    msg = compare(name, sdf, ddf)
    assert not msg, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(_QS) - set(_ORACLES)))
def test_rows_only_query_runs(name, spark, sf_dir):
    df = _QS[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["o_orderkey", "o_orderdate", "o_orderpriority", "revenue"]

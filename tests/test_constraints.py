"""CHECK constraints (Delta ADD CONSTRAINT parity): ``constraint.<name>``
table properties enforced on every written batch — SQL-standard semantics
(only definite FALSE violates; NULL passes), schema-evolution tolerant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_on_prem_system_spark.lakehouse import LakeTable
from datalake_on_prem_system_spark.lakehouse.table import CheckViolation

PROPS = {"constraint.positive_x": "x > 0", "constraint.has_id": "id IS NOT NULL"}


def _df(spark, rows, ddl="id bigint, x double"):
    return spark.createDataFrame(rows, ddl)


def test_create_enforces_and_violation_publishes_nothing(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    with pytest.raises(CheckViolation, match="positive_x"):
        t.create_or_replace(_df(spark, [(1, 1.0), (2, -3.0)]), properties=PROPS)
    assert not t.exists()  # nothing committed
    t.create_or_replace(_df(spark, [(1, 1.0), (2, 3.0)]), properties=PROPS)
    assert t.read().count() == 2


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create_or_replace(_df(spark, [(1, 1.0), (2, 3.0)]), properties=PROPS)
    return t


def test_append_and_insert_enforce_carried_constraints(spark, table):
    v = table.latest_version()
    with pytest.raises(CheckViolation, match="positive_x"):
        table.append(_df(spark, [(3, -1.0)]))
    with pytest.raises(CheckViolation, match="has_id"):
        table.insert_rows([{"id": None, "x": 5.0}])
    assert table.latest_version() == v  # both writes rejected pre-commit
    table.append(_df(spark, [(3, 1.5)]))
    assert table.read().count() == 3


def test_merge_enforces_on_upserts_but_deletes_pass(spark, table):
    table.merge(_df(spark, [(1, 9.0)]), pk="id")  # valid upsert, bucketizes
    with pytest.raises(CheckViolation, match="positive_x"):
        table.merge(_df(spark, [(2, -9.0)]), pk="id")
    # a delete row carries x=-1 but deletes can't violate (op='d' filtered
    # out before enforcement)
    chg = _df(spark, [(1, -1.0, "d")], "id bigint, x double, op string")
    table.merge(chg, pk="id", op_col="op")
    assert sorted(r.id for r in table.read().collect()) == [2]


def test_null_expression_result_passes_sql_standard(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    # x > 0 over NULL x is UNKNOWN, not FALSE — SQL CHECK passes it
    t.create_or_replace(
        _df(spark, [(1, None)]), properties={"constraint.positive_x": "x > 0"}
    )
    assert t.read().count() == 1


def test_schema_evolution_batch_missing_constrained_column_passes(spark, table):
    # evolve with a new column; the batch lacks x entirely — absent column
    # reads as NULL for these rows, and NULL passes CHECK
    table.append(_df(spark, [(10, "tag")], "id bigint, label string"))
    assert table.read().filter(F.col("id") == 10).count() == 1


def test_update_enforces_constraints(spark, table):
    v = table.latest_version()
    with pytest.raises(CheckViolation, match="positive_x"):
        table.update_where(F.col("id") == 1, {"x": -4.0})
    assert table.latest_version() == v
    table.update_where(F.col("id") == 1, {"x": 4.0})
    assert table.read().filter(F.col("id") == 1).collect()[0].x == 4.0


def test_multi_column_constraint_violates_on_present_column(spark, tmp_path):
    """A batch lacking one referenced column must still violate when the
    PRESENT column makes the expression definitely FALSE (FALSE AND NULL =
    FALSE) — missing columns fill as typed NULLs, they don't disable the
    whole constraint."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create_or_replace(
        _df(spark, [(1, 1.0, "a")], "id bigint, x double, label string"),
        properties={"constraint.both": "x > 0 AND label != 'bad'"},
    )
    with pytest.raises(CheckViolation, match="both"):
        t.append(_df(spark, [(2, -5.0)], "id bigint, x double"))  # no label
    # x positive, label absent → TRUE AND NULL = NULL → passes
    t.append(_df(spark, [(3, 5.0)], "id bigint, x double"))
    assert t.read().count() == 2


def test_engine_facade_carries_constraints(spark, tmp_path):
    """Constraints set through write_table properties gate every later
    facade write (insert/update return a 4xx-able error upstream)."""
    from datalake_on_prem_system_spark.engine import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.write_table(
        "items",
        _df(spark, [(1, 1.0)]),
        properties={"constraint.positive_x": "x > 0"},
    )
    with pytest.raises(CheckViolation):
        eng.insert("items", {"id": "2", "x": "-9.5"})
    with pytest.raises(CheckViolation):
        eng.update("items", "1", {"x": "-1.0"})
    assert eng.read("items").count() == 1


def test_malformed_constraint_raises_loudly_never_skips(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    with pytest.raises(CheckViolation, match="failed to analyze"):
        t.create_or_replace(
            _df(spark, [(1, 1.0)]), properties={"constraint.bad": "x >< 0"}
        )
    assert not t.exists()


def test_validate_constraints_three_valued_and_lifecycle(spark, tmp_path):
    """The ADD CONSTRAINT validation flow: constraints attached via
    set_properties are metadata-only (existing violations survive, clean
    appends still enforce batch-locally), and validate_constraints
    reports definite-FALSE violations separately from NULL/unknown rows
    (which pass, SQL CHECK semantics)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datalake_on_prem_system_spark.lakehouse import LakeTable
    from datalake_on_prem_system_spark.lakehouse.table import CheckViolation

    t = LakeTable(spark, str(tmp_path / "t"))
    t.create_or_replace(
        spark.createDataFrame(
            [(1, 5.0, "A"), (2, -3.0, "B"), (3, None, "A")],
            "k long, bal double, seg string",
        )
    )
    # no constraints declared -> empty report with a stable schema
    assert t.validate_constraints().count() == 0

    t.set_properties(
        {
            "constraint.bal_nonneg": "bal >= 0",
            "constraint.key_positive": "k > 0",
        }
    )
    rep = {
        r.constraint: (r.n_rows, r.n_violations, r.n_unknown, r.would_pass)
        for r in t.validate_constraints().collect()
    }
    # row 2 violates; row 3's NULL bal is UNKNOWN and passes
    assert rep["bal_nonneg"] == (3, 1, 1, False)
    assert rep["key_positive"] == (3, 0, 0, True)

    # write-time enforcement covers NEW batches only: a clean append
    # succeeds despite the pre-existing violation...
    t.append(spark.createDataFrame([(4, 1.0, "C")], "k long, bal double, seg string"))
    # ...and a violating append is rejected
    with _pytest.raises(CheckViolation):
        t.append(
            spark.createDataFrame([(5, -9.0, "C")], "k long, bal double, seg string")
        )
    rep2 = {
        r.constraint: r.n_violations for r in t.validate_constraints().collect()
    }
    assert rep2["bal_nonneg"] == 1  # still just the legacy row


def test_validate_constraints_empty_table_reports_zero_not_null(
    spark, tmp_path
):
    """An EMPTY table with declared constraints must report
    n_violations=0 / n_unknown=0 / would_pass=true — F.sum over zero
    rows is NULL and NULL == 0 is NULL, so without the coalesce the
    report's booleans went NULL (round-13 ADVICE)."""
    from pyspark.sql import functions as F

    t = LakeTable(spark, str(tmp_path / "t"))
    t.create_or_replace(
        _df(spark, [(1, 1.0)]),
        properties={"constraint.x_pos": "x > 0"},
    )
    t.delete_where(F.col("id") == 1)
    assert t.read().count() == 0
    rows = t.validate_constraints().collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_rows, r.n_violations, r.n_unknown, r.would_pass) == (
        0,
        0,
        0,
        True,
    )

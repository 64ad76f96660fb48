"""The TableFormat seam: LakeTable must satisfy the protocol every binding
implements, and the engine/catalog surface must stay within it."""

from __future__ import annotations

import inspect

from datalake_on_prem_system_spark.lakehouse import LakeTable
from datalake_on_prem_system_spark.lakehouse.format import TableFormat


def test_laketable_implements_tableformat(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "t"))
    assert isinstance(table, TableFormat)


def test_protocol_members_have_compatible_signatures():
    """Every protocol method exists on LakeTable with at least the
    protocol's parameters (a binding implementing the protocol verbatim is
    call-compatible anywhere LakeTable is used today)."""
    for name, member in vars(TableFormat).items():
        if name.startswith("_") or not callable(member):
            continue
        impl = getattr(LakeTable, name, None)
        assert impl is not None, f"LakeTable missing protocol method {name}"
        proto_params = list(inspect.signature(member).parameters)
        impl_params = list(inspect.signature(impl).parameters)
        for p in proto_params:
            if p in ("self", "args", "kwargs"):
                continue
            assert p in impl_params or any(
                inspect.signature(impl).parameters[q].kind
                == inspect.Parameter.VAR_KEYWORD
                for q in impl_params
            ), f"LakeTable.{name} missing protocol parameter {p!r}"

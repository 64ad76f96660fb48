"""Dump .explain("formatted") for registered queries to plans/r14/.

Usage: python scripts/dump_plans.py <suffix> [sf_dir] [query ...]

Writes plans/r14/<query>_<suffix>.txt for each named query (default: every
bench headliner). The plan is captured from the exact DataFrame the query
callable returns at the given sf_dir (default sf0.1 — the bench scale, so
broadcast/size-driven planner decisions match the bench run).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_on_prem_system_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    spark = get_spark(app_name="dump_plans")
    qs = entry_mod.queries()
    if not names:
        import bench

        names = list(bench.HEADLINERS)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    rc = 0
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            rc = 1
            continue
        try:
            spark.catalog.clearCache()
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — dump what we can
            plan = f"ERROR {type(exc).__name__}: {exc}"
            rc = 1
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

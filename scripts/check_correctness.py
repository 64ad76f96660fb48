"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir and compares
against ``oracle_sql()`` via DuckDB: row count, sorted column names, and an
order-insensitive value comparison. Queries without an oracle get a
rows-only check (runs + row count printed).

Usage: python scripts/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            df[c] = df[c].astype("string")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype("string")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _dtype_family(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "other"


def dtype_mismatch(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    """The driver's value-hash is dtype-sensitive: an uncast DuckDB
    sum(BIGINT) (HUGEINT) lands in pandas as float64/object while Spark
    returns int64 — equal values, different hash (r8: cur_source_mix,
    pl_sequence_pack). Flag any int-vs-float family drift locally."""
    msgs = []
    for c in spark_df.columns:
        fa, fb = _dtype_family(spark_df[c]), _dtype_family(duck_df[c])
        if fa == fb:
            continue
        # DuckDB HUGEINT / DECIMAL sums surface as object or float64 for an
        # integer-valued Spark column: exactly the class the hash rejects.
        if {fa, fb} == {"int", "float"} or (
            "int" in (fa, fb) and "other" in (fa, fb)
        ):
            msgs.append(f"{c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}")
    return "; ".join(msgs)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    if len(spark_df) != len(duck_df):
        return f"ROWS {len(spark_df)} vs {len(duck_df)}"
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"COLS {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    dt = dtype_mismatch(spark_df[sorted(spark_df.columns)], duck_df[sorted(duck_df.columns)])
    if dt:
        return f"DTYPE {dt}"
    a, b = canon(spark_df), canon(duck_df)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
    except AssertionError as e:
        return "VALUES " + str(e).splitlines()[-1][:200]
    return ""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from datalake_on_prem_system_spark.session import get_spark

    spark = get_spark(app_name="check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not silently pass by matching nothing
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            # persisted mid-plan frames (dedup shingle caches) must not
            # accumulate in executor storage across a 92-query sweep
            spark.catalog.clearCache()
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows")
            n_rows_only += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: ORACLE ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        msg = compare(name, sdf, ddf)
        if msg:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
        else:
            print(f"pass {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

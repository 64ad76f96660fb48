"""Adversarial star-schema fixture for the TPC-H shape family — boundary
and trap cases the synthetic fixtures never produce, hash-compared
Spark-vs-DuckDB AND pinned by direct semantic assertions (an oracle compare
alone would pass if both sides shared a bug):

- q2: a NON-EUROPE supplier undercuts the min price — the correlated min
  is scoped to the EU supplier pool and must ignore it; two EU suppliers
  tie at the min and both must appear
- q15: an EMPTY revenue window (no Q1-1997 shipments) — scalar max over
  empty is NULL, result must be empty on both engines
- q17/q18/q20: rows landing EXACTLY on the threshold (strict comparisons
  must exclude them)
- q21: an order where TWO suppliers fail (excluded), a single-supplier
  failed order (excluded — no "other" supplier), and the canonical
  one-failure multi-supplier order (included)
- q22: a customer balance exactly AT the pool average (strict >, excluded)
- q13: a customer whose only orders are in the excluded priority class
  (left join must keep it with c_count = 0)
- q12: shipdate exactly on the window's exclusive upper bound
"""

from __future__ import annotations

import datetime

import duckdb

import __spark_entry__ as entry
from check_correctness import compare

_D = datetime.datetime


def _mk(spark, tmp_path, name: str, rows, ddl: str) -> None:
    spark.createDataFrame(rows, ddl).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_edge_star_schema_matches_oracle(spark, tmp_path):
    _mk(spark, tmp_path, "region",
        [(i, n) for i, n in enumerate(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])],
        "r_regionkey int, r_name string")
    _mk(spark, tmp_path, "nation",
        [(i, f"NATION_{i}", i) for i in range(5)],
        "n_nationkey int, n_name string, n_regionkey int")
    _mk(spark, tmp_path, "supplier",
        [
            (1, "Supplier#1", 3, 100.0),   # EUROPE
            (2, "Supplier#2", 3, 100.0),   # EUROPE — ties with #1 at min cost
            (3, "Supplier#3", 0, 50.0),    # AFRICA — undercuts, must be ignored by q2
            (4, "Supplier#4", 2, -5.0),    # negative balance — q16 NOT-IN exclusion
            (5, "Supplier#5", 1, 10.0),
            (6, "Supplier#6", 2, 20.0),    # NATION_2 — q8 numerator side
        ],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double")
    _mk(spark, tmp_path, "part",
        [
            (1, "big bolt", "Brand#21", "LARGE", 5, 100.0),    # q17 brand
            (2, "red widget", "Brand#11", "PROMO", 10, 50.0),  # q8/q14 + q20 'red %'
            (3, "hot gear", "Brand#10", "STANDARD", 15, 20.0), # q9 '%gear%', q16 brand excl
            (4, "blue gizmo", "Brand#12", "SMALL", 35, 30.0),  # q16 size list
            (5, "big nut", "Brand#13", "LARGE", 9, 80.0),      # q2 target (size ≤ 10)
        ],
        "p_partkey bigint, p_name string, p_brand string, p_type string, p_size int, p_retailprice double")
    _mk(spark, tmp_path, "customer",
        [
            (1, "Customer#1", 2, 100.0, "BUILDING"),  # ASIA (q8)
            (2, "Customer#2", 0, 300.0, "AUTO"),      # above pool avg (200): q22 in
            (3, "Customer#3", 3, 200.0, "AUTO"),      # exactly AT avg: q22 excluded
            (4, "Customer#4", 0, 100.0, "MACHINERY"), # q13: only excluded-priority orders
        ],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string")
    # q22 pool = nations {0,3,7,11,18} → customers 2,3,4; positive-balance
    # avg = (300+200+100)/3 = 200; only customer 2 beats it strictly; all of
    # 2,3,4 must be order-free after 2000-01-01 → keep orders before then
    _mk(spark, tmp_path, "orders",
        [
            (100, 1, "F", 10.0, _D(1996, 5, 1), "1-URGENT"),
            (101, 1, "F", 20.0, _D(1997, 6, 1), "2-HIGH"),
            (102, 2, "O", 30.0, _D(1997, 7, 1), "5-LOW"),
            (103, 4, "O", 40.0, _D(1996, 8, 1), "4-NOT SPECIFIED"),  # q13 filtered
            (104, 1, "F", 50.0, _D(1996, 9, 1), "3-MEDIUM"),
            (105, 3, "O", 60.0, _D(1997, 2, 1), "5-LOW"),
            (106, 2, "F", 5.0, _D(1996, 10, 1), "5-LOW"),  # q21: lone supplier fails
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    _mk(spark, tmp_path, "lineitem",
        [
            # q2 offers on part 5: EU suppliers 1,2 tie at 80; AFRICA supplier 3
            # offers 60 — cheaper, but outside the EU pool
            (100, 5, 1, 1, 10.0, 80.0, 0.0, 0.0, "N", "O", _D(1996, 5, 2)),
            (100, 5, 2, 2, 10.0, 80.0, 0.0, 0.0, "R", "O", _D(1996, 5, 3)),
            (100, 5, 3, 3, 10.0, 60.0, 0.0, 0.0, "N", "O", _D(1996, 5, 4)),
            # q21 order 101 (status F): supplier 5 fails (R), suppliers 1/6 ok
            # → COUNTED once for supplier 5; the part-2 rows also give q8 its
            # ASIA-customer × PROMO-part chain (supp 6 = NATION_2 numerator)
            (101, 2, 5, 1, 41.0, 30.0, 0.1, 0.0, "R", "F", _D(1997, 6, 2)),
            (101, 3, 1, 2, 5.0, 10.0, 0.0, 0.0, "N", "F", _D(1997, 6, 3)),
            (101, 2, 6, 3, 2.0, 100.0, 0.0, 0.0, "N", "F", _D(1997, 6, 4)),
            (101, 2, 5, 4, 3.0, 50.0, 0.0, 0.0, "N", "F", _D(1997, 6, 5)),
            # q21 order 104 (status F): BOTH suppliers fail → excluded (nfail=2)
            (104, 2, 1, 1, 4.0, 10.0, 0.0, 0.0, "R", "F", _D(1996, 9, 2)),
            (104, 3, 2, 2, 6.0, 10.0, 0.0, 0.0, "R", "F", _D(1996, 9, 3)),
            # q21 order 100 (status F): single supplier per failing flag? order 100
            # has suppliers 1,2,3 with supplier 2 failing → COUNTED too (nsupp=3,
            # nfail=1) — covered above by order 100's rows
            # q17: part 1 (Brand#21) quantities [5, 45]: qsum=50, cnt=2 ⇒
            # qualify iff qty·2·5 < 50 ⇔ qty < 5 — the qty=5 row sits EXACTLY
            # on the bound (excluded), so zero rows qualify
            # shipped OUTSIDE Q1-1997 so q15's quarterly window stays empty
            (105, 1, 5, 1, 5.0, 15.0, 0.0, 0.0, "N", "O", _D(1997, 5, 2)),
            (105, 1, 5, 2, 45.0, 15.0, 0.0, 0.0, "N", "O", _D(1997, 5, 3)),
            # q20: part 2 ('red widget') shipped in 1996 by supplier 5: total
            # qty exactly 40 → excluded; supplier 6 ships 41 → included
            (102, 2, 5, 1, 40.0, 12.0, 0.0, 0.0, "N", "O", _D(1996, 3, 1)),
            (102, 2, 6, 2, 41.0, 12.0, 0.0, 0.0, "N", "O", _D(1996, 3, 2)),
            # q12 boundary: shipped exactly 1998-01-01 (exclusive upper) —
            # must NOT count; and one inside 1997
            (103, 3, 5, 1, 1.0, 5.0, 0.0, 0.0, "N", "O", _D(1998, 1, 1)),
            (103, 3, 5, 2, 1.0, 5.0, 0.0, 0.0, "N", "O", _D(1997, 12, 31)),
            # q21 order 106 (status F): its ONLY supplier fails → excluded by
            # the "exists another supplier" guard (nsupp=1), not by status
            (106, 3, 5, 1, 2.0, 5.0, 0.0, 0.0, "R", "F", _D(1996, 10, 2)),
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp")

    con = duckdb.connect()
    for t in ("region", "nation", "supplier", "part", "customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet/*.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    names = [
        "q2_min_cost_supplier", "q8_market_share", "q9_product_profit",
        "q11_important_stock", "q12_priority_shipping", "q13_cust_order_histogram",
        "q15_top_supplier", "q16_part_supplier_variety", "q17_small_qty_revenue",
        "q18_large_volume_customers", "q20_promo_part_suppliers",
        "q21_waiting_suppliers", "q22_sales_opportunity",
        "q1_pricing_summary", "q6_forecast_revenue", "q14_promo_share",
        "q19_bracket_revenue",
    ]
    results = {}
    for name in names:
        spark.catalog.clearCache()
        sdf = qs[name](spark, str(tmp_path)).toPandas()
        ddf = con.sql(oracles[name]).df()
        msg = compare(name, sdf, ddf)
        assert not msg, f"{name}: {msg}"
        results[name] = sdf

    # ---- semantic pins (oracle-agreement alone can't catch shared bugs) ----
    q2 = results["q2_min_cost_supplier"]
    # both tying EU suppliers at cost 80; the cheaper AFRICA offer ignored
    assert sorted(q2["s_name"]) == ["Supplier#1", "Supplier#2"], q2
    assert set(q2["cost"]) == {80.0}

    assert len(results["q15_top_supplier"]) == 0  # empty window → empty result

    # exact-threshold rows excluded everywhere
    assert results["q17_small_qty_revenue"]["n_items"].iloc[0] == 0
    assert len(results["q18_large_volume_customers"]) == 0  # max order qty < 250
    q20 = results["q20_promo_part_suppliers"]
    assert list(q20["s_suppkey"]) == [6], q20  # 41 in, exactly-40 out

    q21 = results["q21_waiting_suppliers"]
    assert dict(zip(q21["s_name"], q21["numwait"])) == {
        "Supplier#2": 1,  # order 100: three suppliers, only #2 failed
        "Supplier#5": 1,  # order 101: three suppliers, only #5 failed
    }, q21  # order 104 (both failed) and order 106 (lone supplier) excluded

    q22 = results["q22_sales_opportunity"]
    assert list(q22["c_nationkey"]) == [0] and list(q22["numcust"]) == [1], q22

    q13 = dict(zip(results["q13_cust_order_histogram"]["c_count"],
                   results["q13_cust_order_histogram"]["custdist"]))
    assert q13[0] == 1, q13  # customer 4 survives the left join with 0 orders

    q12 = results["q12_priority_shipping"]
    # 7 lineitems ship in 1997 (order 101×4, order 105×2, the 1997-12-31
    # boundary row); the 1998-01-01 row sits on the exclusive upper bound
    assert int(q12["high_line_count"].sum() + q12["low_line_count"].sum()) == 7, q12

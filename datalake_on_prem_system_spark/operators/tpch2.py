"""TPC-H query shapes 2: the subquery / semi-anti-join / scalar-threshold
family (Q2, Q8, Q9, Q11, Q12, Q13, Q15, Q16, Q17, Q18, Q20, Q21, Q22).

Completes the TPC-H surface started in ``tpch.py`` — the reference exposes
the full SQL surface via Trino passthrough (api_poc.py:214-226); these prove
the remaining canonical analytical shapes on Spark SQL. The fixture schema
has no ``partsupp`` table and omits a few columns (l_commitdate, c_phone,
o_comment ...), so each query keeps the ORIGINAL's plan shape — correlated
min, scalar-aggregate threshold, exists/not-exists, left-join histogram,
count-distinct with NOT-IN exclusion — with the missing relations adapted
onto ``lineitem`` (the natural part↔supplier link) and available columns.

Plan-shape notes (verified with .explain()):

- Correlated subqueries become aggregate + re-join, with the aggregate side
  broadcast when bounded by a dim (q2 per-part min over 72 parts, q15
  per-supplier max over 100 suppliers, q17 per-part stats over 2 000 parts).
- Scalar-subquery thresholds (q11, q22) become a 1-row aggregate
  cross-joined in; Spark plans it as BroadcastNestedLoopJoin over a single
  row — constant cost at any fact size.
- EXISTS / NOT EXISTS (q21) become per-group counts instead of self-joins:
  a candidate row survives iff its order has ≥2 suppliers and exactly one
  failing supplier. One shuffle on l_orderkey replaces two skew-prone
  fact×fact semi/anti joins — at 100 TB the per-order group is bounded
  (7 lineitems max in TPC-H), the self-join form is not.
- All money aggregates sum per-row ``decimal(18,4)`` casts (exact,
  order-independent addition — Spark's combine order and DuckDB's agree
  bit-for-bit), then round+cast to double, the ``tpch.py::q7`` pattern.
  Threshold comparisons avoid division entirely (``qty*cnt*5 < sum`` rather
  than ``qty < 0.2*sum/cnt``) so both engines compare exact decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

_DEC = "decimal(18,4)"


def _dec(col: F.Column) -> F.Column:
    return col.cast(_DEC)


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part (correlated-min subquery).

    partsupp adaptation: the observed lineitem offers (l_partkey, l_suppkey,
    l_extendedprice) stand in for partsupp, EUROPE region constrains the
    supplier side. The correlated ``= (SELECT min ...)`` becomes a per-part
    min aggregate broadcast back onto the offers — the min side is bounded
    by |part| regardless of fact size. Equality joins on the raw (copied,
    never recomputed) double, so Spark and DuckDB agree exactly.
    """
    nation = t(spark, sf_dir, "nation")
    eu_supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.filter(F.col("n_regionkey") == 3)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_name")
    )
    offers = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    min_cost = offers.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("l_extendedprice").alias("min_cost")
    )
    return (
        offers.join(
            F.broadcast(min_cost),
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("l_extendedprice") == F.col("min_cost")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("l_extendedprice").alias("cost"),
        )
        .distinct()
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue by year
    (conditional-sum ratio over a 6-way star join; every dim broadcast,
    facts shuffle once on their join keys)."""
    nation = t(spark, sf_dir, "nation")
    asia_cust = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.filter(F.col("n_regionkey") == 2).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    promo_parts = (
        t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem")
    vol = _dec(_rev())
    return (
        li.join(F.broadcast(promo_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(
                        F.lit(0).cast(_DEC)
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year for a part-name
    family. ps_supplycost adaptation: cost = 0.2 × p_retailprice × quantity.
    Profit terms are per-row decimal casts so both engines sum exactly."""
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    gear = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem")
    profit = _dec(_rev()) - _dec(
        F.lit(0.2) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(gear), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value for one nation's suppliers,
    kept when above a scalar-subquery threshold (fraction of the total).

    partsupp adaptation: value = Σ l_extendedprice × l_quantity over that
    nation's lineitems. The scalar total is a 1-row aggregate cross-joined
    in (broadcast — constant cost). The comparison is ``value×10000 > total``
    — exact decimal×integer against exact decimal, no division. (The
    original's fraction scales with 1/SF; 1/10000 keeps the result set
    non-empty across every fixture sf — 0.1 % of total would already
    return nothing at sf0.1's part count.)"""
    supp3 = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 3)
        .select("s_suppkey")
    )
    li = t(spark, sf_dir, "lineitem")
    value = (
        li.join(F.broadcast(supp3), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * F.col("l_quantity"))).alias(
                "value_dec"
            )
        )
    )
    total = value.agg(F.sum("value_dec").alias("total_dec"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") * 10000 > F.col("total_dec"))
        .select(
            "l_partkey",
            F.round("value_dec", 2).cast("double").alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "l_partkey")
    )


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per-class conditional priority counts (l_shipmode
    adaptation: group by l_linestatus for one ship year). Counts only —
    exact in any engine."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q13_cust_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count — LEFT
    OUTER join (zero-order customers must survive) then a second
    aggregation over the counts. o_comment adaptation: exclude one
    priority class instead."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    the scalar-max re-join (the original's view + WHERE total = (SELECT
    max)). Revenue is an exact decimal sum, so the equality re-join is
    bit-exact in both engines."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_dec(_rev())).alias("total_dec"))
    mx = rev.agg(F.max("total_dec").alias("mx"))
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_dec") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_dec", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute bucket,
    with a NOT-IN supplier exclusion (negative-balance suppliers stand in
    for the original's complaint-comment scan). The exclusion is a
    broadcast anti-join; the partsupp stand-in is distinct (part, supp)
    pairs observed in lineitem."""
    ps = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    parts = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#10")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity lineitems of one brand,
    "small" = below 20 % of that part's average quantity (correlated AVG
    subquery → per-part aggregate broadcast back). The threshold compare
    is division-free: qty×cnt×5 < Σqty, all exact decimals."""
    li = t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("gk")).agg(
        F.sum(_dec(F.col("l_quantity"))).alias("qsum"),
        F.count("*").alias("cnt"),
    )
    brand = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#21")
        .select("p_partkey")
    )
    return (
        li.join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(per_part), F.col("l_partkey") == F.col("gk"))
        .filter(_dec(F.col("l_quantity")) * F.col("cnt") * 5 < F.col("qsum"))
        .agg(
            F.round(
                F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.lit(7.0), 2
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind large-volume orders (HAVING on an
    exact decimal sum, semi-shaped re-join to orders/customer, top 100).
    The per-order aggregate runs BEFORE the joins, so only qualifying
    orderkeys (rare) reach the join — at scale the HAVING prunes the
    shuffle, not a post-join filter."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("qty_dec", 2).cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved significant volume of a
    part-name family in one year (ps_availqty adaptation: shipped quantity
    per (supplier, part) above a threshold), restricted to a nation band.
    EXISTS becomes per-pair aggregate → HAVING → distinct → semi-join."""
    red = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    movers = (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("qty_dec"))
        .filter(F.col("qty_dec") > 40)
        .select("l_suppkey")
        .distinct()
    )
    supp = t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 10)
    return (
        supp.join(
            F.broadcast(movers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for a failed
    multi-supplier order (EXISTS other-supplier + NOT EXISTS
    other-failing-supplier; l_receiptdate > l_commitdate adaptation:
    l_returnflag = 'R' marks the failing lineitem).

    Scale note: both EXISTS clauses collapse into a SINGLE per-order
    aggregate — an order contributes iff it has ≥2 distinct suppliers and
    exactly 1 distinct failing supplier, and that sole failing supplier is
    recovered in the same pass as ``max(when(R, suppkey))`` (a max over a
    one-element set). One lineitem scan and one shuffle on l_orderkey with
    bounded groups (≤7 lineitems/order in TPC-H) replace two fact×fact
    semi/anti self-joins."""
    forders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    items = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        # orders is fact-sized: no broadcast hint — AQE picks the strategy
        .join(forders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    fail_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = items.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(fail_supp).alias("nfail"),
        F.max(fail_supp).alias("l_suppkey"),
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.filter((F.col("nsupp") >= 2) & (F.col("nfail") == 1))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: dormant above-average-balance customers per nation
    (scalar AVG subquery + NOT EXISTS anti-join; phone-country adaptation:
    a nation-key set, "no orders" adaptation: no orders since 2000-01-01 —
    the fixture has no order-less customers). The average compare is
    division-free: bal×n > Σbal over the positive-balance pool."""
    pool = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(0, 3, 7, 11, 18))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    pos = pool.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec(F.col("c_acctbal"))).alias("bal_sum"),
        F.count("*").alias("bal_cnt"),
    )
    recent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        pool.crossJoin(F.broadcast(pos))
        .filter(_dec(F.col("c_acctbal")) * F.col("bal_cnt") > F.col("bal_sum"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_dec(F.col("c_acctbal"))), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q12_priority_shipping": q12_priority_shipping,
    "q13_cust_order_histogram": q13_cust_order_histogram,
    "q15_top_supplier": q15_top_supplier,
    "q16_part_supplier_variety": q16_part_supplier_variety,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q20_promo_part_suppliers": q20_promo_part_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_sales_opportunity": q22_sales_opportunity,
}

ORACLE = {
    "q2_min_cost_supplier": """
        SELECT DISTINCT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
               p_partkey, p_name, l_extendedprice AS cost
        FROM part, supplier, lineitem, nation
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND p_type = 'LARGE' AND p_size <= 10
          AND s_nationkey = n_nationkey AND n_regionkey = 3
          AND l_extendedprice = (
              SELECT min(l2.l_extendedprice)
              FROM lineitem l2, supplier s2, nation n2
              WHERE l2.l_partkey = p_partkey AND l2.l_suppkey = s2.s_suppkey
                AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = 3)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q8_market_share": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(
                 CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                               THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
                 4) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type = 'PROMO' AND n1.n_regionkey = 2
        GROUP BY 1 ORDER BY 1
    """,
    "q9_product_profit": """
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(round(sum(
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                 - CAST(CAST(0.2 AS DOUBLE) * p_retailprice * l_quantity AS DECIMAL(18,4))
               ), 2) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
    "q11_important_stock": """
        WITH v AS (
            SELECT l_partkey,
                   sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS value_dec
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            WHERE s_nationkey = 3
            GROUP BY l_partkey)
        SELECT l_partkey, CAST(round(value_dec, 2) AS DOUBLE) AS stock_value
        FROM v
        WHERE value_dec * 10000 > (SELECT sum(value_dec) FROM v)
        ORDER BY stock_value DESC, l_partkey
    """,
    "q12_priority_shipping": """
        SELECT l_linestatus,
               count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))
                   AS high_line_count,
               count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH'))
                   AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    "q13_cust_order_histogram": """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority != '4-NOT SPECIFIED'
              GROUP BY c_custkey)
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                       AS total_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name,
               CAST(round(total_dec, 2) AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_dec = (SELECT max(total_dec) FROM rev)
        ORDER BY s_suppkey
    """,
    "q16_part_supplier_variety": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand != 'Brand#10' AND p_type != 'PROMO'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q17_small_qty_revenue": """
        WITH g AS (
            SELECT l_partkey AS gk,
                   sum(CAST(l_quantity AS DECIMAL(18,4))) AS qsum,
                   count(*) AS cnt
            FROM lineitem GROUP BY l_partkey)
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                     / 7.0, 2) AS avg_yearly,
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN g ON l_partkey = gk
        WHERE p_brand = 'Brand#21'
          AND CAST(l_quantity AS DECIMAL(18,4)) * cnt * 5 < qsum
    """,
    "q18_large_volume_customers": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               CAST(round(qty_dec, 2) AS DOUBLE) AS sum_qty
        FROM (SELECT l_orderkey,
                     sum(CAST(l_quantity AS DECIMAL(18,4))) AS qty_dec
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 250) big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
    """,
    "q20_promo_part_suppliers": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey < 10
          AND s_suppkey IN (
              SELECT l_suppkey
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE 'red %'
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY l_suppkey, l_partkey
              HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 40)
        ORDER BY s_name
    """,
    "q21_waiting_suppliers": """
        SELECT s_name, count(*) AS numwait
        FROM (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
              FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
              WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
                AND EXISTS (SELECT 1 FROM lineitem l2
                            WHERE l2.l_orderkey = l1.l_orderkey
                              AND l2.l_suppkey != l1.l_suppkey)
                AND NOT EXISTS (SELECT 1 FROM lineitem l3
                                WHERE l3.l_orderkey = l1.l_orderkey
                                  AND l3.l_suppkey != l1.l_suppkey
                                  AND l3.l_returnflag = 'R')) w
        JOIN supplier ON w.l_suppkey = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    "q22_sales_opportunity": """
        WITH pool AS (
            SELECT c_custkey, c_nationkey, c_acctbal
            FROM customer WHERE c_nationkey IN (0, 3, 7, 11, 18)),
        pos AS (
            SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) AS bal_sum,
                   count(*) AS bal_cnt
            FROM pool WHERE c_acctbal > 0)
        SELECT c_nationkey, count(*) AS numcust,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS totacctbal
        FROM pool, pos
        WHERE CAST(c_acctbal AS DECIMAL(18,4)) * bal_cnt > bal_sum
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
}

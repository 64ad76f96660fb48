"""Reference-parity relational operators (SURVEY.md §2.3–§2.12).

Each operator re-expresses a query shape the reference generates (cited
``file:line`` into /root/reference) as an idiomatic Spark DataFrame plan over
the driver's fixture tables. Filters/projections are written so Catalyst
pushes them into the parquet scan; joins are left to AQE (small dims get
broadcast automatically, and we hint where we know better).
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import t

# --------------------------------------------------------------------------
# Projections / filters (reference P4–P10: api_poc.py:410-414, lake_cli.py:70-84)
# --------------------------------------------------------------------------


def p4_project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-list projection (P4, lake_cli.py:70-72): SELECT c1,c2 — the
    scan must read only those columns (check ReadSchema)."""
    return t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


def p5_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter (P5, lake_cli.py:76-84): WHERE col = val, pushed to
    parquet."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


def p7_multicol_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column substring search (P7, api_poc.py:410-414): OR-chain of
    CAST(c AS VARCHAR) LIKE '%kw%' over the id column + all string columns."""
    df = t(spark, sf_dir, "customer")
    kw = "le"
    cols = ["c_custkey", "c_name", "c_mktsegment"]
    pred = reduce(or_, [F.lower(F.col(c).cast("string")).contains(kw) for c in cols])
    return df.filter(pred).select("c_custkey", "c_name", "c_mktsegment")


def p8_numeric_id_fastpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-term fast path (P8, api_poc.py:406-408): digit search term ⇒
    pk equality on CAST(id AS VARCHAR)."""
    df = t(spark, sf_dir, "customer")
    return df.filter(F.col("c_custkey").cast("string") == "42").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )


def p9_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list semi filter (P9, api_poc.py:399-402): search-hit ids rejoined
    to the authoritative table."""
    keys = [1, 2, 3, 5, 8, 13, 21, 34]
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isin(keys))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


def p10_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed point lookup (P10, api_poc.py:660-661)."""
    return t(spark, sf_dir, "part").filter(F.col("p_partkey") == 7)


# --------------------------------------------------------------------------
# Sorts / limits (O1–O4: api_poc.py:418, datalake_postman_collection.json:64)
# --------------------------------------------------------------------------


def o1_order_desc_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dashboard page (O1, api_poc.py:418): ORDER BY pk DESC LIMIT 100.
    Spark plans this as TakeOrderedAndProject — a distributed top-k, no
    global sort."""
    return t(spark, sf_dir, "orders").orderBy(F.desc("o_orderkey")).limit(100)


def o4_price_filter_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo query (O4, datalake_postman_collection.json:64):
    WHERE price > 50 ORDER BY price DESC — pk tiebreak added so the top-200
    set is total-ordered/deterministic."""
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_retailprice") > 50)
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(200)
    )


# --------------------------------------------------------------------------
# Aggregations (A1–A3: run_verify.bat:3, lake_shell.py:222)
# --------------------------------------------------------------------------


def a1_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest count-verify (A1, ingest_to_iceberg.py:55-56)."""
    return t(spark, sf_dir, "lineitem").agg(F.count("*").alias("total_records"))


def a2_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden verify query (A2, run_verify.bat:3): count(*) by status.
    Partial (map-side) aggregation makes this shuffle only one row per
    (partition, status)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("total_records"))
    )


def a3_history_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-history shape (A3, lake_shell.py:222): DISTINCT key + COUNT
    GROUP BY ... ORDER BY ... DESC."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("rows_changed"))
        .orderBy(F.desc("rows_changed"), F.asc("event_type"))
    )


def a_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (passthrough SQL surface, S5 api_poc.py:214-226)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 3)
    )


def a_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (S5 SQL surface): order counts, priorities × status columns."""
    pivoted = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))  # count("*") is illegal inside pivot().agg() in Spark 4
    )
    # pivot yields NULL for empty cells; normalize to 0 (COUNT semantics)
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


def a_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (the inverse of a_pivot_status): wide per-line
    charge columns into long (measure, val) rows — `DataFrame.melt`,
    Spark's native unpivot (a generate, no shuffle, no UDF). DuckDB's
    UNPIVOT is the oracle."""
    src = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("extendedprice"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
        )
    )
    # melt KEEPS null measure values where DuckDB's UNPIVOT silently drops
    # them — align on UNPIVOT's drop-nulls rule structurally, not by luck
    # of lineitem's NOT NULL columns
    return src.melt(
        ids=["l_orderkey", "l_linenumber"],
        values=["extendedprice", "discount", "tax"],
        variableColumnName="measure",
        valueColumnName="val",
    ).where(F.col("val").isNotNull())


def a_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate (S5 SQL surface)."""
    return (
        t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def a_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate (completes the grouping-sets family with a_rollup)."""
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


def a_date_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-day aggregate over the event stream (batch analog of a
    Structured Streaming windowed agg — SURVEY §2.12 T6 notes the reference
    has none; this is the scalable shape for it)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# --------------------------------------------------------------------------
# Window functions (W1: cdc_merger_optimized.py:160-161)
# --------------------------------------------------------------------------


def w1_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins dedup (W1): row_number over (partition by key order
    by ts desc) = 1. The exact micro-batch dedup the CDC merger runs."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


def w_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) via gaps-and-islands: lag →
    new-session flag → running sum = session id → per-session aggregate.
    The batch shape of Structured Streaming's session_window; shuffles once
    on user_id and computes both windows over the same partitioning."""
    gap_us = 30 * 60 * 1_000_000
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sessions = (
        ev.withColumn("prev_ts", F.lag("ts_us").over(w))
        .withColumn(
            "new_session",
            (F.col("prev_ts").isNull() | (F.col("ts_us") - F.col("prev_ts") > gap_us)).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


def w_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily-activity streaks — the engagement/retention shape
    (DAU streak badges, habit analysis) and the canonical DATE
    gaps-and-islands: consecutive active days share the constant
    ``day - row_number`` island key, so one per-user window + one island
    aggregate yield active-day count, streak count, and the longest and
    latest streak lengths.

    Determinism: pure date/integer arithmetic (date_sub ↔ day - rn).
    Scale shape: the corpus-sized pass partial-aggregates to (user, day);
    the window partitions per user over at most |days| rows — the same
    per-key bound every sequence op here carries."""
    days = (
        t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island", F.date_sub("day", F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.max("day").alias("streak_end")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
        F.max_by("len", "streak_end").alias("latest_streak"),
    )


def w_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by price (general top-k-per-group; SURVEY §2.7)."""
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        t(spark, sf_dir, "part")
        .withColumn("rank_in_brand", F.row_number().over(w))
        .filter(F.col("rank_in_brand") <= 3)
        .select("p_brand", "rank_in_brand", "p_partkey", "p_name", "p_retailprice")
    )


# --------------------------------------------------------------------------
# Joins / semi / anti / set ops (J1–J2, §2.4, §2.8)
# --------------------------------------------------------------------------


def j_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 order — LEFT SEMI (what Catalyst rewrites the
    reference's IN-subquery shape to)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def j_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders — LEFT ANTI."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op (SURVEY §2.8): nations that have customers but no suppliers."""
    cust_nations = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp_nations = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust_nations.subtract(supp_nations)  # EXCEPT (distinct) semantics


def j2_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff operator (J2, api_poc.py:443-487) as a distributed
    full-outer join instead of the reference's driver-side dict probe.

    Two deterministic "versions" are derived from events:
      parent  = rows with event_id % 10 != 7         (… %10==7 ⇒ NEW later)
      current = rows with event_id % 10 != 3         (… %10==3 ⇒ DELETED)
                with value doubled when event_id % 5 == 0  (⇒ MODIFIED)
    Output: one row per changed key with NEW / MODIFIED / DELETED status and
    the old→new cell values (reference renders per-cell diffs the same way,
    api_poc.py:552-557). Scales: shuffle on the pk only, no driver collect.
    """
    ev = t(spark, sf_dir, "events")
    parent = ev.filter(F.col("event_id") % 10 != 7).select(
        "event_id", F.col("value").alias("old_value"), F.lit(True).alias("in_parent")
    )
    current = ev.filter(F.col("event_id") % 10 != 3).select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.col("value") * 2)
        .otherwise(F.col("value"))
        .alias("new_value"),
        F.lit(True).alias("in_current"),
    )
    joined = current.join(parent, "event_id", "full_outer")
    # classify on explicit presence flags (not value nullability — a NULL
    # value in a matched row must not masquerade as NEW/DELETED), with
    # null-safe inequality for MODIFIED
    return (
        joined.withColumn(
            "status",
            F.when(F.col("in_parent").isNull(), F.lit("NEW"))
            .when(F.col("in_current").isNull(), F.lit("DELETED"))
            .when(~F.col("new_value").eqNullSafe(F.col("old_value")), F.lit("MODIFIED")),
        )
        .filter(F.col("status").isNotNull())
        .select(
            "event_id",
            "status",
            F.round("old_value", 6).alias("old_value"),
            F.round("new_value", 6).alias("new_value"),
        )
    )


def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join — an operator Spark has no native form for (DuckDB does:
    ``ASOF JOIN``, which is the oracle). For every purchase event, the same
    user's most recent click value at-or-before the purchase time.

    Implementation is the scalable union-window form: tag both sides, union,
    one shuffle on the key, and a RANGE-framed ``last(value, ignorenulls)``
    ordered by event time — exactly the ASOF ``p.ts >= c.ts`` semantics
    (the range frame includes same-timestamp rows). No per-row Python, no
    broadcast requirement, no equi-join explosion: cost is one sort-shuffle
    of both sides on the key, identical to a regular window."""
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.unix_micros("ts").alias("ts_us")
    )
    tagged = ev.filter(F.col("event_type").isin("purchase", "click")).withColumn(
        "click_value", F.when(F.col("event_type") == "click", F.col("value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click_value", F.last("click_value", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("purchase_value"),
            F.round("last_click_value", 6).alias("last_click_value"),
        )
    )


def j_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join — for every purchase, count and sum the same
    user's clicks in the preceding hour. A naive theta-join
    (`c.ts BETWEEN p.ts - 1h AND p.ts`) plans as a nested loop at scale;
    the scalable form buckets time into interval-sized bins and equi-joins
    on (user, bucket) for the purchase's bucket and its predecessor — every
    true match lands in one of the two buckets, so the bucketing is exact,
    and the shuffle is an ordinary hash join on (user_id, bucket)."""
    hour_us = 3_600_000_000
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.unix_micros("ts").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts_us").alias("p_ts")
    )
    # exact integer division for bucketing (double division loses ulp
    # precision above 2^53 µs — same rationale as common.py's `div 1000`)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("c_ts"), F.col("value").alias("c_value")
    ).withColumn("bucket", F.expr(f"c_ts div {hour_us}"))
    # each purchase probes its own bucket and the previous one
    probes = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"p_ts div {hour_us}"),
                F.expr(f"p_ts div {hour_us}") - 1,
            )
        ),
    )
    joined = probes.join(clicks, ["user_id", "bucket"]).filter(
        (F.col("c_ts") >= F.col("p_ts") - hour_us) & (F.col("c_ts") <= F.col("p_ts"))
    )
    counts = joined.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_clicks_1h"),
        F.round(F.sum("c_value"), 6).alias("click_value_1h"),
    )
    return (
        purchases.join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_clicks_1h", F.lit(0)).alias("n_clicks_1h"),
            "click_value_1h",
        )
    )


def k3_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed upsert (K3/J1/M5 — Hudi upsert & MERGE INTO semantics,
    ingest_csv_hudi.py:80-99, cdc_merger_optimized.py:176-183) as pure
    DataFrame algebra: result = source ∪ (target ⟕anti source).

    Source is derived deterministically from customer: updated balances for
    keys ≡0 (mod 3) and brand-new synthetic keys. At scale both sides
    shuffle once on the pk; with a small source Catalyst broadcasts the
    anti-join build side.
    """
    cust = t(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    inserts = cust.filter(F.col("c_custkey") % 10 == 1).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.concat(F.lit("new_"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    source = updates.unionByName(inserts)
    target = cust.select(
        "c_custkey", "c_name", "c_nationkey", F.round("c_acctbal", 2).alias("c_acctbal"), "c_mktsegment"
    )
    untouched = target.join(source.select("c_custkey"), "c_custkey", "left_anti")
    return source.unionByName(untouched)


def k5_cdc_merge_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE semantics (K5, cdc_merger_optimized.py:171-183) as a batch
    operator with deterministic inputs derived from events:

      target  = latest event per user before 2024-01-15 → (user_id, event_type, value)
      changes = events on/after 2024-01-15, op = 'd' for 'error' else 'u'

    Apply = last-writer-wins per key (W1 dedup on ts desc), then
      WHEN MATCHED AND op='d'       → DELETE
      WHEN MATCHED                  → UPDATE
      WHEN NOT MATCHED AND op!='d'  → INSERT
    which reduces to: survivors(changes) ∪ (target ⟕anti all-changed-keys).
    """
    ev = t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    target = (
        ev.filter(F.col("ts") < cutoff)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.round("value", 6).alias("value"))
    )
    changes = (
        ev.filter(F.col("ts") >= cutoff)
        .withColumn("op", F.when(F.col("event_type") == "error", "d").otherwise("u"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)  # last-writer-wins within the batch (W1)
    )
    survivors = changes.filter(F.col("op") != "d").select(
        "user_id", "event_type", F.round("value", 6).alias("value")
    )
    untouched = target.join(changes.select("user_id"), "user_id", "left_anti")
    return survivors.unionByName(untouched)


def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1's batch analog: JSON field extraction from the events.props
    payload column (get_json_object — pushdown-friendly, stays JVM) and an
    aggregate over the extracted value."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) per group — the
    analytics surface beyond plain aggregates. At scale the approximate
    sibling is a_hll_distinct / percentile_approx; this exact form
    sort-aggregates within each group."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def a_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier census per market segment — the robust data-QA
    screen every profiling pass runs before modeling (1.5·IQR fences are
    distribution-free, unlike z-scores): exact interpolated quartiles per
    segment, fences, and the count of rows outside each fence.

    Determinism: the exact ``percentile`` interpolation is cross-engine
    stable on this data (the a_percentiles precedent) and both quartiles
    round to 4 before the fence arithmetic, so the fences are identical
    doubles in both engines and every comparison agrees. Scale shape: one
    segment-keyed sort-aggregate for the quartiles (the approximate
    sibling at 100 TB is percentile_approx — same plan shape), then ONE
    broadcast of the 5-row fence table back onto the scan for the census;
    the fact table is read twice, shuffled once."""
    cust = t(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    q = cust.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.25)), 4).alias("q1"),
        F.round(F.percentile("c_acctbal", F.lit(0.75)), 4).alias("q3"),
        F.count(F.lit(1)).alias("n"),
    )
    fences = q.select(
        "c_mktsegment",
        "n",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        cust.join(F.broadcast(fences), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.first("n").alias("n"),
            F.first("q1").alias("q1"),
            F.first("q3").alias("q3"),
            # fences stay UNROUNDED: they are bit-identical doubles in both
            # engines (identical rounded inputs + identical IEEE ops), while
            # a display round can land exactly on a .5 boundary where Spark
            # (BigDecimal HALF_UP on the binary value) and DuckDB disagree
            # by one final-digit ulp — observed at sf0.01
            F.first("lo").alias("lo_fence"),
            F.first("hi").alias("hi_fence"),
            F.sum((F.col("c_acctbal") < F.col("lo")).cast("long")).alias(
                "n_low_outliers"
            ),
            F.sum((F.col("c_acctbal") > F.col("hi")).cast("long")).alias(
                "n_high_outliers"
            ),
        )
        .withColumnRenamed("c_mktsegment", "segment")
        .orderBy("segment")
    )


# 3x the documented relative standard error of a lgConfigK=12 HLL sketch
# (1.04 / sqrt(2^12) ~= 1.6%) -- the P(outside) ~ 1e-3 envelope
_HLL_REL_BOUND = 3 * 1.04 / (2**12) ** 0.5


def a_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch per event_type (Apache DataSketches
    via hll_sketch_agg): the mergeable, fixed-size state that replaces exact
    COUNT(DISTINCT) at 100 TB — partials combine associatively across
    partitions and across time (incremental refresh).

    The estimate itself is engine-specific, so the oracle checks the
    sketch's CONTRACT instead of its value: ``within_bound`` asserts
    |estimate − exact| ≤ max(1, 3σ·exact) Spark-side (σ = 1.04/√2¹² for the
    default lgConfigK=12; floor of 1 covers tiny groups where HLL is
    exact); DuckDB computes the exact counts and emits literal TRUE. A
    broken sketch surfaces as a value-hash mismatch on the boolean — this
    turns the last rows-only operator into a hash-checked one."""
    agg = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(1.0), F.lit(_HLL_REL_BOUND) * F.col("exact_users"))
        ).alias("within_bound"),
    )


def a_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters — the frequency sketch completing
    the classic trio (HLL distinct, KLL/GK quantiles, CMS frequencies).
    The sketch is built DISTRIBUTED (mergeable per-partition partials,
    fixed size eps×confidence regardless of data volume — the 100 TB
    replacement for exact per-key counts) and probed on the driver for
    the exact top-10 customers.

    Same contract-check shape as ``a_hll_distinct``: CMS guarantees
    estimate ∈ [exact, exact + eps·N] with the configured confidence;
    ``within_bound`` asserts it Spark-side, the oracle computes the exact
    counts and emits literal TRUE — a broken sketch hash-mismatches on
    the boolean."""
    orders = t(spark, sf_dir, "orders")
    eps, confidence, seed = 0.001, 0.99, 42
    # distributed build: count_min_sketch is a mergeable SQL aggregate
    # (per-partition partials combine); the driver gets one fixed-size
    # binary blob and probes it via the JVM sketch class
    blob = orders.agg(
        F.expr(
            f"count_min_sketch(o_custkey, cast({eps} as double), "
            f"cast({confidence} as double), {seed})"
        ).alias("s")
    ).collect()[0]["s"]
    sketch = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(blob)
    )
    slack = int(eps * sketch.totalCount()) + 1
    top = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("o_custkey"))
        .limit(10)
        .collect()
    )
    rows = [
        (
            r["o_custkey"],
            r["n_exact"],
            bool(r["n_exact"] <= sketch.estimateCount(r["o_custkey"]) <= r["n_exact"] + slack),
        )
        for r in top
    ]
    return spark.createDataFrame(
        rows, "o_custkey bigint, n_exact bigint, within_bound boolean"
    )


def s5_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: arbitrary user SQL through ``spark.sql`` (api_poc.py:214-226) —
    the full-surface proof: CTE + correlated scalar subquery + window in one
    statement over registered views."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH seg_avg AS (
            SELECT c_mktsegment, avg(o_totalprice) AS seg_avg_price
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment
        )
        SELECT o.o_orderkey, c.c_mktsegment,
               round(o.o_totalprice, 2) AS o_totalprice,
               round(s.seg_avg_price, 2) AS seg_avg_price,
               CAST(rank() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INTEGER) AS price_rank
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN seg_avg s ON s.c_mktsegment = c.c_mktsegment
        WHERE o.o_totalprice > 2 * s.seg_avg_price
        """
    )


def a_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a skewed key (event_type has ~5
    values ⇒ a naive groupBy funnels each key through one reducer at 100 TB).
    Phase 1 pre-aggregates on (key, salt) spreading each hot key over 16
    reducers; phase 2 combines the 16 partials per key. sum/count compose
    exactly (avg derived at the end), so the result is identical to the
    naive plan — the oracle computes it naively."""
    n_salts = 16
    ev = t(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(n_salts))
    )
    partial = ev.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pc"), F.sum("value").alias("ps")
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum("pc").alias("n_events"), F.sum("ps").alias("sv"))
        .select(
            "event_type",
            "n_events",
            F.round("sv", 2).alias("sum_value"),
            F.round(F.col("sv") / F.col("n_events"), 6).alias("avg_value"),
        )
    )


# --------------------------------------------------------------------------
# Scalar function surface (§2.9 + S5 passthrough)
# --------------------------------------------------------------------------


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar functions over orders — the casting surface
    of the reference's get_cast_val + SQL passthrough (api_poc.py:704-726)."""
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.upper("o_orderstatus").alias("status_uc"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("status_prio"),
        # round on DECIMAL, not IEEE double: double rounding of half-way
        # values (e.g. 35355.505) differs between engines
        F.round((F.col("o_totalprice").cast("decimal(18,4)") * F.lit(0.1).cast("decimal(18,4)")).cast("decimal(18,4)"), 2)
        .cast("double")
        .alias("tax_amt"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.ceil("o_totalprice").cast("bigint").alias("price_ceil"),
        F.round(F.abs(F.col("o_totalprice") - 1000.0), 2).alias("abs_diff"),
        F.coalesce(F.col("o_orderpriority"), F.lit("NONE")).alias("prio_coalesced"),
        F.length("o_orderpriority").alias("prio_len"),
    )


QUERIES = {
    "p4_project_columns": p4_project_columns,
    "p5_filter_eq": p5_filter_eq,
    "p7_multicol_like": p7_multicol_like,
    "p8_numeric_id_fastpath": p8_numeric_id_fastpath,
    "p9_in_list": p9_in_list,
    "p10_point_lookup": p10_point_lookup,
    "o1_order_desc_limit": o1_order_desc_limit,
    "o4_price_filter_sort": o4_price_filter_sort,
    "a1_count_star": a1_count_star,
    "a2_groupby_count": a2_groupby_count,
    "a3_history_style": a3_history_style,
    "a_having": a_having,
    "a_pivot_status": a_pivot_status,
    "a_rollup": a_rollup,
    "a_unpivot": a_unpivot,
    "a_cube": a_cube,
    "a_date_window": a_date_window,
    "a_skew_salted": a_skew_salted,
    "a_percentiles": a_percentiles,
    "a_iqr_outliers": a_iqr_outliers,
    "f_json_extract": f_json_extract,
    "a_hll_distinct": a_hll_distinct,  # hash-checked via the within_bound contract
    "a_heavy_hitters": a_heavy_hitters,  # same contract shape (CMS bound)
    "s5_sql_passthrough": s5_sql_passthrough,
    "w1_latest_per_key": w1_latest_per_key,
    "w_sessionize": w_sessionize,
    "w_activity_streaks": w_activity_streaks,
    "w_topk_per_group": w_topk_per_group,
    "j_exists_semi": j_exists_semi,
    "j_anti": j_anti,
    "setop_except": setop_except,
    "j2_snapshot_diff": j2_snapshot_diff,
    "j_asof_join": j_asof_join,
    "j_range_join": j_range_join,
    "k3_upsert_merge": k3_upsert_merge,
    "k5_cdc_merge_batch": k5_cdc_merge_batch,
    "scalar_functions": scalar_functions,
}

ORACLE = {
    "w_activity_streaks": """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ), islands AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (PARTITION BY user_id
                                                 ORDER BY day) AS INTEGER)
                       AS island
            FROM days
        ), streaks AS (
            SELECT user_id, island,
                   CAST(count(*) AS BIGINT) AS len,
                   max(day) AS streak_end
            FROM islands GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(sum(len) AS BIGINT) AS n_active_days,
               CAST(count(*) AS BIGINT) AS n_streaks,
               CAST(max(len) AS BIGINT) AS longest_streak,
               CAST(arg_max(len, streak_end) AS BIGINT) AS latest_streak
        FROM streaks GROUP BY user_id
    """,
    # the sketch estimate is engine-specific; the oracle checks the error
    # CONTRACT: exact counts + literal TRUE vs the Spark-side bound check
    "a_hll_distinct": """
        SELECT event_type,
               count(DISTINCT user_id) AS exact_users,
               true AS within_bound
        FROM events GROUP BY event_type
    """,
    "a_heavy_hitters": """
        SELECT o_custkey, count(*) AS n_exact, true AS within_bound
        FROM orders GROUP BY o_custkey
        ORDER BY n_exact DESC, o_custkey ASC LIMIT 10
    """,
    "p4_project_columns": "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "p5_filter_eq": (
        "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'"
    ),
    "p7_multicol_like": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE lower(CAST(c_custkey AS VARCHAR)) LIKE '%le%'
           OR lower(c_name) LIKE '%le%'
           OR lower(c_mktsegment) LIKE '%le%'
    """,
    "p8_numeric_id_fastpath": """
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
        WHERE CAST(c_custkey AS VARCHAR) = '42'
    """,
    "p9_in_list": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_custkey IN (1, 2, 3, 5, 8, 13, 21, 34)
    """,
    "p10_point_lookup": "SELECT * FROM part WHERE p_partkey = 7",
    "o1_order_desc_limit": "SELECT * FROM orders ORDER BY o_orderkey DESC LIMIT 100",
    "o4_price_filter_sort": """
        SELECT * FROM part WHERE p_retailprice > 50
        ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 200
    """,
    "a1_count_star": "SELECT count(*) AS total_records FROM lineitem",
    "a2_groupby_count": (
        "SELECT o_orderstatus, count(*) AS total_records FROM orders GROUP BY o_orderstatus"
    ),
    "a3_history_style": """
        SELECT event_type, count(*) AS rows_changed FROM events
        GROUP BY event_type ORDER BY rows_changed DESC, event_type ASC
    """,
    "a_having": """
        SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
        FROM orders GROUP BY o_custkey HAVING count(*) >= 3
    """,
    "a_pivot_status": """
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
        FROM orders GROUP BY o_orderpriority
    """,
    "a_unpivot": """
        WITH src AS (
            SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice, 2) AS extendedprice,
                   l_discount AS discount, l_tax AS tax
            FROM lineitem WHERE l_orderkey < 100
        )
        UNPIVOT src ON extendedprice, discount, tax INTO NAME measure VALUE val
    """,
    "a_rollup": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "a_cube": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "a_date_window": """
        SELECT date_trunc('day', ts) AS day, count(*) AS n_events,
               round(sum(value), 2) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1
    """,
    "f_json_extract": """
        SELECT event_type, count(*) AS n,
               min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
               round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k
        FROM events GROUP BY event_type
    """,
    "a_percentiles": """
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus
    """,
    # quartiles rounded to 4 BEFORE the fence arithmetic, so the fences
    # are identical doubles in both engines and every comparison agrees
    "a_iqr_outliers": """
        WITH q AS (
            SELECT c_mktsegment AS segment,
                   CAST(count(*) AS BIGINT) AS n,
                   round(quantile_cont(c_acctbal, 0.25), 4) AS q1,
                   round(quantile_cont(c_acctbal, 0.75), 4) AS q3
            FROM customer GROUP BY 1
        ), f AS (
            SELECT *, q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
            FROM q
        )
        SELECT f.segment, f.n, f.q1, f.q3,
               f.lo AS lo_fence, f.hi AS hi_fence,
               CAST(sum(CASE WHEN c.c_acctbal < f.lo THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_low_outliers,
               CAST(sum(CASE WHEN c.c_acctbal > f.hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_high_outliers
        FROM f JOIN customer c ON c.c_mktsegment = f.segment
        GROUP BY 1, 2, 3, 4, 5, 6
        ORDER BY f.segment
    """,
    "s5_sql_passthrough": """
        WITH seg_avg AS (
            SELECT c_mktsegment, avg(o_totalprice) AS seg_avg_price
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment
        )
        SELECT o.o_orderkey, c.c_mktsegment,
               round(o.o_totalprice, 2) AS o_totalprice,
               round(s.seg_avg_price, 2) AS seg_avg_price,
               CAST(rank() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INTEGER) AS price_rank
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN seg_avg s ON s.c_mktsegment = c.c_mktsegment
        WHERE o.o_totalprice > 2 * s.seg_avg_price
    """,
    "a_skew_salted": """
        SELECT event_type, count(*) AS n_events,
               round(sum(value), 2) AS sum_value,
               round(sum(value) / count(*), 6) AS avg_value
        FROM events GROUP BY event_type
    """,
    "w1_latest_per_key": """
        SELECT user_id, event_id, event_type, value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1
    """,
    "w_sessionize": """
        WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), numbered AS (
            SELECT *, CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
               round(sum(value), 2) AS session_value
        FROM numbered GROUP BY user_id, session_id
    """,
    "w_topk_per_group": """
        SELECT p_brand, rank_in_brand, p_partkey, p_name, p_retailprice FROM (
            SELECT *, row_number() OVER (
                PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC
            ) AS rank_in_brand FROM part) WHERE rank_in_brand <= 3
    """,
    "j_exists_semi": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "j_anti": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "setop_except": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "j2_snapshot_diff": """
        WITH parent AS (
            SELECT event_id, value AS old_value FROM events WHERE event_id % 10 != 7
        ), current AS (
            SELECT event_id,
                   CASE WHEN event_id % 5 = 0 THEN value * 2 ELSE value END AS new_value
            FROM events WHERE event_id % 10 != 3
        )
        SELECT COALESCE(c.event_id, p.event_id) AS event_id,
               CASE WHEN p.event_id IS NULL THEN 'NEW'
                    WHEN c.event_id IS NULL THEN 'DELETED'
                    ELSE 'MODIFIED' END AS status,
               round(p.old_value, 6) AS old_value,
               round(c.new_value, 6) AS new_value
        FROM current c FULL OUTER JOIN parent p USING (event_id)
        WHERE p.event_id IS NULL OR c.event_id IS NULL
           OR c.new_value IS DISTINCT FROM p.old_value
    """,
    "j_asof_join": """
        WITH purchases AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ), clicks AS (
            SELECT user_id, ts, value AS click_value FROM events
            WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id,
               round(p.value, 6) AS purchase_value,
               round(c.click_value, 6) AS last_click_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "j_range_join": """
        WITH purchases AS (
            SELECT event_id, user_id, epoch_us(ts) AS p_ts FROM events
            WHERE event_type = 'purchase'
        ), clicks AS (
            SELECT user_id, epoch_us(ts) AS c_ts, value AS c_value FROM events
            WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id,
               count(c.user_id) AS n_clicks_1h,
               round(sum(c.c_value), 6) AS click_value_1h
        FROM purchases p
        LEFT JOIN clicks c
          ON p.user_id = c.user_id
         AND c.c_ts >= p.p_ts - 3600000000
         AND c.c_ts <= p.p_ts
        GROUP BY p.event_id, p.user_id
    """,
    "k3_upsert_merge": """
        WITH source AS (
            SELECT c_custkey, c_name, c_nationkey,
                   round(c_acctbal + 100.0, 2) AS c_acctbal, c_mktsegment
            FROM customer WHERE c_custkey % 3 = 0
            UNION ALL
            SELECT c_custkey + 1000000, 'new_' || c_name, c_nationkey,
                   round(c_acctbal, 2), c_mktsegment
            FROM customer WHERE c_custkey % 10 = 1
        )
        SELECT * FROM source
        UNION ALL
        SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2), c_mktsegment
        FROM customer t
        WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.c_custkey = t.c_custkey)
    """,
    "k5_cdc_merge_batch": """
        WITH ranked_before AS (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '2024-01-15'
        ), target AS (
            SELECT user_id, event_type, round(value, 6) AS value
            FROM ranked_before WHERE rn = 1
        ), ranked_changes AS (
            SELECT *, CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '2024-01-15'
        ), changes AS (
            SELECT * FROM ranked_changes WHERE rn = 1
        )
        SELECT user_id, event_type, round(value, 6) AS value
        FROM changes WHERE op != 'd'
        UNION ALL
        SELECT t.user_id, t.event_type, t.value FROM target t
        WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.user_id = t.user_id)
    """,
    "scalar_functions": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(month(o_orderdate) AS INTEGER) AS o_month,
               upper(o_orderstatus) AS status_uc,
               substring(o_orderpriority, 1, 1) AS prio_code,
               o_orderstatus || '-' || o_orderpriority AS status_prio,
               CAST(round(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(0.1 AS DECIMAL(18,4)) AS DECIMAL(18,4)), 2) AS DOUBLE) AS tax_amt,
               CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
               CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
               round(abs(o_totalprice - 1000.0), 2) AS abs_diff,
               COALESCE(o_orderpriority, 'NONE') AS prio_coalesced,
               CAST(length(o_orderpriority) AS INTEGER) AS prio_len
        FROM orders
    """,
}

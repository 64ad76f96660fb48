"""Window-analytic operators (SURVEY §2.6 beyond-reference breadth): the
canonical SQL-analytics window shapes a reference user reaches through the
Trino passthrough (api_poc.py:214-226) — running totals, lag deltas, moving
averages, distribution ranks, first/last per partition — plus the
approx-quantile sketch, the order-statistics sibling of ``a_hll_distinct``.

Scale design: every window here partitions by a bounded-cardinality key
(customer, user, segment) — ONE shuffle on the partition key, then
per-partition sorted evaluation; no global sort, no driver materialization.
State per key is O(frame) (constant for ROWS frames, one row for lag).
Skewed or single-key GLOBAL running totals need the range-partition +
per-partition-offset form instead (``textops.py::tx_quality_bins`` shows
that pattern) — a window with one giant partition serializes.

Determinism contract shared with the DuckDB oracles: every ORDER BY inside
a window carries a unique tiebreak column, frames are explicit ROWS (the
SQL default RANGE frame is tie-sensitive), and money sums go through
per-row ``decimal`` casts so both engines add exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import t, t_par

_DEC = "decimal(18,4)"


def w_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative customer spend over order history (SUM OVER ROWS
    UNBOUNDED PRECEDING — the running-total shape)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast(_DEC)).over(w), 2)
        .cast("double")
        .alias("running_spend"),
    )


def w_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value change between consecutive events (LAG — the
    event-delta shape; first event per user yields NULL)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    )


def w_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 3-event moving average (ROWS 2 PRECEDING frame). The frame
    sum is an exact decimal, divided once as double — both engines compute
    the identical value."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("mavg"),
    )


def w_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EXACT rolling median over the trailing 7-event frame —
    the robust partner of ``w_moving_avg`` (one outlier event cannot drag
    the window like it drags the mean): the frame collects as a sorted
    integer-cent array and both middle elements are picked by INTEGER
    division, so odd frames take the middle and even frames the exact
    midpoint average — no engine median() semantics in play (DuckDB's
    interpolation and Spark's approx paths never run; both engines
    compute the identical explicit expression).

    Exactness: cents are integers, indexes are `div` arithmetic, ONE
    (a+b)/2 double at the end, round 6. Scale shape: the frame is a
    ROWS-bounded user-partitioned window (k=7 values per row — constant
    state), identical distribution cost to any windowed aggregate."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    fr = F.sort_array(
        F.collect_list(F.floor(F.col("value") * 100).cast("long")).over(w)
    )
    return (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", fr.alias("fr"))
        .select(
            "event_id",
            "user_id",
            F.round(
                (
                    F.get("fr", F.expr("(size(fr) - 1) div 2").cast("int"))
                    + F.get("fr", F.expr("size(fr) div 2").cast("int"))
                )
                / 2.0
                / 100.0,
                6,
            ).alias("rmed"),
        )
    )


def w_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer balance distribution within market segment: PERCENT_RANK
    (integer-ratio — deterministic) + NTILE(4) over a totally-ordered
    window."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.ntile(4).over(w).alias("quartile"),
    )


def w_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First and last event value per user (FIRST_VALUE/LAST_VALUE over the
    full-partition ROWS frame, collapsed to one row per user). Values are
    copied, never recomputed — exact in both engines."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.first("value").over(w).alias("first_val"),
            F.last("value").over(w).alias("last_val"),
        )
        .distinct()
    )


def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per-user rolling 1-hour event count
    and sum — the frame is defined by the ORDER-BY VALUE (microseconds),
    not a row count, so it handles irregular event spacing correctly
    (ROWS frames cannot). Spark range frames need a numeric order column:
    ``unix_micros(ts)`` with a ±3.6e9 µs bound ≡ DuckDB's
    ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW``."""
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-hour_us, 0)
    )
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w), 4
        )
        .cast("double")
        .alias("sum_last_hour"),
    )


def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with an arbitrary (non-prefix, non-lattice) set list —
    ((status, priority), (priority), ()) — the shape neither ROLLUP
    (`relational.a_rollup`) nor CUBE (`relational.a_cube`) expresses.
    `grouping_id()` disambiguates NULL-as-subtotal from NULL data. One
    pass over the fact with map-side partial aggregation, exactly like a
    plain GROUP BY — the sets expand in the aggregate, not as re-scans."""
    return (
        t(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_price"),
        )
    )


def f_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column — the
    vector-math surface done entirely JVM-side (no UDF): filter, exists,
    array_max, and sequential ``aggregate`` folds (L1, squared-L2).

    Oracle parity: Spark ``F.aggregate`` is a LEFT sequential fold, matched
    by DuckDB ``list_reduce`` (also a left fold) — NOT ``list_sum``, whose
    summation order is unspecified. Elements are cast to double up front on
    both sides so the folds run in the same precision. Empty arrays are
    total on both sides: Spark's fold returns its 0.0 init; the oracle
    guards ``list_reduce`` (which ERRORS on empty lists) with a CASE."""
    e = F.transform("embedding", lambda x: x.cast("double"))
    return t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.round(F.aggregate(e, F.lit(0.0), lambda a, x: a + F.abs(x)), 4).alias("l1"),
        F.round(F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x), 4).alias("l2_sq"),
        F.round(F.array_max(e), 6).alias("max_dim"),
        F.exists(e, lambda x: x > 0.9).alias("has_big"),
    )


def a_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate median per event_type via Spark's approx_percentile
    (Greenwald-Khanna sketch: mergeable, bounded-memory order statistics —
    the 100 TB replacement for exact sort-based percentiles).

    Like ``a_hll_distinct``, the estimate is engine-specific, so the oracle
    checks the sketch's CONTRACT — and in RANK space, not value space: the
    sketch guarantees rank error ≤ max(1, n/10000), so the returned value's
    rank must fall in a ±5 % rank window around the median (500× the
    guarantee). Interpolated-percentile value bounds would be WRONG for
    discrete distributions (the exact p45/p55 can interpolate strictly
    between data points while the sketch returns an actual data point — a
    real failure the edge-events fixture catches). ``within_bound``
    therefore re-joins the estimate and asserts its tie run
    [#(< p50)+1, #(≤ p50)] intersects [⌊0.45n⌋, ⌈0.55n⌉]; DuckDB recomputes
    the exact group size and emits literal TRUE."""
    ev = t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50"),
        F.count(F.lit(1)).alias("n_exact"),
    )
    ranked = (
        ev.join(F.broadcast(agg), "event_type")
        .groupBy("event_type", "n_exact", "p50")
        .agg(
            F.count(F.when(F.col("value") < F.col("p50"), 1)).alias("rank_lt"),
            F.count(F.when(F.col("value") <= F.col("p50"), 1)).alias("rank_le"),
        )
    )
    lo = F.greatest(F.lit(1), F.floor(F.lit(0.45) * F.col("n_exact")))
    hi = F.ceil(F.lit(0.55) * F.col("n_exact"))
    return ranked.select(
        "event_type",
        "n_exact",
        ((F.col("rank_le") >= lo) & (F.col("rank_lt") + 1 <= hi)).alias(
            "within_bound"
        ),
    )


def w_gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap filling (the hypertable/`time_bucket`
    rollup shape): per user, average events into hourly buckets, DENSIFY to
    every hour between the user's first and last bucket, and forward-fill
    the gaps with the last observed value.

    Scale: bucket aggregation is one shuffle with map-side combine; the
    dense hour spine is generated per user with ``sequence`` + ``explode``
    (bounded by the time range, never by event count); the forward fill is
    a per-user window, so state per partition is one row. The bucket
    average is an exact decimal sum divided once as double — identical in
    both engines."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket"), "value"
    )
    agg = ev.groupBy("user_id", "bucket").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("bval")
    )
    spine = (
        agg.groupBy("user_id")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(agg, ["user_id", "bucket"], "left_outer")
        .select(
            "user_id",
            "bucket",
            F.last("bval", ignorenulls=True).over(w).alias("val"),
            F.col("bval").isNull().alias("is_gap"),
        )
    )


def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream (view → click →
    purchase): a user completes step k only with an event of step k's type
    STRICTLY AFTER their step-(k-1) completion time. The classic product-
    analytics operator (Amplitude/Mixpanel funnels; Snowplow does it with
    N self-joins).

    Scale shape: ONE shuffle — events grouped by user (step events
    collected, every user counted for the denominator), per-user
    time-sorted array folded through a (stage, t) state struct with a
    native HOF (``F.aggregate``: whole-stage-codegen, no Python).
    Per-user state is O(step-events-of-user) for the sorted array — the
    same bound any per-user sessionization carries — and the final count
    is a partial-aggregated global sum with no join (the plan sweep
    rejects even a single-row cross join). The N-self-join formulation
    (the oracle's) shuffles N times; this shuffles once."""
    steps = ["view", "click", "purchase"]
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    # collect only funnel-step events, but group ALL users — a user with no
    # step events folds an empty array to stage 0 and still counts in the
    # denominator, so no second scan / single-row join is ever needed
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("event_type").isin(steps),
                    F.struct("ts_us", "event_type"),
                )
            )
        ).alias("evs")
    )
    init = F.struct(F.lit(0).alias("stage"), F.lit(None).cast("long").alias("t"))

    def advance(acc, e):
        def step_hit(k):
            cond = (acc["stage"] == k - 1) & (e["event_type"] == F.lit(steps[k - 1]))
            if k > 1:
                cond = cond & (e["ts_us"] > acc["t"])
            return cond

        out = acc
        for k in (3, 2, 1):  # when-chains evaluate top-down; build bottom-up
            out = F.when(
                step_hit(k),
                F.struct(F.lit(k).alias("stage"), e["ts_us"].alias("t")),
            ).otherwise(out)
        return out

    staged = per_user.select(F.aggregate("evs", init, advance)["stage"].alias("stage"))
    return funnel_rollup(staged)


def funnel_rollup(staged: DataFrame) -> DataFrame:
    """(total_users, step1..step3_users) from a per-user ``stage`` frame —
    shared by the batch fold and the streaming state-store funnel so the
    two tiers pinned to the same oracle can never drift apart."""
    return staged.agg(
        F.count(F.lit(1)).alias("total_users"),
        *[
            F.sum((F.col("stage") >= k).cast("long")).alias(f"step{k}_users")
            for k in (1, 2, 3)
        ],
    )


def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by the ISO week of their
    first event; a cell (cohort_week, week_offset) counts distinct cohort
    members active that many weeks later — the triangle every growth
    dashboard draws.

    Scale shape: first-touch is one user-keyed aggregation; the cohort
    join re-uses the same user_id hash partitioning (co-partitioned, and
    the first-touch side broadcasts when small); the cell rollup is a
    partial-aggregated distinct over (cohort, offset, user). No windows,
    no driver materialization."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("wk")
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.col("cohort").cast("string").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


def ev_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream: for
    every (prev_type → next_type) pair of CONSECUTIVE events of one user
    (time order, event_id tiebreak), the transition count and probability
    P(next | prev) = n / Σ_next' n — the product-analytics path model
    behind Sankey/flow dashboards.

    Scale shape: one user-keyed window (lag) — the same single shuffle any
    per-user sequence op pays — then a partial-aggregated groupBy on the
    (prev, next) pair (bounded by |event-type|²). The probability divides
    two exact integers, so both engines agree bit-for-bit."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("prev_type"), "next_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    w_prev = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_trans",
        (F.col("n_trans") / F.sum("n_trans").over(w_prev)).alias("p"),
    )


def w_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average of event values (α = 0.2) —
    the recursive smoother SQL windows cannot express (each output depends
    on the previous output, not a frame of inputs). Implemented as the
    ev_funnel shape: ONE user-keyed shuffle, per-user time-sorted array,
    native-HOF fold. Each step rounds to 6 decimals, so the recursion is
    bit-stable and the DuckDB oracle replays it exactly with list_reduce
    over the identically-ordered list."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "value"
    )
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts_us", "event_id", "value"))).alias("evs"),
        F.count(F.lit(1)).alias("n_events"),
    )
    step = lambda acc, e: F.when(  # noqa: E731 — fold kernel reads best inline
        acc.isNull(), F.round(e["value"], 6)
    ).otherwise(F.round(F.lit(0.2) * e["value"] + F.lit(0.8) * acc, 6))
    return per_user.select(
        "user_id",
        "n_events",
        F.aggregate("evs", F.lit(None).cast("double"), step).alias("ema"),
    )


def ev_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection via Population Stability Index: split
    the event stream at the midpoint of its time range (integer-µs
    midpoint — exact in both engines), bin each event_type's ``value``
    into 10 equal-width bins over the REFERENCE (first-half) window's
    [min, max] with edge clamping, and emit the per-bin PSI contribution
    ((p−q)·ln(p/q), add-one smoothed so empty bins stay finite). Σ psi_term
    per type > 0.2 is the conventional "investigate" threshold — the check
    a training pipeline runs between ingest batches before trusting new
    data.

    Determinism contract: the time split and bin assignment are pure
    integer / single-IEEE-op arithmetic on identical inputs (exactly-
    rounded per IEEE 754 in both engines); only ln() is implementation-
    defined, so psi_term is rounded to 6 (the tx_lm_score rule).

    Scale shape: two O(1)-row scalar aggs (time span; per-type ref
    min/max, vocabulary-bounded) broadcast back into a single per-row
    binning pass; counts partial-aggregate on (type, bin, side) — shuffle
    volume bounded by vocab × 10 × 2 × partitions, not event count. The
    bin scaffold join (type × 10 rows) is broadcast."""
    ev = t(spark, sf_dir, "events").select("event_type", "ts", "value")
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    tagged = ev.crossJoin(F.broadcast(span)).withColumn(
        "is_ref",
        F.unix_micros("ts") < F.col("t0") + (F.col("t1") - F.col("t0")) / 2,
    )
    ref_stats = (
        tagged.filter("is_ref")
        .groupBy("event_type")
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    )
    width = (F.col("vmax") - F.col("vmin")) / F.lit(10.0)
    binned = (
        tagged.join(F.broadcast(ref_stats), "event_type")
        .withColumn(
            "bin",
            F.when(F.col("vmax") == F.col("vmin"), F.lit(0)).otherwise(
                F.least(
                    F.lit(9),
                    F.greatest(
                        F.lit(0),
                        F.floor((F.col("value") - F.col("vmin")) / width).cast(
                            "int"
                        ),
                    ),
                )
            ),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
        )
    )
    scaffold = ref_stats.select(
        "event_type", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin")
    )
    filled = (
        scaffold.join(binned, ["event_type", "bin"], "left_outer")
        .fillna(0, ["n_ref", "n_cur"])
        # NOT named "N_ref": Spark's case-insensitive resolution would make
        # withColumn("N_ref", ...) silently REPLACE the per-bin "n_ref"
        .withColumn("tot_ref", F.sum("n_ref").over(Window.partitionBy("event_type")))
        .withColumn("tot_cur", F.sum("n_cur").over(Window.partitionBy("event_type")))
    )
    p = (F.col("n_ref") + 1.0) / (F.col("tot_ref") + 10.0)
    q = (F.col("n_cur") + 1.0) / (F.col("tot_cur") + 10.0)
    return filled.select(
        "event_type",
        "bin",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(p, 6).alias("p_ref"),
        F.round(q, 6).alias("p_cur"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )


_TOUCH_CHANNELS = ("view", "click", "signup")
_ATTR_LOOKBACK_US = 7 * 86_400 * 1_000_000  # 7-day attribution window


def ev_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every ``purchase`` event is
    credited to the user's most recent PRIOR touch event (view / click /
    signup) within a 7-day lookback; purchases with no in-window touch are
    'direct'. The operator every growth/ads pipeline runs nightly
    (GA4 / Adjust last-click models).

    Scale shape: ONE user-keyed shuffle — the touch lookup is
    ``last(..., ignorenulls)`` over a strictly-prior ROWS frame on the
    (ts, event_id)-ordered per-user stream, so touches and conversions
    never join (the naive formulation is a time-range self-join); the
    rollup is a partial-aggregated groupBy on the channel (vocabulary-
    bounded). Revenue sums integer cents (floor(value·100) — one
    exactly-rounded IEEE multiply then floor, identical in both engines),
    so the aggregate is order-independent and exact."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    prior = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*_TOUCH_CHANNELS)
    tagged = ev.withColumn(
        "touch_ts", F.last(F.when(is_touch, F.col("ts_us")), ignorenulls=True).over(prior)
    ).withColumn(
        "touch_ch",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(prior),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .withColumn(
            "channel",
            F.coalesce(
                F.when(
                    F.col("touch_ts") >= F.col("ts_us") - _ATTR_LOOKBACK_US,
                    F.col("touch_ch"),
                ),
                F.lit("direct"),
            ),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )


def ev_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly peak-concurrency curve: how many user sessions (w_sessionize's
    30-min-gap sessions) are open simultaneously, at peak, in each hour —
    the capacity-planning sweep-line every serving/infra dashboard needs.

    Sweep-line with a DISTRIBUTED two-level prefix sum (no global window
    over the event stream): sessions become ±1 deltas (+1 at start, −1 at
    end-exclusive = last event + 1 µs, so zero-length sessions still
    count at their instant); deltas are summed LOCALLY per hour bucket
    (window partitioned by hour, deterministic (ts, delta, user) order —
    −1 before +1 at an identical instant gives half-open [start, end)
    semantics); each hour's carried-in level is the cumulative sum of the
    per-hour delta totals — a window over the HOUR-TOTALS frame, which is
    one row per active hour (metadata-sized: 8.8k rows for a year of
    hours), not over the data. Peak(hour) = carry-in + max(local running).
    Hours with no session boundary are absent (the level is flat there)."""
    gap_us = 30 * 60 * 1_000_000
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w_user = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sessions = (
        ev.withColumn("prev_ts", F.lag("ts_us").over(w_user))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull() | (F.col("ts_us") - F.col("prev_ts") > gap_us)
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(w_user))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").alias("start_us"),
            (F.max("ts_us") + 1).alias("end_us"),
        )
    )
    # one ±1 delta pair per session via explode — NOT a unionAll of two
    # selects over `sessions`, which would recompute the sessionization
    # window twice (Catalyst shares nothing across union branches)
    deltas = sessions.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(F.col("start_us").alias("ts_us"), F.lit(1).alias("delta")),
                F.struct(F.col("end_us").alias("ts_us"), F.lit(-1).alias("delta")),
            )
        ).alias("d"),
    ).select(F.col("d.ts_us").alias("ts_us"), F.col("d.delta").alias("delta"), "user_id")
    hour_us = 3_600 * 1_000_000
    deltas = deltas.withColumn("hr_us", (F.col("ts_us") - F.col("ts_us") % hour_us))
    w_local = (
        Window.partitionBy("hr_us")
        .orderBy("ts_us", "delta", "user_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = deltas.withColumn("run_local", F.sum("delta").over(w_local))
    per_hour = local.groupBy("hr_us").agg(
        F.max("run_local").alias("peak_local"),
        F.sum("delta").alias("hr_total"),
    )
    # carry-in level: cumulative sum over the tiny hour-totals frame
    w_hours = (
        Window.orderBy("hr_us").rowsBetween(Window.unboundedPreceding, -1)
    )
    return per_hour.select(
        F.timestamp_micros(F.col("hr_us")).alias("hour"),
        (
            F.coalesce(F.sum("hr_total").over(w_hours), F.lit(0))
            # the carried-in level itself is a peak candidate: an hour whose
            # only deltas are session ENDS peaks at its start, before any
            # delta fires (max(carry, carry + running) = carry + max(0, run))
            + F.greatest(F.lit(0), F.col("peak_local"))
        )
        .cast("long")
        .alias("peak_sessions"),
    )


def mad_baseline(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared robust baseline for the batch and streaming anomaly tiers:
    returns (dev, med, mad) where ``dev`` carries every event's integer
    dev2 against its type's med2, ``med`` the per-type med2, and ``mad``
    the per-type mad4 — all in the all-integer framing ``ev_anomaly_mad``
    documents. Both tiers consume THESE frames (the streaming tier joins
    the returned ``med`` rather than re-deriving it), so a change to the
    median definition can never split the tiers."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("c")
    )
    med = ev.groupBy("event_type").agg(
        (F.percentile("c", 0.5) * 2).cast("long").alias("med2")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev2", F.abs(2 * F.col("c") - F.col("med2"))
    )
    mad = dev.groupBy("event_type").agg(
        (F.percentile("dev2", 0.5) * 2).cast("long").alias("mad4")
    )
    return dev, med, mad


def ev_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type anomaly detection: flag events whose value deviates
    from the type median by more than 3 robust standard deviations
    (3 × 1.4826 × MAD) — the median/MAD detector every telemetry pipeline
    prefers over mean/stddev because one huge outlier cannot drag its own
    threshold.

    Exactness contract: Spark and DuckDB interpolate percentiles with
    DIFFERENT floating expressions ((1-f)·lo + f·hi vs lo + f·(hi-lo)),
    so medians of doubles can differ in the last ulp and flip boundary
    flags. Everything here is therefore INTEGER: values quantize to
    cents, med2 = 2·median(cents) and mad4 = 2·median(2·|c - med|) are
    exact integers in both engines (a half-integer median doubles to an
    exact int), and the outlier test 20000·dev2 > 44478·mad4 is pure
    integer arithmetic — the 3·1.4826 factor as the rational 44478/10000.

    Scale shape: two vocabulary-keyed exact-median aggregations + two
    broadcast joins back (per-type constants). Exact percentile sorts
    per type; at 100 TB swap in approx_percentile (the a_approx_quantiles
    sketch contract) — the integer framing survives unchanged."""
    dev, _med, mad = mad_baseline(spark, sf_dir)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.first("med2") / 200.0, 6).alias("median_value"),
            F.round(F.first("mad4") / 400.0, 6).alias("mad"),
            F.sum(
                (20000 * F.col("dev2") > 44478 * F.col("mad4")).cast("long")
            ).alias("n_outliers"),
        )
    )


def ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend exponential smoothing per event_type over the
    daily mean-value series (α=0.2, β=0.1), forecasting 1 and 7 days out —
    the classic capacity/targets forecaster, and like ``w_ema`` a RECURSIVE
    smoother no SQL window expresses (state depends on prior OUTPUT).

    Determinism: the daily input series is exact-integer derived
    (mean = cents_sum / (100·n), one double division) and every recursion
    step rounds level and trend to 6 decimals (the w_ema bit-stability
    rule), so DuckDB's struct-accumulator ``list_reduce`` replays the fold
    exactly. Init: level = first day's value, trend = 0.

    Scale shape: the daily rollup partial-aggregates to |types|·|days|
    rows; the fold runs per type over that vocabulary-bounded series —
    per-key state is O(days), the same bound as any per-key sequence op."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("c"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.round(F.sum("c") / (100.0 * F.count(F.lit(1))), 6).alias("y")
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("days"),
        F.count(F.lit(1)).alias("n_days"),
    )
    init = F.struct(
        F.lit(None).cast("double").alias("l"), F.lit(0.0).alias("b")
    )

    def step(acc, e):
        lvl = F.round(F.lit(0.2) * e["y"] + F.lit(0.8) * (acc["l"] + acc["b"]), 6)
        trd = F.round(F.lit(0.1) * (lvl - acc["l"]) + F.lit(0.9) * acc["b"], 6)
        return F.when(
            acc["l"].isNull(),
            F.struct(e["y"].alias("l"), F.lit(0.0).alias("b")),
        ).otherwise(F.struct(lvl.alias("l"), trd.alias("b")))

    fitted = series.select(
        "event_type", "n_days", F.aggregate("days", init, step).alias("st")
    )
    return fitted.select(
        "event_type",
        "n_days",
        F.col("st.l").alias("level"),
        F.col("st.b").alias("trend"),
        F.round(F.col("st.l") + F.col("st.b"), 6).alias("forecast_1d"),
        F.round(F.col("st.l") + 7 * F.col("st.b"), 6).alias("forecast_7d"),
    )


_HW_M = 7  # weekly additive seasonality


def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing per event_type over the
    daily mean-value series (α=0.2, β=0.1, γ=0.3, m=7) — the seasonal
    completion of ``ts_holt_forecast`` (one recursion family, rounded
    per step): level and trend as before, plus a 7-slot seasonal state
    updated at slot (t−1) mod 7, forecasting 1 and 7 days out with the
    matching seasonal added back. Init: l=y₁, b=0, all seasonals 0 (the
    smoother earns its seasonals — deterministic, no back-fitted
    warmup).

    Determinism: the w_ema/Holt bit-stability rule — every l/b/s update
    rounds to 6dp, so DuckDB's recursive CTE (seasonal state as 7
    columns, slot dispatch by CASE) replays the array fold exactly.

    Scale shape: one |types|·|days| rollup; the fold is per type over a
    calendar-bounded series with O(m) state."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("c"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.round(F.sum("c") / (100.0 * F.count(F.lit(1))), 6).alias("y")
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("days"),
        F.count(F.lit(1)).alias("n_days"),
    )
    init = F.struct(
        F.lit(None).cast("double").alias("l"),
        F.lit(0.0).alias("b"),
        F.array_repeat(F.lit(0.0), _HW_M).alias("s"),
        F.lit(0).alias("k"),
    )

    def step(acc, e):
        slot = acc["k"] % _HW_M  # updating t = k+1 ⇒ slot (t-1) mod m
        sprev = F.get(acc["s"], slot)
        lvl = F.round(
            F.lit(0.2) * (e["y"] - sprev)
            + F.lit(0.8) * (acc["l"] + acc["b"]),
            6,
        )
        trd = F.round(F.lit(0.1) * (lvl - acc["l"]) + F.lit(0.9) * acc["b"], 6)
        snew = F.round(F.lit(0.3) * (e["y"] - lvl) + F.lit(0.7) * sprev, 6)
        supd = F.transform(
            acc["s"],
            lambda x, i: F.when(i == slot, snew).otherwise(x),
        )
        return F.when(
            acc["l"].isNull(),
            F.struct(
                e["y"].alias("l"),
                F.lit(0.0).alias("b"),
                acc["s"].alias("s"),
                F.lit(1).alias("k"),
            ),
        ).otherwise(
            F.struct(
                lvl.alias("l"),
                trd.alias("b"),
                supd.alias("s"),
                (acc["k"] + 1).alias("k"),
            )
        )

    fitted = series.select(
        "event_type", "n_days", F.aggregate("days", init, step).alias("st")
    )
    return fitted.select(
        "event_type",
        "n_days",
        F.col("st.l").alias("level"),
        F.col("st.b").alias("trend"),
        F.get(F.col("st.s"), F.col("n_days") % _HW_M).alias("seasonal_next"),
        F.round(
            F.col("st.l")
            + F.col("st.b")
            + F.get(F.col("st.s"), F.col("n_days") % _HW_M),
            6,
        ).alias("forecast_1d"),
        F.round(
            F.col("st.l")
            + 7 * F.col("st.b")
            + F.get(F.col("st.s"), (F.col("n_days") + 6) % _HW_M),
            6,
        ).alias("forecast_7d"),
    )


def _holt_winters_oracle_sql() -> str:
    """Recursive-CTE replay of the Holt-Winters fold: the 7-slot seasonal
    array becomes 7 columns with CASE slot dispatch; every l/b/s step
    reuses the IDENTICAL rounded expressions."""
    sprev = (
        "CASE r.k % 7 "
        + " ".join(f"WHEN {j} THEN r.s{j}" for j in range(_HW_M))
        + " END"
    )
    lvl = f"round(0.2 * (d.y - {sprev}) + 0.8 * (r.l + r.b), 6)"
    trd = f"round(0.1 * ({lvl} - r.l) + 0.9 * r.b, 6)"
    snew = f"round(0.3 * (d.y - {lvl}) + 0.7 * {sprev}, 6)"
    supd = ", ".join(
        f"CASE WHEN r.k % 7 = {j} THEN {snew} ELSE r.s{j} END"
        for j in range(_HW_M)
    )
    s_init = ", ".join(f"CAST(0.0 AS DOUBLE) AS s{j}" for j in range(_HW_M))
    s_next = (
        "CASE nd.n_days % 7 "
        + " ".join(f"WHEN {j} THEN r.s{j}" for j in range(_HW_M))
        + " END"
    )
    s_7d = (
        "CASE (nd.n_days + 6) % 7 "
        + " ".join(f"WHEN {j} THEN r.s{j}" for j in range(_HW_M))
        + " END"
    )
    return f"""
        WITH RECURSIVE daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   round(sum(CAST(floor(value * 100) AS BIGINT))
                         / (100.0 * count(*)), 6) AS y
            FROM events GROUP BY 1, 2
        ), d AS (
            SELECT event_type, y,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn
            FROM daily
        ), nd AS (
            SELECT event_type, count(*) AS n_days FROM d GROUP BY 1
        ), r AS (
            SELECT event_type, 1 AS k, y AS l, CAST(0.0 AS DOUBLE) AS b,
                   {s_init}
            FROM d WHERE rn = 1
            UNION ALL
            SELECT d.event_type, r.k + 1, {lvl}, {trd}, {supd}
            FROM r JOIN d ON d.event_type = r.event_type AND d.rn = r.k + 1
        )
        SELECT r.event_type, CAST(nd.n_days AS BIGINT) AS n_days,
               r.l AS level, r.b AS trend,
               {s_next} AS seasonal_next,
               round(r.l + r.b + {s_next}, 6) AS forecast_1d,
               round(r.l + 7 * r.b + {s_7d}, 6) AS forecast_7d
        FROM r JOIN nd ON nd.event_type = r.event_type AND r.k = nd.n_days
    """


_BACKTEST_H = 7  # holdout horizon (days)


def ts_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTEST: hold out the final 7 days, fit the Holt smoother
    (``ts_holt_forecast``'s exact recursion — one model, two operators) on
    the prefix only, and score each held-out day against its h-step
    forecast (level + h·trend). The evaluation discipline every
    forecasting deployment needs before trusting the forecast operator —
    the time-series sibling of ``sim_recall_eval``'s index audit.

    Output: one row per (event_type, horizon) with the actual, the
    forecast, and the absolute error — per-day rows, so no cross-engine
    error averaging is needed (every value is an already-rounded double
    both engines compute identically).

    Determinism: the cutoff is a ONE-ROW max-date anchor (scalar
    cross-join); the training fold reuses the w_ema/Holt bit-stability
    rule (round level/trend to 6dp per step). Scale shape: one
    |types|·|days| rollup, the per-type fold over a vocabulary-bounded
    series, and a types-keyed join of 7·|types| test rows."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("c"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.round(F.sum("c") / (100.0 * F.count(F.lit(1))), 6).alias("y")
    )
    anchor = ev.agg(F.date_sub(F.max("day"), _BACKTEST_H).alias("cutoff"))
    d = daily.crossJoin(F.broadcast(anchor))
    series = (
        d.filter(F.col("day") <= F.col("cutoff"))
        .groupBy("event_type")
        .agg(
            F.sort_array(F.collect_list(F.struct("day", "y"))).alias("days"),
            F.count(F.lit(1)).alias("n_train_days"),
        )
    )
    init = F.struct(F.lit(None).cast("double").alias("l"), F.lit(0.0).alias("b"))

    def step(acc, e):
        lvl = F.round(F.lit(0.2) * e["y"] + F.lit(0.8) * (acc["l"] + acc["b"]), 6)
        trd = F.round(F.lit(0.1) * (lvl - acc["l"]) + F.lit(0.9) * acc["b"], 6)
        return F.when(
            acc["l"].isNull(),
            F.struct(e["y"].alias("l"), F.lit(0.0).alias("b")),
        ).otherwise(F.struct(lvl.alias("l"), trd.alias("b")))

    fitted = series.select(
        "event_type", "n_train_days", F.aggregate("days", init, step).alias("st")
    )
    test = d.filter(F.col("day") > F.col("cutoff")).select(
        "event_type",
        "day",
        "y",
        F.datediff("day", "cutoff").cast("int").alias("h"),
    )
    fc = F.round(F.col("st.l") + F.col("h") * F.col("st.b"), 6)
    return (
        test.join(fitted, "event_type")
        .select(
            "event_type",
            "h",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_train_days",
            F.col("y").alias("actual"),
            fc.alias("forecast"),
            F.round(F.abs(fc - F.col("y")), 6).alias("abs_err"),
        )
        .orderBy("event_type", "h")
    )


def ts_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC downsampling of the event value series per event_type —
    the candle/rollup shape every metrics store (and every market-data
    pipeline) materializes: open/close = the first/last observation in
    the hour (total (ts, event_id) order, so ties are deterministic),
    high/low = extremes, plus count and mean.

    Determinism: values quantize to integer cents; open/close pick via
    min_by/max_by over the (ts, event_id) struct ↔ the oracle's
    row_number on the same total order; mean is one int/int double
    division. Scale shape: ONE (type, hour) partial-agg shuffle — group
    count bounded by vocab × hours, not event count."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("c"),
    )
    order_key = F.struct("ts", "event_id")
    return (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
                "hour"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("c", order_key).alias("open_c"),
            F.max("c").alias("high_c"),
            F.min("c").alias("low_c"),
            F.max_by("c", order_key).alias("close_c"),
            F.sum("c").alias("sum_c"),
        )
        .select(
            "event_type",
            "hour",
            "n_events",
            F.round(F.col("open_c") / 100.0, 6).alias("open"),
            F.round(F.col("high_c") / 100.0, 6).alias("high"),
            F.round(F.col("low_c") / 100.0, 6).alias("low"),
            F.round(F.col("close_c") / 100.0, 6).alias("close"),
            F.round(F.col("sum_c") / (100.0 * F.col("n_events")), 6).alias(
                "mean_value"
            ),
        )
    )


def ev_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort LTV curves — the revenue-weighted upgrade of
    ``ev_retention`` every growth team reads: users cohort by their FIRST
    purchase week (weeks indexed from the corpus's first purchase day, a
    one-row aggregate), and each (cohort, age) cell reports active buyers,
    week revenue, cumulative revenue, and cumulative revenue per cohort
    member — the LTV trajectory whose flattening point sets payback.

    Determinism: revenue quantizes to integer cents (the attribution
    rule), week indexes are exact integer day-diffs div 7, the cumulative
    sum is an integer window, and LTV-per-user is ONE double division at
    the edge. Scale shape: one user-keyed min, one (cohort, age) partial
    agg, a cohort-keyed cumsum window over <= weeks rows per cohort, and
    the anchor is a broadcast one-row aggregate (the ev_drift_psi
    shape)."""
    buys = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    anchor = F.broadcast(buys.agg(F.min("day").alias("day0")))
    wk = buys.crossJoin(anchor).select(
        "user_id",
        "cents",
        F.expr("datediff(day, day0) div 7").cast("int").alias("week"),
    )
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    cells = (
        wk.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("age_week"))
        .agg(
            F.count_distinct("user_id").alias("n_buyers"),
            F.sum("cents").alias("rev_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.withColumn("cum_rev_cents", F.sum("rev_cents").over(w))
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "age_week",
        "n_users",
        "n_buyers",
        "rev_cents",
        "cum_rev_cents",
        F.round(F.col("cum_rev_cents") / (100.0 * F.col("n_users")), 6).alias(
            "ltv_per_user"
        ),
    )


def ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event_type — the multiplicative
    seasonal index (dow mean daily count / overall mean daily count) every
    capacity forecaster factors out before trend-fitting, and the first
    diagnostic for weekly load cycles (index > 1: that weekday runs hot).

    Determinism: counts are exact integers; each mean is ONE long/long
    double division and the index ONE ratio of those two doubles —
    identical IEEE ops in both engines, rounded at the edge. Weekday is
    Monday=0 in both (Spark ``weekday`` ↔ DuckDB ``isodow - 1`` —
    DuckDB's own ``dayofweek`` is Sunday-based, a silent off-by-one).
    Scale shape: one (type, day) partial-agg rollup, then two
    vocabulary-sized aggregates joined on event_type (broadcast — the
    type vocabulary is bounded at any corpus size)."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("c"))
    overall = daily.groupBy("event_type").agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("n_days_all")
    )
    dow = daily.groupBy("event_type", F.weekday("day").alias("dow")).agg(
        F.sum("c").alias("dow_events"), F.count(F.lit(1)).alias("n_days")
    )
    mean_dow = F.col("dow_events") / F.col("n_days")
    mean_all = F.col("total") / F.col("n_days_all")
    return dow.join(F.broadcast(overall), "event_type").select(
        "event_type",
        "dow",
        "n_days",
        "dow_events",
        F.round(mean_dow, 6).alias("dow_mean"),
        F.round(mean_dow / mean_all, 6).alias("seasonal_index"),
    )


# CUSUM framing, all-integer (the ev_anomaly_mad rule): with per-type daily
# counts x_t, mean m = total/n and allowance k = m/4, the classic recursion
# S_t = max(0, S_{t-1} + x_t - m - k) scales by 4n to
# S'_t = max(0, S'_{t-1} + 4n·x_t - 5·total); alarm when S' > h' = 8·total
# (h = 2m). Exact integers end-to-end — no float ever enters the recursion.
_CUSUM_SCALE_NUM = 4  # 4n·x_t
_CUSUM_SHIFT_NUM = 5  # 5·total  (mean + quarter-mean allowance, scaled)
_CUSUM_H_NUM = 8  # 8·total  (2·mean threshold, scaled)


def a_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event_type over the daily event-count
    series — the classic sequential level-shift detector (Page 1954) every
    telemetry/KPI pipeline runs: a sustained upward shift accumulates in
    S_t and crosses the threshold within a few days, while one-day spikes
    decay back to zero. Reports days observed, alarm count, FIRST alarm
    day (the estimated changepoint), and the peak statistic.

    Determinism: the recursion is exact integer arithmetic at 4n scale
    (see module constants) — no float accumulation, so DuckDB replays it
    bit-exactly; like Holt, state depends on prior OUTPUT, so the oracle
    is a recursive CTE, not a window. Scale shape: the corpus-sized pass
    is one (type, day) partial-agg rollup; the fold runs per type over a
    days-bounded series — O(|types|·|days|) state, never corpus-sized."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("c"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "c"))).alias("days"),
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("n_days"),
    )
    init = F.struct(
        F.lit(0).cast("long").alias("s"),
        F.lit(0).cast("long").alias("alarms"),
        F.lit(None).cast("date").alias("first_alarm"),
        F.lit(0).cast("long").alias("max_s"),
    )

    def step(acc, e):
        s2 = F.greatest(
            F.lit(0).cast("long"),
            acc["s"]
            + F.lit(_CUSUM_SCALE_NUM) * F.col("n_days") * e["c"]
            - F.lit(_CUSUM_SHIFT_NUM) * F.col("total"),
        )
        alarm = s2 > F.lit(_CUSUM_H_NUM) * F.col("total")
        return F.struct(
            s2.alias("s"),
            (acc["alarms"] + alarm.cast("long")).alias("alarms"),
            F.coalesce(acc["first_alarm"], F.when(alarm, e["day"])).alias(
                "first_alarm"
            ),
            F.greatest(acc["max_s"], s2).alias("max_s"),
        )

    fitted = series.select(
        "event_type",
        "n_days",
        "total",
        F.aggregate("days", init, step).alias("st"),
    )
    return fitted.select(
        "event_type",
        "n_days",
        F.col("total").alias("total_events"),
        F.round(F.col("total") / F.col("n_days"), 6).alias("mean_daily"),
        F.col("st.alarms").alias("n_alarms"),
        # ISO string, not DATE: a sometimes-NULL date column lands in pandas
        # with engine-dependent dtype; strings compare cleanly
        F.date_format(F.col("st.first_alarm"), "yyyy-MM-dd").alias(
            "first_alarm_day"
        ),
        F.col("st.max_s").alias("max_stat"),
    )


# Benford first-digit probabilities log10(1 + 1/d), driver-computed once so
# both engines consume the IDENTICAL double literals
_BENFORD_P = {d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)}


def a_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the standard
    fabricated-data / fraud screen (accounting audits, synthetic-data QA):
    per leading digit, observed share vs the Benford expectation and the
    chi-square contribution.

    Determinism: the leading digit comes from the INTEGER-cents string
    (integer-to-string renders identically in both engines; double
    formatting does not), expected probabilities are shared driver-computed
    literals, and each digit's row is a self-contained expression (no
    cross-digit float accumulation to order). The digit total is a window
    over the 9-row digit frame — metadata-sized, like the
    ev_peak_concurrency hour carry."""
    orders = t(spark, sf_dir, "orders")
    digits = (
        orders.select(
            F.substring(
                F.floor(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .filter(F.col("digit") >= 1)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    w_all = Window.partitionBy()
    total = F.sum("n_obs").over(w_all)
    p_exp = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(d) for d in range(1, 10)]),
            F.array(*[F.lit(_BENFORD_P[d]) for d in range(1, 10)]),
        ),
        F.col("digit"),
    )
    return digits.select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs") / total, 6).alias("p_obs"),
        F.round(p_exp, 6).alias("p_benford"),
        F.round(
            (F.col("n_obs") / total - p_exp)
            * (F.col("n_obs") / total - p_exp)
            * total
            / p_exp,
            6,
        ).alias("chi2_term"),
    )


_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_discount", "l_extendedprice"),
    ("l_tax", "l_discount"),
]


def a_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over lineitem's numeric columns — the
    feature-screening pass every modeling pipeline runs before training.

    Exactness contract: ``F.corr`` (and any running-moment formula over
    doubles) is summation-order-dependent and can never hash-match a
    second engine. Here every column quantizes to integer hundredths, all
    five sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) accumulate as
    EXACT decimal(38,0) ↔ HUGEINT (order-independent), the covariance /
    variance numerators n·Σxy − Σx·Σy stay exact, and only the final
    ratio converts to double (one exactly-rounded conversion per term,
    then /, sqrt — identical IEEE ops in both engines).

    Scale shape: ONE scan, one partial-aggregated reduce to a single row
    of statistics (the textbook single-pass correlation); the per-pair
    flip is an explode of that one driver-sized row."""
    c = {
        col: F.floor(F.col(col) * 100).cast("decimal(38,0)")
        for col in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    }
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for x, y in _CORR_PAIRS:
        k = f"{x}__{y}"
        aggs += [
            F.sum(c[x]).alias(f"sx_{k}"),
            F.sum(c[y]).alias(f"sy_{k}"),
            F.sum(c[x] * c[y]).alias(f"sxy_{k}"),
            F.sum(c[x] * c[x]).alias(f"sxx_{k}"),
            F.sum(c[y] * c[y]).alias(f"syy_{k}"),
        ]
    stats = t(spark, sf_dir, "lineitem").agg(*aggs)
    rows = []
    for x, y in _CORR_PAIRS:
        k = f"{x}__{y}"
        num = (F.col("n") * F.col(f"sxy_{k}") - F.col(f"sx_{k}") * F.col(f"sy_{k}")).cast(
            "double"
        )
        vx = (F.col("n") * F.col(f"sxx_{k}") - F.col(f"sx_{k}") * F.col(f"sx_{k}")).cast(
            "double"
        )
        vy = (F.col("n") * F.col(f"syy_{k}") - F.col(f"sy_{k}") * F.col(f"sy_{k}")).cast(
            "double"
        )
        rows.append(
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("corr"),
            )
        )
    return stats.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.col_x", "r.col_y", "r.corr"
    )


def _corr_oracle_sql() -> str:
    pair_sql = []
    for x, y in _CORR_PAIRS:
        pair_sql.append(f"""
        SELECT '{x}' AS col_x, '{y}' AS col_y,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr
        FROM (
            SELECT CAST(count(*) AS HUGEINT) AS n,
                   sum(CAST(floor({x} * 100) AS HUGEINT)) AS sx,
                   sum(CAST(floor({y} * 100) AS HUGEINT)) AS sy,
                   sum(CAST(floor({x} * 100) AS HUGEINT)
                       * CAST(floor({y} * 100) AS HUGEINT)) AS sxy,
                   sum(CAST(floor({x} * 100) AS HUGEINT)
                       * CAST(floor({x} * 100) AS HUGEINT)) AS sxx,
                   sum(CAST(floor({y} * 100) AS HUGEINT)
                       * CAST(floor({y} * 100) AS HUGEINT)) AS syy
            FROM lineitem
        )""")
    return " UNION ALL ".join(pair_sql)


# "converted" = high-value converter. >= 1 purchase is degenerate on the
# fixture (every user purchases at least once → both arm rates 1.0, z = 0),
# so the contract pins a high-value threshold; the oracle encodes the same.
_AB_CONV_MIN_PURCHASES = 16


def _cuped_exprs() -> dict[str, str]:
    """The CUPED arithmetic as shared SQL expression strings (the
    ts_granger trick — one parse, one IEEE tree in both engines) over
    double columns: pooled (n, sx, sy, sxx, sxy, syy) + per-arm
    (n_a, sx_a, sy_a). θ = cov(x,y)/var(x); ρ² is the variance-reduction
    fraction CUPED delivers; the adjusted mean subtracts
    θ·(mean_x_arm − mean_x_pooled). Cents → currency via /100 INSIDE the
    rounded expression."""
    theta = "((n*sxy - sx*sy) / (n*sxx - sx*sx))"
    rho2 = (
        "((n*sxy - sx*sy) * (n*sxy - sx*sy)"
        " / ((n*sxx - sx*sx) * (n*syy - sy*sy)))"
    )
    mean_adj = (
        f"(sy_a/n_a - {theta} * (sx_a/n_a - sx/n))"
    )
    return {
        "theta": f"round({theta}, 6)",
        "rho2": f"round({rho2}, 6)",
        "mean_y": "round(sy_a/n_a/100, 6)",
        "mean_adj": f"round({mean_adj}/100, 6)",
    }


def ev_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al. 2013 — the
    pre-experiment-covariate adjustment every large experimentation
    platform applies before ``ev_ab_test``-style readouts): the corpus
    splits at its date midpoint into PRE (covariate x = each user's
    pre-period spend) and POST (metric y = post-period spend), users
    split into parity arms, θ = pooled cov(x,y)/var(x), and each arm
    reports its raw and CUPED-adjusted mean spend plus ρ² — the fraction
    of metric variance the covariate removes (the whole point: the same
    experiment needs (1−ρ²)× the traffic).

    Exactness: x/y are integer cents from ONE user-keyed conditional
    aggregate (the pre/post split compares integer datediffs — no date
    construction); per-arm and pooled sufficient statistics ride
    decimal(38,0) ↔ HUGEINT; θ/ρ²/means evaluate through SHARED SQL
    expression strings (``_cuped_exprs``, the ts_granger recipe) so both
    engines run the identical IEEE tree.

    Scale shape: one groupBy(user) with map-side combine, a 2-row arm
    rollup, and one-row pooled/date anchors (allow-listed)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("c"),
    )
    anchor = F.broadcast(
        ev.agg(F.min("day").alias("d0"), F.max("day").alias("dn"))
    )
    per_user = (
        ev.crossJoin(anchor)
        .withColumn(
            "pre",
            F.datediff("day", "d0")
            <= F.expr("datediff(dn, d0) div 2"),
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("pre"), F.col("c")).otherwise(0)).alias("x"),
            F.sum(F.when(~F.col("pre"), F.col("c")).otherwise(0)).alias("y"),
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_a"),
        F.sum(dec("x")).alias("sx_a"),
        F.sum(dec("y")).alias("sy_a"),
        F.sum(dec("x") * dec("x")).alias("sxx_a"),
        F.sum(dec("x") * dec("y")).alias("sxy_a"),
        F.sum(dec("y") * dec("y")).alias("syy_a"),
    )
    pooled = F.broadcast(
        arms.agg(
            F.sum("n_a").alias("n"),
            F.sum("sx_a").alias("sx"),
            F.sum("sy_a").alias("sy"),
            F.sum("sxx_a").alias("sxx"),
            F.sum("sxy_a").alias("sxy"),
            F.sum("syy_a").alias("syy"),
        )
    )
    joined = arms.crossJoin(pooled)
    as_double = joined.select(
        "arm",
        *[
            F.col(c).cast("double").alias(c)
            for c in ("n_a", "sx_a", "sy_a", "n", "sx", "sy", "sxx", "sxy", "syy")
        ],
    )
    e = _cuped_exprs()
    return as_double.select(
        "arm",
        F.col("n_a").cast("long").alias("n_users"),
        F.expr(e["mean_y"]).alias("mean_y"),
        F.expr(e["mean_adj"]).alias("mean_adj"),
        F.expr(e["theta"]).alias("theta"),
        F.expr(e["rho2"]).alias("rho2"),
    ).orderBy("arm")


def _cuped_oracle_sql() -> str:
    """DuckDB replay: identical integer pre/post split, HUGEINT
    sufficient statistics, and the IDENTICAL expression strings."""
    e = _cuped_exprs()
    return f"""
        WITH ev AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(floor(value * 100) AS BIGINT) AS c
            FROM events
        ), a AS (
            SELECT min(day) AS d0, max(day) AS dn FROM ev
        ), pu AS (
            SELECT user_id,
                   sum(CASE WHEN datediff('day', d0, day)
                             <= datediff('day', d0, dn) // 2
                        THEN c ELSE 0 END) AS x,
                   sum(CASE WHEN datediff('day', d0, day)
                             > datediff('day', d0, dn) // 2
                        THEN c ELSE 0 END) AS y,
                   CAST(user_id % 2 AS INTEGER) AS arm
            FROM ev, a GROUP BY user_id
        ), arms AS (
            SELECT arm, CAST(count(*) AS HUGEINT) AS n_a,
                   sum(CAST(x AS HUGEINT)) AS sx_a,
                   sum(CAST(y AS HUGEINT)) AS sy_a,
                   sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx_a,
                   sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy_a,
                   sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy_a
            FROM pu GROUP BY arm
        ), pooled AS (
            SELECT sum(n_a) AS n, sum(sx_a) AS sx, sum(sy_a) AS sy,
                   sum(sxx_a) AS sxx, sum(sxy_a) AS sxy, sum(syy_a) AS syy
            FROM arms
        ), d AS (
            SELECT arm,
                   CAST(n_a AS DOUBLE) AS n_a, CAST(sx_a AS DOUBLE) AS sx_a,
                   CAST(sy_a AS DOUBLE) AS sy_a,
                   CAST(n AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx,
                   CAST(sy AS DOUBLE) AS sy, CAST(sxx AS DOUBLE) AS sxx,
                   CAST(sxy AS DOUBLE) AS sxy, CAST(syy AS DOUBLE) AS syy
            FROM arms CROSS JOIN pooled
        )
        SELECT arm, CAST(n_a AS BIGINT) AS n_users,
               {e["mean_y"]} AS mean_y,
               {e["mean_adj"]} AS mean_adj,
               {e["theta"]} AS theta,
               {e["rho2"]} AS rho2
        FROM d ORDER BY arm
    """


def ev_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout — the A/B analysis every product
    team runs: users split into deterministic arms (user_id parity — the
    hash-bucket assignment an experiment framework persists), conversion =
    the user is a HIGH-VALUE converter (>= ``_AB_CONV_MIN_PURCHASES``
    purchases; the natural ">= 1 purchase" definition is degenerate on
    this corpus — every fixture user purchases at least once, so both
    rates would be exactly 1.0), and the readout is per-arm rates,
    relative lift (NULL when arm A has zero converters — no finite
    relative lift exists), and the pooled two-proportion z-score.

    Determinism: arms and conversions are exact integer counts from ONE
    user-keyed aggregation; the rate/lift/z arithmetic is a fixed-shape
    expression over those four integers (identical IEEE ops in both
    engines), rounded to 6. Scale shape: one groupBy(user) with map-side
    combine, then a single-row conditional aggregate — no joins."""
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.sum((F.col("event_type") == "purchase").cast("int"))
                >= _AB_CONV_MIN_PURCHASES
            )
            .cast("int")
            .alias("converted")
        )
        .withColumn("arm", F.pmod(F.col("user_id"), F.lit(2)))
    )
    stats = per_user.agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pooled * (1 - pooled) * (1 / F.col("n_a") + 1 / F.col("n_b")))
    return stats.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        # guard like z_score: conv_a = 0 would DIVIDE_BY_ZERO under ANSI mode
        F.when(F.col("conv_a") > 0, F.round((p_b - p_a) / p_a, 6)).alias("lift"),
        F.when(se > 0, F.round((p_b - p_a) / se, 6)).alias("z_score"),
    )


def a_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling pass (ANALYZE / data-quality summary): one row per
    column of ``orders`` with null count, exact distinct count, and typed
    min/max — numerics as doubles, timestamps explicitly formatted to µs
    (both engines format, neither relies on its native cast rendering),
    strings as-is. The pre-ingest audit every pipeline runs on a new drop.

    Scale shape: ONE scan builds every per-column aggregate in a single
    agg (Catalyst plans the multi-distinct via expand — n_cols passes over
    the shuffle, zero extra scans); the long-format flip is an explode of
    a single driver-side row. At 100 TB swap count_distinct for
    approx_count_distinct (a_hll_distinct shows the sketch contract) —
    the profile stays one scan."""
    df = t(spark, sf_dir, "orders")
    _NUM = ("bigint", "int", "smallint", "tinyint", "double", "float", "decimal")

    def prof(c: str, dt: str):
        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        if dt.startswith(_NUM):
            lo, hi = F.min(c).cast("double"), F.max(c).cast("double")
            lo_s, hi_s = null_s, null_s
        elif dt.startswith("timestamp"):  # timestamp AND timestamp_ntz
            fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
            lo, hi = null_d, null_d
            lo_s = F.date_format(F.min(c), fmt)
            hi_s = F.date_format(F.max(c), fmt)
        else:
            lo, hi = null_d, null_d
            lo_s, hi_s = F.min(c).cast("string"), F.max(c).cast("string")
        return F.struct(
            F.lit(c).alias("col_name"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            lo.alias("min_num"),
            hi.alias("max_num"),
            lo_s.alias("min_str"),
            hi_s.alias("max_str"),
        )

    row = df.agg(F.array(*[prof(c, dt) for c, dt in df.dtypes]).alias("cols"))
    return row.select(F.explode("cols").alias("p")).select("p.*")


_RFM_QS = (0.2, 0.4, 0.6, 0.8)


def a_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation over
    orders — the standard lifecycle-marketing rollup: per customer, days
    since last order (vs the corpus max date), order count, and exact
    lifetime spend, each scored 1-5 against corpus quintile boundaries,
    then mapped to a named segment (champion / new / at_risk /
    hibernating / regular).

    Scale + determinism: scores come from BOUNDARY COMPARISON, not a
    global ntile window — quintile boundaries are one sort-agg (swap in
    percentile_approx at 100 TB), broadcast back as a one-row frame, so
    no single-partition global-window funnel exists (the tx_quality_bins
    rule). Boundaries are rounded to 4 before any comparison and spend is
    an exact per-row decimal sum (the shared oracle contract), so both
    engines score identically even for boundary-exact customers."""
    orders = t(spark, sf_dir, "orders")
    anchor = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("anchor"))
    base = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn(
            "recency_days",
            F.datediff(F.col("anchor"), F.col("last_order")).cast("bigint"),
        )
    )
    qs = base.agg(
        *[
            F.round(F.percentile(m, F.lit(p)), 4).alias(f"{m[0]}q{int(p * 100)}")
            for m in ("recency_days", "frequency", "monetary")
            for p in _RFM_QS
        ]
    )

    def score_up(m: str, pfx: str):  # higher metric value → higher score
        return sum(
            (F.col(m) > F.col(f"{pfx}q{int(p * 100)}")).cast("int") for p in _RFM_QS
        ) + F.lit(1)

    def score_down(m: str, pfx: str):  # lower metric value → higher score
        return sum(
            (F.col(m) < F.col(f"{pfx}q{int(p * 100)}")).cast("int") for p in _RFM_QS
        ) + F.lit(1)

    scored = (
        base.crossJoin(F.broadcast(qs))
        .withColumn("r_score", score_down("recency_days", "r"))
        .withColumn("f_score", score_up("frequency", "f"))
        .withColumn("m_score", score_up("monetary", "m"))
    )
    segment = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "new")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating")
        .otherwise("regular")
    )
    return scored.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        segment.alias("segment"),
    )


_RFM_ORACLE = """
    WITH base AS (
        SELECT o_custkey AS custkey,
               date_diff('day', CAST(max(o_orderdate) AS DATE),
                         (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
                   AS recency_days,
               count(*) AS frequency,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS monetary
        FROM orders GROUP BY 1
    ), q AS (
        SELECT
            round(quantile_cont(recency_days, 0.2), 4) AS rq20,
            round(quantile_cont(recency_days, 0.4), 4) AS rq40,
            round(quantile_cont(recency_days, 0.6), 4) AS rq60,
            round(quantile_cont(recency_days, 0.8), 4) AS rq80,
            round(quantile_cont(frequency, 0.2), 4) AS fq20,
            round(quantile_cont(frequency, 0.4), 4) AS fq40,
            round(quantile_cont(frequency, 0.6), 4) AS fq60,
            round(quantile_cont(frequency, 0.8), 4) AS fq80,
            round(quantile_cont(monetary, 0.2), 4) AS mq20,
            round(quantile_cont(monetary, 0.4), 4) AS mq40,
            round(quantile_cont(monetary, 0.6), 4) AS mq60,
            round(quantile_cont(monetary, 0.8), 4) AS mq80
        FROM base
    ), scored AS (
        SELECT custkey, recency_days, frequency, monetary,
               1 + CAST(recency_days < rq20 AS INT) + CAST(recency_days < rq40 AS INT)
                 + CAST(recency_days < rq60 AS INT) + CAST(recency_days < rq80 AS INT)
                   AS r_score,
               1 + CAST(frequency > fq20 AS INT) + CAST(frequency > fq40 AS INT)
                 + CAST(frequency > fq60 AS INT) + CAST(frequency > fq80 AS INT)
                   AS f_score,
               1 + CAST(monetary > mq20 AS INT) + CAST(monetary > mq40 AS INT)
                 + CAST(monetary > mq60 AS INT) + CAST(monetary > mq80 AS INT)
                   AS m_score
        FROM base CROSS JOIN q
    )
    SELECT custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM scored
"""


def ev_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration report — how much of the event volume the top
    user deciles generate (the 80/20 table behind capacity planning and
    whale-risk review): users rank by event count (ties on user_id),
    split into ten rank-deciles, and each decile reports its user count,
    event volume, share, and the cumulative share.

    Determinism: integer rank arithmetic (decile = (rank−1)·10 // n_users)
    and exact integer sums; the two shares are single divisions; the
    cumulative window runs over ten rows. Scale note: the exact global
    rank is the AUDIT form (a sort over the per-user aggregate — one row
    per user); at extreme user cardinality production swaps in
    range-partitioned sort or approximate count-quantile boundaries, same
    downstream arithmetic."""
    counts = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(
        F.count(F.lit(1)).alias("n_users_total"),
        F.sum("n").alias("n_events_total"),
    )
    w = Window.orderBy(F.desc("n"), F.asc("user_id"))
    ranked = (
        counts.withColumn("rnk", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "decile",
            F.expr("((rnk - 1) * 10) div n_users_total").cast("int"),
        )
    )
    per = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").alias("n_events"),
        F.max("n_events_total").alias("tot"),
    )
    w_cum = (
        Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per.withColumn("cum_events", F.sum("n_events").over(w_cum))
        .select(
            "decile",
            "n_users",
            "n_events",
            F.round(F.col("n_events") / F.col("tot").cast("double"), 6).alias(
                "event_share"
            ),
            F.round(F.col("cum_events") / F.col("tot").cast("double"), 6).alias(
                "cum_share"
            ),
        )
        .orderBy("decile")
    )


def ev_reach_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly REACH curve: per week (anchored on the corpus' first event
    day, the ev_stickiness convention) the weekly-active user count, the
    users appearing for the FIRST time ever, the cumulative audience
    reached so far, and the new-user share of the week's actives — the
    acquisition-vs-return decomposition growth teams read next to
    retention (a reach curve that flattens while WAU holds is a product
    living off its base).

    Determinism: first-ever week per user is an exact min; every census
    is an integer; the cumulative sum runs over the WEEKS-bounded frame
    (never data-sized); ONE double division, round 6.

    Scale shape: one (user → min day) partial-agg shuffle, one
    (week, user) distinct shuffle, then weeks-bounded rollups + the
    one-row min-day anchor (allow-listed)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    anchor = ev.agg(F.min("day").alias("day0"))
    days = (
        ev.distinct()
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.expr("datediff(day, day0) div 7").cast("int").alias("week"),
        )
        .distinct()
    )
    wau = days.groupBy("week").agg(F.count(F.lit(1)).alias("wau"))
    new = (
        days.groupBy("user_id")
        .agg(F.min("week").alias("week"))
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    wk = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, 0)
    return (
        wau.join(new, "week", "left")
        .fillna(0, ["n_new"])
        .select(
            "week",
            F.col("wau").cast("long").alias("wau"),
            F.col("n_new").cast("long").alias("n_new"),
            F.sum("n_new").over(wk).cast("long").alias("cum_reach"),
            F.round(F.col("n_new") / F.col("wau").cast("double"), 6).alias(
                "new_share"
            ),
        )
        .orderBy("week")
    )


def ev_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly STICKINESS (mean DAU / WAU) — the engagement-depth ratio
    product teams track next to retention: 1.0 means every weekly-active
    user shows up daily; 1/7 is the drive-by floor. Weeks anchor on the
    corpus' first event day (the ev_ltv_cohort convention — engine-
    portable, unlike engine week-truncation rules).

    Determinism: DAU and WAU are exact distinct counts; mean-DAU/WAU =
    sum_dau / (n_active_days · wau) — integer arithmetic and ONE double
    division. Scale shape: two partial-agg shuffles ((day, user) distinct
    → per-day counts; (week, user) distinct → weekly counts), both
    map-side combined, plus the one-row min-day anchor."""
    ev = t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("day"))
    anchor = ev.agg(F.min("day").alias("day0"))
    days = (
        ev.distinct()
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            "day",
            F.expr("datediff(day, day0) div 7").cast("int").alias("week"),
        )
    )
    dau = (
        days.groupBy("week", "day")
        .agg(F.count(F.lit(1)).alias("dau"))
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_active_days"),
            F.sum("dau").alias("sum_dau"),
        )
    )
    wau = (
        days.select("week", "user_id")
        .distinct()
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return (
        dau.join(wau, "week")
        .select(
            "week",
            "n_active_days",
            "sum_dau",
            "wau",
            F.round(
                F.col("sum_dau")
                / (F.col("n_active_days") * F.col("wau")).cast("double"),
                6,
            ).alias("stickiness"),
        )
        .orderBy("week")
    )


def ev_churn_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical survival / churn curve over user lifetimes: each user's
    age = days between first and last observed event; per age the at-risk
    count, churn count, hazard d/n, and survival share — the retention
    economics table next to ``ev_retention``'s cohort grid. Uncensored by
    construction (every user's last event is treated as churn), which
    makes the Kaplan-Meier product TELESCOPE to the exact empirical
    survivor function (N − cum_churned)/N — pure integer counting, no
    cross-engine product/exp chains. (With right-censoring the product
    form returns; that variant needs the Holt-style recursive replay.)

    Scale shape: one user-keyed partial agg (first/last day), one
    age-keyed rollup bounded by the day span, and a cumulative window
    over that bounded series."""
    ev = t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("day"))
    ages = ev.groupBy("user_id").agg(
        F.datediff(F.max("day"), F.min("day")).alias("age_days")
    )
    d = ages.groupBy("age_days").agg(F.count(F.lit(1)).alias("n_churned"))
    w_ge = (
        Window.orderBy(F.desc("age_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_le = (
        Window.orderBy(F.asc("age_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = (
        d.withColumn("n_at_risk", F.sum("n_churned").over(w_ge))
        .withColumn("cum_churned", F.sum("n_churned").over(w_le))
    )
    total = ages.agg(F.count(F.lit(1)).alias("n_users"))
    return (
        curve.crossJoin(F.broadcast(total))
        .select(
            F.col("age_days").cast("int").alias("age_days"),
            "n_at_risk",
            "n_churned",
            F.round(
                F.col("n_churned") / F.col("n_at_risk").cast("double"), 6
            ).alias("hazard"),
            F.round(
                (F.col("n_users") - F.col("cum_churned"))
                / F.col("n_users").cast("double"),
                6,
            ).alias("survival"),
        )
        .orderBy("age_days")
    )


_PATH_LEN = 5  # leading events per session kept in the path signature
_PATH_TOP_K = 25


def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session paths: sessionize the event stream (the w_sessionize
    30-minute-gap rule — one contract), render each session's first
    ``_PATH_LEN`` event types as an ordered ``a>b>c`` signature, and rank
    the most common paths with their share of all sessions — the Sankey /
    user-flow table behind every product-analytics dashboard, and the
    sequence-level sibling of ``ev_transition_matrix``'s first-order
    pairs.

    Determinism: in-session order is the (ts_us, event_id) total order
    (array_sort over structs ↔ list(... ORDER BY) — event_id breaks
    timestamp ties); the share divides exact integers. Scale shape: one
    user-keyed shuffle for the session windows (every per-user sequence
    op's bound), one partial-aggregated rollup on the path signature
    (bounded by observed path vocabulary), and a ONE-ROW total
    cross-joined onto just the top-k rows."""
    gap_us = 30 * 60 * 1_000_000
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts_us").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (F.col("ts_us") - F.col("prev_ts") > gap_us)
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("ts_us", "event_id", "event_type"))
                    ),
                    1,
                    _PATH_LEN,
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    total = counts.agg(F.sum("n_sessions").alias("total"))
    return (
        counts.orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(_PATH_TOP_K)
        .crossJoin(F.broadcast(total))
        .select(
            "path",
            "n_sessions",
            F.round(F.col("n_sessions") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
    )


def a_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend line — the "is revenue growing and how fast"
    regression every BI layer ships (Trino's regr_slope/regr_intercept,
    reached through the reference's SQL passthrough): monthly revenue per
    order priority regressed on the month index.

    Exactness contract (the ``a_correlation`` recipe): x is the integer
    month index, y the EXACT monthly cents total; the sufficient
    statistics (n, Σx, Σy, Σxy, Σx²) accumulate as decimal(38,0) ↔
    HUGEINT — order-independent — the slope numerator/denominator
    n·Σxy − Σx·Σy stay exact, and only the final ratio converts to
    double (identical IEEE division in both engines; intercept reuses
    the slope double with the same op order).

    Scale shape: one scan → partial-aggregated (priority, month) rollup
    (bounded: 5 × months) → per-priority stats; regression math runs on
    5 rows. No window, no driver loop."""
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    monthly = (
        o.groupBy(
            "o_orderpriority",
            ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("mx"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    d38 = "decimal(38,0)"
    stats = monthly.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("mx").cast(d38)).alias("sx"),
        F.sum(F.col("cents").cast(d38)).alias("sy"),
        F.sum(F.col("mx").cast(d38) * F.col("cents").cast(d38)).alias("sxy"),
        F.sum(F.col("mx").cast(d38) * F.col("mx").cast(d38)).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return stats.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n_months"),
        F.round(slope, 6).alias("slope_cents_per_month"),
        F.round(intercept, 4).alias("intercept_cents"),
    ).orderBy("o_orderpriority")


_ACF_MAX_LAG = 7


def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1..{_ACF_MAX_LAG}) of the daily
    order-revenue series — the seasonality/memory diagnostic every
    forecasting pipeline runs before model selection (a weekly cycle
    shows as a lag-7 spike; white noise shows nothing). Complements
    ``ts_seasonality``'s fixed weekly profile with the model-free view.

    Exactness (the a_correlation rule): revenue quantizes to integer
    cents, the one-row (n, Σx) anchor turns each deviation into the
    EXACT integer n·x_t − Σx (no fractional mean anywhere), and both
    the lag-k numerators Σ dev_t·dev_{t-k} and the denominator Σ dev²
    accumulate as decimal(38,0) ↔ HUGEINT. Only the final ratio
    converts to double — one exactly-rounded conversion per term, then
    a single IEEE division, identical in DuckDB.

    Scale shape: ONE shuffle (the groupBy day) reduces the fact table
    to a |days|-bounded series (~2.5k rows at any SF); the lag window
    and the final reduce run on that bounded frame, so the unpartitioned
    window is metadata-sized by construction. The (n, Σx) anchor is a
    ONE-ROW aggregate cross join (allow-listed scalar shape)."""
    daily = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("x"))
    )
    stat = F.broadcast(
        daily.agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum("x").alias("s"),
        )
    )
    dev = daily.crossJoin(stat).select(
        "day", (F.col("n") * F.col("x") - F.col("s")).alias("dev")
    )
    w = Window.orderBy("day")
    lagged = dev.select(
        "dev",
        *[F.lag("dev", k).over(w).alias(f"dev_{k}") for k in range(1, _ACF_MAX_LAG + 1)],
    )
    aggs = [F.sum(F.col("dev") * F.col("dev")).alias("den")]
    for k in range(1, _ACF_MAX_LAG + 1):
        aggs += [
            F.sum(F.col("dev") * F.col(f"dev_{k}")).alias(f"num_{k}"),
            F.count(F.col(f"dev_{k}")).alias(f"np_{k}"),
        ]
    red = lagged.agg(*aggs)
    stack_args = ", ".join(
        f"{k}, np_{k}, num_{k}" for k in range(1, _ACF_MAX_LAG + 1)
    )
    return red.select(
        F.expr(
            f"stack({_ACF_MAX_LAG}, {stack_args}) AS (lag, n_pairs, num)"
        ),
        "den",
    ).select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).alias("acf"),
    ).orderBy("lag")


def ev_survival_censored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-CENSORED Kaplan–Meier survival over user lifetimes — the
    variant ``ev_churn_curve``'s docstring defers: a user whose last
    event falls on the corpus's final observed day was still alive when
    observation ended, so they leave the risk set at their age WITHOUT
    counting as churn. The estimator is the true KM product
    S(t) = Π_{a ≤ t} (1 − d_a / n_a), which no longer telescopes to a
    counting identity once censoring removes users from later risk sets.

    Cross-engine product determinism: the per-age factors are one double
    division each; the PREFIX products are folded over the age-ordered
    BOUNDED factor list (ages are calendar-bounded) via sort_array +
    posexplode + per-row slice-fold — multiplication order is pinned, so
    DuckDB's list(ORDER BY) + list_reduce replays bit-identical doubles.

    Scale shape: one user-keyed partial agg (first/last day), one
    age-keyed rollup bounded by the day span, ONE-ROW anchors for the
    observation boundary, and the fold runs on the bounded per-age list."""
    ev = t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("day"))
    horizon = F.broadcast(ev.agg(F.max("day").alias("last_day")))
    ages = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .crossJoin(horizon)
        .select(
            F.datediff("d1", "d0").alias("age_days"),
            (F.col("d1") == F.col("last_day")).cast("long").alias("censored"),
        )
    )
    per_age = ages.groupBy("age_days").agg(
        F.sum(1 - F.col("censored")).alias("n_churned"),
        F.sum("censored").alias("n_censored"),
    )
    w_ge = (
        Window.orderBy(F.desc("age_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_age = per_age.withColumn(
        "n_at_risk", F.sum(F.col("n_churned") + F.col("n_censored")).over(w_ge)
    ).withColumn(
        "factor",
        F.lit(1.0) - F.col("n_churned").cast("double") / F.col("n_at_risk").cast("double"),
    )
    one = per_age.agg(
        F.sort_array(
            F.collect_list(
                F.struct("age_days", "n_at_risk", "n_churned", "n_censored", "factor")
            )
        ).alias("rows")
    )
    r = F.col("r")
    return (
        one.select(F.col("rows"), F.posexplode("rows").alias("i", "r"))
        .select(
            r["age_days"].cast("int").alias("age_days"),
            r["n_at_risk"].alias("n_at_risk"),
            r["n_churned"].alias("n_churned"),
            r["n_censored"].alias("n_censored"),
            F.round(r["factor"], 6).alias("hazard_factor"),
            F.round(
                F.aggregate(
                    F.transform(
                        F.slice("rows", F.lit(1), F.col("i") + 1),
                        lambda s: s["factor"],
                    ),
                    F.lit(1.0),
                    lambda a, x: a * x,
                ),
                6,
            ).alias("survival"),
        )
        .orderBy("age_days")
    )


# Poisson(1) CDF cut points scaled to exact 60-bit integers
# (floor(cdf_k · 2^60) for k = 0..5): the bootstrap weight is the count of
# cut points at or below the row's 60-bit uniform — integer comparisons
# only, so Spark and DuckDB draw IDENTICAL weights with no float compare.
_POIS1_CUTS = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
)
_BOOT_R = 40  # bootstrap replicates


def a_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean order price via the
    POISSON BOOTSTRAP — the distributed-systems standard (per-row
    independent Poisson(1) weights replace the with-replacement resample,
    so no pass ever needs the global row count or a shared sample
    index; this is how bootstrap runs at 100 TB). R = 40 (_BOOT_R)
    replicates in ONE pass with NO row fan-out (round-12 verdict item
    #3 — the former ``explode(sequence(1, R))`` materialized R·|rows|
    generated rows): each row computes its R weights as ONE array
    column (``transform(sequence(1, R), ...)``, so the seeded md5 runs
    exactly once per (row, replicate)), and the per-replicate
    ``(Σw, Σw·c)`` sufficient statistics reduce as 2R decimal aggregate
    columns in a single map-side-combined global aggregate — the row
    count through the plan stays |rows|, the shuffle is ONE 80-column
    partial per task, and the R replicate rows are unpacked from the
    single result row. Weights draw from the seeded portable 60-bit
    md5 uniform (the cur_dp_release convention) against EXACT integer
    CDF cut points — bit-identical to the pre-rewrite rule, so the
    oracle is unchanged. The weight array is bound as a REAL column
    (separate projection): CollapseProject refuses to inline a
    non-cheap expression referenced 2R times, so the md5 work is never
    re-derived per aggregate.

    Exactness: weights and weighted cent-sums are integers (HUGEINT ↔
    decimal(38,0)); each replicate mean is ONE double division; the
    bootstrap SE and the percentile CI fold the R-bounded replicate-mean
    list in pinned replicate order (sort_array + F.aggregate ↔ DuckDB
    list(ORDER BY r) + list_reduce)."""
    # t_par: the R md5s per row are the dominant cost — on a single-split
    # fixture file they would otherwise all run on one core
    o = t_par(spark, sf_dir, "orders").select(
        "o_orderkey", F.floor(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    base = o.select("c", boot_weight_array().alias("warr"))
    packed = base.agg(
        *boot_rep_aggs()
    )  # ONE result row: 2R map-side-combined sums
    point = F.broadcast(
        o.agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(F.col("c").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1)).cast("double")
                / 100.0
            ).alias("point_mean"),
        )
    )
    return boot_report(boot_reps(packed), point)


def boot_weight_array():
    """R-length Poisson(1) weight array for the current row: weights drawn
    from the seeded portable 60-bit md5 uniform of (replicate,
    o_orderkey) against exact integer CDF cut points — the shared kernel
    of ``a_poisson_bootstrap`` and ``st_bootstrap_stream`` (one rule, two
    tiers)."""

    def _w(r):  # Poisson(1) inverse-CDF count for replicate r, capped at 6
        u = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"),
                        r.cast("string"),
                        F.lit(":"),
                        F.col("o_orderkey").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        # bind u as a lambda variable so the md5 evaluates ONCE per
        # (row, replicate), not once per cut-point comparison
        return F.get(
            F.transform(
                F.array(u),
                lambda uu: sum(
                    (uu >= F.lit(cut)).cast("long") for cut in _POIS1_CUTS
                ),
            ),
            0,
        )

    return F.transform(F.sequence(F.lit(1), F.lit(_BOOT_R)), _w)


def boot_rep_aggs() -> list:
    """The 2R per-replicate sufficient-statistic aggregates (Σw, Σw·c)
    over a frame carrying (warr, c) — decimal(38,0) exact, map-side
    combined; additive across any micro-batch split of the rows."""
    aggs = []
    for r in range(1, _BOOT_R + 1):
        wi = F.get(F.col("warr"), r - 1)
        aggs.append(F.sum(wi.cast("decimal(38,0)")).alias(f"n{r}"))
        aggs.append(
            F.sum((wi * F.col("c")).cast("decimal(38,0)")).alias(f"wc{r}")
        )
    return aggs


def boot_reps(packed: DataFrame) -> DataFrame:
    """Unpack the single 2R-column sufficient-statistic row into R
    (replicate, mean) rows."""
    return (
        packed.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            F.col(f"n{r}").alias("n_eff"),
                            F.col(f"wc{r}").alias("wc"),
                        )
                        for r in range(1, _BOOT_R + 1)
                    ]
                )
            ).alias("s")
        )
        .select("s.*")
        # a replicate whose weights all drew 0 resampled NOTHING — its mean
        # is undefined; drop it and size every downstream fold on the
        # VALID replicate count (standard Poisson-bootstrap treatment;
        # P(empty) = e^(-n) per replicate, only visible on tiny fixtures)
        .filter(F.col("n_eff") > 0)
        .select(
            "r",
            (F.col("wc").cast("double") / F.col("n_eff").cast("double") / 100.0)
            .alias("m"),
        )
    )


def boot_report(reps: DataFrame, point: DataFrame) -> DataFrame:
    """SE + percentile CI over the R-bounded replicate means, folded in
    pinned replicate order (sort_array + F.aggregate ↔ DuckDB
    list(ORDER BY r) + list_reduce); ``point`` is a one-row broadcast
    (n_rows, point_mean) anchor."""
    means = F.sort_array(F.collect_list(F.struct("r", "m")))
    mlist = F.transform(means, lambda s: s["m"])
    rv = F.size(mlist).cast("double")  # valid replicate count
    mbar = F.aggregate(mlist, F.lit(0.0), lambda a, x: a + x) / rv
    var = F.aggregate(
        F.transform(mlist, lambda x: (x - mbar) * (x - mbar)),
        F.lit(0.0),
        lambda a, x: a + x,
    ) / (rv - 1.0)
    sorted_means = F.array_sort(mlist)
    rv_i = F.size(mlist)
    lo_i = F.greatest(F.lit(1), F.round(F.lit(0.025) * rv).cast("int"))
    hi_i = F.least(rv_i, F.round(F.lit(0.975) * rv).cast("int"))
    return (
        reps.agg(
            F.round(F.sqrt(var), 6).alias("boot_se"),
            F.round(F.get(sorted_means, lo_i - 1), 6).alias("ci_lo"),
            F.round(F.get(sorted_means, hi_i - 1), 6).alias("ci_hi"),
        )
        .crossJoin(point)
        .select(
            "n_rows",
            F.round("point_mean", 6).alias("point_mean"),
            "boot_se",
            "ci_lo",
            "ci_hi",
        )
    )


_XCF_MAX_LAG = 7


def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the daily CLICK series and the
    daily PURCHASE series at lags −7..+7 (_XCF_MAX_LAG) — the
    lead/lag diagnostic every growth stack runs ("do clicks lead
    purchases, and by how many days?"): a positive-lag peak means clicks
    at day t co-move with purchases at day t+k. The two-series sibling of
    ``ts_autocorrelation``, sharing its exactness recipe.

    Exactness: daily counts are integers; the one-row (n, Σx, Σy) anchor
    turns each deviation into the exact integer n·x_t − Σx (no
    fractional means), lagged products and both denominator sums
    accumulate as decimal(38,0) ↔ HUGEINT, and only the final
    num/sqrt(den_x·den_y) ratio converts to double — identical
    expression tree in DuckDB. Negative lags reuse the positive-lag
    machinery with the series swapped (r_xy(−k) = r_yx(k)), so one
    window pass serves both directions.

    Scale shape: ONE shuffle (groupBy day) reduces the fact table to a
    |days|-bounded series; the lag window and reduce run on that bounded
    frame. The anchor is a ONE-ROW cross join (allow-listed)."""
    ev = t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    daily = ev.groupBy("day").agg(
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("decimal(38,0)")
        .alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("decimal(38,0)")
        .alias("y"),
    )
    stat = F.broadcast(
        daily.agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
        )
    )
    dev = daily.crossJoin(stat).select(
        "day",
        (F.col("n") * F.col("x") - F.col("sx")).alias("dx"),
        (F.col("n") * F.col("y") - F.col("sy")).alias("dy"),
    )
    w = Window.orderBy("day")
    cols = ["dx", "dy"]
    for k in range(1, _XCF_MAX_LAG + 1):
        cols.append(F.lag("dy", k).over(w).alias(f"dy_m{k}"))  # y at t-k
        cols.append(F.lag("dx", k).over(w).alias(f"dx_m{k}"))  # x at t-k
    lagged = dev.select(*cols)
    aggs = [
        F.sum(F.col("dx") * F.col("dx")).alias("den_x"),
        F.sum(F.col("dy") * F.col("dy")).alias("den_y"),
        F.sum(F.col("dx") * F.col("dy")).alias("num_0"),
        F.count(F.col("dx")).alias("np_0"),
    ]
    for k in range(1, _XCF_MAX_LAG + 1):
        # lag +k: x at t leads y at t+k ⇔ pair (x_{t-k}, y_t)
        aggs.append(F.sum(F.col(f"dx_m{k}") * F.col("dy")).alias(f"num_p{k}"))
        aggs.append(F.count(F.col(f"dx_m{k}")).alias(f"np_p{k}"))
        # lag −k: purchases lead clicks ⇔ pair (x_t, y_{t-k})
        aggs.append(F.sum(F.col("dx") * F.col(f"dy_m{k}")).alias(f"num_m{k}"))
        aggs.append(F.count(F.col(f"dy_m{k}")).alias(f"np_m{k}"))
    red = lagged.agg(*aggs)
    terms = [f"0, np_0, num_0"]
    for k in range(1, _XCF_MAX_LAG + 1):
        terms.append(f"{k}, np_p{k}, num_p{k}")
        terms.append(f"-{k}, np_m{k}, num_m{k}")
    return (
        red.select(
            F.expr(
                f"stack({len(terms)}, {', '.join(terms)}) AS (lag, n_pairs, num)"
            ),
            "den_x",
            "den_y",
        )
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(
                F.col("num").cast("double")
                / F.sqrt(
                    F.col("den_x").cast("double") * F.col("den_y").cast("double")
                ),
                6,
            ).alias("xcf"),
        )
        .orderBy("lag")
    )


def _granger_f_expr(e: str, u: str, v: str, pair: dict[tuple[str, str], str]) -> str:
    """ONE SQL expression string for the lag-1 Granger F statistic, used
    VERBATIM by both the Spark plan (``F.expr``) and the DuckDB oracle —
    same parse, same double tree, same rounding. Inputs are the double
    columns ``n``, ``s_<col>`` (sums), ``s_<a><b>`` (product sums, names
    via ``pair``). Restricted model: e_t ~ 1 + u_t; unrestricted adds v_t
    (u = effect's own lag, v = the candidate cause's lag); F with 1
    numerator df and n-3 denominator df via the centered-Cramer solve.
    All centered second moments are scaled by n (the n's cancel in F)."""
    def p(a: str, b: str) -> str:
        return pair[(a, b)] if (a, b) in pair else pair[(b, a)]

    suu = f"(n*s_{p(u, u)} - s_{u}*s_{u})"
    svv = f"(n*s_{p(v, v)} - s_{v}*s_{v})"
    suv = f"(n*s_{p(u, v)} - s_{u}*s_{v})"
    sue = f"(n*s_{p(u, e)} - s_{u}*s_{e})"
    sve = f"(n*s_{p(v, e)} - s_{v}*s_{e})"
    see = f"(n*s_{p(e, e)} - s_{e}*s_{e})"
    det = f"({suu}*{svv} - {suv}*{suv})"
    rss_r = f"({see} - {sue}*{sue}/{suu})"
    rss_u = (
        f"({see} - ({sue}*({sue}*{svv} - {sve}*{suv})"
        f" + {sve}*({sve}*{suu} - {sue}*{suv}))/{det})"
    )
    return f"round((n - 3) * ({rss_r} - {rss_u}) / {rss_u}, 6)"


# canonical product-sum column names over {y, x, ly, lx}
_GRANGER_PAIRS: dict[tuple[str, str], str] = {
    ("y", "y"): "yy",
    ("x", "x"): "xx",
    ("ly", "ly"): "lyly",
    ("lx", "lx"): "lxlx",
    ("ly", "y"): "lyy",
    ("lx", "y"): "lxy",
    ("ly", "x"): "lyx",
    ("lx", "x"): "lxx",
    ("ly", "lx"): "lylx",
}


def _granger_oracle_sql() -> str:
    """DuckDB replay: identical daily series, identical integer sums
    (HUGEINT), and the IDENTICAL F expression strings Spark parses."""
    f1 = _granger_f_expr("y", "ly", "lx", _GRANGER_PAIRS)
    f2 = _granger_f_expr("x", "lx", "ly", _GRANGER_PAIRS)
    base = ["CAST(count(*) AS HUGEINT) AS n"] + [
        f"sum(CAST({c} AS HUGEINT)) AS s_{c}" for c in ("y", "x", "ly", "lx")
    ] + [
        f"sum(CAST({a} * {b} AS HUGEINT)) AS s_{nm}"
        for (a, b), nm in _GRANGER_PAIRS.items()
    ]
    names = ["n"] + [f"s_{c}" for c in ("y", "x", "ly", "lx")] + [
        f"s_{nm}" for nm in _GRANGER_PAIRS.values()
    ]
    casts = ", ".join(f"CAST({c} AS DOUBLE) AS {c}" for c in names)
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
            FROM events GROUP BY 1
        ), lagged AS (
            SELECT day, x, y,
                   lag(x) OVER (ORDER BY day) AS lx,
                   lag(y) OVER (ORDER BY day) AS ly
            FROM daily
        ), lf AS (
            SELECT * FROM lagged WHERE lx IS NOT NULL
        ), sums AS (
            SELECT {', '.join(base)} FROM lf
        ), d AS (
            SELECT {casts} FROM sums
        )
        SELECT 'click' AS cause, 'purchase' AS effect,
               CAST(n AS BIGINT) AS n_pairs, {f1} AS f_stat FROM d
        UNION ALL
        SELECT 'purchase', 'click', CAST(n AS BIGINT), {f2} FROM d
        ORDER BY cause
    """


def ts_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality between the daily CLICK and PURCHASE
    count series, BOTH directions — the decide-step on top of
    ``ts_cross_correlation``'s lead/lag picture ("do yesterday's clicks
    predict today's purchases beyond purchases' own history?"): F-test
    of the restricted AR(1) model against the unrestricted model with
    the other series' lag added.

    Exactness: daily counts are integers, so every base sum (Σe, Σe²,
    Σuv, …) is an exact integer riding decimal(38,0) ↔ HUGEINT; the
    F statistic is ONE shared SQL expression string (``_granger_f_expr``)
    evaluated by both engines over those sums — identical parse,
    identical IEEE tree, one round(6). Coefficient algebra is
    numerically pinned against an independent least-squares solve in
    tests.

    Scale shape: ONE groupBy(day) shuffle reduces the fact table to a
    calendar-bounded series; the lag window and the single aggregate row
    run on that bounded frame (the ts_cross_correlation rule)."""
    ev = t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    daily = ev.groupBy("day").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("y"),
    )
    w = Window.orderBy("day")
    lagged = (
        daily.select(
            "day",
            "x",
            "y",
            F.lag("x", 1).over(w).alias("lx"),
            F.lag("y", 1).over(w).alias("ly"),
        )
        .filter(F.col("lx").isNotNull())
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for c in ("y", "x", "ly", "lx"):
        aggs.append(F.sum(dec(F.col(c))).alias(f"s_{c}"))
    for (a, b), nm in _GRANGER_PAIRS.items():
        aggs.append(F.sum(dec(F.col(a) * F.col(b))).alias(f"s_{nm}"))
    sums = lagged.agg(*aggs)
    as_double = sums.select(
        *[F.col(c).cast("double").alias(c) for c in sums.columns]
    )
    f1 = _granger_f_expr("y", "ly", "lx", _GRANGER_PAIRS)
    f2 = _granger_f_expr("x", "lx", "ly", _GRANGER_PAIRS)
    return as_double.select(
        F.expr(
            "stack(2, 'click', 'purchase', CAST(n AS BIGINT), "
            f"{f1}, 'purchase', 'click', CAST(n AS BIGINT), {f2}) "
            "AS (cause, effect, n_pairs, f_stat)"
        )
    ).orderBy("cause")


def a_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (URGENT vs LOW order totals) — the
    parametric partner of ``a_mann_whitney`` over the same two samples,
    with the Welch–Satterthwaite degrees of freedom. What an
    experimentation stack reports when the normal approximation is
    acceptable but variances are not poolable.

    Exactness: per-group sufficient statistics (n, Σv, Σv²) accumulate
    as decimal(38,0) ↔ HUGEINT over integer cents; the sample-variance
    NUMERATOR n·Σv² − (Σv)² stays exact integer; each group then pays
    exactly two double divisions (variance, then /n), and t / df are
    built from those with an IDENTICAL expression tree in DuckDB —
    rounded to 6 once at the end.

    Scale shape: ONE map-side-combined aggregate over the filtered fact
    table (two grouped rows); everything after is one-row arithmetic
    (allow-listed scalar cross join)."""
    o = (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
    )
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("s2"),
    )
    a = g.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("s2").alias("q1")
    )
    b = g.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("n").alias("n2"), F.col("s").alias("s2_"), F.col("s2").alias("q2")
    )
    j = a.crossJoin(F.broadcast(b))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    # exact integer variance numerators, ONE division each, then /n
    var1 = (F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1")).cast(
        "double"
    ) / (F.col("n1") * (F.col("n1") - 1)).cast("double")
    var2 = (F.col("n2") * F.col("q2") - F.col("s2_") * F.col("s2_")).cast(
        "double"
    ) / (F.col("n2") * (F.col("n2") - 1)).cast("double")
    vn1 = var1 / n1d
    vn2 = var2 / n2d
    m1 = F.col("s1").cast("double") / n1d
    m2 = F.col("s2_").cast("double") / n2d
    tstat = (m1 - m2) / F.sqrt(vn1 + vn2)
    df = (vn1 + vn2) * (vn1 + vn2) / (
        vn1 * vn1 / (n1d - 1.0) + vn2 * vn2 / (n2d - 1.0)
    )
    return j.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round((m1 - m2) / 100.0, 6).alias("mean_diff"),
        F.round(tstat, 6).alias("t_stat"),
        F.round(df, 6).alias("welch_df"),
    )


def a_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: do URGENT orders carry a different
    totalprice distribution than LOW-priority orders? The standard
    nonparametric two-sample test (no normality assumption) every
    experimentation/QA stack keeps beside the t-test (``ev_ab_test``).

    Rank statistics without a global sort: U₁ counts B-before-A pairs,
    U₁ = #{b < a} + ½·#{ties}, so the whole test reduces to per-VALUE
    aggregates plus a prefix sum of B-counts over distinct values. The
    prefix sum is TWO-LEVEL — intra-bucket window partitioned by
    ``v div 1e6`` (distributed) + a cumulative over the ~600 one-row
    bucket totals — so no single partition ever holds the full distinct
    domain; this is the scalable rank recipe, not ``rank() OVER ()``.

    Exactness: 2·U₁ (integer, tie-halves cancel), tie correction
    T = Σ(c³−c), and the counts all accumulate as decimal(38,0) ↔
    HUGEINT; z uses the textbook normal approximation
    σ² = (n₁n₂/12)·((N+1) − T/(N(N−1))) computed with an IDENTICAL
    double expression tree in both engines, rounded to 6."""
    o = (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .withColumn(
            "is_a", (F.col("o_orderpriority") == "1-URGENT").cast("long")
        )
    )
    pv = o.groupBy("v").agg(
        F.sum("is_a").cast("decimal(38,0)").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("decimal(38,0)").alias("cb"),
    )
    pv = pv.withColumn("bkt", F.expr("v div 1000000"))
    intra = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pv = pv.withColumn(
        "cb_in", F.coalesce(F.sum("cb").over(intra), F.lit(0).cast("decimal(38,0)"))
    )
    btot = pv.groupBy("bkt").agg(F.sum("cb").alias("cb_bkt"))
    boff = btot.withColumn(
        "cb_off",
        F.coalesce(
            F.sum("cb_bkt").over(
                Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("decimal(38,0)"),
        ),
    ).select("bkt", "cb_off")
    enriched = pv.join(boff, "bkt").select(
        "ca",
        "cb",
        (F.col("cb_in") + F.col("cb_off")).alias("cb_before"),
    )
    stats = enriched.agg(
        F.sum("ca").alias("n1"),
        F.sum("cb").alias("n2"),
        F.sum(
            F.col("ca") * (F.lit(2).cast("decimal(38,0)") * F.col("cb_before"))
            + F.col("ca") * F.col("cb")
        ).alias("u1_2"),
        F.sum(
            (F.col("ca") + F.col("cb")) * (F.col("ca") + F.col("cb"))
            * (F.col("ca") + F.col("cb"))
            - (F.col("ca") + F.col("cb"))
        ).alias("ties_t"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    td = F.col("ties_t").cast("double")
    sigma2 = (n1d * n2d / 12.0) * ((nd + 1.0) - td / (nd * (nd - 1.0)))
    return stats.select(
        F.col("n1").cast("long").alias("n_urgent"),
        F.col("n2").cast("long").alias("n_low"),
        (F.col("u1_2").cast("double") / 2.0).alias("u_stat"),
        F.round(
            (F.col("u1_2").cast("double") - n1d * n2d)
            / (2.0 * F.sqrt(sigma2)),
            6,
        ).alias("z_score"),
    )


def a_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test: does the account-balance
    DISTRIBUTION differ between the BUILDING and MACHINERY customer
    segments? The distribution-shape sibling of ``a_mann_whitney`` (which
    only sees location shift) — the pair every experimentation stack runs
    together.

    Scalable ECDF without a global sort: per distinct value, counts
    (ca, cb) roll up once; the inclusive cumulative count is the same
    TWO-LEVEL prefix sum as the Mann-Whitney recipe (intra-bucket window
    on ``v div 1e6`` + cumulative over the one-row-per-bucket totals), so
    no partition ever holds the whole distinct domain. The KS statistic
    stays INTEGER until the last step: D = max |Fa − Fb| is computed as
    max |ca_le·n2 − cb_le·n1| over HUGEINT-exact cross-multiplications,
    then divided by n1·n2 ONCE — no per-row double ECDFs to drift.
    z = D·sqrt(n1·n2/(n1+n2)), the large-sample KS scaling."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.floor(F.col("c_acctbal") * 100).cast("long").alias("v"),
            (F.col("c_mktsegment") == "BUILDING").cast("long").alias("is_a"),
        )
    )
    pv = c.groupBy("v").agg(
        F.sum("is_a").cast("decimal(38,0)").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("decimal(38,0)").alias("cb"),
    )
    pv = pv.withColumn("bkt", F.expr("v div 1000000"))
    intra = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pv = (
        pv.withColumn("ca_in", F.sum("ca").over(intra))
        .withColumn("cb_in", F.sum("cb").over(intra))
    )
    btot = pv.groupBy("bkt").agg(
        F.sum("ca").alias("ca_bkt"), F.sum("cb").alias("cb_bkt")
    )
    pre = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "bkt",
        F.coalesce(F.sum("ca_bkt").over(pre), F.lit(0).cast("decimal(38,0)")).alias("ca_off"),
        F.coalesce(F.sum("cb_bkt").over(pre), F.lit(0).cast("decimal(38,0)")).alias("cb_off"),
    )
    enriched = pv.join(boff, "bkt").select(
        (F.col("ca_in") + F.col("ca_off")).alias("ca_le"),
        (F.col("cb_in") + F.col("cb_off")).alias("cb_le"),
    )
    # the cross-multiplied sup-distance needs n1/n2 per row: broadcast the
    # one-row totals back (a one-row aggregate cross join — the standard
    # bounded anchor; allow-listed BNLJ). max cumulative = group size.
    totals = enriched.agg(
        F.max("ca_le").alias("n1"), F.max("cb_le").alias("n2")
    )
    d_num = (
        enriched.crossJoin(F.broadcast(totals))
        .agg(
            F.max(
                F.abs(F.col("ca_le") * F.col("n2") - F.col("cb_le") * F.col("n1"))
            ).alias("d_num"),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
        )
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    d = F.col("d_num").cast("double") / (n1d * n2d)
    return d_num.select(
        F.col("n1").cast("long").alias("n_building"),
        F.col("n2").cast("long").alias("n_machinery"),
        F.round(d, 6).alias("d_stat"),
        F.round(d * F.sqrt(n1d * n2d / (n1d + n2d)), 6).alias("ks_z"),
    )


def a_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H test: does account balance differ across ALL five
    market segments at once? The k-group generalization of
    ``a_mann_whitney`` (one-way ANOVA on ranks, no normality assumption).

    Rank sums without a global sort: with per-value counts c_v and
    exclusive cumulative cum_v (the two-level prefix recipe), every row at
    value v has midrank cum_v + (c_v+1)/2, so each group's DOUBLED rank
    sum 2·R_g = Σ_v cg_v·(2·cum_v + c_v + 1) is exactly integral —
    HUGEINT-exact on both engines. The k per-group (2R)²/n terms are a
    BOUNDED list (k = 5 segments): folded in pinned segment order via
    sort_array + F.aggregate ↔ DuckDB list(ORDER BY) + list_reduce, per
    the oracle-exactness conventions. Tie correction Σ(c³−c) as in MWU."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("v"),
    )
    cell = c.groupBy("v", "seg").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("cg")
    )
    pv = cell.groupBy("v").agg(F.sum("cg").alias("c"))
    pv = pv.withColumn("bkt", F.expr("v div 1000000"))
    intra = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pv = pv.withColumn(
        "c_in", F.coalesce(F.sum("c").over(intra), F.lit(0).cast("decimal(38,0)"))
    )
    btot = pv.groupBy("bkt").agg(F.sum("c").alias("c_bkt"))
    boff = btot.select(
        "bkt",
        F.coalesce(
            F.sum("c_bkt").over(
                Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("c_off"),
    )
    ranked = pv.join(boff, "bkt").select(
        "v", "c", (F.col("c_in") + F.col("c_off")).alias("cum")
    )
    per_group = (
        cell.join(ranked, "v")
        .groupBy("seg")
        .agg(
            F.sum("cg").alias("n_g"),
            F.sum(
                F.col("cg")
                * (F.lit(2).cast("decimal(38,0)") * F.col("cum") + F.col("c") + 1)
            ).alias("r2_g"),  # 2 * rank sum of group g
        )
    )
    ties = ranked.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("ties_t"),
    )
    # fold the 5 bounded group terms in pinned (segment) order
    folded = per_group.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("seg").alias("seg"),
                        F.col("r2_g").cast("double").alias("r2"),
                        F.col("n_g").cast("double").alias("ng"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + (s["r2"] * s["r2"]) / s["ng"],
        ).alias("sum_r2_over_n4"),  # Σ (2R)²/n = 4·Σ R²/n
        F.count(F.lit(1)).alias("k"),
    )
    out = folded.crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    h = (F.lit(12.0) / (nd * (nd + 1.0))) * (
        F.col("sum_r2_over_n4") / 4.0
    ) - 3.0 * (nd + 1.0)
    corr = 1.0 - F.col("ties_t").cast("double") / (nd * nd * nd - nd)
    return out.select(
        F.col("n").cast("long").alias("n_total"),
        F.col("k").cast("int").alias("k_groups"),
        F.round(h, 6).alias("h_stat"),
        F.round(h / corr, 6).alias("h_tie_corrected"),
    )


def a_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b rank correlation between line-item quantity and
    discount — the tie-robust alternative to Pearson (``a_correlation``)
    for ordinal pairs.

    The naive definition is O(n²) pairs; HERE both variables live in
    BOUNDED DOMAINS (quantity: 50 ints, discount: 11 cents values), so
    the sufficient statistic is the 550-cell contingency table, and
    concordant/discordant pair counts are cell-pair cross products —
    O(cells²) ≈ 3·10⁵ regardless of row count (the same bounded-domain
    collapse as ``a_chi_square``). The cell-pair join is a broadcast
    non-equi join over the tiny cell frame (allow-listed BNLJ); counts
    stay HUGEINT-exact, τ-b does its two sqrt divisions once."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("y"),
    )
    cells = li.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n")
    )
    c2 = cells.select(
        F.col("x").alias("x2"), F.col("y").alias("y2"), F.col("n").alias("n2")
    )
    pairs = cells.join(
        F.broadcast(c2), F.col("x") < F.col("x2"), "inner"
    )
    cd = pairs.agg(
        F.sum(
            F.when(F.col("y") < F.col("y2"), F.col("n") * F.col("n2")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("concordant"),
        F.sum(
            F.when(F.col("y") > F.col("y2"), F.col("n") * F.col("n2")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("discordant"),
    )
    margins = cells.agg(F.sum("n").alias("n"))
    tx = (
        cells.groupBy("x")
        .agg(F.sum("n").alias("nx"))
        .agg(F.sum(F.col("nx") * (F.col("nx") - 1)).alias("tx2"))
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("n").alias("ny"))
        .agg(F.sum(F.col("ny") * (F.col("ny") - 1)).alias("ty2"))
    )
    out = (
        cd.crossJoin(F.broadcast(margins))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    nd = F.col("n").cast("double")
    n0_2 = nd * (nd - 1.0)  # 2·C(n,2)
    denom = F.sqrt(n0_2 - F.col("tx2").cast("double")) * F.sqrt(
        n0_2 - F.col("ty2").cast("double")
    )
    return out.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("concordant").cast("long").alias("concordant"),
        F.col("discordant").cast("long").alias("discordant"),
        F.round(
            2.0
            * (F.col("concordant") - F.col("discordant")).cast("double")
            / denom,
            6,
        ).alias("tau_b"),
    )


def a_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test on the market-segment × order-priority
    contingency table (does segment predict priority?) plus Cramér's V
    effect size — the categorical counterpart of ``a_mann_whitney``/
    ``ev_ab_test`` in the testing toolkit.

    The full R×C grid is materialized (distinct segments × distinct
    priorities, both vocabulary-bounded broadcasts) so EMPTY cells still
    contribute their expected counts — computing chi² only over observed
    cells understates it. Exact integer sufficient statistics (cell,
    row, column, grand counts); each cell's (n−e)²/e term converts to
    double with an identical expression tree in both engines, and the
    25-term sum runs as a canonical (seg, prio)-ordered sequential fold
    (``sort_array(collect_list)`` + ``F.aggregate`` ↔ DuckDB
    ``list(... ORDER BY)`` + ``list_reduce``) — order-pinned doubles,
    no summation nondeterminism.

    Scale shape: ONE fact-table shuffle (the groupBy), everything after
    runs on the R×C grid — bounded by the category vocabularies, not the
    data."""
    oc = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("prio"),
        )
    )
    cells = oc.groupBy("seg", "prio").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        cells.select("seg")
        .distinct()
        .crossJoin(F.broadcast(cells.select("prio").distinct()))
        .join(cells, ["seg", "prio"], "left_outer")
        .fillna(0, ["n"])
    )
    rows_t = cells.groupBy("seg").agg(F.sum("n").alias("r"))
    cols_t = cells.groupBy("prio").agg(F.sum("n").alias("c"))
    nn = F.broadcast(cells.agg(F.sum("n").alias("nn")))
    e = (
        F.col("r").cast("double")
        * F.col("c").cast("double")
        / F.col("nn").cast("double")
    )
    term = (
        (F.col("n").cast("double") - e)
        * (F.col("n").cast("double") - e)
        / e
    )
    per_cell = (
        grid.join(rows_t, "seg")
        .join(cols_t, "prio")
        .crossJoin(nn)
        .select("seg", "prio", "nn", term.alias("term"))
    )
    folded = per_cell.groupBy().agg(
        F.first("nn").alias("n_obs"),
        F.countDistinct("seg").alias("nr"),
        F.countDistinct("prio").alias("nc"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("seg", "prio", "term"))),
            F.lit(0.0),
            lambda a, x: a + x["term"],
        ).alias("chi2"),
    )
    dof = (F.col("nr") - 1) * (F.col("nc") - 1)
    minrc = F.least(F.col("nr") - 1, F.col("nc") - 1).cast("double")
    return folded.select(
        F.col("n_obs").cast("long").alias("n_obs"),
        dof.cast("int").alias("dof"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n_obs").cast("double") * minrc)), 6
        ).alias("cramers_v"),
    )


_MARKOV_SCALE = 1_000_000_000_000  # picounits of probability mass
_MARKOV_ITERS = 20  # fixed chain-walk depth (both engines replay exactly)
_MARKOV_GEN: dict[str, float] = {}  # events.parquet mtime per sf_dir


def _markov_journeys(spark: SparkSession, sf_dir: str):
    """Shared journey derivation for Markov attribution: journey touches
    (events strictly before the user's FIRST purchase, purchase events
    excluded; all events when the user never purchases), the per-user
    (src, dst) transition stream with START/CONV/NULL boundary states,
    and the has-purchase flag. Returns (journey_touches, transitions).

    ``jt`` is PERSISTED (mtime-generation-guarded, the _THEIL_GEN rule):
    every attribution consumer reads it through ≥ 2 plan branches
    (transitions + per-channel touch counts in ev_markov_attribution;
    three vocabulary/mask/count branches in ev_shapley_attribution), and
    Catalyst shares nothing across branches — without the cache each
    branch re-runs the first-purchase window over the whole event table."""
    import os as _os

    from ._cache import persist_bounded
    from ._cache import release as _release

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    w_user = Window.partitionBy("user_id")
    fpo = F.min(
        F.when(
            F.col("event_type") == "purchase", F.struct("ts_us", "event_id")
        )
    ).over(w_user)
    tagged = ev.withColumn("fpo", fpo)
    _src = _os.path.join(sf_dir, "events.parquet")
    _gen = _os.path.getmtime(_src) if _os.path.exists(_src) else 0.0
    if _MARKOV_GEN.get(sf_dir) not in (None, _gen):
        _release(f"markov_jt:{sf_dir}")
        _release(f"shap_touch:{sf_dir}")
    _MARKOV_GEN[sf_dir] = _gen
    jt = persist_bounded(
        tagged.filter(
            (F.col("event_type") != "purchase")
            & (
                F.col("fpo").isNull()
                | (F.struct("ts_us", "event_id") < F.col("fpo"))
            )
        ),
        f"markov_jt:{sf_dir}",
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    trans = jt.select(
        F.coalesce(F.lag("event_type").over(w_ord), F.lit("START")).alias(
            "src"
        ),
        F.col("event_type").alias("dst"),
    )
    has_p = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("has_p")
    )
    lt = jt.groupBy("user_id").agg(
        F.max_by("event_type", F.struct("ts_us", "event_id")).alias("lt")
    )
    term = (
        has_p.join(lt, "user_id", "left_outer")
        .select(
            F.coalesce(F.col("lt"), F.lit("START")).alias("src"),
            F.when(F.col("has_p") == 1, "CONV").otherwise("NULL").alias("dst"),
        )
    )
    return jt, trans.unionByName(term)


def _markov_walk(
    counts: list[tuple[str, str, int]]
) -> tuple[dict[str, int], int]:
    """Exact integer chain walk over a vocabulary-bounded transition
    matrix (driver-side — the matrix is ≤ (|channels|+3)² rows of
    METADATA, the same bounded-anchor rule as the IVF centroid list).
    For the full chain and each single-channel-removed variant (the
    removed channel's out-edges collapse to NULL), runs
    ``_MARKOV_ITERS`` steps of p'(d) = Σ_s p(s)·n(s,d) div out(s)
    (per-edge truncation — order-independent integer arithmetic the
    DuckDB oracle replays verbatim) and reads the absorbed CONV mass.
    Returns ({channel: removal_ppm}, p_conv_full)."""
    base = [(s, d, n) for s, d, n in counts]
    base += [("CONV", "CONV", 1), ("NULL", "NULL", 1)]
    channels = sorted(
        {d for _, d, _ in counts if d not in ("CONV", "NULL")}
    )

    def pconv(removed: str | None) -> int:
        edges = [
            (s, d, n) for s, d, n in base if removed is None or s != removed
        ]
        if removed is not None:
            edges.append((removed, "NULL", 1))
        out: dict[str, int] = {}
        for s, _, n in edges:
            out[s] = out.get(s, 0) + n
        p = {"START": _MARKOV_SCALE}
        for _ in range(_MARKOV_ITERS):
            nxt: dict[str, int] = {}
            for s, d, n in edges:
                if s in p:
                    nxt[d] = nxt.get(d, 0) + p[s] * n // out[s]
            p = nxt
        return p.get("CONV", 0)

    full = pconv(None)
    removal = {
        c: (0 if full == 0 else 1_000_000 - pconv(c) * 1_000_000 // full)
        for c in channels
    }
    return removal, full


def ev_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain (removal-effect) multi-touch attribution — the
    data-driven model that replaces ``ev_attribution``'s last-touch
    heuristic: build the first-order channel-transition chain from user
    journeys (START → touches → CONV/NULL), compute the conversion
    probability of the full chain and of each chain with one channel
    removed (its out-edges collapse to NULL — "what if this channel
    didn't exist"), and credit purchase revenue proportionally to each
    channel's removal effect. The standard Shapley-adjacent attribution
    every marketing-science stack ships.

    Determinism: the walk is pure integer fixed point (picounit mass,
    per-edge truncating division), the removal shares are integer ppm,
    and the revenue split is an integer cents division — DuckDB replays
    the identical {_MARKOV_ITERS}-step recurrence (variant-vectorized
    unrolled CTEs), so the compare is exact.

    Scale shape: journeys and transitions are ONE user-keyed shuffle
    (window + lag — the ev_attribution shape); the transition matrix is
    vocabulary-bounded (≤ (|channels|+3)² rows) and collected as a
    bounded driver anchor; the chain walk costs O(edges · iters) on
    that metadata; the output re-joins the DISTRIBUTED per-channel
    touch counts with the literal removal table plus a ONE-ROW revenue
    anchor (allow-listed scalar cross join)."""
    jt, trans = _markov_journeys(spark, sf_dir)
    counts = [
        (r.src, r.dst, int(r.n))
        for r in trans.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    removal, _full = _markov_walk(counts)
    sppm = sum(removal.values())
    rm = spark.createDataFrame(
        sorted(removal.items()), "channel string, removal_ppm long"
    )
    nt = jt.groupBy(F.col("event_type").alias("channel")).agg(
        F.count(F.lit(1)).alias("n_touches")
    )
    tot = F.broadcast(
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.coalesce(
                F.sum(F.floor(F.col("value") * 100).cast("long")), F.lit(0)
            ).alias("cents")
        )
    )
    return (
        nt.join(F.broadcast(rm), "channel")
        .crossJoin(tot)
        .select(
            "channel",
            "n_touches",
            "removal_ppm",
            F.expr(
                f"CAST(CASE WHEN {sppm}L = 0 THEN 0 ELSE "
                f"(CAST(cents AS DECIMAL(38,0)) * removal_ppm) div {sppm}L "
                f"END AS BIGINT)"
            ).alias("attributed_cents"),
        )
        .orderBy("channel")
    )


def ev_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value multi-touch attribution — the game-theoretic
    gold standard next to ``ev_markov_attribution``'s removal-effect
    model: each converting user's pre-purchase journey reduces to its
    DISTINCT-channel coalition, the characteristic function v(S) counts
    conversions whose coalition is covered by S, and each channel's
    Shapley value φ_i = Σ_{S∌i} |S|!·(n−1−|S|)!·(v(S∪i) − v(S)) / n!
    credits purchase revenue. v is monotone by construction, so every
    φ_i ≥ 0.

    Determinism: φ is computed in EXACT integer arithmetic scaled by n!
    (``shapley_num``), the revenue split is one integer division, and
    the share is one double division — DuckDB replays the identical
    coalition algebra (bit_or masks, subset-sum v table, factorial
    weights), so the compare is exact.

    Scale shape: journeys are the shared ``_markov_journeys`` user-keyed
    shuffle; per-user coalition masks are ONE bit_or aggregate; the
    (mask → count) table is bounded by 2^|channels| (vocabulary-bounded;
    guarded ≤ 2^12) and collected as a driver anchor, where the 2^n·n
    Shapley sweep is metadata arithmetic; the output re-joins the
    DISTRIBUTED per-channel user counts with the literal φ table plus
    the ONE-ROW revenue anchor (allow-listed scalar cross join)."""
    import math

    from ._cache import persist_bounded

    jt, _ = _markov_journeys(spark, sf_dir)
    buyers = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    # persisted: THREE plan branches read it (channel vocabulary, the
    # bit_or mask rollup, the per-channel user counts) — released by the
    # _markov_journeys mtime guard alongside the jt frame it derives from
    touches = persist_bounded(
        jt.join(buyers, "user_id").select(
            "user_id", F.col("event_type").alias("channel")
        ),
        f"shap_touch:{sf_dir}",
    )
    chans = sorted(
        r.channel for r in touches.select("channel").distinct().collect()
    )
    if len(chans) > 12:
        raise ValueError(
            f"shapley attribution needs a bounded channel vocabulary; "
            f"got {len(chans)} channels (cap 12: 2^n coalition table)"
        )
    n = len(chans)
    bits = {c: 1 << i for i, c in enumerate(chans)}
    bit_col = F.lit(None).cast("int")
    for c, b in bits.items():
        bit_col = F.when(F.col("channel") == c, F.lit(b)).otherwise(bit_col)
    masks = (
        touches.select("user_id", bit_col.alias("b"))
        .groupBy("user_id")
        .agg(F.expr("bit_or(b)").alias("mask"))
    )
    mcnt = {
        int(r.mask): int(r.n)
        for r in masks.groupBy("mask").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    v = [0] * (1 << n)
    for s in range(1 << n):
        v[s] = sum(c for m, c in mcnt.items() if m & s == m)
    phi = {}
    for c in chans:
        b = bits[c]
        acc = 0
        for s in range(1 << n):
            if s & b:
                continue
            k = bin(s).count("1")
            acc += (
                math.factorial(k)
                * math.factorial(n - 1 - k)
                * (v[s | b] - v[s])
            )
        phi[c] = acc  # exact, in units of conversions / n!
    sphi = sum(phi.values())
    lit = spark.createDataFrame(
        sorted(phi.items()), "channel string, shapley_num long"
    )
    nu = touches.groupBy("channel").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    cents = F.broadcast(
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.coalesce(
                F.sum(F.floor(F.col("value") * 100).cast("long")), F.lit(0)
            ).alias("cents")
        )
    )
    return (
        nu.join(F.broadcast(lit), "channel")
        .crossJoin(cents)
        .select(
            "channel",
            F.col("n_users").cast("long").alias("n_users"),
            "shapley_num",
            F.round(
                F.col("shapley_num").cast("double") / F.lit(float(sphi)), 6
            ).alias("shapley_share"),
            F.expr(
                f"CAST(CASE WHEN {sphi}L = 0 THEN 0 ELSE "
                f"(CAST(cents AS DECIMAL(38,0)) * shapley_num) div {sphi}L "
                f"END AS BIGINT)"
            ).alias("attributed_cents"),
        )
        .orderBy("channel")
    )


def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test on the daily revenue series — the
    nonparametric "is there a monotone trend at all" hypothesis test
    read BEFORE ``ts_theil_sen``'s slope estimate (the two are the
    classic pair: MK decides, Theil–Sen quantifies). S = Σ_{i<j}
    sign(x_j − x_i) with the tie-corrected normal approximation
    Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 and the standard
    continuity correction on z.

    Exactness: S and both variance terms are EXACT integers (the sign
    sum over the calendar-bounded pair grid, the tie fold over the
    value histogram); z is one sqrt + one division on doubles built
    from those integers — identical tree in DuckDB.

    Scale shape: the same spread broadcast pair grid as ``ts_theil_sen``
    (days² bounded by the calendar at any SF); ties reduce on a
    value-bounded histogram; everything else is one-row arithmetic
    (allow-listed scalar cross joins)."""
    daily = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("x"))
    )
    par = spark.sparkContext.defaultParallelism
    a = daily.repartition(par).select(
        F.col("day").alias("di"), F.col("x").alias("xi")
    )
    b = daily.select(F.col("day").alias("dj"), F.col("x").alias("xj"))
    s_row = F.broadcast(
        a.join(F.broadcast(b), F.col("di") < F.col("dj"))
        .agg(
            F.sum(
                F.when(F.col("xj") > F.col("xi"), 1)
                .when(F.col("xj") < F.col("xi"), -1)
                .otherwise(0)
                .cast("decimal(38,0)")
            ).alias("s_stat")
        )
    )
    nt = F.broadcast(
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("tsize"))
        .agg(
            F.sum("tsize").alias("n"),
            F.sum(
                F.col("tsize")
                * (F.col("tsize") - 1)
                * (2 * F.col("tsize") + 5)
            ).alias("tie_term"),
        )
    )
    nd = F.col("n")
    var18 = nd * (nd - 1) * (2 * nd + 5) - F.col("tie_term")
    s = F.col("s_stat")
    zs = F.when(s > 0, (s - 1).cast("double")).when(
        s < 0, (s + 1).cast("double")
    ).otherwise(F.lit(0.0))
    z = zs / F.sqrt(var18.cast("double") / 18.0)
    return s_row.crossJoin(nt).select(
        nd.cast("long").alias("n_days"),
        s.cast("long").alias("s_stat"),
        var18.cast("long").alias("var_s_x18"),
        F.round(z, 6).alias("z"),
    )


def ev_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert histogram: for every converting user, the lag from
    their FIRST event of any type to their FIRST purchase, bucketed into
    whole days, with the cumulative share of converters per bucket — the
    "how long does the funnel take" curve every growth stack reads next
    to ``ev_funnel`` (median-lag targeting, re-engagement timing).

    Exactness: first-event/first-purchase resolve on the (ts, event_id)
    tiebreak (the _markov_journeys rule); the lag is integer microseconds
    bucketed by integer division; the cumulative share is ONE double
    division per bucket over exact integer prefix counts.

    Scale shape: ONE user-keyed aggregate (both firsts in the same
    groupBy — no join), then a day-bounded histogram; the cumulative
    window runs on that bounded frame."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.struct("ts_us", "event_id")).alias("fa"),
        F.min(
            F.when(
                F.col("event_type") == "purchase",
                F.struct("ts_us", "event_id"),
            )
        ).alias("fp"),
    )
    lags = firsts.filter(F.col("fp").isNotNull()).select(
        F.expr("(fp.ts_us - fa.ts_us) div 86400000000").alias("lag_days")
    )
    hist = lags.groupBy("lag_days").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    w = Window.orderBy("lag_days").rowsBetween(Window.unboundedPreceding, 0)
    tot = F.broadcast(lags.agg(F.count(F.lit(1)).alias("nv")))
    return (
        hist.withColumn("cum", F.sum("n_users").over(w))
        .crossJoin(tot)
        .select(
            F.col("lag_days").cast("long").alias("lag_days"),
            F.col("n_users").cast("long").alias("n_users"),
            F.round(
                F.col("cum").cast("double") / F.col("nv").cast("double"), 6
            ).alias("cum_share"),
        )
        .orderBy("lag_days")
    )


_THEIL_GEN: dict[str, float] = {}


def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of the daily order-revenue series: the
    MEDIAN of all pairwise slopes (x_j − x_i)/(t_j − t_i), plus the
    median-residual intercept — the outlier-resistant complement of
    ``a_linear_trend``'s OLS line (a single promotional spike day moves
    OLS but not Theil–Sen; breakdown point 29%).

    Exactness: revenue quantizes to integer cents per day; each slope is
    ONE double division of exact integers (identical expression tree in
    DuckDB); the median is EXACT LOWER-MEDIAN SELECTION by rank (group
    slopes by value → ordered prefix counts → first value whose
    cumulative count reaches ⌈n/2⌉) — no interpolated percentile, no
    summation nondeterminism. The intercept repeats the same selection
    over per-day residuals x_t/100 − slope·t.

    Scale shape: ONE fact-table shuffle (the groupBy day) reduces to the
    CALENDAR-BOUNDED daily series (~2.5k rows at any SF); the pairwise
    grid is days² — bounded by the calendar, never by the fact table —
    built as a broadcast non-equi self-join (allow-listed, domain-
    bounded), and the two rank selections run over value-grouped frames
    no larger than the grid. The (min-day, count) and median anchors are
    one-row broadcast cross joins."""
    daily = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("x"))
    )
    anchor = F.broadcast(
        daily.agg(
            F.min("day").alias("d0"), F.count(F.lit(1)).alias("n_days")
        )
    )
    pts = daily.crossJoin(anchor).select(
        F.datediff("day", "d0").alias("ti"), "x", "n_days"
    )
    # spread the stream side BEFORE the broadcast non-equi join: AQE
    # coalesces the 2.4k-row daily frame to ONE partition, which would put
    # all days² predicate evaluations + slope divisions on one core
    # (measured 3s+4s single-core at sf0.1)
    par = spark.sparkContext.defaultParallelism
    a = pts.repartition(par).select(
        F.col("ti").alias("ti"), F.col("x").alias("xi")
    )
    b = pts.select(F.col("ti").alias("tj"), F.col("x").alias("xj"))
    slopes = (
        a.join(F.broadcast(b), F.col("ti") < F.col("tj"))
        .select(
            (
                (F.col("xj") - F.col("xi")).cast("double")
                / (F.col("tj") - F.col("ti")).cast("double")
            ).alias("s")
        )
    )

    def lower_median(
        vals: DataFrame, col: str, cache_key: str
    ) -> tuple[float, int]:
        """Exact lower-median by rank selection over ~4096 value-range
        buckets, with the bucket WALK on the driver: one (min, max,
        count) anchor, one map-side-combined bucket histogram (≤ 4096
        rows — a bounded scalar anchor, the _cosupply_edges weight-
        histogram class), then ONE TakeOrdered over the single target
        bucket (≈ n/4096 rows for any non-degenerate value spread) picks
        the k-th smallest value. This replaces the previous full-frame
        intra-bucket window (a days²-row shuffle + sort + bucket-offset
        join per median — the dominant stage of this query) with two
        tiny aggregates and a bounded top-k. Selection semantics are
        UNCHANGED (first value whose global rank reaches ⌈n/2⌉ — any
        monotone value bucketing yields the same k-th smallest value),
        so the oracle keeps its plain single-window form. The frame is
        PERSISTED because it feeds the range anchor, the histogram, and
        the bucket top-k — the days² pair join above it must derive
        once, not once per consumer."""
        from ._cache import persist_bounded

        byv = persist_bounded(vals.select(F.col(col)), cache_key)
        rng = byv.agg(
            F.min(col).alias("mn"),
            F.max(col).alias("mx"),
            F.count(F.lit(1)).alias("nv"),
        ).head()
        mn, nv = float(rng.mn), int(rng.nv)
        # identical IEEE width arithmetic as the previous in-plan form
        # (immaterial for correctness: bucketing only routes the rank walk)
        width = max((float(rng.mx) - mn) / 4096.0, 1e-12)
        b_col = F.floor((F.col(col) - F.lit(mn)) / F.lit(width)).cast("long")
        hist = sorted(
            (r.b, r.bn)
            for r in byv.groupBy(b_col.alias("b"))
            .agg(F.count(F.lit(1)).alias("bn"))
            .collect()
        )
        rank = (nv + 1) // 2
        cum = 0
        for b, bn in hist:
            if cum + bn >= rank:
                med = (
                    byv.filter(b_col == b)
                    .orderBy(col)
                    .limit(rank - cum)
                    .agg(F.max(col).alias("med"))
                    .head()
                    .med
                )
                return float(med), nv
            cum += bn
        raise RuntimeError("lower_median over an empty frame")

    # each median is ONE ROW — collect it as a bounded scalar anchor (the
    # a_heavy_hitters rule) so the days² pair join derives exactly once;
    # left as a broadcast frame, its three downstream consumers would each
    # re-derive the whole slope pipeline (measured 3× cost at sf0.1)
    # mtime-guarded cache generation: a fixture regenerated IN PLACE must
    # not be served stale ranked slopes — Spark's cache is keyed by
    # LOGICAL PLAN (unchanged on an in-place rewrite), so the old
    # generation's entries are explicitly RELEASED on an mtime change
    # (the _cosupply_edges rule), not merely re-keyed
    import os as _os

    from ._cache import release as _release

    _src = _os.path.join(sf_dir, "orders.parquet")
    _gen = _os.path.getmtime(_src) if _os.path.exists(_src) else 0.0
    if _THEIL_GEN.get(sf_dir) not in (None, _gen):
        _release(f"ts_theil_s:{sf_dir}")
        _release(f"ts_theil_r:{sf_dir}")
    _THEIL_GEN[sf_dir] = _gen
    med_s, n_pairs = lower_median(slopes, "s", f"ts_theil_s:{sf_dir}")
    resid = pts.select(
        (
            F.col("x").cast("double") / 100.0
            - (F.lit(med_s) / 100.0) * F.col("ti").cast("double")
        ).alias("r")
    )
    med_r, _ = lower_median(resid, "r", f"ts_theil_r:{sf_dir}")
    return anchor.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.lit(n_pairs).cast("long").alias("n_pairs"),
        F.round(F.lit(med_s) / 100.0, 6).alias("slope_per_day"),
        F.round(F.lit(med_r), 6).alias("intercept"),
    )


def ts_trend_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend-adjusted outlier DAYS — ``ts_decompose``'s detrending
    composed with ``a_iqr_outliers``'s Tukey fences (the decomposition →
    anomaly lifecycle): a raw-revenue fence flags every day of a growth
    period, so the census runs on the DETRENDED series d_t = 7·x_t −
    Σ_{t−3..t+3} x (exact integers, no division inside the series), and
    emits the days whose detrended value falls outside the 1.5·IQR
    fences with their direction.

    Determinism: quartiles of d use the exact cross-engine-stable
    ``percentile`` interpolation rounded to 4 (the a_iqr precedent);
    fences stay unrounded (identical IEEE arithmetic from identical
    inputs); membership compares doubles both engines derived the same
    way.

    Scale shape: one fact shuffle reduces to the calendar-bounded daily
    series; the window, quartiles, and census all run on that bounded
    frame; output is the outlier days only."""
    daily = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("x"))
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    det = (
        daily.withColumn("tsum", F.sum("x").over(w7))
        .withColumn("tcnt", F.count(F.lit(1)).over(w7))
        .filter(F.col("tcnt") == 7)
        .select(
            "day",
            "x",
            (F.lit(7).cast("decimal(38,0)") * F.col("x") - F.col("tsum"))
            .cast("double")
            .alias("d"),
        )
    )
    fences = F.broadcast(
        det.agg(
            F.round(F.percentile("d", F.lit(0.25)), 4).alias("q1"),
            F.round(F.percentile("d", F.lit(0.75)), 4).alias("q3"),
        ).select(
            (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
            (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
        )
    )
    return (
        det.crossJoin(fences)
        .filter((F.col("d") < F.col("lo")) | (F.col("d") > F.col("hi")))
        .select(
            "day",
            F.round(F.col("x").cast("double") / 100.0, 2).alias("revenue"),
            F.col("d").cast("long").alias("detrended_x7"),
            F.when(F.col("d") < F.col("lo"), F.lit("low"))
            .otherwise(F.lit("high"))
            .alias("direction"),
        )
        .orderBy("day")
    )


def ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily revenue series
    (STL-lite): trend = centered 7-day moving average, seasonal = mean
    DETRENDED value per weekday, plus the seasonal-STRENGTH statistic
    1 − Var(remainder)/Var(detrended) — the decomposition
    ``ts_seasonality``'s raw weekday index skips (a trending series
    fakes raw weekday effects; detrending removes that bias), and the
    standard pre-model diagnostic (strength ≈ 0 ⇒ don't bother with a
    seasonal term).

    Exactness: revenue is integer cents; the centered trend is a 7-day
    integer SUM, so the detrended value d_t = 7·x_t − trend_sum_t stays
    an exact integer (no division inside the series). Per-weekday sums
    Σd, Σd², counts are exact; Var(remainder) uses the closed form
    Σd² − Σ_w (Σ_w d)²/c_w, whose seven per-weekday terms fold in dow
    order (order-pinned doubles). One division per output value.

    Scale shape: one fact shuffle (groupBy day) reduces to the
    |days|-bounded series (~2.5k rows at any SF — the ts_autocorrelation
    rule); window, weekday aggregate, and the one-row strength anchor
    all run on bounded frames."""
    daily = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("x"))
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    det = (
        daily.withColumn("tsum", F.sum("x").over(w7))
        .withColumn("tcnt", F.count(F.lit(1)).over(w7))
        .filter(F.col("tcnt") == 7)
        .select(
            F.weekday("day").alias("dow"),
            (F.lit(7).cast("decimal(38,0)") * F.col("x") - F.col("tsum")).alias("d"),
        )
    )
    per_dow = det.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("d").alias("sn"),
        F.sum(F.col("d") * F.col("d")).alias("sn2"),
    )
    init = F.struct(
        F.lit(0.0).alias("sd2"),
        F.lit(0.0).alias("swn"),
        F.lit(0.0).alias("sd"),
        F.lit(0.0).alias("n"),
    )

    def step(acc, e):
        return F.struct(
            (acc["sd2"] + e["sn2"].cast("double")).alias("sd2"),
            (
                acc["swn"]
                + e["sn"].cast("double")
                * e["sn"].cast("double")
                / e["n_days"].cast("double")
            ).alias("swn"),
            (acc["sd"] + e["sn"].cast("double")).alias("sd"),
            (acc["n"] + e["n_days"].cast("double")).alias("n"),
        )

    strength = F.broadcast(
        per_dow.agg(
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.struct("dow", "n_days", "sn", "sn2"))
                ),
                init,
                step,
            ).alias("st")
        ).select(
            F.round(
                F.lit(1.0)
                - (F.col("st.sd2") - F.col("st.swn"))
                / (
                    F.col("st.sd2")
                    - F.col("st.sd") * F.col("st.sd") / F.col("st.n")
                ),
                6,
            ).alias("seasonal_strength")
        )
    )
    return (
        per_dow.crossJoin(strength)
        .select(
            F.col("dow").cast("int").alias("dow"),
            "n_days",
            F.round(
                F.col("sn").cast("double")
                / (7.0 * F.col("n_days").cast("double"))
                / 100.0,
                6,
            ).alias("seasonal_dollars"),
            "seasonal_strength",
        )
        .orderBy("dow")
    )


def a_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the single-number inequality
    summary under ``ev_pareto_share``'s decile view (G = 0 everyone
    spends alike, G → 1 one whale carries the book).

    Closed form over ascending ranks: G = (2·Σ i·sᵢ − (n+1)·Σs)/(n·Σs).
    The rank-weighted sum is tie-order-INVARIANT (a tie group's
    contribution depends only on the sum of its ranks), so ranks can
    come from the scalable TWO-LEVEL prefix recipe (intra-bucket
    row_number partitioned by ``cents div 1e9`` + cumulative bucket
    offsets — the a_mann_whitney shape, no global single-partition
    sort). All sufficient statistics accumulate as decimal(38,0) ↔
    HUGEINT; ONE double division at the end."""
    per_cust = (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("o_custkey")
        .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("s"))
    )
    bkt = per_cust.withColumn("bkt", F.expr("s div 1000000000"))
    intra = Window.partitionBy("bkt").orderBy("s", "o_custkey")
    bkt = bkt.withColumn("ir", F.row_number().over(intra))
    boff = (
        bkt.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("bn"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("bn").over(
                    Window.orderBy("bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "off")
    )
    ranked = bkt.join(boff, "bkt").select(
        "s", ((F.col("off") + F.col("ir")).cast("decimal(38,0)")).alias("i")
    )
    stats = ranked.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("s").alias("ts"),
        F.sum(F.col("i") * F.col("s")).alias("ws"),
    )
    gini = (
        (
            F.lit(2).cast("decimal(38,0)") * F.col("ws")
            - (F.col("n") + 1) * F.col("ts")
        ).cast("double")
        / (F.col("n") * F.col("ts")).cast("double")
    )
    return stats.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("ts").cast("long").alias("total_cents"),
        F.round(gini, 6).alias("gini"),
    )


QUERIES = {
    "a_rfm_segments": a_rfm_segments,
    "ev_funnel": ev_funnel,
    "ev_drift_psi": ev_drift_psi,
    "a_profile_table": a_profile_table,
    "ev_retention": ev_retention,
    "ev_transition_matrix": ev_transition_matrix,
    "ev_top_paths": ev_top_paths,
    "ev_churn_curve": ev_churn_curve,
    "ev_stickiness": ev_stickiness,
    "ev_reach_curve": ev_reach_curve,
    "ev_cuped": ev_cuped,
    "ev_pareto_share": ev_pareto_share,
    "ev_attribution": ev_attribution,
    "ev_peak_concurrency": ev_peak_concurrency,
    "ev_anomaly_mad": ev_anomaly_mad,
    "ts_holt_forecast": ts_holt_forecast,
    "ts_holt_winters": ts_holt_winters,
    "ts_forecast_backtest": ts_forecast_backtest,
    "ts_seasonality": ts_seasonality,
    "ev_ltv_cohort": ev_ltv_cohort,
    "ts_ohlc_resample": ts_ohlc_resample,
    "a_changepoint_cusum": a_changepoint_cusum,
    "a_benford_digits": a_benford_digits,
    "a_correlation": a_correlation,
    "a_linear_trend": a_linear_trend,
    "ev_ab_test": ev_ab_test,
    "w_ema": w_ema,
    "w_running_total": w_running_total,
    "w_lag_delta": w_lag_delta,
    "w_moving_avg": w_moving_avg,
    "w_rolling_median": w_rolling_median,
    "w_quartiles": w_quartiles,
    "w_first_last": w_first_last,
    "w_gapfill_resample": w_gapfill_resample,
    "w_range_frame": w_range_frame,
    "a_grouping_sets": a_grouping_sets,
    "f_array_hof": f_array_hof,
    "a_approx_quantiles": a_approx_quantiles,
    "ts_autocorrelation": ts_autocorrelation,
    "a_mann_whitney": a_mann_whitney,
    "a_welch_ttest": a_welch_ttest,
    "a_chi_square": a_chi_square,
    "ev_markov_attribution": ev_markov_attribution,
    "ev_conversion_lag": ev_conversion_lag,
    "ev_shapley_attribution": ev_shapley_attribution,
    "ts_decompose": ts_decompose,
    "ts_trend_outliers": ts_trend_outliers,
    "ts_theil_sen": ts_theil_sen,
    "ts_mann_kendall": ts_mann_kendall,
    "ts_granger": ts_granger,
    "a_gini": a_gini,
    "a_ks_test": a_ks_test,
    "a_kruskal_wallis": a_kruskal_wallis,
    "a_kendall_tau": a_kendall_tau,
    "ts_cross_correlation": ts_cross_correlation,
    "a_poisson_bootstrap": a_poisson_bootstrap,
    "ev_survival_censored": ev_survival_censored,
}

_GINI_ORACLE = """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100) AS HUGEINT))
                    AS HUGEINT) AS s
        FROM orders GROUP BY 1
    ), ranked AS (
        SELECT s, CAST(row_number() OVER (ORDER BY s, o_custkey)
                       AS HUGEINT) AS i
        FROM per_cust
    ), stats AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(s) AS ts,
               sum(i * s) AS ws
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(ts AS BIGINT) AS total_cents,
           round(CAST(2 * ws - (n + 1) * ts AS DOUBLE)
                 / CAST(n * ts AS DOUBLE), 6) AS gini
    FROM stats
"""

_DECOMP_ORACLE = """
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(floor(o_totalprice * 100) AS HUGEINT))
                    AS HUGEINT) AS x
        FROM orders GROUP BY 1
    ), det AS (
        SELECT isodow(day) - 1 AS dow, 7 * x - tsum AS d
        FROM (
            SELECT day, x,
                   sum(x) OVER w AS tsum, count(*) OVER w AS tcnt
            FROM daily
            WINDOW w AS (ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ) WHERE tcnt = 7
    ), per_dow AS (
        SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
               sum(d) AS sn, sum(d * d) AS sn2
        FROM det GROUP BY dow
    ), folded AS (
        SELECT
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(CAST(sn2 AS DOUBLE) ORDER BY dow)),
                (a, x) -> a + x) AS sd2,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
                     / CAST(n_days AS DOUBLE) ORDER BY dow)),
                (a, x) -> a + x) AS swn,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(CAST(sn AS DOUBLE) ORDER BY dow)),
                (a, x) -> a + x) AS sd,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(CAST(n_days AS DOUBLE) ORDER BY dow)),
                (a, x) -> a + x) AS n
        FROM per_dow
    )
    SELECT CAST(dow AS INTEGER) AS dow, n_days,
           round(CAST(sn AS DOUBLE) / (7.0 * CAST(n_days AS DOUBLE))
                 / 100.0, 6) AS seasonal_dollars,
           round(1.0 - (sd2 - swn) / (sd2 - sd * sd / n), 6)
               AS seasonal_strength
    FROM per_dow, folded
    ORDER BY dow
"""

_CHI2_ORACLE = """
    WITH oc AS (
        SELECT c_mktsegment AS seg, o_orderpriority AS prio
        FROM orders JOIN customer ON o_custkey = c_custkey
    ), cells AS (
        SELECT seg, prio, CAST(count(*) AS BIGINT) AS n
        FROM oc GROUP BY 1, 2
    ), grid AS (
        SELECT s.seg, p.prio, coalesce(cells.n, 0) AS n
        FROM (SELECT DISTINCT seg FROM cells) s
        CROSS JOIN (SELECT DISTINCT prio FROM cells) p
        LEFT JOIN cells ON cells.seg = s.seg AND cells.prio = p.prio
    ), rt AS (SELECT seg, sum(n) AS r FROM cells GROUP BY seg),
    ct AS (SELECT prio, sum(n) AS c FROM cells GROUP BY prio),
    nt AS (SELECT sum(n) AS nn FROM cells),
    terms AS (
        SELECT g.seg, g.prio, nt.nn,
               (CAST(g.n AS DOUBLE)
                - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE)
                  / CAST(nt.nn AS DOUBLE))
               * (CAST(g.n AS DOUBLE)
                  - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE)
                    / CAST(nt.nn AS DOUBLE))
               / (CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE)
                  / CAST(nt.nn AS DOUBLE)) AS term
        FROM grid g JOIN rt ON rt.seg = g.seg
        JOIN ct ON ct.prio = g.prio CROSS JOIN nt
    ), folded AS (
        SELECT max(nn) AS n_obs,
               count(DISTINCT seg) AS nr, count(DISTINCT prio) AS nc,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list(term ORDER BY seg, prio)),
                   (a, x) -> a + x) AS chi2
        FROM terms
    )
    SELECT CAST(n_obs AS BIGINT) AS n_obs,
           CAST((nr - 1) * (nc - 1) AS INTEGER) AS dof,
           round(chi2, 6) AS chi2,
           round(sqrt(chi2 / (CAST(n_obs AS DOUBLE)
                 * CAST(least(nr - 1, nc - 1) AS DOUBLE))), 6) AS cramers_v
    FROM folded
"""

_ACF_ORACLE = f"""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(floor(o_totalprice * 100) AS HUGEINT))
                    AS HUGEINT) AS x
        FROM orders GROUP BY 1
    ), st AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s FROM daily
    ), dev AS (
        SELECT day, n * x - s AS dev FROM daily, st
    ), lagged AS (
        SELECT dev,
               {", ".join(f"lag(dev, {k}) OVER (ORDER BY day) AS dev_{k}"
                          for k in range(1, _ACF_MAX_LAG + 1))}
        FROM dev
    ), red AS (
        SELECT sum(dev * dev) AS den,
               {", ".join(f"sum(dev * dev_{k}) AS num_{k}, "
                          f"count(dev_{k}) AS np_{k}"
                          for k in range(1, _ACF_MAX_LAG + 1))}
        FROM lagged
    )
    SELECT CAST(lag AS INTEGER) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
           round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
    FROM (
        {" UNION ALL ".join(
            f"SELECT {k} AS lag, np_{k} AS n_pairs, num_{k} AS num, den FROM red"
            for k in range(1, _ACF_MAX_LAG + 1))}
    )
    ORDER BY lag
"""

def _xcf_oracle_sql() -> str:
    """DuckDB replay of ts_cross_correlation: same integer-deviation
    construction (n·x − Σx), same lag windows over the day-ordered
    bounded series, same single double conversion per term."""
    lag_cols = ", ".join(
        f"lag(dx, {k}) OVER (ORDER BY day) AS dx_m{k}, "
        f"lag(dy, {k}) OVER (ORDER BY day) AS dy_m{k}"
        for k in range(1, _XCF_MAX_LAG + 1)
    )
    red_aggs = ["sum(dx * dx) AS den_x", "sum(dy * dy) AS den_y",
                "sum(dx * dy) AS num_0", "count(dx) AS np_0"]
    for k in range(1, _XCF_MAX_LAG + 1):
        red_aggs.append(f"sum(dx_m{k} * dy) AS num_p{k}")
        red_aggs.append(f"count(dx_m{k}) AS np_p{k}")
        red_aggs.append(f"sum(dx * dy_m{k}) AS num_m{k}")
        red_aggs.append(f"count(dy_m{k}) AS np_m{k}")
    rows = ["SELECT 0 AS lag, np_0 AS n_pairs, num_0 AS num FROM red"]
    for k in range(1, _XCF_MAX_LAG + 1):
        rows.append(f"SELECT {k}, np_p{k}, num_p{k} FROM red")
        rows.append(f"SELECT -{k}, np_m{k}, num_m{k} FROM red")
    unpivot = "\n        UNION ALL ".join(rows)
    return f"""
        WITH ev AS (
            SELECT CAST(ts AS DATE) AS day, event_type FROM events
        ), daily AS (
            SELECT day,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        AS HUGEINT) AS x,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS HUGEINT) AS y
            FROM ev GROUP BY day
        ), stat AS (
            SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy
            FROM daily
        ), dev AS (
            SELECT day, n * x - sx AS dx, n * y - sy AS dy FROM daily, stat
        ), lagged AS (
            SELECT dx, dy, {lag_cols} FROM dev
        ), red AS (
            SELECT {", ".join(red_aggs)} FROM lagged
        )
        SELECT CAST(lag AS INTEGER) AS lag,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               round(CAST(num AS DOUBLE)
                     / sqrt(CAST((SELECT den_x FROM red) AS DOUBLE)
                            * CAST((SELECT den_y FROM red) AS DOUBLE)), 6)
                   AS xcf
        FROM ({unpivot})
        ORDER BY lag
    """


_MWU_ORACLE = """
    WITH o AS (
        SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ia
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ), pv AS (
        SELECT v, CAST(sum(ia) AS HUGEINT) AS ca,
               CAST(sum(1 - ia) AS HUGEINT) AS cb
        FROM o GROUP BY v
    ), pre AS (
        SELECT ca, cb,
               coalesce(sum(cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cb_before
        FROM pv
    ), stats AS (
        SELECT sum(ca) AS n1, sum(cb) AS n2,
               sum(ca * (2 * cb_before) + ca * cb) AS u1_2,
               sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS ties_t
        FROM pre
    )
    SELECT CAST(n1 AS BIGINT) AS n_urgent,
           CAST(n2 AS BIGINT) AS n_low,
           CAST(u1_2 AS DOUBLE) / 2.0 AS u_stat,
           round((CAST(u1_2 AS DOUBLE)
                  - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                 / (2.0 * sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                     * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                        - CAST(ties_t AS DOUBLE)
                          / (CAST(n1 + n2 AS DOUBLE)
                             * (CAST(n1 + n2 AS DOUBLE) - 1.0))))),
                 6) AS z_score
    FROM stats
"""

def _markov_oracle_sql() -> str:
    """DuckDB replay of ev_markov_attribution INCLUDING the chain walk:
    journeys → transition counts → variant edge sets ('__full__' plus one
    per removable channel, the removed channel's out-edges collapsed to
    NULL) → {_MARKOV_ITERS} unrolled vector×matrix steps in HUGEINT with
    the identical per-edge truncating division → removal ppm → revenue
    split. Variant-vectorized: one CTE chain walks ALL variants at once,
    keyed by ``removed``."""
    # every step MATERIALIZED: DuckDB's subquery optimizer grows
    # super-linearly on deep inlined CTE chains (measured ~2× per level);
    # materialization keeps the 20-step walk linear
    step = """p{k} AS MATERIALIZED (
        SELECT ve.removed, ve.dst AS state,
               sum(p.p * ve.n // vo.o) AS p
        FROM p{j} p
        JOIN ve ON ve.removed = p.removed AND ve.src = p.state
        JOIN vout vo ON vo.removed = ve.removed AND vo.src = ve.src
        GROUP BY 1, 2
    )"""
    steps = ",\n    ".join(
        step.format(k=k, j=k - 1) for k in range(1, _MARKOV_ITERS + 1)
    )
    return f"""
    WITH ev AS (
        SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
        FROM events
    ), fp AS (
        SELECT user_id, ts_us AS fts, event_id AS fid FROM (
            SELECT user_id, ts_us, event_id,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts_us, event_id) AS rn
            FROM ev WHERE event_type = 'purchase'
        ) WHERE rn = 1
    ), jt AS (
        SELECT e.user_id, e.event_id, e.event_type, e.ts_us
        FROM ev e LEFT JOIN fp ON fp.user_id = e.user_id
        WHERE e.event_type != 'purchase'
          AND (fp.user_id IS NULL OR (e.ts_us, e.event_id) < (fp.fts, fp.fid))
    ), trans AS (
        SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id), 'START') AS src,
               event_type AS dst
        FROM jt
    ), lt AS (
        SELECT user_id, event_type AS lt FROM (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts_us DESC, event_id DESC) AS rn
            FROM jt
        ) WHERE rn = 1
    ), term AS (
        SELECT coalesce(lt.lt, 'START') AS src,
               CASE WHEN fp.user_id IS NOT NULL THEN 'CONV' ELSE 'NULL' END
                   AS dst
        FROM (SELECT DISTINCT user_id FROM ev) u
        LEFT JOIN lt ON lt.user_id = u.user_id
        LEFT JOIN fp ON fp.user_id = u.user_id
    ), edges0 AS (
        SELECT src, dst, CAST(count(*) AS HUGEINT) AS n
        FROM (SELECT src, dst FROM trans UNION ALL SELECT src, dst FROM term)
        GROUP BY 1, 2
    ), edges AS (
        SELECT src, dst, n FROM edges0
        UNION ALL SELECT 'CONV', 'CONV', CAST(1 AS HUGEINT)
        UNION ALL SELECT 'NULL', 'NULL', CAST(1 AS HUGEINT)
    ), vars AS (
        SELECT DISTINCT dst AS removed FROM edges0
        WHERE dst NOT IN ('CONV', 'NULL')
        UNION ALL SELECT '__full__'
    ), ve AS MATERIALIZED (
        -- MATERIALIZED: every unrolled step references ve/vout, and an
        -- inlined CTE would re-expand the whole journey pipeline per
        -- step (exponential plan growth across 20 levels)
        SELECT v.removed, e.src, e.dst, e.n
        FROM vars v JOIN edges e
          ON (v.removed = '__full__' OR e.src != v.removed)
        UNION ALL
        SELECT v.removed, v.removed AS src, 'NULL' AS dst,
               CAST(1 AS HUGEINT) AS n
        FROM vars v WHERE v.removed != '__full__'
    ), vout AS MATERIALIZED (
        SELECT removed, src, sum(n) AS o FROM ve GROUP BY 1, 2
    ), p0 AS (
        SELECT removed, 'START' AS state,
               CAST({_MARKOV_SCALE} AS HUGEINT) AS p
        FROM vars
    ),
    {steps},
    pc AS (
        SELECT removed,
               coalesce(max(CASE WHEN state = 'CONV' THEN p END), 0) AS pconv
        FROM p{_MARKOV_ITERS} GROUP BY removed
    ), pf AS (
        SELECT pconv AS pfull FROM pc WHERE removed = '__full__'
    ), re AS (
        SELECT removed AS channel,
               CASE WHEN pf.pfull = 0 THEN 0
                    ELSE 1000000 - pconv * 1000000 // pf.pfull
               END AS removal_ppm
        FROM pc, pf WHERE removed != '__full__'
    ), tot AS (
        SELECT CAST(coalesce(sum(CAST(floor(value * 100) AS BIGINT)), 0)
               AS HUGEINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), sppm AS (
        SELECT sum(removal_ppm) AS s FROM re
    ), nt AS (
        SELECT event_type AS channel, CAST(count(*) AS BIGINT) AS n_touches
        FROM jt GROUP BY 1
    )
    SELECT nt.channel, nt.n_touches,
           CAST(re.removal_ppm AS BIGINT) AS removal_ppm,
           CAST(CASE WHEN sppm.s = 0 THEN 0
                     ELSE tot.cents * re.removal_ppm // sppm.s
                END AS BIGINT) AS attributed_cents
    FROM nt JOIN re ON re.channel = nt.channel
    CROSS JOIN tot CROSS JOIN sppm
    ORDER BY nt.channel
    """


ORACLE = {
    "ts_autocorrelation": _ACF_ORACLE,
    "a_mann_whitney": _MWU_ORACLE,
    "ts_cross_correlation": _xcf_oracle_sql(),
    "ts_granger": _granger_oracle_sql(),
    "ts_holt_winters": _holt_winters_oracle_sql(),
    "ev_cuped": _cuped_oracle_sql(),
    # censored KM: per-age factors are one double division; prefix products
    # fold the age-ordered bounded list in pinned order on both engines
    "ev_survival_censored": """
        WITH ev AS (
            SELECT user_id, CAST(ts AS DATE) AS day FROM events
        ), horizon AS (
            SELECT max(day) AS last_day FROM ev
        ), ages AS (
            SELECT datediff('day', min(day), max(day)) AS age_days,
                   CASE WHEN max(day) = (SELECT last_day FROM horizon)
                        THEN 1 ELSE 0 END AS censored
            FROM ev GROUP BY user_id
        ), per_age AS (
            SELECT age_days,
                   CAST(sum(1 - censored) AS BIGINT) AS n_churned,
                   CAST(sum(censored) AS BIGINT) AS n_censored
            FROM ages GROUP BY age_days
        ), risked AS (
            SELECT *,
                   sum(n_churned + n_censored) OVER (ORDER BY age_days DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS n_at_risk
            FROM per_age
        ), factored AS (
            SELECT age_days, n_at_risk, n_churned, n_censored,
                   1.0 - CAST(n_churned AS DOUBLE)
                         / CAST(n_at_risk AS DOUBLE) AS factor
            FROM risked
        ), packed AS (
            SELECT list(factor ORDER BY age_days) AS fl,
                   list(struct_pack(age_days := age_days,
                                    n_at_risk := n_at_risk,
                                    n_churned := n_churned,
                                    n_censored := n_censored,
                                    factor := factor)
                        ORDER BY age_days) AS rows
            FROM factored
        )
        SELECT CAST(rows[i].age_days AS INTEGER) AS age_days,
               CAST(rows[i].n_at_risk AS BIGINT) AS n_at_risk,
               rows[i].n_churned AS n_churned,
               rows[i].n_censored AS n_censored,
               round(rows[i].factor, 6) AS hazard_factor,
               round(list_reduce(
                   list_prepend(CAST(1.0 AS DOUBLE), fl[1:i]),
                   (a, x) -> a * x), 6) AS survival
        FROM packed, unnest(range(1, len(rows) + 1)) AS t(i)
        ORDER BY age_days
    """,
    # Poisson bootstrap: identical 60-bit md5 uniforms, identical integer
    # CDF cut points, identical fold order for SE/CI over the R means
    "a_poisson_bootstrap": f"""
        WITH o AS (
            SELECT o_orderkey AS k,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS c
            FROM orders
        ), fan AS (
            SELECT k, c, r FROM o, unnest(range(1, {_BOOT_R + 1})) AS t(r)
        ), seeded AS (
            SELECT r, c,
                   CAST('0x' || substr(md5('boot:' || CAST(r AS VARCHAR)
                                           || ':' || CAST(k AS VARCHAR)), 1, 15)
                        AS BIGINT) AS u
            FROM fan
        ), wtd AS (
            SELECT r, c,
                   ({" + ".join(f"CASE WHEN u >= {cut} THEN 1 ELSE 0 END"
                                for cut in _POIS1_CUTS)}) AS w
            FROM seeded
        ), reps AS (
            SELECT r,
                   CAST(sum(CAST(w AS HUGEINT) * c) AS DOUBLE)
                   / CAST(sum(CAST(w AS HUGEINT)) AS DOUBLE) / 100.0 AS m
            FROM wtd GROUP BY r
            HAVING sum(CAST(w AS HUGEINT)) > 0
        ), folded AS (
            SELECT list(m ORDER BY r) AS ml FROM reps
        ), stats AS (
            SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE), ml),
                       (a, x) -> a + x) / CAST(len(ml) AS DOUBLE) AS mbar,
                   ml
            FROM folded
        ), se AS (
            SELECT list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                           [(x - mbar) * (x - mbar) for x in ml]),
                       (a, x) -> a + x)
                   / (CAST(len(ml) AS DOUBLE) - 1.0) AS var,
                   list_sort(ml) AS sm,
                   CAST(greatest(1, round(0.025 * CAST(len(ml) AS DOUBLE)))
                        AS INTEGER) AS lo_i,
                   CAST(least(len(ml), round(0.975 * CAST(len(ml) AS DOUBLE)))
                        AS INTEGER) AS hi_i
            FROM stats
        ), point AS (
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(c AS HUGEINT)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) / 100.0 AS point_mean
            FROM o
        )
        SELECT n_rows, round(point_mean, 6) AS point_mean,
               round(sqrt(var), 6) AS boot_se,
               round(sm[lo_i], 6) AS ci_lo,
               round(sm[hi_i], 6) AS ci_hi
        FROM se, point
    """,
    # two-sample KS: integer cross-multiplied sup-distance over the joint
    # inclusive ECDF counts, ONE double division at the end (same two-level
    # prefix recipe as MWU — the oracle's window is the uncapped equivalent)
    "a_ks_test": """
        WITH c AS (
            SELECT CAST(floor(c_acctbal * 100) AS BIGINT) AS v,
                   CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ia
            FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        ), pv AS (
            SELECT v, CAST(sum(ia) AS HUGEINT) AS ca,
                   CAST(sum(1 - ia) AS HUGEINT) AS cb
            FROM c GROUP BY v
        ), pre AS (
            SELECT sum(ca) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca_le,
                   sum(cb) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb_le
            FROM pv
        ), tot AS (
            SELECT max(ca_le) AS n1, max(cb_le) AS n2 FROM pre
        ), d AS (
            SELECT max(abs(ca_le * (SELECT n2 FROM tot)
                           - cb_le * (SELECT n1 FROM tot))) AS d_num
            FROM pre
        )
        SELECT CAST(n1 AS BIGINT) AS n_building,
               CAST(n2 AS BIGINT) AS n_machinery,
               round(CAST(d_num AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS d_stat,
               round(CAST(d_num AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                     * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                            / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))), 6)
                   AS ks_z
        FROM d, tot
    """,
    # Kruskal-Wallis: doubled midrank sums are HUGEINT-exact
    # (2R_g = Σ cg·(2·cum + c + 1)); the k bounded per-group terms fold in
    # pinned segment order (list ORDER BY seg + list_reduce ↔ sort_array +
    # F.aggregate) per the oracle-exactness conventions
    "a_kruskal_wallis": """
        WITH c AS (
            SELECT c_mktsegment AS seg,
                   CAST(floor(c_acctbal * 100) AS BIGINT) AS v
            FROM customer
        ), cell AS (
            SELECT v, seg, CAST(count(*) AS HUGEINT) AS cg
            FROM c GROUP BY v, seg
        ), pv AS (
            SELECT v, sum(cg) AS cnt FROM cell GROUP BY v
        ), ranked AS (
            SELECT v, cnt,
                   coalesce(sum(cnt) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum
            FROM pv
        ), per_group AS (
            SELECT seg, sum(cg) AS n_g,
                   sum(cg * (2 * r.cum + r.cnt + 1)) AS r2_g
            FROM cell JOIN ranked r USING (v)
            GROUP BY seg
        ), folded AS (
            SELECT list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                           list(CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE)
                                / CAST(n_g AS DOUBLE) ORDER BY seg)),
                       (a, x) -> a + x) AS sum_r2_over_n4,
                   count(*) AS k
            FROM per_group
        ), ties AS (
            SELECT sum(cnt) AS n, sum(cnt * cnt * cnt - cnt) AS ties_t
            FROM ranked
        )
        SELECT CAST(n AS BIGINT) AS n_total,
               CAST(k AS INTEGER) AS k_groups,
               round((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))
                     * (sum_r2_over_n4 / 4.0)
                     - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) AS h_stat,
               round(((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))
                      * (sum_r2_over_n4 / 4.0)
                      - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                     / (1.0 - CAST(ties_t AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                           * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6)
                   AS h_tie_corrected
        FROM folded, ties
    """,
    # Kendall tau-b: bounded-domain contingency collapse (50×11 cells);
    # concordant/discordant are cell-pair cross products, HUGEINT-exact
    "a_kendall_tau": """
        WITH li AS (
            SELECT CAST(l_quantity AS BIGINT) AS x,
                   CAST(floor(l_discount * 100) AS BIGINT) AS y
            FROM lineitem
        ), cells AS (
            SELECT x, y, CAST(count(*) AS HUGEINT) AS n
            FROM li GROUP BY x, y
        ), cd AS (
            SELECT sum(CASE WHEN a.y < b.y THEN a.n * b.n
                            ELSE CAST(0 AS HUGEINT) END) AS concordant,
                   sum(CASE WHEN a.y > b.y THEN a.n * b.n
                            ELSE CAST(0 AS HUGEINT) END) AS discordant
            FROM cells a JOIN cells b ON a.x < b.x
        ), margins AS (
            SELECT sum(n) AS n FROM cells
        ), tx AS (
            SELECT sum(nx * (nx - 1)) AS tx2
            FROM (SELECT sum(n) AS nx FROM cells GROUP BY x)
        ), ty AS (
            SELECT sum(ny * (ny - 1)) AS ty2
            FROM (SELECT sum(n) AS ny FROM cells GROUP BY y)
        )
        SELECT CAST(n AS BIGINT) AS n_rows,
               CAST(concordant AS BIGINT) AS concordant,
               CAST(discordant AS BIGINT) AS discordant,
               round(2.0 * (CAST(concordant AS DOUBLE)
                            - CAST(discordant AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                             - CAST(tx2 AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                               - CAST(ty2 AS DOUBLE))), 6) AS tau_b
        FROM cd, margins, tx, ty
    """,
    "a_chi_square": _CHI2_ORACLE,
    "ev_markov_attribution": _markov_oracle_sql(),
    # conversion-lag histogram: (ts, event_id)-tiebroken firsts, integer
    # day buckets, exact prefix counts
    "ev_conversion_lag": """
        WITH ev AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
            FROM events
        ), firsts AS (
            SELECT user_id,
                   min({'ts_us': ts_us, 'event_id': event_id}) AS fa,
                   min(CASE WHEN event_type = 'purchase'
                       THEN {'ts_us': ts_us, 'event_id': event_id} END) AS fp
            FROM ev GROUP BY user_id
        ), lags AS (
            SELECT (fp.ts_us - fa.ts_us) // 86400000000 AS lag_days
            FROM firsts WHERE fp IS NOT NULL
        ), hist AS (
            SELECT lag_days, CAST(count(*) AS BIGINT) AS n_users
            FROM lags GROUP BY lag_days
        ), tot AS (SELECT count(*) AS nv FROM lags)
        SELECT CAST(lag_days AS BIGINT) AS lag_days, n_users,
               round(CAST(sum(n_users) OVER (ORDER BY lag_days
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS DOUBLE) / CAST(nv AS DOUBLE), 6) AS cum_share
        FROM hist, tot
        ORDER BY lag_days
    """,

    # Welch t: exact HUGEINT sufficient statistics, identical double tree
    "a_welch_ttest": """
        WITH g AS (
            SELECT o_orderpriority,
                   CAST(count(*) AS HUGEINT) AS n,
                   sum(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                            AS HUGEINT)) AS s,
                   sum(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                            AS HUGEINT)
                       * CAST(floor(o_totalprice * 100) AS BIGINT)) AS q
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
            GROUP BY o_orderpriority
        ), a AS (SELECT n AS n1, s AS s1, q AS q1 FROM g
                 WHERE o_orderpriority = '1-URGENT'),
           b AS (SELECT n AS n2, s AS s2_, q AS q2 FROM g
                 WHERE o_orderpriority = '5-LOW'),
           x AS (
            SELECT n1, n2,
                   CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                   CAST(s2_ AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
                   CAST(n1 * q1 - s1 * s1 AS DOUBLE)
                   / CAST(n1 * (n1 - 1) AS DOUBLE) / CAST(n1 AS DOUBLE) AS vn1,
                   CAST(n2 * q2 - s2_ * s2_ AS DOUBLE)
                   / CAST(n2 * (n2 - 1) AS DOUBLE) / CAST(n2 AS DOUBLE) AS vn2
            FROM a, b
        )
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               round((m1 - m2) / 100.0, 6) AS mean_diff,
               round((m1 - m2) / sqrt(vn1 + vn2), 6) AS t_stat,
               round((vn1 + vn2) * (vn1 + vn2)
                     / (vn1 * vn1 / (CAST(n1 AS DOUBLE) - 1.0)
                        + vn2 * vn2 / (CAST(n2 AS DOUBLE) - 1.0)), 6)
                   AS welch_df
        FROM x
    """,

    # exact Shapley: identical coalition algebra (bit_or masks,
    # subset-sum v, factorial weights, integer revenue division)
    "ev_shapley_attribution": """
        WITH ev AS (
            SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
            FROM events
        ), fp AS (
            SELECT user_id, ts_us AS fts, event_id AS fid FROM (
                SELECT user_id, ts_us, event_id,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id) AS rn
                FROM ev WHERE event_type = 'purchase'
            ) WHERE rn = 1
        ), jt AS (
            SELECT e.user_id, e.event_type FROM ev e
            LEFT JOIN fp ON fp.user_id = e.user_id
            WHERE e.event_type != 'purchase'
              AND (fp.user_id IS NULL
                   OR (e.ts_us, e.event_id) < (fp.fts, fp.fid))
        ), buyers AS (
            SELECT DISTINCT user_id FROM ev WHERE event_type = 'purchase'
        ), touches AS (
            SELECT jt.user_id, jt.event_type AS channel
            FROM jt JOIN buyers USING (user_id)
        ), chans AS (
            SELECT channel,
                   CAST(1 << (CAST(row_number() OVER (ORDER BY channel)
                                   AS INTEGER) - 1) AS INTEGER) AS bit
            FROM (SELECT DISTINCT channel FROM touches)
        ), nch AS (SELECT CAST(count(*) AS INTEGER) AS n FROM chans
        ), umask AS (
            SELECT t.user_id, bit_or(c.bit) AS mask
            FROM touches t JOIN chans c USING (channel)
            GROUP BY t.user_id
        ), mcnt AS (SELECT mask, count(*) AS cnt FROM umask GROUP BY mask
        ), coal AS (
            SELECT CAST(u.s AS INTEGER) AS s
            FROM nch, unnest(range(0, 1 << n)) AS u(s)
        ), vtab AS (
            SELECT coal.s, coalesce(sum(m.cnt), 0) AS v
            FROM coal LEFT JOIN mcnt m ON (m.mask & coal.s) = m.mask
            GROUP BY coal.s
        ), phi AS (
            SELECT c.channel,
                   CAST(sum(factorial(bit_count(CAST(vs.s AS BIGINT)))
                            * factorial(n - 1
                                        - bit_count(CAST(vs.s AS BIGINT)))
                            * (vi.v - vs.v)) AS BIGINT) AS shapley_num
            FROM chans c, nch, vtab vs, vtab vi
            WHERE (vs.s & c.bit) = 0 AND vi.s = (vs.s | c.bit)
            GROUP BY c.channel
        ), sphi AS (SELECT sum(shapley_num) AS sp FROM phi
        ), nu AS (
            SELECT channel, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM touches GROUP BY channel
        ), cents AS (
            SELECT coalesce(sum(CAST(floor(value * 100) AS BIGINT)), 0)
                   AS cents
            FROM ev WHERE event_type = 'purchase'
        )
        SELECT nu.channel, nu.n_users, phi.shapley_num,
               round(CAST(phi.shapley_num AS DOUBLE) / CAST(sp AS DOUBLE), 6)
                   AS shapley_share,
               CAST(CASE WHEN sp = 0 THEN 0
                    ELSE CAST(cents AS HUGEINT) * phi.shapley_num // sp
                    END AS BIGINT) AS attributed_cents
        FROM nu JOIN phi USING (channel), sphi, cents
        ORDER BY channel
    """,

    # Theil-Sen: exact lower-median rank selection over the bounded
    # pairwise-slope grid; identical double expression trees
    # Mann-Kendall: exact integer S + tie-corrected variance, one z
    "ts_mann_kendall": """
        WITH daily AS (
            SELECT o_orderdate AS day,
                   sum(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                            AS HUGEINT)) AS x
            FROM orders GROUP BY 1
        ), s_row AS (
            SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                                 WHEN b.x < a.x THEN -1 ELSE 0 END)
                        AS HUGEINT) AS s_stat
            FROM daily a JOIN daily b ON a.day < b.day
        ), nt AS (
            SELECT sum(tsize) AS n,
                   sum(tsize * (tsize - 1) * (2 * tsize + 5)) AS tie_term
            FROM (SELECT CAST(count(*) AS HUGEINT) AS tsize
                  FROM daily GROUP BY x)
        ), v AS (
            SELECT s_stat, n,
                   n * (n - 1) * (2 * n + 5) - tie_term AS var18
            FROM s_row, nt
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               CAST(s_stat AS BIGINT) AS s_stat,
               CAST(var18 AS BIGINT) AS var_s_x18,
               round((CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                           WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
                           ELSE 0.0 END)
                     / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6) AS z
        FROM v
    """,
    "ts_theil_sen": """
        WITH daily AS (
            SELECT o_orderdate AS day,
                   sum(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                            AS HUGEINT)) AS x
            FROM orders GROUP BY 1
        ), anchor AS (
            SELECT min(day) AS d0, CAST(count(*) AS BIGINT) AS n_days
            FROM daily
        ), pts AS (
            SELECT CAST(date_diff('day', d0, day) AS INTEGER) AS ti, x
            FROM daily, anchor
        ), slopes AS (
            SELECT CAST(b.x - a.x AS DOUBLE)
                   / CAST(b.ti - a.ti AS DOUBLE) AS s
            FROM pts a JOIN pts b ON a.ti < b.ti
        ), sv AS (
            SELECT s, count(*) AS cnt FROM slopes GROUP BY s
        ), sc AS (
            SELECT s, sum(cnt) OVER (ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM sv
        ), stot AS (SELECT count(*) AS nv FROM slopes
        ), med_s AS (
            SELECT min(s) AS ms, CAST(min(nv) AS BIGINT) AS n_pairs
            FROM sc, stot WHERE cum >= (nv + 1) // 2
        ), resid AS (
            SELECT CAST(x AS DOUBLE) / 100.0
                   - (ms / 100.0) * CAST(ti AS DOUBLE) AS r
            FROM pts, med_s
        ), rv AS (
            SELECT r, count(*) AS cnt FROM resid GROUP BY r
        ), rc AS (
            SELECT r, sum(cnt) OVER (ORDER BY r
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM rv
        ), rtot AS (SELECT count(*) AS nv FROM resid
        ), med_r AS (
            SELECT min(r) AS mr FROM rc, rtot WHERE cum >= (nv + 1) // 2
        )
        SELECT n_days, n_pairs,
               round(ms / 100.0, 6) AS slope_per_day,
               round(mr, 6) AS intercept
        FROM anchor, med_s, med_r
    """,
    # detrended Tukey census: exact integer detrending, a_iqr quartile rule
    "ts_trend_outliers": """
        WITH daily AS (
            SELECT o_orderdate AS day,
                   sum(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                            AS HUGEINT)) AS x
            FROM orders GROUP BY 1
        ), tr AS (
            SELECT day, x,
                   sum(x) OVER (ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tsum,
                   count(*) OVER (ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tcnt
            FROM daily
        ), det AS (
            SELECT day, x, CAST(7 * x - tsum AS DOUBLE) AS d
            FROM tr WHERE tcnt = 7
        ), q AS (
            SELECT round(quantile_cont(d, 0.25), 4) AS q1,
                   round(quantile_cont(d, 0.75), 4) AS q3
            FROM det
        ), f AS (
            SELECT q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
            FROM q
        )
        SELECT day, round(CAST(x AS DOUBLE) / 100.0, 2) AS revenue,
               CAST(d AS BIGINT) AS detrended_x7,
               CASE WHEN d < lo THEN 'low' ELSE 'high' END AS direction
        FROM det, f
        WHERE d < lo OR d > hi
        ORDER BY day
    """,
    "ts_decompose": _DECOMP_ORACLE,
    "a_gini": _GINI_ORACLE,
    "a_linear_trend": """
        WITH monthly AS (
            SELECT o_orderpriority,
                   CAST((year(o_orderdate) - 1992) * 12
                        + month(o_orderdate) - 1 AS BIGINT) AS mx,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1, 2
        ), stats AS (
            SELECT o_orderpriority,
                   CAST(count(*) AS HUGEINT) AS n,
                   CAST(sum(CAST(mx AS HUGEINT)) AS HUGEINT) AS sx,
                   CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS sy,
                   CAST(sum(CAST(mx AS HUGEINT) * CAST(cents AS HUGEINT))
                        AS HUGEINT) AS sxy,
                   CAST(sum(CAST(mx AS HUGEINT) * CAST(mx AS HUGEINT))
                        AS HUGEINT) AS sxx
            FROM monthly GROUP BY 1
        )
        SELECT o_orderpriority,
               CAST(n AS BIGINT) AS n_months,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6)
                   AS slope_cents_per_month,
               round((CAST(sy AS DOUBLE)
                      - (CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE))
                        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4)
                   AS intercept_cents
        FROM stats ORDER BY o_orderpriority
    """,
    "a_rfm_segments": _RFM_ORACLE,
    "ev_pareto_share": """
        WITH counts AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id
        ), tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_users_total,
                   CAST(sum(n) AS BIGINT) AS n_events_total
            FROM counts
        ), ranked AS (
            SELECT n,
                   CAST(((row_number() OVER (ORDER BY n DESC, user_id ASC)
                          - 1) * 10) // n_users_total AS INTEGER) AS decile,
                   n_events_total
            FROM counts CROSS JOIN tot
        ), per AS (
            SELECT decile,
                   CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(n) AS BIGINT) AS n_events,
                   max(n_events_total) AS tot
            FROM ranked GROUP BY decile
        )
        SELECT decile, n_users, n_events,
               round(n_events / CAST(tot AS DOUBLE), 6) AS event_share,
               round(CAST(sum(n_events) OVER (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) / CAST(tot AS DOUBLE), 6) AS cum_share
        FROM per
        ORDER BY decile
    """,
    # weekly reach: anchored weeks, first-ever week per user, cumulative
    # over the weeks-bounded frame
    "ev_reach_curve": """
        WITH ev AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ), a AS (
            SELECT min(day) AS day0 FROM ev
        ), days AS (
            SELECT DISTINCT user_id,
                   CAST(datediff('day', day0, day) // 7 AS INT) AS week
            FROM ev, a
        ), wau AS (
            SELECT week, CAST(count(*) AS BIGINT) AS wau
            FROM days GROUP BY 1
        ), nw AS (
            SELECT week, CAST(count(*) AS BIGINT) AS n_new FROM (
                SELECT user_id, min(week) AS week FROM days GROUP BY 1
            ) GROUP BY 1
        )
        SELECT w.week, w.wau, coalesce(n.n_new, 0) AS n_new,
               CAST(sum(coalesce(n.n_new, 0)) OVER (
                   ORDER BY w.week
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_reach,
               round(coalesce(n.n_new, 0) / CAST(w.wau AS DOUBLE), 6)
                   AS new_share
        FROM wau w LEFT JOIN nw n ON n.week = w.week
        ORDER BY w.week
    """,
    "ev_stickiness": """
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ), anchor AS (
            SELECT min(day) AS day0 FROM ud
        ), days AS (
            SELECT user_id, day,
                   CAST(datediff('day', day0, day) // 7 AS INTEGER) AS week
            FROM ud, anchor
        ), dau AS (
            SELECT week,
                   CAST(count(*) AS BIGINT) AS n_active_days,
                   CAST(sum(d) AS BIGINT) AS sum_dau
            FROM (SELECT week, day, count(*) AS d FROM days GROUP BY 1, 2)
            GROUP BY week
        ), wau AS (
            SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
            FROM days GROUP BY week
        )
        SELECT week, n_active_days, sum_dau, wau,
               round(sum_dau / CAST(n_active_days * wau AS DOUBLE), 6)
                   AS stickiness
        FROM dau JOIN wau USING (week)
        ORDER BY week
    """,
    "ev_churn_curve": """
        WITH ages AS (
            SELECT user_id,
                   CAST(datediff('day', min(CAST(ts AS DATE)),
                                 max(CAST(ts AS DATE))) AS INTEGER)
                       AS age_days
            FROM events GROUP BY user_id
        ), d AS (
            SELECT age_days, CAST(count(*) AS BIGINT) AS n_churned
            FROM ages GROUP BY 1
        ), tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_users FROM ages
        ), curve AS (
            SELECT age_days, n_churned,
                   CAST(sum(n_churned) OVER (ORDER BY age_days DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS n_at_risk,
                   CAST(sum(n_churned) OVER (ORDER BY age_days ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_churned
            FROM d
        )
        SELECT age_days, n_at_risk, n_churned,
               round(n_churned / CAST(n_at_risk AS DOUBLE), 6) AS hazard,
               round((n_users - cum_churned) / CAST(n_users AS DOUBLE), 6)
                   AS survival
        FROM curve CROSS JOIN tot
        ORDER BY age_days
    """,
    "ev_top_paths": f"""
        WITH flagged AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), numbered AS (
            SELECT *, CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id)
                       AS BIGINT) AS session_id
            FROM flagged
        ), paths AS (
            SELECT user_id, session_id,
                   array_to_string(
                       list(event_type ORDER BY ts_us, event_id)[1:{_PATH_LEN}],
                       '>') AS path
            FROM numbered GROUP BY 1, 2
        ), counts AS (
            SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
            FROM paths GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(n_sessions) AS BIGINT) AS total FROM counts
        ), top AS (
            SELECT * FROM counts
            ORDER BY n_sessions DESC, path ASC LIMIT {_PATH_TOP_K}
        )
        SELECT path, n_sessions,
               round(n_sessions / CAST(total AS DOUBLE), 6) AS share
        FROM top CROSS JOIN tot
        ORDER BY n_sessions DESC, path ASC
    """,
    "a_profile_table": """
        SELECT 'o_orderkey' AS col_name,
               count(*) - count(o_orderkey) AS n_nulls,
               count(DISTINCT o_orderkey) AS n_distinct,
               CAST(min(o_orderkey) AS DOUBLE) AS min_num,
               CAST(max(o_orderkey) AS DOUBLE) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        FROM orders
        UNION ALL
        SELECT 'o_custkey', count(*) - count(o_custkey),
               count(DISTINCT o_custkey),
               CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
               NULL, NULL
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
               count(DISTINCT o_orderstatus), NULL, NULL,
               min(o_orderstatus), max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*) - count(o_totalprice),
               count(DISTINCT o_totalprice),
               CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE),
               NULL, NULL
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', count(*) - count(o_orderdate),
               count(DISTINCT o_orderdate), NULL, NULL,
               strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S.%f'),
               strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S.%f')
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
               count(DISTINCT o_orderpriority), NULL, NULL,
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
    """,
    "ev_drift_psi": """
        WITH span AS (
            SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
            FROM events
        ), tagged AS (
            SELECT event_type, value,
                   epoch_us(ts) < t0 + (t1 - t0) / 2 AS is_ref
            FROM events, span
        ), ref_stats AS (
            SELECT event_type, min(value) AS vmin, max(value) AS vmax
            FROM tagged WHERE is_ref GROUP BY 1
        ), binned AS (
            SELECT t.event_type,
                   CASE WHEN r.vmax = r.vmin THEN 0
                        ELSE least(9, greatest(0, CAST(floor(
                            (t.value - r.vmin) / ((r.vmax - r.vmin) / 10.0))
                            AS INTEGER)))
                   END AS bin,
                   sum(CASE WHEN t.is_ref THEN 1 ELSE 0 END) AS n_ref,
                   sum(CASE WHEN NOT t.is_ref THEN 1 ELSE 0 END) AS n_cur
            FROM tagged t JOIN ref_stats r USING (event_type)
            GROUP BY 1, 2
        ), scaffold AS (
            SELECT event_type, CAST(i AS INTEGER) AS bin
            FROM ref_stats, unnest(generate_series(0, 9)) AS u(i)
        ), filled AS (
            SELECT s.event_type, s.bin,
                   coalesce(b.n_ref, 0) AS n_ref,
                   coalesce(b.n_cur, 0) AS n_cur,
                   sum(coalesce(b.n_ref, 0)) OVER (PARTITION BY s.event_type)
                       AS tot_ref,
                   sum(coalesce(b.n_cur, 0)) OVER (PARTITION BY s.event_type)
                       AS tot_cur
            FROM scaffold s LEFT JOIN binned b
                ON s.event_type = b.event_type AND s.bin = b.bin
        )
        SELECT event_type, bin,
               CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
               round((n_ref + 1.0) / (tot_ref + 10.0), 6) AS p_ref,
               round((n_cur + 1.0) / (tot_cur + 10.0), 6) AS p_cur,
               round(((n_ref + 1.0) / (tot_ref + 10.0)
                      - (n_cur + 1.0) / (tot_cur + 10.0))
                     * ln(((n_ref + 1.0) / (tot_ref + 10.0))
                          / ((n_cur + 1.0) / (tot_cur + 10.0))), 6) AS psi_term
        FROM filled
    """,
    "ev_funnel": """
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t2 FROM events e
            JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t3 FROM events e
            JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
        )
        SELECT (SELECT count(DISTINCT user_id) FROM events) AS total_users,
               (SELECT count(*) FROM s1) AS step1_users,
               (SELECT count(*) FROM s2) AS step2_users,
               (SELECT count(*) FROM s3) AS step3_users
    """,
    "a_correlation": _corr_oracle_sql(),
    "ev_ab_test": """
        WITH per_user AS (
            SELECT user_id,
                   CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) >= 16
                        THEN 1 ELSE 0 END AS converted,
                   user_id % 2 AS arm
            FROM events GROUP BY user_id
        ), s AS (
            SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b,
                   CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                        AS BIGINT) AS conv_a,
                   CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                        AS BIGINT) AS conv_b
            FROM per_user
        )
        SELECT n_a, n_b, conv_a, conv_b,
               round(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
               round(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
               CASE WHEN conv_a > 0
               THEN round((conv_b / CAST(n_b AS DOUBLE) - conv_a / CAST(n_a AS DOUBLE))
                     / (conv_a / CAST(n_a AS DOUBLE)), 6) END AS lift,
               CASE WHEN sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                            * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                            * (1 / CAST(n_a AS DOUBLE) + 1 / CAST(n_b AS DOUBLE))) > 0
               THEN round((conv_b / CAST(n_b AS DOUBLE) - conv_a / CAST(n_a AS DOUBLE))
                     / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                            * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                            * (1 / CAST(n_a AS DOUBLE) + 1 / CAST(n_b AS DOUBLE))),
                     6) END AS z_score
        FROM s
    """,
    "ts_ohlc_resample": """
        WITH ev AS (
            SELECT event_type, ts, event_id,
                   CAST(floor(value * 100) AS BIGINT) AS c,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour
            FROM events
        ), ranked AS (
            SELECT *,
                   row_number() OVER (PARTITION BY event_type, hour
                       ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY event_type, hour
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM ev
        ), agg AS (
            SELECT event_type, hour,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(max(CASE WHEN rn_a = 1 THEN c END) AS BIGINT) AS open_c,
                   CAST(max(c) AS BIGINT) AS high_c,
                   CAST(min(c) AS BIGINT) AS low_c,
                   CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS close_c,
                   CAST(sum(c) AS BIGINT) AS sum_c
            FROM ranked GROUP BY 1, 2
        )
        SELECT event_type, hour, n_events,
               round(open_c / CAST(100 AS DOUBLE), 6) AS open,
               round(high_c / CAST(100 AS DOUBLE), 6) AS high,
               round(low_c / CAST(100 AS DOUBLE), 6) AS low,
               round(close_c / CAST(100 AS DOUBLE), 6) AS close,
               round(sum_c / (CAST(100 AS DOUBLE) * n_events), 6) AS mean_value
        FROM agg
    """,
    "ev_ltv_cohort": """
        WITH buys AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ), anchor AS (
            SELECT min(day) AS day0 FROM buys
        ), wk AS (
            SELECT user_id, cents,
                   CAST((day - day0) // 7 AS INTEGER) AS week
            FROM buys CROSS JOIN anchor
        ), cohort AS (
            SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1
        ), sizes AS (
            SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
            FROM cohort GROUP BY 1
        ), cells AS (
            SELECT c.cohort_week, w.week - c.cohort_week AS age_week,
                   CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_buyers,
                   CAST(sum(w.cents) AS BIGINT) AS rev_cents
            FROM wk w JOIN cohort c USING (user_id)
            GROUP BY 1, 2
        ), cum AS (
            SELECT cohort_week, age_week, n_buyers, rev_cents,
                   CAST(sum(rev_cents) OVER (PARTITION BY cohort_week
                       ORDER BY age_week
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_rev_cents
            FROM cells
        )
        SELECT c.cohort_week, c.age_week, s.n_users, c.n_buyers,
               c.rev_cents, c.cum_rev_cents,
               round(c.cum_rev_cents
                     / (CAST(100 AS DOUBLE) * s.n_users), 6) AS ltv_per_user
        FROM cum c JOIN sizes s USING (cohort_week)
    """,
    "ts_seasonality": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ), overall AS (
            SELECT event_type, CAST(sum(c) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_days_all
            FROM daily GROUP BY 1
        ), dw AS (
            SELECT event_type, CAST(isodow(day) - 1 AS INTEGER) AS dow,
                   CAST(sum(c) AS BIGINT) AS dow_events,
                   CAST(count(*) AS BIGINT) AS n_days
            FROM daily GROUP BY 1, 2
        )
        SELECT d.event_type, d.dow, d.n_days, d.dow_events,
               round(d.dow_events / CAST(d.n_days AS DOUBLE), 6) AS dow_mean,
               round((d.dow_events / CAST(d.n_days AS DOUBLE))
                     / (o.total / CAST(o.n_days_all AS DOUBLE)), 6)
                   AS seasonal_index
        FROM dw d JOIN overall o USING (event_type)
    """,
    # recursive CTE, not list_reduce, for the same struct-fold reason as Holt
    "a_changepoint_cusum": f"""
        WITH RECURSIVE daily AS MATERIALIZED (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ), st AS MATERIALIZED (
            SELECT event_type, CAST(sum(c) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_days
            FROM daily GROUP BY 1
        ), seq AS MATERIALIZED (
            SELECT d.event_type, d.day, d.c,
                   CAST(row_number() OVER (PARTITION BY d.event_type
                                           ORDER BY d.day) AS BIGINT) AS rn
            FROM daily d
        ), walk AS (
            SELECT event_type, total, n_days,
                   CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS alarms,
                   CAST(NULL AS DATE) AS first_alarm,
                   CAST(0 AS BIGINT) AS max_s, CAST(0 AS BIGINT) AS rn
            FROM st
            UNION ALL
            SELECT event_type, total, n_days, s2,
                   alarms + CASE WHEN s2 > {_CUSUM_H_NUM} * total
                                 THEN 1 ELSE 0 END,
                   coalesce(first_alarm,
                            CASE WHEN s2 > {_CUSUM_H_NUM} * total
                                 THEN day END),
                   greatest(max_s, s2),
                   rn + 1
            FROM (
                SELECT w.event_type, w.total, w.n_days, w.alarms,
                       w.first_alarm, w.max_s, w.rn, q.day,
                       greatest(CAST(0 AS BIGINT),
                                w.s + {_CUSUM_SCALE_NUM} * w.n_days * q.c
                                    - {_CUSUM_SHIFT_NUM} * w.total) AS s2
                FROM walk w
                JOIN seq q ON q.event_type = w.event_type
                          AND q.rn = w.rn + 1
            )
        )
        SELECT event_type, n_days, total AS total_events,
               round(total / n_days, 6) AS mean_daily,
               alarms AS n_alarms,
               strftime(first_alarm, '%Y-%m-%d') AS first_alarm_day,
               max_s AS max_stat
        FROM walk WHERE rn = n_days
    """,
    # NOTE: deliberately a RECURSIVE CTE, not list_reduce — DuckDB 1.x's
    # list_reduce with a STRUCT accumulator mis-evaluates multi-step folds
    # (each step alone reproduces the Python/Spark value; chained steps
    # drift), so the two-state recursion steps through explicit rows
    "ts_forecast_backtest": f"""
        WITH RECURSIVE anchor AS (
            SELECT max(CAST(ts AS DATE)) - {_BACKTEST_H} AS cutoff FROM events
        ), daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   round(sum(CAST(floor(value * 100) AS BIGINT))
                         / (100.0 * count(*)), 6) AS y
            FROM events GROUP BY 1, 2
        ), d AS (
            SELECT event_type, y,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn
            FROM daily, anchor WHERE day <= cutoff
        ), nd AS (
            SELECT event_type, count(*) AS n_train_days FROM d GROUP BY 1
        ), r AS (
            SELECT event_type, 1 AS k, y AS l, CAST(0.0 AS DOUBLE) AS b
            FROM d WHERE rn = 1
            UNION ALL
            SELECT d.event_type, r.k + 1,
                   round(0.2 * d.y + 0.8 * (r.l + r.b), 6),
                   round(0.1 * (round(0.2 * d.y + 0.8 * (r.l + r.b), 6) - r.l)
                         + 0.9 * r.b, 6)
            FROM r JOIN d ON d.event_type = r.event_type AND d.rn = r.k + 1
        ), fit AS (
            SELECT r.event_type, CAST(nd.n_train_days AS BIGINT)
                       AS n_train_days, r.l, r.b
            FROM r JOIN nd ON nd.event_type = r.event_type
                          AND r.k = nd.n_train_days
        ), test AS (
            SELECT event_type, day, y,
                   CAST(datediff('day', cutoff, day) AS INTEGER) AS h
            FROM daily, anchor WHERE day > cutoff
        )
        SELECT t.event_type, t.h, strftime(t.day, '%Y-%m-%d') AS day,
               f.n_train_days, t.y AS actual,
               round(f.l + t.h * f.b, 6) AS forecast,
               round(abs(round(f.l + t.h * f.b, 6) - t.y), 6) AS abs_err
        FROM test t JOIN fit f USING (event_type)
        ORDER BY t.event_type, t.h
    """,
    "ts_holt_forecast": """
        WITH RECURSIVE daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   round(sum(CAST(floor(value * 100) AS BIGINT))
                         / (100.0 * count(*)), 6) AS y
            FROM events GROUP BY 1, 2
        ), d AS (
            SELECT event_type, y,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn
            FROM daily
        ), nd AS (
            SELECT event_type, count(*) AS n_days FROM d GROUP BY 1
        ), r AS (
            SELECT event_type, 1 AS k, y AS l, CAST(0.0 AS DOUBLE) AS b
            FROM d WHERE rn = 1
            UNION ALL
            SELECT d.event_type, r.k + 1,
                   round(0.2 * d.y + 0.8 * (r.l + r.b), 6),
                   round(0.1 * (round(0.2 * d.y + 0.8 * (r.l + r.b), 6) - r.l)
                         + 0.9 * r.b, 6)
            FROM r JOIN d ON d.event_type = r.event_type AND d.rn = r.k + 1
        )
        SELECT r.event_type, CAST(nd.n_days AS BIGINT) AS n_days,
               r.l AS level, r.b AS trend,
               round(r.l + r.b, 6) AS forecast_1d,
               round(r.l + 7 * r.b, 6) AS forecast_7d
        FROM r JOIN nd ON nd.event_type = r.event_type AND r.k = nd.n_days
    """,
    "a_benford_digits": f"""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders
        ), counted AS (
            SELECT digit, count(*) AS n_obs FROM digits
            WHERE digit >= 1 GROUP BY digit
        ), shared AS (
            SELECT digit, n_obs,
                   CAST(sum(n_obs) OVER () AS BIGINT) AS total,
                   CASE digit
                       {" ".join(f"WHEN {d} THEN {_BENFORD_P[d]!r}" for d in range(1, 10))}
                   END AS p_exp
            FROM counted
        )
        SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
               round(n_obs / CAST(total AS DOUBLE), 6) AS p_obs,
               round(p_exp, 6) AS p_benford,
               round((n_obs / CAST(total AS DOUBLE) - p_exp)
                     * (n_obs / CAST(total AS DOUBLE) - p_exp)
                     * total / p_exp, 6) AS chi2_term
        FROM shared
    """,
    "ev_anomaly_mad": """
        WITH ev AS (
            SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c
            FROM events
        ), med AS (
            SELECT event_type,
                   CAST(quantile_cont(c, 0.5) * 2 AS BIGINT) AS med2
            FROM ev GROUP BY event_type
        ), dev AS (
            SELECT ev.event_type, abs(2 * c - med2) AS dev2, med2
            FROM ev JOIN med USING (event_type)
        ), mad AS (
            SELECT event_type,
                   CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
            FROM dev GROUP BY event_type
        )
        SELECT dev.event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(any_value(dev.med2) / 200.0, 6) AS median_value,
               round(any_value(mad4) / 400.0, 6) AS mad,
               CAST(sum(CASE WHEN 20000 * dev2 > 44478 * mad4
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev JOIN mad USING (event_type)
        GROUP BY dev.event_type
    """,
    "ev_attribution": """
        WITH ev AS (
            SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
            FROM events
        ), tagged AS (
            SELECT *,
                last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
                                THEN ts_us END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS touch_ts,
                last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
                                THEN event_type END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS touch_ch
            FROM ev
        )
        SELECT coalesce(CASE WHEN touch_ts >= ts_us - 7 * 86400 * 1000000::BIGINT
                             THEN touch_ch END, 'direct') AS channel,
               count(*) AS n_conversions,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM tagged
        WHERE event_type = 'purchase'
        GROUP BY 1
    """,
    "ev_peak_concurrency": """
        WITH ev AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        ), flagged AS (
            SELECT user_id, ts_us, event_id,
                   CASE WHEN lag(ts_us) OVER w IS NULL
                             OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        ), sess AS (
            SELECT user_id,
                   sum(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts_us, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id,
                   ts_us
            FROM flagged
        ), intervals AS (
            SELECT user_id, min(ts_us) AS start_us, max(ts_us) + 1 AS end_us
            FROM sess GROUP BY user_id, session_id
        ), deltas AS (
            SELECT start_us AS ts_us, 1 AS delta, user_id FROM intervals
            UNION ALL
            SELECT end_us AS ts_us, -1 AS delta, user_id FROM intervals
        ), local AS (
            SELECT ts_us - ts_us % (3600 * 1000000::BIGINT) AS hr_us, delta,
                   sum(delta) OVER (PARTITION BY ts_us - ts_us % (3600 * 1000000::BIGINT)
                                    ORDER BY ts_us, delta, user_id
                                    ROWS UNBOUNDED PRECEDING) AS run_local
            FROM deltas
        ), per_hour AS (
            SELECT hr_us, max(run_local) AS peak_local, sum(delta) AS hr_total
            FROM local GROUP BY hr_us
        )
        SELECT make_timestamp(hr_us) AS hour,
               CAST(coalesce(sum(hr_total) OVER (ORDER BY hr_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + greatest(0, peak_local) AS BIGINT) AS peak_sessions
        FROM per_hour
    """,
    "ev_transition_matrix": """
        WITH pairs AS (
            SELECT event_type AS prev_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ), counts AS (
            SELECT prev_type, next_type, count(*) AS n_trans
            FROM pairs WHERE next_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT prev_type, next_type, n_trans,
               n_trans / CAST(sum(n_trans) OVER (PARTITION BY prev_type)
                              AS DOUBLE) AS p
        FROM counts
    """,
    # rolling median: identical explicit middle-element arithmetic — no
    # engine median() semantics on either side
    "w_rolling_median": """
        WITH fr AS (
            SELECT event_id, user_id,
                   list_sort(list(CAST(floor(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS f
            FROM events
        )
        SELECT event_id, user_id,
               round((f[(len(f) - 1) // 2 + 1] + f[len(f) // 2 + 1])
                     / 2.0 / 100.0, 6) AS rmed
        FROM fr
    """,
    "w_ema": """
        WITH ordered AS (
            SELECT user_id,
                   list(value ORDER BY ts, event_id) AS vals,
                   count(*) AS n_events
            FROM events GROUP BY user_id
        )
        SELECT user_id, n_events,
               list_reduce(
                   list_prepend(CAST(NULL AS DOUBLE), vals),
                   (acc, x) -> CASE WHEN acc IS NULL THEN round(x, 6)
                               ELSE round(0.2 * x + 0.8 * acc, 6) END
               ) AS ema
        FROM ordered
    """,
    "ev_retention": """
        WITH wk AS (
            SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
            FROM events
        ),
        first AS (SELECT user_id, min(wk) AS cohort FROM wk GROUP BY 1)
        SELECT CAST(first.cohort AS VARCHAR) AS cohort_week,
               CAST((wk.wk - first.cohort) / 7 AS BIGINT) AS week_offset,
               count(DISTINCT wk.user_id) AS active_users
        FROM wk JOIN first ON wk.user_id = first.user_id
        GROUP BY 1, 2
    """,
    "w_running_total": """
        SELECT o_custkey, o_orderkey,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS DOUBLE) AS running_spend
        FROM orders
    """,
    "w_lag_delta": """
        SELECT event_id, user_id,
               round(value - lag(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta
        FROM events
    """,
    "w_moving_avg": """
        SELECT event_id, user_id,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                     / count(*) OVER w, 6) AS mavg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "w_quartiles": """
        SELECT c_custkey, c_mktsegment,
               round(percent_rank() OVER w, 6) AS pct_rank,
               ntile(4) OVER w AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    "w_first_last": """
        SELECT DISTINCT user_id,
               first_value(value) OVER w AS first_val,
               last_value(value) OVER w AS last_val
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "w_gapfill_resample": """
        WITH agg AS (
            SELECT user_id, date_trunc('hour', ts) AS bucket,
                   round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                         / count(*), 6) AS bval
            FROM events GROUP BY 1, 2
        ), spine AS (
            SELECT user_id,
                   unnest(generate_series(min(bucket), max(bucket),
                                          INTERVAL 1 HOUR)) AS bucket
            FROM agg GROUP BY user_id
        )
        SELECT s.user_id, s.bucket,
               last_value(a.bval IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val,
               a.bval IS NULL AS is_gap
        FROM spine s LEFT JOIN agg a
          ON s.user_id = a.user_id AND s.bucket = a.bucket
    """,
    "w_range_frame": """
        SELECT event_id, user_id,
               count(*) OVER w AS n_last_hour,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 4)
                    AS DOUBLE) AS sum_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    "a_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
               count(*) AS n,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
    """,
    "f_array_hof": """
        WITH t AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings)
        SELECT vec_id,
               len(list_filter(e, x -> x > 0)) AS n_pos,
               CASE WHEN len(e) = 0 THEN 0.0
                    ELSE round(list_reduce(list_transform(e, x -> abs(x)),
                                           (a, b) -> a + b), 4) END AS l1,
               CASE WHEN len(e) = 0 THEN 0.0
                    ELSE round(list_reduce(list_transform(e, x -> x * x),
                                           (a, b) -> a + b), 4) END AS l2_sq,
               round(list_max(e), 6) AS max_dim,
               len(list_filter(e, x -> x > 0.9)) > 0 AS has_big
        FROM t
    """,
    "a_approx_quantiles": """
        SELECT event_type, count(*) AS n_exact, TRUE AS within_bound
        FROM events GROUP BY event_type
    """,
}

"""Adversarial events/orders/customer fixture for the window-analytic
family — shapes the synthetic tables never produce, checked Spark-vs-DuckDB
by the same value compare the driver uses:

- a user with a SINGLE event (lag → NULL delta, 1-row moving-avg frame)
- two events of one user at the IDENTICAL timestamp (window order must
  resolve on the event_id tiebreak, not fall to nondeterminism)
- zero and negative values (decimal frame sums, delta signs)
- a customer segment with fewer rows than NTILE buckets (ntile(4) of 2)
- equal account balances within a segment (tiebreak on c_custkey)
- orders of one customer on the SAME date (running-total order tiebreak)
- a session boundary at EXACTLY the 30-min gap (strict > contract)
"""

from __future__ import annotations

import datetime

import duckdb

import __spark_entry__ as entry
from check_correctness import compare

_T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _ts(minutes: float) -> datetime.datetime:
    return _T0 + datetime.timedelta(minutes=minutes)


def test_edge_events_windows_match_oracle(spark, tmp_path):
    events = [
        # user 1: single event
        (1, _ts(0), 1, "click", -3.5),
        # user 2: identical-timestamp pair (tiebreak on event_id) + zero value
        (10, _ts(5), 2, "view", 0.0),
        (11, _ts(5), 2, "view", 2.25),
        (12, _ts(10), 2, "purchase", -1.0),
        # user 3: session boundary exactly at the 30-min gap (NOT a new
        # session: the contract is gap STRICTLY greater) and one beyond it
        (20, _ts(0), 3, "click", 1.0),
        (21, _ts(30), 3, "click", 1.0),
        (22, _ts(60.001), 3, "click", 4.0),
        # user 4: enough rows to slide the 3-row frame fully
        (30, _ts(1), 4, "view", 10.0),
        (31, _ts(2), 4, "view", 20.0),
        (32, _ts(3), 4, "view", 30.0),
        (33, _ts(4), 4, "view", 40.0),
        # user 5: funnel gauntlet — pre-view purchase/click must not count;
        # the click and purchase at ts EQUAL to the prior step's completion
        # must not count (strictly-after contract); the later ones do
        (40, _ts(0), 5, "purchase", 1.0),
        (41, _ts(1), 5, "click", 1.0),
        (42, _ts(2), 5, "view", 1.0),
        (43, _ts(2), 5, "click", 1.0),
        (44, _ts(3), 5, "click", 1.0),
        (45, _ts(3), 5, "purchase", 1.0),
        (46, _ts(4), 5, "purchase", 1.0),
    ]
    spark.createDataFrame(
        [(e, t, u, et, v, "{}") for e, t, u, et, v in events],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    orders = [
        # customer 1: two orders on the SAME date — running total must
        # order on o_orderkey within the date
        (100, 1, "O", 10.10, _ts(0), "1-URGENT"),
        (101, 1, "O", 5.05, _ts(0), "5-LOW"),
        (102, 1, "F", 1.00, _ts(60 * 24), "2-HIGH"),
        # customer 2: single order
        (103, 2, "P", 99.99, _ts(0), "3-MEDIUM"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    customers = [
        # BUILDING: 2 rows (< 4 ntile buckets), EQUAL balances (tiebreak key)
        (1, "Customer#1", 0, 500.0, "BUILDING"),
        (2, "Customer#2", 1, 500.0, "BUILDING"),
        # AUTO: 5 rows incl. a negative balance
        (3, "Customer#3", 2, -10.0, "AUTO"),
        (4, "Customer#4", 3, 0.0, "AUTO"),
        (5, "Customer#5", 4, 1.0, "AUTO"),
        (6, "Customer#6", 0, 2.0, "AUTO"),
        (7, "Customer#7", 1, 3.0, "AUTO"),
    ]
    spark.createDataFrame(
        customers,
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    con = duckdb.connect()
    for t in ("events", "orders", "customer"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet/*.parquet'"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    names = [
        "w_running_total",
        "w_lag_delta",
        "w_moving_avg",
        "w_quartiles",
        "w_first_last",
        "a_approx_quantiles",
        "w_sessionize",
        "w1_latest_per_key",
        "a_date_window",
        "ev_funnel",
        "ev_retention",
        # streaming tiers over the same adversarial corpus: user 3's
        # EXACT-30-min gap pins session_window's boundary (it MERGES the
        # at-gap successor — same strictly-greater rule as w_sessionize),
        # and the stateful funnel must match ev_funnel's oracle verbatim
        "st_session_window",
        "st_funnel_stream",
        # sliding windows over the same corpus: same-timestamp pairs and
        # negative values land in BOTH enclosing 2-day windows
        "st_sliding_window",
    ]
    for name in names:
        spark.catalog.clearCache()
        sdf = qs[name](spark, str(tmp_path)).toPandas()
        ddf = con.sql(oracles[name]).df()
        msg = compare(name, sdf, ddf)
        assert not msg, f"{name}: {msg}"

    # the exact-30-min gap stayed inside one session; the 30.001-min gap split
    sess = {
        (r.user_id, r.session_id): r.n_events
        for r in qs["w_sessionize"](spark, str(tmp_path)).collect()
        if r.user_id == 3
    }
    assert sess == {(3, 1): 2, (3, 2): 1}, sess

    # funnel pin: only user 5 completes view→click→purchase, and only via
    # the strictly-later click@3/purchase@4 (the same-ts ones don't count)
    funnel = qs["ev_funnel"](spark, str(tmp_path)).collect()[0]
    assert (
        funnel.total_users,
        funnel.step1_users,
        funnel.step2_users,
        funnel.step3_users,
    ) == (5, 3, 1, 1), funnel


def _write_events(spark, tmp_path, events):
    spark.createDataFrame(
        [(e, t, u, et, v, "{}") for e, t, u, et, v in events],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    return con


def test_ev_attribution_edges(spark, tmp_path):
    """Last-touch edges the synthetic stream never isolates: a touch outside
    the 7-day lookback, a touch-free user, a touch strictly AFTER the
    purchase, latest-of-several, and a touch at the IDENTICAL instant whose
    smaller event_id makes it prior (the ROWS 1-PRECEDING tiebreak)."""
    day = 24 * 60.0
    events = [
        # u1: signup 8 days before purchase — outside lookback → direct
        (1, _ts(-8 * day), 1, "signup", 0.0),
        (2, _ts(0), 1, "purchase", 10.0),
        # u2: purchase with no touch at all → direct
        (3, _ts(0), 2, "purchase", 20.0),
        # u3: view then click then purchase — the LATEST prior touch wins
        (4, _ts(0), 3, "view", 0.0),
        (5, _ts(1), 3, "click", 0.0),
        (6, _ts(2), 3, "purchase", 30.5),
        # u4: the only touch is AFTER the purchase → direct
        (7, _ts(0), 4, "purchase", 40.0),
        (8, _ts(1), 4, "view", 0.0),
        # u5: touch at the SAME instant as the purchase, smaller event_id —
        # prior by tiebreak, so it takes the credit
        (9, _ts(0), 5, "signup", 0.0),
        (10, _ts(0), 5, "purchase", 50.25),
    ]
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ev_attribution"](spark, str(tmp_path)).toPandas()
    msg = compare("ev_attribution", sdf, con.sql(oracles["ev_attribution"]).df())
    assert not msg, msg
    got = {
        r["channel"]: (r["n_conversions"], r["revenue_cents"])
        for _, r in sdf.iterrows()
    }
    assert got == {
        "direct": (3, 7000),  # u1 (stale touch) + u2 (none) + u4 (late touch)
        "click": (1, 3050),  # u3: click beats the earlier view
        "signup": (1, 5025),  # u5: same-instant tiebreak on event_id
    }, got


def test_ev_peak_concurrency_edges(spark, tmp_path):
    """Hand-countable sweep-line: three sessions overlapping at 10:10, a
    session spanning the 11:00 hour boundary (carry-in level), and an hour
    whose only delta is a session END — its peak is the CARRIED-IN level at
    the hour start, not the post-delta level."""
    events = [
        # u1: session [10:00, 10:20+1µs)
        (1, _ts(0), 1, "view", 0.0),
        (2, _ts(20), 1, "view", 0.0),
        # u2: single-event session [10:10, 10:10+1µs)
        (3, _ts(10), 2, "view", 0.0),
        # u3: session [10:05, 10:15+1µs)
        (4, _ts(5), 3, "view", 0.0),
        (5, _ts(15), 3, "view", 0.0),
        # u4: session [10:55, 11:20+1µs) — crosses the hour boundary (25-min
        # gap < 30 stays one session); hour 11's only delta is its END
        (6, _ts(55), 4, "view", 0.0),
        (7, _ts(80), 4, "view", 0.0),
    ]
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ev_peak_concurrency"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ev_peak_concurrency", sdf, con.sql(oracles["ev_peak_concurrency"]).df()
    )
    assert not msg, msg
    got = {r["hour"].hour: r["peak_sessions"] for _, r in sdf.iterrows()}
    # hour 12 (fixture _T0 is 12:00): u1+u2+u3 all open at 12:10 → 3;
    # hour 13: level carried in is 1 (u4 open), the END delta only lowers it
    assert got == {12: 3, 13: 1}, got


def test_ev_anomaly_mad_edges(spark, tmp_path):
    """MAD detector pins: a constant cluster has MAD 0 so any deviation at
    all is an outlier and the constants themselves never are; a tight
    cluster plus one extreme value flags exactly the extreme (the median/
    MAD threshold ignores the outlier's own pull, unlike mean/stddev)."""
    events = []
    eid = 0
    # type 'view' (user 1): 9 x constant 10.0 + one 10.5 — MAD is 0, so the
    # single deviant is the only outlier
    for _ in range(9):
        events.append((eid, _ts(eid), 1, "view", 10.0)); eid += 1
    events.append((eid, _ts(eid), 1, "view", 10.5)); eid += 1
    # type 'click': tight cluster 9.8..10.2 + one 1000.0
    for k in range(10):
        events.append((eid, _ts(eid), 2, "click", 9.8 + 0.04 * k)); eid += 1
    events.append((eid, _ts(eid), 2, "click", 1000.0)); eid += 1
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ev_anomaly_mad"](spark, str(tmp_path)).toPandas()
    msg = compare("ev_anomaly_mad", sdf, con.sql(oracles["ev_anomaly_mad"]).df())
    assert not msg, msg
    got = {r["event_type"]: (r["n_events"], r["median_value"], r["n_outliers"])
           for _, r in sdf.iterrows()}
    assert got["view"] == (10, 10.0, 1), got["view"]
    n, med, k = got["click"]
    assert (n, k) == (11, 1) and 9.8 <= med <= 10.2, got["click"]


def test_ts_holt_forecast_edges(spark, tmp_path):
    """Holt pins: a CONSTANT daily series fixes level at the constant with
    zero trend (forecasts equal the constant); a steadily RISING series
    learns a positive trend so the 7-day forecast exceeds the 1-day one."""
    day = 24 * 60.0
    events = []
    eid = 0
    for d in range(10):
        # user 1 / 'view': constant 10.0 every day
        events.append((eid, _ts(d * day), 1, "view", 10.0)); eid += 1
        # user 2 / 'click': +1.0 per day
        events.append((eid, _ts(d * day), 2, "click", 10.0 + d)); eid += 1
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ts_holt_forecast"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ts_holt_forecast", sdf, con.sql(oracles["ts_holt_forecast"]).df()
    )
    assert not msg, msg
    got = {r["event_type"]: r for _, r in sdf.iterrows()}
    v = got["view"]
    assert (v["level"], v["trend"], v["forecast_1d"], v["forecast_7d"]) == (
        10.0, 0.0, 10.0, 10.0,
    )
    c = got["click"]
    assert c["trend"] > 0
    assert c["forecast_7d"] > c["forecast_1d"] > c["level"]


def test_a_benford_digits_hand_counted(spark, tmp_path):
    """Benford audit pin on constructed totals: leading digits of the
    integer-cents rendering, probabilities sum to 1, chi2 term is 0 when
    a digit's observed share equals its Benford share exactly."""
    # 30 orders with leading cent-digits: 1 x21, 9 x9 (cents: 1xx.., 9xx..)
    orders = [
        (i, 1, "O", 1.23 + i * 0.001, _ts(0), "1-URGENT") for i in range(21)
    ] + [
        (100 + i, 1, "O", 9.87, _ts(0), "1-URGENT") for i in range(9)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    import duckdb as _dd

    con = _dd.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_benford_digits"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "a_benford_digits", sdf, con.sql(oracles["a_benford_digits"]).df()
    )
    assert not msg, msg
    got = {int(r["digit"]): r for _, r in sdf.iterrows()}
    assert set(got) == {1, 9}
    assert got[1]["n_obs"] == 21 and got[9]["n_obs"] == 9
    assert abs(got[1]["p_obs"] + got[9]["p_obs"] - 1.0) < 1e-9
    assert got[1]["p_obs"] == 0.7 and got[9]["p_obs"] == 0.3


def test_a_correlation_known_relationships(spark, tmp_path):
    """Correlation pins on constructed columns: an exact linear relation
    gives corr 1.0, an exact negative relation -1.0, and the integer
    framing reproduces a hand-computed mid-strength value."""
    rows = []
    for i in range(1, 21):
        q = float(i)                      # l_quantity: 1..20
        price = 2.0 * i                   # perfectly linear with quantity
        disc = (21 - i) / 100.0           # perfectly anti-linear
        tax = 0.05 if i % 2 == 0 else 0.0  # alternating — near-zero corr
        rows.append((i, q, price, disc, tax))
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    import duckdb as _dd

    con = _dd.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{tmp_path}/lineitem.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_correlation"](spark, str(tmp_path)).toPandas()
    msg = compare("a_correlation", sdf, con.sql(oracles["a_correlation"]).df())
    assert not msg, msg
    got = {(r["col_x"], r["col_y"]): r["corr"] for _, r in sdf.iterrows()}
    assert got[("l_quantity", "l_extendedprice")] == 1.0
    assert got[("l_quantity", "l_discount")] == -1.0
    assert abs(got[("l_tax", "l_discount")]) < 0.2


def test_ev_ab_test_hand_computed(spark, tmp_path):
    """A/B readout pin: 4 even-id users (arm 0, 1 converter) vs 4 odd-id
    users (arm 1, 3 converters) — rates, lift and the pooled z-score match
    the hand formula; the oracle agrees on the same corpus."""
    import math

    events = []
    eid = 0
    # converter = >= 16 purchases
    def add_user(uid, n_purchases):
        nonlocal eid
        for k in range(n_purchases):
            events.append((eid, _ts(k), uid, "purchase", 1.0)); eid += 1
        events.append((eid, _ts(99), uid, "view", 1.0)); eid += 1

    for uid, np in [(0, 16), (2, 3), (4, 2), (6, 1),      # arm 0: 1 of 4
                    (1, 20), (3, 17), (5, 16), (7, 0)]:   # arm 1: 3 of 4
        add_user(uid, np)
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ev_ab_test"](spark, str(tmp_path)).toPandas()
    msg = compare("ev_ab_test", sdf, con.sql(oracles["ev_ab_test"]).df())
    assert not msg, msg
    r = sdf.iloc[0]
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == (4, 4, 1, 3)
    assert r["rate_a"] == 0.25 and r["rate_b"] == 0.75
    assert r["lift"] == 2.0
    p = 0.5
    z = (0.75 - 0.25) / math.sqrt(p * (1 - p) * (1 / 4 + 1 / 4))
    assert abs(r["z_score"] - round(z, 6)) < 1e-9


def test_a_changepoint_cusum_level_shift(spark, tmp_path):
    """CUSUM pins, hand-computed at 4n scale: a CONSTANT daily series never
    leaves zero (no alarms); a 2/day → 8/day level shift at day 10 of 20
    accumulates +140/day post-shift against the 8·total = 800 threshold,
    so the first alarm lands exactly 6 post-shift days in (840 > 800),
    with 5 alarm days total and peak statistic 1400."""
    day = 24 * 60.0
    events = []
    eid = 0
    for d in range(20):
        for i in range(4):  # 'view': constant 4/day
            events.append((eid, _ts(d * day + i), 1, "view", 1.0)); eid += 1
        for i in range(2 if d < 10 else 8):  # 'click': 2/day then 8/day
            events.append((eid, _ts(d * day + 30 + i), 2, "click", 1.0)); eid += 1
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_changepoint_cusum"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "a_changepoint_cusum", sdf, con.sql(oracles["a_changepoint_cusum"]).df()
    )
    assert not msg, msg
    got = {r["event_type"]: r for _, r in sdf.iterrows()}
    v = got["view"]
    assert (v["n_days"], v["total_events"], v["n_alarms"], v["max_stat"]) == (
        20, 80, 0, 0,
    )
    assert v["first_alarm_day"] is None or v["first_alarm_day"] != v["first_alarm_day"]  # NULL
    c = got["click"]
    # total=100, n=20: pre-shift step 4*20*2-500<0 -> clamped at 0;
    # post-shift step 4*20*8-500=+140; alarm at 140*k>800 -> k=6 -> day 15
    assert (c["n_days"], c["total_events"]) == (20, 100)
    assert c["n_alarms"] == 5
    assert c["first_alarm_day"] == "2024-03-16"
    assert c["max_stat"] == 1400


def test_ts_seasonality_dow_convention_and_index(spark, tmp_path):
    """Seasonality pins on a hand-built two-week grid: Monday must map to
    dow=0 in BOTH engines (DuckDB's native dayofweek is Sunday-based — the
    silent off-by-one this test exists to catch), and a weekday with
    double load gets index ≈ 2 / overall-mean units."""
    day = 24 * 60.0
    # _T0 = 2024-03-01 (a FRIDAY). Build 14 consecutive days: 1 event/day,
    # except both MONDAYS (2024-03-04, 2024-03-11; offsets 3 and 10) get 3.
    events = []
    eid = 0
    for d in range(14):
        k = 3 if d in (3, 10) else 1
        for i in range(k):
            events.append((eid, _ts(d * day + i), 1, "view", 1.0)); eid += 1
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ts_seasonality"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ts_seasonality", sdf, con.sql(oracles["ts_seasonality"]).df()
    )
    assert not msg, msg
    got = {int(r["dow"]): r for _, r in sdf.iterrows()}
    assert set(got) == set(range(7))  # all weekdays present, Monday=0
    # totals: 12 days x1 + 2 Mondays x3 = 18 over 14 days; overall mean 9/7
    mon, tue = got[0], got[1]
    assert (mon["n_days"], mon["dow_events"]) == (2, 6)
    assert (tue["n_days"], tue["dow_events"]) == (2, 2)
    assert abs(mon["seasonal_index"] - 3 / (18 / 14)) < 1e-6
    assert abs(tue["seasonal_index"] - 1 / (18 / 14)) < 1e-6


def test_ev_ltv_cohort_hand_computed(spark, tmp_path):
    """Cohort-LTV pins: two weekly cohorts with hand-traced revenue.
    User 1 (cohort week 0) buys $1.00 in week 0 and $2.00 in week 2;
    user 2 (also cohort 0) buys $4.00 in week 0; user 3 first buys in
    week 1 ($8.00). Checks cell revenue, cumulative curves, per-user LTV,
    and total-revenue conservation."""
    day = 24 * 60.0
    events = [
        (0, _ts(0), 1, "purchase", 1.00),
        (1, _ts(14 * day), 1, "purchase", 2.00),
        (2, _ts(1 * day), 2, "purchase", 4.00),
        (3, _ts(8 * day), 3, "purchase", 8.00),
        (4, _ts(0), 3, "view", 99.0),  # non-purchase: never revenue
    ]
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ev_ltv_cohort"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ev_ltv_cohort", sdf, con.sql(oracles["ev_ltv_cohort"]).df()
    )
    assert not msg, msg
    got = {(r["cohort_week"], r["age_week"]): r for _, r in sdf.iterrows()}
    assert set(got) == {(0, 0), (0, 2), (1, 0)}
    c00 = got[(0, 0)]
    assert (c00["n_users"], c00["n_buyers"], c00["rev_cents"]) == (2, 2, 500)
    assert c00["ltv_per_user"] == 2.5
    c02 = got[(0, 2)]
    assert (c02["n_buyers"], c02["rev_cents"], c02["cum_rev_cents"]) == (1, 200, 700)
    assert c02["ltv_per_user"] == 3.5
    c10 = got[(1, 0)]
    assert (c10["n_users"], c10["rev_cents"], c10["ltv_per_user"]) == (1, 800, 8.0)
    assert int(sdf["rev_cents"].sum()) == 1500


def test_ts_ohlc_hand_computed(spark, tmp_path):
    """OHLC pins: open/close pick the (ts, event_id)-first/last values —
    including the same-timestamp tie where event_id breaks the order —
    and high/low/mean come out in exact cents."""
    events = [
        # one hour, 'view': ordered values 10.00, 2.50, 99.99, 7.00
        (0, _ts(0), 1, "view", 10.00),
        (1, _ts(10), 1, "view", 2.50),
        (2, _ts(20), 1, "view", 99.99),
        # same ts as event 2: higher event_id wins "last" (close)
        (3, _ts(20), 1, "view", 7.00),
        # different hour bucket
        (4, _ts(70), 1, "view", 5.00),
    ]
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ts_ohlc_resample"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ts_ohlc_resample", sdf, con.sql(oracles["ts_ohlc_resample"]).df()
    )
    assert not msg, msg
    rows = sorted(sdf.to_dict("records"), key=lambda r: r["hour"])
    h0 = rows[0]
    assert h0["n_events"] == 4
    assert (h0["open"], h0["close"]) == (10.0, 7.0)
    assert (h0["high"], h0["low"]) == (99.99, 2.5)
    assert abs(h0["mean_value"] - (1000 + 250 + 9999 + 700) / 400) < 1e-9
    h1 = rows[1]
    assert (h1["n_events"], h1["open"], h1["close"]) == (1, 5.0, 5.0)


def test_w_activity_streaks_hand_computed(spark, tmp_path):
    """Gaps-and-islands pins: user 1 is active days 0-2, 5, 7-10 (streaks
    3, 1, 4 — longest 4, latest 4); user 2's single day is a streak of 1;
    multiple events on one day count it once."""
    day = 24 * 60.0
    events = []
    eid = 0
    for d in (0, 1, 2, 5, 7, 8, 9, 10):
        for i in range(2 if d == 1 else 1):  # day 1 has TWO events
            events.append((eid, _ts(d * day + i), 1, "view", 1.0)); eid += 1
    events.append((eid, _ts(0), 2, "click", 1.0)); eid += 1
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["w_activity_streaks"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "w_activity_streaks", sdf, con.sql(oracles["w_activity_streaks"]).df()
    )
    assert not msg, msg
    got = {r["user_id"]: r for _, r in sdf.iterrows()}
    u1 = got[1]
    assert (u1["n_active_days"], u1["n_streaks"]) == (8, 3)
    assert (u1["longest_streak"], u1["latest_streak"]) == (4, 4)
    u2 = got[2]
    assert (u2["n_active_days"], u2["n_streaks"], u2["longest_streak"]) == (1, 1, 1)


def test_a_linear_trend_hand_computed(spark, tmp_path):
    """OLS pin on a constructed orders table: priority 'A' gets exactly
    +100.00/month (cents slope 10000) with intercept 50000 cents; priority
    'B' is flat at 200.00. The oracle compare runs on the same fixture so
    the HUGEINT/decimal stats path is exercised end to end."""
    import datetime as _dt

    rows = []
    for m in range(6):  # months 1992-01..1992-06 → mx = 0..5
        d = _dt.date(1992, 1 + m, 15)
        rows.append((100 + m, 1, "A", d, 500.0 + 100.0 * m))
        rows.append((200 + m, 1, "B", d, 200.0))
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string, "
        "o_orderdate date, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    import duckdb as _dd

    con = _dd.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_linear_trend"](spark, str(tmp_path)).toPandas()
    msg = compare("a_linear_trend", sdf, con.sql(oracles["a_linear_trend"]).df())
    assert not msg, msg
    got = {r["o_orderpriority"]: r for _, r in sdf.iterrows()}
    assert got["A"]["n_months"] == 6
    assert got["A"]["slope_cents_per_month"] == 10000.0
    assert got["A"]["intercept_cents"] == 50000.0
    assert got["B"]["slope_cents_per_month"] == 0.0
    assert got["B"]["intercept_cents"] == 20000.0


def test_ts_autocorrelation_hand_computed(spark, tmp_path):
    """ACF pin on a constructed alternating series: 10 days of revenue
    alternating 100.00 / 200.00 gives deviations of equal magnitude and
    alternating sign, so acf_k = (-1)^k * (10 - k) / 10 exactly."""
    import datetime as _dt

    rows = [
        (k, 1, "A", _dt.date(1995, 1, 1) + _dt.timedelta(days=k),
         100.0 if k % 2 == 0 else 200.0)
        for k in range(10)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string, "
        "o_orderdate date, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ts_autocorrelation"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ts_autocorrelation", sdf, con.sql(oracles["ts_autocorrelation"]).df()
    )
    assert not msg, msg
    got = {int(r["lag"]): r for _, r in sdf.iterrows()}
    for k in range(1, 8):
        assert got[k]["n_pairs"] == 10 - k
        expected = round((-1) ** k * (10 - k) / 10, 6)
        assert got[k]["acf"] == expected, (k, got[k]["acf"], expected)


def test_a_mann_whitney_hand_computed(spark, tmp_path):
    """Rank-sum pin on a 5-order fixture: URGENT prices {1.00, 2.00, 3.00},
    LOW prices {2.00, 4.00} → U1 = #(low < urgent) + ties/2 = 1 + 0.5 = 1.5,
    tie term T = 2^3 - 2 = 6, z from the textbook normal approximation."""
    import datetime as _dt
    import math

    d = _dt.date(1995, 6, 1)
    rows = [
        (1, 1, "1-URGENT", d, 1.0),
        (2, 1, "1-URGENT", d, 2.0),
        (3, 1, "1-URGENT", d, 3.0),
        (4, 1, "5-LOW", d, 2.0),
        (5, 1, "5-LOW", d, 4.0),
        (6, 1, "3-MEDIUM", d, 99.0),  # excluded group must not leak in
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string, "
        "o_orderdate date, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_mann_whitney"](spark, str(tmp_path)).toPandas()
    msg = compare("a_mann_whitney", sdf, con.sql(oracles["a_mann_whitney"]).df())
    assert not msg, msg
    row = sdf.iloc[0]
    assert (row["n_urgent"], row["n_low"]) == (3, 2)
    assert row["u_stat"] == 1.5
    sigma2 = (3 * 2 / 12.0) * ((5 + 1.0) - 6 / (5.0 * 4.0))
    assert row["z_score"] == round((3.0 - 6.0) / (2.0 * math.sqrt(sigma2)), 6)


def test_a_chi_square_hand_computed(spark, tmp_path):
    """Chi-square pin on two constructed 2x2 contingency tables. The
    diagonal table (X only URGENT, Y only LOW, 10 each) has the closed
    form chi2 = N*(ad-bc)^2/(r1*r2*c1*c2) = 20*(100)^2/10^4 = 20 and
    Cramer's V = 1."""
    import datetime as _dt

    d = _dt.date(1995, 6, 1)
    custs = [(1, "X"), (2, "Y")]
    spark.createDataFrame(
        custs, "c_custkey bigint, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    rows = []
    for k in range(10):
        rows.append((k, 1, "1-URGENT", d, 100.0))
        rows.append((100 + k, 2, "5-LOW", d, 100.0))
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string, "
        "o_orderdate date, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet/*.parquet'"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_chi_square"](spark, str(tmp_path)).toPandas()
    msg = compare("a_chi_square", sdf, con.sql(oracles["a_chi_square"]).df())
    assert not msg, msg
    row = sdf.iloc[0]
    assert (row["n_obs"], row["dof"]) == (20, 1)
    assert row["chi2"] == 20.0
    assert row["cramers_v"] == 1.0


def test_ev_markov_attribution_hand_computed(spark, tmp_path):
    """Markov removal-effect pin on a 3-user chain whose truncating
    fixed-point walk is hand-traceable: u1 view->purchase, u2 view->end,
    u3 click->purchase. P(conv|full) = 2/3 exactly in picounits
    (666666666666); removing either channel leaves only the other path
    (333333333333), so both removal effects are exactly 500000 ppm and
    the 2000 purchase cents split 1000/1000."""
    events = [
        (1, _ts(0), 1, "view", 0.0),
        (2, _ts(1), 1, "purchase", 10.0),
        (3, _ts(0), 2, "view", 0.0),
        (4, _ts(0), 3, "click", 0.0),
        (5, _ts(1), 3, "purchase", 10.0),
    ]
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ev_markov_attribution"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ev_markov_attribution", sdf, con.sql(oracles["ev_markov_attribution"]).df()
    )
    assert not msg, msg
    got = {
        r["channel"]: (r["n_touches"], r["removal_ppm"], r["attributed_cents"])
        for _, r in sdf.iterrows()
    }
    assert got == {"view": (2, 500000, 1000), "click": (1, 500000, 1000)}


def test_tx_heaps_law_power_fixture(spark, tmp_path):
    """Heaps pin on a constructed corpus lying exactly on a power law:
    after decile d the corpus holds d^4 tokens and d^2 distinct words, so
    all 10 (ln N, ln V) points are collinear with slope exactly 0.5 and
    intercept 0 (K = 1). OLS on collinear points recovers both."""
    docs = []
    for d in range(1, 11):
        new_words = [f"w_{d}_{j}" for j in range(2 * d - 1)]
        n_toks = d**4 - (d - 1) ** 4
        toks = new_words + ["w_1_0"] * (n_toks - len(new_words))
        docs.append((d - 1, " ".join(toks), "en", "synth", len(toks)))
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["tx_heaps_law"](spark, str(tmp_path)).toPandas()
    msg = compare("tx_heaps_law", sdf, con.sql(oracles["tx_heaps_law"]).df())
    assert not msg, msg
    row = sdf.iloc[0]
    assert (row["n_docs"], row["n_tokens"], row["vocab_size"]) == (10, 10000, 100)
    assert abs(row["heaps_beta"] - 0.5) < 1e-9
    assert abs(row["heaps_k"] - 1.0) < 1e-9


def test_ts_decompose_hand_computed(spark, tmp_path):
    """Decomposition pin on a constructed trend+seasonal series with NO
    noise: daily revenue = 100 + 10*t + weekday dollars over 4 Monday-
    aligned weeks. Any centered 7-day window spans all weekdays, so the
    linear trend cancels exactly: seasonal_dollars(dow) = dow - 3 and
    the remainder is identically zero => seasonal_strength = 1.0."""
    import datetime as _dt

    start = _dt.date(1995, 1, 2)  # a Monday
    rows = [
        (t, 1, "1-URGENT", start + _dt.timedelta(days=t),
         100.0 + 10.0 * t + float(t % 7))
        for t in range(28)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string, "
        "o_orderdate date, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ts_decompose"](spark, str(tmp_path)).toPandas()
    msg = compare("ts_decompose", sdf, con.sql(oracles["ts_decompose"]).df())
    assert not msg, msg
    got = {int(r["dow"]): r for _, r in sdf.iterrows()}
    assert len(got) == 7
    for w in range(7):
        assert got[w]["seasonal_dollars"] == float(w - 3), (w, got[w])
        assert got[w]["seasonal_strength"] == 1.0


def test_tx_vocab_drift_hand_computed(spark, tmp_path):
    """Drift pin: early docs (even ids) say 'a b', late docs (odd ids)
    say 'a c' — 'b' and 'c' are the drifted terms (each exclusive to one
    half, symmetric so equal js), 'a' is perfectly balanced and its JS
    contribution is exactly zero (p_early = p_late => both logs are 0)."""
    docs = [
        (0, "a b", "en", "s", 3),
        (1, "a c", "en", "s", 3),
        (2, "a b", "en", "s", 3),
        (3, "a c", "en", "s", 3),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["tx_vocab_drift"](spark, str(tmp_path)).toPandas()
    msg = compare("tx_vocab_drift", sdf, con.sql(oracles["tx_vocab_drift"]).df())
    assert not msg, msg
    got = {r["term"]: r for _, r in sdf.iterrows()}
    assert set(got) == {"a", "b", "c"}
    assert got["b"]["js_pico"] == got["c"]["js_pico"] > 0
    assert got["a"]["js_pico"] == 0
    assert (got["b"]["n_early"], got["b"]["n_late"]) == (2, 0)
    assert (got["c"]["n_early"], got["c"]["n_late"]) == (0, 2)


def test_a_gini_hand_computed(spark, tmp_path):
    """Gini pin: customer spends of 1, 2, 3, 4 dollars give the closed
    form (2*(1+4+9+16) - 5*10)/(4*10) = 0.25; scale-invariance means
    cents quantization does not move it."""
    import datetime as _dt

    d = _dt.date(1995, 6, 1)
    rows = [
        (k, k, "1-URGENT", d, float(k)) for k in (1, 2, 3, 4)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string, "
        "o_orderdate date, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_gini"](spark, str(tmp_path)).toPandas()
    msg = compare("a_gini", sdf, con.sql(oracles["a_gini"]).df())
    assert not msg, msg
    row = sdf.iloc[0]
    assert (row["n_customers"], row["total_cents"]) == (4, 1000)
    assert row["gini"] == 0.25


def test_a_ks_test_hand_computed(spark, tmp_path):
    """KS pin: BUILDING balances {1, 2, 3}, MACHINERY {2, 4} (plus an
    excluded segment). ECDF gaps at the 4 distinct values are 1/3, 1/6,
    1/2, 0 → D = 0.5 (cross-multiplied: max|ca_le·n2 − cb_le·n1| = 3 over
    n1·n2 = 6); z = 0.5·sqrt(6/5)."""
    import math

    rows = [
        (1, "BUILDING", 1.0),
        (2, "BUILDING", 2.0),
        (3, "BUILDING", 3.0),
        (4, "MACHINERY", 2.0),
        (5, "MACHINERY", 4.0),
        (6, "FURNITURE", 99.0),  # excluded segment must not leak in
    ]
    spark.createDataFrame(
        rows, "c_custkey bigint, c_mktsegment string, c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW customer AS SELECT * FROM '{tmp_path}/customer.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_ks_test"](spark, str(tmp_path)).toPandas()
    msg = compare("a_ks_test", sdf, con.sql(oracles["a_ks_test"]).df())
    assert not msg, msg
    row = sdf.iloc[0]
    assert (row["n_building"], row["n_machinery"]) == (3, 2)
    assert row["d_stat"] == 0.5
    assert row["ks_z"] == round(0.5 * math.sqrt(6.0 / 5.0), 6)


def test_a_kruskal_wallis_hand_computed(spark, tmp_path):
    """KW pin: groups A={1,2}, B={2,3}, C={5}. Midranks 1, 2.5, 2.5, 4, 5
    → rank sums 3.5, 6.5, 5 → H = 12/(5·6)·(3.5²/2 + 6.5²/2 + 25) − 18
    = 2.9; tie term 2³−2 = 6 → H_corr = 2.9 / (1 − 6/120)."""
    rows = [
        (1, "A", 1.0),
        (2, "A", 2.0),
        (3, "B", 2.0),
        (4, "B", 3.0),
        (5, "C", 5.0),
    ]
    spark.createDataFrame(
        rows, "c_custkey bigint, c_mktsegment string, c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW customer AS SELECT * FROM '{tmp_path}/customer.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_kruskal_wallis"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "a_kruskal_wallis", sdf, con.sql(oracles["a_kruskal_wallis"]).df()
    )
    assert not msg, msg
    row = sdf.iloc[0]
    assert (row["n_total"], row["k_groups"]) == (5, 3)
    assert row["h_stat"] == 2.9
    assert row["h_tie_corrected"] == round(2.9 / (1.0 - 6.0 / 120.0), 6)


def test_a_kendall_tau_hand_computed(spark, tmp_path):
    """Tau-b pin: (quantity, discount) rows (1,.00),(2,.01),(3,.02),(3,.00)
    → concordant 3, discordant 1, tie terms tx2 = ty2 = 2 →
    tau_b = 2·(3−1)/(sqrt(12−2)·sqrt(12−2)) = 0.4."""
    rows = [(1.0, 0.00), (2.0, 0.01), (3.0, 0.02), (3.0, 0.00)]
    spark.createDataFrame(
        rows, "l_quantity double, l_discount double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{tmp_path}/lineitem.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_kendall_tau"](spark, str(tmp_path)).toPandas()
    msg = compare("a_kendall_tau", sdf, con.sql(oracles["a_kendall_tau"]).df())
    assert not msg, msg
    row = sdf.iloc[0]
    assert (row["n_rows"], row["concordant"], row["discordant"]) == (4, 3, 1)
    assert row["tau_b"] == 0.4


def test_ts_cross_correlation_hand_computed(spark, tmp_path):
    """XCF pin: clicks x = [2,0,1,1], purchases y = [1,1,0,2] over 4 days
    → deviations dx = [4,−4,0,0], dy = [0,0,−4,4], den = 32 each side.
    Hand products: lag 0 → 0; +1 → 16/32 = 0.5; +2 → −32/32 = −1;
    +3 → 16/32 = 0.5; all negative lags 0; lags ≥ 4 have no pairs."""
    rows = []
    eid = 0
    day_counts = {1: (2, 1), 2: (0, 1), 3: (1, 0), 4: (1, 2)}
    for d, (clicks, buys) in day_counts.items():
        for _ in range(clicks):
            eid += 1
            rows.append((eid, _ts(60 * 24 * d), 1, "click", 1.0))
        for _ in range(buys):
            eid += 1
            rows.append((eid, _ts(60 * 24 * d), 1, "purchase", 1.0))
        eid += 1
        rows.append((eid, _ts(60 * 24 * d), 1, "error", 1.0))  # ignored type
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ts_cross_correlation"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ts_cross_correlation", sdf, con.sql(oracles["ts_cross_correlation"]).df()
    )
    assert not msg, msg
    got = {int(r["lag"]): (r["n_pairs"], r["xcf"]) for _, r in sdf.iterrows()}
    assert got[0] == (4, 0.0)
    assert got[1] == (3, 0.5)
    assert got[2] == (2, -1.0)
    assert got[3] == (1, 0.5)
    assert got[-1][1] == 0.0 and got[-2][1] == 0.0 and got[-3][1] == 0.0
    assert got[5][0] == 0  # no pairs at |lag| > series span


def test_a_poisson_bootstrap_mechanism(spark, tmp_path):
    """Bootstrap pin on a 6-order fixture: the point mean is exact
    (prices 1..6 → 3.5); replicate means are deterministic functions of
    the seeded md5 weights, verified Spark-vs-DuckDB by the driver
    compare; the CI brackets are ordered and the SE is positive (weights
    vary across replicates by construction)."""
    import datetime as _dt

    d = _dt.date(1995, 6, 1)
    rows = [(k, 1, "1-URGENT", d, float(k)) for k in range(1, 7)]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string, "
        "o_orderdate date, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_poisson_bootstrap"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "a_poisson_bootstrap", sdf, con.sql(oracles["a_poisson_bootstrap"]).df()
    )
    assert not msg, msg
    row = sdf.iloc[0]
    assert (row["n_rows"], row["point_mean"]) == (6, 3.5)
    assert row["boot_se"] > 0
    assert row["ci_lo"] <= row["ci_hi"]


def test_ev_survival_censored_hand_computed(spark, tmp_path):
    """Censored KM pin: u1 age 1 (churn), u2 age 3 (censored at the
    horizon), u3 age 0 (churn), u4 age 0 (censored) → risk sets 4, 2, 1;
    factors .75, .5, 1 → survival .75, .375, .375 (the product does NOT
    telescope once u4's censoring removes it from later risk sets)."""
    day = 24 * 60.0
    events = [
        (1, _ts(0), 1, "click", 1.0),
        (2, _ts(1 * day), 1, "click", 1.0),
        (3, _ts(0), 2, "view", 1.0),
        (4, _ts(3 * day), 2, "view", 1.0),
        (5, _ts(1 * day), 3, "click", 1.0),
        (6, _ts(3 * day), 4, "click", 1.0),
    ]
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ev_survival_censored"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ev_survival_censored", sdf,
        con.sql(oracles["ev_survival_censored"]).df(),
    )
    assert not msg, msg
    got = {
        int(r["age_days"]): (
            r["n_at_risk"], r["n_churned"], r["n_censored"], r["survival"]
        )
        for _, r in sdf.iterrows()
    }
    assert got[0] == (4, 1, 1, 0.75)
    assert got[1] == (2, 1, 0, 0.375)
    assert got[3] == (1, 0, 1, 0.375)


def test_a_iqr_outliers_hand_computed(spark, tmp_path):
    """Tukey-fence pin: balances 1..9 plus 100 in one segment →
    interpolated q1 = 3.25, q3 = 7.75, fences (−3.5, 14.5) → exactly one
    high outlier (the 100) and no low outliers."""
    rows = [(k, "AUTO", float(k)) for k in range(1, 10)] + [(10, "AUTO", 100.0)]
    spark.createDataFrame(
        rows, "c_custkey bigint, c_mktsegment string, c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW customer AS SELECT * FROM '{tmp_path}/customer.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_iqr_outliers"](spark, str(tmp_path)).toPandas()
    msg = compare("a_iqr_outliers", sdf, con.sql(oracles["a_iqr_outliers"]).df())
    assert not msg, msg
    row = sdf.iloc[0]
    assert (row["q1"], row["q3"]) == (3.25, 7.75)
    assert (row["lo_fence"], row["hi_fence"]) == (-3.5, 14.5)
    assert (row["n_low_outliers"], row["n_high_outliers"]) == (0, 1)


def test_ev_shapley_attribution_hand_computed(spark, tmp_path):
    """Exact-Shapley pin on a 2-user coalition game: u1 touches
    {click, view} then converts, u2 touches {click} then converts.
    v(∅)=0, v({click})=1, v({view})=0, v({click,view})=2 →
    φ_click = 0!1!(1−0) + 1!0!(2−0) = 3, φ_view = 0 + 1!0!(2−1) = 1
    (units 1/2!); shares 0.75/0.25; the 2000 purchase cents split
    1500/500."""
    events = [
        (1, _ts(0), 1, "click", 0.0),
        (2, _ts(1), 1, "view", 0.0),
        (3, _ts(2), 1, "purchase", 10.0),
        (4, _ts(0), 2, "click", 0.0),
        (5, _ts(1), 2, "purchase", 10.0),
    ]
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ev_shapley_attribution"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ev_shapley_attribution",
        sdf,
        con.sql(oracles["ev_shapley_attribution"]).df(),
    )
    assert not msg, msg
    got = {
        r["channel"]: (
            r["n_users"], r["shapley_num"], r["shapley_share"],
            r["attributed_cents"],
        )
        for _, r in sdf.iterrows()
    }
    assert got == {
        "click": (2, 3, 0.75, 1500),
        "view": (1, 1, 0.25, 500),
    }


def test_ts_theil_sen_hand_computed(spark, tmp_path):
    """Theil–Sen pin on a 4-day series with one outlier day: daily dollars
    1, 3, 2 at t=0,1,2 and an outlier 10 at t=4. The six pairwise slopes
    (cents/day) sort to [−100, 50, 200, 225, 233.33…, 400]; the lower
    median (rank (6+1) div 2 = 3) is 200 → slope 2.0 $/day (the outlier
    does NOT drag it). Residuals x/100 − 2t = [1, 1, −2, 2] → lower
    median (rank 2) = 1.0 intercept."""
    import datetime as _dt

    rows = [
        (1, 1, _dt.date(2024, 1, 1), 1.0),
        (2, 1, _dt.date(2024, 1, 2), 3.0),
        (3, 1, _dt.date(2024, 1, 3), 2.0),
        (4, 1, _dt.date(2024, 1, 5), 10.0),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate date, "
        "o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ts_theil_sen"](spark, str(tmp_path)).toPandas()
    msg = compare("ts_theil_sen", sdf, con.sql(oracles["ts_theil_sen"]).df())
    assert not msg, msg
    row = sdf.iloc[0]
    assert row["n_days"] == 4 and row["n_pairs"] == 6
    assert row["slope_per_day"] == 2.0
    assert row["intercept"] == 1.0


def test_a_welch_ttest_hand_computed(spark, tmp_path):
    """Welch pin: URGENT cents [100,200,300] (mean 200, var 10000), LOW
    [100,500] (mean 300, var 80000) → mean_diff −1.00 dollars,
    t = −100/√(10000/3 + 40000) ≈ −0.480384, Welch–Satterthwaite
    df ≈ 1.16955."""
    import datetime as _dt

    rows = [
        (1, 1, "1-URGENT", _dt.date(2024, 1, 1), 1.0),
        (2, 1, "1-URGENT", _dt.date(2024, 1, 2), 2.0),
        (3, 1, "1-URGENT", _dt.date(2024, 1, 3), 3.0),
        (4, 1, "5-LOW", _dt.date(2024, 1, 1), 1.0),
        (5, 1, "5-LOW", _dt.date(2024, 1, 2), 5.0),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string, "
        "o_orderdate date, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["a_welch_ttest"](spark, str(tmp_path)).toPandas()
    msg = compare("a_welch_ttest", sdf, con.sql(oracles["a_welch_ttest"]).df())
    assert not msg, msg
    row = sdf.iloc[0]
    assert row["n1"] == 3 and row["n2"] == 2
    assert row["mean_diff"] == -1.0
    assert row["t_stat"] == -0.480384
    assert row["welch_df"] == 1.16955


def test_ts_trend_outliers_hand_computed(spark, tmp_path):
    """Detrended-fence pin: 15 flat $1.00 days with a $10.00 spike at day
    8. Full 7-day windows exist for days 4–12; detrended values are 0 at
    the edges (spike outside the window), 100−1000 = −900 for the six
    spike-adjacent flat days, and 6·1000−600 = 5400 for the spike. The
    fences from q1=−900, q3=0 are [−2250, 1350], so ONLY the spike day
    flags, direction 'high'."""
    import datetime as _dt

    rows = [
        (i, 1, _dt.date(2024, 1, i), 10.0 if i == 8 else 1.0)
        for i in range(1, 16)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate date, "
        "o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ts_trend_outliers"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ts_trend_outliers", sdf, con.sql(oracles["ts_trend_outliers"]).df()
    )
    assert not msg, msg
    assert len(sdf) == 1
    row = sdf.iloc[0]
    assert row["revenue"] == 10.0
    assert row["detrended_x7"] == 5400
    assert row["direction"] == "high"


def test_ev_conversion_lag_hand_computed(spark, tmp_path):
    """Lag pin: u1's first event precedes their purchase by 2 days 1 h →
    bucket 2; u2's FIRST event is the purchase itself → lag 0; u3 never
    converts and is excluded. Cum shares 0.5 then 1.0."""
    events = [
        (1, _ts(0), 1, "click", 0.0),
        (2, _ts(60 * 24 * 2 + 60), 1, "purchase", 5.0),
        (3, _ts(0), 2, "purchase", 5.0),
        (4, _ts(10), 2, "view", 0.0),
        (5, _ts(0), 3, "view", 0.0),
    ]
    con = _write_events(spark, tmp_path, events)
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ev_conversion_lag"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ev_conversion_lag", sdf, con.sql(oracles["ev_conversion_lag"]).df()
    )
    assert not msg, msg
    got = [tuple(r) for r in sdf.itertuples(index=False)]
    assert got == [(0, 1, 0.5), (2, 1, 1.0)]


def test_ts_mann_kendall_hand_computed(spark, tmp_path):
    """MK pin on [1, 2, 2, 3] dollars across 4 days: five +1 sign pairs
    and one tie → S = 5; n(n−1)(2n+5) = 156 minus the one tie group's
    2·1·9 = 18 → Var·18 = 138; z = (5−1)/√(138/18)."""
    import datetime as _dt
    import math

    rows = [
        (1, 1, _dt.date(2024, 1, 1), 1.0),
        (2, 1, _dt.date(2024, 1, 2), 2.0),
        (3, 1, _dt.date(2024, 1, 3), 2.0),
        (4, 1, _dt.date(2024, 1, 4), 3.0),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate date, "
        "o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ts_mann_kendall"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ts_mann_kendall", sdf, con.sql(oracles["ts_mann_kendall"]).df()
    )
    assert not msg, msg
    row = sdf.iloc[0]
    assert (row["n_days"], row["s_stat"], row["var_s_x18"]) == (4, 5, 138)
    assert row["z"] == round(4 / math.sqrt(138 / 18), 6)


def test_ts_granger_matches_independent_lstsq(spark, tmp_path):
    """Granger pin: the closed-form centered-Cramer F must match an
    independent numpy least-squares solve of both models on a planted
    30-day series where purchases partially follow yesterday's clicks —
    and the Spark result must hash-match the DuckDB oracle."""
    import duckdb
    import numpy as np

    clicks = [(d * 7) % 13 + 1 for d in range(30)]
    purch = [
        ((d * 5) % 3) + 1 + (clicks[d - 1] if d > 0 else 0)
        for d in range(30)
    ]
    rows, eid = [], 0
    for d in range(30):
        for _ in range(clicks[d]):
            rows.append((eid, d, "click")); eid += 1
        for _ in range(purch[d]):
            rows.append((eid, d, "purchase")); eid += 1
    spark.createDataFrame(
        [
            (e, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d),
             1, et, 1.0, "{}")
            for e, d, et in rows
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ts_granger"](spark, str(tmp_path)).toPandas()
    msg = compare("ts_granger", sdf, con.sql(oracles["ts_granger"]).df())
    assert not msg, msg

    def f_stat(effect, own_lag, cause_lag):
        y = np.array(effect[1:], dtype=float)
        u = np.array(own_lag[:-1], dtype=float)
        v = np.array(cause_lag[:-1], dtype=float)
        n = len(y)
        Xr = np.column_stack([np.ones(n), u])
        Xu = np.column_stack([np.ones(n), u, v])
        rss = lambda X: float(  # noqa: E731
            np.sum((y - X @ np.linalg.lstsq(X, y, rcond=None)[0]) ** 2)
        )
        rr, ru = rss(Xr), rss(Xu)
        return (n - 3) * (rr - ru) / ru

    got = {r["cause"]: r["f_stat"] for _, r in sdf.iterrows()}
    assert abs(got["click"] - f_stat(purch, purch, clicks)) < 1e-4
    assert abs(got["purchase"] - f_stat(clicks, clicks, purch)) < 1e-4
    assert int(sdf["n_pairs"].iloc[0]) == 29
    # the planted coupling must make clicks->purchases the stronger claim
    assert got["click"] > got["purchase"]


def test_ts_holt_winters_matches_python_fold(spark, tmp_path):
    """Holt-Winters pin: a planted 21-day single-type series with weekly
    structure, replayed by an independent Python fold implementing the
    same recursion (6dp half-away rounding per step) — and hash-matched
    against the DuckDB oracle."""
    import math

    import duckdb

    vals = [((d % 7) * 3 + d // 7 + 1) for d in range(21)]  # season + drift
    rows = []
    for d, v in enumerate(vals):
        rows.append(
            (d, datetime.datetime(2024, 3, 1) + datetime.timedelta(days=d),
             1, "click", float(v), "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ts_holt_winters"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "ts_holt_winters", sdf, con.sql(oracles["ts_holt_winters"]).df()
    )
    assert not msg, msg

    def r6(x):
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)

    lvl, trd, s = float(vals[0]), 0.0, [0.0] * 7
    for k in range(1, 21):
        y, slot = float(vals[k]), k % 7
        nl = r6(0.2 * (y - s[slot]) + 0.8 * (lvl + trd))
        trd = r6(0.1 * (nl - lvl) + 0.9 * trd)
        s[slot] = r6(0.3 * (y - nl) + 0.7 * s[slot])
        lvl = nl
    row = sdf.iloc[0]
    assert row["event_type"] == "click" and row["n_days"] == 21
    assert abs(row["level"] - lvl) < 1e-9
    assert abs(row["trend"] - trd) < 1e-9
    assert abs(row["seasonal_next"] - s[21 % 7]) < 1e-9
    assert abs(row["forecast_1d"] - r6(lvl + trd + s[0])) < 1e-9
    assert abs(row["forecast_7d"] - r6(lvl + 7 * trd + s[6])) < 1e-9


def test_ev_cuped_matches_independent_numpy(spark, tmp_path):
    """CUPED pin: planted users whose post spend tracks pre spend plus an
    arm effect; θ, ρ², and the adjusted means must match an independent
    numpy computation, and the adjustment must shrink the arm gap toward
    the true effect (the pre-period imbalance is removed)."""
    import duckdb
    import numpy as np

    rows, eid = [], 0
    xs, ys, arms = [], [], []
    for u in range(1, 41):
        x = (u * 13) % 29 + 3            # pre-period spend (imbalanced)
        y = 2 * x + ((u * 7) % 5) + (10 if u % 2 == 1 else 0)
        xs.append(x); ys.append(y); arms.append(u % 2)
        rows.append((eid, datetime.datetime(2024, 5, 1), u, "click",
                     float(x), "{}")); eid += 1
        rows.append((eid, datetime.datetime(2024, 5, 9), u, "purchase",
                     float(y), "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["ev_cuped"](spark, str(tmp_path)).toPandas()
    msg = compare("ev_cuped", sdf, con.sql(oracles["ev_cuped"]).df())
    assert not msg, msg

    x = np.array(xs, float) * 100   # cents
    y = np.array(ys, float) * 100
    a = np.array(arms)
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    rho2 = np.corrcoef(x, y)[0, 1] ** 2
    got = {int(r["arm"]): r for _, r in sdf.iterrows()}
    assert abs(got[0]["theta"] - round(theta, 6)) < 1e-4
    assert abs(got[0]["rho2"] - round(rho2, 6)) < 1e-4
    for arm in (0, 1):
        adj = (y[a == arm].mean()
               - theta * (x[a == arm].mean() - x.mean())) / 100
        assert abs(got[arm]["mean_adj"] - adj) < 1e-4
    raw_gap = got[1]["mean_y"] - got[0]["mean_y"]
    adj_gap = got[1]["mean_adj"] - got[0]["mean_adj"]
    assert abs(adj_gap - 10.0) < abs(raw_gap - 10.0) + 1e-9


def test_w_rolling_median_hand_computed(spark, tmp_path):
    """Rolling-median pin: one user, values 1,5,3,9 in time order —
    frames [1], [1,5], [1,3,5], [1,3,5,9] give medians 1, 3 (even-frame
    midpoint), 3, 4 — and the frame stays per-user (a second user's
    single event never mixes in)."""
    import duckdb

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, 0), 1, "click", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 0, 1, 0), 1, "click", 5.0, "{}"),
        (3, datetime.datetime(2024, 1, 1, 0, 2, 0), 1, "click", 3.0, "{}"),
        (4, datetime.datetime(2024, 1, 1, 0, 3, 0), 1, "click", 9.0, "{}"),
        (5, datetime.datetime(2024, 1, 1, 0, 0, 30), 2, "click", 100.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    sdf = qs["w_rolling_median"](spark, str(tmp_path)).toPandas()
    msg = compare(
        "w_rolling_median", sdf, con.sql(oracles["w_rolling_median"]).df()
    )
    assert not msg, msg
    got = {int(r["event_id"]): r["rmed"] for _, r in sdf.iterrows()}
    assert got == {1: 1.0, 2: 3.0, 3: 3.0, 4: 4.0, 5: 100.0}

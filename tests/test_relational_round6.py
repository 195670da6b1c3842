"""Round-6 relational additions: Markov transition matrix, CDC apply,
market-basket lift, grouped OLS — hand-checked semantics on planted
inputs."""

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_s string, event_type string"
    ).select(
        "event_id",
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
    )


def test_transition_matrix_hand_checked(spark):
    """Transitions are per-user consecutive pairs in (ts, event_id)
    order; the last event of each user emits none; probabilities are
    row-conditional fixed-point and the truncated row sums stay ≤ 1e6."""
    from lab3_spark.operators.events import transition_matrix

    rows = [
        (1, 7, "2024-01-01 10:00:00", "view"),
        (2, 7, "2024-01-01 10:01:00", "view"),
        (3, 7, "2024-01-01 10:02:00", "click"),
        (4, 8, "2024-01-01 09:00:00", "view"),
        (5, 8, "2024-01-01 09:01:00", "buy"),
        # same ts: event_id breaks the tie → view(6) → click(7)
        (6, 9, "2024-01-01 09:00:00", "view"),
        (7, 9, "2024-01-01 09:00:00", "click"),
    ]
    got = {
        (r.event_type, r.next_type): (r.n_trans, r.prob_fp)
        for r in transition_matrix(_ev(spark, rows)).collect()
    }
    # user 7: view→view, view→click; user 8: view→buy; user 9: view→click
    assert got == {
        ("view", "view"): (1, 250_000),
        ("view", "click"): (2, 500_000),
        ("view", "buy"): (1, 250_000),
    }


def test_transition_matrix_no_cross_user_pairs(spark):
    """Adjacent events of DIFFERENT users never form a transition."""
    from lab3_spark.operators.events import transition_matrix

    rows = [
        (1, 1, "2024-01-01 10:00:00", "a"),
        (2, 2, "2024-01-01 10:00:01", "b"),
    ]
    assert transition_matrix(_ev(spark, rows)).count() == 0


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey bigint, o_totalprice double, o_orderstatus string"
    )


def test_cdc_apply_last_writer_wins_and_tombstones(spark):
    """Key 21: I+U+D → dropped (latest is a tombstone).  Key 9: I+U →
    updated price (+50.00 in cents), status 'U', 2 changes.  Key 5:
    I only → original price survives."""
    from lab3_spark.operators.relational import cdc_apply, cdc_change_log

    orders = _orders(
        spark,
        [(21, 100.00, "O"), (9, 19.99, "F"), (5, 7.50, "O")],
    )
    got = {
        r.o_orderkey: (r.last_op, r.price_cents, r.o_orderstatus, r.n_changes)
        for r in cdc_apply(cdc_change_log(orders)).collect()
    }
    assert got == {
        9: ("U", 1999 + 5000, "U", 2),
        5: ("I", 750, "O", 1),
    }
    assert 21 not in got  # %3==0 and %7==0 → deleted last


def test_brand_pair_lift_exact_metrics(spark):
    """3 baskets over brands {A,B,C}: pair (A,B) in 2 baskets, A in 3,
    B in 2 → support 2/3, confidence(A→B) 2/3, lift 2·3/(3·2) = 1.
    Duplicate lineitems of one brand in a basket collapse (distinct)."""
    from lab3_spark.operators.relational import brand_pair_lift

    li = spark.createDataFrame(
        [
            (1, 11),
            (1, 12),
            (1, 11),  # dup brand A in basket 1 — must not double count
            (2, 11),
            (2, 12),
            (3, 11),
            (3, 13),
        ],
        "l_orderkey bigint, l_partkey bigint",
    )
    part = spark.createDataFrame(
        [(11, "A"), (12, "B"), (13, "C")],
        "p_partkey bigint, p_brand string",
    )
    got = {
        (r.brand_a, r.brand_b): (
            r.pair_cnt,
            r.support_fp,
            r.confidence_fp,
            r.lift_fp,
        )
        for r in brand_pair_lift(li, part, min_pairs=1).collect()
    }
    assert got[("A", "B")] == (2, 666_666, 666_666, 1_000_000)
    assert got[("A", "C")] == (1, 333_333, 333_333, 1_000_000)
    assert ("B", "C") not in got  # never co-occur


def test_nation_revenue_ols_exact_line(spark):
    """Orders planted on an exact line (monthly cents = 1000 + 500·x)
    recover slope_fp = 500e6 and intercept_fp = 1000e6 exactly; a
    nation with a single month has no fit row."""
    from lab3_spark.operators.relational import nation_revenue_ols

    orders = spark.createDataFrame(
        [
            # nation LINE: months 0,1,2 with cents 1000, 1500, 2000
            (1, 100, 10.00, "1992-01-15"),
            (2, 100, 15.00, "1992-02-15"),
            (3, 100, 20.00, "1992-03-15"),
            # nation ONE: single month → dropped
            (4, 200, 5.00, "1992-01-10"),
        ],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double, d string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("d").cast("timestamp").alias("o_orderdate"),
    )
    customer = spark.createDataFrame(
        [(100, 1), (200, 2)], "c_custkey bigint, c_nationkey bigint"
    )
    nation = spark.createDataFrame(
        [(1, "LINE"), (2, "ONE")], "n_nationkey bigint, n_name string"
    )
    rows = {
        r.n_name: (r.n_months, r.slope_fp, r.intercept_fp)
        for r in nation_revenue_ols(orders, customer, nation).collect()
    }
    assert rows == {"LINE": (3, 500_000_000, 1_000_000_000)}


def test_nation_revenue_ols_negative_slope_sign(spark):
    """Declining revenue yields a NEGATIVE slope; the double
    divide + floor is exact on these planted integer points."""
    from lab3_spark.operators.relational import nation_revenue_ols

    orders = spark.createDataFrame(
        [
            (1, 100, 20.00, "1992-01-15"),
            (2, 100, 10.00, "1992-02-15"),
        ],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double, d string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("d").cast("timestamp").alias("o_orderdate"),
    )
    customer = spark.createDataFrame(
        [(100, 1)], "c_custkey bigint, c_nationkey bigint"
    )
    nation = spark.createDataFrame(
        [(1, "DOWN")], "n_nationkey bigint, n_name string"
    )
    [r] = nation_revenue_ols(orders, customer, nation).collect()
    assert r.slope_fp == -1_000_000_000  # −1000 cents/month at 1e6 scale
    assert r.intercept_fp == 2_000_000_000


def test_ship_latency_percentiles_positional_rule(spark):
    """5 lineitems with latencies 1..5 days: p50 = idx (4*50)//100+1=3
    → 3 days; p95 = idx (4*95)//100+1=4 → 4 days (positional, no
    interpolation)."""
    from lab3_spark.operators.relational import ship_latency_percentiles

    orders = spark.createDataFrame(
        [(1, "1-URGENT", "1995-01-01")],
        "o_orderkey bigint, o_orderpriority string, d string",
    ).select(
        "o_orderkey",
        "o_orderpriority",
        F.col("d").cast("timestamp").alias("o_orderdate"),
    )
    li = spark.createDataFrame(
        [(1, i, f"1995-01-0{1 + i}") for i in range(1, 6)],
        "l_orderkey bigint, l_linenumber int, s string",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("s").cast("timestamp").alias("l_shipdate"),
    )
    [r] = ship_latency_percentiles(orders, li).collect()
    assert (r.n_lineitems, r.p50_days, r.p95_days) == (5, 3, 4)


def test_relational_division_hand(spark):
    from lab3_spark.operators.relational import relational_division

    rows = [
        (1, "a"), (1, "b"), (1, "c"),      # 1 has all three
        (2, "a"), (2, "b"),                # 2 misses c
        (3, "a"), (3, "b"), (3, "c"), (3, "c"),  # dup pair ignored
    ]
    df = spark.createDataFrame(rows, "k long, v string")
    got = {r["dividend"]: r["n_matched"]
           for r in relational_division(df, "k", "v").collect()}
    assert got == {1: 3, 3: 3}


def test_holt_forecast_linear_series_exact(spark):
    """On an exactly linear series y = 100 + 5·day, Holt locks on:
    level = last value, trend = slope, forecast = level + 7·slope."""
    from datetime import date, timedelta

    from lab3_spark.operators.relational import holt_forecast

    base = date(1995, 1, 1)
    rows = [
        (i, (100_00 + 5_00 * i) / 100.0, base + timedelta(days=i))
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate date"
    )
    r = holt_forecast(df).collect()[0]
    assert r["n_days"] == 30
    assert r["level"] == 100_00 + 5_00 * 29   # cents, locked on
    assert r["trend_fp"] == 5_00 * 100        # slope 5.00/day
    assert r["forecast_h"] == 100_00 + 5_00 * 36


def test_theilsen_robust_to_outlier(spark):
    """A single wild month cannot move the Theil-Sen slope (the OLS
    slope would swing), and Mann-Kendall still reads the trend."""
    from datetime import date

    from lab3_spark.operators.relational import nation_trend_robust

    # build raw orders: nation A via one customer; y = 1000 + 10*x
    # cents with one massive outlier at x=6
    orders = []
    for m in range(12):
        amount = (1000 + 10 * m) if m != 6 else 999_999
        orders.append(
            (m, 1, amount / 100.0, date(1992, 1 + m % 12, 1))
        )
    odf = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate date"
    )
    cdf = spark.createDataFrame([(1, 7)], "c_custkey long, c_nationkey long")
    ndf = spark.createDataFrame([(7, "X")], "n_nationkey long, n_name string")
    r = nation_trend_robust(odf, cdf, ndf).collect()[0]
    assert r["n_months"] == 12
    # true slope 10 cents/month -> 10_000_000 fp; outlier pairs are a
    # minority so the MEDIAN pairwise slope stays exactly on it
    assert r["theilsen_fp"] == 10_000_000
    assert r["mk_trend"] == 1


def test_order_cadence_hand_case(spark):
    from datetime import date

    from lab3_spark.operators.relational import order_cadence

    # customer 1: orders at day 0, 10, 20, 90 -> gaps 10, 10, 70
    # customer 2: single order -> no gap
    rows = [
        (1, 1, 1.0, date(1995, 1, 1)),
        (2, 1, 1.0, date(1995, 1, 11)),
        (3, 1, 1.0, date(1995, 1, 21)),
        (4, 1, 1.0, date(1995, 4, 1)),
        (5, 2, 1.0, date(1995, 6, 1)),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate date"
    )
    r = order_cadence(df).collect()[0]
    assert r["n_gaps"] == 3
    assert r["p50_days"] == 10       # position 2 of [10, 10, 70]
    # the engine-wide positional rule is (n-1)*p DIV 100 + 1 (the
    # ship_latency convention): for n=3, p95 -> position 2, not 3
    assert r["p95_days"] == 10
    assert r["mean_days_fp"] == 300_000  # mean 30.0 days

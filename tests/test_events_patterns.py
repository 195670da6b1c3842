"""Gaps-and-islands and cohort-retention: hand-checked run splits and
cohort ages on planted sequences."""

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


def test_type_islands_hand_checked(spark):
    """Runs split exactly at type changes; a type returning later
    starts a NEW island; equal timestamps order by event_id."""
    from lab3_spark.operators.events import type_islands

    rows = [
        (1, 7, "2024-01-01 10:00:00", "view"),
        (2, 7, "2024-01-01 10:01:00", "view"),
        (3, 7, "2024-01-01 10:02:00", "click"),
        (4, 7, "2024-01-01 10:03:00", "view"),   # view returns → island 3
        (5, 8, "2024-01-01 09:00:00", "view"),   # other user independent
        # same ts: event_id orders them → click(6) then view(7) = 2 islands
        (6, 9, "2024-01-01 09:00:00", "click"),
        (7, 9, "2024-01-01 09:00:00", "view"),
    ]
    got = [
        (r.user_id, r.island_id, r.event_type, r.n_events)
        for r in type_islands(_ev(spark, rows)).collect()
    ]
    assert got == [
        (7, 1, "view", 2),
        (7, 2, "click", 1),
        (7, 3, "view", 1),
        (8, 1, "view", 1),
        (9, 1, "click", 1),
        (9, 2, "view", 1),
    ]


def test_cohort_retention_hand_checked(spark):
    """Cohort = first-event week; ages count distinct users active in
    cohort+age week; gaps (inactive weeks) simply have no row."""
    from lab3_spark.operators.events import cohort_retention

    rows = [
        # user 1: first week W, active W and W+2
        (1, 1, "2024-01-01 10:00:00", "view"),
        (2, 1, "2024-01-15 10:00:00", "view"),
        # user 2: same cohort week, active W only (two events, one week)
        (3, 2, "2024-01-03 10:00:00", "view"),
        (4, 2, "2024-01-04 10:00:00", "view"),
        # user 3: next week's cohort, active W+1 and W+2
        (5, 3, "2024-01-08 10:00:00", "view"),
        (6, 3, "2024-01-16 10:00:00", "view"),
    ]
    got = {
        (r.cohort_week, r.age_weeks): r.n_users
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    # 2024-01-01 is a Monday → weeks are cleanly aligned; derive the
    # cohort week from the result instead of hardcoding the epoch math
    weeks = sorted({cw for cw, _ in got})
    w0 = weeks[0]
    assert got == {
        (w0, 0): 2,       # users 1 and 2 active in their cohort week
        (w0, 2): 1,       # user 1 returns two weeks later
        (w0 + 1, 0): 1,   # user 3's cohort
        (w0 + 1, 1): 1,   # user 3 active the following week
    }


def test_lagged_xcorr_detects_shift(spark):
    from datetime import datetime, timedelta

    from lab3_spark.operators.events import lagged_xcorr

    # views pulse on a 5-hour cycle; purchases are the SAME pulse
    # pattern 2 hours later -> corr peaks (exactly 1.0) at lag +2
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour in range(48):
        n_views = 5 if hour % 5 == 0 else 1
        for _ in range(n_views):
            rows.append((eid, base + timedelta(hours=hour), 1, "view", 0.0, "{}"))
            eid += 1
        n_purch = 5 if (hour - 2) % 5 == 0 else 1
        for _ in range(n_purch):
            rows.append((eid, base + timedelta(hours=hour), 1, "purchase", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r["lag"]: r["corr"] for r in lagged_xcorr(df).collect()}
    n = {r["lag"]: r["n_hours"] for r in lagged_xcorr(df).collect()}
    assert got[2] > 0.95  # peak at +2 (edge hours shave exactness)
    assert got[2] == max(got.values())
    assert got[0] < 0.5
    assert n[0] == 48 and n[2] == 46 and n[-3] == 45  # overlap shrinks


def test_lagged_xcorr_zero_variance_guarded(spark):
    from datetime import datetime, timedelta

    from lab3_spark.operators.events import lagged_xcorr

    base = datetime(2024, 1, 1)
    rows = []
    for hour in range(6):  # constant series: variance 0 -> corr 0.0
        rows.append((hour * 2, base + timedelta(hours=hour), 1, "view", 0.0, "{}"))
        rows.append((hour * 2 + 1, base + timedelta(hours=hour), 1, "purchase", 0.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    assert all(r["corr"] == 0.0 for r in lagged_xcorr(df).collect())


def test_user_activity_bitmap_hand(spark):
    from datetime import datetime, timedelta

    from lab3_spark.operators.events import user_activity_bitmap

    # 2024-01-01 is a Monday; day 5 = Saturday, day 6 = Sunday
    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: Mon, Tue, Tue again (dup day), Sat  -> 3 active days
        (1, base, 1), (2, base + timedelta(days=1), 1),
        (3, base + timedelta(days=1, hours=2), 1),
        (4, base + timedelta(days=5), 1),
        # user 2: Saturday and Sunday only -> weekend-only, 2 days
        (5, base + timedelta(days=5), 2), (6, base + timedelta(days=6), 2),
        # user 3: beyond the horizon -> excluded entirely
        (7, base + timedelta(days=100), 3),
        (8, base, 3),  # ...but day 0 still counts
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "view", 0.0, "{}") for i, ts, u in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        r["active_days"]: (r["n_users"], r["n_weekend_only"])
        for r in user_activity_bitmap(df).collect()
    }
    assert got[3] == (1, 0)   # user 1
    assert got[2] == (1, 1)   # user 2, weekend-only
    assert got[1] == (1, 0)   # user 3 (horizon-filtered to day 0)


def test_cdc_asof_keeps_pre_tombstone_state(spark, sf_dir):
    from lab3_spark.operators import relational as REL
    from lab3_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    log = REL.cdc_change_log(orders)
    asof = REL.cdc_apply(log.where("seq <= 2"))
    final = REL.cdc_apply(log)
    # a key hit by the seq-3 tombstone (7*3=21 also updated at seq 2)
    k21_asof = asof.where("o_orderkey = 21").collect()
    k21_final = final.where("o_orderkey = 21").collect()
    assert len(k21_asof) == 1 and k21_asof[0]["last_op"] == "U"
    assert len(k21_final) == 0  # deleted in the current snapshot


def test_cusum_locates_level_shift(spark):
    from datetime import datetime, timedelta

    from lab3_spark.operators.events import cusum_changepoint

    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour in range(40):
        v = 10.0 if hour < 25 else 50.0  # level shift after hour 24
        rows.append((eid, base + timedelta(hours=hour), 1, "view", v, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = cusum_changepoint(df).collect()[0]
    h0 = int(base.timestamp() // 3600)
    # |CUSUM| peaks at the LAST pre-shift hour (hour index 24)
    assert r["change_hour"] == h0 + 24
    assert r["n_hours"] == 40


def test_benford_organic_vs_truncated(spark):
    from lab3_spark.operators.profile import benford_first_digit

    # log-uniform magnitudes follow Benford closely
    import math

    rows = [(i, math.exp(i / 120.0) * 1.37) for i in range(1500)]
    df = spark.createDataFrame(rows, "k long, o_totalprice double")
    got = {r["digit"]: r for r in benford_first_digit(df).collect()}
    assert set(got) == set(range(1, 10))
    assert all(r["dev_fp"] < 40_000 for r in got.values())  # within 4pp
    # a truncated-domain column (all values 400-499) is maximally bent
    df2 = spark.createDataFrame(
        [(i, 400.0 + i % 100) for i in range(500)], "k long, o_totalprice double"
    )
    got2 = {r["digit"]: r for r in benford_first_digit(df2).collect()}
    assert set(got2) == {4}
    assert got2[4]["observed_fp"] == 1_000_000


def test_acf_detects_periodicity(spark):
    from datetime import datetime, timedelta

    from lab3_spark.operators.events import hourly_acf

    # 6-hour cycle: counts [9,1,1,1,1,1] repeating for 96 hours
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour in range(96):
        n = 9 if hour % 6 == 0 else 1
        for _ in range(n):
            rows.append((eid, base + timedelta(hours=hour), 1, "view", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r["lag"]: r["acf"] for r in hourly_acf(df, max_lag=12).collect()}
    assert got[6] > 0.95 and got[12] > 0.95   # the cycle and its double
    assert got[3] < 0                          # anti-phase


def test_decayed_leaderboard_recency_beats_volume(spark):
    from datetime import datetime, timedelta

    from lab3_spark.operators.events import decayed_leaderboard

    newest = datetime(2024, 1, 10)
    rows = []
    eid = 0
    # 'old' has 100 events 10 days ago (weight 2^-10 each);
    # 'fresh' has 5 events today -> decayed 5 > 100/1024
    for _ in range(100):
        rows.append((eid, newest - timedelta(days=10), 1, "old", 0.0, "{}")); eid += 1
    for _ in range(5):
        rows.append((eid, newest, 1, "fresh", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = [(r["event_type"], r["rnk"]) for r in decayed_leaderboard(df).collect()]
    assert got[0] == ("fresh", 1)  # recency wins despite 20x volume
    d = {r["event_type"]: r["decayed_fp"] for r in decayed_leaderboard(df).collect()}
    assert d["fresh"] == 5_000_000           # 5 full-weight events
    assert d["old"] == 100 * 10**6 // 1024   # exactly 2^-10 decayed


def test_seasonal_decomposition_removes_trend(spark):
    """A linearly GROWING series with a planted hour-of-day cycle:
    detrending must recover the cycle shape (peak hod positive,
    others negative) even though raw counts rise throughout."""
    from datetime import datetime, timedelta

    from lab3_spark.operators.events import seasonal_profile_decomposed

    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour in range(24 * 6):
        n = 2 + hour // 24 + (8 if hour % 24 == 5 else 0)  # trend + spike at hod 5
        for _ in range(n):
            rows.append((eid, base + timedelta(hours=hour), 1, "view", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r["hod"]: r["seasonal_fp"] for r in seasonal_profile_decomposed(df).collect()}
    assert len(got) == 24
    assert got[5] > 60_000                  # spike hod ~ +7.9 counts
    # the day-STAIRCASE trend aliases a small (< 1 count) ramp into
    # the indices — correct estimator behavior on a non-linear trend;
    # the planted spike must dominate everything else by an order of
    # magnitude and the non-spike indices must stay sub-count
    assert all(abs(v) < 10_000 for h, v in got.items() if h != 5)
    assert got[5] > 6 * max(abs(v) for h, v in got.items() if h != 5)

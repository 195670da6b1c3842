"""Round-6 batch 6: rolling KMV users, A/B z-test, RFM segments."""

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


def test_kmv_rolling_exact_below_k(spark):
    """Under k every synopsis is complete, so the rolling estimate is
    the EXACT distinct-user count of the trailing 7 days; a user seen
    on two days inside one window counts once."""
    from lab3_spark.operators.events import kmv_rolling_users

    rows = [
        (1, 10, "2024-01-01 10:00:00", "view"),
        (2, 11, "2024-01-01 11:00:00", "view"),
        (3, 10, "2024-01-02 10:00:00", "view"),  # repeat user next day
        (4, 12, "2024-01-05 10:00:00", "view"),
        (5, 13, "2024-01-20 10:00:00", "view"),  # far future: own window
    ]
    got = {
        r.day: r.est_users_7d
        for r in kmv_rolling_users(_ev(spark, rows)).collect()
    }
    assert set(got) == {"2024-01-01", "2024-01-02", "2024-01-05", "2024-01-20"}
    assert got["2024-01-01"] == 2  # {10, 11}
    assert got["2024-01-02"] == 2  # {10, 11} — repeat of 10 collapses
    assert got["2024-01-05"] == 3  # {10, 11, 12} (days 1,2,5 within 7)
    assert got["2024-01-20"] == 1  # {13}


def test_ab_ztest_hand_checked(spark):
    """Variant A (even ids): 2 users, 2 converted.  Variant B: 2 users,
    0 converted.  D=4, N=4, C=2, T=4 → z² = 16·4/(4·2·2) = 4.0 → not
    strictly > 4 → not significant at z=2."""
    from lab3_spark.operators.events import ab_conversion_ztest

    rows = [
        (1, 2, "2024-01-01 10:00:00", "purchase"),
        (2, 4, "2024-01-01 10:01:00", "purchase"),
        (3, 1, "2024-01-01 10:02:00", "view"),
        (4, 3, "2024-01-01 10:03:00", "view"),
    ]
    [r] = ab_conversion_ztest(_ev(spark, rows)).collect()
    assert (r.n_a, r.c_a, r.n_b, r.c_b) == (2, 2, 2, 0)
    assert r.z2 == 4.0
    assert r.significant == 0


def test_ab_ztest_degenerate_no_conversions(spark):
    """C = 0 → z² defined as 0, not a division error."""
    from lab3_spark.operators.events import ab_conversion_ztest

    rows = [
        (1, 1, "2024-01-01 10:00:00", "view"),
        (2, 2, "2024-01-01 10:01:00", "view"),
    ]
    [r] = ab_conversion_ztest(_ev(spark, rows)).collect()
    assert r.z2 == 0.0 and r.significant == 0


def test_rfm_segments_hand_checked(spark):
    """4 customers, quintile q=2 (halves): recent+frequent+big spenders
    land in (1,1,1); the census covers every customer exactly once."""
    from lab3_spark.operators.relational import customer_rfm_segments

    rows = []
    # customer 1: 3 orders, recent, large
    rows += [(i, 1, 100.0, f"1997-0{m}-01") for i, m in [(1, 1), (2, 2), (3, 3)]]
    # customer 2: 1 old small order
    rows += [(4, 2, 5.0, "1992-01-01")]
    # customer 3: 2 orders mid
    rows += [(5, 3, 50.0, "1995-01-01"), (6, 3, 50.0, "1995-02-01")]
    # customer 4: 1 recent mid order
    rows += [(7, 4, 60.0, "1997-06-01")]
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double, d string"
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("d").cast("timestamp").alias("o_orderdate"),
    )
    segs = customer_rfm_segments(orders, q=2).collect()
    assert sum(r.n_customers for r in segs) == 4
    cells = {(r.r_score, r.f_score, r.m_score): r.n_customers for r in segs}
    # customer 1 dominates every dimension → (1,1,1) exists
    assert cells.get((1, 1, 1), 0) >= 1
    # customer 2 is worst on every dimension → (2,2,2)
    assert cells.get((2, 2, 2), 0) >= 1

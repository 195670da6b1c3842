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


def test_weekly_churn_hand_checked(spark):
    """Week 0: users {1,2}; week 1: {2,3} — user 1 churned (50%).
    Week 1 has no successor → excluded.  Week 3 is isolated (no week
    4) → excluded too, even though its users all 'churned'."""
    from lab3_spark.operators.events import weekly_churn

    rows = [
        (1, 1, "1970-01-05 10:00:00", "view"),   # week 0
        (2, 2, "1970-01-06 10:00:00", "view"),   # week 0
        (3, 2, "1970-01-12 10:00:00", "view"),   # week 1
        (4, 3, "1970-01-13 10:00:00", "view"),   # week 1
        (5, 9, "1970-01-26 10:00:00", "view"),   # week 3 (isolated)
    ]
    got = {
        r.week: (r.n_active, r.n_churned, r.churn_fp)
        for r in weekly_churn(_ev(spark, rows)).collect()
    }
    assert got == {0: (2, 1, 500_000)}


def test_lang_confusion_shares_sum_per_row(spark):
    """Per-label shares are row-conditional: each label's truncated
    shares sum to ≤ 1e6 and every document is counted once."""
    from lab3_spark.operators.textstats import lang_confusion_matrix

    docs = spark.createDataFrame(
        [
            (1, "the of and to in is was he for it", "en"),
            (2, "xyzzy plugh foobar", "en"),
            (3, "le la les et un une", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = lang_confusion_matrix(docs).collect()
    assert sum(r.n_docs for r in rows) == 3
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, 0)
        by_lang[r.lang] += r.share_fp
    assert all(v <= 1_000_000 for v in by_lang.values())
    cm = {(r.lang, r.pred_lang): r.n_docs for r in rows}
    assert cm[("en", "en")] == 1 and cm[("en", "other")] == 1
    assert cm[("fr", "other")] == 1

"""Round-6 batch 5: mergeable bottom-k quantile synopsis and top
3-step paths."""

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, ts_s string, "
        "event_type string, value double",
    ).select(
        "event_id",
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )


def test_kmv_quantiles_small_groups_are_exact(spark):
    """Groups under k keep EVERY row, so the positional estimates are
    the exact sample quantiles; the ALL row merges both days."""
    from lab3_spark.operators.events import kmv_value_quantiles

    rows = [
        (1, 1, "2024-01-01 10:00:00", "a", 10.0),
        (2, 1, "2024-01-01 11:00:00", "a", 20.0),
        (3, 1, "2024-01-01 12:00:00", "a", 30.0),
        (4, 1, "2024-01-02 10:00:00", "a", 40.0),
        (5, 1, "2024-01-02 11:00:00", "a", 50.0),
    ]
    got = {
        r.day: (r.n_sample, r.p50_est, r.p90_est)
        for r in kmv_value_quantiles(_ev(spark, rows)).collect()
    }
    # day 1: sorted [10,20,30] → p50 idx (2*50)//100=1 → 20; p90 idx 1 → 20
    assert got["2024-01-01"] == (3, 20.0, 20.0)
    assert got["2024-01-02"] == (2, 40.0, 40.0)
    # ALL: union of complete days = all 5 → p50 idx 2 → 30, p90 idx 3 → 40
    assert got["ALL"] == (5, 30.0, 40.0)


def test_kmv_quantiles_merged_equals_one_shot(spark):
    """With k smaller than the day sizes, the ALL row must still equal
    the one-shot bottom-k over ALL events (KMV mergeability)."""
    from lab3_spark.operators.events import kmv_value_quantiles
    from lab3_spark.operators.rank import top_n_per_key

    rows = [
        (i, 1, f"2024-01-0{1 + i % 2} {10 + i // 10}:{i % 60:02d}:00", "a", float(i))
        for i in range(40)
    ]
    ev = _ev(spark, rows)
    k = 8
    got = {
        r.day: (r.n_sample, r.p50_est, r.p90_est)
        for r in kmv_value_quantiles(ev, k=k).collect()
    }
    one_shot = top_n_per_key(
        ev.select(
            F.lit("ALL").alias("day"),
            F.md5(F.col("event_id").cast("string")).alias("hk"),
            "value",
        ),
        ["day"],
        ["hk"],
        k,
    )
    vals = sorted(r.value for r in one_shot.collect())
    assert got["ALL"][0] == k
    assert got["ALL"][1] == vals[(k - 1) * 50 // 100]
    assert got["ALL"][2] == vals[(k - 1) * 90 // 100]


def test_top_paths_hand_checked(spark):
    """Paths are per-user sliding 3-grams in total order; users with
    fewer than 3 events contribute nothing."""
    from lab3_spark.operators.events import top_event_paths

    rows = [
        (1, 1, "2024-01-01 10:00:00", "a", 0.0),
        (2, 1, "2024-01-01 10:01:00", "b", 0.0),
        (3, 1, "2024-01-01 10:02:00", "c", 0.0),
        (4, 1, "2024-01-01 10:03:00", "a", 0.0),
        (5, 2, "2024-01-01 10:00:00", "a", 0.0),
        (6, 2, "2024-01-01 10:01:00", "b", 0.0),
        (7, 2, "2024-01-01 10:02:00", "c", 0.0),
        (8, 3, "2024-01-01 10:00:00", "x", 0.0),
        (9, 3, "2024-01-01 10:01:00", "y", 0.0),
    ]
    got = {
        r.path: r.n_paths for r in top_event_paths(_ev(spark, rows)).collect()
    }
    assert got == {"a>b>c": 2, "b>c>a": 1}

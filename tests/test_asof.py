"""As-of join golden tests (operators/asof.py)."""

from pyspark.sql import functions as F

from lab3_spark.operators.asof import asof_join


def _ts(s):
    return F.lit(s).cast("timestamp")


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00"),
            (1, "2024-01-01 00:30:00"),
            (2, "2024-01-01 00:05:00"),
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10.0),
            (1, "2024-01-01 00:20:00", 20.0),
            (2, "2024-01-01 00:06:00", 99.0),  # after the left row
        ],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")

    got = {
        (r["user_id"], str(r["ts"])): r["value_asof"]
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert got[(1, "2024-01-01 00:10:00")] == 10.0   # most recent prior
    assert got[(1, "2024-01-01 00:30:00")] == 20.0   # updated
    assert got[(2, "2024-01-01 00:05:00")] is None   # nothing at-or-before


def test_asof_tie_is_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00")], "user_id long, ts_s string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 7.0)], "user_id long, ts_s string, value double"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    (row,) = asof_join(left, right, on="user_id").collect()
    assert row["value_asof"] == 7.0  # right at equal ts is visible


def test_range_join_binned_equals_naive_inequality(spark):
    """The binned equi-join form is pair-for-pair the naive inequality
    join, including both window boundaries (exclusive lower, inclusive
    upper) and cross-bin matches."""
    from lab3_spark.operators.asof import range_join_binned

    w_min = 30
    left = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 01:00:00"),
            (2, 10, "2024-01-01 01:29:59"),
            (3, 11, "2024-01-01 02:00:00"),
            (4, 12, "2024-01-01 03:00:00"),  # no views at all
        ],
        "lid long, user_id long, ts_s string",
    ).select("lid", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            (10, "2024-01-01 00:30:00"),  # exactly w before left 1 → EXCLUDED
            (10, "2024-01-01 00:30:00.000001"),  # just inside for left 1
            (10, "2024-01-01 01:00:00"),  # equal ts → INCLUDED (left 1, 2)
            (10, "2024-01-01 01:15:00"),  # in window of left 2 only
            (11, "2024-01-01 01:59:00"),  # cross-bin match for left 3
            (12, "2024-01-01 02:29:00"),  # > w before left 4 → excluded
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))

    got = sorted(
        (r["lid"], str(r["r_ts"]))
        for r in range_join_binned(left, right, "user_id", "ts", "ts", w_min).collect()
    )
    naive = sorted(
        (r["lid"], str(r["r_ts"]))
        for r in left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") <= F.col("l.ts"))
            & (F.col("r.ts") > F.col("l.ts") - F.expr(f"INTERVAL {w_min} MINUTES")),
        )
        .select("l.lid", F.col("r.ts").alias("r_ts"))
        .collect()
    )
    assert got == naive
    assert (1, "2024-01-01 00:30:00") not in got      # boundary exclusive
    assert (1, "2024-01-01 01:00:00") in got          # boundary inclusive
    assert (3, "2024-01-01 01:59:00") in got          # crosses a bin edge
    assert not any(lid == 4 for lid, _ in got)


def test_range_join_binned_plan_is_equi_join(spark, sf_dir):
    """The range join plans as a hash/sort-merge EQUI-join — never a
    nested-loop or cartesian (the quadratic trap binning exists to
    avoid)."""
    from lab3_spark.operators.asof import attribution_window_join
    from lab3_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = (
        attribution_window_join(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan

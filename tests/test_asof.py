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

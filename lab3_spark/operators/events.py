"""Event-stream analytics (batch form; streaming twins in
lab3_spark/streaming/).

The reference is batch-only (SURVEY.md §2.8); these operators cover the
windowed/sessionized aggregations a pipeline runs over an events table
(event_id, ts, user_id, event_type, value, props).

Batch and streaming share the same logical expressions —
``tumbling_counts`` below is literally the micro-batch body of
streaming/windowed.py — so correctness checked here via the DuckDB
oracle transfers to the streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lab3_spark.functions.rounding import trunc

MONEY = 2
RATIO = 4


def tumbling_counts(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    ``F.window`` buckets rows into [start, end) windows — identical
    bucketing to DuckDB's time_bucket for aligned widths."""
    return (
        events.groupBy(
            F.window("ts", width).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), MONEY).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def daily_active_users(events: DataFrame) -> DataFrame:
    """Exact daily distinct users (count-distinct shuffles twice:
    partial distinct then count; use approx_dau at 100 TB)."""
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau"))
        .orderBy("day")
    )


def approx_dau(events: DataFrame, rsd: float = 0.01) -> DataFrame:
    """HyperLogLog++ distinct users — the scale path (single shuffle,
    fixed-size sketch per group; no oracle: approximate)."""
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.approx_count_distinct("user_id", rsd).alias("dau"))
        .orderBy("day")
    )


def props_stats(events: DataFrame) -> DataFrame:
    """JSON prop extraction (props = '{"k": N}') + per-type stats.

    get_json_object is JVM-side Jackson — no Python; the oracle uses
    the same-regex extraction to stay engine-neutral."""
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("bigint")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            trunc(F.avg("k"), RATIO).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization via window functions (lag + running sum
    of session-break flags) — the classic shuffle-once formulation:
    one exchange on user_id, then two ordered window passes.

    Returns one row per session: (user_id, session_start, session_end,
    n_events).  The streaming twin uses session_window/
    applyInPandasWithState (lab3_spark/streaming/)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = gap_minutes * 60 * 1_000_000
    with_breaks = events.withColumn(
        # integer microseconds (unix_micros / epoch_us in the oracle) so
        # the gap comparison is exact in both engines
        "is_break",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1, 0).over(w) > gap_us
        ).cast("int"),
    ).withColumn(
        # lag default 0.0 makes each user's first event a break, so the
        # running sum of breaks is a 1-based per-user session id.
        "session_id",
        F.sum("is_break").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_breaks.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_id")
    )

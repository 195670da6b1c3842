"""Stream-stream joins (Structured Streaming extension).

The last major streaming shape the engine covers: joining two event
streams on a key + EVENT-TIME RANGE.  Spark buffers both sides in the
state store; the watermarks + the time-range condition are what make
the state BOUNDED — each side can discard rows older than
(watermark - range) because no future row can still match them.
Without both, an inner stream-stream join would buffer forever — the
100 TB failure mode is state growth, not throughput.

Semantics: with a bounded source and availableNow, the inner
stream-stream join emits exactly the batch join of the full inputs —
which is what the DuckDB oracle states (the driver's correctness gate
compares them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_interval_join(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """views ⋈ purchases of the same user with purchase_ts in
    [view_ts, view_ts + gap] — attribution's classic interval join.

    Works on a batch OR streaming `events` DataFrame (the expressions
    are identical; only the source differs).  Both sides carry
    watermarks so the streaming state store can evict: a buffered view
    older than (watermark + gap) can never match a future purchase."""
    views = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_event_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return (
        views.join(
            purchases,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {gap}")),
            "inner",
        )
        .select(
            F.col("v_user").alias("user_id"),
            "view_event_id",
            "purchase_event_id",
            "view_ts",
            "purchase_ts",
        )
    )

"""As-of (point-in-time) join — an operator Spark has no native form
for (SURVEY custom-operator policy (a): composition of existing
DataFrame ops).

For each LEFT row, attach the most recent RIGHT row with the same key
whose timestamp is <= the left timestamp.  Implemented as the classic
union-and-carry-forward window: tag both sides, union, and carry the
last right-side payload forward over an event-time window per key.

Cost: ONE shuffle (the window partition by key) over left+right
combined — versus the naive range-join which explodes to left×right
per key.  At 100 TB this is the difference between a linear pass and
a quadratic blow-up; it is how time-series stores implement as-of
semantics on top of sorted storage.

Ties (right.ts == left.ts) are included (<=), matching the common
as-of definition; among equal-ts right rows the last by (ts, tag
order) wins deterministically because right rows sort before left
rows at the same timestamp via the tag ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
) -> DataFrame:
    """left columns + ``<value_col><suffix>`` = most recent right value
    at-or-before the left row's timestamp (NULL if none)."""
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        on, ts, *[F.col(c).alias(f"{c}{suffix}") for c in value_cols]
    ).withColumn("_side", F.lit(0))
    carried = [f"{c}{suffix}" for c in value_cols]
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal ts, so a left
    # row sees a right row with the exact same timestamp
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in carried:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return unioned.where(F.col("_side") == 1).drop("_side")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_minutes: int,
) -> DataFrame:
    """Interval join — all (left, right) pairs with the same key and
    ``right_ts`` in the half-open window ``(left_ts − w, left_ts]`` —
    executed as an EQUI-join on (key, time bin).

    A naive inequality join has no equi-keys, so Spark can only plan a
    (broadcast) nested-loop — quadratic per key, the classic range-join
    trap.  Binning restores an equi-key: with bin width = the window
    size, every qualifying right row sits in the left row's bin or the
    one before it (r > l−w ≥ (lb−1)·w and r ≤ l < (lb+1)·w), so the
    left side explodes into exactly 2 candidate bins, the join is a
    plain shuffled equi-join on (key, bin), and the exact interval
    predicate filters the ≤ 2× candidates afterwards.  This is the
    bucketed range-join strategy production engines use (Databricks
    RANGE_JOIN hint semantics), expressed in stock DataFrame ops.

    Timestamps compare as integer microseconds on the Spark side so
    the window boundary is exact in both engines.  Returns the
    MATCHED pairs (inner semantics — a caller needing unmatched left
    rows left-joins the aggregate back, as attribution_window_join
    does): the left columns plus the matched right timestamp
    (``r_ts``)."""
    win_us = window_minutes * 60 * 1_000_000
    l = left.withColumn("_l_us", F.unix_micros(F.col(left_ts)))
    r = right.select(
        F.col(key).alias("_r_key"),
        F.col(right_ts).alias("r_ts"),
        F.unix_micros(F.col(right_ts)).alias("_r_us"),
    ).withColumn("_bin", F.expr(f"_r_us div {win_us}"))
    cand = l.select(
        *left.columns,
        "_l_us",
        F.explode(
            F.array(
                F.expr(f"_l_us div {win_us}"),
                F.expr(f"_l_us div {win_us} - 1"),
            )
        ).alias("_bin"),
    )
    return (
        cand.join(
            r,
            (F.col(key) == F.col("_r_key")) & (cand["_bin"] == r["_bin"]),
        )
        .where(
            (F.col("_r_us") > F.col("_l_us") - win_us)
            & (F.col("_r_us") <= F.col("_l_us"))
        )
        .drop("_bin", "_r_key", "_r_us", "_l_us")
    )


def attribution_window_join(
    events: DataFrame,
    window_minutes: int = 30,
    target: str = "purchase",
    source: str = "view",
) -> DataFrame:
    """(purchase_id, user_id, purchase_ts, n_views, first_view_ts):
    each ``target`` event joined to the ``source`` events of the same
    user in the preceding ``window_minutes`` — the marketing-
    attribution window, via :func:`range_join_binned` (equi-join on
    (user, bin), never an inequality nested-loop).

    Targets with zero in-window sources keep a row (n_views = 0,
    first_view_ts NULL) — attribution must report the unattributed
    conversions too; the matched-pair aggregate is left-joined back
    onto the target set.  The 2× bin explosion can pair one target
    with the same source through only ONE bin (bins partition time),
    so the matched pairs are already distinct — the aggregate counts
    them directly."""
    p = events.where(F.col("event_type") == target).select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    v = events.where(F.col("event_type") == source).select("user_id", "ts")
    matched = range_join_binned(p, v, "user_id", "ts", "ts", window_minutes)
    agg = matched.groupBy("purchase_id").agg(
        F.count("r_ts").alias("n_views"),
        F.date_format(F.min("r_ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "first_view_ts"
        ),
    )
    return (
        p.join(agg, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.coalesce("n_views", F.lit(0)).alias("n_views"),
            "first_view_ts",
        )
        .orderBy("purchase_id")
    )

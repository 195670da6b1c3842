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

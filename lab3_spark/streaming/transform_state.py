"""transformWithStateInPandas — Spark 4's arbitrary-stateful-processing
API (SPARK-45939, successor to applyInPandasWithState): a
StatefulProcessor object with NAMED, independently-typed state
variables per key (value state, list state, map state, timers, TTL)
instead of one monolithic state tuple.

The operator here is the per-user incremental profile a training-data
/ telemetry pipeline keeps on an unbounded stream: lifetime event
count + value total (ValueState) alongside a bounded recent-values
window (ListState, capped) — two differently-shaped state variables on
one key, which the old API could only fake by packing everything into
one struct.  State is O(active users) × O(1) per user: runnable
forever.

The sibling sessionizer (streaming/stateful.py) stays on
applyInPandasWithState deliberately — the engine demonstrates BOTH
extension points, old and new.

CONTAINER NOTE: the transformWithState state-server protocol imports
google.protobuf at query start; this container lacks protobuf (and
installs are disallowed), so tests/test_transform_state.py
importorskips — the operator is complete and exercised wherever
pyspark's standard protobuf dependency exists.  applyInPandasWithState
(no protobuf dependency) carries the in-container stateful coverage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("recent_values", T.ArrayType(T.DoubleType())),
    ]
)

_AGG_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

_RECENT_SCHEMA = T.StructType([T.StructField("v", T.DoubleType())])


class UserProfileProcessor(StatefulProcessor):
    """Per-user lifetime aggregate + last-K values."""

    def __init__(self, keep_last: int = 3):
        self._keep_last = keep_last

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", _AGG_SCHEMA)
        self._recent = handle.getListState("recent", _RECENT_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = (self._agg.get() or (0, 0.0))
        new_vals: list[float] = []
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            new_vals.extend(float(v) for v in pdf["value"])
        old = [v for (v,) in self._recent.get()]
        recent = (old + new_vals)[-self._keep_last :]
        self._agg.update((n, total))
        self._recent.clear()
        if recent:
            self._recent.appendList([(v,) for v in recent])
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "recent_values": [recent],
            }
        )

    def close(self) -> None:
        pass


def streaming_user_profile(
    events: DataFrame, keep_last: int = 3
) -> DataFrame:
    """events stream (user_id, ts, value, ...) → per-user profile
    updates, one row per (user, micro-batch) carrying the lifetime
    aggregate and the last-``keep_last`` values."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(keep_last),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

"""Partition-spreading helper for narrow per-row pipelines.

The local testdata tables are single-row-group parquet files — Spark
cannot split a row group, so every scan arrives as ONE partition and
all per-row expression work (tokenize, quality features, fixed-point
signatures) serializes onto one core.  The fix must not damage the
100 TB plan: an UNCONDITIONAL ``repartition(par)`` is a full shuffle
of the corpus, which a cluster scan (thousands of input splits)
neither needs nor forgives.

``spread`` repartitions ONLY when the frame has fewer partitions than
the session's parallelism — i.e. it round-robins the pathological
small-scan case and is a no-op exactly when the scan is already
parallel.  The partition check reads the planned RDD's partition
count (plan analysis, no job)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin `df` to the session parallelism iff it currently has
    fewer partitions — narrow pipelines over few-partition scans
    otherwise serialize on one core; already-parallel inputs pass
    through untouched (no shuffle)."""
    par = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


_PERSISTED_LATEST: dict[str, DataFrame] = {}


def persist_latest(key: str, df: DataFrame) -> DataFrame:
    """``persist()`` with bounded growth: drops the PREVIOUS frame
    cached under ``key`` first, so repeated invocations of an operator
    hold at most one cached copy per session.  Plain per-call persists
    accumulate in Spark's CacheManager until explicitly unpersisted —
    the round-3 review measured them as a slow storage-memory leak in
    a long-lived session running the catalog repeatedly.

    Single-driver assumption: the registry is keyed by ``key`` alone
    (process-global).  Two interleaved catalog runs — or threads —
    sharing a key would unpersist a frame the other run still reads;
    that frame silently reverts to recompute-per-action (correct, just
    uncached).  The verify/bench flow is one driver, one run at a
    time, so this is the intended trade; key by session id if that
    ever changes."""
    prev = _PERSISTED_LATEST.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # session may be stopped/replaced; nothing to free
    _PERSISTED_LATEST[key] = df
    return df.persist()

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

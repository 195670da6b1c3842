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

from pyspark.sql import Column, DataFrame


def one_window_partition() -> Column:
    """A constant, NON-FOLDABLE partition key for window frames that
    are legitimately single-partition (metadata-scale: per-partition
    offsets, post-limit k rows, B resample means).

    ``partitionBy(F.lit(0))`` does NOT silence the WindowExec "No
    Partition Defined" warning: the optimizer constant-folds the
    literal out of the partition spec, leaving it empty again (measured
    round 8 — the r6 lit(0) sites all still warned).  ``pmod(
    spark_partition_id(), 1)`` is 0 for every row but opaque to
    constant folding, so the spec stays non-empty: same single-task
    placement, no warning masking real ones during verify runs."""
    from pyspark.sql import functions as F

    return F.pmod(F.spark_partition_id(), F.lit(1))


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
            # non-blocking: round 5's drift attribution measured the
            # synchronous executor-sync of blocking=True at ~0.1-0.2 s
            # PER CALL on the rank-machinery queries — a fixed tax on
            # every hot-path invocation to make a diagnostics counter
            # deterministic.  Async release frees the entry within
            # milliseconds; tests that count getPersistentRDDs() poll
            # until the count settles (tests/test_cache_bounded.py)
            # instead of taxing production calls.
            prev.unpersist(blocking=False)
        except Exception:
            pass  # session may be stopped/replaced; nothing to free
    _PERSISTED_LATEST[key] = df
    return df.persist()


def memo_persist(key: str, df: DataFrame) -> DataFrame:
    """Bounded cross-invocation MEMOIZATION: if the frame registered
    under ``key`` has the same canonical analyzed plan as ``df``
    (Catalyst ``sameResult`` — the exact predicate Spark's own cache
    lookup uses to substitute InMemoryRelations), return the cached
    frame and recompute NOTHING; otherwise retire the old entry and
    persist ``df``.

    This is the legitimate half of a behavior round 4 found by
    accident: connected_components' per-iteration ``unpersist()`` was
    a silent no-op (it targeted a Project OVER the persisted plan, not
    the plan itself), so iteration caches leaked — and repeat runs
    then cache-HIT those leaked entries via sameResult matching,
    making warm runs ~4× faster.  The leak was unbounded growth; the
    reuse was real memoization of a deterministic plan.  memo_persist
    keeps the reuse and bounds the growth to one entry per key:
    same input (same plan) → hit; different input (new sf_dir, new
    source data path) → structural mismatch → replace.

    Caveat shared with all Spark caching: a hit serves the data as of
    materialization — if the underlying FILES mutate under an
    unchanged path, the cache is stale (testdata is immutable; a real
    deployment keys datasets by snapshot/version path)."""
    prev = _PERSISTED_LATEST.get(key)
    if prev is not None:
        try:
            if (
                prev._jdf.queryExecution()
                .analyzed()
                .sameResult(df._jdf.queryExecution().analyzed())
            ):
                return prev
        except Exception:
            pass  # stale/stopped session — fall through to replace
    return persist_latest(key, df)


_RETIRED_LATEST: dict[str, DataFrame] = {}


def retire_latest(key: str, df: DataFrame) -> DataFrame:
    """Register ``df`` as the latest LONG-LIVED result frame under
    ``key``, freeing the previous call's frame — `persist_latest`'s
    bounded-growth contract extended to frames that may be
    localCheckpoint-backed (where ``unpersist()`` is a silent no-op;
    see :func:`free_checkpoint`).

    Used for iterative operators' RETURNED frames: the final
    labels/ranks must stay persisted until the caller consumes them,
    so the operator can't free them itself — instead the NEXT call
    retires them.  Same single-driver assumption as `persist_latest`,
    with a sharper edge: a checkpoint-backed previous result cannot be
    recomputed, so re-collecting a stale handle after the next call
    raises instead of recomputing.  The verify/bench flow consumes each
    result immediately; this is the intended trade."""
    prev = _RETIRED_LATEST.pop(key, None)
    if prev is not None:
        try:
            if not free_checkpoint(prev):
                prev.unpersist(blocking=True)
        except Exception:
            pass  # session may be stopped/replaced; nothing to free
    _RETIRED_LATEST[key] = df
    return df


_RESULT_MEMO: dict[str, tuple[DataFrame, DataFrame]] = {}

# monotone count of memo_result cache hits — bench.py samples it
# around each run to tell "re-computed" from "served from memo" (a
# memo-served pass measures cache-read time, not the computation, and
# must not be the headline number)
_RESULT_MEMO_HITS = 0


def memo_result_hit_count() -> int:
    return _RESULT_MEMO_HITS


def memo_result(key: str, input_df: DataFrame, build) -> DataFrame:
    """Input-keyed RESULT memo for driver-looped iterative operators.

    `memo_persist` can only serve frames whose PLAN recurs — but an
    iterative fixpoint (connected components, PageRank, Lloyd) does
    its work driver-side DURING construction (per-iteration count()
    jobs), so by the time the output plan exists the cost is already
    paid.  This memo keys on the INPUT plan instead: if ``input_df``
    is `sameResult`-equal to the previous call's input under ``key``,
    the previous RESULT frame is returned and the loop never runs —
    the long-lived-driver warm path for composite gates.  One entry
    per key (bounded); a different input replaces it.

    The cached result may be checkpoint-backed; it stays valid
    because replacement happens only when a new result supersedes it
    (and `retire_prefix` frees the old checkpoints in the same
    build).  Same single-driver assumption as the other registries."""
    prev = _RESULT_MEMO.get(key)
    if prev is not None:
        try:
            if (
                prev[0]._jdf.queryExecution()
                .analyzed()
                .sameResult(input_df._jdf.queryExecution().analyzed())
            ):
                global _RESULT_MEMO_HITS
                _RESULT_MEMO_HITS += 1
                return prev[1]
        except Exception:
            pass  # stale/stopped session — fall through to rebuild
    result = build()
    _RESULT_MEMO[key] = (input_df, result)
    return result


def memo_result_invalidate(prefix: str) -> None:
    """Drop every result-memo entry whose key starts with ``prefix``.

    An operator family that frees shared backing state when it
    rebuilds (components: retire_prefix over checkpoints, replaced
    iteration persists) must invalidate ALL its result entries at
    rebuild time — a sibling entry under a different parameter key
    could otherwise outlive the checkpoints its lineage is rooted at
    and raise on recompute."""
    for k in [k for k in _RESULT_MEMO if k.startswith(prefix)]:
        _RESULT_MEMO.pop(k, None)


def retire_prefix(prefix: str) -> None:
    """Free EVERY retired frame whose key starts with ``prefix`` — the
    function-entry form of :func:`retire_latest` for operators that pin
    several checkpoint frames per run (one per CHECKPOINT_EVERY
    rounds).  Freeing at the NEXT call's entry instead of mid-run
    keeps two invariants the mid-run single-key form broke (round-4
    advice): (a) memo-persisted per-iteration frames whose lineage is
    rooted at an earlier checkpoint stay recomputable for the whole
    run, and (b) the frame returned to the caller — possibly
    checkpoint-backed — stays valid until the operator is invoked
    again (that next-call invalidation is the documented contract)."""
    for key in [k for k in _RETIRED_LATEST if k.startswith(prefix)]:
        prev = _RETIRED_LATEST.pop(key)
        try:
            if not free_checkpoint(prev):
                prev.unpersist(blocking=True)
        except Exception:
            pass  # session may be stopped/replaced; nothing to free


def free_checkpoint(df: DataFrame) -> bool:
    """Explicitly unpersist the RDD behind a ``localCheckpoint``-backed
    frame.  ``DataFrame.unpersist()`` is a SILENT NO-OP for checkpointed
    frames — they are RDD-level persists, invisible to the SQL
    CacheManager — so iterative operators that "unpersist" a superseded
    checkpoint actually leave it pinned until the ContextCleaner GCs the
    JVM-side reference.  This reaches the LogicalRDD's stored RDD and
    frees it NOW.

    DANGER: a locally-checkpointed RDD has truncated lineage — it
    CANNOT be recomputed after unpersisting, so only call this on a
    frame that has been fully superseded (its successor materialized)
    and will never be read again.  Returns False (no-op) when ``df`` is
    not directly checkpoint-backed."""
    try:
        analyzed = df._jdf.queryExecution().analyzed()
        if analyzed.getClass().getName() != (
            "org.apache.spark.sql.execution.LogicalRDD"
        ):
            return False
        analyzed.rdd().unpersist(True)
        return True
    except Exception:
        return False

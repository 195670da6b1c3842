"""Mergeable quantile digest (round 12): compaction invariants,
determinism, build-vs-merge equivalence, and the rank-error contract
the gate asserts."""

from __future__ import annotations

import math
import os
import random

import pyspark.sql.functions as F

from lab3_spark.operators.quantile_sketch import (
    compress_centroids,
    daily_value_digest,
    digest_union,
    estimate_quantile,
    kll_daily_quantile_check,
)


def _rank_interval(sorted_vals, v):
    lo = sum(1 for x in sorted_vals if x < v)
    hi = sum(1 for x in sorted_vals if x <= v)
    return lo + 1, max(hi, lo + 1)


# ---------------------------------------------------------------------------
# pure-python core
# ---------------------------------------------------------------------------


def test_compress_preserves_mass_and_order():
    rng = random.Random(7)
    vals = sorted(rng.uniform(0, 100) for _ in range(1000))
    means, weights = compress_centroids(vals, [1] * len(vals), cap=13)
    assert sum(weights) == 1000
    assert all(w <= 13 for w in weights)
    assert means == sorted(means)
    # weighted mean preserved exactly up to float assoc
    tot = sum(m * w for m, w in zip(means, weights))
    assert abs(tot - sum(vals)) < 1e-6 * abs(sum(vals))


def test_compress_deterministic_pure_function_of_multiset():
    rng = random.Random(11)
    vals = [rng.uniform(-5, 5) for _ in range(500)]
    a = compress_centroids(sorted(vals), [1] * 500, cap=9)
    shuffled = list(vals)
    rng.shuffle(shuffled)
    b = compress_centroids(sorted(shuffled), [1] * 500, cap=9)
    assert a == b  # bit-identical, not just close


def test_estimate_rank_error_bounded_single_level():
    rng = random.Random(3)
    n = 20_000
    vals = sorted(rng.gauss(0, 1) for _ in range(n))
    eps = 0.01
    cap = max(1, int(math.floor(eps * n / 2)))
    means, weights = compress_centroids(vals, [1] * n, cap)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = estimate_quantile(means, weights, q)
        lo, hi = _rank_interval(vals, est)
        target = max(1, math.ceil(q * n))
        # single compress level: rank error <= eps*n (cap = eps*n/2 on
        # either side of the crossing centroid)
        assert lo - eps * n <= target <= hi + eps * n, (q, lo, hi, target)


def test_merge_matches_rebuild_rank_contract():
    """Merging two independently built digests must keep the rank
    error inside the depth-2 budget — and stay deterministic."""
    rng = random.Random(42)
    a = [rng.uniform(0, 50) for _ in range(8000)]
    b = [rng.gauss(80, 10) for _ in range(12000)]
    n = len(a) + len(b)
    eps = 0.01
    da = compress_centroids(sorted(a), [1] * len(a), max(1, int(eps * len(a) / 2)))
    db = compress_centroids(sorted(b), [1] * len(b), max(1, int(eps * len(b) / 2)))
    flat = sorted(
        list(zip(*da)) + list(zip(*db))
    )  # (mean, weight) sorted
    means, weights = compress_centroids(
        [m for m, _ in flat],
        [w for _, w in flat],
        max(1, int(eps * n / 2)),
    )
    assert sum(weights) == n
    allv = sorted(a + b)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = estimate_quantile(means, weights, q)
        lo, hi = _rank_interval(allv, est)
        target = max(1, math.ceil(q * n))
        assert lo - 2 * eps * n <= target <= hi + 2 * eps * n


# ---------------------------------------------------------------------------
# spark surface
# ---------------------------------------------------------------------------


def test_daily_digest_deterministic_across_runs(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    r1 = {
        r["day"]: (r["means"], r["weights"], r["n"])
        for r in daily_value_digest(ev).collect()
    }
    r2 = {
        r["day"]: (r["means"], r["weights"], r["n"])
        for r in daily_value_digest(ev.repartition(7)).collect()
    }
    assert r1 == r2  # pure function of each day's multiset


def test_union_counts_and_mass(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    daily = daily_value_digest(ev)
    u = digest_union(daily).collect()[0]
    n_expected = ev.where(F.col("value").isNotNull()).count()
    assert u["n"] == n_expected
    assert sum(u["weights"]) == n_expected
    assert list(u["means"]) == sorted(u["means"])


def test_gate_booleans_all_true(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    rows = kll_daily_quantile_check(ev).collect()
    assert len(rows) > 0
    for r in rows:
        d = r.asDict()
        for k, v in d.items():
            if "within" in k:
                assert v is True, (r["day"], k)


# ---------------------------------------------------------------------------
# streaming incremental store (streaming/quantiles.py)
# ---------------------------------------------------------------------------


def test_streaming_store_merge_counts_and_idempotence(
    spark, sf_dir, tmp_path
):
    """Per-batch digest partitions merge to the full per-day counts;
    replaying a batch (overwrite of its own partition) changes
    nothing — the exactly-once contract."""
    from lab3_spark.operators.quantile_sketch import daily_value_digest
    from lab3_spark.streaming.quantiles import merged_daily_digests

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "ts", "value"
    )
    store = str(tmp_path / "store")
    for b in range(3):
        daily_value_digest(
            ev.where(F.col("event_id") % 3 == b)
        ).write.mode("overwrite").parquet(f"{store}/batch_id={b}")
    merged1 = {
        r["day"]: (r["n"], tuple(r["weights"]))
        for r in merged_daily_digests(spark, store).collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in ev.where(F.col("value").isNotNull())
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {d: v[0] for d, v in merged1.items()} == exact
    assert all(sum(w) == n for (n, w) in merged1.values())
    # replay batch 1: identical partition -> identical merge
    daily_value_digest(
        ev.where(F.col("event_id") % 3 == 1)
    ).write.mode("overwrite").parquet(f"{store}/batch_id=1")
    merged2 = {
        r["day"]: (r["n"], tuple(r["weights"]))
        for r in merged_daily_digests(spark, store).collect()
    }
    assert merged2 == merged1


# ---------------------------------------------------------------------------
# hypothesis property tests (pure core — no Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_VALS = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=400,
)


@settings(max_examples=40, deadline=None)
@given(_VALS, st.integers(min_value=1, max_value=50))
def test_prop_compress_mass_order_cap(vals, cap):
    sv = sorted(vals)
    means, weights = compress_centroids(sv, [1] * len(sv), cap)
    assert sum(weights) == len(sv)
    assert all(1 <= w <= max(cap, 1) for w in weights)
    assert means == sorted(means)
    # centroids stay inside the data range
    assert min(sv) <= means[0] and means[-1] <= max(sv)


@settings(max_examples=25, deadline=None)
@given(_VALS, st.floats(min_value=0.005, max_value=0.1))
def test_prop_estimate_rank_error_within_eps(vals, eps):
    sv = sorted(vals)
    n = len(sv)
    cap = max(1, int(math.floor(eps * n / 2)))
    means, weights = compress_centroids(sv, [1] * n, cap)
    for q in (0.1, 0.5, 0.99):
        est = estimate_quantile(means, weights, q)
        lo, hi = _rank_interval(sv, est)
        target = max(1, math.ceil(q * n))
        assert lo - eps * n - 1 <= target <= hi + eps * n + 1, (
            q,
            eps,
            n,
            lo,
            hi,
            target,
        )

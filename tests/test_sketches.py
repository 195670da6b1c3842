"""Mergeable HLL sketch column (operators/events.hll_daily_merge):
estimates must track exact distincts, and the union must equal a
sketch built over the whole input (merge associativity)."""

from pyspark.sql import functions as F

from lab3_spark.operators.events import hll_daily_merge
from lab3_spark.sources.tables import load_table


def test_hll_estimates_track_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = hll_daily_merge(ev).collect()
    exact = {
        r["day"]: r["dau"]
        for r in ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau"))
        .collect()
    }
    assert len(got) == len(exact)
    for r in got:
        e = exact[r["day"]]
        assert abs(r["est_users"] - e) <= max(2, 0.05 * e), (r["day"], e)
    total_exact = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    t = got[0]["est_users_total"]
    assert abs(t - total_exact) <= max(2, 0.05 * total_exact)


def test_hll_union_equals_whole_input_sketch(spark, sf_dir):
    """Merging per-day sketches == sketching the whole column: the
    mergeability contract that makes sketch columns reusable state."""
    ev = load_table(spark, sf_dir, "events")
    merged = hll_daily_merge(ev).collect()[0]["est_users_total"]
    whole = ev.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("e")
    ).collect()[0]["e"]
    assert merged == whole


def test_cms_overestimate_and_mergeability(spark, sf_dir):
    """CMS guarantees: est >= true count for EVERY key (min over
    overcounting rows can never undercount), and counter matrices
    over disjoint slices merge by elementwise addition into exactly
    the whole-corpus matrix."""
    from pyspark.sql import functions as F

    import pytest

    from lab3_spark.operators.events import (
        cms_counters,
        cms_estimates,
        cms_heavy_hitters,
    )
    from lab3_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.user_id: r.cnt
        for r in ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    est = cms_estimates(ev).collect()
    assert len(est) == len(exact)
    for r in est:
        assert r.est >= exact[r.user_id], (r.user_id, r.est, exact[r.user_id])
    # a huge topn must be refused, not allowed to OOM TakeOrdered
    with pytest.raises(ValueError):
        cms_heavy_hitters(ev, topn=10**9)
    assert cms_heavy_hitters(ev, topn=5).count() == 5
    # mergeability: split the stream on event_id parity, sum matrices
    lo = cms_counters(ev.where(F.col("event_id") % 2 == 0))
    hi = cms_counters(ev.where(F.col("event_id") % 2 == 1))
    merged = {
        (r.r, r.bucket): r.cnt
        for r in lo.unionAll(hi)
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    whole = {(r.r, r.bucket): r.cnt for r in cms_counters(ev).collect()}
    assert merged == whole


def test_kmv_estimates_track_exact(spark, sf_dir):
    """KMV daily estimates within the k=64 sketch's ±1/sqrt(k) band of
    exact distinct counts; groups under k distinct are EXACT."""
    from lab3_spark.operators.events import kmv_daily_users

    ev = load_table(spark, sf_dir, "events")
    got = kmv_daily_users(ev, k=64).collect()
    exact = {
        r["day"]: r["dau"]
        for r in ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau"))
        .collect()
    }
    assert len(got) == len(exact)
    for r in got:
        e = exact[r["day"]]
        if e < 64:
            assert r["est_users"] == e, (r["day"], r["est_users"], e)
        else:
            # 3 standard errors at k=64 ≈ 37.5%
            assert abs(r["est_users"] - e) <= 0.375 * e, (r["day"], r["est_users"], e)
    total_exact = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    t = got[0]["est_users_total"]
    if total_exact < 64:
        assert t == total_exact
    else:
        assert abs(t - total_exact) <= 0.375 * total_exact


def test_kmv_merge_equals_whole_input_synopsis(spark, sf_dir):
    """Union-of-per-day-synopses re-selected to k smallest equals the
    synopsis built over the whole input in one shot — the mergeability
    contract, checked on the actual hash values (not just estimates)."""
    from lab3_spark.functions.text import hex_to_long
    from lab3_spark.operators.events import kmv_synopsis

    k = 64
    ev = load_table(spark, sf_dir, "events")
    hv = hex_to_long(
        F.substring(
            F.md5(F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))),
            1,
            13,
        )
    )
    day_hv = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), hv.alias("hv")
    )
    per_day = kmv_synopsis(day_hv, "day", "hv", k)
    merged = sorted(
        r["hv"]
        for r in per_day.select("hv").distinct().orderBy("hv").limit(k).collect()
    )
    whole = sorted(
        r["hv"]
        for r in kmv_synopsis(
            day_hv.select(F.lit("all").alias("g"), "hv"), "g", "hv", k
        ).collect()
    )
    assert merged == whole


def test_cms_verified_hh_equals_naive(spark, sf_dir):
    """Sketch-shortlist + exact-verify returns EXACTLY the naive
    full-aggregation answer (the overestimate-only shortlist has no
    false negatives; the exact pass removes its false positives)."""
    from lab3_spark.operators.events import cms_verified_heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    got = [(r.user_id, r.cnt) for r in cms_verified_heavy_hitters(ev).collect()]
    stats = ev.agg(
        F.count("*").alias("tot"), F.countDistinct("user_id").alias("nu")
    ).collect()[0]
    thr = (stats.tot * 110) // (100 * stats.nu)
    naive = sorted(
        (
            (r.user_id, r.cnt)
            for r in ev.groupBy("user_id")
            .agg(F.count("*").alias("cnt"))
            .where(F.col("cnt") >= thr)
            .collect()
        ),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == naive and len(got) > 0


def test_ohlc_open_close_deterministic(spark):
    """open/close pick by the (ts, event_id) total order — equal
    timestamps resolve by event_id, identically in any engine."""
    from lab3_spark.operators.events import ohlc_downsample

    rows = [
        # (event_id, ts, value) — two events share the opening ts
        (2, "2024-01-01 10:00:00", 5.0),
        (1, "2024-01-01 10:00:00", 3.0),   # lower event_id → open
        (3, "2024-01-01 10:30:00", 9.0),
        (5, "2024-01-01 10:59:59", 1.0),   # higher event_id → close
        (4, "2024-01-01 10:59:59", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts_s string, value double"
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        F.lit("click").alias("event_type"),
        "value",
    )
    (r,) = ohlc_downsample(ev).collect()
    assert (r.open, r.high, r.low, r.close, r.n_events) == (3.0, 9.0, 1.0, 1.0, 5)


def test_kmv_overlap_exact_when_sets_small(spark):
    """Below k the synopses ARE the sets, so the estimate is exact."""
    from datetime import datetime

    from lab3_spark.operators.events import kmv_type_overlap

    ts = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(30):          # viewers 0..29
        rows.append((eid, ts, u, "view", 0.0, "{}")); eid += 1
    for u in range(20, 45):      # purchasers 20..44; overlap 20..29 = 10
        rows.append((eid, ts, u, "purchase", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = kmv_type_overlap(df, k=64).collect()[0]
    assert (r["exact_a"], r["exact_b"], r["exact_overlap"]) == (30, 25, 10)
    # |union| = 45 < k: est_union exact and J = 10/45 exact
    assert r["est_union"] == 45
    assert r["est_overlap"] == 10


def test_kmv_overlap_estimate_tracks_truth_above_k(spark):
    from datetime import datetime

    from lab3_spark.operators.events import kmv_type_overlap

    ts = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(400):         # A = 0..399
        rows.append((eid, ts, u, "view", 0.0, "{}")); eid += 1
    for u in range(200, 600):    # B = 200..599; overlap = 200
        rows.append((eid, ts, u, "purchase", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = kmv_type_overlap(df, k=64).collect()[0]
    assert r["exact_overlap"] == 200
    # k=64 on |U|=600: generous tolerance, but the estimate must be
    # in the right ballpark (deterministic given the md5 hashes)
    assert 80 <= r["est_overlap"] <= 400

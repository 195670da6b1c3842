"""Round-4 additions: sliding windows, rolling range-frame revenue,
PQ shortlist + exact rerank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from lab3_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    from lab3_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings")


def test_sliding_covers_each_event_twice(events):
    """width/slide = 2 → every event appears in exactly 2 windows, so
    the sliding counts sum to 2× the raw event count."""
    from lab3_spark.operators.events import sliding_counts

    res = sliding_counts(events)
    total = res.agg(F.sum("n_events")).first()[0]
    assert total == 2 * events.count()


def test_sliding_equals_sum_of_tumbling_halves(events):
    """A 10-minute window starting at t is the union of the 5-minute
    tumbling buckets at t and t+5 — counts must agree."""
    from lab3_spark.operators.events import sliding_counts, tumbling_counts

    slid = {
        (r.window_start, r.event_type): r.n_events
        for r in sliding_counts(events).collect()
    }
    tumb = {}
    for r in tumbling_counts(events).collect():
        tumb[(r.window_start, r.event_type)] = r.n_events
    import datetime as dt

    def plus5(s):
        t = dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
        return (t + dt.timedelta(minutes=5)).strftime("%Y-%m-%d %H:%M:%S")

    for (ws, et), n in slid.items():
        expect = tumb.get((ws, et), 0) + tumb.get((plus5(ws), et), 0)
        assert n == expect, (ws, et, n, expect)


def test_rolling_7d_matches_pandas(spark, sf_dir):
    from lab3_spark.queries_catalog import QUERIES

    rows = QUERIES["orders_rolling_7d_revenue"](spark, sf_dir).collect()
    assert rows
    by_day = {r.day: r for r in rows}
    import datetime as dt

    for r in rows:
        d0 = dt.date.fromisoformat(r.day)
        window = [
            by_day[(d0 - dt.timedelta(days=i)).isoformat()]
            for i in range(7)
            if (d0 - dt.timedelta(days=i)).isoformat() in by_day
        ]
        assert r.orders_7d == sum(x.n_orders for x in window)
        assert abs(r.rev_7d - round(sum(x.revenue for x in window), 2)) < 0.02


def test_pq_rerank_recall_never_below_adc(embeddings):
    """Any true neighbor that survives into the ADC shortlist is
    exact-closest there, so rerank recall@k >= raw ADC recall@k."""
    from lab3_spark.operators.kmeans import (
        ann_bruteforce_l2,
        ann_pq_adc,
        ann_pq_rerank,
    )

    nq, topk = 10, 5
    adc = ann_pq_adc(embeddings, nq, topk, 2, 4, 1, 64)
    rr = ann_pq_rerank(embeddings, nq, topk, 20, 2, 4, 1, 64)
    bf = ann_bruteforce_l2(embeddings, nq, topk)

    def by_query(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    truth, a, r = by_query(bf), by_query(adc), by_query(rr)
    assert set(truth) == set(a) == set(r)
    for q in truth:
        # PER-QUERY monotone in the SAME (L2) metric: any true
        # neighbor in the shortlist is exact-closest there, so the
        # rerank keeps it — rerank can only add true hits vs ADC@5
        assert len(truth[q] & r[q]) >= len(truth[q] & a[q]), q

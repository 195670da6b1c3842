"""Round-4 additions: triangle counting and robust (median/MAD)
per-source quality normalization."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_triangle_stats_hand_graph(spark):
    from lab3_spark.operators.components import triangle_stats

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "doc_a long, doc_b long"
    )
    rows = {r.node: r for r in triangle_stats(edges).collect()}
    assert rows[1].n_tri == rows[2].n_tri == rows[3].n_tri == 1
    assert rows[4].n_tri == 0
    assert rows[1].degree == 2 and rows[3].degree == 3 and rows[4].degree == 1
    assert rows[1].clustering == 1.0
    assert rows[3].clustering == math.floor(2 * 1 / (3 * 2) * 10000) / 10000
    assert rows[4].clustering == 0.0


def test_triangle_stats_counts_each_once(spark):
    """K4: every node is in C(3,2)=3 triangles, 4 triangles total."""
    from itertools import combinations

    from lab3_spark.operators.components import triangle_stats

    edges = spark.createDataFrame(
        list(combinations(range(4), 2)), "doc_a long, doc_b long"
    )
    rows = triangle_stats(edges).collect()
    assert all(r.n_tri == 3 and r.degree == 3 for r in rows)
    assert sum(r.n_tri for r in rows) == 3 * 4  # 4 triangles × 3 nodes


def test_robust_zscore_matches_numpy(spark, sf_dir):
    import numpy as np

    from lab3_spark.operators.textstats import robust_quality_zscore
    from lab3_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = robust_quality_zscore(docs).collect()
    assert len(rows) == docs.count()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        qs = np.array([r.quality for r in rs])
        med = float(np.median(qs))
        mad = float(np.median(np.abs(qs - med)))
        t = lambda x: math.floor(x * 10000) / 10000
        assert rs[0].med == t(med), src
        assert rs[0].mad == t(mad), src
        for r in rs:
            want = t((r.quality - med) / mad) if mad > 0 else 0.0
            assert r.robust_z == want, (src, r.doc_id)

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


def test_triangle_degree_ordering_kills_hub_fanout(spark):
    """A hub with degree h placed mid-id range: id-ordering enumerates
    ~h²/4 wedges at the hub; degree-ordering orients every hub edge
    INWARD, so the hub contributes zero wedges.  This is the round-5
    structural guarantee that the O(hub²) blowup cannot occur."""
    from lab3_spark.operators.components import _oriented

    h = 200
    hub = h  # mid of 0..2h: half the leaves sort below, half above
    rows = [(min(i, hub), max(i, hub)) for i in range(2 * h + 1) if i != hub]
    e = spark.createDataFrame(rows, "x long, y long")
    deg = (
        e.select(F.col("x").alias("node"))
        .unionAll(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    o = _oriented(e, deg)
    # wedge count = sum over nodes of C(out_deg, 2)
    wedges_deg = (
        o.groupBy("u")
        .agg(F.count("*").alias("od"))
        .select(F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("w"))
        .collect()[0].w
    )
    assert wedges_deg == 0  # every hub edge points in; leaves have od=1
    # id-ordering on the same graph: the hub has h smaller neighbors
    # (in-edges) and h larger ones (out-edges) => h*h/2... precisely
    # C(out,2) at the hub with out=h: h*(h-1)/2 wedges
    id_out = (
        e.groupBy("x").agg(F.count("*").alias("od"))
        .select(F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("w"))
        .collect()[0].w
    )
    assert id_out >= h * (h - 1) / 2  # the blowup the new form removes


def test_triangle_stats_matches_bruteforce_random_graph(spark):
    """Degree-ordered enumeration must equal a per-node brute force on
    a random graph (the equivalence pin for the round-5 rewrite)."""
    import itertools
    import random

    from lab3_spark.operators.components import triangle_stats

    rnd = random.Random(7)
    nodes = range(30)
    edges = sorted(
        {(a, b) for a, b in itertools.combinations(nodes, 2) if rnd.random() < 0.2}
    )
    adj: dict[int, set[int]] = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    expect = {
        n: sum(
            1
            for v, w in itertools.combinations(sorted(adj[n]), 2)
            if w in adj.get(v, ())
        )
        for n in adj
    }
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = {r.node: r for r in triangle_stats(e).collect()}
    assert {n: r.n_tri for n, r in rows.items()} == expect
    assert {n: r.degree for n, r in rows.items()} == {
        n: len(adj[n]) for n in adj
    }


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


def test_assortativity_star_vs_clique(spark):
    from lab3_spark.operators.components import degree_assortativity

    # star: hub degree 5 joins leaves degree 1 -> strongly negative
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    r = degree_assortativity(star).collect()[0]
    assert r["n_edges"] == 5
    assert r["r_fp"] == -1_000_000  # exactly -1 for a star

    # regular graph (6-cycle): all degrees equal -> zero variance -> 0
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    r2 = degree_assortativity(cyc).collect()[0]
    assert r2["r_fp"] == 0

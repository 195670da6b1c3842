"""Connected components: exact fixpoint labeling on known graphs."""

import pytest
from pyspark.sql import functions as F

from lab3_spark.operators.components import connected_components


def _labels(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["comp"] for r in connected_components(df, **kw).collect()
    }


def test_three_components(spark):
    got = _labels(
        spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_long_chain_needs_many_iterations(spark):
    # a path graph 0-1-2-...-12: diameter 12 forces label propagation
    # through multiple rounds (and past the localCheckpoint boundary)
    n = 13
    got = _labels(spark, [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_direction_and_duplicates_ignored(spark):
    got = _labels(spark, [(5, 3), (3, 5), (5, 3), (7, 5)])
    assert got == {3: 3, 5: 3, 7: 3}


def test_non_convergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(9)], "src long, dst long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=2, shortcut=False)


def test_shortcut_converges_long_chain_in_log_rounds(spark):
    # 65-node path: diameter 64 — plain propagation moves the min ONE
    # hop per round and would need ~64 rounds (past max_iter); the
    # pointer-doubling jump engages after round 3 and halves the label
    # distance per round, so 14 rounds are ample.  Pins the O(log d)
    # claim in the module docstring.
    n = 65
    got = _labels(spark, [(i, i + 1) for i in range(n - 1)], max_iter=14)
    assert got == {i: 0 for i in range(n)}


def test_label_propagation_splits_barbell(spark):
    """Two triangles joined by one bridge edge: connected components
    merge all six nodes, but 3-iteration synchronous LPA separates
    the two dense triangles — hand-traced expected labels under the
    max-count/min-label tie rule."""
    from pyspark.sql import functions as F

    from lab3_spark.operators.components import (
        connected_components,
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)],
        "a bigint, b bigint",
    )
    got = {r.node: r.label for r in label_propagation(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}, got
    comps = {
        r.comp for r in connected_components(edges, "a", "b").collect()
    }
    assert len(comps) == 1  # the contrast LPA exists for


def test_modularity_barbell_hand_computed(spark):
    """Barbell graph under the LPA partition {1,2,3}/{4,5,6}: m=7,
    each community has e_in=3 and degree sum 7 (three triangle
    degrees 2+2+3 — the bridge endpoints carry degree 3), so
    q_num = 4·7·3 − 49 = 35 per community and
    Q = (35+35)/(4·49) = 5/14 ≈ 0.357."""
    from lab3_spark.operators.components import (
        community_modularity,
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)],
        "a bigint, b bigint",
    )
    rows = {
        r.community: r
        for r in community_modularity(edges, label_propagation(edges)).collect()
    }
    assert set(rows) == {1, 3}
    for c in (1, 3):
        assert rows[c].n_nodes == 3
        assert rows[c].e_in == 3
        assert rows[c].d_sum == 7
        assert rows[c].q_num == 4 * 7 * 3 - 49


def _cores(spark, edges, **kw):
    from lab3_spark.operators.components import kcore

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["core_degree"] for r in kcore(df, **kw).collect()}


def test_kcore_pendant_chain_peels_off_triangle(spark):
    # triangle 1-2-3 plus pendant chain 3-4-5: the chain has degree-1
    # ends every round, so the 2-core is exactly the triangle.
    got = _cores(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_fixed_rounds_is_prefix_of_fixpoint(spark):
    # chain 1..6 hung off a 4-clique: k=2 dissolves the chain one
    # end per round, so rounds=1 still keeps part of it while the
    # fixpoint keeps only the clique.
    clique = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    chain = [(13, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    one = _cores(spark, clique + chain, rounds=1)
    fix = _cores(spark, clique + chain)
    assert set(fix) == {10, 11, 12, 13}
    assert all(v == 3 for v in fix.values())
    assert set(fix) <= set(one)  # peeling is monotone: prefix keeps more


def test_kcore_k3_drops_everything_but_clique(spark):
    clique = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    extra = [(13, 1), (1, 2), (2, 10)]  # a cycle through the clique
    got = _cores(spark, clique + extra, k=3)
    assert set(got) == {10, 11, 12, 13}


def test_kcore_non_convergence_raises(spark):
    import pytest as _pt

    from lab3_spark.operators.components import kcore

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    with _pt.raises(RuntimeError, match="did not converge"):
        kcore(df, max_iter=2).collect()


def _truss(spark, edges, **kw):
    from lab3_spark.operators.components import ktruss

    df = spark.createDataFrame(edges, "src long, dst long")
    return {(r["a"], r["b"]) for r in ktruss(df, **kw).collect()}


def test_ktruss_keeps_triangle_drops_pendant(spark):
    # triangle 1-2-3 + pendant 3-4: the pendant edge closes no
    # triangle and is peeled; the triangle survives the 3-truss.
    got = _truss(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_ktruss_stronger_than_kcore(spark):
    # 4-cycle: every node has degree 2 (survives the 2-core) but no
    # edge closes a triangle -> empty 3-truss
    cyc = [(1, 2), (2, 3), (3, 4), (4, 1)]
    assert _truss(spark, cyc) == set()
    from lab3_spark.operators.components import kcore

    df = spark.createDataFrame(cyc, "src long, dst long")
    assert kcore(df, k=2).count() == 4  # all four survive the 2-core


def test_ktruss_cascade_peel(spark):
    # two triangles sharing edge 2-3, plus 4-5 hanging a triangle off
    # an edge that dies in round 1: peeling must CASCADE (the 4-5-6
    # triangle depends on 4-6 which closes no triangle... build a case
    # where an edge loses its only triangle after round 1).
    # K4 minus one edge, plus a triangle glued on the removed side:
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4),  # K4 minus 1-4
             (4, 5), (4, 6), (5, 6)]                   # triangle at 4
    got = _truss(spark, edges, rounds=4)
    # every edge closes >= 1 triangle already; all survive
    assert got == {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (4, 6), (5, 6)}
    # now remove 5-6: 4-5 and 4-6 lose their triangle and peel,
    # leaving the diamond intact
    got2 = _truss(spark, edges[:-1], rounds=4)
    assert got2 == {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)}

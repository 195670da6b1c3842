"""MMR diversified selection: greedy semantics on hand graphs."""

import math

from lab3_spark.operators.diversity import mmr_select


def _df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mmr_skips_redundant_near_copy(spark):
    # 1 and 2 point the same way, 3 mirrors them across the query
    # axis: equal relevance (0.8) but cos(1,3) = 0.28 vs cos(1,2) ≈ 1.
    # MMR picks 1 (tie → lowest id) then 3; pure relevance would pick
    # the near-copy 2.  (Note the flip needs the top pick OFF the
    # query axis: if v1 ≈ q then cos(v,v1) ≈ rel(v) and λ=0.5 can
    # never prefer the diverse item — geometry, not a bug.)
    df = _df(
        spark,
        [
            [1.0, 0.0, 0.0],        # 0 = query
            [0.8, 0.6, 0.0],        # 1
            [0.8, 0.6, 0.0001],     # 2: near-copy of 1
            [0.8, -0.6, 0.0],       # 3: same relevance, diverse
        ],
    )
    got = [(r["step"], r["vec_id"]) for r in mmr_select(df, k=2).collect()]
    assert got == [(1, 1), (2, 3)]


def test_mmr_lambda_zero_is_pure_relevance(spark):
    df = _df(
        spark,
        [[1.0, 0.0], [0.9, 0.1], [0.9, 0.1001], [0.5, 0.5]],
    )
    got = [(r["step"], r["vec_id"]) for r in mmr_select(df, k=3, lam=0.0).collect()]
    # cos ranks: 1 > 2 > 3 (2's extra y-mass tilts it off the query)
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_mmr_step1_score_is_relevance(spark):
    df = _df(spark, [[1.0, 0.0], [0.6, 0.8], [0.0, 1.0]])
    rows = mmr_select(df, k=2).collect()
    # float32 storage: 0.6/0.8 are not exactly representable
    assert math.isclose(rows[0]["mmr_score"], 0.6, rel_tol=1e-6)
    # step 2: rel(2)=0.0, penalty 0.5·cos(1,2)=0.5·0.8
    assert math.isclose(rows[1]["mmr_score"], -0.5 * 0.8, rel_tol=1e-6)


def test_mmr_k_capped_by_candidates(spark):
    df = _df(spark, [[1.0, 0.0], [0.5, 0.5]])
    assert mmr_select(df, k=8).count() == 1


def test_mmr_shortlist_prefilter_respected(spark):
    # shortlist=2 keeps only the two most relevant candidates; the
    # third pick must come from inside the shortlist even though a
    # more diverse vector exists outside it.
    df = _df(
        spark,
        [[1.0, 0.0], [0.99, 0.01], [0.98, 0.02], [0.0, 1.0]],
    )
    got = {r["vec_id"] for r in mmr_select(df, k=3, shortlist=2).collect()}
    assert got == {1, 2}


def test_mmr_zero_norm_query_raises(spark):
    import pytest as _pt

    df = _df(spark, [[0.0, 0.0], [1.0, 0.0]])
    with _pt.raises(ValueError, match="zero norm"):
        mmr_select(df)

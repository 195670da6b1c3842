"""Spectral operators: exact Gramian and pinned-fold power iteration."""

import math

import numpy as np
import pytest

from lab3_spark.operators.spectral import (
    QSCALE,
    _power_iteration,
    gram_matrix,
    top_principal_direction,
)


def _emb_df(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_gram_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(40, 5)).astype(np.float32)
    got = {
        (r["j"], r["k"]): r["gv"]
        for r in gram_matrix(_emb_df(spark, x), dims=5).collect()
    }
    q = np.floor(x.astype(np.float64) * QSCALE).astype(np.int64)
    want = q.T @ q
    assert len(got) == 25
    for j in range(5):
        for k in range(5):
            assert got[(j + 1, k + 1)] == want[j, k]


def test_power_iteration_finds_dominant_eigenvector(spark):
    # strongly anisotropic cloud: variance along u dwarfs the rest, so
    # 8 iterations land on ±u (check |cosine| — sign is start-dependent)
    rng = np.random.default_rng(3)
    u = np.zeros(6)
    u[2] = 0.8
    u[4] = 0.6
    x = (
        rng.normal(size=(300, 1)) * 50.0 * u
        + rng.normal(size=(300, 6)) * 0.5
    ).astype(np.float32)
    df = top_principal_direction(_emb_df(spark, x), dims=6)
    v = [r["loading"] for r in df.orderBy("dim").collect()]
    assert abs(sum(a * b for a, b in zip(v, u))) > 0.99
    assert math.isclose(sum(a * a for a in v), 1.0, rel_tol=1e-12)


def test_power_iteration_pinned_fold_is_deterministic():
    rows = [[float((i * 7 + j * 3) % 11 - 5) for j in range(4)] for i in range(4)]
    # symmetrize so it's a genuine Gramian-like input
    g = [[rows[i][j] + rows[j][i] + (8.0 if i == j else 0.0) for j in range(4)] for i in range(4)]
    a = _power_iteration(g, 4, 6)
    b = _power_iteration(g, 4, 6)
    assert a == b  # bit-identical, not approximately


def test_gram_rejects_ragged_embeddings(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="shape violation"):
        gram_matrix(df, dims=3).collect()


def test_spectral_degenerate_inputs_guarded(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert top_principal_direction(empty, dims=4).count() == 0
    zeros = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    assert top_principal_direction(zeros, dims=2).count() == 0


def test_projection_by_label_separates_clusters(spark):
    import numpy as np

    from lab3_spark.operators.spectral import projection_by_label

    rng = np.random.default_rng(11)
    u = np.zeros(8)
    u[1] = 1.0
    # label 0 at +10u, label 1 at -10u: dominant axis IS u, and the
    # label means must sit far apart with small within-label variance
    a = (10.0 * u + rng.normal(size=(100, 8)) * 0.2).astype(np.float32)
    b = (-10.0 * u + rng.normal(size=(100, 8)) * 0.2).astype(np.float32)
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(a)] + [
        (100 + i, [float(x) for x in v], 1) for i, v in enumerate(b)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["label"]: r for r in projection_by_label(df, dims=8).collect()}
    m0, m1 = got[0]["mean_proj_fp"], got[1]["mean_proj_fp"]
    assert abs(m0 - m1) > 150_000          # ≥ 15 apart in projection units
    assert m0 * m1 < 0                     # opposite sides of the origin
    for r in got.values():
        assert r["var_proj_fp"] < abs(m0 - m1) ** 2 / 100


def test_top2_orthogonal_and_correct(spark):
    import numpy as np

    from lab3_spark.operators.spectral import top2_principal_directions

    rng = np.random.default_rng(5)
    u1 = np.zeros(6); u1[0] = 1.0
    u2 = np.zeros(6); u2[3] = 1.0
    x = (
        rng.normal(size=(400, 1)) * 40.0 * u1
        + rng.normal(size=(400, 1)) * 15.0 * u2
        + rng.normal(size=(400, 6)) * 0.3
    ).astype(np.float32)
    rows = [(i, [float(v) for v in r]) for i, r in enumerate(x)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = top2_principal_directions(df, dims=6).collect()
    v1 = [r["loading"] for r in got if r["component"] == 1]
    v2 = [r["loading"] for r in got if r["component"] == 2]
    assert abs(sum(a * b for a, b in zip(v1, u1))) > 0.99
    assert abs(sum(a * b for a, b in zip(v2, u2))) > 0.99
    assert abs(sum(a * b for a, b in zip(v1, v2))) < 1e-4  # ~orthogonal (8 iters)

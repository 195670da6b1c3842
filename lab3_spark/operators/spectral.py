"""Spectral analysis of the embedding matrix: exact-integer Gram
matrix + top principal direction by power iteration.

The 100 TB shape is MLlib's own (RowMatrix.computePrincipalComponents
/ computeGramianMatrix): the d×d Gramian is computed DISTRIBUTED in
one pass — each Arrow batch contributes a d×d partial via a local
matmul, so the shuffle carries d² rows per batch regardless of batch
size — and only the d² scalars land on the driver, where the
eigen-iteration on a 64×64 matrix is microseconds.  The data matrix
itself is never collected and never shuffled.

Cross-engine determinism: embeddings are quantized q = floor(x · 2¹⁴)
— a power-of-two scale, so the float multiply is EXACT (only the
exponent changes) and Spark/numpy/DuckDB produce identical ints; the
Gram matrix is then exact int64 (|x| ≲ 6 → q ≲ 10⁵ → q² ≲ 10¹⁰, times
N rows stays < 2⁶³ up to ~10⁸ rows per gate input).  The power
iteration runs in IEEE doubles with a PINNED left-fold order (index
0 → d−1, seed = first element) that DuckDB's ``list_reduce`` over an
ORDER BY-ed list replays exactly — the events_ewma fold-pinning
precedent applied to linear algebra.  No tolerance needed: the gate
compares bit-identical doubles.

Ref parity note: the reference engine (phoenixLab) has no linear
algebra; this extends the engine's training-data toolkit (embedding
quality inspection: dominant direction ≈ anisotropy of the embedding
space, the usual first diagnostic before whitening).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from lab3_spark.functions.partitioning import spread

DIMS = 64
QSCALE = 1 << 14  # power of two: floor(x·QSCALE) exact in every engine
POWER_ITERS = 8


def gram_matrix(embeddings: DataFrame, dims: int = DIMS) -> DataFrame:
    """(j, k, gv): exact-bigint second-moment (Gram) matrix
    Gᵢⱼ = Σ_rows q_i·q_j of the quantized embeddings, 1-based indices.

    One ``mapInArrow`` pass; each batch emits at most d² rows (the
    local ``q.T @ q`` matmul is the map-side combine), then one
    combinable groupBy over d² keys."""
    import numpy as np
    import pyarrow as pa

    from lab3_spark.operators.kmeans import _flat_matrix

    def batches(it):
        for batch in it:
            x = _flat_matrix(batch.column(0), dims)
            if x.shape[0] == 0:
                continue
            q = np.floor(x * float(QSCALE)).astype(np.int64)
            g = q.T @ q  # exact int64: |q| ≲ 1e5 → |q²·n_batch| ≪ 2^63
            jj, kk = np.meshgrid(
                np.arange(1, dims + 1, dtype=np.int64),
                np.arange(1, dims + 1, dtype=np.int64),
                indexing="ij",
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(jj.ravel()),
                    pa.array(kk.ravel()),
                    pa.array(g.ravel()),
                ],
                names=["j", "k", "gv"],
            )

    return (
        spread(embeddings)
        .select("embedding")
        .mapInArrow(batches, "j bigint, k bigint, gv bigint")
        .groupBy("j", "k")
        .agg(F.sum("gv").alias("gv"))
    )


def _power_iteration(
    grows: list[list[float]], dims: int, iters: int
) -> list[float]:
    """Pinned-order power iteration: every inner product folds left
    over index order with the first term as the seed — the exact
    recurrence DuckDB's ``list_reduce(list_transform(...))`` runs, so
    the returned doubles are bit-identical across engines."""
    v = [1.0 / math.sqrt(dims)] * dims
    for _ in range(iters):
        w = []
        for j in range(dims):
            row = grows[j]
            acc = row[0] * v[0]
            for k in range(1, dims):
                acc += row[k] * v[k]
            w.append(acc)
        acc = w[0] * w[0]
        for j in range(1, dims):
            acc += w[j] * w[j]
        nrm = math.sqrt(acc)
        v = [x / nrm for x in w]
    return v


def top_principal_direction(
    embeddings: DataFrame, dims: int = DIMS, iters: int = POWER_ITERS
) -> DataFrame:
    """(dim, loading): the top right-singular direction of the
    quantized embedding matrix — the unit eigenvector of the exact
    Gram matrix after ``iters`` power-iteration steps from the
    deterministic all-ones start (no RNG to reconcile across engines;
    uncentered by design so the Gramian stays exactly integer — this
    is the top direction of the RAW data, the anisotropy axis).

    The collect is d² bigints (the MLlib Gramian pattern — bounded by
    the schema, not the data); the iteration output is d scalars."""
    spark = embeddings.sparkSession
    g = {
        (r["j"], r["k"]): r["gv"]
        for r in gram_matrix(embeddings, dims).collect()
    }
    if not g or all(v == 0 for v in g.values()):
        # empty or all-zero input: no principal direction exists —
        # return the empty frame rather than dividing by a 0 norm
        return spark.createDataFrame([], "dim bigint, loading double")
    grows = [
        [float(g[(j, k)]) for k in range(1, dims + 1)]
        for j in range(1, dims + 1)
    ]
    v = _power_iteration(grows, dims, iters)
    return spark.createDataFrame(
        [(j + 1, v[j]) for j in range(dims)], "dim bigint, loading double"
    ).orderBy("dim")


def projection_by_label(
    embeddings: DataFrame, dims: int = DIMS, iters: int = POWER_ITERS
) -> DataFrame:
    """(label, n, mean_proj_fp, var_proj_fp): every embedding projected
    onto the corpus's top principal direction, summarized per label —
    the downstream CONSUMPTION of the spectral result: if labels
    separate along the dominant axis, it is signal; if all label means
    coincide, the axis is shared anisotropy you'd whiten away.

    The projection is distributed: the d-vector from
    :func:`top_principal_direction` is embedded as a LITERAL array
    (driver holds d doubles — nothing is collected from data) and each
    row pays one pinned-order fold; per-label stats use the
    fixed-point-then-exact-bigint contract (projections floored ·10⁴;
    mean and variance from integer moments, floor-on-double final
    divisions — see the inline note)."""
    from lab3_spark.functions.partitioning import spread

    vrow = top_principal_direction(embeddings, dims, iters).orderBy(
        "dim"
    ).collect()
    if not vrow:
        return embeddings.sparkSession.createDataFrame(
            [], "label int, n bigint, mean_proj_fp bigint, var_proj_fp bigint"
        )
    vlit = F.array(*[F.lit(float(r["loading"])) for r in vrow])
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * QSCALE).cast("double"),
    )
    # pinned left fold seeded 0.0 == list_reduce over the zipped list
    proj = F.aggregate(
        F.zip_with(q, vlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # fixed-point ·10⁴ (not 10⁶): Σp² must stay in int64 at large N
    # (|proj| ≤ ||x|| ≤ ~50 ⇒ p ≤ 5·10⁵, p² ≤ 2.5·10¹¹ — safe to ~10⁷
    # rows per label).  Final divisions run floor-on-double on BOTH
    # sides: Spark's integer DIV truncates toward zero while DuckDB's
    # // floors, and projections can be negative.
    pfp = F.floor(proj * (1.0 / QSCALE) * 10_000).cast("bigint")
    base = spread(embeddings).select("label", pfp.alias("p"))
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    return (
        base.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p").alias("s"),
            F.sum(F.col("p") * F.col("p")).alias("ss"),
        )
        .select(
            "label",
            F.col("n").cast("bigint").alias("n"),
            F.floor(sd / nd).cast("bigint").alias("mean_proj_fp"),
            F.floor(ssd / nd - (sd / nd) * (sd / nd))
            .cast("bigint")
            .alias("var_proj_fp"),
        )
        .orderBy("label")
    )


def top2_principal_directions(
    embeddings: DataFrame, dims: int = DIMS, iters: int = POWER_ITERS
) -> DataFrame:
    """(component, dim, loading): the top TWO principal directions —
    v1 by power iteration, v2 by HOTELLING DEFLATION (G₂ = G − λ₁v₁v₁ᵀ
    with λ₁ the Rayleigh quotient) and a second iteration chain on the
    deflated matrix.  Together they span the plane every embedding-
    space scatter plot projects onto.

    Same determinism contract throughout: distributed exact-integer
    Gramian, d² scalars to the driver, and every float op — Rayleigh
    fold, deflation term t = (λ·v_j)·v_k, both iteration chains — in a
    PINNED order the unrolled SQL replays bit-for-bit."""
    spark = embeddings.sparkSession
    g = {
        (r["j"], r["k"]): r["gv"]
        for r in gram_matrix(embeddings, dims).collect()
    }
    if not g or all(v == 0 for v in g.values()):
        return spark.createDataFrame(
            [], "component bigint, dim bigint, loading double"
        )
    grows = [
        [float(g[(j, k)]) for k in range(1, dims + 1)]
        for j in range(1, dims + 1)
    ]
    v1 = _power_iteration(grows, dims, iters)
    # Rayleigh quotient λ1 = v1ᵀ(G v1): pinned folds — w first, then λ
    w = []
    for j in range(dims):
        row = grows[j]
        acc = row[0] * v1[0]
        for k in range(1, dims):
            acc += row[k] * v1[k]
        w.append(acc)
    lam = v1[0] * w[0]
    for j in range(1, dims):
        lam += v1[j] * w[j]
    # Hotelling deflation with the pinned term order t = (λ·v_j)·v_k
    g2 = [
        [grows[j][k] - (lam * v1[j]) * v1[k] for k in range(dims)]
        for j in range(dims)
    ]
    v2 = _power_iteration(g2, dims, iters)
    rows = [(1, j + 1, v1[j]) for j in range(dims)] + [
        (2, j + 1, v2[j]) for j in range(dims)
    ]
    return spark.createDataFrame(
        rows, "component bigint, dim bigint, loading double"
    ).orderBy("component", "dim")

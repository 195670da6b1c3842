"""Diversity-aware selection: maximal marginal relevance (MMR).

Training-data curation wants the k examples that are RELEVANT to a
target but not redundant with each other — dedup removes near-copies,
MMR goes further and penalizes mere similarity among the survivors:

    pick argmax_i  rel_i − λ · max_{s ∈ selected} cos(x_i, x_s)

(Carbonell & Goldstein 1998), greedy, one pick per step.

The 100 TB shape is the production reranker's: the corpus-scale work
is ONE relevance scan (per-row fold against the broadcast query
vector) and a top-M heap (TakeOrderedAndProject — no global sort, no
window); the greedy quadratic phase then runs over the BOUNDED
shortlist only (M×d scalars on the driver — bounded by the parameter
like the k-means centroid collect, not by the data).  Running greedy
over the full corpus instead would cost k full scans for the same
answer on any corpus where the MMR set is inside the relevance top-M;
M is the knob that trades that assumption against shortlist size.

Cross-engine determinism: every inner product folds left in index
order with the first term as seed (functions/vectors.dot_product ==
DuckDB ``list_reduce``), λ = 0.5 is a power of two, and the penalty
fold is max() == ``greatest`` over the same doubles — so scores are
bit-identical and ties break on vec_id identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lab3_spark.functions.partitioning import spread
from lab3_spark.functions.vectors import dot_product, unit_vector

MMR_K = 8
MMR_LAMBDA = 0.5  # power of two: 0.5·ms is exact in every engine
SHORTLIST = 200


def _pinned_dot(a: list[float], b: list[float]) -> float:
    """Left fold seeded from the first product — the exact recurrence
    of functions/vectors.dot_product and DuckDB's list_reduce."""
    acc = a[0] * b[0]
    for i in range(1, len(a)):
        acc += a[i] * b[i]
    return acc


def mmr_select(
    embeddings: DataFrame,
    k: int = MMR_K,
    lam: float = MMR_LAMBDA,
    shortlist: int = SHORTLIST,
    query_vec_id: int = 0,
) -> DataFrame:
    """(step, vec_id, mmr_score): the k vectors greedily selected by
    MMR against the unit query vector (vec_id = ``query_vec_id``),
    λ-weighted redundancy penalty, ties → lowest vec_id.

    ``mmr_score`` is the score AT SELECTION TIME (step 1 = pure
    relevance; later steps = rel − λ·max-sim-to-selected)."""
    emb = spread(embeddings).select(
        "vec_id", unit_vector("embedding").alias("u")
    )
    qrow = emb.where(F.col("vec_id") == query_vec_id).select("u").collect()
    if not qrow:
        raise ValueError(f"query vector {query_vec_id} not found")
    if qrow[0]["u"] is None:
        raise ValueError(
            f"query vector {query_vec_id} has zero norm (unit vector "
            "undefined) — pick a non-degenerate query"
        )
    qlit = F.array(*[F.lit(float(x)) for x in qrow[0]["u"]])
    cand = (
        emb.where(F.col("vec_id") != query_vec_id)
        .select("vec_id", "u", dot_product(F.col("u"), qlit).alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(shortlist)
    )
    # bounded collect: shortlist × (d + 2) scalars, the reranker window
    rows = [(r["vec_id"], list(r["u"]), r["rel"]) for r in cand.collect()]

    picked: list[tuple[int, int, float]] = []  # (step, vec_id, score)
    ms: dict[int, float | None] = {vid: None for vid, _, _ in rows}
    live = {vid: (u, rel) for vid, u, rel in rows}
    for step in range(1, min(k, len(rows)) + 1):
        best_vid, best_score = None, None
        for vid, _, rel in rows:
            if vid not in live:
                continue
            m = ms[vid]
            score = rel - lam * (m if m is not None else 0.0)
            if best_vid is None or score > best_score or (
                score == best_score and vid < best_vid
            ):
                best_vid, best_score = vid, score
        su = live[best_vid][0]
        picked.append((step, best_vid, best_score))
        del live[best_vid]
        for vid in live:
            d = _pinned_dot(live[vid][0], su)
            m = ms[vid]
            ms[vid] = max(m if m is not None else -1.0, d)

    return embeddings.sparkSession.createDataFrame(
        picked, "step bigint, vec_id bigint, mmr_score double"
    ).orderBy("step")

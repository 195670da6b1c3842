"""Fixed-point PageRank — the second iterative DataFrame algorithm
(alongside operators/components.py), run over the MinHash candidate
graph: rank near-duplicate clusters by centrality so the KEPT
representative is the best-connected document, not merely min(doc_id).

ALL-INTEGER arithmetic (the same cross-engine contract as SimHash and
the LSH codes): ranks are bigint fixed-point (RANK_SCALE = 1e12),
per-edge contribution is `rank div degree` (integer division — exact),
the damping step is `base + (85 * sum) div 100` — every operation is
associative/exact, so a SQL oracle unrolling the same iterations
reproduces the ranks bit-for-bit.  Float PageRank would hash-mismatch:
summation order differs between engines (the round-1
`ann_lsh_buckets` lesson).

Scale shape per iteration: one hash-shuffle join of edges with ranks
on src (degree rides along, pre-joined once) and one groupBy(dst) —
both keyed shuffles, no broadcast of anything data-sized, no driver
collect.  Lineage is truncated with localCheckpoint each iteration
(the components.py pattern) so the plan doesn't grow exponentially
with iteration count."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 10**12
DAMPING_NUM = 85
DAMPING_DEN = 100
BASE_FP = (DAMPING_DEN - DAMPING_NUM) * RANK_SCALE // DAMPING_DEN


def symmetrize(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Undirected candidate pairs (a < b, unique) → directed edge list
    with both orientations."""
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    return fwd.unionAll(rev)


def pagerank_fixed_point(edges: DataFrame, n_iter: int = 5) -> DataFrame:
    """(node, rank_fp): integer fixed-point PageRank after ``n_iter``
    synchronous iterations from a uniform RANK_SCALE start.

    ``edges`` is a directed (src, dst) list; a symmetrized graph (every
    node has out-degree ≥ 1) has no dangling-mass problem by
    construction.

    Warm path: the loop materializes a checkpoint PER ITERATION during
    construction, so only an INPUT-keyed result memo can skip it — a
    repeat call over the same edge frame returns the previous ranks
    checkpoint without running a single job (the components.py
    pattern).  A rebuild retires the old ranks checkpoint, so all
    cached entries are invalidated first."""
    from lab3_spark.functions.partitioning import (
        memo_result,
        memo_result_invalidate,
    )

    def build() -> DataFrame:
        memo_result_invalidate("pagerank.result.")
        return _pr_iterations(edges, n_iter)

    return memo_result(f"pagerank.result.n{n_iter}", edges, build)


def _pr_iterations(edges: DataFrame, n_iter: int) -> DataFrame:
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    # degree rides with the edge list from the start: one narrow join
    # now instead of a second join every iteration
    edeg = edges.join(deg, "src").select("src", "dst", "deg")
    # memo_persist: both frames are re-read every iteration; the
    # registry bounds growth to one cached (edeg, nodes) pair per
    # session AND lets a repeat run over the same graph cache-hit
    # them instead of rebuilding (sameResult plan match).
    from lab3_spark.functions.partitioning import (
        free_checkpoint,
        memo_persist,
        retire_latest,
    )

    edeg = memo_persist("pagerank.edeg", edeg)
    nodes = memo_persist("pagerank.nodes", nodes)

    ranks = nodes.withColumn("rank_fp", F.lit(RANK_SCALE).cast("bigint"))
    prev_ckpt = None
    for _ in range(n_iter):
        summed = (
            edeg.join(ranks, edeg.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            (
                F.lit(BASE_FP)
                + F.expr(
                    f"({DAMPING_NUM} * coalesce(s, CAST(0 AS BIGINT)))"
                    f" div {DAMPING_DEN}"
                )
            )
            .cast("bigint")
            .alias("rank_fp"),
        )
        # truncate lineage so the logical plan stays O(1) per
        # iteration.  EAGER + free-prev keeps at most TWO rank tables
        # persisted at any moment (the lazy chain pinned every
        # iteration's checkpoint until the ContextCleaner got to them —
        # at scale that is n_iter full rank tables of storage); the
        # materialization cost is nothing extra, the final action paid
        # it anyway.
        ranks = ranks.localCheckpoint(eager=True)
        if prev_ckpt is not None:
            free_checkpoint(prev_ckpt)
        prev_ckpt = ranks
    # the final checkpoint outlives this call (the caller reads it);
    # the NEXT call retires it
    return retire_latest("pagerank.ranks", ranks)


def ppr_fixed_point(
    edges: DataFrame, n_iter: int = 5, n_seeds: int = 3
) -> DataFrame:
    """(node, rank_fp): PERSONALIZED PageRank — restart mass goes to a
    SEED SET instead of uniformly (TrustRank / topic-sensitive
    PageRank, Gyöngyi et al. 2004 / Haveliwala 2002, public): ranks
    measure proximity to the seeds, the curation primitive for
    propagating trust from vetted documents (or suspicion from known
    spam) through the near-duplicate graph.

    Seeds are the ``n_seeds`` smallest node ids (deterministic,
    scale-free); each seed carries restart mass RANK_SCALE (a constant
    factor vs the normalized 1/|S| convention — rankings identical,
    arithmetic stays all-bigint).  r0 = RANK_SCALE on seeds, 0
    elsewhere; each iteration adds BASE_FP restart only on seeds.
    Same per-iteration shape and bounded checkpointing as
    `pagerank_fixed_point`; the oracle unrolls identical CTEs with a
    CASE base term."""
    from lab3_spark.functions.partitioning import (
        free_checkpoint,
        memo_persist,
        memo_result,
        memo_result_invalidate,
        retire_latest,
    )

    def build() -> DataFrame:
        memo_result_invalidate("pagerank.ppr_result.")
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        nodes = edges.select(F.col("src").alias("node")).distinct()
        edeg = memo_persist(
            "pagerank.ppr_edeg", edges.join(deg, "src").select("src", "dst", "deg")
        )
        seeds = nodes.orderBy("node").limit(n_seeds).select(
            "node", F.lit(1).alias("is_seed")
        )
        nflag = memo_persist(
            "pagerank.ppr_nodes",
            nodes.join(F.broadcast(seeds), "node", "left").select(
                "node", F.coalesce("is_seed", F.lit(0)).alias("is_seed")
            ),
        )
        base = (F.col("is_seed") * F.lit(BASE_FP)).cast("bigint")
        ranks = nflag.select(
            "node",
            (F.col("is_seed") * F.lit(RANK_SCALE)).cast("bigint").alias("rank_fp"),
        )
        prev_ckpt = None
        for _ in range(n_iter):
            summed = (
                edeg.join(ranks, edeg.src == ranks.node)
                .select(
                    F.col("dst").alias("node"),
                    F.expr("rank_fp div deg").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("s"))
            )
            ranks = nflag.join(summed, "node", "left").select(
                "node",
                (
                    base
                    + F.expr(
                        f"({DAMPING_NUM} * coalesce(s, CAST(0 AS BIGINT)))"
                        f" div {DAMPING_DEN}"
                    )
                )
                .cast("bigint")
                .alias("rank_fp"),
            )
            ranks = ranks.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                free_checkpoint(prev_ckpt)
            prev_ckpt = ranks
        return retire_latest("pagerank.ppr_ranks", ranks)

    return memo_result(f"pagerank.ppr_result.n{n_iter}.s{n_seeds}", edges, build)


# 10^6 (not the rank family's 10^12): raw = Σ scores over in-edges ≤
# SCALE·max_degree, and the renormalization multiplies raw·SCALE again
# — SCALE²·degree must stay under 2^63, so 10^6 holds to degree ~9e6.
HITS_SCALE = 10**6


def hits_scores(edges: DataFrame, n_iter: int = 2, k: int = 10) -> DataFrame:
    """(role, node, score_fp): HITS hubs & authorities (Kleinberg 1999,
    public) over a DIRECTED edge list after ``n_iter`` mutual-
    reinforcement rounds — auth(v) = Σ hub(u) over u→v, hub(u) =
    Σ auth(v) over u→v, each side renormalized so its max is
    HITS_SCALE.  Max-normalization (instead of the textbook L2) keeps
    every value a bigint and the truncating DIV identical across
    engines; rankings are unchanged (positive scale factor).

    Per round: two keyed equi-joins of the edge list with the current
    score table and two combinable aggregations, plus a 1-row max
    broadcast for the normalizer — no all-pairs, no driver data.  The
    top-k per role is a TakeOrderedAndProject heap."""
    from lab3_spark.functions.partitioning import persist_latest

    if n_iter < 1:  # auths is only bound inside the loop
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")

    # persisted: the edge list is probed 2× per round
    edges = persist_latest("pagerank.hits.edges", edges)
    src_nodes = edges.select(F.col("src").alias("node")).distinct()
    hubs = src_nodes.select(
        "node", F.lit(HITS_SCALE).cast("bigint").alias("score")
    )
    auths = None
    for i in range(n_iter):
        # each raw frame is persisted: it feeds BOTH its 1-row max
        # normalizer and the normalized projection, and the rounds
        # chain — unpersisted, every consumer re-derives the whole
        # prior-round subtree and the duplication compounds per round
        # (measured 13 s → ~3 s at sf0.1).  Keys are per-round, so the
        # registry holds a fixed 2·n_iter entries.
        a_raw = persist_latest(
            f"pagerank.hits.a_raw{i}",
            edges.join(hubs, edges.src == hubs.node)
            .groupBy("dst")
            .agg(F.sum("score").alias("_raw")),
        )
        auths = (
            a_raw.crossJoin(F.broadcast(a_raw.agg(F.max("_raw").alias("_m"))))
            .select(
                F.col("dst").alias("node"),
                F.expr(f"CAST(_raw * {HITS_SCALE} DIV _m AS BIGINT)").alias(
                    "score"
                ),
            )
        )
        h_raw = persist_latest(
            f"pagerank.hits.h_raw{i}",
            edges.join(auths, edges.dst == auths.node)
            .groupBy("src")
            .agg(F.sum("score").alias("_raw")),
        )
        hubs = (
            h_raw.crossJoin(F.broadcast(h_raw.agg(F.max("_raw").alias("_m"))))
            .select(
                F.col("src").alias("node"),
                F.expr(f"CAST(_raw * {HITS_SCALE} DIV _m AS BIGINT)").alias(
                    "score"
                ),
            )
        )
    top_h = (
        hubs.orderBy(F.desc("score"), F.asc("node"))
        .limit(k)
        .select(F.lit("hub").alias("role"), "node", F.col("score").alias("score_fp"))
    )
    top_a = (
        auths.orderBy(F.desc("score"), F.asc("node"))
        .limit(k)
        .select(
            F.lit("authority").alias("role"),
            "node",
            F.col("score").alias("score_fp"),
        )
    )
    return top_h.unionAll(top_a).orderBy("role", F.desc("score_fp"), "node")

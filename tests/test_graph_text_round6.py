"""Round-6 graph/text additions: sorted-neighborhood dedup, BFS hops,
HITS, TextRank co-occurrence edges — hand-checked on planted inputs."""

from pyspark.sql import functions as F


def test_sorted_neighborhood_window_budget(spark):
    """Docs 1 and 2 share identical text (adjacent after the sort →
    caught, jaccard 1.0).  Doc 50 has the SAME content but a prefix
    that sorts it far away — outside the window, so SNM (by design)
    never compares it: the fixed-budget trade-off made visible."""
    from lab3_spark.operators.dedup import sorted_neighborhood_pairs

    body = "alpha beta gamma delta epsilon zeta eta theta"
    mid = [
        (10 + i, f"mmm{i} filler words nothing shared here at all {i}")
        for i in range(6)
    ]
    docs = spark.createDataFrame(
        [
            (1, "aaa " + body),
            (2, "aaa " + body),
            (50, "zzz " + body),
        ]
        + mid,
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in sorted_neighborhood_pairs(docs, window=3).collect()
    }
    assert got[(1, 2)] == 1.0
    assert not any(50 in p for p in got)


def test_bfs_hops_depths_and_cap(spark):
    """Chain 1-2-3-4-5 with seeds {1,2,3}: hop 0 for seeds, 4 at hop 1,
    5 at hop 2; a node further than max_depth from every seed is
    absent."""
    from lab3_spark.operators.components import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8)],
        "doc_a bigint, doc_b bigint",
    )
    got = {r.node: r.hops for r in bfs_hops(edges, n_seeds=3, max_depth=2).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 2}  # 6,7,8 beyond depth 2


def test_hits_hand_checked_bipartite(spark):
    """s1 supplies both customers, s2 supplies only c1.  After one
    round: auth(c1)=2S is the max → 1e6; auth(c2)=S → 5e5; hub(s1)
    = auth(c1)+auth(c2) is max → 1e6; hub(s2) = auth(c1) → 666666."""
    from lab3_spark.operators.pagerank import HITS_SCALE, hits_scores

    edges = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 101)], "src bigint, dst bigint"
    )
    got = {
        (r.role, r.node): r.score_fp
        for r in hits_scores(edges, n_iter=1, k=10).collect()
    }
    assert got[("authority", 101)] == HITS_SCALE
    assert got[("authority", 102)] == HITS_SCALE // 2
    assert got[("hub", 1)] == HITS_SCALE
    # hub(s2) = auth(c1) = S → S*S // (S + S/2)
    assert got[("hub", 2)] == HITS_SCALE * HITS_SCALE // (HITS_SCALE * 3 // 2)


def test_textrank_edges_window_and_stops(spark):
    """±2 co-occurrence pairs, stop words excluded as nodes, self-pairs
    dropped, (least, greatest) normalized, corpus-wide distinct."""
    from lab3_spark.operators.textstats import textrank_cooccurrence_edges

    docs = spark.createDataFrame(
        # tokens: ["spark", "the", "engine"] — "the" is a stop word:
        # spark-engine still pairs at distance 2 THROUGH it
        [(1, "spark the engine"), (2, "engine spark"), (3, "spark spark")],
        "doc_id long, text string",
    )
    got = {
        (r.w_a, r.w_b) for r in textrank_cooccurrence_edges(docs).collect()
    }
    assert got == {("engine", "spark")}

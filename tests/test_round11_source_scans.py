"""Python differentials for the round-11 per-source scan rewrites:
histogram medians (robust_quality_zscore) and the two-level running
token budget (per_source_token_budget) against naive references."""

from pyspark.sql import functions as F


def _doc(doc_id, source, words):
    return (doc_id, source, " ".join(f"w{i}" for i in range(words)))


def test_histogram_median_matches_positional_rule(spark):
    """Odd and even group sizes, duplicate values, single-row source —
    the median must equal the mean of the one/two middle POSITIONS of
    the sorted multiset, exactly as the pre-rewrite rank pass
    computed it."""
    import statistics

    from lab3_spark.operators.textstats import robust_quality_zscore

    rows = [
        _doc(1, "a", 3),
        _doc(2, "a", 10),
        _doc(3, "a", 10),  # duplicate quality with doc 2
        _doc(4, "a", 40),
        _doc(5, "a", 60),  # odd-size source
        _doc(6, "b", 5),
        _doc(7, "b", 25),  # even-size source
        _doc(8, "c", 17),  # single-row source: med = its own quality
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = robust_quality_zscore(df).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for src, docs in by_source.items():
        qs = sorted(d["quality"] for d in docs)
        n = len(qs)
        want = (qs[(n + 1) // 2 - 1] + qs[(n + 2) // 2 - 1]) / 2
        assert abs(docs[0]["med"] - round(want, 4)) <= 1e-4, (src, want)
        # cross-check with the statistics module's low/high mean
        assert abs(want - statistics.median(qs)) < 1e-9
    c = by_source["c"][0]
    assert c["med"] == c["quality"] and c["mad"] == 0.0
    assert c["robust_z"] == 0.0  # mad == 0 → z defined as 0


def test_per_source_budget_matches_python_walk(spark):
    """cum_tokens must equal the naive (quality DESC, doc_id ASC)
    per-source walk — including ties on quality (decided by doc_id)
    and the keep-iff-cum<=budget rule."""
    from lab3_spark.operators.sampling import per_source_token_budget
    from lab3_spark.operators.textstats import quality_expr  # noqa: F401

    rows = [
        _doc(1, "a", 30),
        _doc(2, "a", 30),  # identical text → tied quality, id decides
        _doc(3, "a", 8),
        _doc(4, "a", 55),
        _doc(5, "b", 12),
        _doc(6, "b", 90),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budget = 70
    got = {
        (r["source"], r["doc_id"]): r["cum_tokens"]
        for r in per_source_token_budget(df, budget=budget).collect()
    }
    # python reference walk over the engine's own (quality, n_tokens)
    scored = df.select(
        "doc_id",
        "source",
        F.floor(
            __import__("lab3_spark.operators.textstats", fromlist=["x"])
            .quality_expr("text")
            * 10_000
        ).alias("q4"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    ).collect()
    want = {}
    per_src = {}
    for r in scored:
        per_src.setdefault(r["source"], []).append(r)
    for src, docs in per_src.items():
        cum = 0
        for r in sorted(docs, key=lambda r: (-r["q4"], r["doc_id"])):
            cum += r["n_tokens"]
            if cum <= budget:
                want[(src, r["doc_id"])] = cum
    assert got == want

"""Group-aware leakage-safe split (sampling.leakage_safe_split)."""

from pyspark.sql import functions as F


def _frames(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id bigint"
    )
    # three components: {0,1,2} (chained), {10,11}, {50,60}
    cands = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (50, 60)], "doc_a bigint, doc_b bigint"
    )
    return docs, cands


def test_components_never_straddle(spark):
    from lab3_spark.operators.sampling import leakage_safe_split

    docs, cands = _frames(spark)
    out = leakage_safe_split(docs, cands).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 200
    # every component member shares group_id (= min doc_id) and split
    for comp in [(0, 1, 2), (10, 11), (50, 60)]:
        groups = {by_id[d].group_id for d in comp}
        splits = {by_id[d].split for d in comp}
        assert groups == {min(comp)}
        assert len(splits) == 1
    # singletons keep their own id as the group
    assert by_id[99].group_id == 99


def test_all_three_splits_present_and_deterministic(spark):
    from lab3_spark.operators.sampling import leakage_safe_split

    docs, cands = _frames(spark)
    a = leakage_safe_split(docs, cands).collect()
    b = leakage_safe_split(docs, cands).collect()
    assert a == b
    shares = {s: 0 for s in ("train", "val", "test")}
    for r in a:
        shares[r.split] += 1
    assert all(v > 0 for v in shares.values())
    assert shares["train"] > shares["val"] + shares["test"]


def test_per_doc_split_would_leak_here(spark):
    """The motivating counterexample: hash each doc independently and
    at least one candidate pair straddles splits on this fixture —
    exactly what the group-aware split makes impossible."""
    from lab3_spark.functions.text import md5_long
    from lab3_spark.operators.sampling import leakage_safe_split

    docs, cands = _frames(spark)
    h = md5_long(F.col("doc_id").cast("string"), salt="gsplit")
    naive = docs.select(
        "doc_id",
        F.when(h % 100 < 80, "train")
        .when(h % 100 < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    naive_by_id = {r.doc_id: r.split for r in naive.collect()}
    pairs = [(r.doc_a, r.doc_b) for r in cands.collect()]
    naive_straddles = any(naive_by_id[a] != naive_by_id[b] for a, b in pairs)
    safe_by_id = {
        r.doc_id: r.split for r in leakage_safe_split(docs, cands).collect()
    }
    safe_straddles = any(safe_by_id[a] != safe_by_id[b] for a, b in pairs)
    assert not safe_straddles
    # the fixture is chosen so the naive split demonstrably leaks
    assert naive_straddles

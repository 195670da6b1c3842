"""Batch applyInPandas grouped-map: per-group min-max normalization."""

from lab3_spark.operators.grouped import minmax_normalize_embeddings


def test_minmax_normalize_bounds_and_grouping(spark):
    rows = [
        (0, 1, [0.0, 10.0]),
        (1, 1, [5.0, 20.0]),
        (2, 1, [10.0, 15.0]),
        (3, 2, [7.0, 7.0]),  # singleton group: constant dims -> 0.0
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    got = {
        r["vec_id"]: list(r["normalized"])
        for r in minmax_normalize_embeddings(df).collect()
    }
    assert got[0] == [0.0, 0.0]
    assert got[2] == [1.0, 0.5]
    assert got[1] == [0.5, 1.0]
    assert got[3] == [0.0, 0.0]

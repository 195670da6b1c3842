"""Correctness under heavy key skew: one key owning ~half of all rows
must aggregate exactly, both through the plain dataflow (partial agg
bounds reduce-side skew) and the salted two-phase facade; the salted
JOIN must equal the plain join row-for-row."""

from pyspark.sql import functions as F

from lab3_spark.operators.mapreduce import map_reduce, map_reduce_salted
from lab3_spark.operators.skew import salted_join, zipf_keys


def test_skewed_aggregation_exact(spark):
    n = 200_000
    # ~50% of rows share key 'hot'; the rest spread over 1000 keys
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "hot")
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 1000).cast("string")))
        .alias("k")
    )
    mapper = F.array(
        F.struct(F.col("k").alias("key"), F.lit(1).cast("long").alias("value"))
    )
    plain = {
        (r["key"], r["value"])
        for r in map_reduce(df, mapper, combiner="sum").collect()
    }
    salted = {
        (r["key"], r["value"])
        for r in map_reduce_salted(df, mapper, combiner="sum", n_salts=32).collect()
    }
    assert plain == salted
    by = dict(plain)
    assert by["hot"] == n // 2
    assert sum(by.values()) == n


def test_salted_join_matches_plain(spark):
    fact = zipf_keys(spark, 50_000, hot_share=1 / 3, n_cold=500)
    dim = (
        spark.range(500)
        .select(
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
            (F.col("id") % 7).cast("double").alias("w"),
        )
        .union(spark.range(1).select(F.lit("hot").alias("k"), F.lit(1.0).alias("w")))
    )
    plain = (
        fact.join(dim, "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.round(F.sum(F.col("v") * F.col("w")), 6).alias("s"))
    )
    salted = (
        salted_join(fact, dim, "k", n_salts=8)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.round(F.sum(F.col("v") * F.col("w")), 6).alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("zz", 9.0)], "k string, v double"
    )
    dim = spark.createDataFrame([("a", 10.0)], "k string, w double")
    rows = sorted(
        map(tuple, salted_join(fact, dim, "k", n_salts=4, how="left").collect())
    )
    assert rows == [("a", 1.0, 10.0), ("a", 2.0, 10.0), ("zz", 9.0, None)]


def test_salted_join_rejects_unsupported_how(spark):
    import pytest

    df = spark.range(1).select(F.lit("x").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")


def test_key_skew_report_hand_case(spark):
    from lab3_spark.operators.skew import key_skew_report

    rows = [(0, i) for i in range(10)] + [(k, 100 + k) for k in range(1, 11)]
    df = spark.createDataFrame(rows, "k long, payload long")
    r = key_skew_report(df, "k", "t").collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_group"]) == (20, 11, 10)
    assert r["top_share_fp"] == 500_000  # hot key holds half the rows
    # sizes ascending: ten 1s then the 10; i50 = 6 -> 1, i99 = 10 -> 1
    assert r["p50_group"] == 1 and r["p99_group"] == 1


def test_key_skew_report_uniform(spark):
    from lab3_spark.operators.skew import key_skew_report

    rows = [(k, i) for k in range(8) for i in range(3)]
    df = spark.createDataFrame(rows, "k long, payload long")
    r = key_skew_report(df, "k", "t").collect()[0]
    assert (r["max_group"], r["p50_group"], r["p99_group"]) == (3, 3, 3)
    assert r["top_share_fp"] == 125_000

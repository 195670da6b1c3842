"""Correctness under heavy key skew: one key owning ~half of all rows
must aggregate exactly, both through the plain dataflow (partial agg
bounds reduce-side skew) and the salted two-phase facade."""

from pyspark.sql import functions as F

from lab3_spark.operators.mapreduce import map_reduce, map_reduce_salted


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

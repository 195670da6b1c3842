"""Similarity search over embedding columns (array<float>).

Two paths, mirroring what a production vector pipeline runs:

- brute-force cosine top-k: exact, O(Q·N) — the correctness baseline.
  Q queries broadcast against the corpus; per-pair math is a JVM-side
  higher-order-function fold (zip_with + aggregate), no UDF.
- IVF-style blocked top-k: the scale path — a coarse quantizer assigns
  each vector to a bucket (here the `label` column stands in for a
  centroid id); queries probe only their own bucket.  At 100 TB this
  turns a full-corpus scan into a per-bucket scan (1/nlist of the
  data), the classic recall/cost trade.
- random-hyperplane LSH code: deterministic md5-derived planes — a
  portable signed projection whose oracle is expressible in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lab3_spark.functions.rounding import trunc
from lab3_spark.functions.text import md5_long
from lab3_spark.functions.vectors import dot_product, unit_vector


def _topk_per_query(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            trunc(F.col("cos_raw"), 4).alias("cos"),
            "rnk",
        )
        .orderBy("query_id", "rnk")
    )


def ann_bruteforce(
    embeddings: DataFrame, n_queries: int = 20, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: vec_id < n_queries as the query set, ranked
    against the whole corpus (self excluded).

    The query side is tiny → broadcast; Catalyst plans
    BroadcastNestedLoopJoin so the corpus is scanned once, partitions
    in parallel, no shuffle of the big side.  Both sides are
    unit-normalized before the join: one fold per pair."""
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    corpus = embeddings.repartition(par).select(
        F.col("vec_id").alias("neighbor_id"), unit_vector("embedding").alias("u_n")
    )
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), unit_vector("embedding").alias("u_q")
    )
    pairs = F.broadcast(queries).crossJoin(corpus).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    pairs = pairs.withColumn("cos_raw", dot_product(F.col("u_q"), F.col("u_n")))
    return _topk_per_query(pairs, k)


def ann_ivf(
    embeddings: DataFrame, n_queries: int = 20, k: int = 5
) -> DataFrame:
    """IVF-style approximate top-k: probe only the query's own coarse
    bucket (label = centroid id stand-in).  Same output schema as
    ann_bruteforce; recall < 1 when true neighbors live in other
    buckets — that is the documented trade."""
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    corpus = embeddings.repartition(par).select(
        "label", F.col("vec_id").alias("neighbor_id"), unit_vector("embedding").alias("u_n")
    )
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        "label", F.col("vec_id").alias("query_id"), unit_vector("embedding").alias("u_q")
    )
    pairs = (
        F.broadcast(queries.withColumnRenamed("label", "qlabel"))
        .join(corpus, F.col("qlabel") == F.col("label"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_raw", dot_product(F.col("u_q"), F.col("u_n")))
    )
    return _topk_per_query(pairs, k)


N_PLANES = 16
PLANE_MOD = 2001  # component ∈ [-1000, 1000] / 1000


def _plane_component(p: F.Column, d: F.Column) -> F.Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1]:
    derived from the portable md5 hash of (plane, dim) — identical in
    the DuckDB oracle."""
    h = md5_long(F.concat(p.cast("string"), F.lit(","), d.cast("string")))
    return ((h % PLANE_MOD) - (PLANE_MOD - 1) / 2) / ((PLANE_MOD - 1) / 2)


def lsh_codes(embeddings: DataFrame) -> DataFrame:
    """(vec_id, code): N_PLANES-bit random-hyperplane signature.

    code bit p = sign(v · plane_p).  Buckets with equal codes hold
    likely-similar vectors; at scale the code is the shuffle key that
    replaces all-pairs search."""
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    exploded = embeddings.repartition(par).select(
        "vec_id",
        F.posexplode("embedding").alias("d", "x"),
    ).select(
        "vec_id",
        "d",
        F.col("x").cast("double").alias("x"),
        F.explode(F.sequence(F.lit(0), F.lit(N_PLANES - 1))).alias("p"),
    )
    dots = (
        exploded.withColumn(
            "contrib", F.col("x") * _plane_component(F.col("p"), F.col("d"))
        )
        .groupBy("vec_id", "p")
        .agg(F.sum("contrib").alias("dot"))
    )
    return dots.groupBy("vec_id").agg(
        F.sum(
            F.when(
                F.col("dot") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)")
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("code")
    )


def lsh_bucket_sizes(embeddings: DataFrame) -> DataFrame:
    """(code, n_vecs): LSH bucket histogram — the partition-balance
    diagnostic for the ANN scale path."""
    return (
        lsh_codes(embeddings)
        .groupBy("code")
        .agg(F.count("*").alias("n_vecs"))
        .orderBy("code")
    )

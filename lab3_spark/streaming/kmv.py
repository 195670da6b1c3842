"""Streaming KMV (bottom-k) synopsis maintenance — incremental
distinct counts.

The batch gate (`events_kmv_daily_users`) builds per-day KMV synopses
in one pass; this module maintains the SAME synopsis incrementally at
ingest: each micro-batch writes its own ≤ k-row bottom-k synopsis, and
because KMV merges by "union then re-select the k smallest" (the
union's k smallest hashes all sit inside each constituent's k
smallest), the merged store estimate is bit-identical to the one-shot
batch estimate — the mergeability `tests/test_sketches.py` pins on
hash values is the entire implementation.

Exactly-once: each batch's synopsis goes to its own
``{store}/batch_id=N`` partition with overwrite — the same
idempotence-per-(batch_id, data) contract as `streaming/cms.py`.  The
store holds ≤ k rows per batch (metadata scale); a compaction job
that re-selects the k smallest over old partitions keeps it bounded
without changing any estimate (the same associativity argument as CMS
elementwise addition).

At 100 TB/day the per-batch cost is one distinct + salted top-k over
the batch only; the all-time distinct estimate never rescans history
— it reads ≤ k·batches rows and re-selects k.

Reference parity note: the reference (Phoenix++, include/map_reduce.h)
is strictly batch; SURVEY §2.8/§2.9 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab3_spark.operators.events import KMV_DOMAIN, KMV_HEX_CHARS, kmv_synopsis


def _hv(key_col: str):
    from lab3_spark.functions.text import hex_to_long

    return hex_to_long(
        F.substring(
            F.md5(F.concat(F.lit("kmv|"), F.col(key_col).cast("string"))),
            1,
            KMV_HEX_CHARS,
        )
    )


def merged_estimate_frame(
    spark: SparkSession, store_path: str, k: int
) -> DataFrame:
    """1-row (est_users_total): distinct-count estimate from the union
    of every batch's synopsis — bit-identical to the one-shot batch
    KMV estimate over the full history (mergeability), computed from
    ≤ k·batches stored rows without touching the source stream."""
    return (
        spark.read.option("basePath", store_path)
        .parquet(f"{store_path}/batch_id=*")
        .select("hv")
        .distinct()
        .orderBy("hv")
        .limit(k)
        .agg(F.count("*").alias("ns"), F.max("hv").alias("hk"))
        .select(
            F.when(F.col("ns") < k, F.col("ns"))
            .otherwise(F.expr(f"CAST({(k - 1) * KMV_DOMAIN} AS BIGINT) div hk"))
            .cast("bigint")
            .alias("est_users_total")
        )
    )


def merged_estimate(spark: SparkSession, store_path: str, k: int) -> int:
    return merged_estimate_frame(spark, store_path, k).collect()[0][
        "est_users_total"
    ]


def compact_kmv_store(
    spark: SparkSession, store_path: str, k: int, keep_last: int = 2
) -> int:
    """Re-select the k smallest distinct hashes over all batch
    partitions except the ``keep_last`` most recent into the OLDEST
    retained partition, then drop the absorbed ones — the same
    bounded-store maintenance job as `cms.compact_cms_store`, with the
    same crash-safety discipline: the scratch dir is _-prefixed (the
    ``batch_id=*`` reader glob never sees it) and stale scratch dirs
    are deleted on entry.  ``keep_last`` protects replayable batches
    (a replayed absorbed batch would overwrite a partition its hashes
    were folded into).  Returns the number of absorbed partitions."""
    import re

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(store_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    for st in fs.listStatus(hpath):
        if st.getPath().getName().startswith("_compacting_"):
            fs.delete(st.getPath(), True)
    ids = sorted(
        int(m.group(1))
        for st in fs.listStatus(hpath)
        if (m := re.fullmatch(r"batch_id=(\d+)", st.getPath().getName()))
    )
    absorb = ids[:-keep_last] if keep_last > 0 else ids
    if len(absorb) < 2:
        return 0
    target, rest = absorb[0], absorb[1:]
    merged = (
        spark.read.option("basePath", store_path)
        .parquet(*[f"{store_path}/batch_id={b}" for b in absorb])
        .select("hv")
        .distinct()
        .orderBy("hv")
        .limit(k)
    )
    tmp = f"{store_path}/_compacting_{target}"
    merged.write.mode("overwrite").parquet(tmp)
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{store_path}/batch_id={target}"), True)
    fs.rename(
        jvm.org.apache.hadoop.fs.Path(tmp),
        jvm.org.apache.hadoop.fs.Path(f"{store_path}/batch_id={target}"),
    )
    for b in rest:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{store_path}/batch_id={b}"), True)
    return len(rest)


def start_streaming_kmv(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    key_col: str = "user_id",
    k: int = 64,
):
    """Start the synopsis-maintenance StreamingQuery (availableNow
    trigger — drains the source then stops, the test/replay-friendly
    mode; a production ingest would use a processing-time trigger)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_syn = kmv_synopsis(
            batch_df.select(F.lit("all").alias("g"), _hv(key_col).alias("hv")),
            "g",
            "hv",
            k,
        ).select("hv")
        batch_syn.write.mode("overwrite").parquet(
            f"{store_path}/batch_id={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

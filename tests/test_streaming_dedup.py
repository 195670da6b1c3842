"""Streaming dedup: duplicate events within the watermark horizon are
dropped; output matches batch dropDuplicates on the same data."""

import os

from pyspark.sql import functions as F

from lab3_spark.streaming.windowed import streaming_dedup


def test_streaming_dedup_drops_in_horizon_duplicates(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:01:00", "a-dup"),     # same id, inside horizon
        (2, "2024-01-01 00:02:00", "b"),
        (3, "2024-01-01 00:03:00", "c"),
        (2, "2024-01-01 00:03:30", "b-dup"),
    ]
    src = spark.createDataFrame(
        rows, "event_id long, ts_s string, payload string"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "payload")
    path = os.path.join(str(tmp_path), "dedup_src")
    src.write.parquet(path)

    stream = spark.readStream.schema(src.schema).parquet(path)
    q = (
        streaming_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"] for r in spark.table("dedup_stream_test").collect()}
    assert got == {1, 2, 3}
    assert spark.table("dedup_stream_test").count() == 3

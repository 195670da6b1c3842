"""Streaming sinks beyond the memory table: the production shapes.

- parquet + checkpoint: exactly-once via the commit log (Spark's file
  sink writes a manifest per batch; readers see only committed files).
- foreachBatch: the escape hatch for sinks without native streaming
  support.  Exactly-once there is the USER's job — the contract is
  IDEMPOTENCE PER (batch_id, data): a replayed micro-batch (crash
  between write and checkpoint commit) must overwrite its own output,
  not append a duplicate.  The standard shape is partitioning the
  output by batch_id and overwriting that partition, which is what
  :func:`foreach_batch_parquet_sink` does.

At scale the checkpoint location is the durability boundary: losing it
means reprocessing from the source's retention horizon; keeping it on
the object store next to the output is the production default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def foreach_batch_parquet_sink(
    result: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "complete",
):
    """Start `result` into per-batch parquet directories
    (`{path}/batch_id=N/`) via foreachBatch.

    mode "complete" (for aggregations): each batch rewrites the full
    state, so the HIGHEST committed batch_id directory is the result —
    and a replayed batch is harmless (same id → same directory →
    overwrite).  Returns the StreamingQuery."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        result.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def latest_batch_output(spark, path: str) -> DataFrame:
    """Read back the highest-batch_id directory — the committed result
    of a complete-mode foreachBatch run."""
    import os
    import re

    batches = [
        int(m.group(1))
        for d in os.listdir(path)
        if (m := re.match(r"batch_id=(\d+)$", d))
    ]
    if not batches:
        raise FileNotFoundError(f"no batch_id=* directories under {path}")
    return spark.read.parquet(f"{path}/batch_id={max(batches)}")

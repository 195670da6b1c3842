"""Production storage behaviors: small-file compaction and schema
evolution — the two parquet-layout operations every long-lived dataset
needs (SCALE.md: file counts and schema drift are operational, not
query, problems)."""

import os

from pyspark.sql import functions as F


def _parquet_files(path):
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_compaction_bounds_file_count_and_size(spark, sf_dir, tmp_path):
    """Fragmented writes (many tiny files) compact to a bounded file
    count with maxRecordsPerFile enforcing the upper row bound."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()

    fragmented = str(tmp_path / "fragmented")
    docs.repartition(32).write.mode("overwrite").parquet(fragmented)
    assert len(_parquet_files(fragmented)) >= 16  # the small-file problem

    compacted = str(tmp_path / "compacted")
    (
        spark.read.parquet(fragmented)
        .repartition(2)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max(n, 1))
        .parquet(compacted)
    )
    assert len(_parquet_files(compacted)) <= 2
    assert spark.read.parquet(compacted).count() == n


def test_schema_evolution_merge_read(spark, tmp_path):
    """A dataset written over time with an added column reads as the
    union schema under mergeSchema; old rows surface NULL for the new
    column (the additive-evolution contract)."""
    base = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    v1.write.parquet(f"{base}/batch=1")
    v2 = spark.createDataFrame(
        [(3, "c", 0.5)], "id long, name string, score double"
    )
    v2.write.parquet(f"{base}/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[2] is None and rows[3] == 0.5
    # nulls for pre-evolution rows are filterable like any other
    assert merged.where(F.col("score").isNotNull()).count() == 1

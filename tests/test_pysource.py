"""Custom Python DataSource: deterministic, partition-parallel."""

from lab3_spark.sources.pysource import register, synth_text


def test_partitioning_covers_exact_row_range(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 103)  # deliberately not divisible by parts
        .option("parts", 4)
        .load()
    )
    rows = df.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(103))


def test_content_matches_driver_side_generator(spark):
    register(spark)
    df = spark.read.format("synthetic_docs").option("n", 20).option("parts", 3).load()
    got = {r["doc_id"]: r["text"] for r in df.collect()}
    assert got == {d: synth_text(d) for d in range(20)}

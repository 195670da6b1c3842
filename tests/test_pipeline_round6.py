"""Round-6 pipeline additions: k-anonymity report, truncated EWMA,
compaction bin-packing — hand-checked semantics."""

from pyspark.sql import functions as F


def test_k_anonymity_classes_and_suppression(spark):
    from lab3_spark.operators.quality import k_anonymity_report

    docs = spark.createDataFrame(
        [(i, "en", "web", 150) for i in range(5)]  # class of 5 → safe
        + [(10, "en", "web", 250)]  # singleton → suppressed
        + [(11, "fr", "web", 150), (12, "fr", "web", 199)],  # class of 2
        "doc_id long, lang string, source string, n_chars long",
    )
    got = {
        (r.lang, r.source, r.size_bucket): (r.class_size, r.is_suppressed)
        for r in k_anonymity_report(docs, k=5).collect()
    }
    assert got == {
        ("en", "web", 1): (5, 0),
        ("en", "web", 2): (1, 1),
        ("fr", "web", 1): (2, 1),
    }


def test_ewma_hand_checked_fold(spark):
    """Fold from 0 with α=1/2 then normalize by (1 − 2^-n):
    x=[4]: acc=2, norm 0.5 → 4.0 (single value is its own average);
    x=[4,8]: acc=1+4=5, norm 0.75 → 6.6666 (recent value weighted 2×)."""
    from lab3_spark.operators.events import ewma_values

    ev = spark.createDataFrame(
        [
            (1, 7, "2024-01-01 10:00:00", 4.0),
            (2, 7, "2024-01-01 10:01:00", 8.0),
        ],
        "event_id bigint, user_id bigint, ts_s string, value double",
    ).select(
        "event_id",
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "value",
    )
    got = {r.event_id: r.ewma for r in ewma_values(ev).collect()}
    assert got[1] == 4.0
    assert got[2] == 6.6666


def test_ewma_window_truncates_at_span(spark):
    """With span=2 only the previous event contributes: the third
    value's EWMA ignores the first entirely."""
    from lab3_spark.operators.events import ewma_values

    ev = spark.createDataFrame(
        [
            (1, 7, "2024-01-01 10:00:00", 1000.0),
            (2, 7, "2024-01-01 10:01:00", 4.0),
            (3, 7, "2024-01-01 10:02:00", 8.0),
        ],
        "event_id bigint, user_id bigint, ts_s string, value double",
    ).select(
        "event_id",
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "value",
    )
    got = {r.event_id: r.ewma for r in ewma_values(ev, span=2).collect()}
    assert got[3] == 6.6666  # (4/4 + 8/2) / 0.75 — the 1000 is gone


def test_compaction_plan_first_fit_by_order(spark):
    """Files of 3000+3000 bytes: the second STARTS at 3000 (< 4000) so
    both land in bin 0 (overshoot ≤ one file); the third starts at
    6000 → bin 1.  Sources pack independently."""
    from lab3_spark.sources.layout import compaction_plan

    docs = spark.createDataFrame(
        [
            (1, "a", 3000),
            (2, "a", 3000),
            (3, "a", 3000),
            (4, "b", 9000),
        ],
        "doc_id long, source string, n_chars long",
    )
    got = {
        (r.source, r.bin_id): (r.n_files, r.total_bytes)
        for r in compaction_plan(docs).collect()
    }
    assert got == {
        ("a", 0): (2, 6000),
        ("a", 1): (1, 3000),
        ("b", 0): (1, 9000),
    }

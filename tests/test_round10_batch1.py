"""Round-10 additions, part 1: the ADVICE r9 guard fixes."""

import pytest
from pyspark.sql import functions as F  # noqa: F401


def test_logreg_empty_documents_raises_value_error(spark):
    """ADVICE r9: an empty documents frame must raise the engine's
    descriptive empty-input ValueError (kmeans.py contract), not the
    raw ZeroDivisionError from the gradient-step divisor."""
    from lab3_spark.operators.quality import train_quality_logreg

    empty = spark.createDataFrame(
        [], "doc_id bigint, text string, source string"
    )
    with pytest.raises(ValueError, match="empty documents frame"):
        train_quality_logreg(empty).collect()


def test_incremental_spans_refuses_partially_wiped_store(spark, tmp_path):
    """ADVICE r9: a PARTIAL wipe (spans/ deleted, gramcounts/ intact)
    must surface the documented refusing-to-dedup RuntimeError, not a
    raw py4j FileNotFoundException from spark.read.parquet."""
    import shutil

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from tests.test_round9_batch2 import BLOCK, _doc_feed, _drain_spans

    feed = _doc_feed(spark, tmp_path, [[(1, BLOCK), (2, BLOCK)]])
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    _drain_spans(spark, feed, store, ck)
    shutil.rmtree(store + "/spans")
    _doc_feed(spark, tmp_path, [[(3, BLOCK)]])
    with pytest.raises(StreamingQueryException, match="refusing"):
        _drain_spans(spark, feed, store, ck)

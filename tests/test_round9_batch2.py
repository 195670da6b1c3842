"""Round-9 additions, part 2: the streaming incremental exact-substring
span store (streaming/incremental_spans.py)."""

import pytest
from pyspark.sql import functions as F


def _doc_feed(spark, tmp_path, batches):
    """Write document batches as mtime-ordered single-file parquets."""
    import os
    import time

    feed = str(tmp_path / "feed")
    os.makedirs(feed, exist_ok=True)
    existing = len(os.listdir(feed))
    for i, docs in enumerate(batches, start=existing):
        part = str(tmp_path / f"part{i}")
        spark.createDataFrame(docs, "doc_id bigint, text string").coalesce(
            1
        ).write.parquet(part)
        (pf,) = [f for f in os.listdir(part) if f.endswith(".parquet")]
        dst = os.path.join(feed, f"{i:02d}.parquet")
        os.rename(os.path.join(part, pf), dst)
        os.utime(dst, (time.time() + i * 10,) * 2)
    return feed


def _drain_spans(spark, feed, store, ck, n=3, min_span=6):
    src = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    from lab3_spark.streaming.incremental_spans import (
        start_incremental_spans,
    )

    q = start_incremental_spans(
        src, store, ck, n=n, min_span_tokens=min_span
    )
    if not q.awaitTermination(300):  # pragma: no cover
        q.stop()
        raise AssertionError("incremental spans stream timed out")


# 8-token boilerplate block — pure-alpha words: the letters-only
# tokenizer would fold "s1".."s8" all to "s" (self-repetition)
BLOCK = "sa sb sc sd se sf sg sh"


def test_incremental_spans_merged_equals_batch(spark, tmp_path):
    """The maintained span store's final version must equal one-shot
    batch exact_substring_spans over the union of every delivered
    document — including the OLD-doc reactivation case: doc 1's block
    is unique in batch 0 (no span), becomes duplicated when batch 1
    delivers doc 2 with the same block, so doc 1's span must appear
    through the newly-duplicated-gram re-evaluation path."""
    from lab3_spark.operators.dedup import exact_substring_spans
    from lab3_spark.streaming.incremental_spans import (
        latest_spans,
        spans_snapshot,
    )

    b0 = [(1, BLOCK + " taila tailb")]
    b1 = [(2, "heada " + BLOCK), (1, BLOCK)]  # doc 1 re-delivered: idempotent
    b2 = [(3, "ua ub uc ud ue uf ug")]  # all-unique, affects nothing
    feed = _doc_feed(spark, tmp_path, [b0, b1, b2])
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    _drain_spans(spark, feed, store, ck)

    all_docs = spark.createDataFrame(
        [b0[0], b1[0], b2[0]], "doc_id bigint, text string"
    )
    exp = sorted(
        map(
            tuple,
            exact_substring_spans(
                all_docs, n=3, min_span_tokens=6
            ).collect(),
        )
    )
    got = sorted(map(tuple, latest_spans(spark, store).collect()))
    assert got == exp
    # the reactivation specifically: version 0 has NO spans (block
    # unique), version 1 reports doc 1's span without re-delivery
    assert spans_snapshot(spark, store, 0).count() == 0
    v1 = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in spans_snapshot(spark, store, 1).collect()
    }
    assert v1[1] == (0, 8) and v1[2] == (1, 9)
    # idempotence: doc 1's re-delivery in batch 1 did not duplicate rows
    assert len(got) == len({(r[0], r[1]) for r in got})


def test_incremental_spans_unaffected_docs_carry_over(spark, tmp_path):
    """A batch that repeats nothing old recomputes nothing old: after
    batch 2 (all-unique doc), the span rows of docs 1/2 are carried
    from version 1 verbatim."""
    from lab3_spark.streaming.incremental_spans import spans_snapshot

    feed = _doc_feed(
        spark,
        tmp_path,
        [
            [(1, BLOCK), (2, BLOCK)],
            [(3, "ua ub uc ud ue uf ug")],
        ],
    )
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    _drain_spans(spark, feed, store, ck)
    v0 = sorted(map(tuple, spans_snapshot(spark, store, 0).collect()))
    v1 = sorted(map(tuple, spans_snapshot(spark, store, 1).collect()))
    assert v0 == v1 == [(1, 0, 8, 8), (2, 0, 8, 8)]


def test_incremental_spans_refuses_wiped_store(spark, tmp_path):
    """Full store wipe under a kept checkpoint must fail the stream
    (the cdc.py guard contract)."""
    import shutil

    from pyspark.errors.exceptions.captured import StreamingQueryException

    feed = _doc_feed(spark, tmp_path, [[(1, BLOCK), (2, BLOCK)]])
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    _drain_spans(spark, feed, store, ck)
    shutil.rmtree(store)
    _doc_feed(spark, tmp_path, [[(3, BLOCK)]])
    with pytest.raises(StreamingQueryException, match="refusing"):
        _drain_spans(spark, feed, store, ck)


def test_latest_spans_missing_store_raises_python_error(spark, tmp_path):
    from lab3_spark.streaming.incremental_spans import latest_spans

    with pytest.raises(FileNotFoundError, match="no span versions"):
        latest_spans(spark, str(tmp_path / "never_written"))

"""Inverted index (SURVEY.md §3.3, phoenixLab/invert).

Reference: split on \\n with 0-based line numbers (invert.cpp:91-105),
map emits (word, line_num) (invert.cpp:85), buffer_combiner collects all
values with no combining (combiner.h:37-105), the sink groups adjacent
rows per word and suppresses adjacent duplicate line numbers
(invert.cpp:151-168).  Its sort comparator orders groups by key POINTER
(invert.cpp:107-109) ≈ order of first occurrence — documented as a bug
(SURVEY.md §2.4 O5).

Spark translation (idiomatic, the default): groupBy word +
``sort_array(collect_set(id))`` — the "intent" semantics: fully deduped,
sorted postings.  Exact-parity variants keep first-occurrence row order
(min id per word) and adjacent-only dedup.

Scale note (SURVEY.md §7.4 risk 4): ``collect_set`` on a degenerate key
(a word on millions of lines) buffers the whole posting list in one
aggregation buffer — exactly like the reference's buffer_combiner would
(combiner.h:43-46).  ``posting_cap`` bounds it via slice-after-collect;
the real 100 TB answer is to keep postings as (word, id) ROWS, sorted by
(word, id) — which is `pairs` below, no collect at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lab3_spark.functions.text import is_stop_word, tokenize


def posting_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, id) pairs — the un-collected inverted index (scale form)."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(tokenize(text_col)).alias("word"),
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "idiomatic",
    stop_mode: str = "idiomatic",
    posting_cap: int | None = None,
) -> DataFrame:
    """word → posting list.

    idiomatic: (word, ids array<long> sorted distinct), ordered by word.
    parity: first-occurrence ordering — returns (word, ids, first_id)
    ordered by first_id (the documented reading of the pointer-order
    sort, invert.cpp:107-109), postings in occurrence order with
    adjacent-duplicate suppression only (invert.cpp:153-155).
    """
    pairs = posting_pairs(df, text_col, id_col).where(
        ~is_stop_word("word", stop_mode)
    )
    if mode == "idiomatic":
        ids = F.sort_array(F.collect_set("id"))
        if posting_cap is not None:
            ids = F.slice(ids, 1, posting_cap)
        return (
            pairs.groupBy("word").agg(ids.alias("ids")).orderBy("word")
        )
    # parity: keep occurrence order, drop only ADJACENT duplicates —
    # higher-order filter keeps it UDF-free.
    occ = F.array_sort(F.collect_list("id"))
    dedup_adjacent = F.filter(
        occ, lambda x, i: (i == 0) | (x != F.get(occ, i - 1))
    )
    return (
        pairs.groupBy("word")
        .agg(
            dedup_adjacent.alias("ids"),
            F.min("id").alias("first_id"),
        )
        .orderBy("first_id", "word")
    )

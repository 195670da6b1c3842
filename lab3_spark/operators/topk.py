"""Top-K most frequent words (SURVEY.md §3.2, phoenixLab/top50).

The reference performs a FULL global sort then prints K rows
(top50.cpp:109-111, :153-159).  Spark plans ``orderBy(...).limit(k)`` as
``TakeOrderedAndProject`` — per-partition heap top-K + driver merge: no
global sort, no range-exchange.  Same answer, the physical strategy you
actually want at 100 TB (SURVEY.md §2.4 O4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lab3_spark.operators.wordcount import word_count


def top_k_words(
    df: DataFrame, k: int = 50, text_col: str = "text", mode: str = "idiomatic"
) -> DataFrame:
    """(word, cnt): the K most frequent non-stop-words.

    Order: cnt DESC, ties word DESC (top50.cpp:109-111); the stop-word
    filter is applied BEFORE the limit (top50.cpp:153-159).
    """
    counts = word_count(df, text_col=text_col, mode=mode, ordered=False)
    return counts.orderBy(F.desc("cnt"), F.desc("word")).limit(k)

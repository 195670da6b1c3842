"""Word count — the reference's flagship pipeline (SURVEY.md §3.1).

Reference lifecycle (phoenixLab/wordCount/wordCount.cpp): pread file →
split on \\t\\r\\n → per-thread tokenize+combine (sum_combiner) → hash
shuffle → reduce merge → parallel merge-sort (cnt ASC, word DESC) →
substring stop-word filter at print time.

Spark translation: scan → explode(regexp tokens) → partial+final hash
aggregation (Catalyst inserts the map-side combine automatically, the
analogue of combiner.h:230-235) → stop-word filter → orderBy.  The whole
map/combine path is one WholeStageCodegen span; no Python touches a row.

Filter placement: the reference filters AFTER aggregation (print loop,
wordCount.cpp:151-157).  Filtering stop words *before* the shuffle is
semantically identical for the surviving rows and strictly cheaper (stop
words are the heaviest groups in natural text — dropping them early cuts
shuffle volume); we do that in idiomatic mode.  Parity mode keeps the
post-agg placement since the substring predicate is per-distinct-word.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lab3_spark.functions.text import is_stop_word, tokenize


def _words(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(F.explode(tokenize(text_col)).alias("word"))


def word_counts_unfiltered(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) with NO stop-word filter — the raw aggregation."""
    return _words(df, text_col).groupBy("word").agg(F.count("*").alias("cnt"))


def word_count(
    df: DataFrame,
    text_col: str = "text",
    mode: str = "idiomatic",
    ordered: bool = True,
) -> DataFrame:
    """Full word-count pipeline → (word, cnt).

    Order: cnt ASC, ties word DESC (wordCount.cpp:108-110).
    mode: 'idiomatic' (set membership) | 'parity' (substring semantics,
    wordCount.cpp:152) — outputs genuinely differ (SURVEY.md §7.0).
    """
    if mode == "idiomatic":
        words = _words(df, text_col).where(~is_stop_word("word", "idiomatic"))
        counts = words.groupBy("word").agg(F.count("*").alias("cnt"))
    else:
        counts = word_counts_unfiltered(df, text_col).where(
            ~is_stop_word("word", mode)
        )
    if ordered:
        counts = counts.orderBy(F.asc("cnt"), F.desc("word"))
    return counts


def stop_words_df(spark) -> DataFrame:
    """The stop-word list as a 1-row-per-word DataFrame (broadcast-join
    side for anti-join filtering at scale)."""
    from lab3_spark.stopwords import STOP_WORDS

    return spark.createDataFrame([(w,) for w in STOP_WORDS], "word string")


def word_count_antijoin(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Idiomatic-mode word count via broadcast LEFT ANTI join — the
    at-scale form of the stop-word filter (182 rows always broadcast;
    equivalent to the IN-list predicate)."""
    spark = df.sparkSession
    words = _words(df, text_col)
    kept = words.join(F.broadcast(stop_words_df(spark)), "word", "left_anti")
    return kept.groupBy("word").agg(F.count("*").alias("cnt")).orderBy(
        F.asc("cnt"), F.desc("word")
    )

"""Query catalog: every driver-checkable query + its DuckDB oracle.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` registered in
``QUERIES``; its DuckDB-equivalent SQL (same column names, driver
hash-compares values) lives in ``ORACLES``.  Queries without an oracle
(genuinely non-SQL-expressible ops) are registered with ``oracle=None``
and get the driver's weaker rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab3_spark import oracles as OR
from lab3_spark.operators.inverted_index import inverted_index
from lab3_spark.operators.topk import top_k_words
from lab3_spark.operators.wordcount import word_count

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# §1 Parity surface: the reference's three text pipelines (SURVEY.md §3)
# run over the `documents` table (doc_id BIGINT, text, lang, source, n_chars).
# ---------------------------------------------------------------------------


@query(
    "word_count",
    f"""
    WITH {OR.duck_tokens_cte()}
    SELECT word, count(*) AS cnt
    FROM toks
    WHERE word NOT IN ({OR.STOP_WORDS_IN_LIST})
    GROUP BY word
    ORDER BY cnt ASC, word DESC
    """,
)
def q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wordCount pipeline, idiomatic stop-filter (SURVEY §3.1)."""
    return word_count(_t(spark, sf_dir, "documents"), mode="idiomatic")


@query(
    "word_count_parity",
    f"""
    WITH {OR.duck_tokens_cte()}
    SELECT word, count(*) AS cnt
    FROM toks
    WHERE strpos({OR.STOP_LINE_SQL}, word) = 0
    GROUP BY word
    ORDER BY cnt ASC, word DESC
    """,
)
def q_word_count_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wordCount with the reference's substring stop-filter semantics
    (wordCount.cpp:152 — drops any word that is a substring of the
    stop line)."""
    return word_count(_t(spark, sf_dir, "documents"), mode="parity")


@query(
    "top50_words",
    f"""
    WITH {OR.duck_tokens_cte()}
    SELECT word, count(*) AS cnt
    FROM toks
    WHERE word NOT IN ({OR.STOP_WORDS_IN_LIST})
    GROUP BY word
    ORDER BY cnt DESC, word DESC
    LIMIT 50
    """,
)
def q_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top50 pipeline (SURVEY §3.2): K most frequent non-stop-words;
    planned as TakeOrderedAndProject, not a full sort."""
    return top_k_words(_t(spark, sf_dir, "documents"), k=50)


@query(
    "inverted_index",
    f"""
    WITH {OR.duck_tokens_cte()}
    SELECT word,
           array_to_string(list_sort(list(DISTINCT id)), ',') AS ids,
           count(DISTINCT id) AS n_docs
    FROM toks
    WHERE word NOT IN ({OR.STOP_WORDS_IN_LIST})
    GROUP BY word
    ORDER BY word
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """invert pipeline (SURVEY §3.3), idiomatic mode: word → sorted
    distinct posting list (rendered as CSV string for stable hashing)."""
    idx = inverted_index(_t(spark, sf_dir, "documents"), id_col="doc_id")
    return idx.select(
        "word",
        F.concat_ws(",", F.transform("ids", lambda x: x.cast("string"))).alias("ids"),
        F.size("ids").cast("bigint").alias("n_docs"),
    )

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
from lab3_spark.operators import events as EV
from lab3_spark.operators import relational as REL
from lab3_spark.operators import textstats as TS
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
    from lab3_spark.sources.tables import load_table

    return load_table(spark, sf_dir, name)


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


# ---------------------------------------------------------------------------
# §2 Relational analytics (joins / aggs / windows / set ops) — engine
# extensions beyond the reference (SURVEY.md §2.5 policy).
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)       AS sum_qty,
           round(sum(l_extendedprice), 2)  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)       AS avg_qty,
           round(avg(l_extendedprice), 4)  AS avg_price,
           round(avg(l_discount), 4)       AS avg_disc,
           count(*)                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_q1(spark, sf_dir):
    return REL.q1_pricing_summary(_t(spark, sf_dir, "lineitem"))


@query(
    "q3_shipping_priority",
    """
    SELECT o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey ASC
    LIMIT 10
    """,
)
def q_q3(spark, sf_dir):
    df = REL.q3_shipping_priority(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )
    return df.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
        "revenue",
    )


@query(
    "q5_region_revenue",
    """
    SELECT n.n_name AS n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name ASC
    """,
)
def q_q5(spark, sf_dir):
    return REL.q5_region_revenue(
        _t(spark, sf_dir, "region"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
    )


@query(
    "order_priority_check",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_q4(spark, sf_dir):
    return REL.order_priority_check(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


@query(
    "top_customers_per_nation",
    """
    WITH spend AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
      FROM orders GROUP BY o_custkey
    )
    SELECT n_name, c_custkey, c_name, spend,
           row_number() OVER (PARTITION BY n_name
                              ORDER BY spend DESC, c_custkey ASC) AS rnk
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN spend s ON c.c_custkey = s.o_custkey
    QUALIFY rnk <= 3
    ORDER BY n_name, rnk
    """,
)
def q_top_cust(spark, sf_dir):
    return REL.top_customers_per_nation(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "nation"),
    )


@query(
    "monthly_revenue_trend",
    """
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY 1
    )
    SELECT month, total,
           lag(total) OVER (ORDER BY month) AS prev_total,
           round(avg(total) OVER (ORDER BY month
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS ma3
    FROM monthly
    ORDER BY month
    """,
)
def q_trend(spark, sf_dir):
    return REL.monthly_revenue_trend(_t(spark, sf_dir, "orders"))


@query(
    "mktsegment_rollup",
    """
    SELECT n_name, c_mktsegment,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST
    """,
)
def q_rollup(spark, sf_dir):
    return REL.mktsegment_rollup(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    )


@query(
    "nations_without_suppliers",
    """
    SELECT n_name FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    EXCEPT
    SELECT n_name FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY n_name
    """,
)
def q_except(spark, sf_dir):
    return REL.nations_without_suppliers(
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
    )


@query(
    "distinct_part_types",
    """
    SELECT DISTINCT p_brand, p_type FROM part ORDER BY p_brand, p_type
    """,
)
def q_distinct(spark, sf_dir):
    return REL.distinct_part_types(_t(spark, sf_dir, "part"))


# ---------------------------------------------------------------------------
# §3 Event analytics (batch forms; streaming twins in lab3_spark/streaming)
# ---------------------------------------------------------------------------


@query(
    "events_tumbling_5min",
    """
    SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def q_tumbling(spark, sf_dir):
    return EV.tumbling_counts(_t(spark, sf_dir, "events"))


@query(
    "events_daily_active_users",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS dau
    FROM events GROUP BY 1 ORDER BY day
    """,
)
def q_dau(spark, sf_dir):
    return EV.daily_active_users(_t(spark, sf_dir, "events"))


@query(
    "events_props_stats",
    r"""
    SELECT event_type,
           count(*) AS n_events,
           floor((avg(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT))) * 10000) / 10000 AS avg_k,
           min(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS min_k,
           max(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_props(spark, sf_dir):
    return EV.props_stats(_t(spark, sf_dir, "events"))


@query(
    "events_sessionize",
    """
    WITH e AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1, 0)
                    OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                  THEN 1 ELSE 0 END AS is_break
      FROM events
    ), s AS (
      SELECT user_id, ts,
             sum(is_break) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM e
    )
    SELECT user_id, session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q_sessionize(spark, sf_dir):
    return EV.sessionize(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# §4 Text analysis (training-data pipeline operators over `documents`)
# ---------------------------------------------------------------------------

_DUCK_TOKS = f"regexp_extract_all(lower(text), {OR.DUCK_TOKEN_REGEX})"
_DUCK_STOP_ARR = "[" + OR.STOP_WORDS_IN_LIST + "]"


@query(
    "doc_token_stats",
    f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len({_DUCK_TOKS}) AS n_tokens,
           len(list_distinct({_DUCK_TOKS})) AS n_distinct_tokens,
           len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS n_bpe_pieces
    FROM documents ORDER BY doc_id
    """,
)
def q_token_stats(spark, sf_dir):
    return TS.token_stats(_t(spark, sf_dir, "documents"))


@query(
    "doc_quality",
    f"""
    WITH t AS (
      SELECT doc_id, text, {_DUCK_TOKS} AS toks, length(text) AS n_chars,
             len({_DUCK_TOKS}) AS n_tokens
      FROM documents
    )
    SELECT doc_id,
      floor((CASE WHEN n_tokens > 0 THEN
        len(list_intersect(list_distinct(toks), {_DUCK_STOP_ARR}))
          / len(list_distinct(toks)) ELSE 0.0 END) * 10000) / 10000 AS stop_ratio,
      floor((CASE WHEN n_chars > 0 THEN
        length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) / n_chars
        ELSE 0.0 END) * 10000) / 10000 AS punct_ratio,
      floor((CASE WHEN n_tokens > 0 THEN
        list_sum(list_transform(toks, x -> length(x))) / n_tokens
        ELSE 0.0 END) * 10000) / 10000 AS mean_tok_len,
      floor((CASE WHEN n_tokens > 0 THEN
        len(list_distinct(toks)) / n_tokens ELSE 0.0 END) * 10000) / 10000 AS distinct_ratio,
      floor((0.4 * least(n_tokens / 50.0, 1.0)
          + 0.3 * (1 - CASE WHEN n_chars > 0 THEN
              length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) / n_chars
              ELSE 0.0 END)
          + 0.3 * (CASE WHEN n_tokens > 0 THEN
              len(list_distinct(toks)) / n_tokens ELSE 0.0 END)) * 10000) / 10000 AS quality
    FROM t ORDER BY doc_id
    """,
)
def q_quality(spark, sf_dir):
    return TS.quality_score(_t(spark, sf_dir, "documents"))


@query(
    "doc_lang_id",
    f"""
    WITH t AS (
      SELECT doc_id, lang, list_distinct({_DUCK_TOKS}) AS dtoks FROM documents
    )
    SELECT doc_id, lang,
      floor((CASE WHEN len(dtoks) > 0 THEN
        len(list_intersect(dtoks, {_DUCK_STOP_ARR})) / len(dtoks)
        ELSE 0.0 END) * 10000) / 10000 AS en_stop_ratio,
      CASE WHEN (CASE WHEN len(dtoks) > 0 THEN
        len(list_intersect(dtoks, {_DUCK_STOP_ARR})) / len(dtoks)
        ELSE 0.0 END) >= 0.15 THEN 'en' ELSE 'other' END AS pred_lang
    FROM t ORDER BY doc_id
    """,
)
def q_lang_id(spark, sf_dir):
    return TS.lang_id(_t(spark, sf_dir, "documents"))


@query(
    "doc_fingerprint",
    f"""
    SELECT doc_id, md5(array_to_string({_DUCK_TOKS}, ' ')) AS fp
    FROM documents ORDER BY doc_id
    """,
)
def q_fingerprint(spark, sf_dir):
    return TS.fingerprint(_t(spark, sf_dir, "documents"))

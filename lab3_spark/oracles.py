"""DuckDB oracle-SQL builders shared by __spark_entry__ and tests.

The driver compares each Spark query against ANSI SQL run by DuckDB on
the same parquet tables (views: region nation customer supplier part
orders lineitem events documents embeddings).  Helpers here keep the
SQL and the Spark expressions in lock-step (same stop-word list, same
token regex, same portable-hash arithmetic).
"""

from __future__ import annotations

from lab3_spark.functions.text import TOKEN_REGEX
from lab3_spark.stopwords import STOP_LINE, STOP_WORDS


def sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# DuckDB regex literal for the tokenizer (apostrophe doubled inside '').
DUCK_TOKEN_REGEX = sql_quote(TOKEN_REGEX)

# 182 quoted literals for the idiomatic stop-word filter.
STOP_WORDS_IN_LIST = ", ".join(sql_quote(w) for w in STOP_WORDS)

# The 1000-char stop line for the exact-parity substring filter.
STOP_LINE_SQL = sql_quote(STOP_LINE)


def duck_tokens_cte(table: str = "documents", id_col: str = "doc_id") -> str:
    """CTE producing (id, word) token pairs like operators.posting_pairs."""
    return (
        f"toks AS (SELECT {id_col} AS id, "
        f"unnest(regexp_extract_all(lower(text), {DUCK_TOKEN_REGEX})) AS word "
        f"FROM {table})"
    )

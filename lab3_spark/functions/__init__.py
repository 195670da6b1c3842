"""Column-expression library (pure Catalyst expressions, no UDFs)."""

from lab3_spark.functions.text import (
    TOKEN_REGEX,
    hex_to_long,
    is_stop_word,
    md5_long,
    tokenize,
)
from lab3_spark.functions.vectors import cosine_similarity, dot_product, l2_norm

__all__ = [
    "TOKEN_REGEX",
    "tokenize",
    "is_stop_word",
    "hex_to_long",
    "md5_long",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]

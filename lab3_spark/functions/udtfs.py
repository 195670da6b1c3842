"""Python UDTF extension point (SURVEY.md §2.7).

The reference's `split` hook is a UDTF in disguise: a user function
emitting N rows per input (phoenixLab/include/map_reduce.h:120, app
override wordCount.cpp:89-106).  The engine's parity tokenizer is a
Catalyst expression (functions/text.tokenize — JVM, codegen); THIS
module is the escape hatch for user logic that genuinely can't be an
expression, using PySpark's arrow-optimized Python UDTFs.

Contract notes (and why the hot paths don't use this):
- a Python UDTF runs row-at-a-time in a Python worker — 10-100×
  slower than the equivalent expression; use only when expressions
  and pandas UDFs can't express the logic (stateful per-row emission,
  third-party libraries).
- tests/test_udtf.py pins output parity between TokenizePositionsUDTF
  and the expression form `posexplode(tokenize(text))` — the UDTF
  surface must never drift from the engine's token spec.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from lab3_spark.functions.text import TOKEN_REGEX


@udtf(returnType="word: string, pos: int")
class TokenizePositionsUDTF:
    """(word, pos) per token — the reference split/map hook as a
    Python UDTF.  Same token spec as functions/text.tokenize
    (wordCount.cpp:67-86): lowercase, ``[a-z][a-z']*``."""

    def eval(self, text: str):  # noqa: D102 - contract in class docstring
        import re

        if text:
            for i, w in enumerate(re.findall(TOKEN_REGEX, text.lower())):
                yield (w, i)


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL use (LATERAL joins)."""
    spark.udtf.register("tokenize_positions", TokenizePositionsUDTF)

"""The Arrow byte-level tokenizer twin must be bit-identical to the
expression tokenizer on ASCII input, and its documented divergence on
ASCII-folding Unicode must stay exactly as documented.

Kernel-level tests run without Spark (pure pyarrow/numpy) so edge
cases are cheap to enumerate; one end-to-end test pins equality of
word_count_arrow vs word_count on the real documents table.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from lab3_spark.functions.arrow_text import token_counts_table


def _counts(texts: list[str | None]) -> dict[str, int]:
    t = token_counts_table(pa.array(texts, type=pa.string()))
    return dict(zip(t.column("word").to_pylist(), t.column("cnt").to_pylist()))


def _ref_counts(texts: list[str | None]) -> dict[str, int]:
    """The spec, computed independently: lowercase then [a-z][a-z']*."""
    import re
    from collections import Counter

    c: Counter[str] = Counter()
    for s in texts:
        if s is None:
            continue
        # ASCII tolower — the kernel's (and the reference's) semantics
        lowered = "".join(
            chr(ord(ch) + 32) if "A" <= ch <= "Z" else ch for ch in s
        )
        c.update(re.findall(r"[a-z][a-z']*", lowered))
    return dict(c)


CASES = [
    ["hello world hello"],
    ["Don't stop believin'"],
    ["'tis '''tis ''' x"],  # leading apostrophes trimmed; all-apos run dropped
    ["abc123def 42 7x x7"],  # digits separate; token must start with a letter
    ["", "   ", "\t\r\n"],  # empty / whitespace-only rows
    ["edge"],  # single token fills a whole row
    ["a"],  # single letter
    ["'"],  # single apostrophe — no token
    ["end'", "mid''dle"],  # trailing + internal apostrophe runs kept
    ["line one", "one line"],  # tokens never span row boundaries
    ["naïve café UPPER lower MiXeD"],  # multi-byte chars are separators
    ["a" * 10000, "b c " * 5000],  # long runs / many tokens per row
    [None, "after null", None],
    ["punct,.;:!?(){}[]\"-_+= sep"],
]


@pytest.mark.parametrize("texts", CASES, ids=range(len(CASES)))
def test_kernel_matches_regex_spec(texts):
    assert _counts(texts) == _ref_counts(texts)


def test_sliced_array_offsets():
    """mapInArrow may hand the kernel a sliced batch — the offsets
    window and value-buffer base must be respected."""
    base = pa.array(["drop me", "keep one", "keep two", "drop too"])
    sl = base.slice(1, 2)
    t = token_counts_table(sl)
    got = dict(zip(t.column("word").to_pylist(), t.column("cnt").to_pylist()))
    assert got == {"keep": 2, "one": 1, "two": 1}


def test_documented_unicode_divergence():
    """U+0130 folds into ASCII 'i' under Unicode lowercasing (the
    expression form emits a token) but is a separator byte-wise — the
    kernel, like the reference's tolower, emits none.  This test is
    the documentation: if the kernel ever changes behavior here, the
    docstring contract must be re-examined."""
    assert _counts(["İ"]) == {}


def test_end_to_end_matches_expression_form(spark, sf_dir):
    from lab3_spark.operators.wordcount import word_count, word_count_arrow
    from lab3_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    expr_rows = word_count(docs, "text").collect()
    arrow_rows = word_count_arrow(docs, "text").collect()
    assert arrow_rows == expr_rows
    # parity stop-word mode flows through identically
    expr_p = word_count(docs, "text", mode="parity").collect()
    arrow_p = word_count_arrow(docs, "text", mode="parity").collect()
    assert arrow_p == expr_p


from hypothesis import given, settings, strategies as st

_ascii_texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=0x09, max_codepoint=0x7E),
        max_size=200,
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(_ascii_texts)
def test_kernel_matches_regex_spec_property(texts):
    """Property pin: on ARBITRARY printable-ASCII input the Arrow
    byte-level kernel equals the [a-z][a-z']* regex spec (hypothesis
    sweeps apostrophe runs, digit boundaries, whitespace shapes,
    empty rows — the hand-enumerated CASES' long tail)."""
    assert _counts(texts) == _ref_counts(texts)

"""Hypothesis property tests: the Spark tokenizer and portable hash
must agree with independent Python reference implementations on
arbitrary input (SURVEY §5.3 differential testing)."""

import hashlib
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from lab3_spark.functions.text import TOKEN_REGEX, hex_to_long, tokenize

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
            whitelist_characters="'\t\n-_",
        ),
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=12, deadline=None)
@given(TEXTS)
def test_tokenizer_matches_python_reference(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["toks"] for r in
           df.select(tokenize("text").alias("toks")).collect()]
    pat = re.compile(TOKEN_REGEX)
    for t, toks in zip(texts, got):
        assert toks == pat.findall(t.lower()), (t,)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=8))
def test_hex_fold_matches_python_int(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = [
        r["h"]
        for r in df.select(
            hex_to_long(F.substring(F.md5("s"), 1, 15)).alias("h")
        ).collect()
    ]
    for t, h in zip(texts, got):
        assert h == int(hashlib.md5(t.encode()).hexdigest()[:15], 16)

"""Tokenizer / stop-word / portable-hash golden tests (SURVEY.md §5.1)."""

import hashlib

from pyspark.sql import functions as F

from lab3_spark.functions.text import hex_to_long, is_stop_word, md5_long, tokenize
from lab3_spark.stopwords import STOP_LINE, STOP_WORDS


def tok(spark, s):
    return (
        spark.range(1)
        .select(tokenize(F.lit(s)).alias("t"))
        .collect()[0]["t"]
    )


def test_tokenizer_spec(spark):
    # letters only start tokens; apostrophes continue them; digits never
    # appear (wordCount.cpp:72-85)
    assert tok(spark, "The quick brown fox") == ["the", "quick", "brown", "fox"]
    assert tok(spark, "Don't stop believin'") == ["don't", "stop", "believin'"]
    assert tok(spark, "abc123 42nd x") == ["abc", "nd", "x"]
    assert tok(spark, "  ...  ") == []
    assert tok(spark, "a'b''c") == ["a'b''c"]
    assert tok(spark, "'leading") == ["leading"]


def test_tokenizer_tab_and_newline_split(spark):
    assert tok(spark, "a\tb\nc\rd") == ["a", "b", "c", "d"]


def test_stop_word_modes(spark):
    df = spark.createDataFrame(
        [("the",), ("hav",), ("quick",), ("abo",)], "word string"
    )
    got = df.select(
        "word",
        is_stop_word("word", "idiomatic").alias("idio"),
        is_stop_word("word", "parity").alias("par"),
    ).collect()
    by = {r["word"]: (r["idio"], r["par"]) for r in got}
    assert by["the"] == (True, True)
    # 'hav' is not in the list but IS a substring of 'having'
    assert by["hav"] == (False, True)
    assert by["quick"] == (False, False)
    # 'abo' is a substring of 'about'
    assert by["abo"] == (False, True)


def test_stop_line_is_reference_file():
    assert len(STOP_WORDS) == 182
    assert len(STOP_LINE) == 1000
    assert STOP_LINE.startswith("a about above")


def test_hex_to_long_matches_python(spark):
    samples = ["hello", "world", "", "spark", "x" * 50]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = df.select(
        "s",
        hex_to_long(F.substring(F.md5("s"), 1, 15)).alias("h"),
        md5_long("s").alias("h2"),
    ).collect()
    for r in got:
        expect = int(hashlib.md5(r["s"].encode()).hexdigest()[:15], 16)
        assert r["h"] == expect
        assert r["h2"] == expect

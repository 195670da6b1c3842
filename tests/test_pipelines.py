"""Golden + property tests for the three parity pipelines (SURVEY §5)."""

from pyspark.sql import functions as F

from lab3_spark.operators.inverted_index import inverted_index
from lab3_spark.operators.topk import top_k_words
from lab3_spark.operators.wordcount import (
    word_count,
    word_count_antijoin,
    word_counts_unfiltered,
)


def test_word_count_golden(spark, corpus):
    got = {r["word"]: r["cnt"] for r in word_count(corpus).collect()}
    # 'the'/'over'/'to'... are stop words and absent; 'quick' appears 4x
    assert got["quick"] == 4
    assert got["fox"] == 3
    assert got["dog"] == 2
    assert "the" not in got
    assert "don't" not in got  # stop word in the list
    assert got["believin'"] == 1
    # digit-split tokens
    assert got["nd"] == 1


def test_word_count_order(spark, corpus):
    rows = word_count(corpus).collect()
    keys = [(r["cnt"], r["word"]) for r in rows]
    # cnt ASC, ties word DESC (wordCount.cpp:108-110): adjacent pairs
    # must satisfy the total order
    for (c1, w1), (c2, w2) in zip(keys, keys[1:]):
        assert c1 < c2 or (c1 == c2 and w1 > w2), (keys,)


def test_parity_mode_stricter(spark, corpus):
    idio = {r["word"] for r in word_count(corpus, mode="idiomatic").collect()}
    par = {r["word"] for r in word_count(corpus, mode="parity").collect()}
    assert par <= idio
    # 'abo' survives idiomatic but dies in parity (substring of 'about')
    assert "abo" in idio and "abo" not in par


def test_antijoin_equals_inlist(spark, corpus):
    a = sorted(map(tuple, word_count(corpus).collect()))
    b = sorted(map(tuple, word_count_antijoin(corpus).collect()))
    assert a == b


def test_sum_counts_equals_token_total(spark, corpus):
    from lab3_spark.functions.text import tokenize

    total = corpus.select(
        F.sum(F.size(tokenize("text"))).alias("n")
    ).collect()[0]["n"]
    summed = word_counts_unfiltered(corpus).agg(F.sum("cnt")).collect()[0][0]
    assert summed == total


def test_topk_is_prefix_of_full(spark, corpus):
    full = word_count(corpus, ordered=False).orderBy(
        F.desc("cnt"), F.desc("word")
    ).collect()
    top3 = top_k_words(corpus, k=3).collect()
    assert [tuple(r) for r in top3] == [tuple(r) for r in full[:3]]


def test_repartition_invariance(spark, corpus):
    base = sorted(map(tuple, word_count(corpus).collect()))
    for n in (1, 4, 16):
        got = sorted(map(tuple, word_count(corpus.repartition(n)).collect()))
        assert got == base, f"repartition({n}) changed the result"


def test_inverted_index_idiomatic(spark, corpus):
    idx = {r["word"]: r["ids"] for r in inverted_index(corpus).collect()}
    assert idx["fox"] == [0, 2]
    assert idx["quick"] == [0, 4]
    # repeated word on one line is deduped
    assert idx["dog"] == [0, 2]
    assert "the" not in idx


def test_inverted_index_parity_order(spark, corpus):
    rows = inverted_index(corpus, mode="parity").collect()
    # rows ordered by first occurrence (min doc id) — invert.cpp:107-109
    firsts = [r["first_id"] for r in rows]
    assert firsts == sorted(firsts)
    by = {r["word"]: r["ids"] for r in rows}
    assert by["dog"] == [0, 2]


def test_tokens_match_spec_property(spark, sf_dir):
    import re

    from lab3_spark.functions.text import tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(F.explode(tokenize("text")).alias("w")).distinct().collect()
    pat = re.compile(r"^[a-z][a-z']*$")
    assert words, "corpus produced no tokens"
    for r in words:
        assert pat.match(r["w"]), r["w"]

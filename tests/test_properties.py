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


EDGES = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


@settings(max_examples=6, deadline=None)
@given(EDGES)
def test_connected_components_matches_union_find(spark, edges):
    """Spark min-label propagation == a Python union-find reference on
    arbitrary small graphs."""
    from lab3_spark.operators.components import connected_components

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # canonical: min node id per component
    nodes = {n for e in edges for n in e}
    expected = {}
    roots: dict[int, int] = {}
    for n in sorted(nodes):
        r = find(n)
        roots.setdefault(r, n)  # first (= min) node seen per root
        expected[n] = roots[r]

    df = spark.createDataFrame(list(edges), "src long, dst long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(st.integers(1, 9999).map(lambda f: f / 10000))
def test_hash_sample_fraction_is_threshold_cut(spark, fraction):
    """Deterministic sampling: the sample for fraction f is exactly the
    ids whose hash lands under the threshold — verified against a
    driver-side Python recomputation of the same md5 arithmetic."""
    from lab3_spark.operators.sampling import SAMPLE_MOD, hash_sample

    df = spark.range(300).select(F.col("id").alias("doc_id"))
    got = {r["doc_id"] for r in hash_sample(df, "doc_id", fraction).collect()}
    want = {
        i
        for i in range(300)
        if int(hashlib.md5(f"sample|{i}".encode()).hexdigest()[:15], 16)
        % SAMPLE_MOD
        < int(fraction * SAMPLE_MOD)
    }
    assert got == want

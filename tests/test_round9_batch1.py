"""Round-9 additions, part 1: the four ADVICE-r8 fixes pinned by
tests — BPE-oracle merge exhaustion, missing incremental stores raising
the Python contract, the pinned doc_id pair key, and the packing
fragmentation curve's window-free offsets."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- bpe exhaustion --


def test_bpe_oracle_survives_merge_exhaustion(spark, tmp_path):
    """ADVICE r8: a corpus whose vocabulary FULLY merges before round
    k used to empty the oracle's seg{r} chain via the cross join
    (empty b{r} -> empty seg{r} -> NULL totals) while Spark's
    _bpe_loop breaks and keeps the last segmentation.  Guarded now
    with the LEFT JOIN the grouped variant always had — pin the two
    engines agree on a tiny fully-mergeable corpus ("ab ab" has one
    mergeable pair; k=8 exhausts after round 1)."""
    import duckdb

    from lab3_spark.operators.textstats import bpe_apply_compression
    from lab3_spark.queries_catalog import _duck_bpe_compression_sql

    docs = spark.createDataFrame(
        [("d1", "ab ab ab"), ("d2", "ab cd")],
        "doc_id string, text string",
    )
    got = bpe_apply_compression(docs, k=8).collect()[0].asDict()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES"
        " ('d1', 'ab ab ab'), ('d2', 'ab cd'))"
        " t(doc_id, text)"
    )
    want = dict(
        zip(
            [d[0] for d in con.description]
            if (con.execute(_duck_bpe_compression_sql(8)) and con.description)
            else [],
            con.fetchone(),
        )
    )
    assert got == want
    # merges exhausted: only 2 distinct pairs exist ('a b' in 'ab',
    # 'c d' in 'cd'), so n_merges < 8 and totals are non-NULL
    assert got["n_merges"] < 8
    assert got["total_symbols"] is not None


# ------------------------------------- missing incremental stores --


def test_latest_ranks_missing_store_raises_python_error(spark, tmp_path):
    """ADVICE r8: latest_ranks on a store that was never written must
    raise the documented Python FileNotFoundError, not a raw py4j
    Java FileNotFoundException from fs.listStatus."""
    from lab3_spark.streaming.incremental_pagerank import latest_ranks

    with pytest.raises(FileNotFoundError, match="no rank versions"):
        latest_ranks(spark, str(tmp_path / "never_written"))


def test_latest_cands_missing_store_raises_python_error(spark, tmp_path):
    from lab3_spark.streaming.incremental_lsh_index import latest_cands

    with pytest.raises(FileNotFoundError, match="no candidate versions"):
        latest_cands(spark, str(tmp_path / "never_written"))


# --------------------------------------------- pinned pair id key --


def test_split_leakage_ops_pin_doc_id():
    """ADVICE r8: the split-leakage operators' pair machinery keys on
    doc_id; the removed id_col parameter must STAY removed (passing
    any other column would silently join pair ids against a different
    column's values)."""
    import inspect

    from lab3_spark.operators.dedup import (
        decontaminate_train,
        split_leakage_neardup,
    )

    assert "id_col" not in inspect.signature(split_leakage_neardup).parameters
    assert "id_col" not in inspect.signature(decontaminate_train).parameters


# ------------------------------------- packing curve window shape --


def test_packing_curve_has_no_pergroup_window(spark, sf_dir):
    """ADVICE r8: the 'before' offsets must come from the ranged
    grouped-running-sum machinery, not Window.partitionBy(grp) — a
    skewed source would otherwise move entirely to one partition.
    Pin: no window partitioned by the group column anywhere in the
    optimized plan (the ranged machinery windows only over _gos/_pid
    metadata keys)."""
    from lab3_spark.queries_catalog import QUERIES

    import re

    df = QUERIES["packing_fragmentation_curve"](spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # inside windowspecdefinition(...), partition keys print bare
    # ("grp#477,") while order keys carry a direction ("grp#477 ASC");
    # the ranged machinery may legitimately ORDER its metadata-scale
    # offsets window by grp, but must never PARTITION data by it
    for spec in re.findall(r"windowspecdefinition\(([^)]*)", optimized):
        assert not re.search(r"grp#\d+,", spec), spec


def test_packing_curve_values_unchanged_by_offset_rewrite(spark):
    """The rewrite is plan-only: hand-check the curve on a corpus
    where fragments are computable by eye.  Group g1 docs (3,5,4
    tokens in doc_id order) at budget 4: offsets 0,3,8 ->
    fragments 1,2,1; bins ceil(12/4)=3; one split doc."""
    docs = spark.createDataFrame(
        [
            ("a", "t1 t2 t3", "g1"),
            ("b", "u1 u2 u3 u4 u5", "g1"),
            ("c", "v1 v2 v3 v4", "g1"),
        ],
        "doc_id string, text string, source string",
    )
    from lab3_spark.operators.sampling import packing_fragmentation_curve

    row = (
        packing_fragmentation_curve(docs, budgets=(4,))
        .collect()[0]
        .asDict()
    )
    assert row == {
        "budget": 4,
        "n_docs": 3,
        "n_split_docs": 1,
        "n_fragments": 4,
        "frag_rate_fp": 333333,
        "n_bins": 3,
        "fill_rate_fp": 1000000,
    }


# --------------------------------- exact-substring span dedup (r9) --


def test_exact_substring_spans_planted(spark):
    """Two documents share a planted verbatim 12-token span; a third
    is all-unique.  With n=3, min_span=10: exactly one maximal span
    per sharing doc covering the planted range, nothing for the
    unique doc."""
    from lab3_spark.operators.dedup import exact_substring_spans

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = spark.createDataFrame(
        [
            (1, "xx1 yy1 " + span + " zz1"),
            (2, span + " ww2 vv2 uu2"),
            (3, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        map(
            tuple,
            exact_substring_spans(docs, n=3, min_span_tokens=10).collect(),
        )
    )
    # doc 1: span occupies token positions 2..13 (end exclusive 14)
    # doc 2: positions 0..11 (end exclusive 12); both 12 tokens long
    assert rows == [(1, 2, 14, 12), (2, 0, 12, 12)]


def test_exact_substring_spans_within_doc_repetition_counts(spark):
    """A document repeating its OWN block is dedup-worthy (Lee et al.
    count any corpus repetition, including within one doc)."""
    from lab3_spark.operators.dedup import exact_substring_spans

    block = "r1 r2 r3 r4 r5"
    docs = spark.createDataFrame(
        [(7, block + " mid1 mid2 " + block)],
        "doc_id long, text string",
    )
    rows = sorted(
        map(
            tuple,
            exact_substring_spans(docs, n=5, min_span_tokens=5).collect(),
        )
    )
    assert rows == [(7, 0, 5, 5), (7, 7, 12, 5)]


def test_exact_substring_spans_merges_overlapping_runs(spark):
    """Chained duplicated grams fold into ONE maximal span, not one
    row per gram: two docs sharing an 8-token span with n=3 produce a
    single span row each (6 chained grams), never 6 rows."""
    from lab3_spark.operators.dedup import exact_substring_spans

    span = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = spark.createDataFrame(
        [(1, span), (2, "pre " + span)],
        "doc_id long, text string",
    )
    rows = sorted(
        map(
            tuple,
            exact_substring_spans(docs, n=3, min_span_tokens=8).collect(),
        )
    )
    assert rows == [(1, 0, 8, 8), (2, 1, 9, 8)]


# ------------------------------------- stupid-backoff bigram LM (r9) --


def test_bigram_backoff_hand_computed(spark):
    """Hand-check the stupid-backoff scoring on a corpus where the
    clean slice is forced by construction: one Gopher-passing doc
    (60 alpha words, sane stats) trains the LM; a two-token doc is
    scored with one seen bigram."""
    import math

    from lab3_spark.operators.textstats import (
        bigram_backoff_surprisal,
        gopher_quality,
    )

    vocab = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
        "golf", "hotel", "india", "juliet", "kilo", "lima",
    ]
    # 60 tokens, 12 distinct alpha words (top ratio 5/60 passes the
    # 0.2 rule; the letters-only tokenizer keeps them whole)
    clean_text = " ".join(vocab[i % 12] for i in range(60))
    docs = spark.createDataFrame(
        [(1, clean_text), (2, "alpha bravo")],
        "doc_id long, text string",
    )
    gp = {
        r["doc_id"]: r["gopher_pass"]
        for r in gopher_quality(docs).collect()
    }
    assert gp[1] and not gp[2], "construction: doc 1 clean, doc 2 not"
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_surprisal_fp"])
        for r in bigram_backoff_surprisal(docs).collect()
    }
    # clean slice counts: tokens of doc 1 only
    toks = clean_text.split()
    from collections import Counter

    uni = Counter(toks)
    big = Counter(zip(toks, toks[1:]))
    n, v = sum(uni.values()), len(uni)

    def s_fp(w1, w2):
        if (w1, w2) in big:
            p = math.log(uni[w1] / big[(w1, w2)])
        else:
            p = math.log((n + v + 1) * 2.5 / (uni.get(w2, 0) + 1))
        return math.floor(p / math.log(2) * 1_000_000)

    # doc 2 = one bigram ("alpha", "bravo"), seen in clean
    assert got[2] == (1, s_fp("alpha", "bravo"))
    expected_total = sum(s_fp(a, b) for a, b in zip(toks, toks[1:]))
    assert got[1] == (59, expected_total // 59)


def test_bigram_backoff_short_docs_have_no_row(spark):
    """< 2 tokens -> no bigram -> no row (both engines)."""
    from lab3_spark.operators.textstats import bigram_backoff_surprisal

    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two tokens")],
        "doc_id long, text string",
    )
    assert [
        r["doc_id"] for r in bigram_backoff_surprisal(docs).collect()
    ] == [3]


# --------------------------------------------- packing bound (r9) --


def test_packing_bfd_bound_hand_computed(spark):
    """Two groups, 10 and 6 tokens, budget 8: per-group bins
    ceil(10/8) + ceil(6/8) = 3; capacity bound ceil(16/8) = 2;
    one extra bin of per-group tail waste."""
    from lab3_spark.operators.sampling import packing_bfd_bound

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j", "g1"),
            (2, "k l m n o p", "g2"),
        ],
        "doc_id long, text string, source string",
    )
    row = packing_bfd_bound(docs, budgets=(8,)).collect()[0].asDict()
    assert row == {
        "budget": 8,
        "total_tokens": 16,
        "n_bins": 3,
        "lb_bins": 2,
        "extra_bins": 1,
        "efficiency_fp": 666666,
    }


def test_packing_bound_consistent_with_fragmentation_curve(spark, sf_dir):
    """The two ladders must tell one story: identical n_bins per
    budget (both derive from the same offset model)."""
    from lab3_spark.queries_catalog import QUERIES

    curve = {
        r["budget"]: r["n_bins"]
        for r in QUERIES["packing_fragmentation_curve"](
            spark, sf_dir
        ).collect()
    }
    bound = {
        r["budget"]: r["n_bins"]
        for r in QUERIES["packing_bfd_bound"](spark, sf_dir).collect()
    }
    assert curve == bound


# ------------------------------------ span-removal accounting (r9) --


def test_span_removal_unions_overlapping_islands(spark):
    """Two duplicated-gram islands separated by ONE unique gram
    position overlap in token space (gap < n): doc 1's spans [0,3) and
    [2,5) must union to 5 removed tokens, not sum to 6.  Corpus total:
    11 of 14 tokens removed — a naive span_tokens sum would claim 12
    and push the fraction past 10^6."""
    from lab3_spark.operators.dedup import span_removal_by_source

    docs = spark.createDataFrame(
        [
            (1, "p q r s t", "g1"),
            (2, "p q r", "g1"),
            (3, "r s t", "g1"),
            (4, "u v w", "g1"),
        ],
        "doc_id long, text string, source string",
    )
    row = (
        span_removal_by_source(docs, n=3, min_span_tokens=3)
        .collect()[0]
        .asDict()
    )
    assert row == {
        "source": "g1",
        "n_docs": 4,
        "n_flagged": 3,
        "total_tokens": 14,
        "removed_tokens": 11,
        "removed_frac_fp": 11 * 1_000_000 // 14,
    }


def test_bigram_ppl_filter_keeps_scored_thirds(spark, sf_dir):
    """Per-source totals must reconcile with the bucket frame: kept =
    head+middle scored docs, n_docs = every doc (unscored short docs
    count in the denominator only)."""
    from lab3_spark.operators.textstats import (
        bigram_ppl_buckets,
        bigram_ppl_filter_by_source,
    )
    from lab3_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = bigram_ppl_filter_by_source(docs).collect()
    buckets = bigram_ppl_buckets(docs)
    n_hm = buckets.where("ppl_bucket != 'tail'").count()
    assert sum(r["n_kept"] for r in out) == n_hm
    assert sum(r["n_docs"] for r in out) == docs.count()
    assert all(0 <= r["kept_rate_fp"] <= 1_000_000 for r in out)


# --------------------------------------- PassJoin edit-distance (r9) --


def _ed(a: str, b: str) -> int:
    """Plain Wagner-Fischer reference DP."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def test_passjoin_matches_bruteforce_on_random_strings(spark):
    """PassJoin candidate generation must be EXACT: every unordered
    pair at edit distance <= 2 over 180 fixed-seed random strings
    (alphabet of 4, lengths 0-12 — includes empties, singletons, and
    sub-segment-length strings) equals the brute-force DP's pair set,
    with identical distances."""
    import random

    from lab3_spark.operators.dedup import edit_distance_value_pairs

    rng = random.Random(421)
    vals = list(
        {
            "".join(
                rng.choice("abcd") for _ in range(rng.randint(0, 12))
            )
            for _ in range(180)
        }
    )
    want = {}
    for i, x in enumerate(vals):
        for y in vals[i + 1 :]:
            dd = _ed(x, y)
            if dd <= 2:
                a, b = sorted((x, y))
                want[(a, b)] = dd
    got = {
        (r["val_a"], r["val_b"]): r["edit_dist"]
        for r in edit_distance_value_pairs(
            spark.createDataFrame([(v,) for v in vals], "s string"), "s"
        ).collect()
    }
    assert got == want


def test_passjoin_agrees_with_type_crossjoin_on_part_names(spark, sf_dir):
    """The two rungs of the edit-distance ladder must agree: PassJoin
    over the distinct part names == the |V|² type-table compare that
    fuzzy_part_names uses."""
    from lab3_spark.operators.dedup import edit_distance_value_pairs
    from lab3_spark.sources.tables import load_table

    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    banded = F.levenshtein(F.col("na.p_name"), F.col("nb.p_name"), 2)
    want = {
        (r["val_a"], r["val_b"]): r["edit_dist"]
        for r in names.alias("na")
        .crossJoin(F.broadcast(names.alias("nb")))
        .where(
            (banded >= 0) & (F.col("na.p_name") < F.col("nb.p_name"))
        )
        .select(
            F.col("na.p_name").alias("val_a"),
            F.col("nb.p_name").alias("val_b"),
            banded.alias("edit_dist"),
        )
        .collect()
    }
    got = {
        (r["val_a"], r["val_b"]): r["edit_dist"]
        for r in edit_distance_value_pairs(names, "p_name").collect()
    }
    assert got == want

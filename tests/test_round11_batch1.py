"""Round-11 gates: LSH band planner (+ measured quality), contamination
severity (max-span), and the A4 one_combiner facade gate."""

import math

import pytest
from pyspark.sql import functions as F

from lab3_spark.operators.dedup import (
    LSH_PLAN_COMBOS,
    N_HASHES,
    _scurve_miss_ppm,
    contamination_max_span,
    lsh_band_plan,
    lsh_planned_blocking_quality,
)


# ---------------------------------------------------------------------------
# exact-integer S-curve
# ---------------------------------------------------------------------------


def test_plan_combos_factor_the_hash_budget():
    assert all(b * r == N_HASHES for b, r in LSH_PLAN_COMBOS)
    assert len({b for b, _ in LSH_PLAN_COMBOS}) == len(LSH_PLAN_COMBOS)


def test_scurve_boundaries():
    for b, r in LSH_PLAN_COMBOS:
        # s = 0: never caught; s = 1: always caught (identical sigs)
        assert _scurve_miss_ppm(0, b, r) == 1_000_000
        assert _scurve_miss_ppm(10, b, r) == 0


def test_scurve_matches_float_reference_within_one_ppm():
    for b, r in LSH_PLAN_COMBOS:
        for p in range(11):
            exact = _scurve_miss_ppm(p, b, r)
            ref = math.floor(1e6 * (1 - (p / 10) ** r) ** b)
            # floor of exact rational vs floor of float can differ by
            # 1 ulp's worth at most — the operator's claim is the
            # INTEGER value is the contract, float is just a sanity ref
            assert abs(exact - ref) <= 1, (b, r, p, exact, ref)


def test_scurve_monotone_in_similarity():
    # more similar pairs are never MORE likely to be missed
    for b, r in LSH_PLAN_COMBOS:
        vals = [_scurve_miss_ppm(p, b, r) for p in range(11)]
        assert vals == sorted(vals, reverse=True)


# ---------------------------------------------------------------------------
# planner over a corpus with a known duplicate structure
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dup_corpus(spark_mod):
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    rows = [(i, base) for i in range(4)]  # 4 exact copies → 6 true pairs
    rows += [
        (10, "one two three four five six seven eight nine ten"),
        (11, "completely different words about nothing shared here at all"),
    ]
    return spark_mod.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def spark_mod(spark):
    return spark


def test_lsh_band_plan_shape_and_argmin(dup_corpus):
    plan = lsh_band_plan(dup_corpus).collect()
    assert len(plan) == len(LSH_PLAN_COMBOS)
    assert sum(r["is_best"] for r in plan) == 1
    for r in plan:
        assert r["cost"] == r["fp_weight"] + r["fn_weight"]
        assert r["fp_weight"] >= 0 and r["fn_weight"] >= 0
        assert r["n_bands"] * r["n_rows"] == N_HASHES
    # exact copies land in the 1.0 bucket where miss_ppm = 0 for every
    # banding, so FN from them is zero; with no near-miss mass the
    # all-rows banding (b=1) has zero FP too — cost 0 must win a tie
    # toward fewer bands
    best = [r for r in plan if r["is_best"] == 1][0]
    assert best["fn_weight"] == 0


def test_lsh_planned_blocking_quality_catches_exact_copies(dup_corpus):
    row = lsh_planned_blocking_quality(dup_corpus).collect()[0]
    assert row["n_bands"] * row["n_rows"] == N_HASHES
    assert row["n_true_pairs"] == 6  # C(4,2) identical docs
    assert row["n_caught"] == 6  # identical sigs share every band
    assert row["pc_fp"] == 1_000_000
    assert 0 <= row["rr_fp"] <= 1_000_000


# ---------------------------------------------------------------------------
# contamination severity
# ---------------------------------------------------------------------------


def _words(n, prefix):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_contamination_max_span_planted_blocks(spark):
    leak20 = _words(20, "leak")
    leak6 = _words(6, "small")
    bench = spark.createDataFrame(
        [(100, f"{leak20} {_words(30, 'evalpad')} {leak6}")],
        "doc_id long, text string",
    )
    # train doc: clean prefix, the 20-token block, clean gap, the
    # 6-token block, clean tail — two separate merged spans
    train = spark.createDataFrame(
        [
            (
                1,
                f"{_words(8, 'pre')} {leak20} {_words(9, 'mid')} "
                f"{leak6} {_words(7, 'post')}",
            ),
            (2, _words(25, "clean")),
        ],
        "doc_id long, text string",
    )
    out = contamination_max_span(train, bench).collect()
    assert [r["doc_id"] for r in out] == [1]  # clean doc absent
    r = out[0]
    assert r["n_spans"] == 2
    assert r["max_span_tokens"] == 20
    assert r["overlap_tokens"] == 26
    assert r["len_bucket"] == 20


def test_contamination_max_span_merges_overlapping_islands(spark):
    # one eval 9-token run: train hits at positions whose 5-gram
    # islands overlap in token space must merge into ONE span
    blk = _words(9, "x")
    bench = spark.createDataFrame([(0, blk)], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, f"{_words(5, 'a')} {blk} {_words(5, 'z')}")],
        "doc_id long, text string",
    )
    r = contamination_max_span(train, bench).collect()[0]
    assert r["n_spans"] == 1
    assert r["max_span_tokens"] == 9
    assert r["overlap_tokens"] == 9
    assert r["len_bucket"] == 0  # 9 DIV 10 * 10


def test_contamination_max_span_empty_when_disjoint(spark):
    bench = spark.createDataFrame(
        [(0, _words(10, "e"))], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [(1, _words(10, "t"))], "doc_id long, text string"
    )
    assert contamination_max_span(train, bench).count() == 0


def test_contamination_ranked_worst_first(spark):
    big, small = _words(15, "b"), _words(7, "s")
    bench = spark.createDataFrame(
        [(0, f"{big} {_words(20, 'pad')} {small}")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, f"{_words(6, 'p')} {small} {_words(6, 'q')}"),
            (2, f"{_words(6, 'r')} {big} {_words(6, 'w')}"),
        ],
        "doc_id long, text string",
    )
    out = contamination_max_span(train, bench).collect()
    assert [r["doc_id"] for r in out] == [2, 1]
    assert out[0]["max_span_tokens"] == 15
    assert out[1]["max_span_tokens"] == 7


# ---------------------------------------------------------------------------
# one_combiner facade
# ---------------------------------------------------------------------------


def test_one_combiner_vocab_lengths(spark):
    from lab3_spark.operators.mapreduce import vocab_lengths_as_mapreduce

    df = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry")],
        "doc_id long, text string",
    )
    out = vocab_lengths_as_mapreduce(df).collect()
    assert [(r["word"], r["word_len"]) for r in out] == [
        ("apple", 5),
        ("banana", 6),
        ("cherry", 6),
    ]


def test_one_combiner_registry_is_last():
    from lab3_spark.operators.mapreduce import COMBINERS

    c = COMBINERS["one"](F.col("v"))
    assert "last" in str(c).lower()


# ---------------------------------------------------------------------------
# exact line dedup (RefinedWeb keep-first)
# ---------------------------------------------------------------------------


def test_line_dedup_keep_first_cross_doc(spark):
    from lab3_spark.operators.dedup import apply_line_dedup

    df = spark.createDataFrame(
        [
            (1, "unique alpha\ncookie banner text\nunique beta"),
            (2, "cookie banner text\nunique gamma"),
            (3, "unique delta"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in apply_line_dedup(df, delimiter="\n").collect()}
    assert out[1]["clean_text"] == (
        "unique alpha\ncookie banner text\nunique beta"
    )
    assert out[1]["removed_lines"] == 0  # first occurrence kept
    assert out[2]["clean_text"] == "unique gamma"
    assert out[2]["removed_lines"] == 1
    assert out[3]["removed_lines"] == 0


def test_line_dedup_within_doc_and_empty_survivor(spark):
    from lab3_spark.operators.dedup import apply_line_dedup

    df = spark.createDataFrame(
        [
            (1, "same line\nsame line\nsame line"),
            (2, "same line"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in apply_line_dedup(df, delimiter="\n").collect()}
    # doc 1 keeps only its first occurrence (corpus-global rule)
    assert (out[1]["n_lines"], out[1]["kept_lines"]) == (3, 1)
    assert out[1]["clean_text"] == "same line"
    # doc 2's only line duplicates doc 1's — survives as empty string
    assert (out[2]["kept_lines"], out[2]["clean_text"]) == (0, "")


def test_line_dedup_accounting_consistent(spark, sf_dir):
    import os

    from lab3_spark.operators.dedup import apply_line_dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = apply_line_dedup(docs, block_tokens=32)
    from pyspark.sql import functions as F

    bad = out.where(
        (F.col("kept_lines") + F.col("removed_lines") != F.col("n_lines"))
        | (F.col("kept_lines") < 0)
        | (F.col("removed_lines") < 0)
    )
    assert bad.count() == 0
    # corpus-wide: kept lines == number of DISTINCT line texts
    from lab3_spark.operators.dedup import paragraph_frame

    n_distinct = (
        paragraph_frame(docs, block_tokens=32)
        .select("para_text")
        .distinct()
        .count()
    )
    total_kept = out.agg(F.sum("kept_lines")).collect()[0][0]
    assert total_kept == n_distinct


def test_round11_operators_empty_corpus_contract(spark):
    """Empty documents frame: the APPLY/severity/facade operators
    return EMPTY frames (no crashes, no NULL rows); the planner still
    emits its 5 factorizations with all-zero weights and a
    deterministic tie-break winner (b=1); the measured-quality
    companion inherits _blocking_metrics' documented empty-input
    shape (vacuously-perfect pc/rr, NULL totals) shared with
    dedup_blocking_quality."""
    from lab3_spark.operators.dedup import (
        apply_line_dedup,
        contamination_max_span,
        lsh_band_plan,
        lsh_planned_blocking_quality,
    )
    from lab3_spark.operators.mapreduce import vocab_lengths_as_mapreduce

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert apply_line_dedup(empty, block_tokens=32).count() == 0
    assert contamination_max_span(empty, empty).count() == 0
    assert vocab_lengths_as_mapreduce(empty).count() == 0
    plan = lsh_band_plan(empty).collect()
    assert len(plan) == 5
    assert all(r["cost"] == 0 for r in plan)
    assert [r["is_best"] for r in plan] == [1, 0, 0, 0, 0]  # tie → b=1
    q = lsh_planned_blocking_quality(empty).collect()[0]
    assert (q["pc_fp"], q["rr_fp"]) == (1_000_000, 1_000_000)


def test_scurve_refuses_sub_ppm_budget():
    with pytest.raises(ValueError, match="6-hash budget"):
        _scurve_miss_ppm(5, 1, 4)


def test_band_plan_refuses_off_grid_threshold(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="similarity grid"):
        lsh_band_plan(df, t10=11)

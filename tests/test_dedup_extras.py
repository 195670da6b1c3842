"""Fellegi–Sunter linkage scoring (operators/dedup.py): structural and
semantic invariants on real testdata — the value parity itself is the
DuckDB oracle gate (`linkage_fs_scores`)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fs_rows(spark, sf_dir):
    from lab3_spark.operators.dedup import fellegi_sunter_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return fellegi_sunter_scores(docs).collect()


def test_fs_top20_shape_and_rank_order(fs_rows):
    assert len(fs_rows) == 20
    assert [r["rnk"] for r in fs_rows] == list(range(1, 21))
    scores = [r["score_fp"] for r in fs_rows]
    assert scores == sorted(scores, reverse=True)
    for r in fs_rows:
        assert 0 <= r["n_agree"] <= 3
        assert r["doc_a"] < r["doc_b"]


def test_fs_more_agreement_never_scores_below_fewer(fs_rows):
    """With positive evidential weights (m > u on this corpus: verified
    dups agree far more often than random pairs), a pair agreeing on a
    SUPERSET of fields outscores one agreeing on a subset.  Weaker but
    checkable without field identity: the best score at each n_agree
    level is non-decreasing in n_agree (over levels present)."""
    best = {}
    for r in fs_rows:
        best[r["n_agree"]] = max(
            best.get(r["n_agree"], r["score_fp"]), r["score_fp"]
        )
    levels = sorted(best)
    assert all(
        best[a] <= best[b] for a, b in zip(levels, levels[1:])
    ), best


def test_fs_weight_templates_are_finite_on_degenerate_truth(spark):
    """Laplace smoothing contract: an EMPTY truth set (no verified
    near-dups — m_den = 0, every m_num = 0) must still yield finite
    weights and a non-null score for every candidate pair."""
    from lab3_spark.operators.dedup import fellegi_sunter_scores

    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "web", 36),
        (1, "one two three four five six seven", "en", "web", 33),
        (2, "uno dos tres cuatro cinco seis", "es", "books", 30),
        (3, "aaa bbb ccc ddd eee fff ggg hhh", "de", "code", 31),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    )
    out = fellegi_sunter_scores(docs).collect()
    # tiny distinct corpus: candidates may be empty (no shared bands) —
    # the contract under test is "no null/NaN score", not row counts
    for r in out:
        assert r["score_fp"] is not None

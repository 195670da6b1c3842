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

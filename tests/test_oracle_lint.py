"""Every oracle must type-check under the driver's pandas bridge.

Guards against the round-2 HUGEINT artifact: numerically identical
results hashing differently because DuckDB's int128 materializes as
float64.  DESCRIBE-only — needs DuckDB + the parquet schemas, no Spark.
"""

import os

import pytest

from tools.oracle_lint import lint_oracles


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001"),
    reason="driver testdata not present",
)
def test_no_hugeint_or_decimal_oracle_columns():
    problems = lint_oracles("/root/testdata/sf0.001")
    assert problems == [], "\n".join(problems)


def test_driver_window_leads_with_round7_priorities():
    """Round-7 curation contract: the window leads with (1) the 35
    round-6 gates that never received a driver row, (2) the 3 sketch
    gates reshaped this round to bounded-error oracled contracts,
    (3) the 8 new round-7 gates — everything needing a FIRST or FRESH
    driver row sits inside the 50-slot window."""
    import __spark_entry__ as entrymod

    order = list(entrymod.queries())
    assert order[0] == "mmr_diverse_select"
    assert set(order[35:38]) == {
        "events_approx_dau",
        "events_hll_daily_merge",
        "events_value_percentiles_approx",
    }
    new_r7 = {
        "dedup_simhash_blocking",
        "dedup_cross_source",
        "dataset_split_manifest",
        "quality_kappa",
        "vocab_coverage_curve",
        "bpe_merge_candidates",
        "source_vocab_overlap",
        "orders_winsorized_stats",
        "orders_mannwhitney",
        "source_length_ks",
        "corpus_ngram_novelty",
        "quality_pr_curve",
    }
    assert set(order[38:50]) == new_r7
    # every pinned name must exist (typo guard is import-time, but the
    # window size contract lives here)
    assert len(set(order[:50])) == 50


def test_no_gate_outside_window_lacks_driver_row():
    """Window-budget discipline (ADVICE r6 item 7): a gate the driver
    has NEVER checked must sit inside the 50-slot window, else it can
    never earn a CORRECTNESS row.  Gates beyond slot 50 must each have
    at least one row in some archived CORRECTNESS_r0*.json."""
    import glob
    import json

    import __spark_entry__ as entrymod

    checked: set[str] = set()
    for f in glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r0*.json")
    ):
        checked.update(json.load(open(f)))
    if not checked:
        pytest.skip("no archived CORRECTNESS files")
    order = list(entrymod.queries())
    never_checked_beyond_window = [
        n for n in order[50:] if n not in checked
    ]
    assert never_checked_beyond_window == [], (
        "these gates can never earn a driver CORRECTNESS row from "
        f"beyond slot 50: {never_checked_beyond_window}"
    )


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE entry must be a registered query — a
    rename that orphans a headline name should fail here, not in the
    driver's bench run."""
    import bench

    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert missing == [], missing

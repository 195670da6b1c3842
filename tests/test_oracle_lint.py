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


def test_driver_window_leads_with_round8_priorities():
    """Round-8 curation contract: the window leads with (1) the new
    round-8 gates (no driver row anywhere), (2) the 3 gates whose
    oracle SQL gained ADVICE-r7 guards, (3) the §2 parity core
    re-confirmations, then the plan-changed gates from the
    one_window_partition sweep — everything needing a FIRST or FRESH
    driver row sits inside the 50-slot window."""
    import __spark_entry__ as entrymod
    from lab3_spark.queries_catalog import ROUND8_NEW

    order = list(entrymod.queries())
    n_new = len(ROUND8_NEW)
    assert order[:n_new] == ROUND8_NEW
    assert order[n_new : n_new + 3] == [
        "dedup_blocking_quality",
        "orders_mannwhitney",
        "source_length_ks",
    ]
    assert order[n_new + 3 : n_new + 8] == [
        "word_count",
        "top50_words",
        "inverted_index",
        "word_count_parity",
        "inverted_index_parity",
    ]
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

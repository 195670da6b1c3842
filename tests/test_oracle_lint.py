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


def test_driver_window_leads_with_round6_priorities():
    """Round-6 curation contract: after round 5 every oracled query is
    cumulatively driver-green, so the window leads with (1) the gate
    whose output changed this round (dataset_card checksum reshape),
    (2) the three never-windowed rows-only sketch gates, (3) the new
    round-6 gates — everything needing a FIRST or FRESH driver row
    sits inside the 50-slot window."""
    import __spark_entry__ as entrymod

    order = list(entrymod.queries())
    assert order[0] == "dataset_card"
    assert set(order[1:4]) == {
        "events_approx_dau",
        "events_hll_daily_merge",
        "events_value_percentiles_approx",
    }
    new_r6 = {
        "events_kmv_daily_users",
        "dedup_bloom_prefilter",
        "events_attribution_window",
        "dedup_reassemble",
        "phrase_search_docs",
        "events_ohlc_hourly",
        "events_cms_verified_hh",
        "corpus_snapshot_diff",
    }
    assert new_r6 <= set(order[4 : 4 + len(new_r6)])
    # every pinned name must exist (typo guard is import-time, but the
    # window size contract lives here)
    assert len(set(order[:50])) == 50


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE entry must be a registered query — a
    rename that orphans a headline name should fail here, not in the
    driver's bench run."""
    import bench

    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert missing == [], missing

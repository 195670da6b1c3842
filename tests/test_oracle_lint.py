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


def test_driver_window_leads_with_round12_priorities():
    """Round-12 curation contract: the window leads with (1) the
    thirteen new round-12 gates (no driver row anywhere), then (2) the
    16 changed-operator re-confirmations (the r11 handoff's MUST-HEAD
    six ANN gates + three skew/Expand rewrites, plus this round's BPE
    argmax / joiner / pack_sequences / grouped-rank touches — all
    oracle-verified identical this round), then (3) the oldest-green
    refills: the remaining r5 era minus its twelve displaced
    stragglers (events_value_histogram, grouped_minmax_normalize,
    hybrid_retrieval_rrf, kmeans_centroids, multimodal_byte_chunks,
    orc_roundtrip_events, orders_priority_unpivot, orders_scd_upsert,
    ppr_seed_proximity, streaming_cms_heavy_hitters,
    streaming_curated_ingest, streaming_sliding_10m — slots 51-62,
    they head the r13 refills)."""
    import __spark_entry__ as entrymod
    from lab3_spark.queries_catalog import ROUND12_CHANGED, ROUND12_NEW

    order = list(entrymod.queries())
    head = ROUND12_NEW + ROUND12_CHANGED
    assert order[: len(head)] == head
    # oldest-green refill begins immediately after the changed gates
    assert order[len(head)] == "ann_sq8_top5"
    assert order[49] == "events_top_type_per_hour"
    assert order[50] == "events_value_histogram"  # r13 refill head
    assert order[51] == "grouped_minmax_normalize"
    assert order[52] == "hybrid_retrieval_rrf"
    assert order[53] == "kmeans_centroids"
    assert order[54] == "multimodal_byte_chunks"
    assert order[55] == "orc_roundtrip_events"
    assert order[56] == "orders_priority_unpivot"
    assert order[57] == "orders_scd_upsert"
    assert order[58] == "ppr_seed_proximity"
    assert order[59] == "streaming_cms_heavy_hitters"
    assert order[60] == "streaming_curated_ingest"
    assert order[61] == "streaming_sliding_10m"
    # every pinned name must exist (typo guard is import-time, but the
    # window size contract lives here)
    assert len(set(order[:50])) == 50


def test_no_gate_outside_window_lacks_driver_row():
    """Window-budget discipline (ADVICE r6 item 7): a gate the driver
    has NEVER checked must sit inside the 50-slot window, else it can
    never earn a CORRECTNESS row.  Gates beyond slot 50 must each have
    at least one row in some archived CORRECTNESS_rN.json."""
    import glob
    import json

    import __spark_entry__ as entrymod

    checked: set[str] = set()
    # ADVICE r10 class: 'r0*' never matches round 10+ — glob all rounds
    for f in glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")
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


#: the complete standing bench exclusion list (BASELINE.md
#: §bench-coverage) — the StreamingQuery gates whose wall-clock is
#: checkpoint machinery (dataflow priced via batch twins), the two
#: Python-worker-setup gates, and the byte-parity twin priced via its
#: sibling.  Counts are derived below (ADVICE r9: hard-coded counts
#: drifted twice).  Extend ONLY with a rationale in BASELINE.md.
BENCH_EXCLUSIONS = {
    "streaming_tumbling_5min",
    "streaming_sliding_10m",
    "streaming_sessionize_stateful",
    "streaming_incremental_dedup",
    "streaming_cms_heavy_hitters",
    "streaming_kmv_distinct",
    "streaming_lsh_flagging",
    "streaming_cdc_apply",
    "streaming_view_purchase_join",
    "streaming_curated_ingest",
    "streaming_activity_bitmap",
    "streaming_incremental_pagerank",
    "streaming_incremental_lsh",
    "streaming_incremental_spans",
    "streaming_incremental_paragraph_lsh",
    "streaming_incremental_quantiles",
    "streaming_incremental_attribution",
    "udtf_token_positions",
    "pysource_synthetic_docs",
    "inverted_index_parity",
}


def test_bench_rotation_complete():
    """VERDICT r8 item 1, done in round 9: the headline prices EVERY
    catalog gate except the documented exclusions (len(BENCH_EXCLUSIONS)
    of them — derived, not hard-coded, per ADVICE r9) — a new gate
    registered without a bench entry (or a silent exclusion) fails
    here, keeping the rotation finished as the catalog grows."""
    import bench

    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    unpriced = qs - set(bench.HEADLINE)
    assert unpriced == BENCH_EXCLUSIONS
    n_streaming = sum(
        1 for n in BENCH_EXCLUSIONS if n.startswith("streaming_")
    )
    # the set IS the count authority; bench.py/BASELINE.md quote these
    assert n_streaming == len(BENCH_EXCLUSIONS) - 3


def test_readme_quotes_current_headline_count():
    """VERDICT r8 item 7: one authoritative bench quote — the README's
    headline-count sentence must track len(HEADLINE)."""
    import bench

    readme = open(
        os.path.join(os.path.dirname(__file__), "..", "README.md")
    ).read()
    assert f"{len(bench.HEADLINE)} headline queries" in readme


def test_readme_quotes_latest_bench_artifact():
    """VERDICT r9 item 7: the README's authoritative-total sentence
    must quote the NEWEST archived BENCH_rN.json (round and total),
    not a stale round's number."""
    import glob
    import json
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    # ADVICE r10: glob all rounds and pick the max NUMERIC round —
    # 'BENCH_r0*.json' + lexicographic sorted()[-1] never saw r10+.
    arts = glob.glob(os.path.join(root, "BENCH_r*.json"))
    if not arts:
        pytest.skip("no archived BENCH files")
    latest = max(
        arts, key=lambda p: int(re.search(r"BENCH_r0*(\d+)", p).group(1))
    )
    n = int(re.search(r"BENCH_r0*(\d+)\.json", latest).group(1))
    readme = open(os.path.join(root, "README.md")).read()
    m = re.search(r"latest: BENCH_r0*(\d+) = ([\d.]+) s", readme)
    assert m, "README lost its authoritative-bench quote sentence"
    quoted = int(m.group(1))
    # VERDICT r11 item 1: the driver drops BENCH_r{N+1}.json AFTER the
    # builder's round N+1 closes, so for the window between rounds the
    # newest artifact is legitimately one ahead of the README.  Accept
    # quoted == n (normal) or quoted == n - 1 when the matching
    # CORRECTNESS file confirms round-boundary state; anything older
    # is a stale quote.
    boundary = quoted == n - 1 and os.path.exists(
        os.path.join(root, f"CORRECTNESS_r{n:02d}.json")
    )
    assert quoted == n or boundary, (
        f"README quotes BENCH_r{quoted} but the newest artifact "
        f"is round {n}"
    )
    if quoted != n:
        # round-boundary tolerance: the value check below would compare
        # against the wrong artifact; resolve the one the README quotes
        latest = os.path.join(root, f"BENCH_r{quoted:02d}.json")
        if not os.path.exists(latest):
            latest = os.path.join(root, f"BENCH_r{quoted}.json")
        n = quoted
    # the quoted total must match the artifact's tail value
    tail = json.load(open(latest)).get("tail", "")
    vm = re.search(r'"value": ([\d.]+)', tail)
    if vm:
        assert abs(float(m.group(2)) - float(vm.group(1))) < 0.15, (
            f"README quotes {m.group(2)} s but BENCH_r{n:02d} records "
            f"{vm.group(1)} s"
        )

"""Snapshot-drift PSI (operators/drift.py)."""


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, n_chars bigint"
    )


def test_identical_snapshots_zero_psi(spark):
    """Mirrored halves (every even doc has an odd twin in the same bin)
    → every bin has c_a == c_b and n_a == n_b, so each contribution is
    exactly (p−p)·ln(1) = 0 and the floor cannot bias it."""
    from lab3_spark.operators.drift import snapshot_psi

    rows = []
    for i in range(50):
        rows.append((2 * i, "web", (i % 5) * 200 + 10))
        rows.append((2 * i + 1, "web", (i % 5) * 200 + 10))
    [r] = snapshot_psi(_docs(spark, rows)).collect()
    assert (r.n_a, r.n_b) == (50, 50)
    assert r.psi_fp == 0
    assert r.drifted == 0


def test_shifted_snapshot_flags_drift(spark):
    """Snapshot a concentrated in bin 0, snapshot b in bin 9 — maximal
    movement → PSI far above the 0.2 threshold."""
    from lab3_spark.operators.drift import snapshot_psi

    rows = [(2 * i, "web", 10) for i in range(50)]
    rows += [(2 * i + 1, "web", 5000) for i in range(50)]
    [r] = snapshot_psi(_docs(spark, rows)).collect()
    assert (r.n_a, r.n_b) == (50, 50)
    assert r.psi_fp > 20_000_000  # PSI > 0.2 at 1e8 fp
    assert r.drifted == 1


def test_per_source_isolation_and_empty_bins(spark):
    """A stable source next to a drifted one: rows are scored per
    source; bins empty in BOTH snapshots contribute 0 when totals
    match (smoothed shares equal)."""
    from lab3_spark.operators.drift import snapshot_psi

    rows = []
    for i in range(30):
        rows.append((2 * i, "stable", 250))
        rows.append((2 * i + 1, "stable", 250))
    for i in range(100, 130):
        rows.append((2 * i, "moved", 10))
        rows.append((2 * i + 1, "moved", 1999))
    got = {r.source: r for r in snapshot_psi(_docs(spark, rows)).collect()}
    assert got["stable"].psi_fp == 0
    assert got["moved"].drifted == 1
    assert got["moved"].psi_fp > got["stable"].psi_fp

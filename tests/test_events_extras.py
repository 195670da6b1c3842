"""Markov removal-effect attribution (operators/events.py): semantic
invariants plus a pure-Python chain-solver cross-check on a hand-built
journey set — value parity vs DuckDB is the `events_attribution_markov`
oracle gate."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from lab3_spark.operators.events import (
    ATTRIB_FP,
    ATTRIB_SHARE_FP,
    attribution_removal_effects,
)


@pytest.fixture(scope="module")
def attrib_rows(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return attribution_removal_effects(ev).collect()


def test_attribution_shape_and_bounds(attrib_rows):
    assert [r["channel"] for r in attrib_rows] == [
        "click",
        "error",
        "signup",
        "view",
    ]
    base = {r["base_p_fp"] for r in attrib_rows}
    assert len(base) == 1  # one chain, one base probability
    (b,) = base
    assert 0 <= b <= ATTRIB_FP
    for r in attrib_rows:
        # removal can only reduce absorption mass (monotone Jacobi map)
        assert 0 <= r["removed_p_fp"] <= b
        assert 0 <= r["re_fp"] <= ATTRIB_SHARE_FP
        assert 0 <= r["share_fp"] <= ATTRIB_SHARE_FP
    # shares partition the total drop (truncating DIV: sum <= 1e6,
    # within |channels| ulps of it when any drop exists)
    tot = sum(r["share_fp"] for r in attrib_rows)
    assert ATTRIB_SHARE_FP - len(attrib_rows) <= tot <= ATTRIB_SHARE_FP


def test_attribution_hand_built_journeys(spark):
    """Two-channel chain solvable by hand: user 1 converts via A→B,
    user 2 touches A then drops, user 3 converts straight from B.
    Transitions: START→A ×2, START→B, A→B, A→NULL, B→CONV ×2.
    P(START) with both channels: START: (2·pA + 1·pB)/3,
    A: (pB + 0)/2, B: CONV ⇒ pB = 1, pA = 1/2, base = 2/3.
    Removing A: pA ≡ 0 ⇒ START = pB/3 = 1/3.
    Removing B: pB ≡ 0 ⇒ pA = 0, START = 0."""
    rows = [
        (1, 1, "2024-01-01 00:00:00", "A"),
        (2, 1, "2024-01-01 00:01:00", "B"),
        (3, 1, "2024-01-01 00:02:00", "purchase"),
        (4, 2, "2024-01-01 00:00:00", "A"),
        (5, 3, "2024-01-01 00:00:00", "B"),
        (6, 3, "2024-01-01 00:01:00", "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_s string,"
        " event_type string"
    ).select(
        "event_id",
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
    )
    got = {
        r["channel"]: r
        for r in attribution_removal_effects(
            ev, channels=("A", "B"), conv_type="purchase"
        ).collect()
    }
    base = got["A"]["base_p_fp"]
    assert base == (2 * (ATTRIB_FP // 2) + ATTRIB_FP) // 3
    assert got["A"]["removed_p_fp"] == ATTRIB_FP // 3
    assert got["B"]["removed_p_fp"] == 0
    # B carries all conversions when A is gone AND is A's only path:
    # removing B zeroes everything, so B's share strictly exceeds A's
    assert got["B"]["share_fp"] > got["A"]["share_fp"]


def test_attribution_heuristics_hand_built(spark):
    """Hand-checkable journeys: user 1 converts after A,B,C (first=A,
    last=C, linear 1/3 each, position 40/20/40), user 2 converts after
    a single B (100% everywhere), user 3 never converts (no credit)."""
    from lab3_spark.operators.events import attribution_heuristics

    rows = [
        (1, 1, "2024-01-01 00:00:00", "A"),
        (2, 1, "2024-01-01 00:01:00", "B"),
        (3, 1, "2024-01-01 00:02:00", "C"),
        (4, 1, "2024-01-01 00:03:00", "purchase"),
        (5, 2, "2024-01-01 00:00:00", "B"),
        (6, 2, "2024-01-01 00:01:00", "purchase"),
        (7, 3, "2024-01-01 00:00:00", "A"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_s string,"
        " event_type string"
    ).select(
        "event_id",
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
    )
    got = {
        r["channel"]: r
        for r in attribution_heuristics(
            ev, channels=("A", "B", "C"), conv_type="purchase"
        ).collect()
    }
    assert got["A"]["first_touch"] == 1 and got["A"]["last_touch"] == 0
    assert got["B"]["first_touch"] == 1 and got["B"]["last_touch"] == 1
    assert got["C"]["first_touch"] == 0 and got["C"]["last_touch"] == 1
    third = 10**6 // 3
    assert got["A"]["linear_fp"] == third
    assert got["B"]["linear_fp"] == third + 10**6  # + user 2's 100%
    assert got["C"]["linear_fp"] == third
    assert got["A"]["position_fp"] == 400000
    assert got["B"]["position_fp"] == 200000 + 10**6
    assert got["C"]["position_fp"] == 400000


def test_session_survival_km_monotone(spark, sf_dir):
    """KM invariants on real testdata: death times strictly increasing,
    risk sets strictly decreasing in t, survival non-increasing inside
    [0, 1e6], and deaths never exceed the risk set."""
    from lab3_spark.operators.events import session_survival_km

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = session_survival_km(ev).collect()
    assert rows, "expected at least one closed session"
    ts = [r["t_min"] for r in rows]
    assert ts == sorted(set(ts))
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)
    survs = [r["surv_fp"] for r in rows]
    assert survs == sorted(survs, reverse=True)
    for r in rows:
        assert 0 <= r["surv_fp"] <= 10**6
        assert 1 <= r["n_deaths"] <= r["n_risk"]

"""Property tests for the round-11 operators: exact-rational S-curve
differential, and line-dedup differential vs a pure-Python reference."""

from fractions import Fraction

from hypothesis import given, settings, strategies as st

from lab3_spark.operators.dedup import LSH_PLAN_COMBOS, _scurve_miss_ppm


# ---------------------------------------------------------------------------
# S-curve: the integer formula IS floor(1e6 · (1 − s^r)^b) exactly
# ---------------------------------------------------------------------------


def test_scurve_equals_exact_rational_floor():
    # exhaustive over the whole planner domain — no float anywhere in
    # the reference computation, so this is the mathematical contract,
    # not an approximation check
    for b, r in LSH_PLAN_COMBOS:
        for p in range(11):
            s = Fraction(p, 10)
            exact = (1 - s**r) ** b * 1_000_000
            want = exact.numerator // exact.denominator
            assert _scurve_miss_ppm(p, b, r) == want, (b, r, p)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 4).map(lambda e: 2**e),  # b in {2,4,8,16}
    st.integers(0, 10),
)
def test_scurve_rational_differential_random(b, p):
    r = 16 // b
    s = Fraction(p, 10)
    exact = (1 - s**r) ** b * 1_000_000
    assert _scurve_miss_ppm(p, b, r) == exact.numerator // exact.denominator


# ---------------------------------------------------------------------------
# line dedup: Spark vs a pure-Python keep-first reference
# ---------------------------------------------------------------------------


def _python_line_dedup(docs, delimiter="\n"):
    """Reference: corpus-global keep-first over non-blank lines in
    (doc_id, line_idx) order; survivors re-joined per doc."""
    units = []
    for doc_id, text in sorted(docs):
        for idx, line in enumerate(text.split(delimiter)):
            if line.strip():
                units.append((doc_id, idx, line))
    seen = set()
    kept = {}
    totals = {}
    for doc_id, idx, line in sorted(units):
        totals[doc_id] = totals.get(doc_id, 0) + 1
        if line not in seen:
            seen.add(line)
            kept.setdefault(doc_id, []).append((idx, line))
    out = {}
    for doc_id, _ in docs:
        n = totals.get(doc_id, 0)
        k = kept.get(doc_id, [])
        out[doc_id] = (
            n,
            len(k),
            n - len(k),
            "\n".join(line for _, line in sorted(k)),
        )
    return out


LINES = st.lists(
    st.sampled_from(
        ["alpha beta", "the banner", "gamma", "delta epsilon", "", "  "]
    ),
    min_size=0,
    max_size=5,
)
CORPUS = st.lists(LINES, min_size=1, max_size=5)


@settings(max_examples=15, deadline=None)
@given(CORPUS)
def test_line_dedup_matches_python_reference(spark, corpora):
    from lab3_spark.operators.dedup import apply_line_dedup

    docs = [(i, "\n".join(lines)) for i, lines in enumerate(corpora)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"],
            r["kept_lines"],
            r["removed_lines"],
            r["clean_text"],
        )
        for r in apply_line_dedup(df, delimiter="\n").collect()
    }
    assert got == _python_line_dedup(docs)


def test_duckdb_recursive_scurve_matches_python():
    """The ORACLE side of the planner's S-curve, checked directly: the
    recursive-CTE HUGEINT power must reproduce _scurve_miss_ppm for
    every (b, r, bucket) in the planner domain — independent of the
    driver's Spark-vs-DuckDB compare, so an oracle regression is
    caught without a gate run."""
    import duckdb

    q = """
    WITH RECURSIVE
    combos(n_bands, n_rows) AS (
      VALUES (1, 16), (2, 8), (4, 4), (8, 2), (16, 1)
    ),
    scurve_base AS (
      SELECT n_bands, n_rows, p,
             CAST(CASE n_rows WHEN 1 THEN 10 WHEN 2 THEN 100
                  WHEN 4 THEN 10000 WHEN 8 THEN 100000000
                  WHEN 16 THEN 10000000000000000 END AS BIGINT)
             - CAST(CASE n_rows WHEN 1 THEN p WHEN 2 THEN p * p
                    WHEN 4 THEN (p * p) * (p * p)
                    WHEN 8 THEN ((p * p) * (p * p)) * ((p * p) * (p * p))
                    WHEN 16 THEN (((p * p) * (p * p)) * ((p * p) * (p * p)))
                               * (((p * p) * (p * p)) * ((p * p) * (p * p)))
                    END AS BIGINT) AS q
      FROM combos, (SELECT unnest(range(0, 11)) AS p) ps
    ),
    scurve_pow AS (
      SELECT n_bands, n_rows, p, q, CAST(1 AS HUGEINT) AS acc, 0 AS i
      FROM scurve_base
      UNION ALL
      SELECT n_bands, n_rows, p, q, acc * q, i + 1
      FROM scurve_pow WHERE i < n_bands
    )
    SELECT n_bands, n_rows, CAST(p AS BIGINT) AS bucket_x10,
           CAST(acc // CAST(10000000000 AS HUGEINT) AS BIGINT) AS miss_ppm
    FROM scurve_pow WHERE i = n_bands
    ORDER BY n_bands, bucket_x10
    """
    got = {
        (b, r, p): m for b, r, p, m in duckdb.sql(q).fetchall()
    }
    want = {
        (b, r, p): _scurve_miss_ppm(p, b, r)
        for b, r in LSH_PLAN_COMBOS
        for p in range(11)
    }
    assert got == want

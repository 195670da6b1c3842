"""Deequ-style data-expectations suite (operators/expectations.py)."""

from pyspark.sql import functions as F


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate_s string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
    )


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_discount double, l_quantity double, "
        "l_shipdate_s string",
    ).select(
        "l_orderkey",
        "l_discount",
        "l_quantity",
        F.col("l_shipdate_s").cast("timestamp").alias("l_shipdate"),
    )


def _report(spark, orders_rows, lineitem_rows):
    from lab3_spark.operators.expectations import expectations_report

    out = expectations_report(
        _orders(spark, orders_rows), _lineitem(spark, lineitem_rows)
    )
    return {(r.tbl, r.chk): r for r in out.collect()}


CLEAN_ORDERS = [
    (1, 10, "O", 100.0, "1995-01-01 00:00:00"),
    (2, 11, "F", 200.0, "1996-01-01 00:00:00"),
]
CLEAN_LINES = [
    (1, 0.05, 10.0, "1995-02-01 00:00:00"),
    (2, 0.0, 1.0, "1996-02-01 00:00:00"),
]


def test_clean_data_all_pass(spark):
    got = _report(spark, CLEAN_ORDERS, CLEAN_LINES)
    assert len(got) == 11
    assert all(r.passed == 1 for r in got.values())
    # ratio metrics are fixed-point 1e6 when fully complete/unique
    assert got[("orders", "completeness_o_custkey")].metric_fp == 1_000_000
    assert got[("orders", "uniqueness_o_orderkey")].metric_fp == 1_000_000


def test_violations_detected(spark):
    """Each planted defect flips exactly its own check."""
    orders = [
        (1, 10, "O", 100.0, "1995-01-01 00:00:00"),
        (1, None, "X", -5.0, None),  # dup key, null cust, bad status,
        # nonpositive price, null date
    ]
    lines = [
        (1, 1.5, 0.0, "1991-06-01 00:00:00"),  # bad discount, zero qty,
        # pre-1992 shipdate
        (99, 0.1, 2.0, "1995-01-01 00:00:00"),  # orphan order key
    ]
    got = _report(spark, orders, lines)
    failed = {k for k, r in got.items() if r.passed == 0}
    assert failed == {
        ("orders", "completeness_o_custkey"),
        ("orders", "uniqueness_o_orderkey"),
        ("orders", "accepted_values_o_orderstatus"),
        ("orders", "positive_o_totalprice"),
        ("orders", "completeness_o_orderdate"),
        ("lineitem", "range_l_discount_0_1"),
        ("lineitem", "positive_l_quantity"),
        ("lineitem", "shipdate_after_1992"),
        ("lineitem", "referential_l_orderkey"),
    }
    # metrics carry the observed counts/ratios, not just pass/fail
    assert got[("orders", "completeness_o_custkey")].metric_fp == 500_000
    assert got[("orders", "uniqueness_o_orderkey")].metric_fp == 500_000
    assert got[("lineitem", "referential_l_orderkey")].metric_fp == 1_000_000


def test_single_pass_per_table(spark):
    """The inline fan-out keeps ONE consumer per aggregate: the plan
    holds at most 4 table scans (orders agg, lineitem agg, and the
    two anti-join sides) — NOT one scan per check row."""
    from lab3_spark.operators.expectations import expectations_report

    out = expectations_report(
        _orders(spark, CLEAN_ORDERS), _lineitem(spark, CLEAN_LINES)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") <= 4


def test_chi2_hand_2x2(spark):
    from lab3_spark.operators.quality import chi_square_independence

    rows = (
        [(i, "t", "en", "a", 1) for i in range(10)]
        + [(i + 10, "t", "fr", "a", 1) for i in range(20)]
        + [(i + 30, "t", "en", "b", 1) for i in range(20)]
        + [(i + 50, "t", "fr", "b", 1) for i in range(10)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r["source"], r["lang"]): (r["observed"], r["contrib_fp"])
        for r in chi_square_independence(df).collect()
    }
    # E = 15 everywhere; per-cell (O-E)^2/E = 25/15 = 1.666666...
    for cell in [("a", "en"), ("a", "fr"), ("b", "en"), ("b", "fr")]:
        assert got[cell][1] == 1_666_666
    assert got[("ALL", "ALL")] == (60, 4 * 1_666_666)


def test_chi2_independent_is_zero(spark):
    from lab3_spark.operators.quality import chi_square_independence

    rows = [
        (i, "t", lang, src, 1)
        for i, (lang, src) in enumerate(
            (lg, sc) for lg in ("en", "fr") for sc in ("a", "b") for _ in range(7)
        )
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {(r["source"], r["lang"]): r["contrib_fp"]
           for r in chi_square_independence(df).collect()}
    assert all(v == 0 for v in got.values())


def test_calibration_hand_case(spark):
    from lab3_spark.operators.quality import quality_dup_calibration

    # three identical low-quality docs (1 rep + 2 dups) and two
    # distinct high-quality docs -> low bin dup_rate 2/3, high bin 0
    low = "aa aa aa"  # tiny, repetitive -> low score
    hi1 = " ".join(f"alpha{c}" for c in "abcdefghijklmnopqrstuvwxyz")
    hi2 = " ".join(f"beta{c}" for c in "abcdefghijklmnopqrstuvwxyz")
    rows = [
        (0, low, "en", "s", len(low)),
        (1, low, "en", "s", len(low)),
        (2, low, "en", "s", len(low)),
        (3, hi1, "en", "s", len(hi1)),
        (4, hi2, "en", "s", len(hi2)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["bin"]: r for r in quality_dup_calibration(df).collect()}
    low_bin = min(got)
    hi_bin = max(got)
    assert low_bin != hi_bin
    assert got[low_bin]["n_docs"] == 3 and got[low_bin]["n_dups"] == 2
    assert got[low_bin]["dup_rate_fp"] == 666_666
    assert got[hi_bin]["n_docs"] == 2 and got[hi_bin]["n_dups"] == 0


def test_mutual_info_independent_and_determined(spark):
    from lab3_spark.operators.quality import mutual_information

    # independent: uniform 2x2 -> MI = 0
    rows = [
        (i, "t", lg, sc, 1)
        for i, (lg, sc) in enumerate(
            (lg, sc) for lg in ("en", "fr") for sc in ("a", "b") for _ in range(5)
        )
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    r = mutual_information(df).collect()[0]
    assert r["mi_fp"] == 0
    # fully determined: lang == f(source) -> MI = H(row) = H(col) = ln 2
    rows = (
        [(i, "t", "en", "a", 1) for i in range(10)]
        + [(i + 10, "t", "fr", "b", 1) for i in range(10)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    r = mutual_information(df).collect()[0]
    import math

    ln2_fp = math.floor(math.log(2) * 1_000_000_000)
    assert r["mi_fp"] == ln2_fp
    assert r["h_row_fp"] == ln2_fp and r["h_col_fp"] == ln2_fp
    assert 999_999_990 <= r["npmi_like_fp"] <= 1_000_000_000


def test_anova_zero_between_when_groups_identical(spark, sf_dir):
    from lab3_spark.operators.relational import region_price_anova
    from lab3_spark.sources.tables import load_table

    r = region_price_anova(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    ).collect()[0]
    assert r["k_groups"] == 5
    assert r["ssw"] > 0 and r["ssb"] >= 0
    # synthetic orders are region-independent: F should be unremarkable
    # (well under the ~9.5e4 fp that would scream dependence)
    assert 0 <= r["f_fp"] < 95_000


def test_jackknife_influence_signs(spark):
    from lab3_spark.operators.quality import source_influence_jackknife

    hi = " ".join(f"word{c}" for c in "abcdefghijklmnopqrstuvwxyz")
    lo = "aa aa"
    rows = (
        [(i, hi, "en", "good", len(hi)) for i in range(10)]
        + [(100 + i, lo, "en", "bad", len(lo)) for i in range(10)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["source"]: r for r in source_influence_jackknife(df).collect()}
    # removing the bad source raises the mean; removing good lowers it
    assert got["bad"]["influence_fp"] > 0
    assert got["good"]["influence_fp"] < 0
    # LOO means are the other group's mean exactly
    assert got["bad"]["loo_mean_fp"] == got["good"]["mean_q_fp"]
    assert got["good"]["loo_mean_fp"] == got["bad"]["mean_q_fp"]


def test_feature_correlations_planted(spark):
    from lab3_spark.operators.quality import quality_feature_correlations

    # texts engineered so n_tokens and distinct_ratio anti-correlate
    # (longer docs repeat the same word); punct constant -> corr 0
    rows = []
    for i in range(30):
        n = 3 + i
        # i distinct words then padding repeats of the first word
        words = [f"w{j}abc" for j in range(3)] + ["w0abc"] * (n - 3)
        rows.append((i, " ".join(words), "en", "s", 1))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r["feat_a"], r["feat_b"]): r["corr_fp"]
        for r in quality_feature_correlations(df).collect()
    }
    assert len(got) == 6
    assert got[("n_tokens", "distinct_ratio")] < -800_000  # strong anti
    # punct_ratio is ~constant across docs -> its correlations are
    # zero-variance-guarded or tiny
    for (a, b), v in got.items():
        if "punct_ratio" in (a, b):
            assert abs(v) < 300_000

"""Deequ-style data-expectations suite: declarative quality checks,
evaluated in a constant number of passes.

A training-data pipeline gates every ingest batch on a contract —
completeness, uniqueness, accepted values, ranges, referential
integrity — before the batch is allowed to feed downstream dedup /
selection / packing stages (the Deequ / Great Expectations pattern).
The reference engine has no validation surface at all (its inputs are
trusted flat files, phoenixLab/wordCount/wordCount.cpp:116-133); at
100 TB unvalidated ingest is how a bad day becomes a bad model.

Design for scale:
- ALL single-table checks for one table fold into ONE combinable
  aggregation over that table (count/count-distinct/min/conditional
  sums in a single partial+final hash agg pass — no per-check scans).
- Each 1-row metrics frame fans out to its check rows via ``inline``
  of a struct array — ONE consumer of each aggregate, so the scan is
  not re-executed per check (alias-differing consumers defeat
  Spark's exchange reuse; see functions/partitioning.py).
- The one cross-table check (referential integrity) is a LEFT ANTI
  join on the key, counted — a single key-partitioned shuffle; with
  both fact tables bucketed on orderkey (sources/layout.py) it would
  be exchange-free.
- Output is a tiny (tbl, chk, metric_fp, passed) contract frame —
  metrics are fixed-point BIGINTs so the gate is engine-exact.

`approx_count_distinct` would make uniqueness cheaper at 100 TB but is
sketch-based (engine-specific); the suite uses exact count_distinct —
still one shuffle — and leaves the approximate form to monitoring
mode (events_approx_dau precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP = 1_000_000  # shared fixed-point scale for ratio metrics

ORDER_STATUSES = ("O", "F", "P")


def _ratio_fp(num: F.Column, den: F.Column) -> F.Column:
    """floor-fixed-point num/den on bigints — exact in both engines."""
    return F.floor((num.cast("bigint") * FP) / den.cast("bigint"))


def _check_rows(
    metrics: DataFrame, table: str, checks: list[tuple[str, F.Column, F.Column]]
) -> DataFrame:
    """Explode a 1-row metrics frame into (tbl, chk, metric_fp, passed)
    rows with ONE select — the aggregate runs once, not per check."""
    structs = [
        F.struct(
            F.lit(name).alias("chk"),
            F.floor(metric_fp).cast("bigint").alias("metric_fp"),
            passed.cast("bigint").alias("passed"),
        )
        for name, metric_fp, passed in checks
    ]
    return metrics.select(F.inline(F.array(*structs))).select(
        F.lit(table).alias("tbl"), "chk", "metric_fp", "passed"
    )


def expectations_report(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Evaluate the ingest contract over orders + lineitem.

    One row per check: (tbl, chk, metric_fp, passed) where metric_fp is
    the observed metric ×1e6 (floored) and passed applies the contract
    threshold.  Exactly three distributed passes: one combinable agg
    per table + one anti-join count.
    """
    o = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.countDistinct("o_orderkey").alias("n_distinct_key"),
        F.sum(
            (~F.col("o_orderstatus").isin(*ORDER_STATUSES)).cast("bigint")
        ).alias("n_bad_status"),
        F.sum((F.col("o_totalprice") <= 0).cast("bigint")).alias("n_nonpos_price"),
        F.sum(F.col("o_orderdate").isNull().cast("bigint")).alias("n_null_date"),
    )
    li = lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("bigint")
        ).alias("n_bad_discount"),
        F.sum((F.col("l_quantity") <= 0).cast("bigint")).alias("n_nonpos_qty"),
        F.sum(
            (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp")).cast(
                "bigint"
            )
        ).alias("n_early_ship"),
    )
    # Referential integrity: lineitem rows whose order key has no parent.
    orphans = (
        lineitem.select("l_orderkey")
        .join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )

    c = F.col
    o_checks = _check_rows(
        o,
        "orders",
        [
            ("row_count_nonzero", c("n_rows") * FP, c("n_rows") > 0),
            (
                "completeness_o_custkey",
                _ratio_fp(c("n_custkey"), c("n_rows")),
                c("n_custkey") == c("n_rows"),
            ),
            (
                "uniqueness_o_orderkey",
                _ratio_fp(c("n_distinct_key"), c("n_rows")),
                c("n_distinct_key") == c("n_rows"),
            ),
            (
                "accepted_values_o_orderstatus",
                c("n_bad_status") * FP,
                c("n_bad_status") == 0,
            ),
            (
                "positive_o_totalprice",
                c("n_nonpos_price") * FP,
                c("n_nonpos_price") == 0,
            ),
            (
                "completeness_o_orderdate",
                c("n_null_date") * FP,
                c("n_null_date") == 0,
            ),
        ],
    )
    li_checks = _check_rows(
        li,
        "lineitem",
        [
            ("row_count_nonzero", c("n_rows") * FP, c("n_rows") > 0),
            (
                "range_l_discount_0_1",
                c("n_bad_discount") * FP,
                c("n_bad_discount") == 0,
            ),
            ("positive_l_quantity", c("n_nonpos_qty") * FP, c("n_nonpos_qty") == 0),
            (
                "shipdate_after_1992",
                c("n_early_ship") * FP,
                c("n_early_ship") == 0,
            ),
        ],
    )
    ri = _check_rows(
        orphans,
        "lineitem",
        [("referential_l_orderkey", c("n_orphans") * FP, c("n_orphans") == 0)],
    )
    return o_checks.unionByName(li_checks).unionByName(ri).orderBy("tbl", "chk")

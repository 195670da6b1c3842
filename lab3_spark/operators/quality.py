"""Data-quality / constraint audit — the validation pass a production
training-data pipeline runs before (and after) every transformation.

Design for 100 TB: all domain/null/uniqueness checks for one table
fold into ONE aggregate over ONE scan (conditional sums side by side,
then unpivoted to long form) — ten checks cost three table scans, not
ten.  Referential checks are LEFT ANTI joins on the key columns only
(column-pruned scans, keyed shuffle, never a driver-side collect).
The report is a tiny (check, violations) DataFrame — the thing you
alert on, gate merges with, or trend over time.

The reference has no quality surface (it trusts its input buffer);
this is engine-native breadth for the LLM-pipeline use case.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unpivot(wide: DataFrame, checks: list[str]) -> DataFrame:
    """1-row wide aggregate -> (check, violations) long form."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {pairs}) AS (check_name, violations)"
    )


def _cnt(cond) -> F.Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")


def quality_report(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    documents: DataFrame,
) -> DataFrame:
    """(check, violations): the standard audit over the star schema.

    Violation semantics:
    - *_null / *_out_of_range / *_negative: row counts failing the rule
    - lineitem_dup_line_id: EXTRA rows beyond the first per
      (l_orderkey, l_linenumber) — count(*) minus distinct pairs
    - *_fk_*: child rows whose key has no parent (anti-join count)
    - orders_without_lineitems: parent rows with no children
    """
    o_checks = _unpivot(
        orders.agg(
            _cnt(F.col("o_custkey").isNull()).alias("orders_null_custkey"),
            _cnt(F.col("o_totalprice") <= 0).alias(
                "orders_nonpositive_totalprice"
            ),
        ),
        ["orders_null_custkey", "orders_nonpositive_totalprice"],
    )
    li_checks = _unpivot(
        lineitem.agg(
            _cnt(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
            ).alias("lineitem_discount_out_of_range"),
            _cnt(F.col("l_quantity") <= 0).alias(
                "lineitem_nonpositive_quantity"
            ),
            (
                F.count("*")
                - F.count_distinct(
                    F.col("l_orderkey"), F.col("l_linenumber")
                )
            )
            .cast("bigint")
            .alias("lineitem_dup_line_id"),
        ),
        [
            "lineitem_discount_out_of_range",
            "lineitem_nonpositive_quantity",
            "lineitem_dup_line_id",
        ],
    )
    c_checks = _unpivot(
        customer.agg(
            _cnt(F.col("c_acctbal") < 0).alias("customer_negative_acctbal")
        ),
        ["customer_negative_acctbal"],
    )
    d_checks = _unpivot(
        documents.agg(
            _cnt(F.col("n_chars") < 50).alias("documents_short_text")
        ),
        ["documents_short_text"],
    )

    def anti_count(name: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        return (
            child.select(ckey)
            .join(parent.select(pkey), F.col(ckey) == F.col(pkey), "left_anti")
            .agg(F.count("*").cast("bigint").alias("violations"))
            .select(F.lit(name).alias("check_name"), "violations")
        )

    fk_checks = [
        anti_count(
            "orders_fk_custkey", orders, "o_custkey", customer, "c_custkey"
        ),
        anti_count(
            "lineitem_fk_orderkey", lineitem, "l_orderkey", orders, "o_orderkey"
        ),
        anti_count(
            "orders_without_lineitems", orders, "o_orderkey", lineitem, "l_orderkey"
        ),
    ]

    parts = [o_checks, li_checks, c_checks, d_checks, *fk_checks]
    return reduce(DataFrame.unionAll, parts).orderBy("check_name")


def k_anonymity_report(
    documents: DataFrame, k: int = 5, bucket_chars: int = 100
) -> DataFrame:
    """(lang, source, size_bucket, class_size, is_suppressed):
    k-anonymity audit over the quasi-identifier tuple (lang, source,
    length bucket) — every equivalence class with its size and whether
    a k-anonymous release would have to suppress it (class_size < k).
    The privacy-side companion to doc_redact_pii: redaction hides
    direct identifiers, k-anonymity measures re-identification risk
    from the INDIRECT ones.

    One combinable aggregation on the quasi-identifier key — scan
    speed at any scale; the class table is |langs|·|sources|·|buckets|
    rows, metadata-sized."""
    return (
        documents.groupBy(
            "lang",
            "source",
            F.expr(f"CAST(n_chars DIV {bucket_chars} AS BIGINT)").alias(
                "size_bucket"
            ),
        )
        .agg(F.count("*").alias("class_size"))
        .select(
            "lang",
            "source",
            "size_bucket",
            "class_size",
            (F.col("class_size") < k).cast("int").alias("is_suppressed"),
        )
        .orderBy("lang", "source", "size_bucket")
    )

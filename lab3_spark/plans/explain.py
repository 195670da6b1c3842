"""Physical-plan inspection helpers.

The reference hand-builds its physical execution (SURVEY.md §2.6/§4);
in this engine Catalyst picks the physical strategy, and these helpers
make the *choices* assertable: predicate pushdown reached the parquet
scan, small dims are broadcast, top-K avoided a global sort, the
shuffle count is what the operator promised.  tests/test_plans.py pins
them so a regression in plan shape fails CI, not just the stopwatch.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`.explain("formatted")` as a string."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the scan node reports PushedFilters containing every
    fragment (pushdown reached the data source)."""
    plan = formatted_plan(df)
    m = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    joined = "; ".join(m)
    return bool(m) and all(f in joined for f in fragments)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    """True if the plan uses TakeOrderedAndProject (per-partition heap
    top-K + driver merge) instead of a global sort."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes (hash/range/single partition;
    broadcast exchanges excluded) — THE scale cost driver to minimize."""
    plan = formatted_plan(df)
    # formatted mode lists each Exchange's partitioning on an
    # `Arguments:` line: hashpartitioning(...), rangepartitioning(...),
    # RoundRobinPartitioning(...), SinglePartition
    return len(
        re.findall(
            r"Arguments: (?:hashpartitioning|rangepartitioning|"
            r"RoundRobinPartitioning|SinglePartition)",
            plan,
        )
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count of WholeStageCodegen spans — wider/fewer is better (more
    of the plan fused into generated JVM loops)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))

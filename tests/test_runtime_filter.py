"""Runtime bloom-filter join pruning: at 100 TB the orders ⋈ lineitem
spine can't broadcast either side; Spark's runtime filter builds a
bloom filter from the SELECTIVE side's join keys and injects a
might_contain() predicate on the big side BEFORE its shuffle — rows
that can't match never enter the exchange.  This is the Spark-native
analogue of semi-join reduction, free when
spark.sql.optimizer.runtime.bloomFilter.enabled (default true); the
test pins that our fact-fact join shape actually triggers it under
at-scale conditions (no broadcast)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def scale_confs(spark):
    """Simulate at-scale planning: both join sides too big to
    broadcast, scan-size threshold floored so sf-test data qualifies."""
    keep = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
        ),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    yield
    for k, v in keep.items():
        spark.conf.set(k, v)


def test_bloom_filter_injected_on_fact_side(spark, sf_dir, scale_confs):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    j = (
        li.join(
            o.where(F.col("o_orderpriority") == "1-URGENT"),
            li.l_orderkey == o.o_orderkey,
        )
        .groupBy("o_orderstatus")
        .count()
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, plan
    assert "bloom_filter_agg" in plan, plan
    # the might_contain predicate must sit on the LINEITEM (application)
    # side, keyed on l_orderkey — pruning before the shuffle
    assert any(
        "might_contain" in line and "l_orderkey" in line
        for line in plan.splitlines()
    ), plan


def test_bloom_filter_result_unchanged(spark, sf_dir, scale_confs):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def run():
        return {
            (r["o_orderstatus"], r["count"])
            for r in li.join(
                o.where(F.col("o_orderpriority") == "1-URGENT"),
                li.l_orderkey == o.o_orderkey,
            )
            .groupBy("o_orderstatus")
            .count()
            .collect()
        }

    with_filter = run()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        without_filter = run()
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert with_filter == without_filter and with_filter

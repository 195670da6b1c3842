"""Date-partitioned layout must turn a date predicate into DIRECTORY
pruning — the scan's PartitionFilters — not a full-table scan.

At 100 TB this is the difference between reading one day's directory
and listing three years of files; the layout writer is
sources/layout.py:materialize_partitioned_events.
"""

import re

from pyspark.sql import functions as F

from lab3_spark.plans.explain import formatted_plan
from lab3_spark.sources.layout import (
    materialize_bucketed_facts,
    materialize_partitioned_events,
)


def test_date_predicate_becomes_partition_filter(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_date")
    ev = materialize_partitioned_events(spark, sf_dir, out)

    one_day = ev.where(F.col("event_date") == "2024-01-03").groupBy("event_type").count()
    plan = formatted_plan(one_day)
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "event_date" in m.group(1), plan
    # the predicate must NOT appear as a post-scan Filter on data rows
    # (pruning happens at file listing, before any IO)
    data_filters = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    assert all("event_date" not in f for f in data_filters), plan


def test_partitioned_layout_preserves_results(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_date2")
    ev = materialize_partitioned_events(spark, sf_dir, out)
    from lab3_spark.sources.tables import load_table

    flat = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    day = (
        flat.select(F.max("event_date").alias("d")).first()["d"]
    )
    got = sorted(
        map(
            tuple,
            ev.where(F.col("event_date") == F.lit(day))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            flat.where(F.col("event_date") == F.lit(day))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect(),
        )
    )
    assert got == want and got


def test_materialized_bucketed_catalog_reuses_tables(spark, sf_dir):
    try:
        ob1, lb1 = materialize_bucketed_facts(spark, sf_dir, n_buckets=4)
        # second call must be a catalog hit, not a rewrite
        ob2, _ = materialize_bucketed_facts(spark, sf_dir, n_buckets=4)
        assert ob1.count() == ob2.count() > 0
        from lab3_spark.sources.layout import bucketed_table_names

        orders_t, lineitem_t = bucketed_table_names(sf_dir)
        assert spark.catalog.tableExists(orders_t)
        assert spark.catalog.tableExists(lineitem_t)
    finally:
        from lab3_spark.sources.layout import bucketed_table_names

        orders_t, lineitem_t = bucketed_table_names(sf_dir)
        spark.sql(f"DROP TABLE IF EXISTS {orders_t}")
        spark.sql(f"DROP TABLE IF EXISTS {lineitem_t}")

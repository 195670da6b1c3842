"""Bucketed storage layout must eliminate the join shuffle — the
docs/SCALE.md claim for fact-fact joins, proven on a real plan."""

from pyspark.sql import functions as F

from lab3_spark.plans.explain import count_exchanges, formatted_plan
from lab3_spark.sinks import write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # warehouse.dir is a static conf; managed tables land in the
    # default ./spark-warehouse and are dropped below
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    write_bucketed(orders, "orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 8, sort_col="l_orderkey")

    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    # disable broadcast so the join strategy is sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan
        # bucketed co-partitioning: the JOIN itself needs no Exchange;
        # only the groupBy after it shuffles
        assert count_exchanges(joined) <= 1, plan
        # and it actually runs correctly
        expected = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expected.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")

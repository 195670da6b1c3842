"""Physical-plan shape assertions (SURVEY.md §4: the optimizations the
reference hand-rolls must actually be engaged in our Catalyst plans)."""

from pyspark.sql import functions as F

from lab3_spark.operators.relational import (
    q1_pricing_summary,
    q3_shipping_priority,
)
from lab3_spark.operators.topk import top_k_words
from lab3_spark.operators.wordcount import word_count, word_count_antijoin
from lab3_spark.plans.explain import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    has_take_ordered,
)


def _tables(spark, sf_dir, *names):
    return [spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names]


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    (li,) = _tables(spark, sf_dir, "lineitem")
    df = q1_pricing_summary(li)
    assert has_pushed_filters(df, "l_shipdate"), formatted_plan(df)


def test_q1_column_pruning(spark, sf_dir):
    (li,) = _tables(spark, sf_dir, "lineitem")
    plan = formatted_plan(q1_pricing_summary(li))
    # the scan must not read columns the query never touches
    assert "l_partkey" not in plan.split("ReadSchema")[1][:400]


def test_q3_broadcasts_customer(spark, sf_dir):
    c, o, li = _tables(spark, sf_dir, "customer", "orders", "lineitem")
    df = q3_shipping_priority(c, o, li)
    assert has_broadcast_join(df), formatted_plan(df)


def test_topk_avoids_global_sort(spark, corpus):
    df = top_k_words(corpus, k=10)
    assert has_take_ordered(df), formatted_plan(df)


def test_word_count_single_shuffle_before_sort(spark, corpus):
    # unordered word count = exactly ONE hash shuffle (the group-by);
    # the reference's dataflow likewise has exactly one repartition
    # point (container bucketing, container.h:185)
    df = word_count(corpus, ordered=False)
    assert count_exchanges(df) == 1, formatted_plan(df)


def test_antijoin_stop_filter_is_broadcast(spark, corpus):
    df = word_count_antijoin(corpus)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_wordcount_pipeline_has_partial_agg(spark, corpus):
    # map-side combine (the reference's combiner, combiner.h:230-235)
    # = HashAggregate appears in partial then final mode
    plan = formatted_plan(word_count(corpus, ordered=False))
    assert plan.count("HashAggregate") >= 2, plan


def test_q6_all_predicates_pushed(spark, sf_dir):
    from lab3_spark.queries_catalog import QUERIES

    df = QUERIES["q6_forecast_revenue"](spark, sf_dir)
    # every Q6 predicate is scan-pushable
    assert has_pushed_filters(df, "l_shipdate", "l_discount", "l_quantity"), (
        formatted_plan(df)
    )
    # a global agg needs only the final single-partition exchange
    assert count_exchanges(df) <= 1, formatted_plan(df)


def test_q10_topk_and_broadcast(spark, sf_dir):
    from lab3_spark.queries_catalog import QUERIES

    df = QUERIES["q10_returned_customers"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan

from lab3_spark.plans.explain import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    has_take_ordered,
    wholestage_codegen_spans,
)

__all__ = [
    "formatted_plan",
    "has_pushed_filters",
    "has_broadcast_join",
    "has_take_ordered",
    "count_exchanges",
    "wholestage_codegen_spans",
]

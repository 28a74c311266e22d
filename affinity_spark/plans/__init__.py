from affinity_spark.plans.introspect import (
    executed_plan,
    has_broadcast_join,
    n_exchanges,
    pushed_filters,
)

__all__ = ["executed_plan", "pushed_filters", "n_exchanges", "has_broadcast_join"]

from affinity_spark.operators.kv import (
    compact_latest,
    point_get,
    prefix_scan,
    ttl_filter,
)
from affinity_spark.operators.index import build_inverted_index, index_lookup
from affinity_spark.operators.topk import top_n_per_group
from affinity_spark.operators.upsert import merge_upsert

__all__ = [
    "compact_latest",
    "point_get",
    "prefix_scan",
    "ttl_filter",
    "build_inverted_index",
    "index_lookup",
    "top_n_per_group",
    "merge_upsert",
]

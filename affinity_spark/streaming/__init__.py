"""Structured Streaming layer: the reference's stream-processing surface
re-expressed as Spark streaming queries.

Mapping (SURVEY.md §2.1, §2.3, §2.11):
- GatewayStream ingest (S4)            → readStream + foreachBatch
- continuous word count (A2)           → groupBy().applyInPandasWithState
- getAndUpdate/updateAndGet (W5/W6)    → per-key state function emitting
                                         (old, new) change records
- event-time windows + lateness (T2/3) → withWatermark + window()
- changelog/table sink (S7/X4)         → foreachBatch merge into keyed table
"""

from affinity_spark.streaming.state import get_and_update_stream, running_count_stream
from affinity_spark.streaming.ivm import (
    apply_agg_delta,
    batch_delta_agg,
    incremental_agg_sink,
)
from affinity_spark.streaming.sinks import (
    changelog_sink,
    foreach_batch_merge,
    read_keyed_table,
)
from affinity_spark.streaming.windows import tumbling_counts

__all__ = [
    "get_and_update_stream",
    "running_count_stream",
    "apply_agg_delta",
    "batch_delta_agg",
    "incremental_agg_sink",
    "changelog_sink",
    "foreach_batch_merge",
    "read_keyed_table",
    "tumbling_counts",
]

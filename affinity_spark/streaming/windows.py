"""Event-time windowed aggregation with bounded lateness.

The reference has no window operator — time-bounded reads are query-time
TimeRange scans — and accepts arbitrarily late data, last-write-wins forever
(affinity ``KVStoreLocal.scala:95-97,484-486``; SURVEY §2.11 T2/T3). The
streaming path on Spark needs a watermark to bound state, so the documented
divergence is: watermark = the reference's ``min.timestamp.ms`` ingest gate
(records older than the bound are dropped, exactly its behavior), while the
batch MERGE path stays watermark-free last-write-wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window_duration: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window counts with late-data drop (A5/T3 batch
    analog is groupBy(date_trunc); this is the streaming form)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            F.col("n"),
        )
    )


def sliding_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window_duration: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding (hopping) event-time window counts: each event lands in
    window_duration/slide overlapping windows (batch analog:
    ``events_sliding_stats``). State is bounded by the watermark exactly as
    in the tumbling form — the extra cost of overlap is one state row per
    hop, not per event."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration, slide).alias("w"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            F.col("n"),
        )
    )

"""Streaming observability: structured progress metrics for operations.

The reference exports stream health through its metrics reporter
(``kafka/metrics-reporter-kafka``); Spark-first the signal lives in each
query's ``recentProgress`` JSON. This module reduces that to the few
numbers an operator actually pages on — input rate, state size, and
WATERMARK DROPS (late data silently discarded is the #1 silent-wrongness
mode of an event-time pipeline; at 100 TB you alert on it, you don't
grep logs for it).
"""

from __future__ import annotations

from typing import Any


def progress_summary(query) -> dict[str, Any]:
    """Roll up a streaming query's recentProgress into one dict:
    totals for input rows and watermark drops, last state sizes."""
    total_input = 0
    total_dropped = 0
    last_state_rows = 0
    batches = 0
    for p in query.recentProgress:
        batches += 1
        total_input += int(p.get("numInputRows", 0) or 0)
        for op in p.get("stateOperators", []) or []:
            total_dropped += int(op.get("numRowsDroppedByWatermark", 0) or 0)
        ops = p.get("stateOperators", []) or []
        if ops:
            last_state_rows = sum(int(op.get("numRowsTotal", 0) or 0) for op in ops)
    return {
        "batches": batches,
        "total_input_rows": total_input,
        "rows_dropped_by_watermark": total_dropped,
        "state_rows": last_state_rows,
    }


def assert_no_watermark_drops(query) -> None:
    """Guard for pipelines where late data must NOT be silently lost:
    raises with the drop count so the job fails loudly instead of
    shipping an undercounted aggregate."""
    s = progress_summary(query)
    if s["rows_dropped_by_watermark"] > 0:
        raise RuntimeError(
            f"{s['rows_dropped_by_watermark']} late row(s) dropped by watermark "
            f"across {s['batches']} batches — widen the watermark or route late "
            "data to a correction sink"
        )

"""TimeRange: start-inclusive, end-exclusive unix-millis interval.

Mirrors the reference's query-time time bounding (affinity
``api/src/main/java/io/amient/affinity/core/util/TimeRange.java:25-196``):
every ranged read is bounded by [start, end). Spark-first mapping: a
TimeRange becomes either (a) a Column predicate that Catalyst pushes into the
parquet/delta scan, or (b) Kafka source offset options
(``startingOffsetsByTimestamp``/``endingOffsetsByTimestamp``) so the broker
seeks instead of the executor filtering — the same "pushdown to the source"
the reference does with ``offsetsForTimes``
(``kafka/storage-kafka/.../KafkaLogStorage.scala:168-176``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

UNBOUNDED_START = 0
UNBOUNDED_END = (1 << 63) - 1


def _to_millis(t: "int | str | datetime") -> int:
    if isinstance(t, int):
        return t
    if isinstance(t, datetime):
        if t.tzinfo is None:
            t = t.replace(tzinfo=timezone.utc)
        return int(t.timestamp() * 1000)
    if isinstance(t, str):
        dt = datetime.fromisoformat(t.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)
    raise TypeError(f"cannot interpret {t!r} as a time")


@dataclass(frozen=True)
class TimeRange:
    """[start_ms, end_ms) interval in unix millis, UTC."""

    start_ms: int = UNBOUNDED_START
    end_ms: int = UNBOUNDED_END

    @classmethod
    def of(cls, start: "int | str | datetime", end: "int | str | datetime") -> "TimeRange":
        return cls(_to_millis(start), _to_millis(end))

    @classmethod
    def since(cls, start: "int | str | datetime") -> "TimeRange":
        return cls(_to_millis(start), UNBOUNDED_END)

    @classmethod
    def until(cls, end: "int | str | datetime") -> "TimeRange":
        return cls(UNBOUNDED_START, _to_millis(end))

    @classmethod
    def inclusive(cls, start: "int | str | datetime", end: "int | str | datetime") -> "TimeRange":
        """[start, end] — end-inclusive variant. The reference's batch scans
        include the record AT the range end because kafka offset bounds come
        from offsetsForTimes of the end timestamp (FIXTURES.md §1 note);
        this reproduces those literal expected sets."""
        return cls(_to_millis(start), _to_millis(end) + 1)

    @classmethod
    def unbounded(cls) -> "TimeRange":
        return cls()

    def contains(self, ts_ms: int) -> bool:
        return self.start_ms <= ts_ms < self.end_ms

    # --- Spark integration -------------------------------------------------

    def predicate(self, ts: Column, unit: str = "timestamp") -> Column:
        """Boolean Column for this range over an event-time column.

        ``unit='timestamp'`` for TimestampType columns, ``'millis'`` for
        raw unix-millis Long columns. The resulting comparison is a plain
        range predicate, so it reaches the parquet scan as PushedFilters.
        """
        if unit == "millis":
            lo, hi = F.lit(self.start_ms), F.lit(self.end_ms)
            return (ts >= lo) & (ts < hi)
        if unit == "timestamp":
            cond = F.lit(True)
            if self.start_ms > UNBOUNDED_START:
                cond = cond & (ts >= F.timestamp_millis(F.lit(self.start_ms)))
            if self.end_ms < UNBOUNDED_END:
                cond = cond & (ts < F.timestamp_millis(F.lit(self.end_ms)))
            return cond
        raise ValueError(f"unknown unit {unit!r}")

    def kafka_options(self, topic: str, num_partitions: int) -> dict[str, str]:
        """Kafka batch-source options seeking this range broker-side."""
        opts: dict[str, str] = {}
        if self.start_ms > UNBOUNDED_START:
            opts["startingOffsetsByTimestamp"] = json.dumps(
                {topic: {str(p): self.start_ms for p in range(num_partitions)}}
            )
        else:
            opts["startingOffsets"] = "earliest"
        if self.end_ms < UNBOUNDED_END:
            opts["endingOffsetsByTimestamp"] = json.dumps(
                {topic: {str(p): self.end_ms for p in range(num_partitions)}}
            )
        else:
            opts["endingOffsets"] = "latest"
        return opts

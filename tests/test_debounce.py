"""Per-key event-time debounce: emission floor, suppression accounting,
cross-batch state."""

from __future__ import annotations

import json
import os

from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from affinity_spark.streaming.state import debounce_stream

SCHEMA = StructType(
    [StructField("k", StringType()), StructField("ts", TimestampType())]
)


def _write_jsonl(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def _ms(iso: str) -> int:
    import datetime

    return int(
        datetime.datetime.fromisoformat(iso)
        .replace(tzinfo=datetime.timezone.utc)
        .timestamp()
        * 1000
    )


def test_debounce_emits_at_interval_and_counts_suppressed(spark, tmp_path):
    src = str(tmp_path / "in")
    # key a: 10:00:00 (emit), 10:00:20 (suppress), 10:00:40 (suppress),
    #        10:01:05 (emit, 2 suppressed before); key b: single row emits
    _write_jsonl(src, "b1.json", [
        {"k": "a", "ts": "2024-01-01T10:00:00"},
        {"k": "a", "ts": "2024-01-01T10:00:20"},
        {"k": "a", "ts": "2024-01-01T10:00:40"},
        {"k": "a", "ts": "2024-01-01T10:01:05"},
        {"k": "b", "ts": "2024-01-01T10:00:30"},
    ])
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        debounce_stream(stream, "k", "ts", 60_000)
        .writeStream.format("memory")
        .queryName("deb_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.k, r.ts_ms): r.suppressed_before
               for r in spark.sql("select * from deb_out").collect()}
        assert got == {
            ("a", _ms("2024-01-01T10:00:00")): 0,
            ("a", _ms("2024-01-01T10:01:05")): 2,
            ("b", _ms("2024-01-01T10:00:30")): 0,
        }

        # batch 2: state carries across batches — 10:01:30 is inside a's
        # floor (last emit 10:01:05), 10:02:10 emits with 1 suppressed
        _write_jsonl(src, "b2.json", [
            {"k": "a", "ts": "2024-01-01T10:01:30"},
            {"k": "a", "ts": "2024-01-01T10:02:10"},
        ])
        q.processAllAvailable()
        got = {(r.k, r.ts_ms): r.suppressed_before
               for r in spark.sql("select * from deb_out").collect()}
        assert got[("a", _ms("2024-01-01T10:02:10"))] == 1
        assert ("a", _ms("2024-01-01T10:01:30")) not in got
    finally:
        q.stop()

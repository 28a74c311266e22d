"""Streaming observability: watermark-drop accounting surfaces in metrics."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from affinity_spark.streaming.monitor import assert_no_watermark_drops, progress_summary
from affinity_spark.streaming.windows import tumbling_counts

SCHEMA = StructType(
    [StructField("ts", TimestampType()), StructField("k", StringType())]
)


def _write_jsonl(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def test_watermark_drops_are_counted_and_guard_raises(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_jsonl(src, "b1.json", [
        {"ts": "2024-01-01T10:00:00", "k": "a"},
        {"ts": "2024-01-01T12:00:00", "k": "a"},   # advances watermark to 11:50
    ])
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        tumbling_counts(stream, "ts", "k", "10 minutes", "10 minutes")
        .writeStream.format("memory")
        .queryName("mon_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # this row's window [09:00, 09:10) is far behind the 11:50 watermark
        _write_jsonl(src, "b2.json", [{"ts": "2024-01-01T09:00:01", "k": "late"}])
        q.processAllAvailable()

        s = progress_summary(q)
        assert s["total_input_rows"] == 3
        assert s["rows_dropped_by_watermark"] >= 1
        assert s["batches"] >= 2
        with pytest.raises(RuntimeError, match="dropped by watermark"):
            assert_no_watermark_drops(q)
    finally:
        q.stop()


def test_no_drops_guard_passes_on_timely_data(spark, tmp_path):
    src = str(tmp_path / "in2")
    _write_jsonl(src, "b1.json", [{"ts": "2024-01-01T10:00:00", "k": "a"}])
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        tumbling_counts(stream, "ts", "k", "10 minutes", "1 hour")
        .writeStream.format("memory")
        .queryName("mon_out2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert_no_watermark_drops(q)
        assert progress_summary(q)["total_input_rows"] == 1
    finally:
        q.stop()

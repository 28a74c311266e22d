"""T7 per-key change subscription and stream-stream join with watermarks
(SURVEY §2.11, §2.6 J2 two-live-streams case)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _write_jsonl(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def test_per_key_subscription_stream(spark, tmp_path):
    """X5/T7: a subscriber to key k sees exactly that key's changes, in
    order — the changelog readStream filter that replaces the reference's
    WebSocket KeyValueMediator."""
    src = str(tmp_path / "in")
    schema = StructType(
        [StructField("k", LongType()), StructField("ts", LongType()), StructField("v", StringType())]
    )
    _write_jsonl(src, "b1.json", [
        {"k": 1, "ts": 100, "v": "a"}, {"k": 2, "ts": 101, "v": "x"}, {"k": 1, "ts": 102, "v": "b"},
    ])
    stream = spark.readStream.schema(schema).json(src)
    q = (
        stream.filter(F.col("k") == 1)  # the subscription predicate
        .writeStream.format("memory")
        .queryName("sub_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_jsonl(src, "b2.json", [{"k": 2, "ts": 103, "v": "y"}, {"k": 1, "ts": 104, "v": "c"}])
        q.processAllAvailable()
        got = [(r.ts, r.v) for r in spark.sql("select * from sub_out order by ts").collect()]
        assert got == [(100, "a"), (102, "b"), (104, "c")]  # only key 1, in order
    finally:
        q.stop()


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """J2 two live streams: clicks joined to impressions within a time
    bound; both sides watermarked so join state is bounded."""
    imp_src = str(tmp_path / "imp")
    clk_src = str(tmp_path / "clk")
    imp_schema = StructType([StructField("ad", LongType()), StructField("its", StringType())])
    clk_schema = StructType([StructField("ad", LongType()), StructField("cts", StringType())])
    _write_jsonl(imp_src, "b1.json", [
        {"ad": 1, "its": "2024-01-01 10:00:00"},
        {"ad": 2, "its": "2024-01-01 10:01:00"},
    ])
    _write_jsonl(clk_src, "b1.json", [
        {"ad": 1, "cts": "2024-01-01 10:05:00"},   # within 1h of impression
        {"ad": 2, "cts": "2024-01-01 13:00:00"},   # too late: outside bound
    ])
    imp = (
        spark.readStream.schema(imp_schema).json(imp_src)
        .withColumn("its", F.to_timestamp("its"))
        .withWatermark("its", "10 minutes")
    )
    clk = (
        spark.readStream.schema(clk_schema).json(clk_src)
        .withColumn("cts", F.to_timestamp("cts"))
        .withWatermark("cts", "10 minutes")
    )
    joined = imp.join(
        clk,
        (imp["ad"] == clk["ad"])
        & (clk["cts"] >= imp["its"])
        & (clk["cts"] <= imp["its"] + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(imp["ad"], F.date_format("cts", "HH:mm").alias("click_at"))
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = [(r.ad, r.click_at) for r in spark.sql("select * from ssj_out").collect()]
        assert got == [(1, "10:05")]  # ad 2's click fell outside the interval
    finally:
        q.stop()


def test_streaming_dedup_with_watermark(spark, tmp_path):
    """Exact streaming dedup (dropDuplicates on id within the watermark) —
    the streaming tier of the dedup family."""
    src = str(tmp_path / "in")
    schema = StructType(
        [StructField("id", LongType()), StructField("ts", StringType())]
    )
    _write_jsonl(src, "b1.json", [
        {"id": 1, "ts": "2024-01-01 10:00:00"},
        {"id": 2, "ts": "2024-01-01 10:00:05"},
        {"id": 1, "ts": "2024-01-01 10:00:10"},  # dup within batch
    ])
    stream = (
        spark.readStream.schema(schema).json(src)
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # dup across batches also dropped (state remembers id=2)
        _write_jsonl(src, "b2.json", [
            {"id": 2, "ts": "2024-01-01 10:01:00"},
            {"id": 3, "ts": "2024-01-01 10:01:05"},
        ])
        q.processAllAvailable()
        got = sorted(r.id for r in spark.sql("select * from dedup_out").collect())
        assert got == [1, 2, 3]
    finally:
        q.stop()


def test_get_and_update_state_ttl_expires(spark, tmp_path):
    """W5 + per-record TTL (T4): idle key state expires via processing-time
    timeout; the next write sees old=None (the reference's lazy
    delete-on-read, MemStore.java:140-154)."""
    import time as _time

    from affinity_spark.streaming import get_and_update_stream

    src = str(tmp_path / "in")
    schema = StructType([StructField("k", LongType()), StructField("v", LongType())])

    def add_all(old, values):
        return (old or 0) + int(values.sum())

    def wait_for(pred, timeout_s=60):
        # ProcessingTimeTimeout keeps the engine running periodic batches,
        # so processAllAvailable never settles — poll the sink instead.
        deadline = _time.time() + timeout_s
        while _time.time() < deadline:
            rows = [
                (r.key, r.old, r.new)
                for r in spark.sql("select * from ttl_out").collect()
            ]
            if pred(rows):
                return rows
            _time.sleep(0.5)
        raise AssertionError(f"timed out; sink rows: {rows}")

    _write_jsonl(src, "b1.json", [{"k": 1, "v": 10}])
    stream = spark.readStream.schema(schema).json(src)
    q = (
        get_and_update_stream(stream, "k", "v", add_all, ttl_ms=1500)
        .writeStream.format("memory")
        .queryName("ttl_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        wait_for(lambda rows: (1, None, 10) in rows)
        _time.sleep(2.5)  # exceed the 1.5s idle TTL
        # a batch for a DIFFERENT key advances processing time and fires
        # the timeout for key 1
        _write_jsonl(src, "b2.json", [{"k": 2, "v": 7}])
        wait_for(lambda rows: (2, None, 7) in rows)
        _time.sleep(1.0)  # let the timeout batch remove key 1's state
        # key 1 writes again: state must be gone -> old is None, count restarts
        _write_jsonl(src, "b3.json", [{"k": 1, "v": 5}])
        rows = wait_for(lambda rows: len([r for r in rows if r[0] == 1]) >= 2)
        assert (1, None, 10) in rows
        assert (1, None, 5) in rows, rows  # NOT (1, 10, 15): TTL wiped it
    finally:
        q.stop()


def test_native_session_window_streaming(spark, tmp_path):
    """T3 native streaming sessionization: session_window() groups events
    separated by <15min gaps; the batch analog is events_sessionize."""
    src = str(tmp_path / "in")
    schema = StructType([StructField("u", LongType()), StructField("ts", StringType())])
    _write_jsonl(src, "b1.json", [
        {"u": 1, "ts": "2024-01-01 10:00:00"},
        {"u": 1, "ts": "2024-01-01 10:05:00"},   # same session (gap 5m)
        {"u": 1, "ts": "2024-01-01 11:00:00"},   # new session (gap 55m)
        {"u": 1, "ts": "2024-01-02 09:00:00"},   # closes day-1 sessions
    ])
    stream = (
        spark.readStream.schema(schema).json(src)
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "10 minutes")
    )
    agg = (
        stream.groupBy(F.session_window("ts", "15 minutes").alias("w"), "u")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("start"), "u", "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_jsonl(src, "b2.json", [{"u": 1, "ts": "2024-01-02 12:00:00"}])
        q.processAllAvailable()
        got = {(r.start, r.n) for r in spark.sql("select * from sess_out").collect()}
        # two closed day-1 sessions: 10:00 (2 events) and 11:00 (1 event)
        assert ("10:00", 2) in got and ("11:00", 1) in got
    finally:
        q.stop()


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: an impression with NO click inside
    the interval must eventually emit null-padded — but only once the
    watermark proves no matching click can still arrive (the semantics
    that make outer results correct rather than premature)."""
    imp_src = str(tmp_path / "imp2")
    clk_src = str(tmp_path / "clk2")
    imp_schema = StructType([StructField("ad", LongType()), StructField("its", StringType())])
    clk_schema = StructType([StructField("ad", LongType()), StructField("cts", StringType())])
    _write_jsonl(imp_src, "b1.json", [
        {"ad": 1, "its": "2024-01-01 10:00:00"},   # will get a click
        {"ad": 2, "its": "2024-01-01 10:00:00"},   # never clicked
    ])
    _write_jsonl(clk_src, "b1.json", [
        {"ad": 1, "cts": "2024-01-01 10:05:00"},
    ])
    imp = (
        spark.readStream.schema(imp_schema).json(imp_src)
        .withColumn("its", F.to_timestamp("its"))
        .withWatermark("its", "5 minutes")
    )
    clk = (
        spark.readStream.schema(clk_schema).json(clk_src)
        .withColumn("cts", F.to_timestamp("cts"))
        .withWatermark("cts", "5 minutes")
    )
    joined = imp.join(
        clk,
        (imp["ad"] == clk["ad"])
        & (clk["cts"] >= imp["its"])
        & (clk["cts"] <= imp["its"] + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select(imp["ad"], clk["cts"].isNotNull().alias("clicked"))
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        matched = {(r.ad, r.clicked) for r in spark.sql("select * from ssj_outer").collect()}
        assert (1, True) in matched            # inner match emits promptly
        # advance both watermarks far past ad 2's join window
        _write_jsonl(imp_src, "b2.json", [{"ad": 9, "its": "2024-01-01 12:00:00"}])
        _write_jsonl(clk_src, "b2.json", [{"ad": 9, "cts": "2024-01-01 12:00:01"}])
        q.processAllAvailable()
        q.processAllAvailable()  # second cycle lets the outer row flush
        got = {(r.ad, r.clicked) for r in spark.sql("select * from ssj_outer").collect()}
        assert (2, False) in got               # null-padded AFTER watermark
        assert (2, True) not in got
    finally:
        q.stop()

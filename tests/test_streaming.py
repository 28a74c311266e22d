"""Streaming semantics (SURVEY §2.11): continuous count (A2, the
ExampleWordCount acceptance shape), per-key getAndUpdate (W5/W6) with
old/new change emission, watermarked windows (T2), changelog sink (S7).

Driven with a file source feeding micro-batches and a memory sink, the
pytest analog of the reference's embedded-kafka system tests."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from affinity_spark.streaming import (
    changelog_sink,
    read_keyed_table,
    get_and_update_stream,
    running_count_stream,
    tumbling_counts,
)

WORDS_SCHEMA = StructType([StructField("word", StringType())])
KV_SCHEMA = StructType([StructField("k", LongType()), StructField("v", LongType())])


def _write_jsonl(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def _drain(q):
    q.processAllAvailable()


def test_running_count_emits_updated_totals(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_jsonl(src, "b1.json", [{"word": w} for w in ["a", "b", "a"]])
    stream = spark.readStream.schema(WORDS_SCHEMA).json(src)
    q = (
        running_count_stream(stream, "word")
        .writeStream.format("memory")
        .queryName("wc_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _drain(q)
        got1 = {r.word: r["count"] for r in spark.sql("select * from wc_out").collect()}
        assert got1 == {"a": 2, "b": 1}

        _write_jsonl(src, "b2.json", [{"word": w} for w in ["a", "c"]])
        _drain(q)
        rows = spark.sql("select * from wc_out").collect()
        # update-mode memory sink appends each emission; latest per key wins
        latest = {}
        for r in rows:
            latest[r.word] = max(latest.get(r.word, 0), r["count"])
        assert latest == {"a": 3, "b": 1, "c": 1}
    finally:
        q.stop()


def test_get_and_update_emits_old_new_pairs(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_jsonl(src, "b1.json", [{"k": 1, "v": 10}, {"k": 1, "v": 5}, {"k": 2, "v": 7}])
    stream = spark.readStream.schema(KV_SCHEMA).json(src)

    def add_all(old, values):  # running sum: the reference's getAndUpdate f
        return (old or 0) + int(values.sum())

    q = (
        get_and_update_stream(stream, "k", "v", add_all)
        .writeStream.format("memory")
        .queryName("gau_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _drain(q)
        got = {(r.key): (r.old, r.new) for r in spark.sql("select * from gau_out").collect()}
        assert got == {1: (None, 15), 2: (None, 7)}

        _write_jsonl(src, "b2.json", [{"k": 1, "v": 1}])
        _drain(q)
        rows = spark.sql("select * from gau_out where key = 1").collect()
        pairs = sorted([(r.old, r.new) for r in rows], key=lambda p: p[1])
        # second batch observed old=15 -> new=16: the W5 old/new contract
        assert pairs == [(None, 15), (15, 16)]
    finally:
        q.stop()


def test_tumbling_window_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "in")
    schema = StructType([StructField("ts", StringType()), StructField("k", StringType())])
    early = [
        {"ts": "2024-01-01 10:00:00", "k": "x"},
        {"ts": "2024-01-01 10:20:00", "k": "x"},
        {"ts": "2024-01-01 23:50:00", "k": "x"},
        # day-2 record pushes the watermark past the end of the day-1 window
        {"ts": "2024-01-02 23:00:00", "k": "x"},
    ]
    _write_jsonl(src, "b1.json", early)
    stream = (
        spark.readStream.schema(schema)
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        tumbling_counts(stream, "ts", "k", "1 day", "1 hour")
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _drain(q)
        # watermark is now 2024-01-02 22:00 (batch-1 max minus 1h): the day-1
        # window [Jan1, Jan2) ends below it, so a late day-1 record must be
        # dropped (Spark lateness granularity is the window, not the record),
        # and the same batch finalizes the day-1 window in append mode.
        _write_jsonl(src, "b2.json", [{"ts": "2024-01-01 01:00:00", "k": "x"}])
        _drain(q)
        got = {
            (str(r.window_start), r.k): r.n
            for r in spark.sql("select * from win_out").collect()
        }
        # day-1 window emitted with 3 (late row NOT counted)
        assert got.get(("2024-01-01 00:00:00", "x")) == 3
    finally:
        q.stop()


def test_changelog_sink_materializes_keyed_table(spark, tmp_path):
    src = str(tmp_path / "in")
    table = str(tmp_path / "table")
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("ts", LongType()),
            StructField("v", StringType()),
        ]
    )
    _write_jsonl(src, "b1.json", [{"k": 1, "ts": 100, "v": "a"}, {"k": 2, "ts": 100, "v": "b"}])
    stream = spark.readStream.schema(schema).json(src)
    q = changelog_sink(
        stream, table, str(tmp_path / "ckpt"), ["k"], "ts", tiebreak_cols=[]
    ).start()
    try:
        _drain(q)
        got = {r.k: r.v for r in read_keyed_table(spark, table).collect()}
        assert got == {1: "a", 2: "b"}

        # update k=1, insert k=3; stale ts for k=2 must NOT win
        _write_jsonl(
            src,
            "b2.json",
            [
                {"k": 1, "ts": 200, "v": "a2"},
                {"k": 2, "ts": 50, "v": "stale"},
                {"k": 3, "ts": 100, "v": "c"},
            ],
        )
        _drain(q)
        got = {r.k: r.v for r in read_keyed_table(spark, table).collect()}
        assert got == {1: "a2", 2: "b", 3: "c"}
    finally:
        q.stop()


def test_keyed_table_sink_snapshot_versions(spark, tmp_path):
    """keyed_table_sink: every micro-batch commits a new snapshot version;
    the pointer is atomic so readers never see a half-merged batch."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from affinity_spark.sources.keyed_table import KeyedTable
    from affinity_spark.streaming.sinks import keyed_table_sink

    src = str(tmp_path / "in")
    table = KeyedTable(spark, str(tmp_path / "kt"), ["k"], "ts")
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("ts", LongType()),
            StructField("v", StringType()),
        ]
    )
    _write_jsonl(src, "b1.json", [{"k": 1, "ts": 100, "v": "a"}])
    stream = spark.readStream.schema(schema).json(src)
    q = keyed_table_sink(stream, table, str(tmp_path / "ckpt")).start()
    try:
        _drain(q)
        snapshot = {r.k: r.v for r in table.read().collect()}
        assert snapshot == {1: "a"}
        _write_jsonl(src, "b2.json", [{"k": 1, "ts": 200, "v": "a2"}, {"k": 2, "ts": 100, "v": "b"}])
        _drain(q)
        assert {r.k: r.v for r in table.read().collect()} == {1: "a2", 2: "b"}
        # prefix read works straight off the streamed table
        assert table.get({"k": 2}).collect()[0].v == "b"
    finally:
        q.stop()


def test_wordcount_to_wire_format(spark, tmp_path):
    """The reference's full output path (A2 → S7): continuous counts
    serialized as enveloped bytes with murmur2 partition stamping — the
    exact record layout a vanilla Kafka consumer of the reference's output
    topic would see, minus the broker."""
    from affinity_spark.functions.avro_envelope import (
        envelope_payload,
        envelope_schema_id,
        python_wrap,
        wrap_envelope,
    )
    from affinity_spark.functions.murmur2 import kafka_partition_udf, murmur2_partition

    src = str(tmp_path / "in")
    _write_jsonl(src, "b1.json", [{"word": w} for w in ["hello", "hello", "world"]])
    stream = spark.readStream.schema(WORDS_SCHEMA).json(src)
    counts = running_count_stream(stream, "word")
    wire = counts.select(
        F.encode(F.col("word"), "utf-8").alias("key"),
        wrap_envelope(7, F.encode(F.to_json(F.struct("word", "count")), "utf-8")).alias(
            "value"
        ),
    ).withColumn("partition", kafka_partition_udf(8)(F.col("key")))
    q = (
        wire.writeStream.format("memory")
        .queryName("wire_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _drain(q)
        rows = spark.sql("select * from wire_out").collect()
        assert len(rows) == 2  # hello, world
        for r in rows:
            word = bytes(r.key).decode()
            # partition matches the vanilla kafka default partitioner
            assert r.partition == murmur2_partition(bytes(r.key), 8)
            # envelope: magic 0 + schema id 7 + json payload
            assert bytes(r.value)[:5] == python_wrap(7, b"")[:5]
            payload = json.loads(bytes(r.value)[5:])
            assert payload["word"] == word
            assert payload["count"] == (2 if word == "hello" else 1)
    finally:
        q.stop()


def test_latest_n_stream_ring_buffer(spark, tmp_path):
    """X6 streaming: per-key last-3 ring buffer, insertion-ordered,
    continued across batches from state."""
    from affinity_spark.streaming.state import latest_n_stream

    src = str(tmp_path / "in")
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("v", StringType()),
            StructField("seq", LongType()),
        ]
    )
    _write_jsonl(src, "b1.json", [
        {"k": 1, "v": "a", "seq": 1},
        {"k": 1, "v": "b", "seq": 2},
        {"k": 2, "v": "x", "seq": 3},
    ])
    stream = spark.readStream.schema(schema).json(src)
    q = (
        latest_n_stream(stream, "k", "v", "seq", n=3)
        .writeStream.format("memory")
        .queryName("ring_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.k: list(r.items) for r in spark.sql("select * from ring_out").collect()}
        assert got == {1: ["a", "b"], 2: ["x"]}

        # four more for key 1: buffer keeps only the newest 3, in order
        _write_jsonl(src, "b2.json", [
            {"k": 1, "v": c, "seq": 10 + i} for i, c in enumerate(["c", "d", "e", "f"])
        ])
        q.processAllAvailable()
        rows = spark.sql("select * from ring_out").collect()
        latest = {}
        for r in rows:
            latest[r.k] = list(r.items)  # update-mode: last emission wins
        assert latest[1] == ["d", "e", "f"]
        assert latest[2] == ["x"]
    finally:
        q.stop()


def test_sliding_window_counts_each_event_in_two_hops(spark, tmp_path):
    import json as _json
    import os as _os

    from affinity_spark.streaming.windows import sliding_counts

    src = str(tmp_path / "slide_src")
    _os.makedirs(src)
    rows = [
        {"ts": "2024-03-01 10:05:00", "k": "a"},
        {"ts": "2024-03-01 10:50:00", "k": "a"},
        {"ts": "2024-03-01 11:10:00", "k": "b"},
    ]
    with open(_os.path.join(src, "b0.json"), "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("ts string, k string")
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = sliding_counts(stream, "ts", "k", "2 hours", "1 hour", "10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("slide_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r.window_start), r.k): r.n
            for r in spark.sql("SELECT * FROM slide_sink").collect()
        }
    finally:
        q.stop()
    # both 10:xx 'a' events: hop windows 09:00-11:00 and 10:00-12:00
    assert got[("2024-03-01 09:00:00", "a")] == 2
    assert got[("2024-03-01 10:00:00", "a")] == 2
    # the 11:10 'b' event: windows 10:00-12:00 and 11:00-13:00
    assert got[("2024-03-01 10:00:00", "b")] == 1
    assert got[("2024-03-01 11:00:00", "b")] == 1
    # each event in exactly 2 hops -> total count doubles the input
    assert sum(got.values()) == 2 * len(rows)

"""Streaming state operators vs their batch changelog-replay twins.

The driver's oracle gate can only check batch queries; these tests close
the loop the other way: the SAME changelog fed to the streaming operator
(one event per micro-batch, so emission granularity matches) and replayed
through the batch twin's window logic must produce identical observable
output — (old, new) pairs for W5/W6, final ring-buffer state for X6.
This pins that `events_update_pairs` / `events_latest_n_state` really are
the streaming operators' contracts, not merely similar-looking queries.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import Window
from pyspark.sql.types import LongType, StringType, StructField, StructType

from affinity_spark.streaming import get_and_update_stream
from affinity_spark.streaming.state import latest_n_stream

EVENTS = [
    {"seq": 1, "k": 1, "v": 10},
    {"seq": 2, "k": 2, "v": 5},
    {"seq": 3, "k": 1, "v": 7},
    {"seq": 4, "k": 1, "v": -3},
    {"seq": 5, "k": 2, "v": 9},
    {"seq": 6, "k": 1, "v": 2},
]


def _write_one_per_file(dirpath: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    base = 1_700_000_000
    for ev in EVENTS:
        tmp = os.path.join(dirpath, f".b{ev['seq']}.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps(ev) + "\n")
        dest = os.path.join(dirpath, f"b{ev['seq']}.json")
        os.rename(tmp, dest)
        # the file source orders batches by modification time; sub-ms writes
        # tie, so pin strictly increasing mtimes to fix the changelog order
        os.utime(dest, (base + ev["seq"], base + ev["seq"]))


def _changelog_df(spark):
    return spark.createDataFrame(
        [(e["seq"], e["k"], e["v"]) for e in EVENTS], "seq long, k long, v long"
    )


def test_get_and_update_stream_matches_batch_update_pairs(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_one_per_file(src)
    schema = StructType(
        [
            StructField("seq", LongType()),
            StructField("k", LongType()),
            StructField("v", LongType()),
        ]
    )

    def add_all(old, values):
        return (old or 0) + int(values.sum())

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one event per batch = per-event pairs
        .json(src)
    )
    q = (
        get_and_update_stream(stream, "k", "v", add_all)
        .writeStream.format("memory")
        .queryName("twin_pairs")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.key, r.old, r.new)
            for r in spark.sql("select * from twin_pairs").collect()
        }
    finally:
        q.stop()

    # batch twin: running sum + lag over the same changelog order
    w_run = (
        Window.partitionBy("k")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy("k").orderBy("seq")
    stepped = _changelog_df(spark).select(
        "k", "seq", F.sum("v").over(w_run).alias("new")
    )
    batch = {
        (r.k, r.old, r.new)
        for r in stepped.select(
            "k", F.lag("new", 1).over(w_lag).alias("old"), "new"
        ).collect()
    }
    assert streamed == batch
    assert (1, None, 10) in batch and (1, 14, 16) in batch  # spot anchors


def test_latest_n_stream_final_state_matches_batch_twin(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_one_per_file(src)
    schema = StructType(
        [
            StructField("seq", LongType()),
            StructField("k", LongType()),
            StructField("v", LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one event per batch, so the
        .json(src)                        # model's per-event states apply
    )
    q = (
        latest_n_stream(stream, "k", "v", "seq", n=3)
        .writeStream.format("memory")
        .queryName("twin_ring")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # collect() row order across batches is NOT a contract — compare
        # the SET of per-batch ring-state emissions instead, which also
        # pins every intermediate state, not just the last one
        rows = spark.sql("select * from twin_ring").collect()
        emitted = {(r.k, tuple(r.items)) for r in rows}
    finally:
        q.stop()

    # python model: ring state after each event (one event per batch)
    rings: dict[int, list[str]] = {}
    expected = set()
    for ev in EVENTS:
        buf = rings.setdefault(ev["k"], [])
        buf.append(str(ev["v"]))
        if len(buf) > 3:
            buf.pop(0)
        expected.add((ev["k"], tuple(buf)))
    assert emitted == expected
    assert (1, ("7", "-3", "2")) in emitted  # final ring dropped key 1's first write

    # and the batch twin reproduces each key's FINAL state
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    last3 = (
        _changelog_df(spark)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    batch = {
        r.k: tuple(str(s.v) for s in sorted(r.rs, key=lambda x: x.seq))
        for r in last3.groupBy("k").agg(
            F.collect_list(F.struct("seq", "v")).alias("rs")
        ).collect()
    }
    assert batch == {k: tuple(buf) for k, buf in rings.items()}


def test_debounce_stream_matches_batch_replay(spark, tmp_path):
    """The T7 debounce twin: the same per-key ts changelog fed one event
    per micro-batch through debounce_stream and replayed through
    debounce_replay must emit identical (key, ts_ms, suppressed_before)
    rows — including the suppressed-run count riding on the NEXT emission
    across batch boundaries."""
    from affinity_spark.streaming.state import debounce_replay, debounce_stream

    interval = 100
    # key a: emit@1000, suppress 1050/1090, emit@1100 (sup=2), emit@1300
    # key b: single row; key c: all within one window after the first
    ticks = [
        ("a", 1000), ("a", 1050), ("a", 1090), ("a", 1100), ("a", 1300),
        ("b", 500),
        ("c", 2000), ("c", 2010), ("c", 2020),
    ]
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    base = 1_700_000_000
    for i, (k, t) in enumerate(ticks):
        tmp = os.path.join(src, f".d{i}.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps({"k": k, "ts": t}) + "\n")
        dest = os.path.join(src, f"d{i}.json")
        os.rename(tmp, dest)
        os.utime(dest, (base + i, base + i))

    schema = StructType(
        [StructField("k", StringType()), StructField("ts", LongType())]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
    )
    q = (
        debounce_stream(stream, "k", "ts", interval)
        .writeStream.format("memory")
        .queryName("twin_debounce")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.k, r.ts_ms, r.suppressed_before)
            for r in spark.sql("select * from twin_debounce").collect()
        }
    finally:
        q.stop()

    batch_df = spark.createDataFrame(ticks, "k string, ts long")
    batch = {
        tuple(r) for r in debounce_replay(batch_df, "k", "ts", interval).collect()
    }
    assert streamed == batch
    assert ("a", 1100, 2) in batch      # suppressed run rode the next emission
    assert ("a", 1300, 0) in batch
    assert ("b", 500, 0) in batch       # first row per key always emits
    assert ("c", 2000, 0) in batch and len([r for r in batch if r[0] == "c"]) == 1


def test_online_lsh_stream_matches_batch_replay(spark, tmp_path):
    """The streaming near-dup bucket state twin: docs arriving one per
    micro-batch in id order emit the same per-band candidate rows as the
    batch replay over the whole corpus (jaccard compared in floored basis
    points to keep the comparison float-free)."""
    from affinity_spark.streaming.dedup_stream import (
        online_lsh_replay,
        streaming_near_dup_candidates,
    )

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near-dup of 1
        (3, "one two three four five six seven eight"),
        (4, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
        (5, "totally different words everywhere here now then"),
    ]
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    base = 1_700_000_000
    for i, (did, text) in enumerate(docs):
        tmp = os.path.join(src, f".l{i}.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        dest = os.path.join(src, f"l{i}.json")
        os.rename(tmp, dest)
        os.utime(dest, (base + i, base + i))

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
    )
    q = (
        streaming_near_dup_candidates(stream, "doc_id", "text", n=3, threshold=0.5)
        .writeStream.format("memory")
        .queryName("twin_lsh")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = sorted(
            (r.doc_id, r.dup_of, int(r.jaccard * 10000 + 1e-9))
            for r in spark.sql("select * from twin_lsh").collect()
        )
    finally:
        q.stop()

    batch_df = spark.createDataFrame(docs, "doc_id long, text string")
    batch = sorted(
        tuple(r)
        for r in online_lsh_replay(batch_df, "doc_id", "text", 3).collect()
    )
    assert streamed == batch
    assert (4, 1, 10000) in batch  # the exact dup matches in every band
    assert any(d == 2 and o == 1 for d, o, _ in batch)  # near-dup found

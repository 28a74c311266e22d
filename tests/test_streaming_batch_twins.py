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

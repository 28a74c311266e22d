"""Edge cases across operators: empty inputs, null keys, W3 insert-only,
P4 range materialize, S5 bootstrap (availableNow) trigger."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from affinity_spark import TimeRange
from affinity_spark.operators import dedup as dd
from affinity_spark.operators.kv import compact_latest, range_materialize
from affinity_spark.operators.topk import global_top_n, top_n_per_group
from affinity_spark.operators.upsert import delete_keys, insert_only, merge_upsert


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_empty_inputs_produce_empty_outputs(spark):
    log = _empty(spark, "k int, ts long, v string")
    assert compact_latest(log, ["k"], "ts").count() == 0
    assert merge_upsert(log, log, ["k"], "ts").count() == 0
    docs = _empty(spark, "doc_id int, text string")
    assert dd.dedup_exact(docs, "doc_id", "text").count() == 0
    assert dd.shingle_table(docs, "doc_id", "text").count() == 0
    assert top_n_per_group(log, ["k"], [F.col("ts").desc()], 3).count() == 0
    assert global_top_n(log, [F.col("ts").desc()], 3).count() == 0


def test_compact_latest_null_key_is_a_group(spark):
    rows = [(None, 100, "a"), (None, 200, "b"), (1, 100, "c")]
    df = spark.createDataFrame(rows, "k int, ts long, v string")
    got = {r.k: r.v for r in compact_latest(df, ["k"], "ts").collect()}
    # SQL GROUP BY semantics: nulls form one group; latest wins inside it
    assert got == {None: "b", 1: "c"}


def test_dedup_empty_and_whitespace_docs(spark):
    rows = [(1, ""), (2, "   "), (3, "one two three four")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # shingle table simply has no rows for degenerate docs — no nulls/crash
    sh = dd.shingle_table(df, "doc_id", "text", 3)
    assert sorted({r.doc_id for r in sh.collect()}) == [3]
    # exact dedup still fingerprints them (empty and blank normalize equal)
    groups = dd.dedup_exact(df, "doc_id", "text").collect()
    sizes = sorted(g.n_copies for g in groups)
    assert sizes == [1, 2]


def test_insert_only_w3(spark):
    base = spark.createDataFrame([(1, 100, "a")], "k int, ts long, v string")
    updates = spark.createDataFrame(
        [(1, 999, "clobber"), (2, 100, "b")], "k int, ts long, v string"
    )
    got = {r.k: r.v for r in insert_only(base, updates, ["k"]).collect()}
    # existing key NOT overwritten (insert fails silently set-wise), new key added
    assert got == {1: "a", 2: "b"}


def test_delete_keys_w4(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    keys = spark.createDataFrame([(2,), (99,)], "k int")
    got = sorted(r.k for r in delete_keys(base, keys, ["k"]).collect())
    assert got == [1, 3]  # deleting an absent key is a no-op


def test_range_materialize_p4(spark):
    rows = [("a", 1, 100), ("a", 2, 200), ("a", 3, 300), ("b", 9, 200)]
    df = spark.createDataFrame(rows, "key string, sub int, ts long")
    got = range_materialize(df, {"key": "a"}, TimeRange.of(150, 250), "ts", "millis")
    assert [r.sub for r in got] == [2]


def test_available_now_bootstrap_trigger(spark, tmp_path):
    """S5 bootstrap-sync: drain everything currently in the log, then stop
    (the reference's sync=true replay-to-end gate) — Trigger.AvailableNow."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "b1.json"), "w") as f:
        for i in range(5):
            f.write(json.dumps({"k": i}) + "\n")
    stream = spark.readStream.schema("k long").json(src)
    q = (
        stream.writeStream.format("memory")
        .queryName("boot_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert not q.isActive  # drained and stopped by itself
    assert spark.sql("select * from boot_out").count() == 5

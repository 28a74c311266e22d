"""Incremental view maintenance: delta aggregates with retractions."""

from __future__ import annotations

import json
import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from affinity_spark.streaming.ivm import (
    apply_agg_delta,
    batch_delta_agg,
    incremental_agg_sink,
)
from affinity_spark.streaming.sinks import read_keyed_table

CH_SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("cents", LongType()),
        StructField("op", LongType()),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, cents long, op long")


def test_delta_agg_combines_ops_per_key(spark):
    d = batch_delta_agg(
        _batch(spark, [("a", 100, 1), ("a", 50, 1), ("a", 100, -1), ("b", 10, 1)]),
        ["k"],
        "cents",
    )
    got = {r.k: (r.d_count, r.d_cents) for r in d.collect()}
    assert got == {"a": (1, 50), "b": (1, 10)}


def test_apply_delta_inserts_updates_and_retracts_to_zero(spark):
    base = None
    # batch 1: two inserts for a, one for b
    d1 = batch_delta_agg(
        _batch(spark, [("a", 100, 1), ("a", 200, 1), ("b", 5, 1)]), ["k"], "cents"
    )
    v1 = apply_agg_delta(base, d1, ["k"])
    assert {r.k: (r.n, r.cents) for r in v1.collect()} == {"a": (2, 300), "b": (1, 5)}

    # batch 2: retract one a-row, retract the only b-row, insert c
    d2 = batch_delta_agg(
        _batch(spark, [("a", 100, -1), ("b", 5, -1), ("c", 7, 1)]), ["k"], "cents"
    )
    v2 = apply_agg_delta(v1, d2, ["k"])
    got = {r.k: (r.n, r.cents) for r in v2.collect()}
    # b vanished: its retraction history is complete
    assert got == {"a": (1, 200), "c": (1, 7)}


def test_maintained_equals_recomputed_under_churn(spark):
    import random

    rng = random.Random(7)
    live: list[tuple[str, int]] = []
    view = None
    all_rows: list[tuple[str, int, int]] = []
    for _ in range(5):
        batch = []
        for _ in range(20):
            if live and rng.random() < 0.4:
                k, c = live.pop(rng.randrange(len(live)))
                batch.append((k, c, -1))
            else:
                k, c = f"k{rng.randrange(6)}", rng.randrange(1, 500)
                live.append((k, c))
                batch.append((k, c, 1))
        all_rows += batch
        view = apply_agg_delta(
            view, batch_delta_agg(_batch(spark, batch), ["k"], "cents"), ["k"]
        )
        # collapse lineage like a real maintained table would via its snapshot
        view = spark.createDataFrame(view.collect(), view.schema)

    want: dict[str, tuple[int, int]] = {}
    for k, c in live:
        n, cents = want.get(k, (0, 0))
        want[k] = (n + 1, cents + c)
    got = {r.k: (r.n, r.cents) for r in view.collect()}
    assert got == {k: v for k, v in want.items() if v[0] != 0}


def _write_jsonl(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def test_sink_replay_of_applied_batch_is_noop(spark, tmp_path):
    """Crash between snapshot commit and checkpoint advance replays the
    batch; the recorded ivm_batch_id must make the second apply a no-op
    instead of double-counting the deltas."""
    from affinity_spark.sources.keyed_table import KeyedTable

    table = str(tmp_path / "agg_table")
    sink = incremental_agg_sink(table, ["k"], "cents", run_id="ckpt-1")
    b0 = _batch(spark, [("a", 100, 1), ("b", 7, 1)])
    sink(b0, 0)
    sink(b0, 0)  # simulated foreachBatch replay after a crash
    got = {r.k: (r.n, r.cents) for r in read_keyed_table(spark, table).collect()}
    assert got == {"a": (1, 100), "b": (1, 7)}

    sink(_batch(spark, [("a", 50, 1)]), 1)
    got = {r.k: (r.n, r.cents) for r in read_keyed_table(spark, table).collect()}
    assert got == {"a": (2, 150), "b": (1, 7)}

    # maintenance writes must not erase the replay marker
    tbl = KeyedTable(spark, table, ["k"], "")
    assert tbl.commit_meta() == {"ivm_run": "ckpt-1", "ivm_batch_id": 1}
    tbl.compact(target_file_bytes=1 << 30)
    assert tbl.commit_meta() == {"ivm_run": "ckpt-1", "ivm_batch_id": 1}
    sink(_batch(spark, [("a", 50, 1)]), 1)  # replay after maintenance
    got = {r.k: (r.n, r.cents) for r in read_keyed_table(spark, table).collect()}
    assert got == {"a": (2, 150), "b": (1, 7)}

    # a NEW lineage (fresh checkpoint -> batch ids restart at 0) must NOT
    # be silently discarded: its batch 0 applies and resets the marker
    sink2 = incremental_agg_sink(table, ["k"], "cents", run_id="ckpt-2")
    sink2(_batch(spark, [("c", 9, 1)]), 0)
    got = {r.k: (r.n, r.cents) for r in read_keyed_table(spark, table).collect()}
    assert got == {"a": (2, 150), "b": (1, 7), "c": (1, 9)}
    assert tbl.commit_meta() == {"ivm_run": "ckpt-2", "ivm_batch_id": 0}
    sink2(_batch(spark, [("c", 9, 1)]), 0)  # replay within the new lineage
    got = {r.k: (r.n, r.cents) for r in read_keyed_table(spark, table).collect()}
    assert got == {"a": (2, 150), "b": (1, 7), "c": (1, 9)}


def test_streaming_maintained_aggregate_with_retractions(spark, tmp_path):
    src = str(tmp_path / "in")
    table = str(tmp_path / "agg_table")
    _write_jsonl(
        src, "b1.json",
        [{"k": "a", "cents": 100, "op": 1}, {"k": "a", "cents": 40, "op": 1},
         {"k": "b", "cents": 7, "op": 1}],
    )
    stream = spark.readStream.schema(CH_SCHEMA).json(src)
    q = (
        stream.writeStream.foreachBatch(
            incremental_agg_sink(table, ["k"], "cents", run_id=str(tmp_path / "ckpt"))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.k: (r.n, r.cents) for r in read_keyed_table(spark, table).collect()}
        assert got == {"a": (2, 140), "b": (1, 7)}

        _write_jsonl(
            src, "b2.json",
            [{"k": "a", "cents": 100, "op": -1}, {"k": "b", "cents": 7, "op": -1}],
        )
        q.processAllAvailable()
        got = {r.k: (r.n, r.cents) for r in read_keyed_table(spark, table).collect()}
        assert got == {"a": (1, 40)}
    finally:
        q.stop()

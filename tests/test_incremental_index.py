"""X1 incremental index maintenance: the inverted index is a view over
streamed keyed state, so updating a record re-indexes it and a tombstone
deindexes it — the reference's change-listener index maintenance
(KVStoreLocal.scala:195-248) without a bespoke index-write path."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from affinity_spark.functions.text import tokenize
from affinity_spark.operators.index import build_inverted_index, index_lookup
from affinity_spark.sources.keyed_table import KeyedTable
from affinity_spark.streaming.sinks import keyed_table_sink

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("title", StringType()),
        StructField("ts", LongType()),
        StructField("dead", BooleanType()),
    ]
)


def _feed(src, name, rows):
    os.makedirs(src, exist_ok=True)
    tmp = os.path.join(src, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(src, name))


def _lookup(table, word):
    live = table.read()
    if "dead" in live.columns:
        live = live.filter(~F.col("dead"))
    idx = build_inverted_index(live, ["id"], lambda d: tokenize(d["title"]), index_col="w")
    return sorted(r.id for r in index_lookup(idx, live, word, ["id"], index_col="w").collect())


def test_incremental_index_maintenance(spark, tmp_path):
    src = str(tmp_path / "in")
    table = KeyedTable(spark, str(tmp_path / "kt"), ["id"], "ts", tombstone_col=None)
    _feed(src, "b1.json", [
        {"id": 1, "title": "spark streaming guide", "ts": 100, "dead": False},
        {"id": 2, "title": "kafka spark pipelines", "ts": 100, "dead": False},
    ])
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = keyed_table_sink(stream, table, str(tmp_path / "ckpt")).start()
    try:
        q.processAllAvailable()
        assert _lookup(table, "spark") == [1, 2]
        assert _lookup(table, "kafka") == [2]

        # UPDATE: article 1 retitled — old word must vanish, new word appear
        _feed(src, "b2.json", [
            {"id": 1, "title": "flink internals", "ts": 200, "dead": False},
        ])
        q.processAllAvailable()
        assert _lookup(table, "spark") == [2]      # 1 deindexed from 'spark'
        assert _lookup(table, "flink") == [1]      # and indexed under 'flink'
        assert _lookup(table, "streaming") == []   # old title fully gone

        # TOMBSTONE: article 2 deleted — deindexed everywhere
        _feed(src, "b3.json", [
            {"id": 2, "title": "", "ts": 300, "dead": True},
        ])
        q.processAllAvailable()
        assert _lookup(table, "kafka") == []
        assert _lookup(table, "spark") == []
        assert _lookup(table, "flink") == [1]
    finally:
        q.stop()

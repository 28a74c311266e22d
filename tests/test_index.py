"""Secondary index (X1-X3): build, lookup, time-bounded lookup,
delete-by-index (ESecondaryIndexSpec behaviors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from affinity_spark import TimeRange
from affinity_spark.functions.text import tokenize
from affinity_spark.operators.index import build_inverted_index, delete_by_index, index_lookup


def _articles(spark):
    rows = [
        (1, "spark engine internals", 1000),
        (2, "streaming with spark", 2000),
        (3, "rocksdb state store", 3000),
    ]
    return spark.createDataFrame(rows, "id int, title string, ts long")


def test_build_and_lookup(spark):
    art = _articles(spark)
    idx = build_inverted_index(art, ["id"], lambda d: tokenize(d["title"]), ts_col="ts", index_col="word")
    got = index_lookup(idx, art, "spark", ["id"], index_col="word")
    assert sorted(r.id for r in got.collect()) == [1, 2]


def test_time_bounded_lookup(spark):
    art = _articles(spark)
    idx = build_inverted_index(art, ["id"], lambda d: tokenize(d["title"]), ts_col="ts", index_col="word")
    got = index_lookup(
        idx, art, "spark", ["id"],
        time_range=TimeRange.of(1500, 2500), ts_col="ts", ts_unit="millis",
        index_col="word",
    )
    assert [r.id for r in got.collect()] == [2]


def test_missing_term_empty(spark):
    art = _articles(spark)
    idx = build_inverted_index(art, ["id"], lambda d: tokenize(d["title"]), index_col="word")
    assert index_lookup(idx, art, "nonexistent", ["id"], index_col="word").count() == 0


def test_delete_by_index(spark):
    art = _articles(spark)
    idx = build_inverted_index(art, ["id"], lambda d: tokenize(d["title"]), index_col="word")
    remaining = delete_by_index(idx, art, "spark", ["id"], index_col="word")
    assert [r.id for r in remaining.collect()] == [3]

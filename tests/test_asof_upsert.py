"""As-of join (union+window scheme) and batch MERGE semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from affinity_spark.operators.asof import asof_join
from affinity_spark.operators.upsert import merge_upsert


def _quotes(spark):
    rows = [
        ("A", 100, 10.0),
        ("A", 200, 11.0),
        ("A", 300, 12.0),
        ("B", 150, 99.0),
    ]
    return spark.createDataFrame(rows, "sym string, qts long, px double")


def _trades(spark):
    rows = [
        ("A", 50, 1),   # before any quote
        ("A", 200, 2),  # exactly at a quote
        ("A", 250, 3),  # between quotes
        ("B", 400, 4),
        ("C", 100, 5),  # no quotes at all
    ]
    return spark.createDataFrame(rows, "sym string, tts long, qty int")


def test_asof_nonstrict(spark):
    got = asof_join(
        _trades(spark), _quotes(spark), ["sym"], "tts", "qts", ["px", "qts"]
    )
    by_qty = {r.qty: (r.px, r.qts) for r in got.collect()}
    assert by_qty[1] == (None, None)      # nothing at/before ts=50
    assert by_qty[2] == (11.0, 200)       # equal ts visible (non-strict)
    assert by_qty[3] == (11.0, 200)
    assert by_qty[4] == (99.0, 150)
    assert by_qty[5] == (None, None)      # key with no right rows
    assert len(by_qty) == 5               # left-outer: every trade kept


def test_asof_strict_excludes_equal_ts(spark):
    got = asof_join(
        _trades(spark), _quotes(spark), ["sym"], "tts", "qts", ["px"], strict=True
    )
    by_qty = {r.qty: r.px for r in got.collect()}
    assert by_qty[2] == 10.0  # quote at ts=200 NOT visible; falls back to 100


def test_merge_upsert_last_write_wins(spark):
    base = spark.createDataFrame(
        [(1, 100, "a"), (2, 100, "b")], "k long, ts long, v string"
    )
    updates = spark.createDataFrame(
        [(1, 200, "a2"), (2, 50, "stale"), (3, 100, "c")], "k long, ts long, v string"
    )
    got = {r.k: r.v for r in merge_upsert(base, updates, ["k"], "ts").collect()}
    assert got == {1: "a2", 2: "b", 3: "c"}


def test_merge_upsert_update_wins_exact_tie(spark):
    base = spark.createDataFrame([(1, 100, "old")], "k long, ts long, v string")
    updates = spark.createDataFrame([(1, 100, "new")], "k long, ts long, v string")
    got = merge_upsert(base, updates, ["k"], "ts").collect()
    assert got[0].v == "new"  # replay of an update batch must win (W1)


def test_merge_upsert_tombstone_removes_key(spark):
    base = spark.createDataFrame(
        [(1, 100, "a", False), (2, 100, "b", False)], "k long, ts long, v string, dead boolean"
    )
    updates = spark.createDataFrame(
        [(1, 200, None, True)], "k long, ts long, v string, dead boolean"
    )
    got = {r.k: r.v for r in merge_upsert(base, updates, ["k"], "ts", tombstone_col="dead").collect()}
    assert got == {2: "b"}

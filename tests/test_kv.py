"""KV read semantics (SURVEY §2.2): point get, prefix+range scan, TTL,
log compaction with tombstones — reference KVStoreLocal.scala:263-349,
LogRDD.compact spark/.../LogRDD.scala:51-63."""

from __future__ import annotations

from pyspark.sql import functions as F

from affinity_spark import TimeRange
from affinity_spark.operators.kv import compact_latest, point_get, prefix_scan, ttl_filter


def _log(spark):
    # (key, ts-millis, value, tombstone) changelog
    rows = [
        ("a", 1000, "v1", False),
        ("a", 3000, "v3", False),
        ("a", 2000, "v2", False),
        ("b", 1000, "w1", False),
        ("b", 5000, None, True),  # tombstone after w1
        ("c", 1000, "x1", False),
    ]
    return spark.createDataFrame(rows, "key string, ts long, value string, dead boolean")


def test_compact_latest_picks_max_ts(spark):
    got = {
        r.key: r.value
        for r in compact_latest(_log(spark), ["key"], "ts").collect()
    }
    assert got == {"a": "v3", "b": None, "c": "x1"}


def test_compact_latest_tombstone_elimination(spark):
    got = {
        r.key: r.value
        for r in compact_latest(_log(spark), ["key"], "ts", tombstone_col="dead").collect()
    }
    # b's latest record is a tombstone -> key disappears entirely
    assert got == {"a": "v3", "c": "x1"}


def test_compact_latest_tiebreak_deterministic(spark):
    rows = [("k", 1000, 1, "first"), ("k", 1000, 2, "second")]
    df = spark.createDataFrame(rows, "key string, ts long, seq int, value string")
    got = compact_latest(df, ["key"], "ts", tiebreak_cols=["seq"]).collect()
    assert got[0].value == "second"


def test_point_get(spark):
    df = _log(spark)
    got = point_get(df, {"key": "a", "ts": 2000}).collect()
    assert len(got) == 1 and got[0].value == "v2"
    assert point_get(df, {"key": "zzz"}).count() == 0


def test_prefix_scan_with_range(spark):
    df = _log(spark)
    got = prefix_scan(df, {"key": "a"}, TimeRange.of(1500, 3000), "ts", ts_unit="millis")
    assert sorted(r.value for r in got.collect()) == ["v2"]


def test_ttl_filter_millis(spark):
    df = _log(spark)
    # now=5000, ttl=2500 -> keep ts >= 2500
    got = ttl_filter(df, "ts", 2500, 5000, ts_unit="millis")
    assert sorted(r.ts for r in got.collect()) == [3000, 5000]


def test_point_get_pushdown_reaches_scan(spark, tmp_path):
    """The predicate must reach the parquet scan as a pushed filter."""
    p = str(tmp_path / "kv.parquet")
    _log(spark).write.mode("overwrite").parquet(p)
    plan = point_get(spark.read.parquet(p), {"key": "a"})._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "IsNotNull(key)" in plan


def test_approx_num_keys(spark):
    from affinity_spark.operators.kv import approx_num_keys

    df = spark.createDataFrame([(i % 50, i) for i in range(1000)], "k int, v long")
    got = approx_num_keys(df, ["k"]).collect()[0]
    # HLL estimate of 50 distinct keys lands within its default 5% rsd
    assert 45 <= got[0] <= 55

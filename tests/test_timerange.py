"""TimeRange semantics mirror affinity api/.../util/TimeRange.java:76-196:
half-open [start, end), ISO-8601 parsing, unbounded sentinels."""

from __future__ import annotations

from affinity_spark import TimeRange


def test_of_iso_half_open():
    tr = TimeRange.of("2024-01-10T00:00:00Z", "2024-01-20T00:00:00Z")
    assert tr.contains(tr.start_ms)
    assert tr.contains(tr.end_ms - 1)
    assert not tr.contains(tr.end_ms)
    assert not tr.contains(tr.start_ms - 1)


def test_of_millis():
    tr = TimeRange.of(1000, 2000)
    assert tr.start_ms == 1000 and tr.end_ms == 2000


def test_since_until_unbounded():
    assert TimeRange.since(5000).contains(10**15)
    assert not TimeRange.since(5000).contains(4999)
    assert TimeRange.until(5000).contains(0)
    assert not TimeRange.until(5000).contains(5000)
    ub = TimeRange.unbounded()
    assert ub.contains(0) and ub.contains(10**15)


def test_predicate_on_timestamp(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00"), (2, "2024-01-15 00:00:00"), (3, "2024-01-25 00:00:00")],
        "id int, ts_str string",
    ).withColumn("ts", F.to_timestamp("ts_str"))
    tr = TimeRange.of("2024-01-10T00:00:00Z", "2024-01-20T00:00:00Z")
    got = [r.id for r in df.filter(tr.predicate(F.col("ts"))).collect()]
    assert got == [2]


def test_predicate_on_millis(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 500), (2, 1500), (3, 2500)], "id int, ts long")
    tr = TimeRange.of(1000, 2000)
    got = [r.id for r in df.filter(tr.predicate(F.col("ts"), "millis")).collect()]
    assert got == [2]

"""Kafka-partitioner compatibility (mirrors the invariant tested by the
reference's KafkaPartitionerSpec: affinity routing == kafka default
partitioner on the serialized key)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from affinity_spark.functions.murmur2 import murmur2, murmur2_partition

# Regression vectors for Apache Kafka's public murmur2 semantics
# (seed 0x9747b28c, m 0x5bd1e995, r 24, signed 32-bit java-int arithmetic).
# Values were cross-validated against an independent bit-exact transliteration
# of the published Java algorithm over 5000 random inputs.
KNOWN = {
    b"": 275646681,
    b"a": -1563381124,
    b"ab": 316155434,
    b"abc": 479470107,
    b"abcd": -1323649548,
    b"key-0": 29210041,
    b"\x00\x01\x02\x03": 1916244640,
}


def test_known_vectors():
    for data, expect in KNOWN.items():
        assert murmur2(data) == expect, data


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_signed_int32_range(data):
    h = murmur2(data)
    assert -(1 << 31) <= h < (1 << 31)
    # deterministic
    assert murmur2(data) == h


@given(st.binary(min_size=1, max_size=32), st.integers(min_value=1, max_value=64))
@settings(max_examples=200, deadline=None)
def test_partition_placement(data, n):
    p = murmur2_partition(data, n)
    assert 0 <= p < n
    assert p == (murmur2(data) & 0x7FFFFFFF) % n


def test_partition_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from affinity_spark.functions.murmur2 import kafka_partition_udf

    keys = [f"key-{i}".encode() for i in range(100)]
    df = spark.createDataFrame([(k,) for k in keys], "key binary")
    got = {
        bytes(r.key): r.part
        for r in df.withColumn("part", kafka_partition_udf(12)(F.col("key"))).collect()
    }
    for k in keys:
        assert got[k] == murmur2_partition(k, 12)


def test_murmur2_str_col_matches_python(spark):
    from pyspark.sql import functions as F

    from affinity_spark.functions.murmur2 import murmur2, murmur2_str_col

    df = spark.createDataFrame([(f"key-{i}",) for i in range(50)], "s string")
    got = {r.s: r.h for r in df.withColumn("h", murmur2_str_col(F.col("s"))).collect()}
    for s, h in got.items():
        assert h == murmur2(s.encode("utf-8"))


def test_partition_udf_null_key_yields_null_partition(spark):
    """Kafka's default partitioner round-robins null-keyed records; a null
    key must produce a NULL partition, not a job-killing TypeError."""
    from pyspark.sql import functions as F

    from affinity_spark.functions.murmur2 import (
        kafka_partition_udf,
        murmur2_partition,
    )

    df = spark.createDataFrame(
        [(1, b"alpha"), (2, None), (3, b"beta")], "id int, key binary"
    )
    got = {
        r.id: r.p
        for r in df.select(
            "id", kafka_partition_udf(8)(F.col("key")).alias("p")
        ).collect()
    }
    assert got[2] is None
    assert got[1] == murmur2_partition(b"alpha", 8)
    assert got[3] == murmur2_partition(b"beta", 8)


def test_duckdb_murmur2_sql_agrees_with_reference_100k():
    """The generated DuckDB SQL must match Kafka murmur2 placement for every
    key 0..100000 plus a 17-digit key (exercises all 5 unrolled blocks)."""
    import duckdb

    from affinity_spark.functions.murmur2 import (
        duckdb_murmur2_partition_sql,
        murmur2_partition,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT unnest(range(0, 100000)) AS user_id "
        "UNION ALL SELECT 12345678901234567"
    )
    got = dict(
        con.execute(
            duckdb_murmur2_partition_sql(32, "SELECT DISTINCT user_id FROM events")
        ).fetchall()
    )
    assert len(got) == 100001
    bad = [
        uid
        for uid, p in got.items()
        if p != murmur2_partition(str(uid).encode(), 32)
    ]
    assert bad == []

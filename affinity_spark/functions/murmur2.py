"""Kafka-compatible murmur2 hashing & partitioning.

The reference routes keys with Kafka's default partitioner —
``(murmur2(serializedKey) & 0x7fffffff) % numPartitions`` — so that topics it
writes are routable by vanilla Kafka producers/consumers and vice versa
(affinity ``api/.../core/Murmur2Partitioner.java:24-31``, ``README.md:92-98``).
Spark's built-in ``hash()`` is murmur3 with different placement, so topic
compatibility needs this one custom expression. Algorithm per Apache Kafka's
public ``org.apache.kafka.common.utils.Utils.murmur2`` (Apache-2.0).

Two implementations:
- ``murmur2`` — pure-Python reference (driver-side, tests, partition math)
- ``kafka_partition_udf`` — Arrow-batched pandas UDF (numpy, vectorized) for
  stamping an explicit ``partition`` column on Kafka writes. This stays off
  the hot path: it is only needed at the Kafka sink boundary, never inside
  analytical plans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_SEED = 0x9747B28C
_M = 0x5BD1E995
_R = 24
_MASK32 = 0xFFFFFFFF


def murmur2(data: bytes) -> int:
    """32-bit murmur2 of ``data``, identical to Kafka's Utils.murmur2."""
    length = len(data)
    h = (_SEED ^ length) & _MASK32
    n4 = length & ~3
    for i in range(0, n4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * _M) & _MASK32
        k ^= k >> _R
        k = (k * _M) & _MASK32
        h = (h * _M) & _MASK32
        h ^= k
    rem = length & 3
    if rem == 3:
        h ^= (data[n4 + 2] & 0xFF) << 16
    if rem >= 2:
        h ^= (data[n4 + 1] & 0xFF) << 8
    if rem >= 1:
        h ^= data[n4] & 0xFF
        h = (h * _M) & _MASK32
    h ^= h >> 13
    h = (h * _M) & _MASK32
    h ^= h >> 15
    # Kafka's is a signed java int
    return h - (1 << 32) if h >= (1 << 31) else h


def murmur2_partition(key_bytes: bytes, num_partitions: int) -> int:
    """Kafka default-partitioner placement for a serialized key."""
    return (murmur2(key_bytes) & 0x7FFFFFFF) % num_partitions


def kafka_partition_udf(num_partitions: int):
    """pandas UDF: binary key column -> kafka partition id (int).

    Usage: ``df.withColumn("partition", kafka_partition_udf(n)(F.col("key")))``
    before ``df.write.format("kafka")`` so brokers place records exactly where
    the reference's router / vanilla Kafka producers would.

    Null keys yield a NULL partition — Kafka's producer then falls back to
    its sticky/round-robin placement for the record, same as the default
    partitioner does for unkeyed messages (a null key must not kill the
    whole write job).
    """

    @pandas_udf("int")
    def _part(keys: pd.Series) -> pd.Series:
        out = pd.array([None] * len(keys), dtype="Int32")
        for i, k in enumerate(keys):
            if k is not None:
                out[i] = murmur2_partition(bytes(k), num_partitions)
        return pd.Series(out, dtype="Int32")

    return _part


def murmur2_str_col(col: Column) -> Column:
    """murmur2 of a string column's utf-8 bytes as a Column (pandas UDF)."""

    @pandas_udf("int")
    def _m2(s: pd.Series) -> pd.Series:
        return s.map(lambda x: murmur2(x.encode("utf-8")))

    return _m2(col)


def stable_token_hash(col: Column) -> Column:
    """Engine-portable 32-bit token hash: first 8 hex chars of md5 → long.

    Used by MinHash/SimHash so a SQL oracle (DuckDB) can reproduce the exact
    same hash with ``md5`` + hex parse — unlike Spark's murmur3 ``hash()``,
    which no other engine reproduces. Stays JVM-side (md5+conv built-ins).
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def duckdb_murmur2_partition_sql(
    num_partitions: int,
    source: str,
    key_expr: str = "CAST(user_id AS VARCHAR)",
    id_cols: str = "user_id",
    n_blocks: int = 5,
) -> str:
    """DuckDB SQL reproducing Kafka murmur2 partition placement bit-exactly.

    murmur2's 4-byte-block loop is unrolled into generated CTE stages
    (``n_blocks`` blocks = keys up to ``4*n_blocks + 3`` bytes — 5 covers
    every decimal BIGINT); all arithmetic is BIGINT with explicit mod-2^32
    wraparound so DuckDB's overflow-checking int64 math matches Java's
    wrapping int32. Exists so the R1/T8 routing queries get a REAL value
    oracle instead of a rows-only check; agreement with ``murmur2()`` is
    pinned for 100k keys in tests/test_murmur2.py.
    """
    m, p32 = _M, 1 << 32
    ctes = [
        f"mk0 AS (SELECT {id_cols}, {key_expr} AS s FROM ({source}))",
        f"mst AS (SELECT {id_cols}, s, length(s) AS L, "
        f"xor(CAST({_SEED} AS BIGINT), length(s)) AS h FROM mk0)",
    ]
    prev = "mst"
    for b in range(n_blocks):
        off = b * 4
        kb = " + ".join(
            f"ascii(substr(s, {off + j + 1}, 1)) * {256 ** j}" for j in range(4)
        )
        ctes.append(
            f"mb{b}a AS (SELECT {id_cols}, s, L, h, CASE WHEN L >= {off + 4} "
            f"THEN (CAST({kb} AS BIGINT) * {m}) % {p32} ELSE 0 END AS k1 FROM {prev})"
        )
        ctes.append(
            f"mb{b}b AS (SELECT {id_cols}, s, L, h, "
            f"(xor(k1, k1 >> {_R}) * {m}) % {p32} AS k3 FROM mb{b}a)"
        )
        ctes.append(
            f"mb{b}c AS (SELECT {id_cols}, s, L, CASE WHEN L >= {off + 4} "
            f"THEN xor((h * {m}) % {p32}, k3) ELSE h END AS h FROM mb{b}b)"
        )
        prev = f"mb{b}c"
    ctes.append(
        f"mrm AS (SELECT {id_cols}, s, L, (L // 4) * 4 AS n4, "
        f"CASE WHEN L % 4 = 3 THEN xor(h, CAST(ascii(substr(s, (L // 4) * 4 + 3, 1)) "
        f"AS BIGINT) << 16) ELSE h END AS h FROM {prev})"
    )
    ctes.append(
        f"mr2 AS (SELECT {id_cols}, s, L, n4, CASE WHEN L % 4 >= 2 "
        f"THEN xor(h, CAST(ascii(substr(s, n4 + 2, 1)) AS BIGINT) << 8) "
        f"ELSE h END AS h FROM mrm)"
    )
    ctes.append(
        f"mr1 AS (SELECT {id_cols}, s, L, CASE WHEN L % 4 >= 1 "
        f"THEN (xor(h, ascii(substr(s, n4 + 1, 1))) * {m}) % {p32} "
        f"ELSE h END AS h FROM mr2)"
    )
    ctes.append(f"mf1 AS (SELECT {id_cols}, xor(h, h >> 13) AS h FROM mr1)")
    ctes.append(f"mf2 AS (SELECT {id_cols}, (h * {m}) % {p32} AS h FROM mf1)")
    ctes.append(f"mf3 AS (SELECT {id_cols}, xor(h, h >> 15) AS h FROM mf2)")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT {id_cols}, CAST((h & 2147483647) % {num_partitions} AS INTEGER)"
        " AS partition FROM mf3"
    )

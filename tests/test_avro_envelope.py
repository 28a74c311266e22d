"""Registry-envelope wire format (reference AvroSerde.scala:123-173): magic
byte 0 + 4-byte BE schema id + payload, split/built JVM-side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from affinity_spark.functions.avro_envelope import (
    SchemaRegistry,
    avro_available,
    envelope_magic,
    envelope_payload,
    envelope_schema_id,
    python_wrap,
    valid_envelope,
    wrap_envelope,
)


def test_wrap_matches_python_reference(spark):
    payload = b"\x02\x04avro-bytes"
    df = spark.createDataFrame([(payload,)], "payload binary")
    got = df.select(wrap_envelope(7, F.col("payload")).alias("v")).collect()[0].v
    assert bytes(got) == python_wrap(7, payload)
    assert bytes(got)[:5] == b"\x00\x00\x00\x00\x07"


def test_roundtrip_and_fields(spark):
    rows = [(sid, python_wrap(sid, f"payload-{sid}".encode())) for sid in (1, 2, 255, 70000)]
    df = spark.createDataFrame(rows, "sid int, v binary")
    got = df.select(
        "sid",
        envelope_magic(F.col("v")).alias("magic"),
        envelope_schema_id(F.col("v")).alias("got_sid"),
        envelope_payload(F.col("v")).cast("string").alias("payload"),
    ).collect()
    for r in got:
        assert r.magic == 0
        assert r.got_sid == r.sid
        assert r.payload == f"payload-{r.sid}"


def test_valid_envelope_rejects_foreign_bytes(spark):
    rows = [
        (1, python_wrap(3, b"ok")),
        (2, b"\x01\x00\x00\x00\x03xx"),  # wrong magic
        (3, b"\x00\x00"),  # too short
    ]
    df = spark.createDataFrame(rows, "id int, v binary")
    got = [r.id for r in df.filter(valid_envelope(F.col("v"))).collect()]
    assert got == [1]


def test_registry_dedups_canonical():
    reg = SchemaRegistry()
    a = reg.register('{"type": "record", "name": "R", "fields": []}')
    b = reg.register('{"fields": [],  "name": "R", "type": "record"}')
    c = reg.register('{"type": "string"}')
    assert a == b
    assert c != a
    assert reg.ids() == [a, c]


def test_decode_gates_on_spark_avro(spark):
    from affinity_spark.functions.avro_envelope import decode_enveloped

    reg = SchemaRegistry()
    reg.register('{"type": "string"}')
    df = spark.createDataFrame([(python_wrap(1, b"x"),)], "v binary")
    if not avro_available(spark):
        with pytest.raises(ImportError):
            decode_enveloped(df, "v", reg, '{"type": "string"}')
    else:  # pragma: no cover - environment-dependent
        assert decode_enveloped(df, "v", reg, '{"type": "string"}').count() == 1


def test_serde_throughput_floor():
    """BASELINE floor: 500k single-thread serde ops without pathological
    slowdown (the reference prints Writes/Sec over 500k AvroRecord ops,
    AvroRecordSpec.scala:163-180). Our wire ops are envelope pack/unpack +
    murmur2; assert a deliberately lenient floor so the test is immune to
    host noise while still catching an accidental O(n^2) or per-op JVM
    round-trip."""
    import struct
    import time

    from affinity_spark.functions.murmur2 import murmur2

    payload = b"x" * 64
    n = 100_000
    t0 = time.perf_counter()
    for i in range(n):
        wire = struct.pack(">bI", 0, i & 0x7FFFFFFF) + payload
        sid = struct.unpack_from(">I", wire, 1)[0]
        assert sid == (i & 0x7FFFFFFF)
        murmur2(wire[:16])
    per_sec = n / (time.perf_counter() - t0)
    assert per_sec > 20_000, f"serde ops {per_sec:.0f}/s below floor"

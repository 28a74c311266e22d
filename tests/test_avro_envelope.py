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


def test_decode_jvm_engine_gates_on_spark_avro(spark):
    """engine='jvm' still gates on the jar; engine='auto' falls back to the
    pure-python codec and decodes regardless."""
    from affinity_spark.functions.avro_binary import encode_datum
    from affinity_spark.functions.avro_envelope import decode_enveloped

    reg = SchemaRegistry()
    schema = '{"type":"record","name":"S","fields":[{"name":"s","type":"string"}]}'
    reg.register(schema)
    payload = encode_datum({"type": "record", "name": "S",
                            "fields": [{"name": "s", "type": "string"}]},
                           {"s": "x"})
    df = spark.createDataFrame([(python_wrap(1, payload),)], "v binary")
    if not avro_available(spark):
        with pytest.raises(ImportError):
            decode_enveloped(df, "v", reg, schema, engine="jvm").collect()
    rows = decode_enveloped(df, "v", reg, schema, engine="auto").collect()
    assert rows[0].record.s == "x"


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


# --- writer -> reader schema resolution (AvroSerde.scala:158-173; behavior
# mirrored from AvroProjectionSpec.scala:169) -------------------------------

V1 = """{"type":"record","name":"User","fields":[
  {"name":"id","type":"int"},
  {"name":"name","type":"string"}]}"""

V2 = """{"type":"record","name":"User","fields":[
  {"name":"id","type":"int"},
  {"name":"name","type":"string"},
  {"name":"score","type":"double","default":0.5},
  {"name":"tags","type":{"type":"array","items":"string"},"default":[]}]}"""

READER = """{"type":"record","name":"User","fields":[
  {"name":"id","type":"long"},
  {"name":"full_name","type":"string","aliases":["name"]},
  {"name":"score","type":"double","default":0.5}]}"""


def _decoded(spark, schema_ddl, rows):
    return spark.createDataFrame(rows, schema_ddl)


def test_projection_promotes_defaults_and_aliases(spark):
    from affinity_spark.functions.avro_envelope import project_to_reader

    df = _decoded(spark, "rec struct<id: int, name: string>", [((7, "ada"),)])
    out = df.select(project_to_reader(F.col("rec"), V1, READER).alias("r"))
    assert out.schema["r"].dataType.simpleString() == (
        "struct<id:bigint,full_name:string,score:double>"
    )
    row = out.collect()[0].r
    assert row.id == 7 and row.full_name == "ada" and row.score == 0.5


def test_projection_makes_mixed_writers_union_stable(spark):
    """The round-1 gap: different writer schemas must land in ONE shape."""
    from affinity_spark.functions.avro_envelope import project_to_reader

    d1 = _decoded(spark, "rec struct<id: int, name: string>", [((1, "a"),)]).select(
        project_to_reader(F.col("rec"), V1, READER).alias("r")
    )
    d2 = _decoded(
        spark,
        "rec struct<id: int, name: string, score: double, tags: array<string>>",
        [((2, "b", 0.9, ["x"]),)],
    ).select(project_to_reader(F.col("rec"), V2, READER).alias("r"))
    # identical shape (nullability may differ on literal defaults; unionByName
    # reconciles that)
    assert d1.schema.simpleString() == d2.schema.simpleString()
    rows = {r.r.id: r.r for r in d1.unionByName(d2).collect()}
    assert rows[1].score == 0.5 and rows[2].score == 0.9
    assert rows[1].full_name == "a" and rows[2].full_name == "b"


def test_projection_incompatible_raises(spark):
    from affinity_spark.functions.avro_envelope import project_to_reader

    no_default = """{"type":"record","name":"U","fields":[
      {"name":"missing","type":"string"}]}"""
    with pytest.raises(ValueError, match="no default"):
        project_to_reader(F.col("rec"), V1, no_default)
    demotion = """{"type":"record","name":"U","fields":[
      {"name":"id","type":"int"}]}"""
    long_writer = """{"type":"record","name":"U","fields":[
      {"name":"id","type":"long"}]}"""
    with pytest.raises(ValueError, match="not resolvable"):
        project_to_reader(F.col("rec"), long_writer, demotion)


def test_projection_nested_record_and_nullable(spark):
    from affinity_spark.functions.avro_envelope import project_to_reader

    wn = """{"type":"record","name":"O","fields":[
      {"name":"who","type":{"type":"record","name":"W","fields":[
        {"name":"id","type":"int"}]}}]}"""
    rn = """{"type":"record","name":"O","fields":[
      {"name":"who","type":{"type":"record","name":"W","fields":[
        {"name":"id","type":"long"},
        {"name":"email","type":["null","string"],"default":null}]}}]}"""
    df = _decoded(spark, "rec struct<who: struct<id: int>>", [(((3,),),)])
    out = df.select(project_to_reader(F.col("rec"), wn, rn).alias("r"))
    row = out.collect()[0].r
    assert row.who.id == 3 and row.who.email is None


def test_invalid_envelopes_dead_letter(spark):
    from affinity_spark.functions.avro_envelope import (
        SchemaRegistry,
        invalid_envelopes,
    )

    reg = SchemaRegistry()
    sid = reg.register(V1)
    rows = [
        (1, python_wrap(sid, b"ok")),       # valid
        (2, python_wrap(99, b"orphan")),    # unknown schema id
        (3, b"\x01\x00\x00\x00\x01xx"),     # wrong magic
        (4, b"\x00\x00"),                   # too short
    ]
    df = spark.createDataFrame(rows, "id int, v binary")
    bad = sorted(r.id for r in invalid_envelopes(df, "v", reg).collect())
    assert bad == [2, 3, 4]

"""Pure-python Avro binary codec + no-jar envelope decode path.

The wire format is the public Avro 1.11 binary encoding; resolution
behavior mirrors the reference's read-path (AvroSerde.scala:158-173,
projection matrix AvroProjectionSpec.scala). The python resolver must agree
with the Spark-column resolver (`project_to_reader`) on identical inputs —
they are two implementations of the same spec section.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from affinity_spark.functions.avro_binary import (
    _zigzag_decode,
    _zigzag_encode,
    decode_datum,
    encode_datum,
    resolve_datum,
)
from affinity_spark.functions.avro_envelope import (
    SchemaRegistry,
    decode_enveloped,
    decode_enveloped_python,
    encode_enveloped_python,
    project_to_reader,
    python_wrap,
)

FULL = {
    "type": "record",
    "name": "Everything",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "int"}},
        {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "Fx", "size": 3}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "Inner",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
    ],
}

FULL_DATUM = {
    "b": True,
    "i": -17,
    "l": 1 << 40,
    "f": 0.5,
    "d": -2.25,
    "s": "héllo",
    "by": b"\x00\xff",
    "opt": None,
    "arr": [1, -2, 300],
    "m": {"k1": 1, "k2": -9},
    "e": "B",
    "fx": b"abc",
    "nested": {"x": 7},
}


@given(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
@settings(max_examples=300, deadline=None)
def test_zigzag_roundtrip(n):
    v, pos = _zigzag_decode(_zigzag_encode(n), 0)
    assert v == n and pos == len(_zigzag_encode(n))


def test_known_zigzag_vectors():
    # the spec's worked examples
    assert _zigzag_encode(0) == b"\x00"
    assert _zigzag_encode(-1) == b"\x01"
    assert _zigzag_encode(1) == b"\x02"
    assert _zigzag_encode(-2) == b"\x03"
    assert _zigzag_encode(64) == b"\x80\x01"


def test_full_record_roundtrip():
    buf = encode_datum(FULL, FULL_DATUM)
    out, pos = decode_datum(FULL, buf)
    assert pos == len(buf), "trailing bytes after decode"
    expect = dict(FULL_DATUM)
    expect["f"] = pytest.approx(0.5)
    assert out == expect


@given(
    st.lists(st.integers(min_value=-(1 << 62), max_value=1 << 62), max_size=8),
    st.text(max_size=20),
    st.binary(max_size=20),
)
@settings(max_examples=50, deadline=None)
def test_property_roundtrip_scalars(arr, s, by):
    schema = {
        "type": "record",
        "name": "P",
        "fields": [
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
        ],
    }
    datum = {"arr": arr, "s": s, "by": by}
    out, _ = decode_datum(schema, encode_datum(schema, datum))
    assert out == datum


V1 = json.dumps(
    {
        "type": "record",
        "name": "Ev",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "name", "type": "string"},
        ],
    }
)
V2 = json.dumps(
    {
        "type": "record",
        "name": "Ev",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "full_name", "type": "string"},
            {"name": "score", "type": "double"},
        ],
    }
)
READER = json.dumps(
    {
        "type": "record",
        "name": "Ev",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "full_name", "type": "string", "aliases": ["name"]},
            {"name": "score", "type": "double", "default": 0.5},
        ],
    }
)


def test_resolve_matches_spark_column_projection(spark):
    """python resolve_datum and Spark project_to_reader implement the same
    spec section — pin their agreement on aliases+defaults+promotions."""
    datum = {"id": 7, "name": "ada"}
    py = resolve_datum(json.loads(V1), json.loads(READER), datum)
    df = spark.createDataFrame([((7, "ada"),)], "rec struct<id: int, name: string>")
    spark_row = (
        df.select(project_to_reader(F.col("rec"), V1, READER).alias("r"))
        .collect()[0]
        .r.asDict()
    )
    assert py == spark_row == {"id": 7, "full_name": "ada", "score": 0.5}


def test_resolve_missing_no_default_raises():
    no_default = {
        "type": "record",
        "name": "U",
        "fields": [{"name": "missing", "type": "string"}],
    }
    with pytest.raises(ValueError, match="no default"):
        resolve_datum(json.loads(V1), no_default, {"id": 1, "name": "x"})


def test_envelope_encode_decode_mixed_writers(spark):
    """End-to-end no-jar path: two writer schemas on one log, python
    encode in executors, python decode resolves both onto the reader —
    the AvroProjectionSpec union-stability behavior without spark-avro."""
    reg = SchemaRegistry()
    sid1, sid2 = reg.register(V1), reg.register(V2)
    d1 = spark.createDataFrame(
        [((1, "a"),), ((2, "b"),)], "rec struct<id: int, name: string>"
    )
    d2 = spark.createDataFrame(
        [((3, "c", 0.9),)], "rec struct<id: long, full_name: string, score: double>"
    )
    log = encode_enveloped_python(d1, "rec", reg, sid1).select("value").unionByName(
        encode_enveloped_python(d2, "rec", reg, sid2).select("value")
    )
    out = decode_enveloped(log, "value", reg, READER, engine="auto")
    rows = {r.record.id: r.record for r in out.collect()}
    assert rows[1].full_name == "a" and rows[1].score == 0.5
    assert rows[3].full_name == "c" and rows[3].score == 0.9
    # header is bit-compatible with the driver-side python_wrap
    first = log.orderBy(F.col("value")).collect()
    assert all(bytes(r.value)[:1] == b"\x00" for r in first)


def test_envelope_python_decode_on_invalid(spark):
    from pyspark.errors.exceptions.captured import PythonException

    reg = SchemaRegistry()
    sid = reg.register(V1)
    payload = encode_datum(json.loads(V1), {"id": 1, "name": "a"})
    rows = [
        (python_wrap(sid, payload),),
        (b"\x01garbage-wrong-magic",),
        (python_wrap(999, b"unknown-sid"),),
    ]
    df = spark.createDataFrame(rows, "value binary")
    dropped = decode_enveloped_python(df, "value", reg, V1, on_invalid="drop")
    assert [r.record.id for r in dropped.collect()] == [1]
    failing = decode_enveloped_python(df, "value", reg, V1, on_invalid="fail")
    with pytest.raises(PythonException, match="invalid avro envelope"):
        failing.collect()

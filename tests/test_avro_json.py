"""Plain-JSON Avro converter matrix, mirroring the reference's
AvroJsonConverterSpec.scala:31-120 case by case: unwrapped unions,
primitives + nulls, enums, base64 bytes/fixed, maps as objects, defaults
on empty JSON, unknown-field tolerance, and lossless JSON ⇄ binary round
trips through the repo's own codec."""

from __future__ import annotations

import json

import pytest

from affinity_spark.functions.avro_binary import decode_datum, encode_datum, parse_schema
from affinity_spark.functions.avro_envelope import python_wrap
from affinity_spark.functions.avro_json import (
    datum_to_json,
    enveloped_to_json,
    json_to_datum,
)

NAMED = parse_schema(json.dumps({
    "type": "record", "name": "AvroNamedRecords", "fields": [
        {"name": "e", "type": {"type": "record", "name": "SimpleKey",
                               "fields": [{"name": "id", "type": "int"}]}},
        {"name": "rn", "type": ["null", "SimpleKey"], "default": None},
        {"name": "rs", "type": ["null", "SimpleKey"], "default": None},
        {"name": "l", "type": {"type": "array", "items": "SimpleKey"}, "default": []},
        {"name": "lo", "type": {"type": "array", "items": ["null", "SimpleKey"]},
         "default": []},
    ],
}))

PRIMS = parse_schema(json.dumps({
    "type": "record", "name": "AvroPrimitives", "fields": [
        {"name": "bn", "type": ["null", "boolean"], "default": None},
        {"name": "bs", "type": "boolean", "default": True},
        {"name": "ln", "type": ["null", "long"], "default": None},
        {"name": "ls", "type": "long", "default": -9223372036854775808},
        {"name": "sn", "type": ["null", "string"], "default": None},
        {"name": "ss", "type": "string", "default": "Hello"},
    ],
}))

ENUMS = parse_schema(json.dumps({
    "type": "record", "name": "AvroEnums", "fields": [
        {"name": "raw", "type": {"type": "enum", "name": "SimpleEnum",
                                 "symbols": ["A", "B", "C"]}, "default": "A"},
        {"name": "on", "type": ["null", "SimpleEnum"], "default": None},
        {"name": "l", "type": {"type": "array", "items": "SimpleEnum"}, "default": []},
    ],
}))

BYTES = parse_schema(json.dumps({
    "type": "record", "name": "AvroBytes", "fields": [
        {"name": "raw", "type": "bytes"},
        {"name": "fx", "type": {"type": "fixed", "name": "F8", "size": 8}},
        {"name": "listed", "type": {"type": "array", "items": "bytes"}},
    ],
}))

MAPS = parse_schema(json.dumps({
    "type": "record", "name": "SimpleMap", "fields": [
        {"name": "k", "type": {"type": "record", "name": "SimpleKey",
                               "fields": [{"name": "id", "type": "int"}]},
         "default": {"id": 0}},
        {"name": "map", "type": ["null", {"type": "map", "values": "SimpleKey"}],
         "default": None},
    ],
}))


def test_unions_render_unwrapped_like_circe():
    # AvroJsonConverterSpec: named records with Some/None options
    msg = {"e": {"id": 99}, "rn": {"id": 99}, "rs": None,
           "l": [{"id": 99}, {"id": 100}], "lo": [None, {"id": 99}, None]}
    j = datum_to_json(NAMED, msg)
    assert j == ('{"e":{"id":99},"rn":{"id":99},"rs":null,'
                 '"l":[{"id":99},{"id":100}],"lo":[null,{"id":99},null]}')
    assert json_to_datum(NAMED, j) == msg


def test_primitives_and_nulls_round_trip():
    msg = {"bn": None, "bs": True, "ln": None, "ls": -9223372036854775808,
           "sn": None, "ss": "Hello"}
    j = datum_to_json(PRIMS, msg)
    assert json.loads(j) == msg
    assert json_to_datum(PRIMS, j) == msg


def test_enums_render_as_plain_strings():
    msg = {"raw": "B", "on": "B", "l": ["A", "B"]}
    j = datum_to_json(ENUMS, msg)
    assert j == '{"raw":"B","on":"B","l":["A","B"]}'
    assert json_to_datum(ENUMS, j) == msg
    with pytest.raises(ValueError, match="symbol"):
        json_to_datum(ENUMS, '{"raw":"Z","on":null,"l":[]}')


def test_bytes_and_fixed_render_base64():
    msg = {"raw": b"\x01\x02\x03", "fx": b"AAAAAAAA", "listed": [b"\x01\x02\x03", b"\x04"]}
    j = datum_to_json(BYTES, msg)
    # the reference's fixed rendering: base64 (spec "handle fixed field variants")
    assert json.loads(j)["fx"] == "QUFBQUFBQUE="
    assert json.loads(j)["raw"] == "AQID"
    assert json_to_datum(BYTES, j) == msg


def test_maps_as_plain_objects_and_defaults_on_empty_json():
    msg = {"k": {"id": 5}, "map": {"key1": {"id": 1}}}
    j = datum_to_json(MAPS, msg)
    assert json_to_datum(MAPS, j) == msg
    # spec: toAvro("{}") fills every default
    assert json_to_datum(MAPS, "{}") == {"k": {"id": 0}, "map": None}
    assert json_to_datum(PRIMS, "{}") == {
        "bn": None, "bs": True, "ln": None, "ls": -9223372036854775808,
        "sn": None, "ss": "Hello",
    }


def test_unknown_json_fields_are_ignored():
    # spec: "allow passing unknown json fields"
    got = json_to_datum(MAPS, '{"hello": "there", "k": {"id": 3, "extra": 1}}')
    assert got == {"k": {"id": 3}, "map": None}


def test_missing_field_without_default_raises():
    with pytest.raises(ValueError, match="no default"):
        json_to_datum(BYTES, "{}")


def test_json_binary_round_trip_is_lossless():
    msg = {"e": {"id": 99}, "rn": None, "rs": {"id": 7},
           "l": [{"id": 1}], "lo": [None, {"id": 2}]}
    j = datum_to_json(NAMED, msg)
    datum = json_to_datum(NAMED, j)
    raw = encode_datum(NAMED, datum)
    back, _ = decode_datum(NAMED, raw)
    assert back == msg
    assert datum_to_json(NAMED, back) == j


def test_enveloped_to_json_column(spark):
    schema_json = json.dumps({
        "type": "record", "name": "R",
        "fields": [{"name": "x", "type": "int"},
                   {"name": "tag", "type": ["null", "string"], "default": None}],
    })
    from affinity_spark.functions.avro_envelope import SchemaRegistry

    reg = SchemaRegistry()
    sid = reg.register(schema_json)
    parsed = parse_schema(schema_json)
    rows = [
        (bytes(python_wrap(sid, encode_datum(parsed, {"x": 1, "tag": "a"}))),),
        (bytes(python_wrap(sid, encode_datum(parsed, {"x": 2, "tag": None}))),),
    ]
    df = spark.createDataFrame(rows, "value binary")
    got = sorted(r.json for r in enveloped_to_json(df, "value", reg).collect())
    assert got == ['{"x":1,"tag":"a"}', '{"x":2,"tag":null}']

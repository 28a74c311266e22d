"""Avro ⇄ Spark type mapping (SURVEY §1 table)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructType,
)

from affinity_spark.schema import avro_to_spark, spark_to_avro

BANK_AVRO = {
    "type": "record",
    "name": "Transaction",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "amount", "type": "double"},
        {"name": "timestamp", "type": "long", "doc": "event time unix ms"},
        {"name": "memo", "type": ["null", "string"], "default": None},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "uuid", "type": {"type": "fixed", "name": "U", "size": 16}},
        {"name": "status", "type": {"type": "enum", "name": "S", "symbols": ["A", "B"]}},
    ],
}


def test_record_mapping():
    st = avro_to_spark(BANK_AVRO)
    assert isinstance(st, StructType)
    by_name = {f.name: f for f in st.fields}
    assert by_name["id"].dataType == LongType()
    assert by_name["amount"].dataType == DoubleType()
    assert by_name["memo"].dataType == StringType() and by_name["memo"].nullable
    assert not by_name["id"].nullable
    assert by_name["tags"].dataType == ArrayType(StringType())
    assert by_name["props"].dataType == MapType(StringType(), LongType())
    assert by_name["uuid"].dataType == BinaryType()
    assert by_name["status"].dataType == StringType()
    assert by_name["timestamp"].metadata["doc"] == "event time unix ms"


def test_json_string_input():
    st = avro_to_spark(json.dumps(BANK_AVRO))
    assert isinstance(st, StructType) and len(st.fields) == 8


def test_general_union_becomes_tagged_struct():
    union = [
        "null",
        {"type": "record", "name": "Pay", "fields": [{"name": "amt", "type": "double"}]},
        {"type": "record", "name": "Ref", "fields": [{"name": "why", "type": "string"}]},
    ]
    st = avro_to_spark(union)
    assert isinstance(st, StructType)
    assert [f.name for f in st.fields] == ["_tag", "Pay", "Ref"]


def test_nested_record():
    nested = {
        "type": "record",
        "name": "Outer",
        "fields": [
            {
                "name": "inner",
                "type": {
                    "type": "record",
                    "name": "Inner",
                    "fields": [{"name": "x", "type": "int"}],
                },
            }
        ],
    }
    st = avro_to_spark(nested)
    assert isinstance(st["inner"].dataType, StructType)
    assert st["inner"].dataType["x"].dataType == IntegerType()


def test_roundtrip_spark_to_avro(spark):
    st = avro_to_spark(BANK_AVRO)
    back = spark_to_avro(st, "Transaction")
    st2 = avro_to_spark(back)
    # roundtrip loses only avro-specific refinements (fixed size, enum
    # symbols), which is the documented §1 lossy direction
    assert [f.name for f in st2.fields] == [f.name for f in st.fields]
    assert all(a.dataType == b.dataType for a, b in zip(st.fields, st2.fields))
    # the mapped schema actually constructs a frame
    df = spark.createDataFrame([], st)
    assert df.schema == st


def test_unsupported_raises():
    with pytest.raises(ValueError):
        avro_to_spark({"type": "wat"})

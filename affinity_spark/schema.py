"""Avro ⇄ Spark type mapping (SURVEY §1 table; Phase-0 contract).

The reference infers Avro schemas from Scala case classes
(``avro/.../record/AvroRecord.scala:375-541``); our engine's schema system
is Spark's, so this module is the bridge: given an Avro schema (json/dict),
produce the StructType the engine uses, and back. Conventions from §1:

- primitives map 1:1; bytes→binary; null→void
- map<string, T>, array<T> → MapType/ArrayType
- enum → string (value-set goes to column metadata; a CHECK constraint in
  a real catalog)
- union(null, T) → nullable T; general unions → the tagged-struct encoding
  of ``functions/uniontype.py`` (one nullable struct per variant + _tag)
- fixed(n) → binary with ``fixedSize`` metadata (drives key-prefix layout)
- record → (nested) StructType; field defaults/doc/aliases → metadata
- time is unix-millis longs (the reference has no date/decimal logicals)
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    NullType,
    StringType,
    StructField,
    StructType,
)

_PRIMITIVES: dict[str, DataType] = {
    "int": IntegerType(),
    "long": LongType(),
    "boolean": BooleanType(),
    "float": FloatType(),
    "double": DoubleType(),
    "string": StringType(),
    "bytes": BinaryType(),
    "null": NullType(),
}


def avro_to_spark(schema: "str | dict | list") -> DataType:
    """Avro schema (json string / parsed dict / union list) → Spark type."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return _PRIMITIVES[schema]
        return avro_to_spark(json.loads(schema))
    if isinstance(schema, list):  # union
        non_null = [s for s in schema if s != "null"]
        if len(non_null) == 1:
            # union(null, T): nullability is carried by the enclosing field
            return avro_to_spark(non_null[0])
        # general union → tagged struct of variants (uniontype encoding)
        fields = [StructField("_tag", StringType(), False)]
        for s in non_null:
            name = s["name"] if isinstance(s, dict) else str(s)
            variant = avro_to_spark(s)
            if not isinstance(variant, StructType):
                variant = StructType([StructField("value", variant, True)])
            fields.append(StructField(name, variant, True))
        return StructType(fields)
    t = schema["type"]
    if t == "record":
        out = []
        for f in schema["fields"]:
            ftype = f["type"]
            nullable = isinstance(ftype, list) and "null" in ftype
            metadata: dict[str, Any] = {}
            if "doc" in f:
                metadata["doc"] = f["doc"]
            if "aliases" in f:
                metadata["aliases"] = f["aliases"]
            if "default" in f:
                metadata["default"] = f["default"]
            out.append(
                StructField(f["name"], avro_to_spark(ftype), nullable, metadata or None)
            )
        return StructType(out)
    if t == "enum":
        return StringType()  # symbols → metadata at the field level
    if t == "fixed":
        return BinaryType()  # size is field metadata (prefix layout driver)
    if t == "array":
        return ArrayType(avro_to_spark(schema["items"]))
    if t == "map":
        return MapType(StringType(), avro_to_spark(schema["values"]))
    if t in _PRIMITIVES:
        return _PRIMITIVES[t]
    raise ValueError(f"unsupported avro type: {schema!r}")


def spark_to_avro(dt: DataType, name: str = "Record") -> "str | dict":
    """Spark type → Avro schema fragment (inverse, for writer schemas)."""
    mapping = {
        IntegerType(): "int",
        LongType(): "long",
        BooleanType(): "boolean",
        FloatType(): "float",
        DoubleType(): "double",
        StringType(): "string",
        BinaryType(): "bytes",
        NullType(): "null",
    }
    if dt in mapping:
        return mapping[dt]
    if isinstance(dt, ArrayType):
        return {"type": "array", "items": spark_to_avro(dt.elementType)}
    if isinstance(dt, MapType):
        if not isinstance(dt.keyType, StringType):
            raise ValueError("avro maps require string keys")
        return {"type": "map", "values": spark_to_avro(dt.valueType)}
    if isinstance(dt, StructType):
        fields = []
        for f in dt.fields:
            ftype = spark_to_avro(f.dataType, name=f"{name}_{f.name}")
            if f.nullable:
                ftype = ["null", ftype]
            fields.append({"name": f.name, "type": ftype})
        return {"type": "record", "name": name, "fields": fields}
    raise ValueError(f"unsupported spark type: {dt!r}")

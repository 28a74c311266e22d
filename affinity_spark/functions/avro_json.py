"""Schema-aware JSON ⇄ Avro datum conversion (plain-JSON convention).

Mirrors the reference's AvroJsonConverter
(``avro/src/main/scala/io/amient/affinity/avro/record/AvroJsonConverter.scala``,
behavior pinned by ``AvroJsonConverterSpec.scala:31-120``), which differs
from Avro's own JSON encoding in exactly the ways that make the output
ordinary JSON:

- unions carry NO ``{"int": 5}`` type wrapper — null is ``null``, a value
  is the bare value (branch re-inferred from the schema on read);
- bytes / fixed render as base64 strings;
- enums render as plain strings; maps as JSON objects;
- ``toAvro`` fills missing record fields from schema defaults and ignores
  unknown JSON fields (the spec's "allow passing unknown json fields").

Spark's built-in ``to_json``/``from_json`` cover struct columns; this
module covers the schema-first path — a JSON document produced or consumed
against a REGISTRY schema, convertible to the exact datum the binary
envelope codec (``avro_binary.py``) writes, so JSON ⇄ binary round trips
are lossless. ``enveloped_to_json`` is the column-level surface: decode a
5-byte-enveloped binary log column straight to plain-JSON strings.
"""

from __future__ import annotations

import base64
import json
from typing import Iterator

from affinity_spark.functions.avro_binary import (
    _default_value,
    _norm,
    _type_of,
    _union_branch,
)


def datum_to_json(schema, datum, names: dict | None = None) -> str:
    """Compact plain-JSON text of ``datum`` under ``schema`` (a json-loaded
    schema node), field order = schema order."""
    return json.dumps(
        _to_jsonable(schema, datum, names or {}), separators=(",", ":")
    )


def _to_jsonable(schema, datum, names: dict):
    schema = _norm(schema, names)
    t = _type_of(schema)
    if t == "null":
        return None
    if t in ("boolean", "int", "long", "float", "double", "string", "enum"):
        return datum
    if t in ("bytes", "fixed"):
        return base64.b64encode(bytes(datum)).decode("ascii")
    if t == "union":
        if datum is None and any(
            _type_of(_norm(b, names)) == "null" for b in schema
        ):
            return None
        return _to_jsonable(schema[_union_branch(schema, datum, names)], datum, names)
    if t == "record":
        return {
            f["name"]: _to_jsonable(
                f["type"],
                datum[f["name"]] if f["name"] in datum else _default_value(f),
                names,
            )
            for f in schema["fields"]
        }
    if t == "array":
        return [_to_jsonable(schema["items"], x, names) for x in datum]
    if t == "map":
        return {str(k): _to_jsonable(schema["values"], v, names) for k, v in datum.items()}
    raise ValueError(f"unsupported avro type for json: {t!r}")


def json_to_datum(schema, text: str, names: dict | None = None):
    """Datum under ``schema`` from plain-JSON ``text`` — missing record
    fields take schema defaults, unknown JSON fields are ignored, union
    branches are re-inferred (first branch that accepts the value, the
    reference's read path)."""
    return _from_jsonable(schema, json.loads(text), names or {})


def _from_jsonable(schema, j, names: dict):
    schema = _norm(schema, names)
    t = _type_of(schema)
    if t == "null":
        if j is not None:
            raise ValueError(f"expected null, got {j!r}")
        return None
    if t == "boolean":
        if not isinstance(j, bool):
            raise ValueError(f"expected boolean, got {j!r}")
        return j
    if t in ("int", "long"):
        if isinstance(j, bool) or not isinstance(j, int):
            raise ValueError(f"expected integer, got {j!r}")
        return j
    if t in ("float", "double"):
        if isinstance(j, bool) or not isinstance(j, (int, float)):
            raise ValueError(f"expected number, got {j!r}")
        return float(j)
    if t == "string":
        if not isinstance(j, str):
            raise ValueError(f"expected string, got {j!r}")
        return j
    if t in ("bytes", "fixed"):
        if not isinstance(j, str):
            raise ValueError(f"expected base64 string, got {j!r}")
        return base64.b64decode(j)
    if t == "enum":
        if j not in schema["symbols"]:
            raise ValueError(f"{j!r} is not a symbol of enum {schema.get('name')}")
        return j
    if t == "union":
        if j is None:
            for b in schema:
                if _type_of(_norm(b, names)) == "null":
                    return None
            raise ValueError("null for a union without a null branch")
        last_err: Exception | None = None
        for b in schema:
            if _type_of(_norm(b, names)) == "null":
                continue
            try:
                return _from_jsonable(b, j, names)
            except ValueError as e:  # try the next branch
                last_err = e
        raise ValueError(f"no union branch accepts {j!r}: {last_err}")
    if t == "record":
        if not isinstance(j, dict):
            raise ValueError(f"expected object, got {j!r}")
        out = {}
        for f in schema["fields"]:
            if f["name"] in j:
                out[f["name"]] = _from_jsonable(f["type"], j[f["name"]], names)
            else:
                out[f["name"]] = _default_value(f)  # raises when no default
        return out  # unknown json fields fall through, per the reference
    if t == "array":
        if not isinstance(j, list):
            raise ValueError(f"expected array, got {j!r}")
        return [_from_jsonable(schema["items"], x, names) for x in j]
    if t == "map":
        if not isinstance(j, dict):
            raise ValueError(f"expected object, got {j!r}")
        return {k: _from_jsonable(schema["values"], v, names) for k, v in j.items()}
    raise ValueError(f"unsupported avro type for json: {t!r}")


def enveloped_to_json(df, value_col: str, registry, out_col: str = "json"):
    """Decode a 5-byte-enveloped Avro binary column straight to plain-JSON
    strings (one per row, under each row's own writer schema) — the
    log-inspection surface the reference exposes through its gateway JSON
    formatting. Arrow-batched; the registry snapshot ships once per
    executor via closure."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    from affinity_spark.functions.avro_binary import decode_datum, parse_schema

    PAYLOAD_OFFSET = 5  # [magic 0][4-byte BE schema id]
    schemas = {sid: registry.schema(sid) for sid in registry.ids()}
    schema = StructType([StructField(out_col, StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parsed = {sid: parse_schema(s) for sid, s in schemas.items()}
        for pdf in batches:
            out = []
            for raw in pdf[value_col]:
                buf = bytes(raw)
                if len(buf) < PAYLOAD_OFFSET or buf[0] != 0:
                    raise ValueError("invalid avro envelope (magic byte)")
                sid = int.from_bytes(buf[1:PAYLOAD_OFFSET], "big")
                if sid not in parsed:
                    raise ValueError(f"unregistered schema id {sid}")
                value, _ = decode_datum(parsed[sid], buf, PAYLOAD_OFFSET)
                out.append(datum_to_json(parsed[sid], value))
            yield pd.DataFrame({out_col: out})

    return df.select(value_col).mapInPandas(run, schema)

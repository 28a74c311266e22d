"""Pure-python Avro binary codec (no jar, no external lib).

The env has neither the spark-avro artifact nor the python ``avro``
package, so the envelope layer (``avro_envelope.py``) gates full decode on
``avro_available()``. This module removes that gate: a from-spec
implementation of the Avro *binary encoding* (zigzag-varint ints, IEEE754
little-endian floats, length-prefixed bytes/strings, field-concatenated
records, block-encoded arrays/maps, index-prefixed unions) plus the spec's
*Schema Resolution* rules (field match by name/aliases, reader defaults,
numeric/string-bytes promotions), so ``decode_enveloped`` can run
end-to-end in executors via Arrow-batched ``mapInPandas``.

Reference behavior mirrored: ``avro/src/main/scala/io/amient/affinity/avro/
record/AvroSerde.scala:123-173`` (write with writer schema, read back
resolved against the reader schema) and the projection matrix pinned by
``avro/src/test/scala/io/amient/affinity/avro/AvroProjectionSpec.scala``.
Everything here derives from the public Avro 1.11 specification.
"""

from __future__ import annotations

import json
import struct

# --------------------------------------------------------------------------
# varint / zigzag primitives
# --------------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    z &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("malformed avro varint")
    return (acc >> 1) ^ -(acc & 1), pos


# --------------------------------------------------------------------------
# schema helpers (schemas are plain json-loaded dicts/strings/lists)
# --------------------------------------------------------------------------


def _norm(schema, names: dict | None = None):
    """Resolve named-type references and {'type': 'string'}-style wrappers;
    collect named types into ``names`` as they appear (spec: a name is
    defined once and referred to by full name afterwards)."""
    if names is None:
        names = {}
    if isinstance(schema, str):
        return names.get(schema, schema)
    if isinstance(schema, dict) and schema.get("type") in ("record", "enum", "fixed"):
        name = schema.get("name")
        if name is not None:
            ns = schema.get("namespace")
            full = f"{ns}.{name}" if ns and "." not in name else name
            names.setdefault(full, schema)
            names.setdefault(name, schema)
    return schema


def _type_of(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def parse_schema(schema_json: str):
    return json.loads(schema_json)


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------


def encode_datum(schema, datum, names: dict | None = None) -> bytes:
    """Avro binary encoding of ``datum`` under ``schema`` (a json-loaded
    schema node)."""
    if names is None:
        names = {}
    schema = _norm(schema, names)
    t = _type_of(schema)
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if datum else b"\x00"
    if t in ("int", "long"):
        return _zigzag_encode(int(datum))
    if t == "float":
        return struct.pack("<f", float(datum))
    if t == "double":
        return struct.pack("<d", float(datum))
    if t == "bytes":
        b = bytes(datum)
        return _zigzag_encode(len(b)) + b
    if t == "string":
        b = str(datum).encode("utf-8")
        return _zigzag_encode(len(b)) + b
    if t == "union":
        idx = _union_branch(schema, datum, names)
        return _zigzag_encode(idx) + encode_datum(schema[idx], datum, names)
    if t == "record":
        out = bytearray()
        for f in schema["fields"]:
            if f["name"] not in datum and "default" in f:
                value = f["default"]
            else:
                value = datum[f["name"]]
            out += encode_datum(f["type"], value, names)
        return bytes(out)
    if t == "array":
        out = bytearray()
        items = list(datum)
        if items:
            out += _zigzag_encode(len(items))
            for x in items:
                out += encode_datum(schema["items"], x, names)
        out += _zigzag_encode(0)
        return bytes(out)
    if t == "map":
        out = bytearray()
        entries = list(datum.items())
        if entries:
            out += _zigzag_encode(len(entries))
            for k, v in entries:
                kb = str(k).encode("utf-8")
                out += _zigzag_encode(len(kb)) + kb
                out += encode_datum(schema["values"], v, names)
        out += _zigzag_encode(0)
        return bytes(out)
    if t == "enum":
        return _zigzag_encode(schema["symbols"].index(datum))
    if t == "fixed":
        b = bytes(datum)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(b)} != {schema['size']}")
        return b
    raise ValueError(f"unsupported avro type for encode: {t!r}")


def _union_branch(union: list, datum, names: dict) -> int:
    """First union branch the datum fits (spec leaves pick-order to the
    writer; first-match is what the java implementation does)."""
    for i, branch in enumerate(union):
        bt = _type_of(_norm(branch, names))
        if datum is None and bt == "null":
            return i
        if isinstance(datum, bool):
            if bt == "boolean":
                return i
            continue
        if isinstance(datum, int) and bt in ("int", "long"):
            return i
        if isinstance(datum, float) and bt in ("float", "double"):
            return i
        if isinstance(datum, str) and bt in ("string", "enum"):
            return i
        if isinstance(datum, (bytes, bytearray)) and bt in ("bytes", "fixed"):
            return i
        if isinstance(datum, dict) and bt in ("record", "map"):
            return i
        if isinstance(datum, (list, tuple)) and bt == "array":
            return i
    raise ValueError(f"datum {datum!r} matches no union branch {union!r}")


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


def decode_datum(schema, buf: bytes, pos: int = 0, names: dict | None = None):
    """Decode one datum; returns ``(value, next_pos)``."""
    if names is None:
        names = {}
    schema = _norm(schema, names)
    t = _type_of(schema)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "bytes":
        n, pos = _zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if t == "string":
        n, pos = _zigzag_decode(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if t == "union":
        idx, pos = _zigzag_decode(buf, pos)
        return decode_datum(schema[idx], buf, pos, names)
    if t == "record":
        out = {}
        for f in schema["fields"]:
            out[f["name"]], pos = decode_datum(f["type"], buf, pos, names)
        return out, pos
    if t == "array":
        out = []
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte-size prefix (spec: skip support)
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            for _ in range(n):
                x, pos = decode_datum(schema["items"], buf, pos, names)
                out.append(x)
    if t == "map":
        out = {}
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            for _ in range(n):
                klen, pos = _zigzag_decode(buf, pos)
                k = buf[pos : pos + klen].decode("utf-8")
                pos += klen
                out[k], pos = decode_datum(schema["values"], buf, pos, names)
    if t == "enum":
        idx, pos = _zigzag_decode(buf, pos)
        return schema["symbols"][idx], pos
    if t == "fixed":
        n = schema["size"]
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"unsupported avro type for decode: {t!r}")


# --------------------------------------------------------------------------
# writer -> reader resolution on decoded python values (Avro spec
# "Schema Resolution" — the python twin of avro_envelope.project_to_reader,
# which does the same on Spark struct COLUMNS)
# --------------------------------------------------------------------------

_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
    "boolean": {"boolean"},
    "null": {"null"},
}


def _unwrap_nullable(schema):
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) == 1:
            return non_null[0]
    return schema


def _default_value(field):
    if "default" not in field:
        raise ValueError(
            f"reader field {field['name']!r} absent from writer schema and "
            "has no default — schemas are incompatible (Avro resolution)"
        )
    d = field["default"]
    t = _type_of(_unwrap_nullable(field["type"]))
    if d is not None and t in ("bytes", "fixed"):
        # spec: bytes/fixed JSON defaults are strings of byte-valued chars
        return d.encode("latin-1")
    return d


def resolve_datum(writer, reader, value, names: dict | None = None):
    """Project a value decoded under ``writer`` onto ``reader``."""
    if names is None:
        names = {}
    w = _norm(_unwrap_nullable(writer), names)
    r = _norm(_unwrap_nullable(reader), names)
    w_t, r_t = _type_of(w), _type_of(r)
    if r_t == "record":
        if w_t != "record":
            raise ValueError(f"cannot resolve {w_t} into record {r.get('name')}")
        w_fields = {f["name"]: f for f in w["fields"]}
        for f in w["fields"]:
            for alias in f.get("aliases", ()):
                w_fields.setdefault(alias, f)
        out = {}
        for rf in r["fields"]:
            src = next(
                (w_fields[n] for n in (rf["name"], *rf.get("aliases", ())) if n in w_fields),
                None,
            )
            if src is None:
                out[rf["name"]] = _default_value(rf)
            else:
                out[rf["name"]] = resolve_datum(
                    src["type"], rf["type"], value[src["name"]], names
                )
        return out
    if value is None:
        return None
    if r_t == "array":
        if w_t != "array":
            raise ValueError("cannot resolve non-array into array")
        return [resolve_datum(w["items"], r["items"], x, names) for x in value]
    if r_t == "map":
        if w_t != "map":
            raise ValueError("cannot resolve non-map into map")
        return {k: resolve_datum(w["values"], r["values"], v, names) for k, v in value.items()}
    if w_t == r_t or (w_t in ("enum", "fixed") and r_t == w_t):
        return value
    if r_t in _PROMOTIONS.get(w_t, ()):
        if r_t in ("float", "double"):
            return float(value)
        if r_t == "long":
            return int(value)
        if w_t == "string" and r_t == "bytes":
            return value.encode("utf-8")
        if w_t == "bytes" and r_t == "string":
            return value.decode("utf-8")
        return value
    raise ValueError(f"writer type {w_t!r} not resolvable to reader {r_t!r}")

"""Schema-registry Avro envelope (the reference's wire format), JVM-side.

Affinity writes every value as a 5-byte header + Avro payload: magic byte 0
then a 4-byte big-endian schema id (``avro/.../record/AvroSerde.scala:123-138``),
read back with writer→reader projection after a registry lookup
(``AvroSerde.scala:158-173``). Spark's ``from_avro`` takes a fixed schema, so
the envelope layer is ours (SURVEY §1): these column functions split/build
the envelope with built-in binary expressions only (substring/hex/conv/
unhex/concat — all whole-stage-codegen'd, no UDF), and ``SchemaRegistry``
is the id→schema mapping used to group rows by writer schema before a
per-schema ``from_avro`` decode.

``from_avro``/``to_avro`` live in the optional spark-avro artifact; when the
jar is absent (it is in this env), ``decode_enveloped`` falls back to the
pure-python Avro binary codec (``avro_binary.py``) over Arrow-batched
``mapInPandas`` — same envelope split, same writer→reader resolution
semantics, executable end-to-end with no jar and no external lib.
"""

from __future__ import annotations

import json
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAGIC_BYTE = 0


def wrap_envelope(schema_id: int, payload: Column) -> Column:
    """payload bytes -> [0x00][4-byte BE schema id][payload]."""
    header = F.unhex(F.lit(f"00{schema_id & 0xFFFFFFFF:08x}"))
    return F.concat(header, payload)


def envelope_schema_id(value: Column) -> Column:
    """4-byte big-endian schema id from bytes 2-5 of an enveloped value."""
    return F.conv(F.hex(F.substring(value, 2, 4)), 16, 10).cast("int")


def envelope_magic(value: Column) -> Column:
    return F.conv(F.hex(F.substring(value, 1, 1)), 16, 10).cast("int")


def envelope_payload(value: Column) -> Column:
    """Avro payload bytes after the 5-byte header."""
    return F.substring(value, F.lit(6), F.length(value) - 5)


def valid_envelope(value: Column) -> Column:
    """Predicate: long enough and magic byte 0 (reject foreign wire data)."""
    return (F.length(value) >= 5) & (envelope_magic(value) == MAGIC_BYTE)


class SchemaRegistry:
    """Minimal in-memory schema registry (the reference ships embedded /
    memory registries for the same role in tests, ``avro/`` module).

    Canonical-json dedup: registering the same schema twice returns the
    same id — the contract the reference's registry client relies on.
    """

    def __init__(self) -> None:
        self._by_id: dict[int, str] = {}
        self._by_canonical: dict[str, int] = {}
        self._next = 1

    def register(self, schema_json: str) -> int:
        canonical = json.dumps(json.loads(schema_json), sort_keys=True, separators=(",", ":"))
        if canonical in self._by_canonical:
            return self._by_canonical[canonical]
        sid = self._next
        self._next += 1
        self._by_id[sid] = canonical
        self._by_canonical[canonical] = sid
        return sid

    def schema(self, schema_id: int) -> str:
        return self._by_id[schema_id]

    def ids(self) -> list[int]:
        return sorted(self._by_id)


def python_wrap(schema_id: int, payload: bytes) -> bytes:
    """Driver-side envelope builder (tests, producers): must agree bit-for-
    bit with ``wrap_envelope``."""
    return struct.pack(">bI", MAGIC_BYTE, schema_id) + payload


def avro_available(spark=None) -> bool:
    """True when the optional spark-avro artifact is on the classpath.

    The Python import always succeeds — the artifact check only happens at
    expression resolution — so this probes an actual ``from_avro`` analysis
    when a session is supplied (or active).
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError:
        return False
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        return True  # import-level check only
    try:
        spark.range(1).select(
            from_avro(F.lit(b"").cast("binary"), '{"type": "string"}')
        ).schema
    except Exception:  # noqa: BLE001 - AVRO_NOT_LOADED or analysis errors
        return False
    return True


# --- writer -> reader schema resolution (Avro spec "Schema Resolution") ----
# The reference resolves every stored record against the latest compiled
# schema at read time (AvroSerde.scala:158-173, AvroRecord.read:119-125,
# behavior pinned by AvroProjectionSpec.scala:169). Here the resolution is a
# Spark COLUMN projection applied after the per-writer-schema decode, so a
# mixed-schema log unions into one stable reader shape — all JVM-side
# expressions, no UDF.

_PROMOTIONS = {
    # writer type -> allowed reader types (Avro spec promotion lattice)
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
    "boolean": {"boolean"},
    "null": {"null"},
}

_SPARK_TYPES = {
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
    "boolean": "boolean",
    "null": "void",
}


def _unwrap_nullable(schema):
    """['null', T] / [T, 'null'] -> T (the common optional-field encoding)."""
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) == 1:
            return non_null[0]
    return schema


def _type_name(schema) -> str:
    schema = _unwrap_nullable(schema)
    if isinstance(schema, dict):
        return schema.get("type", "")
    return schema


def spark_type_for(avro_schema) -> str:
    """Spark DDL type for an Avro schema node (primitives + record/array/map)."""
    schema = _unwrap_nullable(avro_schema)
    if isinstance(schema, str):
        return _SPARK_TYPES[schema]
    t = schema["type"]
    if t == "record":
        fields = ", ".join(
            f"{f['name']}: {spark_type_for(f['type'])}" for f in schema["fields"]
        )
        return f"struct<{fields}>"
    if t == "array":
        return f"array<{spark_type_for(schema['items'])}>"
    if t == "map":
        return f"map<string, {spark_type_for(schema['values'])}>"
    if t in ("enum", "fixed"):
        return "string" if t == "enum" else "binary"
    return _SPARK_TYPES[t]


def _default_literal(field) -> Column:
    if "default" not in field:
        raise ValueError(
            f"reader field {field['name']!r} absent from writer schema and "
            "has no default — schemas are incompatible (Avro resolution)"
        )
    default = field["default"]
    if default is None:
        return F.lit(None).cast(spark_type_for(field["type"]))
    return F.lit(default).cast(spark_type_for(field["type"]))


def _project_node(col: Column, writer, reader) -> Column:
    """Resolve ``col`` (decoded with ``writer``) to the ``reader`` schema."""
    w, r = _unwrap_nullable(writer), _unwrap_nullable(reader)
    w_name, r_name = _type_name(writer), _type_name(reader)
    if isinstance(r, dict) and r.get("type") == "record":
        if not (isinstance(w, dict) and w.get("type") == "record"):
            raise ValueError(f"cannot resolve {w_name} into record {r.get('name')}")
        w_fields = {f["name"]: f for f in w["fields"]}
        # writer-side aliases also resolve (spec: match via name or aliases)
        for f in w["fields"]:
            for alias in f.get("aliases", ()):
                w_fields.setdefault(alias, f)
        out = []
        for rf in r["fields"]:
            names = [rf["name"], *rf.get("aliases", ())]
            src = next((w_fields[n] for n in names if n in w_fields), None)
            if src is None:
                out.append(_default_literal(rf).alias(rf["name"]))
            else:
                out.append(
                    _project_node(col[src["name"]], src["type"], rf["type"]).alias(
                        rf["name"]
                    )
                )
        return F.struct(*out)
    if isinstance(r, dict) and r.get("type") == "array":
        if not (isinstance(w, dict) and w.get("type") == "array"):
            raise ValueError("cannot resolve non-array into array")
        inner_w, inner_r = w["items"], r["items"]
        if json.dumps(inner_w, sort_keys=True) == json.dumps(inner_r, sort_keys=True):
            return col
        return F.transform(col, lambda x: _project_node(x, inner_w, inner_r))
    if isinstance(r, dict) and r.get("type") == "map":
        if not (isinstance(w, dict) and w.get("type") == "map"):
            raise ValueError("cannot resolve non-map into map")
        return col  # values must match exactly for now
    # primitives (+ enum/fixed passthrough)
    if w_name == r_name:
        return col
    if r_name in _PROMOTIONS.get(w_name, ()):  # promotion lattice
        return col.cast(spark_type_for(r))
    raise ValueError(f"writer type {w_name!r} not resolvable to reader {r_name!r}")


def project_to_reader(
    col: Column, writer_schema_json: str, reader_schema_json: str
) -> Column:
    """Column projecting a struct decoded with the writer schema onto the
    reader schema: field match by name/aliases, reader defaults for added
    fields, numeric/string-bytes promotions, recursive on records/arrays."""
    return _project_node(
        col, json.loads(writer_schema_json), json.loads(reader_schema_json)
    )


def invalid_envelopes(df: DataFrame, value_col: str, registry: SchemaRegistry) -> DataFrame:
    """Dead-letter frame: rows that are not valid envelopes (short value or
    wrong magic byte) or whose schema id is unknown to the registry — the
    rows the reference's AvroSerde.read would raise on."""
    value = F.col(value_col)
    return df.filter(
        (~valid_envelope(value))
        | (~envelope_schema_id(value).isin(registry.ids()))
    )


def encode_enveloped_python(
    df: DataFrame,
    record_col: str,
    registry: SchemaRegistry,
    schema_id: int,
    out_col: str = "value",
) -> DataFrame:
    """Encode a struct column to enveloped Avro binary with the pure-python
    codec (``avro_binary.encode_datum``): [magic 0][4-byte BE schema id]
    [avro binary of the record under the registry's writer schema]. Runs in
    executors via Arrow-batched ``mapInPandas`` — the producer half of the
    no-jar path, bit-compatible with ``python_wrap``/``wrap_envelope``."""
    from pyspark.sql.types import StructField, StructType, BinaryType

    from .avro_binary import encode_datum

    schema_json = registry.schema(schema_id)
    header = struct.pack(">bI", MAGIC_BYTE, schema_id)
    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField(out_col, BinaryType())]
    )

    def _encode(batches):
        writer = json.loads(schema_json)
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                header + encode_datum(writer, rec) for rec in pdf[record_col]
            ]
            yield pdf

    return df.mapInPandas(_encode, out_schema)


def decode_enveloped_python(
    df: DataFrame,
    value_col: str,
    registry: SchemaRegistry,
    reader_schema_json: str,
    out_col: str = "record",
    on_invalid: str = "fail",
) -> DataFrame:
    """No-jar twin of ``decode_enveloped``: per-row envelope split + Avro
    binary decode with the row's writer schema + resolution onto the reader
    schema, all inside one Arrow-batched ``mapInPandas`` (no per-schema
    union — the schema dispatch is a dict lookup per row, so a log with
    many writer schemas costs one pass regardless)."""
    from pyspark.sql.types import StructField, StructType

    from .avro_binary import decode_datum, resolve_datum

    if on_invalid not in ("fail", "drop"):
        raise ValueError("on_invalid must be 'fail' or 'drop'")
    schemas = {sid: registry.schema(sid) for sid in registry.ids()}
    if not schemas:
        raise ValueError("registry has no schemas")
    out_type = StructType.fromDDL(
        f"`{out_col}` {spark_type_for(json.loads(reader_schema_json))}"
    ).fields[0].dataType
    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField(out_col, out_type)]
    )

    def _decode(batches):
        import pandas as pd

        writers = {sid: json.loads(js) for sid, js in schemas.items()}
        reader = json.loads(reader_schema_json)
        for pdf in batches:
            recs, keep = [], []
            for i, v in enumerate(pdf[value_col]):
                b = bytes(v)
                sid = int.from_bytes(b[1:5], "big") if len(b) >= 5 else None
                if len(b) < 5 or b[0] != MAGIC_BYTE or sid not in writers:
                    if on_invalid == "fail":
                        raise ValueError(
                            "invalid avro envelope (magic/schema-id): "
                            f"0x{b[:5].hex()}"
                        )
                    continue
                datum, _ = decode_datum(writers[sid], b, 5)
                recs.append(resolve_datum(writers[sid], reader, datum))
                keep.append(i)
            out = pdf.iloc[keep].copy() if len(keep) != len(pdf) else pdf.copy()
            # explicit object dtype: an empty batch would otherwise default
            # to float64 and fail the Arrow struct conversion
            out[out_col] = pd.Series(recs, index=out.index, dtype="object")
            yield out

    return df.mapInPandas(_decode, out_schema)


def decode_enveloped(
    df: DataFrame,
    value_col: str,
    registry: SchemaRegistry,
    reader_schema_json: str,
    out_col: str = "record",
    on_invalid: str = "fail",
    engine: str = "auto",
) -> DataFrame:
    """Split by writer schema id, from_avro-decode each group with its
    registry (writer) schema, then project every group onto
    ``reader_schema_json`` (Avro schema-resolution rules) so the union has
    ONE stable shape regardless of how many writer schemas the log holds.

    ``on_invalid``: ``"fail"`` (default) raises at execution time on any row
    with a bad magic byte or an unregistered schema id — matching the
    reference's AvroSerde.read, which raises on both; ``"drop"`` silently
    excludes them (route them to a dead-letter sink via
    ``invalid_envelopes`` first).

    ``engine``: ``"jvm"`` (spark-avro ``from_avro``, whole-stage codegen),
    ``"python"`` (``decode_enveloped_python`` — no jar needed), or
    ``"auto"`` (jvm when ``avro_available()``, else python).
    """
    if on_invalid not in ("fail", "drop"):
        raise ValueError("on_invalid must be 'fail' or 'drop'")
    if engine not in ("auto", "jvm", "python"):
        raise ValueError("engine must be 'auto', 'jvm' or 'python'")
    if engine == "auto":
        engine = "jvm" if avro_available(df.sparkSession) else "python"
    if engine == "python":
        return decode_enveloped_python(
            df, value_col, registry, reader_schema_json, out_col, on_invalid
        )
    if not avro_available(df.sparkSession):
        raise ImportError(
            "spark-avro is not on the classpath; envelope split functions "
            "work without it, jvm decode does not (use engine='python')"
        )
    from pyspark.sql.avro.functions import from_avro

    value = F.col(value_col)
    parts = df.withColumn("_sid", envelope_schema_id(value)).withColumn(
        "_payload", envelope_payload(value)
    )
    decoded = None
    for sid in registry.ids():
        part = parts.filter(valid_envelope(value) & (F.col("_sid") == sid)).withColumn(
            out_col,
            project_to_reader(
                from_avro(F.col("_payload"), registry.schema(sid)),
                registry.schema(sid),
                reader_schema_json,
            ),
        )
        decoded = part if decoded is None else decoded.unionByName(part)
    if decoded is None:
        raise ValueError("registry has no schemas")
    if on_invalid == "fail":
        bad = invalid_envelopes(df, value_col, registry).withColumn(
            out_col,
            F.raise_error(
                F.concat(
                    F.lit("invalid avro envelope (magic/schema-id): 0x"),
                    F.hex(F.substring(value, 1, 5)),
                )
            ).cast(decoded.schema[out_col].dataType),
        )
        decoded = decoded.unionByName(bad)
    return decoded.drop("_sid", "_payload")

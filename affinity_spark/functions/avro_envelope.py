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

``from_avro``/``to_avro`` live in the optional spark-avro artifact; decode
helpers gate on its presence (``avro_available()``) so the envelope layer
works — and is tested — without it.
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


def decode_enveloped(
    df: DataFrame,
    value_col: str,
    registry: SchemaRegistry,
    reader_schema_json: str,
    out_col: str = "record",
) -> DataFrame:
    """Split by writer schema id and from_avro-decode each group with the
    registry's writer schema projected to ``reader_schema_json``.

    Requires spark-avro (``avro_available()``); the envelope split itself
    (id/payload columns) never does.
    """
    if not avro_available(df.sparkSession):
        raise ImportError(
            "spark-avro is not on the classpath; envelope split functions "
            "work without it, full decode does not"
        )
    from pyspark.sql.avro.functions import from_avro

    value = F.col(value_col)
    parts = df.withColumn("_sid", envelope_schema_id(value)).withColumn(
        "_payload", envelope_payload(value)
    )
    decoded = None
    for sid in registry.ids():
        part = parts.filter(F.col("_sid") == sid).withColumn(
            out_col, from_avro(F.col("_payload"), registry.schema(sid))
        )
        decoded = part if decoded is None else decoded.unionByName(part)
    if decoded is None:
        raise ValueError("registry has no schemas")
    return decoded.drop("_sid", "_payload")

"""HTTP schema-registry client matrix (reference
HttpSchemaRegistry.scala:95-150): hit / miss / unknown-id dead-letter, the
error_code convention, the id cache, and end-to-end integration with the
5-byte envelope decode."""

from __future__ import annotations

import json

import pytest

from affinity_spark.functions.avro_binary import encode_datum
from affinity_spark.functions.avro_envelope import (
    decode_enveloped,
    invalid_envelopes,
    python_wrap,
)
from affinity_spark.sources.schema_registry_http import (
    HttpSchemaRegistry,
    MockRegistryServer,
    RegistryError,
)

V1 = '{"type":"record","name":"R","fields":[{"name":"x","type":"int"}]}'
V2 = (
    '{"type":"record","name":"R","fields":[{"name":"x","type":"long"},'
    '{"name":"y","type":"string","default":"d"}]}'
)


def _client():
    server = MockRegistryServer()
    return server, HttpSchemaRegistry(server.transport(), default_subject="ev")


def test_register_and_fetch_roundtrip():
    server, client = _client()
    sid = client.register(V1)
    assert sid == 1
    assert json.loads(client.schema(sid)) == json.loads(V1)
    assert client.ids() == [1]


def test_register_same_canonical_same_id():
    _, client = _client()
    a = client.register(V1)
    b = client.register(json.dumps(json.loads(V1)))  # reordered json, same schema
    assert a == b


def test_schema_by_id_is_cached():
    server, client = _client()
    sid = client.register(V1)
    n_calls = len(server.calls)
    for _ in range(5):
        client.schema(sid)
    assert len(server.calls) == n_calls, "cache hit must not re-fetch"


def test_unknown_id_raises_registry_error():
    _, client = _client()
    with pytest.raises(RegistryError, match="40403"):
        client.get_schema_by_id(999)


def test_missing_subject_is_empty_not_error():
    _, client = _client()
    assert list(client.get_versions("nope")) == []
    assert list(client.get_subjects()) == []


def test_prefetch_subject_pulls_history():
    server, client = _client()
    client.register(V1)
    client.register(V2)
    fresh = HttpSchemaRegistry(server.transport(), default_subject="ev")
    assert fresh.ids() == []
    assert fresh.prefetch_subject() == [1, 2]
    assert fresh.ids() == [1, 2]
    assert list(fresh.get_versions("ev")) == [1, 2]


def test_envelope_decode_with_http_registry(spark):
    """Same decode path as the in-memory registry, registry over HTTP:
    writers v1+v2 resolved onto v2 via the pure-python engine; an envelope
    with an id the registry does not know dead-letters."""
    server, client = _client()
    sid1, sid2 = client.register(V1), client.register(V2)
    rows = [
        (python_wrap(sid1, encode_datum(json.loads(V1), {"x": 1})),),
        (python_wrap(sid2, encode_datum(json.loads(V2), {"x": 5, "y": "q"})),),
        (python_wrap(777, b"unknown-writer"),),
    ]
    df = spark.createDataFrame(rows, "value binary")
    reader = HttpSchemaRegistry(server.transport(), default_subject="ev")
    reader.prefetch_subject()
    out = decode_enveloped(df, "value", reader, V2, engine="python", on_invalid="drop")
    got = {r.record.x: r.record.y for r in out.collect()}
    assert got == {1: "d", 5: "q"}
    assert invalid_envelopes(df, "value", reader).count() == 1

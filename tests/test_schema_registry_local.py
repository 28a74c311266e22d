"""File-backed LocalSchemaRegistry matrix (reference
LocalSchemaRegistry.scala:49-114): id allocation from free .avsc slots,
per-subject version files + dedup, the registration lock, persistence
across instances, and end-to-end 5-byte-envelope decode reading ids from
the file registry."""

from __future__ import annotations

import json
import os

import pytest

from affinity_spark.functions.avro_binary import encode_datum
from affinity_spark.functions.avro_envelope import decode_enveloped, python_wrap
from affinity_spark.sources.schema_registry_local import (
    LocalSchemaRegistry,
    RegistryLockTimeout,
)

V1 = '{"type":"record","name":"R","fields":[{"name":"x","type":"int"}]}'
V2 = (
    '{"type":"record","name":"R","fields":[{"name":"x","type":"long"},'
    '{"name":"y","type":"string","default":"d"}]}'
)


def test_register_allocates_first_free_avsc_slot(tmp_path):
    reg = LocalSchemaRegistry(str(tmp_path))
    assert reg.register(V1) == 0
    assert reg.register(V2) == 1
    # files on disk match the reference layout
    assert sorted(os.listdir(tmp_path)) == ["0.avsc", "1.avsc", "default.dat"]
    assert json.loads(open(tmp_path / "0.avsc").read()) == json.loads(V1)
    assert open(tmp_path / "default.dat").read() == "0,1"


def test_reregistering_same_schema_returns_same_id(tmp_path):
    reg = LocalSchemaRegistry(str(tmp_path))
    sid = reg.register(V1)
    # whitespace/key-order differences canonicalize to the same schema
    reshuffled = json.dumps(json.loads(V1), indent=4)
    assert reg.register(reshuffled) == sid
    assert reg.ids() == [sid]


def test_subjects_have_independent_version_lists(tmp_path):
    reg = LocalSchemaRegistry(str(tmp_path))
    a = reg.register(V1, subject="topic-a")
    b = reg.register(V2, subject="topic-a")
    c = reg.register(V1, subject="topic-b")  # per-subject dedup: NEW id
    assert reg.versions("topic-a") == [a, b]
    assert reg.versions("topic-b") == [c]
    assert c not in (a, b)
    assert reg.subjects() == ["topic-a", "topic-b"]
    assert reg.versions("missing") == []


def test_registry_persists_across_instances(tmp_path):
    sid = LocalSchemaRegistry(str(tmp_path)).register(V1)
    fresh = LocalSchemaRegistry(str(tmp_path))
    assert fresh.ids() == [sid]
    assert json.loads(fresh.schema(sid)) == json.loads(V1)
    # the airgapped-share property: a second registry dir is independent
    other = LocalSchemaRegistry(str(tmp_path / "other"))
    assert other.ids() == []


def test_registration_lock_blocks_then_times_out(tmp_path):
    reg = LocalSchemaRegistry(str(tmp_path), lock_timeout_s=0.3)
    lock = tmp_path / ".lock"
    lock.touch()
    with pytest.raises(RegistryLockTimeout):
        reg.register(V1)
    lock.unlink()
    assert reg.register(V1) == 0  # recovers once the holder releases


def test_stale_lock_from_dead_writer_is_broken(tmp_path):
    reg = LocalSchemaRegistry(str(tmp_path), lock_timeout_s=1.0)
    lock = tmp_path / ".lock"
    lock.touch()
    os.utime(lock, (1, 1))  # ancient mtime = abandoned holder
    assert reg.register(V1) == 0


def test_envelope_decode_reads_ids_from_file_registry(spark, tmp_path):
    """The events_avro_decode path with the FILE registry: two writer
    schemas registered into a directory, rows enveloped with their ids,
    decoded by a registry instance that knows nothing but the path."""
    writer_dir = str(tmp_path / "registry")
    reg = LocalSchemaRegistry(writer_dir)
    sid1, sid2 = reg.register(V1), reg.register(V2)
    rows = [
        (1, bytes(python_wrap(sid1, encode_datum(json.loads(V1), {"x": 7})))),
        (2, bytes(python_wrap(sid2, encode_datum(json.loads(V2), {"x": 9, "y": "z"})))),
    ]
    df = spark.createDataFrame(rows, "k long, value binary")
    # a FRESH instance — ids resolve purely from the directory contents
    out = decode_enveloped(
        df, "value", LocalSchemaRegistry(writer_dir), V2, engine="python"
    )
    got = {r.k: (r.record.x, r.record.y) for r in out.collect()}
    assert got == {1: (7, "d"), 2: (9, "z")}

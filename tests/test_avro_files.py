"""Avro object-container-file source: parse, codecs, schema resolution,
dead-letter."""

import os

import pytest

from affinity_spark.sources.avro_files import parse_ocf, read_avro_files, write_ocf

USER_V1 = """
{"type": "record", "name": "User", "fields": [
  {"name": "id", "type": "long"},
  {"name": "name", "type": "string"}
]}
"""

USER_V2 = """
{"type": "record", "name": "User", "fields": [
  {"name": "id", "type": "long"},
  {"name": "name", "type": "string"},
  {"name": "score", "type": "long", "default": -1}
]}
"""


def test_ocf_roundtrip_null_and_deflate(tmp_path):
    recs = [{"id": i, "name": f"u{i}"} for i in range(100)]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"{codec}.avro")
        write_ocf(p, USER_V1, recs, codec=codec)
        info, back = parse_ocf(open(p, "rb").read())
        assert back == recs
        assert info["codec"] == codec


def test_read_avro_files_distributed(spark, tmp_path):
    d = tmp_path / "in"
    os.makedirs(d)
    for f in range(3):
        write_ocf(
            str(d / f"part{f}.avro"),
            USER_V1,
            [{"id": f * 10 + i, "name": f"u{f}_{i}"} for i in range(5)],
        )
    df = read_avro_files(spark, str(d), "id long, name string")
    rows = df.collect()
    assert len(rows) == 15
    assert all(r._corrupt_file is None for r in rows)
    assert {r.id for r in rows} == {f * 10 + i for f in range(3) for i in range(5)}


def test_mixed_writer_versions_resolve_to_reader_shape(spark, tmp_path):
    d = tmp_path / "mixed"
    os.makedirs(d)
    write_ocf(str(d / "old.avro"), USER_V1, [{"id": 1, "name": "a"}])
    write_ocf(str(d / "new.avro"), USER_V2, [{"id": 2, "name": "b", "score": 9}])
    df = read_avro_files(
        spark, str(d), "id long, name string, score long", reader_schema_json=USER_V2
    )
    got = {r.id: r.score for r in df.collect()}
    # old-writer rows take the reader default; new-writer rows keep their value
    assert got == {1: -1, 2: 9}


def test_corrupt_file_dead_lettered_not_dropped(spark, tmp_path):
    d = tmp_path / "dl"
    os.makedirs(d)
    write_ocf(str(d / "good.avro"), USER_V1, [{"id": 1, "name": "a"}])
    with open(d / "bad.avro", "wb") as f:
        f.write(b"Obj\x01garbage-not-a-container")
    df = read_avro_files(spark, str(d), "id long, name string")
    rows = df.collect()
    good = [r for r in rows if r._corrupt_file is None]
    bad = [r for r in rows if r._corrupt_file is not None]
    assert len(good) == 1 and good[0].id == 1
    assert len(bad) == 1 and bad[0].id is None and "bad.avro" in bad[0]._corrupt_file


def test_unsupported_codec_refuses(tmp_path):
    p = str(tmp_path / "x.avro")
    write_ocf(p, USER_V1, [{"id": 1, "name": "a"}])
    data = open(p, "rb").read().replace(b"null", b"nope", 1)
    with pytest.raises(ValueError, match="codec|magic|sync"):
        parse_ocf(data)

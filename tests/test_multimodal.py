"""Multimodal binary-column plumbing: metadata, magic sniff, stubbed
feature extraction through mapInPandas."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from affinity_spark.operators.multimodal import blob_metadata, extract_features

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
JPG = b"\xff\xd8\xff\xe0" + b"\x00" * 16
TXT = b"hello world"


def _blobs(spark):
    return spark.createDataFrame(
        [(1, PNG), (2, JPG), (3, TXT)], "id long, blob binary"
    )


def test_blob_metadata_modality_sniff(spark):
    got = {r.id: r for r in blob_metadata(_blobs(spark), "blob", ["id"]).collect()}
    assert got[1].modality == "image/png"
    assert got[2].modality == "image/jpeg"
    assert got[3].modality == "application/octet-stream"
    assert got[1].n_bytes == len(PNG)
    assert got[3].content_md5 == hashlib.md5(TXT).hexdigest()


def test_extract_features_stub_deterministic(spark):
    feats = extract_features(_blobs(spark), "id", "blob").collect()
    by_id = {r.id: r for r in feats}
    assert by_id[3].n_bytes == len(TXT)
    expect = [x / 255.0 for x in hashlib.md5(TXT).digest()[:4]]
    assert by_id[3].feature == pytest.approx(expect)
    # run twice: identical (stub is deterministic)
    again = {r.id: r.feature for r in extract_features(_blobs(spark), "id", "blob").collect()}
    assert again == {r.id: r.feature for r in feats}


def test_real_decode_refuses_unsupported_codec(spark):
    """decode_stub=False is now a REAL path for PNG/WAV (test_codecs.py);
    blobs that are neither refuse loudly at execution time — the JPEG blob
    hits 'no real decoder', and the PNG-magic-but-garbage blob dies inside
    the real PNG parser (missing IHDR). Either way: loud, never fake."""
    with pytest.raises(Exception, match="no real decoder|PNG"):
        extract_features(_blobs(spark), "id", "blob", decode_stub=False).collect()


def test_sample_frames_stub(spark):
    from affinity_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, bytes(range(100)))], "id long, blob binary")
    got = sample_frames(df, "id", "blob", n_frames=4).collect()
    assert [r.frame_idx for r in got] == [0, 1, 2, 3]
    assert all(r.n_bytes == 25 for r in got)
    # frames partition the blob deterministically
    assert bytes(got[0].frame) == bytes(range(25))


def test_resize_images_stub(spark):
    from affinity_spark.operators.multimodal import resize_images

    df = spark.createDataFrame([(1, PNG), (2, JPG)], "id long, blob binary")
    got = {r.id: r for r in resize_images(df, "id", "blob", 8, 8).collect()}
    assert all(len(bytes(r.resized)) == 64 for r in got.values())
    assert got[1].width == 8 and got[1].height == 8
    # deterministic and input-dependent
    assert bytes(got[1].resized) != bytes(got[2].resized)
    again = {r.id: bytes(r.resized) for r in resize_images(df, "id", "blob", 8, 8).collect()}
    assert again == {k: bytes(v.resized) for k, v in got.items()}


def test_multimodal_real_decode_refusals(spark):
    from affinity_spark.operators.multimodal import resize_images, sample_frames

    df = spark.createDataFrame([(1, TXT)], "id long, blob binary")
    with pytest.raises(NotImplementedError):
        sample_frames(df, "id", "blob", decode_stub=False)
    with pytest.raises(NotImplementedError):
        resize_images(df, "id", "blob", 8, 8, decode_stub=False)

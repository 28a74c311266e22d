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


def test_real_decode_refuses(spark):
    with pytest.raises(NotImplementedError):
        extract_features(_blobs(spark), "id", "blob", decode_stub=False)

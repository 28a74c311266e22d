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
    """decode_stub=False is now a REAL path for PNG/WAV/JPEG (test_codecs.py,
    test_jpeg.py); garbage blobs refuse loudly at execution time — the
    JPEG-magic blob dies inside the real JPEG marker walk ('expected
    marker'), the PNG-magic-but-garbage blob inside the real PNG parser,
    and anything unrecognized hits 'no real decoder'. Which one surfaces
    first depends on partition order; all are loud, never fake."""
    with pytest.raises(Exception, match="no real decoder|PNG|marker"):
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
    """Real paths refuse unsupported bytes AT EXECUTION, loudly: frame
    sampling needs EBML, resize needs PNG/JPEG magic."""
    from pyspark.errors.exceptions.captured import PythonException

    from affinity_spark.operators.multimodal import resize_images, sample_frames

    df = spark.createDataFrame([(1, TXT)], "id long, blob binary")
    with pytest.raises(PythonException, match="EBML"):
        sample_frames(df, "id", "blob", decode_stub=False).collect()
    with pytest.raises(PythonException, match="no real decoder"):
        resize_images(df, "id", "blob", 8, 8, decode_stub=False).collect()


def test_extract_features_real_jpeg(spark):
    from affinity_spark.functions.codecs import encode_jpeg_baseline
    from affinity_spark.operators.multimodal import extract_features

    jpg = encode_jpeg_baseline(16, 8, bytes([90] * 128))
    df = spark.createDataFrame([(1, bytearray(jpg))], "id long, blob binary")
    feats = extract_features(df, "id", "blob", decode_stub=False).collect()
    assert feats[0]["feature"] == [16.0, 8.0, 90.0, 1.0]


def test_resize_images_real_png_and_jpeg(spark):
    from affinity_spark.functions.codecs import encode_jpeg_baseline, encode_png_gray
    from affinity_spark.operators.multimodal import resize_images

    # PNG: 4x4 checkerboard of 0/255 -> 2x2 nearest-neighbor keeps corners
    board = bytes((0 if (x // 2 + y // 2) % 2 == 0 else 255)
                  for y in range(4) for x in range(4))
    png = encode_png_gray(4, 4, board)
    jpg = encode_jpeg_baseline(16, 16, bytes([200] * 256))
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(jpg))], "id long, blob binary"
    )
    got = {r["id"]: r for r in
           resize_images(df, "id", "blob", 2, 2, decode_stub=False).collect()}
    assert bytes(got[1]["resized"]) == bytes([board[0], board[2], board[8], board[10]])
    assert bytes(got[2]["resized"]) == bytes([200] * 4)
    assert got[2]["channels"] == 1


def test_sample_frames_real_mkv(spark):
    """Real container decode end-to-end: 10-frame MKV per row, 4 uniform
    samples with true timestamps + keyframe flags + opaque payloads."""
    from affinity_spark.functions.codecs import encode_mkv
    from affinity_spark.operators.multimodal import sample_frames

    def mkv(seed):
        frames = [
            (i * 40, i % 5 == 0, bytes([(seed + i) % 256] * (4 + i)))
            for i in range(10)
        ]
        return encode_mkv(64, 48, frames)

    df = spark.createDataFrame(
        [(1, mkv(10)), (2, mkv(99))], "id long, blob binary"
    )
    got = sample_frames(df, "id", "blob", n_frames=4, decode_stub=False).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.id, []).append(r)
    for rid, rows in by_id.items():
        rows.sort(key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == [0, 3, 6, 9]
        assert [r.ts_ms for r in rows] == [0, 120, 240, 360]
        assert [r.keyframe for r in rows] == [True, False, False, False]
        assert rows[3].n_bytes == 13
    seed = {1: 10, 2: 99}
    for rid, rows in by_id.items():
        assert bytes(rows[1].frame) == bytes([(seed[rid] + 3) % 256] * 7)


def test_mkv_decoder_skips_unknown_elements():
    """EBML forward-compat: Void/unknown elements are skipped by size."""
    from affinity_spark.functions.codecs import decode_mkv, encode_mkv

    mkv = encode_mkv(8, 8, [(0, True, b"xy")])
    # splice a Void element (id 0xEC, size 3) into the top level
    patched = mkv + bytes([0xEC, 0x83, 1, 2, 3])
    v = decode_mkv(patched)
    assert v.width == 8 and len(v.frames) == 1 and v.frames[0].data == b"xy"

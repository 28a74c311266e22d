"""Pure-python PNG/WAV codecs (stdlib zlib/struct) and the real multimodal
decode path they unlock."""

from __future__ import annotations

import struct
import zlib

import pytest

from affinity_spark.functions.codecs import (
    PNG_SIG,
    decode_png,
    decode_wav,
    encode_png_gray,
    encode_wav_pcm16,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_from_raw(width, height, raw, color_type=0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )


def test_png_roundtrip_gray():
    pixels = bytes((i * 3) % 256 for i in range(12 * 5))
    img = decode_png(encode_png_gray(12, 5, pixels))
    assert (img.width, img.height, img.channels) == (12, 5, 1)
    assert img.pixels == pixels


def test_png_unfilter_sub_up_avg_paeth():
    """Hand-filter two 4px rows with each filter type; decoder must undo it."""
    row0 = bytes([10, 20, 30, 40])
    row1 = bytes([15, 25, 35, 45])

    def sub(row):  # filter 1
        out = bytearray(row)
        for i in range(len(row) - 1, 0, -1):
            out[i] = (row[i] - row[i - 1]) & 0xFF
        return bytes(out)

    def up(row, prev):  # filter 2
        return bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))

    def avg(row, prev):  # filter 3
        out = bytearray()
        for i in range(len(row)):
            left = row[i - 1] if i else 0
            out.append((row[i] - ((left + prev[i]) >> 1)) & 0xFF)
        return bytes(out)

    def paeth(row, prev):  # filter 4 (left predictor wins on these values)
        out = bytearray()
        for i in range(len(row)):
            left = row[i - 1] if i else 0
            upleft = prev[i - 1] if i else 0
            p = left + prev[i] - upleft
            pa, pb, pc = abs(p - left), abs(p - prev[i]), abs(p - upleft)
            pred = left if (pa <= pb and pa <= pc) else (prev[i] if pb <= pc else upleft)
            out.append((row[i] - pred) & 0xFF)
        return bytes(out)

    for f1, enc1 in ((1, sub(row1)), (2, up(row1, row0)), (3, avg(row1, row0)), (4, paeth(row1, row0))):
        raw = b"\x00" + row0 + bytes([f1]) + enc1
        img = decode_png(_png_from_raw(4, 2, raw))
        assert img.pixels == row0 + row1, f"filter {f1} mis-decoded"


def test_png_rgb_stride():
    rgb = bytes(range(2 * 2 * 3))
    raw = b"\x00" + rgb[:6] + b"\x00" + rgb[6:]
    img = decode_png(_png_from_raw(2, 2, raw, color_type=2))
    assert img.channels == 3 and img.pixels == rgb


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOTAPNG")
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = PNG_SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(bad)


def test_wav_roundtrip():
    samples = [((i * 37) % 2048) - 1024 for i in range(50)]
    wav = decode_wav(encode_wav_pcm16(16000, 1, samples))
    assert wav.sample_rate == 16000 and wav.channels == 1
    assert wav.samples == samples


def test_wav_rejects_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x00" * 32)


def test_extract_features_real_path(spark):
    """decode_stub=False now actually decodes PNG/WAV in mapInPandas."""
    from pyspark.sql import functions as F

    from affinity_spark.operators.multimodal import extract_features

    png = encode_png_gray(3, 2, bytes([0, 50, 100, 150, 200, 250]))
    wav = encode_wav_pcm16(8000, 1, [100, -100, 200, -200])
    df = spark.createDataFrame([(1, png), (2, wav)], "doc_id long, blob binary")
    got = {
        r.doc_id: r.feature
        for r in extract_features(df, "doc_id", "blob", decode_stub=False).collect()
    }
    assert got[1] == [3.0, 2.0, 125.0, 1.0]  # w, h, mean pixel, channels
    assert got[2] == [8000.0, 1.0, 4.0, 150.0]  # rate, ch, n, mean |amp|


def test_extract_features_real_path_unknown_codec_raises(spark):
    from affinity_spark.operators.multimodal import extract_features

    df = spark.createDataFrame([(1, b"GIF89a....")], "doc_id long, blob binary")
    with pytest.raises(Exception, match="no real decoder"):
        extract_features(df, "doc_id", "blob", decode_stub=False).collect()
    # truncated JPEG (valid magic, no scan) fails loudly, not silently
    trunc = spark.createDataFrame(
        [(1, b"\xff\xd8\xff\xe0jpeg?")], "doc_id long, blob binary"
    )
    with pytest.raises(Exception):
        extract_features(trunc, "doc_id", "blob", decode_stub=False).collect()


# --- property tests --------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, data):
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    img = decode_png(encode_png_gray(w, h, pixels))
    assert (img.width, img.height) == (w, h)
    assert img.pixels == pixels


@settings(max_examples=30, deadline=None)
@given(
    rate=st.integers(min_value=1, max_value=192000),
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=200
    ),
)
def test_wav_roundtrip_property(rate, samples):
    wav = decode_wav(encode_wav_pcm16(rate, 1, samples))
    assert wav.sample_rate == rate
    assert wav.samples == samples


def test_dhash_bits_gradient_semantics():
    """dHash: one bit per horizontal neighbor pair, set when the right
    pixel is brighter; row-major bit order; capped at 63 bits (bit 63
    would overflow DuckDB's BIGINT shift); brightness-invariant."""
    from affinity_spark.functions.codecs import dhash_bits

    # 3x2 image: rows [1,2,0] (bits: 1 then 0), [5,5,9] (0 then 1)
    h = dhash_bits(bytes([1, 2, 0, 5, 5, 9]), 3, 2)
    assert h == 0b1001
    # brightness shift leaves the hash unchanged
    assert dhash_bits(bytes(v + 40 for v in [1, 2, 0, 5, 5, 9]), 3, 2) == h
    # 9x8 = 64 comparisons -> capped to 63: an image whose LAST comparison
    # is the only ascending pair hashes to 0
    px = bytearray(range(72, 0, -1))  # strictly descending everywhere
    px[70], px[71] = 1, 2  # ...except the final (dropped) comparison
    assert dhash_bits(bytes(px), 9, 8) == 0
    # and the bit just below the cap is reachable
    px2 = bytearray(range(72, 0, -1))
    px2[69], px2[70] = 1, 2  # comparison r=7,c=6 -> bit 62
    assert dhash_bits(bytes(px2), 9, 8) == 1 << 62

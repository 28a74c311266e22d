"""Baseline JPEG codec tests: round trips, hand-assembled 4:2:0 and
restart-marker streams, loud refusal of non-baseline shapes."""

import struct

import pytest

from affinity_spark.functions.codecs import (
    _AC_CHR_BITS,
    _AC_CHR_VALS,
    _AC_LUM_BITS,
    _AC_LUM_VALS,
    _DC_CHR_BITS,
    _DC_CHR_VALS,
    _DC_LUM_BITS,
    _DC_LUM_VALS,
    _BitWriter,
    _huff_codes,
    decode_jpeg,
    encode_jpeg_baseline,
)


def test_flat_gray_roundtrip_is_exact():
    for g in (0, 1, 77, 128, 254, 255):
        img = decode_jpeg(encode_jpeg_baseline(16, 8, bytes([g] * 128)))
        assert (img.width, img.height, img.n_components) == (16, 8, 1)
        assert set(img.pixels) == {g}


def test_partial_mcu_crops_to_exact_dims():
    # 12x10 needs 2x2 blocks with clamp-padding; decode must crop back
    img = decode_jpeg(encode_jpeg_baseline(12, 10, bytes([200] * 120)))
    assert (img.width, img.height) == (12, 10)
    assert len(img.pixels) == 120 and set(img.pixels) == {200}


def test_gradient_roundtrip_within_lossy_tolerance():
    grad = bytes([(x * 3 + y * 5) % 200 for y in range(16) for x in range(24)])
    out = decode_jpeg(encode_jpeg_baseline(24, 16, grad))
    assert max(abs(a - b) for a, b in zip(grad, out.pixels)) <= 4


def test_color_444_roundtrip_close():
    rgb = bytes([10, 200, 60] * 64)
    out = decode_jpeg(encode_jpeg_baseline(8, 8, rgb, n_components=3))
    assert out.n_components == 3
    for i in range(0, len(out.pixels), 3):
        assert abs(out.pixels[i] - 10) <= 2
        assert abs(out.pixels[i + 1] - 200) <= 2
        assert abs(out.pixels[i + 2] - 60) <= 2


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _tables_segment(two_channel):
    zq = bytes([8] * 64)
    out = _seg(0xDB, b"\x00" + zq)
    out += _seg(0xC4, bytes([0x00] + _DC_LUM_BITS + _DC_LUM_VALS))
    out += _seg(0xC4, bytes([0x10] + _AC_LUM_BITS + _AC_LUM_VALS))
    if two_channel:
        out += _seg(0xC4, bytes([0x01] + _DC_CHR_BITS + _DC_CHR_VALS))
        out += _seg(0xC4, bytes([0x11] + _AC_CHR_BITS + _AC_CHR_VALS))
    return out


def _write_dc_only_block(wtr, codes_dc, codes_ac, diff):
    s = abs(diff).bit_length()
    code, ln = codes_dc[s]
    wtr.write(code, ln)
    if s:
        wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    code, ln = codes_ac[0x00]  # EOB
    wtr.write(code, ln)


def test_hand_assembled_420_flat_color_decodes():
    """16x16 4:2:0 (Y h=v=2; Cb,Cr h=v=1): one MCU = 4 Y + 1 Cb + 1 Cr
    DC-only blocks. Flat planes with the all-8s table decode exactly,
    then YCbCr->RGB matches the reference formula."""
    y0, cb0, cr0 = 180, 100, 150
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 16, 16)
               + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dc_l, ac_l = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS), _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c, ac_c = _huff_codes(_DC_CHR_BITS, _DC_CHR_VALS), _huff_codes(_AC_CHR_BITS, _AC_CHR_VALS)
    wtr = _BitWriter()
    _write_dc_only_block(wtr, dc_l, ac_l, y0 - 128)   # Y block 1: diff from 0
    for _ in range(3):
        _write_dc_only_block(wtr, dc_l, ac_l, 0)      # same DC -> diff 0
    _write_dc_only_block(wtr, dc_c, ac_c, cb0 - 128)
    _write_dc_only_block(wtr, dc_c, ac_c, cr0 - 128)
    wtr.flush()
    data = (b"\xff\xd8" + _tables_segment(True) + sof + sos
            + bytes(wtr.out) + b"\xff\xd9")
    img = decode_jpeg(data)
    assert (img.width, img.height, img.n_components) == (16, 16, 3)
    r = round(y0 + 1.402 * (cr0 - 128))
    g = round(y0 - 0.344136 * (cb0 - 128) - 0.714136 * (cr0 - 128))
    b = round(y0 + 1.772 * (cb0 - 128))
    assert img.pixels[:3] == bytes([r, g, b])
    assert img.pixels == bytes([r, g, b]) * 256


def test_restart_markers_reset_dc_prediction():
    """24x8 grayscale, DRI=1: RST0/RST1 between the 3 MCUs; each block's
    DC diff is from 0, not the previous block."""
    levels = [50, 128, 220]
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 24) + bytes([1, 1, 0x11, 0]))
    dri = _seg(0xDD, struct.pack(">H", 1))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dc_l = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    body = b""
    for i, lv in enumerate(levels):
        wtr = _BitWriter()
        _write_dc_only_block(wtr, dc_l, ac_l, lv - 128)  # pred reset to 0
        wtr.flush()
        body += bytes(wtr.out)
        if i < len(levels) - 1:
            body += bytes([0xFF, 0xD0 + i])
    data = b"\xff\xd8" + _tables_segment(False) + sof + dri + sos + body + b"\xff\xd9"
    img = decode_jpeg(data)
    assert (img.width, img.height) == (24, 8)
    for i, lv in enumerate(levels):
        tile = [img.pixels[y * 24 + x] for y in range(8) for x in range(i * 8, i * 8 + 8)]
        assert set(tile) == {lv}


def test_progressive_refused_loudly():
    blob = bytearray(encode_jpeg_baseline(8, 8, bytes(64)))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(blob))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")

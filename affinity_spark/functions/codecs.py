"""Pure-python media codecs (stdlib only: struct + zlib).

The container ships no PIL/ffmpeg, but PNG and WAV are simple enough to
decode for real with the standard library — which turns the multimodal
plumbing (`operators/multimodal.py`) from an honest stub into a working
decode path for two codecs, while everything else still raises loudly.

PNG: full chunk walk, IHDR parse, IDAT zlib inflate, and per-scanline
unfiltering (filter types 0-4 incl. Paeth) for 8-bit grayscale/RGB/RGBA —
the spec's mandatory filters (PNG is a public W3C/ISO spec).
WAV: RIFF chunk walk, fmt_ parse, 16-bit PCM samples.

Encoders exist so tests and queries can synthesize REAL files to decode —
a wrong unfilter or a skipped chunk shows up as a wrong pixel sum, which
the DuckDB oracle catches.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype -> samples per pixel


@dataclass
class PngImage:
    width: int
    height: int
    bit_depth: int
    color_type: int
    pixels: bytes  # unfiltered scanlines, row-major, no filter bytes

    @property
    def channels(self) -> int:
        return _CHANNELS[self.color_type]


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal valid 8-bit grayscale PNG (filter 0 rows, one IDAT)."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> PngImage:
    """Real PNG decode: chunk walk → IHDR → inflate IDAT → unfilter rows."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG shape: depth={bit_depth} color={color_type} "
            f"interlace={interlace}"
        )
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                upleft = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out.extend(row)
        prev = row
    return PngImage(width, height, bit_depth, color_type, bytes(out))


@dataclass
class WavAudio:
    sample_rate: int
    channels: int
    bits_per_sample: int
    samples: list[int]  # interleaved PCM


def encode_wav_pcm16(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Minimal valid RIFF/WAVE with one fmt_ + data chunk (16-bit PCM)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> WavAudio:
    """Real WAV decode: RIFF chunk walk → fmt_ → 16-bit PCM samples."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    samples: list[int] = []
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data before fmt_")
            if fmt[0] != 1 or fmt[5] != 16:
                raise NotImplementedError("only 16-bit PCM supported")
            samples.extend(struct.unpack(f"<{len(body) // 2}h", body[: len(body) & ~1]))
    if fmt is None:
        raise ValueError("WAV missing fmt_ chunk")
    return WavAudio(fmt[2], fmt[1], fmt[5], samples)


# --------------------------------------------------------------------------
# Matroska (MKV) — EBML container walk, video track + SimpleBlock frames.
# EBML is the public RFC 8794 binary format; element IDs are from the public
# Matroska spec. No compression involved at the container level, so a full
# pure-python parse is exact: frame timestamps, keyframe flags and payload
# bytes come straight out of the VINT walk. Codec PAYLOAD decode (H.264
# etc.) stays out of scope — the container layer is what frame sampling
# needs (timestamps + keyframe flags select frames; payloads pass through
# opaque, which is exactly how a real sampler hands frames to a decoder).
# --------------------------------------------------------------------------

_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3

_MASTERS = {_EBML, _SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _CLUSTER}


@dataclass
class MkvFrame:
    ts_ms: int
    keyframe: bool
    data: bytes


@dataclass
class MkvVideo:
    doc_type: str
    timestamp_scale: int  # ns per timestamp unit
    codec_id: str
    width: int
    height: int
    frames: list


def _vint_encode(value: int) -> bytes:
    """EBML VINT with length marker (RFC 8794 §4): shortest form."""
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:
            return (value | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("vint out of range")


def _vint_decode(data: bytes, pos: int) -> tuple[int, int]:
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint")
    length = 9 - first.bit_length()
    raw = int.from_bytes(data[pos : pos + length], "big")
    return raw & ~(1 << (7 * length)), pos + length


def _id_encode(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _id_decode(data: bytes, pos: int) -> tuple[int, int]:
    # element IDs are VINTs stored WITH their marker bit
    length = 9 - data[pos].bit_length()
    if length > 4:
        raise ValueError("invalid EBML element id")
    return int.from_bytes(data[pos : pos + length], "big"), pos + length


def _uint_bytes(v: int) -> bytes:
    return v.to_bytes(max((v.bit_length() + 7) // 8, 1), "big")


def _elem(eid: int, payload: bytes) -> bytes:
    return _id_encode(eid) + _vint_encode(len(payload)) + payload


def encode_mkv(
    width: int,
    height: int,
    frames: list,  # [(ts_ms, keyframe, bytes)]
    codec_id: str = "V_UNCOMPRESSED",
) -> bytes:
    """Minimal valid Matroska file: EBML header, Info (1 ms timestamp
    scale), one video track, one cluster of SimpleBlocks."""
    header = _elem(
        _EBML,
        _elem(_DOCTYPE, b"matroska"),
    )
    info = _elem(_INFO, _elem(_TS_SCALE, _uint_bytes(1_000_000)))
    track = _elem(
        _TRACKS,
        _elem(
            _TRACK_ENTRY,
            _elem(_TRACK_NUMBER, _uint_bytes(1))
            + _elem(_TRACK_TYPE, _uint_bytes(1))
            + _elem(_CODEC_ID, codec_id.encode())
            + _elem(
                _VIDEO,
                _elem(_PIXEL_W, _uint_bytes(width)) + _elem(_PIXEL_H, _uint_bytes(height)),
            ),
        ),
    )
    blocks = b""
    for ts_ms, keyframe, data in frames:
        if not -32768 <= ts_ms <= 32767:
            raise ValueError("relative timestamp exceeds int16 (add clusters)")
        payload = (
            _vint_encode(1)  # track number
            + struct.pack(">h", ts_ms)  # relative timestamp
            + bytes([0x80 if keyframe else 0x00])  # flags: keyframe bit
            + bytes(data)
        )
        blocks += _elem(_SIMPLE_BLOCK, payload)
    cluster = _elem(_CLUSTER, _elem(_CLUSTER_TS, _uint_bytes(0)) + blocks)
    return header + _elem(_SEGMENT, info + track + cluster)


def _walk(data: bytes, pos: int, end: int):
    while pos < end:
        eid, pos = _id_decode(data, pos)
        size, pos = _vint_decode(data, pos)
        yield eid, pos, pos + size
        pos += size


def decode_mkv(data: bytes) -> MkvVideo:
    """EBML walk: doc type, timestamp scale, first video track's geometry,
    and every SimpleBlock as (absolute ms, keyframe, payload). Unknown
    elements are skipped by size — the EBML forward-compat contract."""
    data = bytes(data)
    out = MkvVideo("", 1_000_000, "", 0, 0, [])
    top = list(_walk(data, 0, len(data)))
    if not top or top[0][0] != _EBML:
        raise ValueError("not an EBML/Matroska stream")
    for eid, start, stop in top:
        if eid == _EBML:
            for ceid, cstart, cstop in _walk(data, start, stop):
                if ceid == _DOCTYPE:
                    out.doc_type = data[cstart:cstop].decode()
        elif eid == _SEGMENT:
            _decode_segment(data, start, stop, out)
    if out.doc_type not in ("matroska", "webm"):
        raise ValueError(f"unsupported EBML doc type {out.doc_type!r}")
    return out


def _decode_segment(data: bytes, pos: int, end: int, out: MkvVideo) -> None:
    for eid, start, stop in _walk(data, pos, end):
        if eid == _INFO:
            for ceid, cstart, cstop in _walk(data, start, stop):
                if ceid == _TS_SCALE:
                    out.timestamp_scale = int.from_bytes(data[cstart:cstop], "big")
        elif eid == _TRACKS:
            for ceid, cstart, cstop in _walk(data, start, stop):
                if ceid == _TRACK_ENTRY:
                    _decode_track(data, cstart, cstop, out)
        elif eid == _CLUSTER:
            cluster_ts = 0
            for ceid, cstart, cstop in _walk(data, start, stop):
                if ceid == _CLUSTER_TS:
                    cluster_ts = int.from_bytes(data[cstart:cstop], "big")
                elif ceid == _SIMPLE_BLOCK:
                    _, p = _vint_decode(data, cstart)  # track number
                    (rel,) = struct.unpack_from(">h", data, p)
                    flags = data[p + 2]
                    units = cluster_ts + rel
                    ts_ms = units * out.timestamp_scale // 1_000_000
                    out.frames.append(
                        MkvFrame(ts_ms, bool(flags & 0x80), data[p + 3 : cstop])
                    )


def _decode_track(data: bytes, pos: int, end: int, out: MkvVideo) -> None:
    is_video = False
    codec, w, h = "", 0, 0
    for eid, start, stop in _walk(data, pos, end):
        if eid == _TRACK_TYPE:
            is_video = int.from_bytes(data[start:stop], "big") == 1
        elif eid == _CODEC_ID:
            codec = data[start:stop].decode()
        elif eid == _VIDEO:
            for ceid, cstart, cstop in _walk(data, start, stop):
                if ceid == _PIXEL_W:
                    w = int.from_bytes(data[cstart:cstop], "big")
                elif ceid == _PIXEL_H:
                    h = int.from_bytes(data[cstart:cstop], "big")
    if is_video and not out.codec_id:
        out.codec_id, out.width, out.height = codec, w, h


# --------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 / ISO 10918-1, public spec) — sequential DCT,
# huffman coding, 8-bit samples. Pure python + math: marker walk, DQT/DHT/
# SOF0/SOS/DRI parse, canonical huffman decode with byte unstuffing and
# restart markers, dequantize + inverse zigzag + IDCT, sampling-factor
# upsampling (4:4:4 / 4:2:2 / 4:2:0), YCbCr->RGB. Progressive (SOF2),
# arithmetic coding and 12-bit refuse loudly. The encoder emits real
# baseline streams (grayscale or 4:4:4 YCbCr, Annex K huffman tables) so
# tests and queries synthesize genuine JPEGs to decode.
# --------------------------------------------------------------------------

import math

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical huffman tables (BITS, HUFFVAL) — public spec constants.
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: All-8s quantization table: flat blocks round-trip EXACTLY (DC quantizes
#: to v-128 with no loss), which gives queries a closed-form oracle.
QUANT_FLAT8 = [8] * 64


@dataclass
class JpegImage:
    width: int
    height: int
    n_components: int  # 1 = grayscale, 3 = YCbCr->RGB
    pixels: bytes  # interleaved, row-major


class _HuffTable:
    """Canonical huffman: (BITS, HUFFVAL) -> per-length first-code tables
    (T.81 Annex C) for O(length) decode without building the whole tree."""

    def __init__(self, bits, vals):
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            code += n
            k += n
            self.maxcode[ln] = code - 1 if n else -1
            code <<= 1
        self.vals = vals

    def decode(self, reader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | reader.bit()
            if self.maxcode[ln] >= code >= self.mincode[ln]:
                return self.vals[self.valptr[ln] + code - self.mincode[ln]]
        raise ValueError("bad huffman code")


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.acc, self.n = 0, 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError(f"marker 0xFF{nxt:02X} inside scan")
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Align to byte boundary and consume an RSTn marker."""
        self.n = 0
        while self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        raise ValueError("expected restart marker")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1: map n received bits to the signed coefficient."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


_IDCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) * (math.sqrt(0.5) if u == 0 else 1.0)
     for u in range(8)]
    for x in range(8)
]


def _idct2d(block) -> list:
    """8x8 type-III DCT (T.81 A.3.3), separable rows-then-cols."""
    tmp = [0.0] * 64
    for y in range(8):
        row = block[y * 8 : y * 8 + 8]
        for x in range(8):
            tmp[y * 8 + x] = 0.5 * sum(row[u] * _IDCT_COS[x][u] for u in range(8))
    out = [0.0] * 64
    for x in range(8):
        col = [tmp[v * 8 + x] for v in range(8)]
        for y in range(8):
            out[y * 8 + x] = 0.5 * sum(col[v] * _IDCT_COS[y][v] for v in range(8))
    return out


def _fdct2d(block) -> list:
    """Forward 8x8 DCT (T.81 A.3.3) for the encoder."""
    out = [0.0] * 64
    for v in range(8):
        cv = math.sqrt(0.5) if v == 0 else 1.0
        for u in range(8):
            cu = math.sqrt(0.5) if u == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (
                        block[y * 8 + x]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[v * 8 + u] = 0.25 * cu * cv * s
    return out


def decode_jpeg(data: bytes) -> JpegImage:
    """Real baseline JPEG decode: marker walk -> entropy decode -> dequant
    -> IDCT -> upsample -> color convert."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, list] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = [0] * 64
                for i in range(64):
                    qt[tq][_ZIGZAG[i]] = body[p + 1 + i]
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline SOF 0x{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tds = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tds >> 4, tds & 0xF))
            pos += seglen
            return _decode_scan(data, pos, frame, scan, qt, huff, restart_interval)
        pos += seglen
    raise ValueError("no SOS in JPEG stream")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in comps:
        cw, ch = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = [0] * (cw * ch)
        c["cw"], c["ch"] = cw, ch
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.sync_restart()
                pred = {c["id"]: 0 for c in comps}
            n_mcu += 1
            for comp, td, ta in scan:
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = [0] * 64
                        s = huff[(0, td)].decode(reader)
                        diff = _extend(reader.receive(s), s)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = huff[(1, ta)].decode(reader)
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _extend(reader.receive(size), size)
                            k += 1
                        block = [0.0] * 64
                        for i in range(64):
                            block[_ZIGZAG[i]] = zz[i] * q[_ZIGZAG[i]]
                        px = _idct2d(block)
                        ox = (mx * comp["h"] + bx) * 8
                        oy = (my * comp["v"] + by) * 8
                        cw = comp["cw"]
                        for y in range(8):
                            base = (oy + y) * cw + ox
                            for x in range(8):
                                v = int(round(px[y * 8 + x])) + 128
                                planes[comp["id"]][base + x] = (
                                    0 if v < 0 else 255 if v > 255 else v
                                )
    if len(comps) == 1:
        c = comps[0]
        cw = c["cw"]
        plane = planes[c["id"]]
        out = bytearray(w * h)
        for y in range(h):
            out[y * w : (y + 1) * w] = bytes(plane[y * cw : y * cw + w])
        return JpegImage(w, h, 1, bytes(out))
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    cy, cb, cr = (comps[i] for i in range(3))
    out = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            yy = planes[cy["id"]][
                (y * cy["v"] // vmax) * cy["cw"] + (x * cy["h"] // hmax)
            ]
            ub = planes[cb["id"]][
                (y * cb["v"] // vmax) * cb["cw"] + (x * cb["h"] // hmax)
            ] - 128
            vr = planes[cr["id"]][
                (y * cr["v"] // vmax) * cr["cw"] + (x * cr["h"] // hmax)
            ] - 128
            r = int(round(yy + 1.402 * vr))
            g = int(round(yy - 0.344136 * ub - 0.714136 * vr))
            b = int(round(yy + 1.772 * ub))
            i = (y * w + x) * 3
            out[i] = 0 if r < 0 else 255 if r > 255 else r
            out[i + 1] = 0 if g < 0 else 255 if g > 255 else g
            out[i + 2] = 0 if b < 0 else 255 if b > 255 else b
    return JpegImage(w, h, 3, bytes(out))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits (T.81 F.1.2.3)


def _huff_codes(bits, vals):
    """Canonical code assignment (T.81 Annex C): val -> (code, length)."""
    out = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _csize(v: int) -> int:
    return abs(v).bit_length()


def encode_jpeg_baseline(
    width: int,
    height: int,
    pixels: bytes,
    n_components: int = 1,
    quant=None,
) -> bytes:
    """Real baseline JPEG encoder: grayscale or 4:4:4 YCbCr from
    interleaved RGB, Annex K huffman tables, one interleaved scan.

    With the default all-8s quant table a FLAT image round-trips exactly
    (the DC quantizer divides 8*(v-128) by 8), which is what gives the
    media-decode query a closed-form cross-engine oracle.
    """
    if quant is None:
        quant = QUANT_FLAT8
    if len(pixels) != width * height * n_components:
        raise ValueError("pixels must be width*height*n_components bytes")
    if n_components not in (1, 3):
        raise NotImplementedError("grayscale or RGB only")

    # -- color convert + plane split (4:4:4 keeps geometry trivial) --
    planes = []
    if n_components == 1:
        planes.append(list(pixels))
    else:
        ny, ncb, ncr = [], [], []
        for i in range(0, len(pixels), 3):
            r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
            ny.append(min(255, max(0, int(round(0.299 * r + 0.587 * g + 0.114 * b)))))
            ncb.append(min(255, max(0, int(round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)))))
            ncr.append(min(255, max(0, int(round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)))))
        planes = [ny, ncb, ncr]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zq = bytes(quant[_ZIGZAG[i]] for i in range(64))
    dqt = seg(0xDB, b"\x00" + zq)
    comps_sof = b""
    comps_sos = b""
    for ci in range(n_components):
        comps_sof += bytes([ci + 1, 0x11, 0])  # id, h=v=1, quant table 0
        comps_sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", height, width)
              + bytes([n_components]) + comps_sof)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    tables = dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS) + dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if n_components == 3:
        tables += dht(0, 1, _DC_CHR_BITS, _DC_CHR_VALS) + dht(
            1, 1, _AC_CHR_BITS, _AC_CHR_VALS
        )
    sos = seg(0xDA, bytes([n_components]) + comps_sos + bytes([0, 63, 0]))

    dc_codes = [_huff_codes(_DC_LUM_BITS, _DC_LUM_VALS),
                _huff_codes(_DC_CHR_BITS, _DC_CHR_VALS)]
    ac_codes = [_huff_codes(_AC_LUM_BITS, _AC_LUM_VALS),
                _huff_codes(_AC_CHR_BITS, _AC_CHR_VALS)]

    wtr = _BitWriter()
    mcux, mcuy = (width + 7) // 8, (height + 7) // 8
    pred = [0] * n_components
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(n_components):
                plane = planes[ci]
                block = [0.0] * 64
                for y in range(8):
                    for x in range(8):
                        # clamp-edge padding for partial blocks
                        sy = min(my * 8 + y, height - 1)
                        sx = min(mx * 8 + x, width - 1)
                        block[y * 8 + x] = plane[sy * width + sx] - 128
                coefs = _fdct2d(block)
                zz = [0] * 64
                for i in range(64):
                    c = coefs[_ZIGZAG[i]] / quant[_ZIGZAG[i]]
                    zz[i] = int(math.floor(c + 0.5)) if c >= 0 else -int(
                        math.floor(-c + 0.5)
                    )
                t = 0 if ci == 0 else 1
                diff = zz[0] - pred[ci]
                pred[ci] = zz[0]
                s = _csize(diff)
                code, ln = dc_codes[t][s]
                wtr.write(code, ln)
                if s:
                    wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                k = 1
                while k < 64:
                    run = 0
                    while k < 64 and zz[k] == 0:
                        run += 1
                        k += 1
                    if k == 64:
                        code, ln = ac_codes[t][0x00]  # EOB
                        wtr.write(code, ln)
                        break
                    while run > 15:
                        code, ln = ac_codes[t][0xF0]  # ZRL
                        wtr.write(code, ln)
                        run -= 16
                    v = zz[k]
                    s = _csize(v)
                    code, ln = ac_codes[t][(run << 4) | s]
                    wtr.write(code, ln)
                    wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                    k += 1
    wtr.flush()
    return (b"\xff\xd8" + dqt + sof + tables + sos + bytes(wtr.out) + b"\xff\xd9")


def dhash_bits(pixels: bytes, width: int, height: int) -> int:
    """Difference hash (dHash) of a grayscale image: one bit per pair of
    horizontally adjacent pixels, set when the right pixel is brighter —
    the classic perceptual image fingerprint (gradient signs survive
    re-encoding and brightness shifts). Bits are numbered row-major over
    (height x (width-1)) comparisons, CAPPED AT 63 so the fingerprint is
    a non-negative int64 in every engine (DuckDB refuses 1 << 63); a 9x8
    input gives the standard 8x8-comparison dHash minus its last bit."""
    h = 0
    bit = 0
    for r in range(height):
        for c in range(width - 1):
            if bit >= 63:
                return h
            if pixels[r * width + c + 1] > pixels[r * width + c]:
                h |= 1 << bit
            bit += 1
    return h

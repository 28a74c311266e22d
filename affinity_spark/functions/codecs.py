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

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

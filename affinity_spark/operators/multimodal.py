"""Multimodal (binary) column handling for training-data pipelines.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; all per-blob compute runs as Arrow-batched ``mapInPandas`` so the
100 TB path is: parquet scan (binary column stays columnar/Arrow end to
end) → partition-parallel Python batches → typed struct out. No driver
collect, no per-row Python UDF.

PNG, WAV, baseline JPEG and the Matroska container layer decode for REAL
via the pure-python codecs in ``functions/codecs.py`` (chunk walk + zlib
unfilter / RIFF PCM parse / huffman+IDCT / EBML walk); anything else
still raises ``NotImplementedError`` on the real path —
``decode_stub=True`` keeps the deterministic fake-feature route for
plumbing tests of unsupported codecs. A production deployment swaps the
codec bodies for PIL/ffmpeg and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from affinity_spark.functions.codecs import decode_jpeg, decode_png, decode_wav

BLOB_META_SCHEMA = (
    "n_bytes long, content_md5 string, magic string, modality string"
)


def blob_metadata(df: DataFrame, blob_col: str, keep_cols: list[str]) -> DataFrame:
    """Typed metadata for a binary column — JVM-side only (no Python hop):
    size, content hash, magic-byte sniff, coarse modality."""
    magic = F.hex(F.substring(F.col(blob_col), 1, 4))
    modality = (
        F.when(magic.startswith("89504E47"), "image/png")
        .when(magic.startswith("FFD8FF"), "image/jpeg")
        .when(magic.startswith("52494646"), "audio/wav")
        .when(magic.startswith("1A45DFA3"), "video/mkv")
        .otherwise("application/octet-stream")
    )
    return df.select(
        *[F.col(c) for c in keep_cols],
        F.length(F.col(blob_col)).alias("n_bytes"),
        F.md5(F.col(blob_col)).alias("content_md5"),
        magic.alias("magic"),
        modality.alias("modality"),
    )


def _decode_batch(blobs: pd.Series) -> pd.DataFrame:
    """STUB decode: deterministic 4-float pseudo-feature per blob.

    The real path is ``_decode_real_batch`` (PNG/WAV actually decoded);
    this fake stays for plumbing tests of not-yet-supported codecs.
    """
    feats = []
    for b in blobs:
        h = hashlib.md5(bytes(b)).digest()
        feats.append([x / 255.0 for x in h[:4]])
    return pd.DataFrame({"feature": feats})


def _decode_real_batch(blobs: pd.Series) -> pd.DataFrame:
    """REAL decode for PNG, baseline JPEG and WAV (pure-python codecs);
    anything else raises so unsupported media never silently ships fake
    features.

    Feature layout (fixed width 4, so the column type is stable):
    - PNG:  [width, height, mean_pixel, channels]
    - JPEG: [width, height, mean_pixel, n_components]
    - WAV:  [sample_rate, channels, n_samples, mean_abs_amplitude]
    """
    feats = []
    for b in blobs:
        data = bytes(b)
        if data[:2] == b"\xff\xd8":
            jpg = decode_jpeg(data)
            n = len(jpg.pixels)
            feats.append(
                [
                    float(jpg.width),
                    float(jpg.height),
                    (sum(jpg.pixels) / n) if n else 0.0,
                    float(jpg.n_components),
                ]
            )
        elif data[:8] == b"\x89PNG\r\n\x1a\n":
            img = decode_png(data)
            n = len(img.pixels)
            feats.append(
                [
                    float(img.width),
                    float(img.height),
                    (sum(img.pixels) / n) if n else 0.0,
                    float(img.channels),
                ]
            )
        elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            wav = decode_wav(data)
            n = len(wav.samples)
            feats.append(
                [
                    float(wav.sample_rate),
                    float(wav.channels),
                    float(n),
                    (sum(abs(s) for s in wav.samples) / n) if n else 0.0,
                ]
            )
        else:
            raise NotImplementedError(
                f"no real decoder for magic {data[:4]!r}; PNG, baseline "
                "JPEG and WAV are supported, other codecs need PIL/ffmpeg"
            )
    return pd.DataFrame({"feature": feats})


def sample_frames(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    n_frames: int = 4,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame sampling for video-ish blobs: one output row per sampled frame
    (UDTF shape: explode inside mapInPandas keeps batches Arrow-sized).

    ``decode_stub=True``: frames are equal byte-slices of the blob; output
    (id, frame_idx, frame binary, n_bytes).

    ``decode_stub=False``: REAL Matroska container decode
    (``functions/codecs.decode_mkv`` — EBML walk, SimpleBlock timestamps,
    keyframe flags). ``n_frames`` uniformly-spaced frames are selected by
    integer index math (``j*(total-1) div (n-1)``); output
    (id, frame_idx, ts_ms, keyframe, frame binary, n_bytes). Codec payload
    decode stays out of scope — frames pass through opaque, as a sampler
    hands them to a downstream decoder.
    """
    if not decode_stub:
        return _sample_frames_mkv(df, id_col, blob_col, n_frames)
    schema = f"{id_col} long, frame_idx int, frame binary, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, sizes = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(b)
                step = max(len(data) // n_frames, 1)
                for f in range(min(n_frames, len(data))):
                    chunk = data[f * step : (f + 1) * step]
                    ids.append(i)
                    idxs.append(f)
                    frames.append(chunk)
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames, "n_bytes": sizes}
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def _sample_frames_mkv(
    df: DataFrame, id_col: str, blob_col: str, n_frames: int
) -> DataFrame:
    schema = (
        f"{id_col} long, frame_idx int, ts_ms long, keyframe boolean, "
        "frame binary, n_bytes long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from affinity_spark.functions.codecs import decode_mkv

        for pdf in batches:
            out = {
                id_col: [], "frame_idx": [], "ts_ms": [],
                "keyframe": [], "frame": [], "n_bytes": [],
            }
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                video = decode_mkv(bytes(b))
                total = len(video.frames)
                if total == 0:
                    continue
                if total <= n_frames or n_frames == 1:
                    idxs = list(range(total if n_frames > 1 else 1))
                else:
                    idxs = sorted(
                        {(j * (total - 1)) // (n_frames - 1) for j in range(n_frames)}
                    )
                for idx in idxs:
                    f = video.frames[idx]
                    out[id_col].append(int(i))
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(f.ts_ms)
                    out["keyframe"].append(f.keyframe)
                    out["frame"].append(f.data)
                    out["n_bytes"].append(len(f.data))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def resize_images(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    width: int,
    height: int,
    decode_stub: bool = True,
) -> DataFrame:
    """Image resize plumbing: (id, resized binary, width, height).

    ``decode_stub=True``: emits a deterministic ``width*height``-byte
    pseudo-bitmap derived from the source bytes (md5-seeded tiling) so
    downstream schema/batch behavior is real without any codec.

    ``decode_stub=False``: REAL resize — PNG and baseline JPEG blobs are
    decoded by the pure-python codecs and resampled nearest-neighbor
    (integer index math ``src = dst * src_dim div dst_dim``); the output
    binary is the raw interleaved bitmap (grayscale or RGB at the
    source's channel count) ready for a feature extractor. Other formats
    raise.
    """
    if not decode_stub:
        return _resize_images_real(df, id_col, blob_col, width, height)
    schema = f"{id_col} long, resized binary, width int, height int"
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[blob_col]:
                seed = hashlib.md5(bytes(b)).digest()
                tiled = (seed * (target // len(seed) + 1))[:target]
                out.append(tiled)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "resized": out,
                    "width": [width] * len(out),
                    "height": [height] * len(out),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def extract_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    decode_stub: bool = True,
) -> DataFrame:
    """Per-blob feature extraction via mapInPandas (Arrow batches).

    Output: (id, n_bytes, feature array<double>). With ``decode_stub=False``
    PNG and WAV blobs are decoded FOR REAL (stdlib codecs); other formats
    raise ``NotImplementedError`` at execution time.
    """
    schema = f"{id_col} long, n_bytes long, feature array<double>"
    decode = _decode_batch if decode_stub else _decode_real_batch

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = decode(pdf[blob_col])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": pdf[blob_col].map(len).values,
                    "feature": out["feature"].values,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def _resize_images_real(
    df: DataFrame, id_col: str, blob_col: str, width: int, height: int
) -> DataFrame:
    """Real nearest-neighbor resize over decoded PNG/JPEG pixels."""
    schema = f"{id_col} long, resized binary, width int, height int, channels int"

    def resample(pixels: bytes, sw: int, sh: int, ch: int) -> bytes:
        out = bytearray(width * height * ch)
        for y in range(height):
            sy = y * sh // height
            for x in range(width):
                sx = x * sw // width
                src = (sy * sw + sx) * ch
                dst = (y * width + x) * ch
                out[dst : dst + ch] = pixels[src : src + ch]
        return bytes(out)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "resized": [], "width": [], "height": [], "channels": []}
            for rid, b in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(b)
                if data[:8] == b"\x89PNG\r\n\x1a\n":
                    img = decode_png(data)
                    sw, sh, ch, px = img.width, img.height, img.channels, img.pixels
                elif data[:2] == b"\xff\xd8":
                    jpg = decode_jpeg(data)
                    sw, sh, ch, px = jpg.width, jpg.height, jpg.n_components, jpg.pixels
                else:
                    raise NotImplementedError(
                        f"no real decoder for magic {data[:4]!r}"
                    )
                rows[id_col].append(int(rid))
                rows["resized"].append(resample(px, sw, sh, ch))
                rows["width"].append(width)
                rows["height"].append(height)
                rows["channels"].append(ch)
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(run, schema)

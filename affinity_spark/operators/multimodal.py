"""Multimodal (binary) column handling for training-data pipelines.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; all per-blob compute runs as Arrow-batched ``mapInPandas`` so the
100 TB path is: parquet scan (binary column stays columnar/Arrow end to
end) → partition-parallel Python batches → typed struct out. No driver
collect, no per-row Python UDF.

The decode step (pixels/samples) is STUBBED — codec libraries are not in
this container. ``decode_stub=True`` produces a deterministic fake feature
vector from the bytes so the plumbing (schema, batch shape, partitioning)
is real and testable; a production deployment swaps ``_decode_batch`` for
PIL/ffmpeg and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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

    Real deployments replace this with the codec (PIL.Image.open /
    torchaudio / pyav). Raises NotImplementedError when asked for real
    decoding so nothing silently ships fake features.
    """
    feats = []
    for b in blobs:
        h = hashlib.md5(bytes(b)).digest()
        feats.append([x / 255.0 for x in h[:4]])
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

    STUB: frames are equal byte-slices of the blob (a real build swaps in
    pyav keyframe extraction; schema and fan-out stay identical). Output:
    (id, frame_idx, frame binary, n_bytes).
    """
    if not decode_stub:
        raise NotImplementedError("video decoding requires codecs not in this env")
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


def resize_images(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    width: int,
    height: int,
    decode_stub: bool = True,
) -> DataFrame:
    """Image resize plumbing: (id, resized binary, width, height).

    STUB: emits a deterministic ``width*height``-byte pseudo-bitmap derived
    from the source bytes (md5-seeded tiling) so downstream schema/batch
    behavior is real; a production build replaces the body with PIL.
    """
    if not decode_stub:
        raise NotImplementedError("image decoding requires codecs not in this env")
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
    this raises ``NotImplementedError`` — the real decoder is not bundled.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this environment; pass decode_stub=True for the deterministic "
            "plumbing-test path"
        )

    schema = f"{id_col} long, n_bytes long, feature array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _decode_batch(pdf[blob_col])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": pdf[blob_col].map(len).values,
                    "feature": out["feature"].values,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)

"""Training-shard export: WebDataset-style tar shards, written in parallel.

The last step of a corpus pipeline is handing data to the training loader,
and the lingua franca there is sharded tars (WebDataset: N samples per
``.tar``, entries named ``{key}.{ext}``), streamed sequentially by data
workers. This writes them Spark-side: documents are assigned to shards by
stable md5 hash, each shard group is materialized by ONE task via
``applyInPandas``, and the tar bytes are BYTE-REPRODUCIBLE (entries sorted
by key, zeroed mtimes/uids) so a re-run produces identical shard files —
the property that makes shard-level caching and resume safe.

Scale: shard count is the parallelism unit (pick ~total_bytes / 1 GB);
each task holds one shard's documents — bounded by design, never the
corpus. The returned manifest (shard, path, n_docs, n_bytes, md5) is the
loader's index and the pipeline's audit record.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "shard long, path string, n_docs long, n_bytes long, md5 string"


def write_webdataset_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    ext: str = "txt",
) -> DataFrame:
    """Write documents into ``n_shards`` reproducible tar shards; returns
    the shard manifest DataFrame. Shard assignment is md5(id) % n_shards —
    rerun/retry-stable and engine-portable like every bucket in this repo."""
    os.makedirs(out_dir, exist_ok=True)
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % n_shards
    )
    assigned = docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text"), shard.alias("_shard")
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("_id", kind="mergesort")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _id, text in zip(pdf["_id"], pdf["_text"]):
                payload = ("" if text is None else str(text)).encode("utf-8")
                # integer ids zero-pad (loader-friendly lexicographic order);
                # any other id type keys by its string form
                try:
                    key = f"{int(_id):012d}"
                except (TypeError, ValueError):
                    key = str(_id)
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0  # zeroed metadata → byte-reproducible shards
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(payload))
        data = buf.getvalue()
        path = os.path.join(out_dir, f"shard-{s:05d}.tar")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic publish: readers never see partials
        return pd.DataFrame(
            [
                {
                    "shard": s,
                    "path": path,
                    "n_docs": len(pdf),
                    "n_bytes": len(data),
                    "md5": hashlib.md5(data).hexdigest(),
                }
            ]
        )

    return assigned.groupBy("_shard").applyInPandas(build, MANIFEST_SCHEMA)


def read_webdataset_shard(path: str) -> list[tuple[str, bytes]]:
    """Read one shard back (test/loader helper): [(key.ext, payload)]."""
    out = []
    with tarfile.open(path, mode="r") as tar:
        for m in tar.getmembers():
            out.append((m.name, tar.extractfile(m).read()))
    return out

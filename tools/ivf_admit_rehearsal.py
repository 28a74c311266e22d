"""IVFIndex admit-path rehearsal: what fraction of the index does one
micro-batch admit REWRITE?

At local scale wall-clock is fixed-cost-dominated (a 3-second admit is
plan+commit overhead whether the corpus is 2k or 20k rows), so seconds
can't isolate the IO term. The structural metric can: after an admit,
every untouched cell's files are HARDLINKS of the base snapshot (shared
inodes, zero bytes written) and only touched cells hold fresh inodes —
so `rewritten_bytes / index_bytes` is exact at any scale. The
drift-triggered retrain's "cells ∝ corpus" lever shows up directly:
a locality-bounded batch rewrites ~1/k of the index, so growing k with
the corpus keeps rewritten BYTES constant while fixed k lets them grow
with N.

Setup: corpus A = sf0.1 embeddings; corpus B = the 10× scaled copy the
scale rehearsal builds (reused if present). Three indexes: A@k=8,
B@k=8 (fixed k — the anti-pattern), B@k=80 (k ∝ N). The admitted batch is
200 copies of one centroid (touches one cell per index).

Usage: python tools/ivf_admit_rehearsal.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from affinity_spark import get_spark
from affinity_spark.operators.ivf_index import IVFIndex
from affinity_spark.tables import load

BASE_SF = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark(app_name="affinity-ivf-admit-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    from tools.scale_rehearsal import build_scaled

    scaled_dir = build_scaled(spark, 10)

    emb_a = load(spark, BASE_SF, "embeddings").select("vec_id", "embedding")
    emb_b = spark.read.parquet(os.path.join(scaled_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n_a, n_b = emb_a.count(), emb_b.count()

    root = tempfile.mkdtemp(prefix="ivf-admit-rehearsal-")
    results: dict = {"corpus_rows": {"A": n_a, "B": n_b}}

    def dir_bytes_and_inodes(vdir: str) -> dict[str, tuple[int, frozenset]]:
        out = {}
        for entry in os.listdir(vdir):
            d = os.path.join(vdir, entry)
            if not (entry.startswith("cell=") and os.path.isdir(d)):
                continue
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            stats = [os.stat(os.path.join(d, f)) for f in files]
            out[entry] = (
                sum(s.st_size for s in stats),
                frozenset(s.st_ino for s in stats),
            )
        return out

    def measure(tag: str, emb, k: int) -> None:
        idx = IVFIndex(spark, os.path.join(root, tag), num_buckets=8)
        t0 = time.perf_counter()
        idx.build(emb, k=k, n_iter=0)
        t_build = time.perf_counter() - t0
        base_dir = idx._assigned._current_version_dir()
        base = dir_bytes_and_inodes(base_dir)
        cb = idx.codebook()
        # locality-bounded micro-batch: 200 vectors at one centroid ->
        # touches exactly one cell partition
        batch = spark.createDataFrame(
            [(10_000_000_000 + i, cb[k // 2]) for i in range(200)],
            "vec_id long, embedding array<double>",
        )
        t0 = time.perf_counter()
        idx.admit(batch)
        t_admit = time.perf_counter() - t0
        new = dir_bytes_and_inodes(idx._assigned._current_version_dir())
        rewritten = linked = 0
        cells_rewritten = 0
        for cell, (nbytes, inodes) in new.items():
            if cell in base and inodes == base[cell][1]:
                linked += nbytes
            else:
                rewritten += nbytes
                cells_rewritten += 1
        results[tag] = {
            "k": k,
            "build_sec": round(t_build, 3),
            "admit_sec": round(t_admit, 3),
            "cells_rewritten": cells_rewritten,
            "rewritten_bytes": rewritten,
            "hardlinked_bytes": linked,
            "rewrite_fraction_bp": round(10000 * rewritten / (rewritten + linked)),
        }
        print(json.dumps({"index": tag, **results[tag]}), flush=True)

    measure("A_k8", emb_a, 8)
    measure("B_k8_fixed", emb_b, 8)
    measure("B_k80_grown", emb_b, 80)

    results["rewritten_bytes_ratio_fixed_k"] = round(
        results["B_k8_fixed"]["rewritten_bytes"] / results["A_k8"]["rewritten_bytes"], 2
    )
    results["rewritten_bytes_ratio_grown_k"] = round(
        results["B_k80_grown"]["rewritten_bytes"] / results["A_k8"]["rewritten_bytes"], 2
    )
    print(json.dumps({"metric": "ivf_admit_rehearsal", **results}))


if __name__ == "__main__":
    main()

"""The IVF "cells ∝ corpus" lever, measured end-to-end.

The within-cell pair operators (SemDeDup near-dup drop, hard-negative
mining) are Σ|cell|² BY CONTRACT — with a FIXED bucket count they read
quadratic at 10× rows (r4 rehearsal: 31-37×, exponent ≈ 1.5). The real
deployment answer is to grow the partition count with the corpus so
|cell| stays constant:

- IVF: re-train the coarse codebook with k ∝ N (training on a
  fixed-size sample, so training cost is scale-constant; assignment is
  the map-side scan either way);
- LSH: add log2(K) hyperplane bits, doubling buckets per bit.

This tool measures BOTH levers at sf0.1 and K×: the same within-cell
operator, with cells re-derived at each scale. Training/assignment time
is reported separately from the pair-join time: training is index BUILD
(amortized across every query on the corpus), the pair join is the
per-query cost the exponent claim is about. A fixed-cell control column
re-measures the contractual quadratic on the same session.

Usage: python tools/ivf_lever_rehearsal.py [K]   (default 10)
Prints one JSON line; record in BASELINE.md next to the r4 table.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from affinity_spark import get_spark
from affinity_spark.cache import release_shared
from affinity_spark.operators import similarity as sim
from affinity_spark.operators.ivf import assign, train_centroids
from affinity_spark.operators.sampling import near_dup_survivors
from affinity_spark.tables import load
from tools.scale_rehearsal import BASE_SF, build_scaled

SAMPLE_N = 512  # codebook training sample - scale-constant by design


def _timed(thunk) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = thunk()
    return time.perf_counter() - t0, n


def near_dup_ivf(spark, sf_dir: str, k_cells: int) -> dict:
    emb = load(spark, sf_dir, "embeddings").persist()
    n = emb.count()
    t0 = time.perf_counter()
    sample = emb.orderBy("vec_id").limit(SAMPLE_N)
    books = train_centroids(sample, k_cells, n_iter=2)
    t_train = time.perf_counter() - t0

    t0 = time.perf_counter()
    cells = assign(emb, books).persist()
    cells.count()
    t_assign = time.perf_counter() - t0

    def q():
        pairs = sim.cosine_join_within(cells, "cell", 0.35)
        return near_dup_survivors(pairs, cells.select("vec_id", "cell")).count()

    t_pairs, kept = min((_timed(q) for _ in range(2)), key=lambda x: x[0])
    cells.unpersist()
    emb.unpersist()
    release_shared()
    return {
        "rows": n,
        "k_cells": k_cells,
        "t_train": round(t_train, 3),
        "t_assign": round(t_assign, 3),
        "t_pairs": round(t_pairs, 3),
        "survivors": kept,
    }


def hard_neg_lsh(spark, sf_dir: str, nbits: int) -> dict:
    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()

    def q():
        buckets = sim.lsh_hyperplane_buckets(emb, 64, nbits, keep_cols=["label"])
        return sim.hard_negatives(buckets, "bucket", "label").count()

    t, rows = min((_timed(q) for _ in range(2)), key=lambda x: x[0])
    release_shared()
    return {"rows": n, "nbits": nbits, "t": round(t, 3), "out_rows": rows}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="affinity-ivf-lever")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = build_scaled(spark, k)
    extra_bits = max(1, round(math.log2(k)))

    out = {"metric": "ivf_lever_rehearsal", "k": k}

    # SemDeDup via IVF cells: k_cells grows with the corpus
    small = near_dup_ivf(spark, BASE_SF, k_cells=16)
    big = near_dup_ivf(spark, scaled, k_cells=16 * k)
    ctrl = near_dup_ivf(spark, scaled, k_cells=16)  # fixed-cell control
    ratio = big["t_pairs"] / small["t_pairs"]
    out["near_dup_ivf"] = {
        "sf0.1": small,
        f"x{k}_k_scaled": big,
        f"x{k}_k_fixed_control": ctrl,
        "pairs_ratio_scaled": round(ratio, 2),
        "pairs_exponent_scaled": round(math.log(ratio) / math.log(k), 3),
        "pairs_ratio_fixed": round(ctrl["t_pairs"] / small["t_pairs"], 2),
    }

    # hard negatives via LSH buckets: +log2(K) bits doubles buckets per bit
    hsmall = hard_neg_lsh(spark, BASE_SF, nbits=4)
    hbig = hard_neg_lsh(spark, scaled, nbits=4 + extra_bits)
    hctrl = hard_neg_lsh(spark, scaled, nbits=4)
    hratio = hbig["t"] / hsmall["t"]
    out["hard_neg_lsh"] = {
        "sf0.1": hsmall,
        f"x{k}_bits_scaled": hbig,
        f"x{k}_bits_fixed_control": hctrl,
        "ratio_scaled": round(hratio, 2),
        "exponent_scaled": round(math.log(hratio) / math.log(k), 3),
        "ratio_fixed": round(hctrl["t"] / hsmall["t"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

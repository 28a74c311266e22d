"""ClusterStore admit-path rehearsal: does one micro-batch admit rewrite
bytes ∝ batch's touched clusters, independent of corpus size, when
``cluster_buckets`` scales with the corpus (the doc_buckets lever applied
to cluster labels)?

Same structural metric as the IVF/Quality rehearsals: after an admit,
untouched cluster buckets must HARDLINK the base snapshot (same inodes);
only buckets holding the batch's destination clusters (and any merged
clusters' source buckets) carry fresh inodes. With a fixed bucket count
the per-bucket size — and so per-admit rewrite — grows with the corpus;
the scale answer is buckets ∝ corpus, which keeps per-bucket bytes (and
the rewrite) constant. Measured here: the SAME 200-doc batch, pairing
into the same 4 committed clusters, admitted into a 20k-row store with
8 buckets vs a 200k-row store with 80 buckets.

Usage: python tools/cluster_admit_rehearsal.py
Prints one JSON line per store and a summary line.
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
from affinity_spark.operators.cluster_store import ClusterStore


def bucket_bytes_and_inodes(vdir: str) -> dict[str, tuple[int, frozenset]]:
    out = {}
    for entry in os.listdir(vdir):
        d = os.path.join(vdir, entry)
        if not (entry.startswith("_bucket=") and os.path.isdir(d)):
            continue
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        stats = [os.stat(os.path.join(d, f)) for f in files]
        out[entry] = (
            sum(s.st_size for s in stats),
            frozenset(s.st_ino for s in stats),
        )
    return out


def main() -> None:
    spark = get_spark(app_name="affinity-cluster-admit-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="cluster-admit-rehearsal-")
    results: dict = {}

    # the SAME batch for both stores: 200 new ids, each an exact/near dup
    # of one of the 4 oldest committed docs (4 touched clusters)
    batch_ids = spark.range(200).select(
        (F.col("id") + F.lit(1_000_000_000)).alias("doc_id")
    )
    batch_pairs = spark.range(200).select(
        (F.col("id") % 4).alias("id_a"),
        (F.col("id") + F.lit(1_000_000_000)).alias("id_b"),
    )

    def measure(tag: str, n_rows: int, buckets: int) -> None:
        st = ClusterStore(
            spark, os.path.join(root, tag), cluster_buckets=buckets
        )
        seed_pairs = spark.createDataFrame(
            [(0, 1)], "id_a long, id_b long"
        )
        t0 = time.perf_counter()
        st.build(
            spark.range(n_rows).select(F.col("id").alias("doc_id")),
            seed_pairs,
        )
        t_build = time.perf_counter() - t0
        base = bucket_bytes_and_inodes(st._table._current_version_dir())
        t0 = time.perf_counter()
        st.admit(batch_ids, batch_pairs)
        t_admit = time.perf_counter() - t0
        new = bucket_bytes_and_inodes(st._table._current_version_dir())
        rewritten = linked = 0
        buckets_rewritten = 0
        for b, (nbytes, inodes) in new.items():
            if b in base and inodes == base[b][1]:
                linked += nbytes
            else:
                rewritten += nbytes
                buckets_rewritten += 1
        results[tag] = {
            "corpus_rows": n_rows,
            "cluster_buckets": buckets,
            "build_sec": round(t_build, 3),
            "admit_sec": round(t_admit, 3),
            "buckets_rewritten": buckets_rewritten,
            "rewritten_bytes": rewritten,
            "hardlinked_bytes": linked,
            "rewrite_fraction_bp": round(
                10000 * rewritten / (rewritten + linked)
            ),
        }
        print(json.dumps({"store": tag, **results[tag]}), flush=True)

    measure("A", 20_000, 8)
    measure("B_x10_lever", 200_000, 80)
    results["rewritten_bytes_ratio_10x_corpus_with_lever"] = round(
        results["B_x10_lever"]["rewritten_bytes"]
        / results["A"]["rewritten_bytes"],
        2,
    )
    print(json.dumps({"metric": "cluster_admit_rehearsal", **{
        k: v for k, v in results.items() if not isinstance(v, dict)
    }}), flush=True)


if __name__ == "__main__":
    main()

"""PrefixIndex admit-path rehearsal: does one micro-batch admit rewrite
bytes ∝ batch, independent of corpus size, when ``doc_buckets`` scales
with the corpus?

The same structural metric as the ClusterStore/Quality/IVF rehearsals,
summed across BOTH partitioned tables (prefix entries + verify arrays):
untouched doc-id buckets must hardlink forward; only the batch's
destination buckets carry fresh inodes.

Regime matters: rewrite = (touched dirs) x (per-bucket bytes), and a
uniformly-hashed batch touches ~min(batch, buckets) dirs per table — so
with batch >= buckets an admit approaches a full rewrite REGARDLESS of
lever (measured here as the anti-pattern row). The scale configuration
is batch << buckets with buckets ∝ corpus: per-bucket bytes stay
constant and touched dirs ≈ 2x batch, making rewrite ∝ batch alone.
Measured with the SAME 30-doc batch against a 2k-doc index (256
buckets) and a 20k-doc index (2560 buckets).

Usage: python tools/prefix_admit_rehearsal.py
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
from affinity_spark.operators.prefix_index import PrefixIndex


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


def shingle_frame(ids):
    """(doc_id, shingles, n_shingles) from an id frame — 12 shingles per
    doc drawn from a 1000-token shared domain so prefixes overlap."""
    return ids.select(
        F.col("doc_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(12)),
            lambda j: F.concat(
                F.lit("w"), F.pmod(F.col("doc_id") * j + j * j, 1000)
            ),
        ).alias("shingles"),
    ).select(
        "doc_id",
        F.array_distinct("shingles").alias("shingles"),
        F.size(F.array_distinct("shingles")).alias("n_shingles"),
    )


def main() -> None:
    spark = get_spark(app_name="affinity-prefix-admit-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="prefix-admit-rehearsal-")
    results: dict = {}

    batch = shingle_frame(
        spark.range(30).select(
            (F.col("id") + F.lit(1_000_000_000)).alias("doc_id")
        )
    )

    def measure(tag: str, n_rows: int, buckets: int) -> None:
        idx = PrefixIndex(
            spark, os.path.join(root, tag), doc_buckets=buckets
        )
        corpus = shingle_frame(
            spark.range(n_rows).select(F.col("id").alias("doc_id"))
        )
        t0 = time.perf_counter()
        idx.build(corpus)
        t_build = time.perf_counter() - t0
        base = {
            t: bucket_bytes_and_inodes(tbl._current_version_dir())
            for t, tbl in (("prefix", idx._prefix), ("arrays", idx._arrays))
        }
        t0 = time.perf_counter()
        idx.admit(batch)
        t_admit = time.perf_counter() - t0
        rewritten = linked = 0
        buckets_rewritten = 0
        for t, tbl in (("prefix", idx._prefix), ("arrays", idx._arrays)):
            new = bucket_bytes_and_inodes(tbl._current_version_dir())
            for b, (nbytes, inodes) in new.items():
                if b in base[t] and inodes == base[t][b][1]:
                    linked += nbytes
                else:
                    rewritten += nbytes
                    buckets_rewritten += 1
        results[tag] = {
            "corpus_rows": n_rows,
            "doc_buckets": buckets,
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

    measure("A", 2_000, 256)
    measure("B_x10_lever", 20_000, 2_560)
    print(json.dumps({
        "metric": "prefix_admit_rehearsal",
        "rewritten_bytes_ratio_10x_corpus_with_lever": round(
            results["B_x10_lever"]["rewritten_bytes"]
            / results["A"]["rewritten_bytes"], 2
        ),
    }), flush=True)


if __name__ == "__main__":
    main()

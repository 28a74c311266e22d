"""Auto bucket lever rehearsal — NO MANUAL KNOB (r11 verdict #1).

The r11k rehearsal proved delta-IO admits hold when ``doc_buckets`` is
hand-set ∝ corpus; this one proves the DEFAULT does it: every store is
constructed with no bucket argument, ``build()`` sizes the lever from
the corpus itself (operators/bucketing.auto_bucket_count), and the SAME
10-doc batch admitted into a 2k-doc and a 20k-doc index must rewrite
~the same bytes (ratio ≤ ~1.2 — per-admit IO ∝ batch alone).

Also rehearses the growth path: build at 2k, grow the corpus 10× via
admits WITHOUT rebucketing (needs_rebucket() must arm), rebucket(),
and re-measure the probe admit — the post-rebucket admit must be back
in the delta-IO regime.

Usage: python tools/autobucket_rehearsal.py
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
from tools.prefix_admit_rehearsal import bucket_bytes_and_inodes, shingle_frame


def measure_admit(idx: PrefixIndex, batch) -> dict:
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
    return {
        "admit_sec": round(t_admit, 3),
        "doc_buckets": idx.doc_buckets,
        "buckets_rewritten": buckets_rewritten,
        "rewritten_bytes": rewritten,
        "hardlinked_bytes": linked,
        "rewrite_fraction_bp": round(10000 * rewritten / (rewritten + linked)),
    }


def main() -> None:
    spark = get_spark(app_name="affinity-autobucket-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="autobucket-rehearsal-")
    results: dict = {}

    def batch_frame(start: int, n: int):
        return shingle_frame(
            spark.range(n).select((F.col("id") + F.lit(start)).alias("doc_id"))
        )

    probe = batch_frame(1_000_000_000, 10)

    # --- part 1: same batch, 10x corpus, DEFAULT constructors ------------
    for tag, n_rows in (("A_2k", 2_000), ("B_20k", 20_000)):
        idx = PrefixIndex(spark, os.path.join(root, tag))  # no knob
        t0 = time.perf_counter()
        idx.build(batch_frame(0, n_rows))
        results[tag] = {
            "corpus_rows": n_rows,
            "build_sec": round(time.perf_counter() - t0, 3),
            **measure_admit(idx, probe),
        }
        print(json.dumps({"store": tag, **results[tag]}), flush=True)

    ratio = round(
        results["B_20k"]["rewritten_bytes"] / results["A_2k"]["rewritten_bytes"], 2
    )

    # --- part 2: growth path — arm, rebucket, back to delta-IO -----------
    idx = PrefixIndex(spark, os.path.join(root, "grow"))  # no knob
    idx.build(batch_frame(0, 2_000))
    grown = {"built_buckets": idx.doc_buckets}
    # grow 10x in four admits (no rebucket yet)
    for i in range(4):
        idx.admit(batch_frame(2_000 + i * 4_500, 4_500))
    grown["needs_rebucket_at_10x"] = idx.needs_rebucket()
    pre = measure_admit(idx, batch_frame(2_000_000_000, 10))
    grown["pre_rebucket_admit"] = pre
    t0 = time.perf_counter()
    grown["rebucketed_to"] = idx.rebucket()
    grown["rebucket_sec"] = round(time.perf_counter() - t0, 3)
    post = measure_admit(idx, batch_frame(3_000_000_000, 10))
    grown["post_rebucket_admit"] = post
    grown["needs_rebucket_after"] = idx.needs_rebucket()
    print(json.dumps({"store": "grow", **grown}), flush=True)

    # --- part 3: PostingsIndex, same no-knob contract ---------------------
    from affinity_spark.operators.postings import PostingsIndex

    def docs_frame(start: int, n: int):
        return spark.range(n).selectExpr(
            f"id + {start} AS doc_id",
            "concat('alpha w', CAST(id % 977 AS STRING), ' beta w',"
            " CAST(id % 499 AS STRING), ' gamma w', CAST(id % 211 AS STRING))"
            " AS text",
        )

    post_results = {}
    for tag, n_rows in (("P_2k", 2_000), ("P_20k", 20_000)):
        ix = PostingsIndex(spark, os.path.join(root, tag), grams=(1,))  # no knob
        ix.build(docs_frame(0, n_rows))
        base = {
            t: bucket_bytes_and_inodes(tbl._current_version_dir())
            for t, tbl in (("doclen", ix._doclen), ("post1", ix._tables[1]))
        }
        t0 = time.perf_counter()
        ix.refresh(docs_frame(1_000_000_000, 10))
        t_refresh = time.perf_counter() - t0
        rewritten = linked = 0
        for t, tbl in (("doclen", ix._doclen), ("post1", ix._tables[1])):
            new = bucket_bytes_and_inodes(tbl._current_version_dir())
            for b, (nbytes, inodes) in new.items():
                if b in base[t] and inodes == base[t][b][1]:
                    linked += nbytes
                else:
                    rewritten += nbytes
        post_results[tag] = {
            "corpus_rows": n_rows,
            "doc_buckets": ix.doc_buckets,
            "refresh_sec": round(t_refresh, 3),
            "rewritten_bytes": rewritten,
            "hardlinked_bytes": linked,
            "rewrite_fraction_bp": round(
                10000 * rewritten / (rewritten + linked)
            ),
        }
        print(json.dumps({"store": tag, **post_results[tag]}), flush=True)
    post_ratio = round(
        post_results["P_20k"]["rewritten_bytes"]
        / post_results["P_2k"]["rewritten_bytes"],
        2,
    )

    print(
        json.dumps(
            {
                "metric": "autobucket_rehearsal",
                "rewritten_bytes_ratio_10x_corpus_default": ratio,
                "postings_ratio_10x_default": post_ratio,
                "ok": ratio <= 1.25
                and post_ratio <= 1.25
                and grown["needs_rebucket_at_10x"]
                and not grown["needs_rebucket_after"]
                and post["rewrite_fraction_bp"]
                < pre["rewrite_fraction_bp"],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

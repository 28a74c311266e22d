"""Auto bucket lever rehearsal — NO MANUAL KNOB, all five bucketed
families (r12 verdict #8; extends the r11 PrefixIndex/PostingsIndex
version to BandIndex, ClusterStore and MediaIndex).

Every store is constructed with no bucket argument; ``build()`` sizes
the lever from the corpus itself (operators/bucketing). The contract
has TWO regimes, split by the r13 bytes floor
(``bucketing.bytes_floor_cap`` — buckets never shrink below ~256 KB,
because rewrite granularity is a parquet file and finer splits only
multiply read-side file opens):

- ABOVE the floor (big corpora): the SAME 10-doc batch admitted into a
  1× and a 10× corpus rewrites ~the same bytes (ratio ≤ ~1.25 — admit
  IO ∝ batch alone);
- AT the floor (small corpora — the local default sizes): admit IO is
  bounded by touched_buckets × ~2·256 KB, a CONSTANT independent of the
  corpus — the table is by definition smaller than buckets × floor, so
  "delta-IO" and "tiny absolute IO" coincide.

A store passes when EITHER bound holds. The growth path is rehearsed
too: build small, grow 10× via admits WITHOUT rebucketing
(needs_rebucket() must arm), rebucket(), and the post-rebucket admit
must be back under the bound.

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
from affinity_spark.operators.bucketing import bytes_floor_cap  # noqa: F401
from affinity_spark.operators.prefix_index import PrefixIndex
from tools.prefix_admit_rehearsal import bucket_bytes_and_inodes, shingle_frame

#: per-admit IO bound in the floor regime: touched buckets × 2×(256 KB
#: floor) — 2× because a rewritten bucket holds carried-over rows up to
#: ~a floor-sized file plus the batch delta
FLOOR_BOUND_PER_BUCKET = 2 * (256 << 10)
RATIO_BOUND = 1.25


def measure_admit(tables: dict, admit) -> dict:
    """Hardlink-verified rewrite accounting for one admit over the given
    {name: KeyedTable} set."""
    base = {
        t: bucket_bytes_and_inodes(tbl._current_version_dir())
        for t, tbl in tables.items()
    }
    t0 = time.perf_counter()
    admit()
    t_admit = time.perf_counter() - t0
    rewritten = linked = 0
    buckets_rewritten = 0
    for t, tbl in tables.items():
        new = bucket_bytes_and_inodes(tbl._current_version_dir())
        for b, (nbytes, inodes) in new.items():
            if b in base[t] and inodes == base[t][b][1]:
                linked += nbytes
            else:
                rewritten += nbytes
                buckets_rewritten += 1
    return {
        "admit_sec": round(t_admit, 3),
        "buckets_rewritten": buckets_rewritten,
        "rewritten_bytes": rewritten,
        "hardlinked_bytes": linked,
        "rewrite_fraction_bp": round(
            10000 * rewritten / max(1, rewritten + linked)
        ),
    }


def verdict(small: dict, large: dict) -> dict:
    """Pass when admit IO is batch-proportional (ratio) OR floor-bounded
    (constant) at the large end."""
    ratio = round(
        large["rewritten_bytes"] / max(1, small["rewritten_bytes"]), 2
    )
    floor_bound = large["buckets_rewritten"] * FLOOR_BOUND_PER_BUCKET
    return {
        "rewritten_bytes_ratio_10x": ratio,
        "floor_bound_bytes": floor_bound,
        "ok": ratio <= RATIO_BOUND
        or large["rewritten_bytes"] <= floor_bound,
    }


def main() -> None:
    spark = get_spark(app_name="affinity-autobucket-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="autobucket-rehearsal-")
    summary: dict = {}

    def batch_frame(start: int, n: int):
        return shingle_frame(
            spark.range(n).select((F.col("id") + F.lit(start)).alias("doc_id"))
        )

    # --- PrefixIndex -------------------------------------------------------
    res = {}
    for tag, n_rows in (("small", 2_000), ("large", 20_000)):
        idx = PrefixIndex(spark, os.path.join(root, f"prefix_{tag}"))
        t0 = time.perf_counter()
        idx.build(batch_frame(0, n_rows))
        m = measure_admit(
            {"prefix": idx._prefix, "arrays": idx._arrays},
            lambda i=idx: i.admit(batch_frame(1_000_000_000, 10)),
        )
        res[tag] = {
            "corpus_rows": n_rows,
            "build_sec": round(time.perf_counter() - t0, 3),
            "doc_buckets": idx.doc_buckets,
            **m,
        }
        print(json.dumps({"store": f"prefix_{tag}", **res[tag]}), flush=True)
    summary["prefix"] = verdict(res["small"], res["large"])

    # --- growth path (PrefixIndex): arm → rebucket → back under the bound.
    # FAT docs (200 shingles each) so the corpus actually crosses the
    # bytes floor — a 10×-grown table still under the floor must NOT arm
    # (rebucketing a floor-regime table gains nothing), which part 1's
    # thin docs now correctly demonstrate.
    def fat_frame(start: int, n: int):
        ids = spark.range(n).select((F.col("id") + F.lit(start)).alias("doc_id"))
        arr = ids.select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(1), F.lit(200)),
                lambda j: F.concat(
                    F.lit("w"), F.pmod(F.col("doc_id") * j + j * j, 50_000)
                ),
            ).alias("shingles"),
        )
        return arr.select(
            "doc_id",
            F.array_distinct("shingles").alias("shingles"),
            F.size(F.array_distinct("shingles")).alias("n_shingles"),
        )

    idx = PrefixIndex(spark, os.path.join(root, "grow"))
    idx.build(fat_frame(0, 2_000))
    grown = {"built_buckets": idx.doc_buckets}
    for i in range(4):
        idx.admit(fat_frame(2_000 + i * 4_500, 4_500))
    grown["needs_rebucket_at_10x"] = idx.needs_rebucket()
    pre = measure_admit(
        {"prefix": idx._prefix, "arrays": idx._arrays},
        lambda: idx.admit(fat_frame(2_000_000_000, 10)),
    )
    grown["pre_rebucket_admit"] = pre
    t0 = time.perf_counter()
    grown["rebucketed_to"] = idx.rebucket()
    grown["rebucket_sec"] = round(time.perf_counter() - t0, 3)
    post = measure_admit(
        {"prefix": idx._prefix, "arrays": idx._arrays},
        lambda: idx.admit(fat_frame(3_000_000_000, 10)),
    )
    grown["post_rebucket_admit"] = post
    grown["needs_rebucket_after"] = idx.needs_rebucket()
    print(json.dumps({"store": "prefix_grow", **grown}), flush=True)
    summary["prefix_growth"] = {
        "ok": bool(grown["needs_rebucket_at_10x"])
        and not grown["needs_rebucket_after"]
        and (
            post["rewrite_fraction_bp"] <= pre["rewrite_fraction_bp"]
            or post["rewritten_bytes"]
            <= post["buckets_rewritten"] * FLOOR_BOUND_PER_BUCKET
        )
    }

    # --- PostingsIndex ------------------------------------------------------
    from affinity_spark.operators.postings import PostingsIndex

    def docs_frame(start: int, n: int):
        return spark.range(n).selectExpr(
            f"id + {start} AS doc_id",
            "concat('alpha w', CAST(id % 977 AS STRING), ' beta w',"
            " CAST(id % 499 AS STRING), ' gamma w', CAST(id % 211 AS STRING))"
            " AS text",
        )

    res = {}
    for tag, n_rows in (("small", 2_000), ("large", 20_000)):
        ix = PostingsIndex(spark, os.path.join(root, f"post_{tag}"), grams=(1,))
        ix.build(docs_frame(0, n_rows))
        m = measure_admit(
            {"doclen": ix._doclen, "post1": ix._tables[1]},
            lambda i=ix: i.refresh(docs_frame(1_000_000_000, 10)),
        )
        res[tag] = {"corpus_rows": n_rows, "doc_buckets": ix.doc_buckets, **m}
        print(json.dumps({"store": f"postings_{tag}", **res[tag]}), flush=True)
    summary["postings"] = verdict(res["small"], res["large"])

    # --- BandIndex ------------------------------------------------------------
    from affinity_spark.operators.bandindex import BandIndex

    res = {}
    for tag, n_rows in (("small", 2_000), ("large", 20_000)):
        bx = BandIndex(spark, os.path.join(root, f"band_{tag}"))
        bx.build(batch_frame(0, n_rows))
        m = measure_admit(
            {"bands": bx._table},
            lambda b=bx: b.admit(batch_frame(1_000_000_000, 10)),
        )
        res[tag] = {"corpus_rows": n_rows, "doc_buckets": bx.doc_buckets, **m}
        print(json.dumps({"store": f"band_{tag}", **res[tag]}), flush=True)
    summary["band"] = verdict(res["small"], res["large"])

    # --- ClusterStore -----------------------------------------------------------
    from affinity_spark.operators.cluster_store import ClusterStore

    res = {}
    for tag, n_rows in (("small", 2_000), ("large", 20_000)):
        cs = ClusterStore(spark, os.path.join(root, f"cluster_{tag}"))
        ids = spark.range(n_rows).select(F.col("id").alias("doc_id"))
        pairs = spark.range(n_rows // 10).select(
            (F.col("id") * 2).alias("id_a"), (F.col("id") * 2 + 1).alias("id_b")
        )
        cs.build(ids, pairs)
        batch_ids = spark.range(10).select(
            (F.col("id") + 1_000_000_000).alias("doc_id")
        )
        batch_pairs = spark.range(5).select(
            (F.col("id") * 2).alias("id_a"),
            (F.col("id") * 2 + 1_000_000_000).alias("id_b"),
        )
        m = measure_admit(
            {"clusters": cs._table},
            lambda c=cs, bi=batch_ids, bp=batch_pairs: c.admit(bi, bp),
        )
        res[tag] = {
            "corpus_rows": n_rows, "cluster_buckets": cs.cluster_buckets, **m,
        }
        print(json.dumps({"store": f"cluster_{tag}", **res[tag]}), flush=True)
    summary["cluster"] = verdict(res["small"], res["large"])

    # --- MediaIndex ----------------------------------------------------------------
    from affinity_spark.operators.media_index import MediaIndex

    def fp_frame(start: int, n: int):
        return spark.range(n).selectExpr(
            f"id + {start} AS doc_id", "'image' AS modality",
            "CAST(hash(CAST(id AS STRING)) AS BIGINT) & 9223372036854775807"
            " AS fp",
        )

    res = {}
    for tag, n_rows in (("small", 2_000), ("large", 20_000)):
        mx = MediaIndex(spark, os.path.join(root, f"media_{tag}"))
        mx.build(fp_frame(0, n_rows))
        m = measure_admit(
            {"fps": mx._table},
            lambda x=mx: x.admit(fp_frame(1_000_000_000, 10)),
        )
        res[tag] = {"corpus_rows": n_rows, "doc_buckets": mx.doc_buckets, **m}
        print(json.dumps({"store": f"media_{tag}", **res[tag]}), flush=True)
    summary["media"] = verdict(res["small"], res["large"])

    print(
        json.dumps(
            {
                "metric": "autobucket_rehearsal",
                "floor_bound_per_bucket": FLOOR_BOUND_PER_BUCKET,
                "ratio_bound": RATIO_BOUND,
                "stores": summary,
                "ok": all(v["ok"] for v in summary.values()),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""QualityStore admit-path rehearsal: what fraction of the store does
one micro-batch admit REWRITE, and how does generation compaction change
the file count?

Same structural metric as the IVF rehearsal (seconds are fixed-cost-
dominated locally; hardlink-vs-fresh-inode bytes are exact at any
scale): after an admit, every untouched generation partition hardlinks
the base snapshot; only the new generation (plus any generation holding
a canonicality flip or replacement) holds fresh inodes. The admit
contract says rewritten bytes ∝ batch, never ∝ corpus — measured here
at two corpus sizes (sf0.1 documents and the 10× scaled copy) with the
SAME batch, plus a flip admit that must rewrite exactly one extra
generation, plus the compaction file-count effect after many admits.

Usage: python tools/quality_admit_rehearsal.py
Prints one JSON line per measurement and a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from affinity_spark import get_spark
from affinity_spark.operators.quality_store import QualityStore
from affinity_spark.tables import load

BASE_SF = "/root/testdata/sf0.1"


def dir_bytes_and_inodes(vdir: str) -> dict[str, tuple[int, frozenset]]:
    out = {}
    for entry in os.listdir(vdir):
        d = os.path.join(vdir, entry)
        if not (entry.startswith("gen=") and os.path.isdir(d)):
            continue
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        stats = [os.stat(os.path.join(d, f)) for f in files]
        out[entry] = (
            sum(s.st_size for s in stats),
            frozenset(s.st_ino for s in stats),
        )
    return out


def parquet_file_count(vdir: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(vdir):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def main() -> None:
    spark = get_spark(app_name="affinity-quality-admit-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    from tools.scale_rehearsal import build_scaled

    scaled_dir = build_scaled(spark, 10)
    docs_a = load(spark, BASE_SF, "documents").select("doc_id", "text", "lang")
    docs_b = spark.read.parquet(
        os.path.join(scaled_dir, "documents.parquet")
    ).select("doc_id", "text", "lang")
    n_a, n_b = docs_a.count(), docs_b.count()

    root = tempfile.mkdtemp(prefix="quality-admit-rehearsal-")
    results: dict = {"corpus_rows": {"A": n_a, "B": n_b}}

    batch = spark.createDataFrame(
        [
            (10_000_000_000 + i, f"wholly novel rehearsal text number {i} "
             "with enough words to clear the gate and score against the "
             "standing model every single time", "en")
            for i in range(200)
        ],
        "doc_id long, text string, lang string",
    )

    def measure(tag: str, docs) -> None:
        st = QualityStore(spark, os.path.join(root, tag))
        t0 = time.perf_counter()
        st.build(docs)
        t_build = time.perf_counter() - t0
        base = dir_bytes_and_inodes(st._signals._current_version_dir())
        t0 = time.perf_counter()
        st.admit(batch)
        t_admit = time.perf_counter() - t0
        new = dir_bytes_and_inodes(st._signals._current_version_dir())
        rewritten = linked = 0
        gens_rewritten = 0
        for gen, (nbytes, inodes) in new.items():
            if gen in base and inodes == base[gen][1]:
                linked += nbytes
            else:
                rewritten += nbytes
                gens_rewritten += 1
        results[tag] = {
            "build_sec": round(t_build, 3),
            "admit_sec": round(t_admit, 3),
            "gens_rewritten": gens_rewritten,
            "rewritten_bytes": rewritten,
            "hardlinked_bytes": linked,
            "rewrite_fraction_bp": round(
                10000 * rewritten / (rewritten + linked)
            ),
        }
        print(json.dumps({"store": tag, **results[tag]}), flush=True)

    measure("A", docs_a)
    measure("B_x10", docs_b)
    results["rewritten_bytes_ratio_10x_corpus"] = round(
        results["B_x10"]["rewritten_bytes"] / results["A"]["rewritten_bytes"],
        2,
    )

    # canonicality flip: a batch landing a smaller id on an existing
    # fingerprint must rewrite ONLY the generation holding the flipped
    # row (plus its own new generation)
    st = QualityStore(spark, os.path.join(root, "flip"))
    st.build(docs_a)
    st.admit(batch)  # gen g1, no flips
    one = docs_a.orderBy("doc_id").limit(1).collect()[0]
    flip_batch = spark.createDataFrame(
        [(-1, one["text"], one["lang"])],
        "doc_id long, text string, lang string",
    )
    base = dir_bytes_and_inodes(st._signals._current_version_dir())
    st.admit(flip_batch)
    new = dir_bytes_and_inodes(st._signals._current_version_dir())
    flipped_gens = [
        g
        for g, (_b, inodes) in new.items()
        if g in base and inodes != base[g][1]
    ]
    results["flip_rewrites_only_touched_gens"] = {
        "gens_rewritten_beyond_new": flipped_gens,
        "total_gens": len(new),
    }
    print(json.dumps(results["flip_rewrites_only_touched_gens"]), flush=True)

    # compaction: many small admits -> one partition, file count collapses
    st2 = QualityStore(spark, os.path.join(root, "compact"))
    st2.build(docs_a)
    for i in range(6):
        b = spark.createDataFrame(
            [(20_000_000_000 + 100 * i + j, f"compact feed {i} {j} text "
              "long enough to gate", "en") for j in range(20)],
            "doc_id long, text string, lang string",
        )
        st2.admit(b, fence=f"r:{i}")
    before_files = parquet_file_count(st2._signals._current_version_dir())
    before_rows = st2.signals().count()
    st2.compact_generations()
    after_files = parquet_file_count(st2._signals._current_version_dir())
    assert st2.signals().count() == before_rows
    results["compaction_files"] = {"before": before_files, "after": after_files}
    print(json.dumps({"metric": "quality_admit_rehearsal", **results}))


if __name__ == "__main__":
    main()

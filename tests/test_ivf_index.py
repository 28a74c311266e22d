"""Maintained IVF vector index: admit==rebuild, index-served==derived,
delta-proportional merge IO, drift detection, torn-lineage self-heal, and
foreachBatch streaming maintenance (operators/ivf_index.py).

Reference pattern: X1 index maintenance
core/src/main/scala/io/amient/affinity/core/state/KVStoreLocal.scala:195-248.
"""

import os
import random

import pytest
from pyspark.sql import functions as F

from affinity_spark.operators.ivf import assign, batch_search, search
from affinity_spark.operators.ivf_index import IVFIndex


def _vecs(spark, ids, dim=8, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in ids:
        rng.seed(seed * 100003 + i)  # per-id deterministic vector
        rows.append((i, [rng.uniform(-1, 1) for _ in range(dim)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def idx(spark, tmp_path):
    ix = IVFIndex(spark, str(tmp_path / "ivf"), num_buckets=2)
    ix.build(_vecs(spark, range(64)), k=4, n_iter=0)
    return ix


def _rows(df):
    return {
        (r["vec_id"], r["cell"], tuple(round(x, 9) for x in r["embedding"]))
        for r in df.collect()
    }


def test_index_served_equals_derived(spark, idx):
    """search()/batch_search() off the committed tables must equal the
    session-local derivation (ivf.assign + ivf.search) with the same
    codebook — the index is a materialization, never a different answer."""
    emb = _vecs(spark, range(64))
    cb = idx.codebook()
    q = cb[1]
    served = idx.search(q, 5, nprobe=2).collect()
    derived = search(assign(emb, cb), cb, q, 5, nprobe=2).collect()
    assert [(r["vec_id"], round(r["cosine"], 9)) for r in served] == [
        (r["vec_id"], round(r["cosine"], 9)) for r in derived
    ]

    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    sb = {
        (r["qid"], r["vec_id"], r["rnk"])
        for r in idx.batch_search(qs, 4, nprobe=2).collect()
    }
    db = {
        (r["qid"], r["vec_id"], r["rnk"])
        for r in batch_search(assign(emb, cb), cb, qs, 4, nprobe=2).collect()
    }
    assert sb == db


def test_admit_matches_full_rebuild(spark, tmp_path):
    """admit(batch) on an index built from the base corpus must equal a
    full build over base ∪ batch with the SAME codebook — assignment is
    per-row map-side, so incremental and one-shot agree exactly."""
    base = _vecs(spark, range(48))
    batch = _vecs(spark, range(48, 64))
    ix = IVFIndex(spark, str(tmp_path / "incr"), num_buckets=2)
    ix.build(base, k=4, n_iter=0)
    cb = ix.codebook()
    ix.admit(batch)

    full = IVFIndex(spark, str(tmp_path / "full"), num_buckets=2)
    full.build(_vecs(spark, range(64)), codebook=cb)
    assert _rows(ix.vectors()) == _rows(full.vectors())
    # codebook untouched by admit (same generation, same lineage)
    assert ix.codebook() == cb
    assert ix.exists()


def test_admit_updates_and_deletes(spark, tmp_path):
    """An updated vector MOVES to its new cell (old row gone even when the
    cells differ) and a deleted id disappears entirely."""
    ix = IVFIndex(spark, str(tmp_path / "upd"), num_buckets=2)
    ix.build(_vecs(spark, range(32)), k=4, n_iter=0)
    cb = ix.codebook()
    # overwrite vec 5 with a vector equal to centroid 3 -> lands in cell 3
    moved = spark.createDataFrame(
        [(5, cb[3])], "vec_id long, embedding array<double>"
    )
    ix.admit(moved, deleted_ids=[6, 7])
    got = {r["vec_id"]: r["cell"] for r in ix.vectors().collect()}
    assert got[5] == 3
    assert 6 not in got and 7 not in got
    assert set(got) == set(range(32)) - {6, 7}
    # idempotent re-admit: same merge again changes nothing
    ix.admit(moved)
    assert got == {r["vec_id"]: r["cell"] for r in ix.vectors().collect()}


def test_admit_hardlinks_untouched_cells(spark, tmp_path):
    """Delta-proportional IO: cells the batch does not touch must be
    HARDLINKED from the base snapshot (same inodes), touched cells
    physically rewritten — merge cost ∝ batch, never ∝ index."""
    ix = IVFIndex(spark, str(tmp_path / "hl"), num_buckets=2)
    ix.build(_vecs(spark, range(64)), k=4, n_iter=0)
    cb = ix.codebook()
    base = ix._assigned._current_version_dir()
    # a batch aimed at exactly cell 2 (vectors = centroid 2)
    batch = spark.createDataFrame(
        [(100, cb[2]), (101, cb[2])], "vec_id long, embedding array<double>"
    )
    ix.admit(batch)
    new = ix._assigned._current_version_dir()
    assert new != base

    def inodes(vdir, cell):
        d = os.path.join(vdir, f"cell={cell}")
        if not os.path.isdir(d):
            return set()
        return {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    cells = {
        int(e.split("=", 1)[1])
        for e in os.listdir(base)
        if e.startswith("cell=")
    }
    assert len(cells) > 1, "fixture must spread vectors over several cells"
    for c in cells - {2}:
        assert inodes(new, c) == inodes(base, c)  # hardlinked, not copied
    assert inodes(new, 2).isdisjoint(inodes(base, 2))  # fresh rewrite


def test_probe_scan_is_partition_pruned(spark, idx):
    """The served search must prune non-probed cells AT THE SCAN
    (PartitionFilters on cell), not filter after reading — the on-disk
    realization of nprobe/k read cost."""
    import re

    from affinity_spark.plans.introspect import formatted_plan

    probed = idx.vectors().filter(F.col("cell").isin([0, 3]))
    probed.collect()
    plan = formatted_plan(probed)
    m = re.search(r"PartitionFilters: \[(?P<f>[^\]]*)\]", plan)
    assert m and "cell" in m.group("f"), plan


def test_drift_detection_and_retrain(spark, tmp_path):
    """needs_retrain flips on growth past the bound and resets after
    retrain() re-clusters from the maintained table itself."""
    ix = IVFIndex(spark, str(tmp_path / "drift"), num_buckets=2)
    ix.build(_vecs(spark, range(32)), k=4, n_iter=0)
    assert not ix.needs_retrain()
    # grow the corpus by 100% > max_growth=0.5
    ix.admit(_vecs(spark, range(32, 64)))
    assert ix.needs_retrain(max_growth=0.5)
    gen0 = int(ix._centroids.commit_meta()["ivf_gen"])
    ix.retrain()
    assert int(ix._centroids.commit_meta()["ivf_gen"]) == gen0 + 1
    assert int(ix._centroids.commit_meta()["n_at_build"]) == 64
    assert not ix.needs_retrain(max_growth=0.5)
    assert ix.exists()
    # skew trigger: pile admissions onto one centroid's cell
    cb = ix.codebook()
    hot = spark.createDataFrame(
        [(1000 + i, cb[0]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    ix.admit(hot)
    assert ix.needs_retrain(max_skew=3.0, max_growth=1e9)


def test_torn_lineage_reads_as_absent(spark, tmp_path):
    """A crash between the two table commits (simulated by re-committing
    one table under a different lineage) must make exists() False so the
    self-heal rebuild pattern engages."""
    ix = IVFIndex(spark, str(tmp_path / "torn"), num_buckets=2)
    emb = _vecs(spark, range(16))
    ix.build(emb, k=2, n_iter=0)
    assert ix.exists()
    ix._centroids.overwrite(
        ix._centroids.read(), meta={"ivf_lineage": "other-generation"}
    )
    assert not ix.exists()
    ix.build(emb, k=2, n_iter=0)  # the documented repair
    assert ix.exists()


def test_streaming_foreachbatch_maintenance_matches_rebuild(spark, tmp_path):
    """A vector ingest STREAM drives IVFIndex.admit from foreachBatch
    (maintainer()), and the maintained index equals a one-shot build over
    the full corpus with the same codebook."""
    import json

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    ix = IVFIndex(spark, str(tmp_path / "m"), num_buckets=2)
    base = _vecs(spark, range(32))
    ix.build(base, k=4, n_iter=0)
    cb = ix.codebook()

    arriving = _vecs(spark, range(32, 40)).collect()
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    for i, r in enumerate(arriving):
        tmp = os.path.join(src, f".c{i}.tmp")
        with open(tmp, "w") as f:
            f.write(
                json.dumps(
                    {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
                )
                + "\n"
            )
        dest = os.path.join(src, f"c{i}.json")
        os.rename(tmp, dest)
        os.utime(dest, (1_700_000_000 + i,) * 2)

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .json(src)
        .writeStream.foreachBatch(ix.maintainer())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full = IVFIndex(spark, str(tmp_path / "full"), num_buckets=2)
    full.build(_vecs(spark, range(40)), codebook=cb)
    assert _rows(ix.vectors()) == _rows(full.vectors())


def test_shared_ivf_evicts_on_corpus_regeneration(spark, tmp_path):
    """The shared_postings contract applied to ANN: a corpus regenerated
    AT THE SAME PATH within one application must get a fresh index (and
    the superseded one's tempdir reclaimed), never stale cells."""
    import affinity_spark.operators.ivf_index as mod

    p = str(tmp_path / "corpus")
    _vecs(spark, range(16)).write.mode("overwrite").parquet(p)
    emb1 = spark.read.parquet(p)
    idx1 = mod.shared_ivf(spark, emb1, "t-regen", k=2, n_iter=0)
    assert mod.shared_ivf(spark, emb1, "t-regen", k=2, n_iter=0) is idx1

    import time

    time.sleep(0.05)  # ensure mtime_ns moves
    _vecs(spark, range(24), seed=9).write.mode("overwrite").parquet(p)
    emb2 = spark.read.parquet(p)
    idx2 = mod.shared_ivf(spark, emb2, "t-regen", k=2, n_iter=0)
    assert idx2 is not idx1
    assert idx2.vectors().count() == 24
    assert not os.path.isdir(idx1.path)  # superseded tempdir reclaimed


# --- IVF-PQ served from the maintained index (codes as admitted columns) ---


def _pq_idx(spark, path, ids=range(64), k=4, m=2):
    ix = IVFIndex(spark, path, num_buckets=2, pq_m=m, pq_k=k)
    ix.build(_vecs(spark, ids), k=k, n_iter=0)
    return ix


def _code_rows(df, m):
    cols = ["vec_id", "cell"] + [f"code_{s}" for s in range(m)]
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


def test_pq_index_served_equals_derived(spark, tmp_path):
    """adc_search() off the committed code columns must equal the
    session-local derivation (pq.assign_codes + pq.adc_search over the
    same probed cells with the same codebooks) — the stored codes are a
    materialization, never a different answer."""
    from affinity_spark.operators.pq import adc_search as derived_adc
    from affinity_spark.operators.pq import assign_codes

    ix = _pq_idx(spark, str(tmp_path / "pq"))
    cb, books = ix.codebook(), ix.pq_codebooks()
    q = cb[1]
    served = ix.adc_search(q, 5, nprobe=2).collect()

    def sqd(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    probes = sorted(range(len(cb)), key=lambda i: sqd(cb[i], q))[:2]
    emb = _vecs(spark, range(64))
    cand = assign(emb, cb).filter(F.col("cell").isin(probes))
    derived = derived_adc(assign_codes(cand, books), books, q, 5).collect()
    assert [(r["vec_id"], round(r["adc_dist"], 9)) for r in served] == [
        (r["vec_id"], round(r["adc_dist"], 9)) for r in derived
    ]


def test_pq_admit_codes_ride_delta(spark, tmp_path):
    """admit(batch) on a PQ-enabled index must equal a full rebuild over
    base ∪ batch with the SAME codebooks — including the code columns —
    and must leave both codebook tables untouched (same generation)."""
    ix = IVFIndex(spark, str(tmp_path / "incr"), num_buckets=2, pq_m=2)
    ix.build(_vecs(spark, range(48)), k=4, n_iter=0)
    cb, books = ix.codebook(), ix.pq_codebooks()
    gen0 = int(ix._centroids.commit_meta()["ivf_gen"])
    ix.admit(_vecs(spark, range(48, 64)))

    full = IVFIndex(spark, str(tmp_path / "full"), num_buckets=2, pq_m=2)
    full.build(_vecs(spark, range(64)), codebook=cb, pq_books=books)
    assert _code_rows(ix.codes(), 2) == _code_rows(full.codes(), 2)
    assert ix.pq_codebooks() == books
    assert int(ix._pq_books.commit_meta()["ivf_gen"]) == gen0
    assert ix.exists()


def test_pq_retrain_reencodes_codes(spark, tmp_path):
    """retrain() after corpus growth must bump the codebook generation on
    ALL THREE tables and re-encode every row's codes against the fresh
    PQ codebooks (codes match a clean build over the same corpus)."""
    ix = IVFIndex(spark, str(tmp_path / "rt"), num_buckets=2, pq_m=2)
    ix.build(_vecs(spark, range(32)), k=4, n_iter=0)
    gen0 = int(ix._pq_books.commit_meta()["ivf_gen"])
    ix.admit(_vecs(spark, range(32, 64)))
    assert ix.needs_retrain(max_growth=0.5)
    ix.retrain()
    assert int(ix._pq_books.commit_meta()["ivf_gen"]) == gen0 + 1
    assert ix.exists()  # one lineage across centroids/assigned/pq_books

    clean = IVFIndex(spark, str(tmp_path / "clean"), num_buckets=2, pq_m=2)
    clean.build(_vecs(spark, range(64)), k=4, n_iter=0)
    assert _code_rows(ix.codes(), 2) == _code_rows(clean.codes(), 2)


def test_pq_probe_reads_codes_not_vectors(spark, tmp_path):
    """The ADC serving plan must (a) prune non-probed cells AT THE SCAN
    (PartitionFilters on cell) and (b) never read the raw vector column
    (ReadSchema excludes `embedding`) — the codes-in-the-index contract
    that makes IVF-PQ a code-sized read at billion-vector scale."""
    import re

    from affinity_spark.plans.introspect import formatted_plan

    ix = _pq_idx(spark, str(tmp_path / "plan"))
    top = ix.adc_search(ix.codebook()[0], 5, nprobe=2)
    top.collect()
    plan = formatted_plan(top)
    m = re.search(r"PartitionFilters: \[(?P<f>[^\]]*)\]", plan)
    assert m and "cell" in m.group("f"), plan
    schemas = re.findall(r"ReadSchema: (.*)", plan)
    assert schemas and all("embedding" not in s for s in schemas), plan


def test_pq_torn_codebook_lineage_reads_as_absent(spark, tmp_path):
    """A crash between the assigned/pq_books commits must read as absent
    (exists() False) so the self-heal rebuild engages — the two-table
    torn-lineage contract extended to the third table."""
    ix = IVFIndex(spark, str(tmp_path / "torn"), num_buckets=2, pq_m=2)
    emb = _vecs(spark, range(16))
    ix.build(emb, k=2, n_iter=0)
    assert ix.exists()
    ix._pq_books.overwrite(
        ix._pq_books.read(), meta={"ivf_lineage": "other-generation"}
    )
    assert not ix.exists()
    ix.build(emb, k=2, n_iter=0)
    assert ix.exists()


def test_pq_batch_search_matches_single_query(spark, tmp_path):
    """adc_batch_search must equal per-query adc_search exactly — same
    probed cells, same tables, same ranking — for every query at once."""
    ix = _pq_idx(spark, str(tmp_path / "bq"))
    cb = ix.codebook()
    qs = spark.createDataFrame(
        [(i, cb[i]) for i in range(3)], "qid long, qvec array<double>"
    )
    batched = {
        (r["qid"], r["rnk"]): (r["vec_id"], round(r["adc_dist"], 9))
        for r in ix.adc_batch_search(qs, 4, nprobe=2).collect()
    }
    for i in range(3):
        single = ix.adc_search(cb[i], 4, nprobe=2).collect()
        for rnk, r in enumerate(single, start=1):
            assert batched[(i, rnk)] == (r["vec_id"], round(r["adc_dist"], 9))
    assert len(batched) == 12


def test_pq_batch_search_reads_codes_not_vectors(spark, tmp_path):
    """The batched ADC plan: probes broadcast (no shuffle of the index),
    scan reads code columns only (ReadSchema excludes `embedding`)."""
    from affinity_spark.plans.introspect import formatted_plan

    ix = _pq_idx(spark, str(tmp_path / "bqplan"))
    qs = spark.createDataFrame(
        [(0, ix.codebook()[0])], "qid long, qvec array<double>"
    )
    out = ix.adc_batch_search(qs, 3, nprobe=2)
    out.collect()
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan, plan
    import re

    schemas = re.findall(r"ReadSchema: (.*)", plan)
    assert schemas and all("embedding" not in s for s in schemas), plan


def test_maintainer_auto_retrain_grows_k(spark, tmp_path):
    """The streaming maintainer with auto_retrain keeps the index healthy
    autonomously: once ingest grows the corpus past max_growth, the next
    micro-batch triggers a retrain whose k scales with the measured
    growth (cells ∝ corpus), the generation bumps, and the index stays
    consistent; a follow-up small batch does NOT retrain again (the
    trigger resets with n_at_build)."""
    import json

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    ix = IVFIndex(spark, str(tmp_path / "auto"), num_buckets=2)
    ix.build(_vecs(spark, range(16)), k=2, n_iter=0)
    gen0 = int(ix._centroids.commit_meta()["ivf_gen"])

    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)

    def feed(name, ids, mtime):
        rows = _vecs(spark, ids).collect()
        tmp = os.path.join(src, f".{name}.tmp")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(
                    {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
                ) + "\n")
        dest = os.path.join(src, f"{name}.json")
        os.rename(tmp, dest)
        os.utime(dest, (mtime,) * 2)

    feed("c0", range(16, 48), 1_700_000_000)   # +200% > max_growth=0.5
    feed("c1", range(48, 50), 1_700_000_001)   # tiny follow-up

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(ix.maintainer(auto_retrain=True))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    meta = ix.commit_meta() if hasattr(ix, "commit_meta") else ix._centroids.commit_meta()
    # one retrain fired (gen +1, not +2): batch c0 triggered it, and the
    # post-retrain n_at_build=48 means c1's +2 rows stay under max_growth
    assert int(meta["ivf_gen"]) == gen0 + 1
    # k grew with the corpus: 16 -> 48 rows at retrain time => k 2 -> 6
    assert int(meta["k"]) == 6
    assert int(meta["n_at_build"]) == 48
    assert ix.exists()
    assert ix.vectors().count() == 50
    assert not ix.needs_retrain()

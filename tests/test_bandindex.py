"""Maintained LSH band index (operators/bandindex.py): the corpus side
of incremental dedup as a maintained table — the reference's X1 contract
(KVStoreLocal.scala:195-248: the index updates as the primary changes;
lookups never rescan the primary) applied to the dedup family."""

from __future__ import annotations

from pyspark.sql import functions as F

from affinity_spark.operators import dedup as dd
from affinity_spark.operators.bandindex import BandIndex, probe_verify

BASE = "the quick brown fox jumps over the lazy dog near the river bank"
ROWS = [
    (1, BASE),
    (2, BASE + " today"),
    (3, "completely different text about engines and shuffles here"),
    (4, "yet another unrelated document with its own words entirely"),
]
NEW = [
    (10, BASE + " tonight"),                                   # near-dup of 1/2
    (20, "completely different text about engines and shuffles here"),  # dup of 3
    (30, "a brand new unique document with no duplicate anywhere"),
]


def _arrs(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    return dd.doc_shingle_arrays(docs, "doc_id", "text", 3)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_index_served_probe_equals_derived(spark, tmp_path):
    """probe_verify against the maintained table == incremental_lsh_pairs
    deriving corpus bands per query — banding is per-doc deterministic,
    so materializing it must not change a single pair."""
    corpus = _arrs(spark, ROWS)
    batch = _arrs(spark, NEW)
    ix = BandIndex(spark, str(tmp_path / "bi"), doc_buckets=4)
    ix.build(corpus)

    got = _rows(probe_verify(ix, corpus, batch, "doc_id", 1, 2))
    want = _rows(dd.incremental_lsh_pairs(corpus, batch, "doc_id", 1, 2))
    assert got == want and len(got) >= 2


def test_admit_matches_rebuild_and_prunes(spark, tmp_path):
    """admit() (docs entering/leaving the corpus) must equal a fresh
    build over the post-change corpus, and the merge must go through the
    partition-pruned hardlink path (untouched bucket inodes shared)."""
    import os

    corpus = _arrs(spark, ROWS)
    ix = BandIndex(spark, str(tmp_path / "bi"), doc_buckets=4)
    ix.build(corpus)
    base = ix._table._current_version_dir()

    admitted = [(30, "a brand new unique document with no duplicate anywhere")]
    ix.admit(_arrs(spark, admitted), deleted_ids=[4])

    after = [r for r in ROWS if r[0] != 4] + admitted
    fresh = BandIndex(spark, str(tmp_path / "rb"), doc_buckets=4)
    fresh.build(_arrs(spark, after))
    assert _rows(ix.bands()) == _rows(fresh.bands())

    # physical: at least one untouched bucket dir carried over by hardlink
    new = ix._table._current_version_dir()
    shared = 0
    for entry in os.listdir(base):
        if not entry.startswith("_bucket="):
            continue
        bdir, ndir = os.path.join(base, entry), os.path.join(new, entry)
        if not os.path.isdir(ndir):
            continue
        b_inodes = {
            os.stat(os.path.join(bdir, f)).st_ino
            for f in os.listdir(bdir) if f.endswith(".parquet")
        }
        n_inodes = {
            os.stat(os.path.join(ndir, f)).st_ino
            for f in os.listdir(ndir) if f.endswith(".parquet")
        }
        if b_inodes and b_inodes == n_inodes:
            shared += 1
    assert shared >= 1


def test_admitted_docs_are_found_by_next_increment(spark, tmp_path):
    """The point of maintenance: after a batch's survivors are admitted,
    the NEXT increment's duplicates of them are caught."""
    corpus = _arrs(spark, ROWS)
    ix = BandIndex(spark, str(tmp_path / "bi"), doc_buckets=4)
    ix.build(corpus)

    day1 = [(30, "a brand new unique document with no duplicate anywhere")]
    ix.admit(_arrs(spark, day1))
    corpus2 = _arrs(spark, ROWS + day1)

    day2 = [(40, "a brand new unique document with no duplicate anywhere")]
    got = probe_verify(ix, corpus2, _arrs(spark, day2), "doc_id", 1, 2)
    assert [(r.new_id, r.dup_of) for r in got.collect()] == [(40, 30)]


def test_probe_plan_broadcasts_batch_not_index(spark, tmp_path):
    """The batch side must be the broadcast side — the maintained table
    is the big side at scale and must never be shuffled for the probe."""
    from affinity_spark.plans.introspect import executed_plan

    ix = BandIndex(spark, str(tmp_path / "bi"), doc_buckets=4)
    ix.build(_arrs(spark, ROWS))
    cand = ix.probe(_arrs(spark, NEW))
    cand.collect()
    plan = executed_plan(cand)
    assert "BroadcastHashJoin" in plan


def test_streaming_foreachbatch_maintenance_matches_rebuild(spark, tmp_path):
    """X1 change-listener maintenance for the band index: a docs
    changelog STREAM drives BandIndex.admit from foreachBatch (update
    re-bands, text=NULL tombstone removes), and the maintained table
    equals a fresh build over the post-change corpus."""
    import json
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    rows = [(int(d), t) for d, t in ROWS]
    ix = BandIndex(spark, str(tmp_path / "m"), doc_buckets=4)
    ix.build(_arrs(spark, rows))

    changes = [
        {"doc_id": 2, "text": "rewritten near duplicate text entirely new"},
        {"doc_id": 30, "text": "a brand new late arrival document"},
        {"doc_id": 4, "text": None},
    ]
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    for i, ch in enumerate(changes):
        tmp = os.path.join(src, f".c{i}.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps(ch) + "\n")
        dest = os.path.join(src, f"c{i}.json")
        os.rename(tmp, dest)
        os.utime(dest, (1_700_000_000 + i,) * 2)

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def maintain(batch_df, batch_id):
        dels = [r.doc_id for r in batch_df.filter("text IS NULL").collect()]
        ups = batch_df.filter("text IS NOT NULL")
        ix.admit(
            dd.doc_shingle_arrays(ups, "doc_id", "text", 3), deleted_ids=dels
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(maintain)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    after = [r for r in rows if r[0] not in (2, 4)] + [
        (2, "rewritten near duplicate text entirely new"),
        (30, "a brand new late arrival document"),
    ]
    fresh = BandIndex(spark, str(tmp_path / "rb"), doc_buckets=4)
    fresh.build(_arrs(spark, after))
    assert _rows(ix.bands()) == _rows(fresh.bands())

"""Materialized postings index (operators/postings.py): build-once reads,
incremental maintenance == full rebuild, and exact equality between the
index-served retrieval queries and their from-scratch corpus-scan twins —
the reference's maintained-index contract (KVStoreLocal.scala:195-248:
update re-indexes, tombstone deindexes; KVStoreIndex.scala:20-66: lookups
never rescan the primary)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from affinity_spark.operators.postings import PostingsIndex
from affinity_spark.operators.ranking import (
    bm25_topk,
    bm25_topk_postings,
    tfidf_pairs,
    tfidf_pairs_postings,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "stream merge vector stream stream"),
    (3, "vector index lookup with merge semantics"),
    (4, "the lazy dog sleeps"),
    (5, "quick brown foxes merge quickly"),
    (6, "a b a b a b a"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def idx(spark, tmp_path):
    ix = PostingsIndex(spark, str(tmp_path / "pidx"), grams=(1, 2), num_buckets=2)
    ix.build(_docs(spark))
    return ix


def test_build_derivations_match_model(spark, idx):
    # positional postings replay the tokenization exactly
    model = []
    for did, text in DOCS:
        for pos, term in enumerate(text.lower().split()):
            model.append((term, did, pos))
    assert _rows(idx.positional()) == sorted(model)

    # doclens / corpus stats
    assert _rows(idx.doclens()) == sorted((d, len(t.split())) for d, t in DOCS)
    n, l = idx.corpus_stats().collect()[0]
    assert n == len(DOCS) and l == sum(len(t.split()) for _, t in DOCS)

    # unigram tf derives from positions; df from tf
    from collections import Counter

    tf_model = Counter()
    for did, text in DOCS:
        for term in text.lower().split():
            tf_model[(term, did)] += 1
    assert _rows(idx.tf_postings(1)) == sorted(
        (t, d, c) for (t, d), c in tf_model.items()
    )
    df_model = Counter(t for (t, _d) in tf_model)
    assert _rows(idx.term_stats(1)) == sorted(df_model.items())

    # bigram tf counts are non-distinct real counts
    bg = Counter()
    for did, text in DOCS:
        w = text.lower().split()
        for i in range(len(w) - 1):
            bg[(f"{w[i]} {w[i+1]}", did)] += 1
    assert _rows(idx.tf_postings(2)) == sorted(
        (t, d, c) for (t, d), c in bg.items()
    )


def test_refresh_matches_full_rebuild(spark, tmp_path, idx):
    # update doc 2 (terms removed AND added), delete doc 4, add doc 7
    changed = [(2, "vector stream only now"), (7, "brand new document about streams")]
    after = [r for r in DOCS if r[0] not in (2, 4)] + changed
    idx.refresh(_docs(spark, changed), deleted_ids=[4])

    fresh = PostingsIndex(
        spark, str(tmp_path / "rebuilt"), grams=(1, 2), num_buckets=2
    )
    fresh.build(_docs(spark, after))

    assert _rows(idx.positional()) == _rows(fresh.positional())
    assert _rows(idx.tf_postings(2)) == _rows(fresh.tf_postings(2))
    assert _rows(idx.doclens()) == _rows(fresh.doclens())
    # removed terms of an updated doc are really gone (deindex-on-update)
    assert idx.positional().filter(
        (F.col("doc_id") == 2) & (F.col("term") == "merge")
    ).count() == 0
    assert idx.positional().filter(F.col("doc_id") == 4).count() == 0


def test_refresh_delete_only(spark, idx):
    empty = spark.createDataFrame([], "doc_id long, text string")
    idx.refresh(empty, deleted_ids=[6])
    assert idx.positional().filter(F.col("doc_id") == 6).count() == 0
    assert idx.corpus_stats().collect()[0][0] == len(DOCS) - 1


def test_bm25_from_postings_matches_corpus_scan(spark, idx):
    docs = _docs(spark)
    terms = ("stream", "merge", "vector")
    want = _rows(bm25_topk(docs, "doc_id", "text", terms, k=10))
    got = _rows(bm25_topk_postings(idx, terms, k=10))
    assert got == want and len(got) > 0


def test_tfidf_from_postings_matches_corpus_scan(spark, idx):
    docs = _docs(spark)
    want = _rows(tfidf_pairs(docs, "doc_id", "text", max_df=4, k=20, n=2))
    got = _rows(tfidf_pairs_postings(idx, n=2, max_df=4, k=20))
    assert got == want and len(got) > 0


def test_top_bigram_matches_corpus_scan(spark, idx):
    from affinity_spark.functions.text import bigram_array, let_bound, tokenize

    docs = _docs(spark)
    scan = (
        docs.select(
            F.explode(let_bound(tokenize(F.col("text")), bigram_array)).alias("bg")
        )
        .groupBy("bg")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("bg"))
        .limit(1)
        .collect()[0][0]
    )
    assert idx.top_bigram().collect()[0][0] == scan


def test_query_plans_never_scan_documents(spark, idx):
    from affinity_spark.plans.introspect import formatted_plan, pushed_filters

    q = bm25_topk_postings(idx, ("stream", "merge"), k=5)
    q.collect()
    plan = formatted_plan(q)
    # only postings/doclen tables appear; the term filter reaches the scan
    assert "post1" in plan and "doclen" in plan
    assert any("term" in p for p in pushed_filters(q))


def test_streaming_foreachbatch_maintenance_matches_rebuild(spark, tmp_path):
    """X1 change-listener maintenance: a docs changelog STREAM drives
    PostingsIndex.refresh from foreachBatch (update re-indexes, text=NULL
    tombstone deindexes — KVStoreLocal.scala:195-248), and the maintained
    index equals a fresh rebuild on the post-change corpus."""
    import json
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    ix = PostingsIndex(spark, str(tmp_path / "m"), grams=(1,), num_buckets=2)
    ix.build(_docs(spark))

    changes = [
        {"doc_id": 2, "text": "rewritten stream document"},   # update
        {"doc_id": 9, "text": "a brand new late arrival"},    # insert
        {"doc_id": 4, "text": None},                          # tombstone
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
        ix.refresh(ups, deleted_ids=dels)

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

    after = [r for r in DOCS if r[0] not in (2, 4)] + [
        (2, "rewritten stream document"),
        (9, "a brand new late arrival"),
    ]
    fresh = PostingsIndex(spark, str(tmp_path / "rb"), grams=(1,), num_buckets=2)
    fresh.build(_docs(spark, after))
    assert _rows(ix.positional()) == _rows(fresh.positional())
    assert _rows(ix.doclens()) == _rows(fresh.doclens())


def test_null_text_doc_is_empty_not_poisoned(spark, tmp_path):
    """A NULL-text doc must behave as the empty document: present in
    doclen with dl=0, absent from postings — not a NULL dl that poisons
    corpus stats."""
    rows = [(1, "one two"), (2, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ix = PostingsIndex(spark, str(tmp_path / "n"), grams=(1,), num_buckets=2)
    ix.build(docs)
    assert _rows(ix.doclens()) == [(1, 2), (2, 0)]
    assert ix.positional().filter(F.col("doc_id") == 2).count() == 0
    n, l = ix.corpus_stats().collect()[0]
    assert (n, l) == (2, 2)


def test_refresh_rewrites_only_touched_buckets(spark, tmp_path):
    """The delta-proportional-IO contract: refresh must (a) HARDLINK every
    untouched doc-id bucket's files from the base snapshot (same inode, so
    zero data IO for them) and (b) physically rewrite only the buckets
    holding touched docs. With doc_buckets ∝ corpus this is what makes
    index maintenance O(delta) instead of O(index) at 100 TB."""
    import os

    ix = PostingsIndex(
        spark, str(tmp_path / "hb"), grams=(1,), num_buckets=2, doc_buckets=4
    )
    ix.build(_docs(spark))
    base = ix._tables[1]._current_version_dir()

    changed_id = 2
    touched_bucket = (
        _docs(spark)
        .filter(F.col("doc_id") == changed_id)
        .select(
            F.pmod(F.hash(F.col("doc_id").cast("string")), F.lit(4)).alias("b")
        )
        .collect()[0][0]
    )
    ix.refresh(_docs(spark, [(changed_id, "completely new words")]))
    new = ix._tables[1]._current_version_dir()
    assert new != base

    def inodes(vdir, bucket):
        d = os.path.join(vdir, f"_bucket={bucket}")
        if not os.path.isdir(d):
            return set()
        return {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    base_buckets = {
        int(e.split("=", 1)[1])
        for e in os.listdir(base)
        if e.startswith("_bucket=")
    }
    untouched = base_buckets - {touched_bucket}
    assert untouched, "fixture must spread docs over several buckets"
    for b in untouched:
        assert inodes(new, b) == inodes(base, b)  # hardlinked, not copied
    # the touched bucket is a fresh rewrite - no shared inodes
    assert inodes(new, touched_bucket).isdisjoint(inodes(base, touched_bucket))


def test_refresh_merge_scan_is_partition_pruned(spark, tmp_path):
    """The merge's read of the current snapshot must prune to the touched
    buckets at the SCAN (PartitionFilters), not filter after reading."""
    from affinity_spark.plans.introspect import formatted_plan

    ix = PostingsIndex(
        spark, str(tmp_path / "pp"), grams=(1,), num_buckets=2, doc_buckets=4
    )
    ix.build(_docs(spark))
    pruned = ix._tables[1].read().filter(F.col("_bucket").isin([1, 3]))
    plan = formatted_plan(pruned)
    import re

    m = re.search(r"PartitionFilters: \[(?P<f>[^\]]*)\]", plan)
    assert m and "_bucket" in m.group("f"), plan


def test_refresh_cas_detects_racing_writer(spark, tmp_path):
    """refresh() captures its base version and CAS-commits: a writer that
    lands between the capture and the commit must make refresh raise
    ConcurrentWriteError (loud loser), never silently drop the race."""
    import pytest as _pytest

    from affinity_spark.sources.keyed_table import ConcurrentWriteError

    ix = PostingsIndex(spark, str(tmp_path / "cas"), grams=(1,), num_buckets=2)
    ix.build(_docs(spark))

    # simulate the racer: bump the doclen table AFTER refresh captured its
    # base, by monkeypatching the merge read path to sneak a commit in
    real_read = ix._doclen.read

    def read_then_race():
        df = real_read()
        # racer commits a new version of the SAME table before our commit
        ix._doclen.overwrite(real_read())
        ix._doclen.read = real_read  # only race once
        return df

    ix._doclen.read = read_then_race
    changed = _docs(spark, [(2, "changed text")])
    with _pytest.raises(ConcurrentWriteError):
        ix.refresh(changed)


def test_refresh_delete_only_with_int_typed_ids(spark, tmp_path):
    """Regression: murmur3 of int32 and int64 differ for the same value,
    so a deleted_ids frame (python literals infer LONG) against an
    INT-typed corpus id would compute the WRONG bucket, scan/rewrite the
    wrong partition, and hardlink the stale one — silently keeping the
    deleted doc. The bucket hash is string-canonicalized so the bucket
    is a function of the VALUE, not the arrival width."""
    rows = [(int(d), t) for d, t in DOCS]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    ix = PostingsIndex(spark, str(tmp_path / "it"), grams=(1,), num_buckets=2)
    ix.build(docs)
    empty = spark.createDataFrame([], "doc_id int, text string")
    ix.refresh(empty, deleted_ids=[6])
    assert ix.positional().filter(F.col("doc_id") == 6).count() == 0
    assert ix.corpus_stats().collect()[0][0] == len(DOCS) - 1


def test_refresh_accepts_generator_and_empty_iterable_deleted_ids(spark, tmp_path):
    """Regression (r6 advice): `if deleted_ids:` on a generator is always
    truthy — an EMPTY generator used to reach createDataFrame([]) and die
    on schema inference. deleted_ids is now materialized to a list and
    branched on length, so generators (empty or not) behave like lists."""
    ix = PostingsIndex(spark, str(tmp_path / "gen"), grams=(1,), num_buckets=2)
    ix.build(_docs(spark))
    empty = spark.createDataFrame([], "doc_id long, text string")

    # empty generator: must be a no-op, not a schema-inference crash
    ix.refresh(empty, deleted_ids=(d for d in []))
    assert ix.corpus_stats().collect()[0][0] == len(DOCS)

    # non-empty generator deletes exactly like a list would
    ix.refresh(empty, deleted_ids=(d for d in [6]))
    assert ix.positional().filter(F.col("doc_id") == 6).count() == 0
    assert ix.corpus_stats().collect()[0][0] == len(DOCS) - 1


def test_exists_detects_cross_table_lineage_mismatch(spark, tmp_path):
    """Regression (r6 advice, revised r7): the doclen/post{n} tables commit
    independently — a crash between the per-table commits used to leave a
    permanently inconsistent index that exists() blessed, silently
    skewing bm25/tfidf. Every build/refresh stamps ONE lineage id into
    each table's commit meta; on disagreement exists() returns False (so
    `if not ix.exists(): ix.build(...)` self-heals) and
    check_consistent() raises LOUDLY."""
    ix = PostingsIndex(spark, str(tmp_path / "lin"), grams=(1,), num_buckets=2)
    ix.build(_docs(spark))
    assert ix.exists()  # consistent build
    ix.check_consistent()  # no raise

    # simulate the torn refresh: doclen re-committed under a new lineage,
    # postings left at the old one
    ix._doclen.overwrite(
        ix._doclen.read(), meta={"postings_lineage": "torn-refresh"}
    )
    assert not ix.exists()  # recoverable signal, not a raise
    with pytest.raises(RuntimeError, match="cross-table inconsistent"):
        ix.check_consistent()

    # the documented self-heal path: build() recommits every table under
    # one fresh lineage id
    ix.build(_docs(spark))
    assert ix.exists()
    ix.check_consistent()


def test_shared_postings_rebuilds_when_corpus_regenerated(spark, tmp_path):
    """Regression (r6 advice): shared_postings cached by (applicationId,
    corpus_key) alone — regenerating the corpus at the SAME path within
    one Spark app silently served the stale index. The cached value now
    carries a physical fingerprint (file listing + mtime_ns + size); a
    mismatch evicts the superseded entry AND removes its on-disk tables
    (r7: fingerprint moved from key to value so generations don't leak
    one tempdir each)."""
    import os

    from affinity_spark.operators.postings import shared_postings

    corpus = str(tmp_path / "corpus")
    _docs(spark).coalesce(1).write.parquet(corpus)
    key = f"test-regen-{tmp_path.name}"
    ix1 = shared_postings(spark, spark.read.parquet(corpus), key, grams=(1,))
    assert ix1 is shared_postings(spark, spark.read.parquet(corpus), key, grams=(1,))

    # regenerate the corpus at the same path (content AND mtime change)
    _docs(spark, [(7, "fresh corpus only")]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(corpus)
    for root, _d, files in os.walk(corpus):
        for f in files:
            os.utime(os.path.join(root, f))
    ix2 = shared_postings(spark, spark.read.parquet(corpus), key, grams=(1,))
    assert ix2 is not ix1
    assert [r[0] for r in ix2.positional().select("doc_id").distinct().collect()] == [7]
    # the superseded generation's tables were reclaimed, not leaked
    assert not os.path.exists(ix1.path)

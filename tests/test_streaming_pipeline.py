"""End-to-end composed streaming corpus pipeline (streaming/pipeline.py):
readStream → quality → stateful exact-dedup → online-LSH → split → keyed
sinks, equivalence-tested against the batch replay over ≥3 micro-batches.

Reference: the ingest spine S4 + X4 composed (stream ingest with commit
intervals feeding maintained state, KVStoreLocal.scala:195-248); here the
LLM-pipeline stages compose the same way.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from affinity_spark.sources.keyed_table import KeyedTable
from affinity_spark.streaming.pipeline import (
    corpus_pipeline_replay,
    corpus_sink,
    streaming_corpus_verdicts,
)

BODY = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)


def _docs():
    """Three micro-batches exercising every stage ACROSS batch boundaries:
    quality-reject, cross-batch exact dup, cross-batch near dup, and
    originals. At most one new doc per fingerprint per batch (the
    documented feed contract)."""
    return [
        # batch 0
        [
            {"doc_id": 1, "text": BODY + " one ending"},
            {"doc_id": 2, "text": "too short"},  # quality reject (< 10 tokens)
            {"doc_id": 3, "text": "completely different words " * 4 + "tail three"},
        ],
        # batch 1
        [
            {"doc_id": 4, "text": BODY + " one ending"},  # exact dup of 1
            {"doc_id": 5, "text": BODY + " five ending"},  # near dup of 1
        ],
        # batch 2
        [
            {"doc_id": 6, "text": BODY + " one ending"},  # exact dup again
            {"doc_id": 7, "text": "fresh original content entirely " * 3 + "seven"},
            {"doc_id": 8, "text": BODY + " eight ending"},  # near dup of 1
        ],
    ]


def _feed(dirpath, batches, start=0):
    os.makedirs(dirpath, exist_ok=True)
    for i, batch in enumerate(batches, start=start):
        tmp = os.path.join(dirpath, f".b{i}.tmp")
        with open(tmp, "w") as f:
            for row in batch:
                f.write(json.dumps(row) + "\n")
        dest = os.path.join(dirpath, f"b{i}.json")
        os.rename(tmp, dest)
        os.utime(dest, (1_700_000_000 + i,) * 2)


@pytest.fixture()
def tables(spark, tmp_path):
    surv = KeyedTable(
        spark, str(tmp_path / "survivors"), ["doc_id"], ts_col="n_tokens",
        num_buckets=2,
    )
    rej = KeyedTable(
        spark, str(tmp_path / "rejected"), ["doc_id"], ts_col="dup_of",
        num_buckets=2,
    )
    return surv, rej


def test_streaming_pipeline_matches_batch_replay(spark, tmp_path, tables):
    surv, rej = tables
    src = str(tmp_path / "in")
    batches = _docs()
    _feed(src, batches)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    verdicts = streaming_corpus_verdicts(stream)
    q = (
        verdicts.writeStream.foreachBatch(corpus_sink(surv, rej))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # batch twin over the full id-ordered corpus
    all_rows = [(r["doc_id"], r["text"]) for b in batches for r in b]
    corpus = spark.createDataFrame(all_rows, "doc_id long, text string")
    replay = corpus_pipeline_replay(corpus)
    want_surv = {
        (r["doc_id"], r["n_tokens"], r["split"])
        for r in replay.filter(F.col("dup_of").isNull()).collect()
    }
    want_rej = {
        (r["doc_id"], r["dup_of"])
        for r in replay.filter(F.col("dup_of").isNotNull()).collect()
    }

    got_surv = {
        (r["doc_id"], r["n_tokens"], r["split"]) for r in surv.read().collect()
    }
    got_rej = {(r["doc_id"], r["dup_of"]) for r in rej.read().collect()}
    assert got_surv == want_surv
    assert got_rej == want_rej

    # the stages actually fired: quality rejected 2 (in neither table),
    # exact dedup swallowed 4 and 6 (in neither table — never reached LSH),
    # near-dup rejected 5 and 8 against keeper 1, originals survived
    ids_seen = {t[0] for t in got_surv} | {t[0] for t in got_rej}
    assert 2 not in ids_seen
    assert 4 not in ids_seen and 6 not in ids_seen
    assert {t[0] for t in got_rej} == {5, 8}
    assert all(d == 1 for _, d in got_rej)
    assert {t[0] for t in got_surv} == {1, 3, 7}
    # split labels present on every survivor
    assert all(s in ("train", "val", "test") for _, _, s in got_surv)


def test_streaming_pipeline_restart_is_idempotent(spark, tmp_path, tables):
    """Feeding the first two batches, stopping, then restarting with the
    third must produce the same sink state as one continuous run — the
    upsert-keyed sink plus checkpointed state recover exactly."""
    surv, rej = tables
    src = str(tmp_path / "in")
    batches = _docs()
    _feed(src, batches[:2])

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = (
            streaming_corpus_verdicts(stream)
            .writeStream.foreachBatch(corpus_sink(surv, rej))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    _feed(src, [batches[2]], start=2)  # only the new file arrives
    run_once()

    all_rows = [(r["doc_id"], r["text"]) for b in batches for r in b]
    corpus = spark.createDataFrame(all_rows, "doc_id long, text string")
    replay = corpus_pipeline_replay(corpus)
    want_surv = {
        (r["doc_id"], r["n_tokens"], r["split"])
        for r in replay.filter(F.col("dup_of").isNull()).collect()
    }
    got_surv = {
        (r["doc_id"], r["n_tokens"], r["split"]) for r in surv.read().collect()
    }
    assert got_surv == want_surv


# --- maintained-BandIndex near-dup stage (indexed_corpus_sink) --------------


def _indexed_setup(spark, tmp_path):
    from affinity_spark.operators.bandindex import BandIndex
    from affinity_spark.sources.keyed_table import KeyedTable

    surv = KeyedTable(
        spark, str(tmp_path / "ix_survivors"), ["doc_id"], ts_col="n_tokens",
        num_buckets=2,
    )
    rej = KeyedTable(
        spark, str(tmp_path / "ix_rejected"), ["doc_id"], ts_col="dup_of",
        num_buckets=2,
    )
    bidx = BandIndex(spark, str(tmp_path / "bandix"), num_buckets=2, doc_buckets=2)
    store = KeyedTable(
        spark, str(tmp_path / "shingle_store"), ["doc_id"], ts_col="n_shingles",
        num_buckets=2,
    )
    return surv, rej, bidx, store


def _run_indexed(spark, src, ckpt, sink):
    from affinity_spark.streaming.pipeline import quality_exact_stream

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        quality_exact_stream(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_indexed_sink_matches_in_state_pipeline(spark, tmp_path, tables):
    """The maintained-BandIndex near-dup stage must produce EXACTLY the
    in-state pipeline's sink tables over >=3 micro-batches (the cap-free
    equivalence contract): same survivors with same splits, same rejected
    docs with the same dup_of attributions."""
    from affinity_spark.streaming.pipeline import indexed_corpus_sink

    surv_s, rej_s = tables
    surv_i, rej_i, bidx, store = _indexed_setup(spark, tmp_path)
    src = str(tmp_path / "in")
    batches = _docs()
    _feed(src, batches)

    # in-state pipeline
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        streaming_corpus_verdicts(stream)
        .writeStream.foreachBatch(corpus_sink(surv_s, rej_s))
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # index-served pipeline over the same feed
    _run_indexed(
        spark, src, str(tmp_path / "ckpt_ix"),
        indexed_corpus_sink(bidx, store, surv_i, rej_i),
    )

    def rows(t, cols):
        return {tuple(r[c] for c in cols) for r in t.read().collect()}

    assert rows(surv_i, ["doc_id", "n_tokens", "split"]) == rows(
        surv_s, ["doc_id", "n_tokens", "split"]
    )
    assert rows(rej_i, ["doc_id", "dup_of"]) == rows(rej_s, ["doc_id", "dup_of"])
    # the index carries the corpus at rest: every exact-surviving doc's
    # bands are admitted (survivors AND near-dups — bucket membership)
    assert {r["doc_id"] for r in bidx.bands().select("doc_id").distinct().collect()} == {
        1, 3, 5, 7, 8
    }


def test_indexed_sink_survives_checkpoint_reset(spark, tmp_path):
    """THE reason the index variant exists: near-dup corpus memory lives
    in committed tables, so after the checkpoint is wiped (fresh source
    replay, empty streaming state) a new near-dup of a pre-reset doc is
    still caught against the maintained index, and the replayed docs are
    skipped idempotently (no duplicate or flipped verdicts)."""
    import shutil

    from affinity_spark.streaming.pipeline import indexed_corpus_sink

    surv, rej, bidx, store = _indexed_setup(spark, tmp_path)
    sink = indexed_corpus_sink(bidx, store, surv, rej)
    src = str(tmp_path / "in")
    batches = _docs()
    _feed(src, batches)
    _run_indexed(spark, src, str(tmp_path / "ckpt1"), sink)

    before_surv = {r["doc_id"] for r in surv.read().collect()}
    before_rej = {(r["doc_id"], r["dup_of"]) for r in rej.read().collect()}

    # wipe the checkpoint entirely; feed ONE new file containing a near
    # dup of doc 1 (different fingerprint, so the rebuilt exact state
    # cannot catch it — only the index can)
    shutil.rmtree(str(tmp_path / "ckpt1"))
    _feed(src, [[{"doc_id": 9, "text": BODY + " nine ending"}]], start=3)
    _run_indexed(spark, src, str(tmp_path / "ckpt2"), sink)

    got_rej = {(r["doc_id"], r["dup_of"]) for r in rej.read().collect()}
    got_surv = {r["doc_id"] for r in surv.read().collect()}
    assert (9, 1) in got_rej  # pre-reset history served from the index
    assert got_surv == before_surv  # replayed docs: verdicts unchanged
    assert got_rej == before_rej | {(9, 1)}
    assert 9 in {
        r["doc_id"] for r in bidx.bands().select("doc_id").distinct().collect()
    }


def test_retract_docs_removes_from_every_surface(spark, tmp_path):
    """Takedown: retracting a doc removes it from the band index, the
    shingle store, and the verdict tables; FUTURE near-dups then match
    the earliest REMAINING bucket member, while historical dup_of
    attributions pointing at the retracted doc are kept (verdicts about
    the rejected docs, not retained content)."""
    from affinity_spark.streaming.pipeline import (
        indexed_corpus_sink,
        retract_docs,
    )

    surv, rej, bidx, store = _indexed_setup(spark, tmp_path)
    sink = indexed_corpus_sink(bidx, store, surv, rej)
    src = str(tmp_path / "in")
    _feed(src, _docs())
    _run_indexed(spark, src, str(tmp_path / "ckpt1"), sink)
    assert 1 in {r["doc_id"] for r in surv.read().collect()}

    retract_docs(bidx, store, surv, rej, [1])
    assert 1 not in {r["doc_id"] for r in surv.read().collect()}
    assert 1 not in {r["doc_id"] for r in store.read().collect()}
    assert 1 not in {
        r["doc_id"] for r in bidx.bands().select("doc_id").distinct().collect()
    }
    # historical attributions to the retracted doc survive
    assert {(r["doc_id"], r["dup_of"]) for r in rej.read().collect()} == {
        (5, 1), (8, 1)
    }

    # a NEW near-dup of the retracted content now matches the earliest
    # REMAINING bucket member (5), not the gone doc
    _feed(src, [[{"doc_id": 10, "text": BODY + " ten ending"}]], start=3)
    _run_indexed(spark, src, str(tmp_path / "ckpt1"), sink)
    got = {(r["doc_id"], r["dup_of"]) for r in rej.read().collect()}
    assert (10, 5) in got, got


# --- fully store-served pipeline (QualityStore gate + BandIndex near-dup) ----


def _store_served_setup(spark, tmp_path):
    from affinity_spark.operators.quality_store import QualityStore

    surv, rej, bidx, store = _indexed_setup(spark, tmp_path)
    qstore = QualityStore(spark, str(tmp_path / "qstore"))
    # the CCNet shape: the reference model trains on a reference corpus
    # BEFORE the stream starts; admitted docs score against it
    ref = spark.createDataFrame(
        [(1000 + i, BODY + f" ref {i}", "en") for i in range(4)],
        "doc_id long, text string, lang string",
    )
    qstore.build(ref)
    return surv, rej, bidx, store, qstore


def _feed_lang(dirpath, batches, start=0):
    import json as _json
    import os as _os

    _os.makedirs(dirpath, exist_ok=True)
    for i, chunk in enumerate(batches):
        tmp = _os.path.join(dirpath, f".l{start + i}.tmp")
        with open(tmp, "w") as f:
            for row in chunk:
                f.write(_json.dumps({**row, "lang": "en"}) + "\n")
        dest = _os.path.join(dirpath, f"l{start + i}.json")
        _os.rename(tmp, dest)
        _os.utime(dest, (1_700_000_000 + start + i,) * 2)


def _run_store_served(spark, src, ckpt, sink, through_gate=False):
    from affinity_spark.streaming.pipeline import quality_exact_stream

    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    if through_gate:
        stream = quality_exact_stream(stream)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_store_served_sink_matches_indexed_pipeline(spark, tmp_path):
    """Gate + exact dedup read from the QualityStore and near-dup from
    the BandIndex must reproduce the quality_exact_stream +
    indexed_corpus_sink pipeline exactly over the same feed — zero
    streaming state anywhere in the served variant."""
    from affinity_spark.streaming.pipeline import (
        indexed_corpus_sink,
        store_served_corpus_sink,
    )

    surv_a, rej_a, bidx_a, store_a, qstore = _store_served_setup(
        spark, tmp_path
    )
    surv_b, rej_b, bidx_b, store_b = _indexed_setup(
        spark, tmp_path / "twin"
    )

    src = str(tmp_path / "in")
    _feed_lang(src, _docs())

    _run_store_served(
        spark, src, str(tmp_path / "ckpt_served"),
        store_served_corpus_sink(
            qstore, bidx_a, store_a, surv_a, rej_a, run_id="r1"
        ),
    )
    _run_store_served(
        spark, src, str(tmp_path / "ckpt_twin"),
        indexed_corpus_sink(bidx_b, store_b, surv_b, rej_b),
        through_gate=True,
    )

    def rows(t, cols):
        return {tuple(r[c] for c in cols) for r in t.read().collect()}

    assert rows(surv_a, ["doc_id", "n_tokens", "split"]) == rows(
        surv_b, ["doc_id", "n_tokens", "split"]
    )
    assert rows(rej_a, ["doc_id", "dup_of"]) == rows(
        rej_b, ["doc_id", "dup_of"]
    )
    # the quality store holds a committed signal row for EVERY streamed
    # doc (gated and dropped alike) — the audit surface the state
    # pipeline never had
    streamed = {r["doc_id"] for b in _docs() for r in b}
    got = {
        r["doc_id"]
        for r in qstore.signals().filter(F.col("doc_id") < 1000).collect()
    }
    assert got == streamed


def test_store_served_sink_enforces_ascending_id_contract(spark, tmp_path):
    """A smaller-id exact dup arriving AFTER its fingerprint was admitted
    (an ascending-id contract violation) must not flip the committed
    doc's canonicality while that doc sits in the survivors table: the
    sink rejects the violator as a dup of the committed canonical doc and
    never admits it (r10 ADVICE — enforcement, not documentation)."""
    from affinity_spark.streaming.pipeline import store_served_corpus_sink

    surv, rej, bidx, store, qstore = _store_served_setup(spark, tmp_path)
    src = str(tmp_path / "in")
    # batch 3 violates the contract: doc 0 is an exact dup of doc 1's
    # text but carries a SMALLER id and arrives after doc 1 was admitted
    _feed_lang(src, _docs() + [[{"doc_id": 0, "text": BODY + " one ending"}]])
    _run_store_served(
        spark, src, str(tmp_path / "ckpt"),
        store_served_corpus_sink(qstore, bidx, store, surv, rej, run_id="rA"),
    )
    rejected = {
        (r["doc_id"], r["dup_of"]) for r in rej.read().collect()
    }
    assert (0, 1) in rejected
    sig = {r["doc_id"]: r["is_canonical"] for r in qstore.signals().collect()}
    assert sig[1] is True
    assert 0 not in sig  # the violator was never admitted to the store
    surv_ids = {r["doc_id"] for r in surv.read().collect()}
    assert 1 in surv_ids and 0 not in surv_ids


def test_store_served_sink_checkpoint_reset_idempotent(spark, tmp_path):
    """All truth lives in committed tables, so wiping the checkpoint and
    replaying the full source under a NEW run id changes NOTHING: signal
    rows replace themselves (histogram nets zero via the replacement
    subtraction), admitted ids skip, verdicts stay put."""
    from affinity_spark.streaming.pipeline import store_served_corpus_sink

    surv, rej, bidx, store, qstore = _store_served_setup(spark, tmp_path)
    src = str(tmp_path / "in")
    _feed_lang(src, _docs())

    _run_store_served(
        spark, src, str(tmp_path / "ckpt1"),
        store_served_corpus_sink(qstore, bidx, store, surv, rej, run_id="rA"),
    )
    before = (
        {tuple(r) for r in surv.read().select("doc_id", "split").collect()},
        {tuple(r) for r in rej.read().collect()},
        {tuple(r) for r in qstore._hist.read().collect()},
        {r["doc_id"] for r in qstore.signals().collect()},
    )

    import shutil

    shutil.rmtree(str(tmp_path / "ckpt1"))
    _run_store_served(
        spark, src, str(tmp_path / "ckpt2"),
        store_served_corpus_sink(qstore, bidx, store, surv, rej, run_id="rB"),
    )
    after = (
        {tuple(r) for r in surv.read().select("doc_id", "split").collect()},
        {tuple(r) for r in rej.read().collect()},
        {tuple(r) for r in qstore._hist.read().collect()},
        {r["doc_id"] for r in qstore.signals().collect()},
    )
    assert after == before


def test_store_served_pipeline_survives_mid_batch_kills(spark, tmp_path):
    """The Failover2Spec analog (reference
    ``core/src/test/scala/io/amient/affinity/core/cluster/Failover2Spec.scala:70``
    — continuous writes through a master kill with no acked-write loss),
    composed end-to-end (r13 verdict #5): kill the store-served sink
    BETWEEN the multi-table admit steps of one micro-batch — after the
    quality-store signals commit but before the gate read, after the
    survivors commit but before the index admit, after the index admit but
    before the corpus-store upsert, and after the last table commit but
    before the CHECKPOINT commit — then restart from the same checkpoint
    and require every committed row to equal the uninterrupted run's.
    This proves the per-store heals + replay fences compose across tables,
    not just per-store (the per-store tear tests)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from affinity_spark.streaming.pipeline import store_served_corpus_sink

    def rows(t, cols):
        return {tuple(r[c] for c in cols) for r in t.read().collect()}

    # uninterrupted reference run
    surv_r, rej_r, bidx_r, store_r, qstore_r = _store_served_setup(
        spark, tmp_path / "ref"
    )
    src = str(tmp_path / "in")
    _feed_lang(src, _docs())
    _run_store_served(
        spark, src, str(tmp_path / "ckpt_ref"),
        store_served_corpus_sink(
            qstore_r, bidx_r, store_r, surv_r, rej_r, run_id="run"
        ),
    )
    want_surv = rows(surv_r, ["doc_id", "n_tokens", "split"])
    want_rej = rows(rej_r, ["doc_id", "dup_of"])
    want_corpus = rows(store_r, ["doc_id", "n_shingles"])
    want_signals = {
        r["doc_id"] for r in qstore_r.signals().collect()
    }
    assert want_surv and want_rej and want_corpus  # feed exercises all

    class Boom(RuntimeError):
        pass

    # (which store, method, 1-based call ordinal to kill AFTER) — each
    # ordinal lands mid-stream so earlier batches are already committed
    # and later ones still pending:
    kill_specs = [
        ("qstore", "admit", 2),   # batch 1: signals committed, gate unread
        ("surv", "upsert", 2),    # batch 2: survivors committed, admits pending
        ("bidx", "admit", 1),     # batch 1: index admitted, corpus upsert pending
        ("store", "upsert", 2),   # batch 1: all tables committed, ckpt pending
    ]
    for which, method, ordinal in kill_specs:
        d = tmp_path / f"kill_{which}_{method}_{ordinal}"
        surv, rej, bidx, store, qstore = _store_served_setup(spark, d)
        objs = {"surv": surv, "rej": rej, "bidx": bidx, "store": store,
                "qstore": qstore}
        target = objs[which]
        orig = getattr(target, method)
        calls = {"n": 0}

        def killing(*a, _orig=orig, _calls=calls, _ord=ordinal, **k):
            r = _orig(*a, **k)
            _calls["n"] += 1
            if _calls["n"] == _ord:
                raise Boom(f"injected kill after {method} #{_ord}")
            return r

        setattr(target, method, killing)
        ckpt = str(d / "ckpt")
        sink = store_served_corpus_sink(
            qstore, bidx, store, surv, rej, run_id="run"
        )
        with pytest.raises((StreamingQueryException, Exception)) as ei:
            _run_store_served(spark, src, ckpt, sink)
        assert "injected kill" in str(ei.value), (which, method, ei.value)
        # restart from the SAME checkpoint with the kill disarmed — the
        # failed batch replays whole, later batches follow
        setattr(target, method, orig)
        _run_store_served(spark, src, ckpt, sink)
        tag = (which, method, ordinal)
        assert rows(surv, ["doc_id", "n_tokens", "split"]) == want_surv, tag
        assert rows(rej, ["doc_id", "dup_of"]) == want_rej, tag
        assert rows(store, ["doc_id", "n_shingles"]) == want_corpus, tag
        assert {
            r["doc_id"] for r in qstore.signals().collect()
        } == want_signals, tag

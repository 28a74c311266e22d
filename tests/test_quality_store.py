"""Maintained quality-signal store (operators/quality_store.py — the
sixth maintained family): served==derived equivalence for the bucket and
ensemble reads, admit==rebuild against the standing model, canonicality
flips across generations, additive-histogram replay fencing, generation
hardlinking (delta-proportional IO), drift trigger, torn-build healing,
and streaming maintenance."""

import json
import os

from pyspark.sql import functions as F

from affinity_spark.operators.quality_store import QualityStore

# a small multilingual corpus: en reference slice (>= 2 tokens), short
# unscorable docs, exact-duplicate fingerprints across doc ids, non-en
# languages with enough docs for distinct tertiles
_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",  # dup fp of 0
    "a stitch in time saves nine every single time",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
    "sphinx of black quartz judge my vow",
    "the five boxing wizards jump quickly",
    "jived fox nymph grabs quick waltz",
    "hi",  # < 2 tokens: unscorable
    "glib jocks quiz nymph to vex dwarf",
    "the jay pig fox zebra and my wolves quack",
    "quick zephyrs blow vexing daft jim",
]


def _docs(spark, ids, lang_of=None):
    lang_of = lang_of or (lambda i: "en" if i % 3 != 2 else "fr")
    rows = [
        (i, _TEXTS[i % len(_TEXTS)] + (" extra" if i >= len(_TEXTS) else ""),
         lang_of(i))
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _sig_set(df):
    return {
        tuple(r[c] for c in (
            "doc_id", "lang", "fp", "n_words", "mean_word_len_x100",
            "top_token_bp", "n_bigrams", "nll_kn_x1024",
            "bits_per_bigram_x100", "is_canonical",
        ))
        for r in df.collect()
    }


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_served_buckets_match_derivation(spark, tmp_path):
    """store.buckets() == the from-scratch perplexity_buckets derivation
    on the same corpus (same model slice, same cutoff rule)."""
    from affinity_spark.operators.lm import (
        kn_score_bits,
        perplexity_buckets,
        train_bigram_model,
    )

    docs = _docs(spark, range(24))
    st = QualityStore(spark, str(tmp_path / "q"))
    st.build(docs)

    model = train_bigram_model(docs.filter(F.col("lang") == "en"))
    scored = kn_score_bits(docs, model).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    derived = perplexity_buckets(scored).select(
        "doc_id", "lang", "bits_per_bigram_x100", "ppl_bucket"
    )
    assert _rows_set(st.buckets()) == _rows_set(derived)


def test_served_ensemble_matches_derivation(spark, tmp_path):
    """store.ensemble() == the pre-store 21-shuffle derivation (the
    rewired registry query's equivalence witness)."""
    from affinity_spark.registry.quality import _derived_filter_ensemble

    sf_dir = "/root/testdata/sf0.001"
    from affinity_spark.registry._shared import _t

    docs = _t(spark, sf_dir, "documents")
    st = QualityStore(spark, str(tmp_path / "e"))
    st.build(docs)
    assert _rows_set(st.ensemble()) == _rows_set(
        _derived_filter_ensemble(spark, sf_dir)
    )


def test_admit_matches_rebuild_with_same_model(spark, tmp_path):
    """Incremental admit == full rebuild scored against the SAME standing
    model (the IVFIndex same-codebook contract): signals, histogram and
    cutoffs all agree."""
    all_docs = _docs(spark, range(30))
    a = all_docs.filter(F.col("doc_id") < 20)
    b = all_docs.filter(F.col("doc_id") >= 20)

    st = QualityStore(spark, str(tmp_path / "inc"))
    st.build(a)
    st.admit(b)

    expected = QualityStore._with_canonical(
        st._signals_delta(all_docs, st.model())
    )
    assert _sig_set(st.signals().drop("gen")) == _sig_set(expected)
    assert _rows_set(st._hist.read()) == _rows_set(st._hist_of(expected))
    assert _rows_set(st.cutoffs()) == _rows_set(
        st._cutoffs_of(st._hist_of(expected))
    )


def test_admit_replacement_updates_signals_and_hist(spark, tmp_path):
    """Re-admitting an existing doc_id with new text replaces its row and
    SUBTRACTS its old (lang, score) histogram contribution."""
    docs = _docs(spark, range(12))
    st = QualityStore(spark, str(tmp_path / "rep"))
    st.build(docs)
    new_text = spark.createDataFrame(
        [(3, "pack my box with five dozen liquor jugs", "en")],
        "doc_id long, text string, lang string",
    )
    st.admit(new_text)
    replaced = docs.filter(F.col("doc_id") != 3).unionByName(new_text)
    expected = QualityStore._with_canonical(
        st._signals_delta(replaced, st.model())
    )
    assert _sig_set(st.signals().drop("gen")) == _sig_set(expected)
    assert _rows_set(st._hist.read()) == _rows_set(st._hist_of(expected))


def test_canonicality_flips_across_generations(spark, tmp_path):
    """A later admit landing a SMALLER doc_id on an existing fingerprint
    must flip the old generation's canonical flag — the flip rewrites
    only the generation holding the flipped row."""
    base = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog", "en"),
         (11, "pack my box with five dozen liquor jugs", "en")],
        "doc_id long, text string, lang string",
    )
    st = QualityStore(spark, str(tmp_path / "flip"))
    st.build(base)
    assert {
        r["doc_id"]: r["is_canonical"] for r in st.signals().collect()
    } == {10: True, 11: True}

    smaller = spark.createDataFrame(
        [(5, "the quick brown fox jumps over the lazy dog", "en")],
        "doc_id long, text string, lang string",
    )
    st.admit(smaller)
    got = {r["doc_id"]: r["is_canonical"] for r in st.signals().collect()}
    assert got == {5: True, 10: False, 11: True}


def test_admit_hardlinks_untouched_generations(spark, tmp_path):
    """An admit with no replacement and no canonicality flip must write
    ONLY its new generation partition; every prior generation hardlinks
    forward (same inodes) — merge IO ∝ batch, never ∝ corpus."""
    st = QualityStore(spark, str(tmp_path / "hl"))
    st.build(_docs(spark, range(10)))
    st.admit(_docs(spark, range(20, 24)))
    base = st._signals._current_version_dir()
    st.admit(_docs(spark, range(30, 33)))
    new = st._signals._current_version_dir()
    assert new != base

    def inodes(vdir, gen):
        d = os.path.join(vdir, f"gen={gen}")
        if not os.path.isdir(d):
            return set()
        return {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    for gen in ("g0", "g1"):
        assert inodes(base, gen), f"{gen} missing from base snapshot"
        assert inodes(new, gen) == inodes(base, gen)  # hardlinked
    assert inodes(new, "g2")  # fresh partition for the batch


def test_histogram_fence_replay_safety(spark, tmp_path):
    """Additive-state fencing (the DDStore rule): a fenced re-admit is
    dropped whole; the same batch id under a NEW run id applies."""
    st = QualityStore(spark, str(tmp_path / "fence"))
    st.build(_docs(spark, range(10)))
    batch = _docs(spark, range(40, 44))
    st.admit(batch, fence="runA:0")
    n1 = st.signals().count()
    h1 = _rows_set(st._hist.read())
    st.admit(batch, fence="runA:0")  # replay: dropped whole
    assert st.signals().count() == n1
    assert _rows_set(st._hist.read()) == h1
    st.admit(_docs(spark, range(50, 52)), fence="runB:0")  # new run applies
    assert st.signals().count() == n1 + 2


def test_needs_retrain_growth_trigger(spark, tmp_path):
    st = QualityStore(spark, str(tmp_path / "drift"))
    st.build(_docs(spark, range(10)))
    assert not st.needs_retrain(max_growth=0.5)
    st.admit(_docs(spark, range(100, 108)))
    assert st.needs_retrain(max_growth=0.5)
    st.retrain(_docs(spark, list(range(10)) + list(range(100, 108))))
    assert not st.needs_retrain(max_growth=0.5)
    assert st.signals().count() == 18


def test_torn_admit_heals_on_replay(spark, tmp_path):
    """A crash between the signals and hist commits records the replay
    fence (it rides the signals meta) while leaving the derived tables
    behind — and the fenced replay is dropped whole, so without healing
    the divergence would be permanent (r10 ADVICE). Every admit — fenced
    replays included — now sync-checks hist/cutoffs against the signals
    epoch and rebuilds them from the committed signals on mismatch."""
    import pytest

    st = QualityStore(spark, str(tmp_path / "tear"))
    st.build(_docs(spark, range(10)))
    batch = _docs(spark, range(40, 44))
    real = st._hist.overwrite
    st._hist.overwrite = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("crash between signals and hist commits")
    )
    try:
        with pytest.raises(RuntimeError):
            st.admit(batch, fence="runA:0")
    finally:
        st._hist.overwrite = real
    # tear landed: signals advanced, hist did not
    assert _rows_set(st._hist.read()) != _rows_set(st._hist_of(st.signals()))
    # the maintainer's replay of the same batch is fence-dropped, but heals
    st.admit(batch, fence="runA:0")
    assert _rows_set(st._hist.read()) == _rows_set(st._hist_of(st.signals()))
    assert _rows_set(st._cutoffs.read()) == _rows_set(
        st._cutoffs_of(st._hist.read())
    )
    # and later batches keep the store in sync
    st.admit(_docs(spark, range(50, 52)), fence="runA:1")
    assert _rows_set(st._hist.read()) == _rows_set(st._hist_of(st.signals()))


def test_torn_build_reads_as_absent(spark, tmp_path):
    st = QualityStore(spark, str(tmp_path / "torn"))
    assert not st.exists()
    st.build(_docs(spark, range(8)))
    assert st.exists()
    # simulate a torn rebuild: cutoffs committed under a different lineage
    st._cutoffs.overwrite(st.cutoffs(), meta={"q_lineage": "other"})
    assert not st.exists()


def test_streaming_maintainer_matches_admits(spark, tmp_path):
    """foreachBatch maintenance: micro-batched ingest leaves the store
    exactly where direct sequential admits would."""
    base = _docs(spark, range(12))
    st = QualityStore(spark, str(tmp_path / "m"))
    st.build(base)

    chunks = [[(60, _TEXTS[3], "en"), (61, _TEXTS[4], "fr")],
              [(62, _TEXTS[5], "en")]]
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate(chunks):
        tmp = os.path.join(src, f".c{i}.tmp")
        with open(tmp, "w") as f:
            for did, text, lang in chunk:
                f.write(json.dumps(
                    {"doc_id": did, "text": text, "lang": lang}
                ) + "\n")
        dest = os.path.join(src, f"c{i}.json")
        os.rename(tmp, dest)
        os.utime(dest, (1_700_000_000 + i,) * 2)

    q = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(st.maintainer(run_id="t-run-1"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    twin = QualityStore(spark, str(tmp_path / "twin"))
    twin.build(base)
    for chunk in chunks:
        twin.admit(spark.createDataFrame(
            chunk, "doc_id long, text string, lang string"
        ))
    assert _sig_set(st.signals().drop("gen")) == _sig_set(
        twin.signals().drop("gen")
    )
    assert _rows_set(st._hist.read()) == _rows_set(twin._hist.read())
    assert _rows_set(st.cutoffs()) == _rows_set(twin.cutoffs())


def test_compact_generations_preserves_reads_and_fences(spark, tmp_path):
    """Compaction squashes the per-admit generation partitions into one
    (the small-files answer for a long-running maintainer) without
    changing any read, and the replay fence survives it."""
    st = QualityStore(spark, str(tmp_path / "cg"))
    st.build(_docs(spark, range(10)))
    st.admit(_docs(spark, range(20, 24)), fence="r:0")
    st.admit(_docs(spark, range(30, 33)), fence="r:1")
    before_sig = _sig_set(st.signals().drop("gen"))
    before_ens = _rows_set(st.ensemble())
    st.compact_generations()
    vdir = st._signals._current_version_dir()
    gens = [d for d in os.listdir(vdir) if d.startswith("gen=")]
    assert gens == ["gen=g0"]
    assert _sig_set(st.signals().drop("gen")) == before_sig
    assert _rows_set(st.ensemble()) == before_ens
    n = st.signals().count()
    st.admit(_docs(spark, range(30, 33)), fence="r:1")  # replay still fenced
    assert st.signals().count() == n
    st.admit(_docs(spark, range(40, 42)), fence="r:2")  # new batches land
    assert st.signals().count() == n + 2


def test_per_lang_store_served_buckets_match_derivation(spark, tmp_path):
    """per_lang=True: one KN model per language committed under the same
    store mechanics; served buckets == the from-scratch per-language
    derivation (the docs_ccnet_perlang contract)."""
    from affinity_spark.registry.quality import _derived_ccnet_perlang

    sf_dir = "/root/testdata/sf0.001"
    from affinity_spark.registry._shared import _t

    docs = _t(spark, sf_dir, "documents")
    st = QualityStore(spark, str(tmp_path / "pl"), per_lang=True)
    st.build(docs)
    assert _rows_set(st.buckets()) == _rows_set(
        _derived_ccnet_perlang(spark, sf_dir)
    )


def test_per_lang_admit_matches_rebuild_with_same_models(spark, tmp_path):
    """per_lang admit scores the batch against the STANDING per-language
    models and matches a rebuild pinned to the same models — including a
    language the models have never seen (no score rows, NULL fields)."""
    all_docs = _docs(spark, range(24)).unionByName(
        spark.createDataFrame(
            [(90, "ein brauner fuchs springt uber den hund", "de")],
            "doc_id long, text string, lang string",
        )
    )
    a = all_docs.filter(F.col("doc_id") < 16)
    b = all_docs.filter(F.col("doc_id") >= 16)  # includes the de doc
    st = QualityStore(spark, str(tmp_path / "pli"), per_lang=True)
    st.build(a)
    st.admit(b)
    expected = QualityStore._with_canonical(
        st._signals_delta(all_docs, st.model())
    )
    assert _sig_set(st.signals().drop("gen")) == _sig_set(expected)
    assert _rows_set(st._hist.read()) == _rows_set(st._hist_of(expected))
    # the unseen-language doc carries no fluency evidence
    row = st.signals().filter(F.col("doc_id") == 90).collect()[0]
    assert row["n_bigrams"] is None and row["lang"] == "de"


def test_maintainer_compacts_generations_on_schedule(spark, tmp_path):
    """Maintainer-driven generation squash (r10 verdict #5): the gen
    count is bounded across N micro-batches, reads are unchanged, and
    fences carry through compaction (a replayed batch still drops)."""
    st = QualityStore(spark, str(tmp_path / "mg"))
    st.build(_docs(spark, range(8)))
    apply = st.maintainer(run_id="runG", max_generations=3)
    for i in range(6):
        apply(_docs(spark, range(100 + 4 * i, 104 + 4 * i)), i)
    gens = {r["gen"] for r in st._signals.read().select("gen").distinct().collect()}
    # squashed at least once: far fewer generation dirs than admits
    assert len(gens) < 4
    assert st.signals().count() == 8 + 24
    # fences survived the squash: replaying the last batch is a no-op
    before = _sig_set(st.signals())
    h_before = _rows_set(st._hist.read())
    apply(_docs(spark, range(120, 124)), 5)
    assert _sig_set(st.signals()) == before
    assert _rows_set(st._hist.read()) == h_before

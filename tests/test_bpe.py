"""BPE tokenizer training + segmentation: golden merges on the classic
corpus shape, determinism, the concat-inverse property, and agreement
between the Spark apply path and the python model (the op is iterative →
no SQL oracle; these goldens are its correctness gate)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from affinity_spark.operators.bpe import (
    END,
    bpe_segment,
    segment_word,
    train_bpe,
    word_counts,
)


def _corpus(spark):
    # the Sennrich worked example's shape: low/lower/newest/widest family
    rows = [
        (1, "low low low low low"),
        (2, "lower lower"),
        (3, "newest newest newest newest newest newest"),
        (4, "widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_golden_merges(spark):
    merges = train_bpe(_corpus(spark), "text", n_merges=6, min_count=1)
    # est</w> dominates (newest x6 + widest x3): e+s first (9), then es+t,
    # then est+</w>; then 'lo' (low x5 + lower x2)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")
    assert len(merges) == 6


def test_training_is_deterministic(spark):
    c = _corpus(spark)
    assert train_bpe(c, "text", 5, 1) == train_bpe(c, "text", 5, 1)


def test_segment_concat_inverse(spark):
    merges = train_bpe(_corpus(spark), "text", 8, 1)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in ("low", "lower", "newest", "widest", "unseen"):
        toks = segment_word(w, ranks)
        assert "".join(toks) == w + END


@given(st.text(alphabet="abcd", min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_segment_inverse_property(w):
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", "d"): 2, ("a", "a"): 3}
    assert "".join(segment_word(w, ranks)) == w + END


def test_spark_apply_matches_python_model(spark):
    corpus = _corpus(spark)
    merges = train_bpe(corpus, "text", 6, 1)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    got = {r.doc_id: list(r.tokens) for r in bpe_segment(corpus, "doc_id", "text", merges).collect()}
    rows = {r.doc_id: r.text for r in corpus.collect()}
    for did, text in rows.items():
        expect = [t for w in text.lower().split() for t in segment_word(w, ranks)]
        assert got[did] == expect
    n = {r.doc_id: r.n_bpe_tokens for r in bpe_segment(corpus, "doc_id", "text", merges).collect()}
    assert n[1] == len(got[1])


def test_word_count_is_single_shuffle(spark):
    from affinity_spark.plans.introspect import executed_plan

    plan = executed_plan(word_counts(_corpus(spark), "text"))
    assert plan.count("Exchange") <= 2  # hash agg exchange (+AQE read)


def test_min_count_prunes_rare_words(spark):
    merges = train_bpe(_corpus(spark), "text", 4, min_count=3)
    flat = {s for p in merges for s in p}
    # 'lower' (x2) and 'widest'-only chars must not drive merges: 'w' 'i'
    # 'd' appear in newest/widest; 'r' only in lower (count 2) -> excluded
    assert "r" not in flat


def test_vocab_cap_equality_and_plan(spark):
    """The unconditional top-K word-type cap: (a) with K >= #types the
    merge table is IDENTICAL to the uncapped result; (b) with a small K
    training still works, over the K most frequent types; (c) the top-K
    runs as TakeOrderedAndProject (per-partition heaps), never a global
    sort followed by a full collect."""
    c = _corpus(spark)
    assert train_bpe(c, "text", 6, 1, max_word_types=1_000_000) == train_bpe(
        c, "text", 6, 1, max_word_types=4
    )  # corpus has exactly 4 word types

    # K=2 keeps only newest(6) + low(5): merges must involve their symbols
    capped = train_bpe(c, "text", 4, 1, max_word_types=2)
    syms = {s for pair in capped for s in pair}
    assert syms and not any("wid" in s or s == "r" for s in syms)

    from affinity_spark.operators.bpe import word_counts
    from affinity_spark.plans.introspect import formatted_plan
    from pyspark.sql import functions as F

    plan = formatted_plan(
        word_counts(c, "text")
        .filter(F.col("n") >= 1)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(10)
    )
    assert "TakeOrderedAndProject" in plan

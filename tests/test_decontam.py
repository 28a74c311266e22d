"""Decontamination (eval-overlap removal) + Gopher-rule quality gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from affinity_spark.functions.text import gopher_rule_struct
from affinity_spark.operators.decontam import contamination_hits


def test_contamination_flags_overlapping_docs(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # contains eval 4-gram
            (2, "zeta eta theta iota kappa"),         # clean
            (3, "alpha beta gamma delta other"),      # contains eval 4-gram
            (4, "short doc"),                         # too short for any gram
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "x alpha beta gamma delta y")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_contaminated_grams, r.contaminated)
        for r in contamination_hits(train, eval_docs, n=4).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (1, True)
    assert got[4] == (0, False)
    assert len(got) == 4, "every training doc appears in the output"


def test_contamination_broadcast_plan(spark):
    """The eval gram set must broadcast — no shuffle of the training corpus
    on the gram key (the 100 TB-shape requirement)."""
    from affinity_spark.plans.introspect import executed_plan

    train = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(50)],
        "doc_id long, text string",
    )
    eval_docs = train.limit(2)
    plan = executed_plan(contamination_hits(train, eval_docs, n=4))
    assert "BroadcastHashJoin" in plan
    # the only exchanges allowed: broadcast of eval grams + the doc_id agg
    # + the final left join of (tiny) hits — never a gram-keyed repartition
    # of the training side
    assert "hashpartitioning(gram" not in plan


def test_contamination_bloom_no_false_negatives_and_zero_shuffle(spark):
    """The bloom probe must flag EVERY truly contaminated doc (one-sided
    error: false positives allowed, false negatives never), agree with the
    python-side probe bit-for-bit, and keep the training side shuffle-free
    (no Exchange at all — probing is a pure projection)."""
    from affinity_spark.operators.decontam import contamination_bloom
    from affinity_spark.plans.introspect import executed_plan

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
            (3, "alpha beta gamma delta other"),
            (4, "short doc"),
        ]
        + [(10 + i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(40)],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "x alpha beta gamma delta y")], "doc_id long, text string"
    )
    exact = {
        r.doc_id: r.contaminated
        for r in contamination_hits(train, eval_docs, n=4).collect()
    }
    bloom = {
        r.doc_id: r.flagged
        for r in contamination_bloom(
            train, eval_docs, n=4, m_bits=4096, k_hashes=3
        ).collect()
    }
    assert set(bloom) == set(exact)
    for doc_id, contaminated in exact.items():
        if contaminated:
            assert bloom[doc_id], f"false negative on doc {doc_id}"
    # 1 eval doc / 4096 bits: false positives must be rare, not systemic
    fps = sum(1 for d, f in bloom.items() if f and not exact[d])
    assert fps <= 2

    plan = executed_plan(
        contamination_bloom(train, eval_docs, n=4, m_bits=4096, k_hashes=3)
    )
    assert "Exchange" not in plan, plan


def test_bloom_member_expr_matches_python_probe(spark):
    """Column-side probe == collected-bitmap python probe on every key,
    present or absent (identical md5 position math)."""
    from pyspark.sql import functions as F

    from affinity_spark.operators.sketches import (
        bloom_bitmap,
        bloom_member_expr,
        bloom_might_contain,
        bloom_words_dense,
    )

    keys = [f"doc-{i}" for i in range(60)]
    df = spark.createDataFrame([(k,) for k in keys[:30]], "k string")
    rows = [r.asDict() for r in bloom_bitmap(df, F.col("k"), 1024, 3).collect()]
    words = bloom_words_dense(rows, 1024)
    probe = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r.k: r.m
        for r in probe.select(
            "k", bloom_member_expr(F.col("k"), words, 1024, 3).alias("m")
        ).collect()
    }
    for k in keys:
        assert got[k] == bloom_might_contain(rows, k, 1024, 3), k
    assert all(got[k] for k in keys[:30])


def test_gopher_struct_values(spark):
    df = spark.createDataFrame(
        [(1, "aa bb aa aa"), (2, ""), (3, "abcd efgh")],
        "doc_id long, text string",
    )
    g = df.select("doc_id", gopher_rule_struct(F.col("text")).alias("g")).collect()
    by_id = {r.doc_id: r.g for r in g}
    # doc 1: 4 words, 8 chars -> mwl 200; 'aa' x3 of 4 -> 7500bp
    assert by_id[1].n_words == 4
    assert by_id[1].mean_word_len_x100 == 200
    assert by_id[1].top_token_bp == 7500
    # empty text: all zeros, no division error (ANSI mode)
    assert by_id[2].n_words == 0 and by_id[2].top_token_bp == 0
    assert by_id[3].mean_word_len_x100 == 400


def test_gopher_rep_struct_values(spark):
    from affinity_spark.functions.text import gopher_rep_struct

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),   # bigrams: ab ba ab ba -> m=4, d=2, top=2
            (2, "x y z"),       # bigrams: xy yz -> m=2, d=2, top=1
            (3, "solo"),        # no bigrams
            (4, ""),            # empty
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.g
        for r in df.select("doc_id", gopher_rep_struct(F.col("text")).alias("g")).collect()
    }
    assert (got[1].n_bigrams, got[1].top_bigram_bp, got[1].dup_bigram_bp) == (4, 5000, 5000)
    assert (got[2].n_bigrams, got[2].top_bigram_bp, got[2].dup_bigram_bp) == (2, 5000, 0)
    # degenerate docs: zero bigrams, no ANSI division error
    assert got[3].n_bigrams == 0 and got[3].dup_bigram_bp == 0
    assert got[4].n_bigrams == 0

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

"""Bigram LM scoring + DSIR importance weights: exact small-model checks."""

import hashlib

from pyspark.sql import functions as F

from affinity_spark.operators.lm import (
    doc_bigrams,
    dsir_weights,
    lm_score_bits,
    train_bigram_model,
)


def test_doc_bigrams_adjacent_pairs_only(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, "")], "doc_id long, text string"
    )
    got = {(r.doc_id, r.w1, r.w2) for r in doc_bigrams(df, ["doc_id"], "text").collect()}
    assert got == {(1, "a", "b"), (1, "b", "c")}


def test_lm_score_bits_hand_computed(spark):
    # Reference slice: "a b a b a c" → C2: (a,b)=2 (b,a)=2 (a,c)=1;
    # C1: a=3, b=2; V=2 (left vocab {a,b})
    ref = spark.createDataFrame([(0, "a b a b a c", "en")], "doc_id long, text string, lang string")
    model = train_bigram_model(ref.filter(F.col("lang") == "en"))
    # Score "a b a z": bigrams (a,b) (b,a) (a,z)
    #  (a,b): flog2(3+2) - flog2(2+1) = 2 - 1 = 1
    #  (b,a): flog2(2+2) - flog2(2+1) = 2 - 1 = 1
    #  (a,z): flog2(3+2) - flog2(0+1) = 2 - 0 = 2
    docs = spark.createDataFrame([(1, "a b a z")], "doc_id long, text string")
    row = lm_score_bits(docs, model).collect()[0]
    assert (row.n_bigrams, row.nll_bits, row.bits_per_bigram_x100) == (3, 4, 133)


def test_lm_unseen_context_costs_flog2_v(spark):
    ref = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    model = train_bigram_model(ref)
    # left vocab {a, b} → V=2; unseen context (z, z): flog2(0+2) - flog2(1) = 1
    docs = spark.createDataFrame([(1, "z z")], "doc_id long, text string")
    row = lm_score_bits(docs, model).collect()[0]
    assert (row.n_bigrams, row.nll_bits) == (1, 1)


def _bucket(tok: str, n: int = 1024) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n


def test_dsir_weights_hand_computed(spark):
    # target doc: "x x", non-target doc: "x y y y" (assume no bucket collision)
    assert _bucket("x") != _bucket("y")
    docs = spark.createDataFrame(
        [(1, "x x", "en"), (2, "x y y y", "de")], "doc_id long, text string, lang string"
    )
    rows = {r.doc_id: r for r in dsir_weights(docs, F.col("lang") == "en").collect()}
    # bucket(x): cs=3, ct=2 → bits = flog2(3) - flog2(4) = 1 - 2 = -1
    # bucket(y): cs=3, ct=0 → bits = flog2(1) - flog2(4) = 0 - 2 = -2
    assert (rows[1].n_tokens, rows[1].weight_bits) == (2, -2)
    assert (rows[2].n_tokens, rows[2].weight_bits) == (4, -7)
    # target doc ranks above the off-target doc per token
    assert rows[1].weight_bits * rows[2].n_tokens > rows[2].weight_bits * rows[1].n_tokens


def test_lm_models_are_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, "a b c d e", "en") for i in range(20)], "doc_id long, text string, lang string"
    )
    model = train_bigram_model(docs.filter(F.col("lang") == "en"))
    plan = lm_score_bits(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2  # c2 and c1 joins map-side

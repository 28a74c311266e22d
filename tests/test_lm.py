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


def _lg1024(x: int) -> int:
    e = x.bit_length() - 1
    return 1024 * e + ((x << 10) >> e) - 1024


def test_flog2_x1024_matches_python_reference(spark):
    from affinity_spark.operators.lm import flog2_x1024

    df = spark.range(1, 300).select(F.col("id").alias("x"))
    rows = df.select("x", flog2_x1024(F.col("x")).alias("lg")).collect()
    assert all(r.lg == _lg1024(r.x) for r in rows)
    # monotone and anchored at powers of two
    assert _lg1024(1) == 0 and _lg1024(2) == 1024 and _lg1024(4) == 2048


def test_nb_classifier_hand_computed(spark):
    from affinity_spark.operators.lm import nb_score_bits, train_nb_model

    # no bucket collisions among x/y/z (asserted, not assumed)
    assert len({_bucket(t) for t in "xyz"}) == 3
    train = spark.createDataFrame(
        [(1, "x x x", True), (2, "y y", False)],
        "doc_id long, text string, pos boolean",
    )
    model = train_nb_model(train, F.col("pos"))
    got = {(r.b, r.cp, r.cn) for r in model.collect()}
    assert got == {(_bucket("x"), 3, 0), (_bucket("y"), 0, 2)}

    # Np=3, Nn=2, B=1024 → prior = lg(1027) - lg(1026) = 1 (x1024 units)
    prior = _lg1024(1027) - _lg1024(1026)
    w_x = _lg1024(4) - _lg1024(1) - prior  # seen-positive token
    w_y = _lg1024(1) - _lg1024(3) - prior  # seen-negative token
    w_z = _lg1024(1) - _lg1024(1) - prior  # unseen token
    docs = spark.createDataFrame(
        [(10, "x x"), (11, "y z"), (12, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in nb_score_bits(docs, model).collect()}
    assert (rows[10].n_tokens, rows[10].score_x1024) == (2, 2 * w_x)
    assert rows[10].score_x1024 > 0  # positive verdict
    assert (rows[11].n_tokens, rows[11].score_x1024) == (2, w_y + w_z)
    assert rows[11].score_x1024 < 0  # negative verdict
    assert 12 not in rows  # zero tokens → no evidence, no verdict


def test_classifier_eval_confusion_and_ratios(spark):
    from affinity_spark.operators.lm import classifier_eval

    scored = spark.createDataFrame(
        [(True, 5), (True, -1), (False, 3), (False, -2), (False, -7), (True, 0)],
        "is_pos boolean, score_x1024 long",
    )
    row = classifier_eval(scored).collect()[0]
    # prediction is score > 0, so (True, 0) is a false negative
    assert (row.n_eval, row.tp, row.fp, row.fn, row.tn) == (6, 1, 1, 2, 2)
    assert (row.precision_bp, row.recall_bp) == (5000, 3333)
    assert row.f1_bp == 2 * 10000 // (2 + 1 + 2)


def test_classifier_eval_empty_class_is_zero_guarded(spark):
    from affinity_spark.operators.lm import classifier_eval

    scored = spark.createDataFrame(
        [(False, -3), (False, -1)], "is_pos boolean, score_x1024 long"
    )
    row = classifier_eval(scored).collect()[0]
    assert (row.tp, row.precision_bp, row.recall_bp, row.f1_bp) == (0, 0, 0, 0)


def test_nb_model_is_broadcast(spark):
    from affinity_spark.operators.lm import nb_score_bits, train_nb_model

    docs = spark.createDataFrame(
        [(i, "a b c d e", i % 2 == 0) for i in range(20)],
        "doc_id long, text string, pos boolean",
    )
    model = train_nb_model(docs, F.col("pos"))
    plan = (
        nb_score_bits(docs, model)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # model joined map-side
    assert "SortMergeJoin" not in plan


def test_lm_models_are_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, "a b c d e", "en") for i in range(20)], "doc_id long, text string, lang string"
    )
    model = train_bigram_model(docs.filter(F.col("lang") == "en"))
    plan = lm_score_bits(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2  # c2 and c1 joins map-side

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


def _kn_python(corpus_bigrams, doc_bigrams_list, d=3):
    """Pure-python replay of kn_score_bits' integer formula."""
    from collections import Counter

    c2 = Counter(corpus_bigrams)
    c1, n1f, np_ = Counter(), Counter(), Counter()
    for (w1, w2), c in c2.items():
        c1[w1] += c
        n1f[w1] += 1
        np_[w2] += 1
    t_, v_ = len(c2), len({w2 for _, w2 in c2})
    tv = t_ + v_
    total = 0
    for w1, w2 in doc_bigrams_list:
        npl = np_.get(w2, 0) + 1
        if w1 in c1:
            num = max(4 * c2.get((w1, w2), 0) - d, 0) * tv + d * n1f[w1] * npl
            den = 4 * c1[w1] * tv
        else:
            num, den = npl, tv
        assert 0 < num <= den
        total += _lg1024(den) - _lg1024(num)
    return total


def test_kn_score_bits_matches_python_reference(spark):
    """kn_score_bits' integer KN formula must equal a pure-python replay
    bigram-for-bigram (exact fixed-point arithmetic, no float anywhere),
    across seen pairs, seen-context/unseen-word, and unseen-context."""
    from affinity_spark.operators.lm import kn_score_bits

    ref_text = "a b a b a c b c a b"
    ref = spark.createDataFrame(
        [(0, ref_text, "en")], "doc_id long, text string, lang string"
    )
    model = train_bigram_model(ref.filter(F.col("lang") == "en"))
    doc_text = "a b c a z b a q q"
    docs = spark.createDataFrame([(1, doc_text)], "doc_id long, text string")
    row = kn_score_bits(docs, model).collect()[0]

    toks = ref_text.split()
    corpus_bg = list(zip(toks, toks[1:]))
    dt = doc_text.split()
    doc_bg = list(zip(dt, dt[1:]))
    expect = _kn_python(corpus_bg, doc_bg)
    assert (row.n_bigrams, row.nll_kn_x1024) == (len(doc_bg), expect)
    assert row.bits_per_bigram_x100 == expect * 100 // (len(doc_bg) * 1024)


def test_kn_probabilities_sum_to_one(spark):
    """The integer KN construction must be a true probability model:
    summing NUM/DEN over the full right vocabulary for a seen context
    gives exactly 1 (the interpolation identity sum(N1+(.w2))=T makes the
    quarters cancel) — the property add-k smoothing only approximates."""
    from collections import Counter
    from fractions import Fraction

    toks = "a b a b a c b c a b b a".split()
    c2 = Counter(zip(toks, toks[1:]))
    c1, n1f, np_ = Counter(), Counter(), Counter()
    for (w1, w2), c in c2.items():
        c1[w1] += c
        n1f[w1] += 1
        np_[w2] += 1
    t_ = len(c2)
    vocab = {w2 for _, w2 in c2}
    tv = t_ + len(vocab)
    for w1 in c1:
        s = Fraction(0)
        for w2 in vocab:
            num = max(4 * c2.get((w1, w2), 0) - 3, 0) * tv + 3 * n1f[w1] * (
                np_.get(w2, 0) + 1
            )
            s += Fraction(num, 4 * c1[w1] * tv)
        assert s == 1, (w1, s)


def test_kn_orders_fluent_below_garbage_like_addk(spark):
    """Perplexity-ordering sanity vs the add-k baseline: on docs scored
    against a reference model, a fluent doc (reference-distribution text)
    must score fewer bits-per-bigram than an out-of-domain doc under BOTH
    models, and the two models must agree on the full quality ordering of
    the three-tier fixture (fluent < mixed < garbage)."""
    from affinity_spark.operators.lm import kn_score_bits

    ref = spark.createDataFrame(
        [(0, "the cat sat on the mat and the dog sat on the rug "
             "the cat ran to the dog and the dog ran to the mat", "en")],
        "doc_id long, text string, lang string",
    )
    model = train_bigram_model(ref.filter(F.col("lang") == "en"))
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog ran to the rug"),  # fluent
            (2, "the cat zzz qqq on the mat xxx yyy dog"),             # mixed
            (3, "zzz qqq xxx yyy www vvv uuu ttt sss rrr"),            # garbage
        ],
        "doc_id long, text string",
    )
    kn = {r.doc_id: r.bits_per_bigram_x100 for r in kn_score_bits(docs, model).collect()}
    addk = {r.doc_id: r.bits_per_bigram_x100 for r in lm_score_bits(docs, model).collect()}
    assert kn[1] < kn[2] < kn[3], kn
    assert addk[1] < addk[2] < addk[3], addk


def test_perplexity_buckets_cutoff_semantics(spark):
    """Histogram-cutoff tertiles: c1/c2 are the smallest scores whose
    cumulative count reaches ceil(n/3)/ceil(2n/3); boundary ties share a
    bucket (deterministic, unlike ntile); groups are independent."""
    from affinity_spark.operators.lm import perplexity_buckets

    rows = [
        # lang en: scores 10,20,20,30,40,50 (n=6; ceil(2)=2 -> c1=20
        # because cum(10)=1 < 2, cum(20)=3 >= 2; c2: cum >= 4 -> 30)
        (1, "en", 10), (2, "en", 20), (3, "en", 20),
        (4, "en", 30), (5, "en", 40), (6, "en", 50),
        # lang de: all equal scores -> everything is head
        (7, "de", 99), (8, "de", 99), (9, "de", 99),
    ]
    scored = spark.createDataFrame(
        rows, "doc_id long, lang string, bits_per_bigram_x100 long"
    )
    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(scored).collect()
    }
    assert got == {
        1: "head", 2: "head", 3: "head",  # ties at c1=20 stay together
        4: "middle", 5: "tail", 6: "tail",
        7: "head", 8: "head", 9: "head",
    }


def test_per_group_kn_reduces_to_single_model_on_one_group(spark):
    """kn_score_bits_per_group with a single language == kn_score_bits
    with the model trained on that slice — the grouped variant is the
    same exact-integer math with join keys grown by the group column."""
    from affinity_spark.operators.lm import (
        kn_score_bits,
        kn_score_bits_per_group,
        train_bigram_model,
        train_bigram_models_per_group,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {w} beta alpha", "en")
         for i, w in enumerate(["delta", "beta", "epsilon", "alpha"])],
        "doc_id long, text string, lang string",
    )
    single = kn_score_bits(docs, train_bigram_model(docs))
    grouped = kn_score_bits_per_group(
        docs, train_bigram_models_per_group(docs)
    ).drop("lang")
    s = {tuple(r) for r in single.collect()}
    g = {tuple(r) for r in grouped.collect()}
    assert s == g


def test_per_group_kn_scores_each_doc_against_its_own_model(spark):
    """A document fluent in ITS language scores low against its own
    model even when the other language's model would score it as noise —
    the reason CCNet trains per-language models."""
    from affinity_spark.operators.lm import (
        kn_score_bits,
        kn_score_bits_per_group,
        train_bigram_model,
        train_bigram_models_per_group,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat the cat sat", "en"),
         (2, "le chat dort sur le tapis le chat dort", "fr"),
         (3, "the cat sat on the mat again", "en"),
         (4, "le chat dort sur le tapis encore", "fr")],
        "doc_id long, text string, lang string",
    )
    grouped = {
        r["doc_id"]: r["bits_per_bigram_x100"]
        for r in kn_score_bits_per_group(
            docs, train_bigram_models_per_group(docs)
        ).collect()
    }
    # against the en-only model, the fr docs read as noise
    en_model = train_bigram_model(docs.filter(F.col("lang") == "en"))
    cross = {
        r["doc_id"]: r["bits_per_bigram_x100"]
        for r in kn_score_bits(docs, en_model).collect()
    }
    assert grouped[2] < cross[2] and grouped[4] < cross[4]

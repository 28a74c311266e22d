"""Unigram-LM (SentencePiece-style) tokenizer: exact Viterbi kernel,
tie-break contract, UNK fallback, vocab determinism, and Spark==python
agreement (operators/unigram.py; public algorithm per Kudo 2018)."""

from pyspark.sql import functions as F

from affinity_spark.operators.unigram import (
    UNK_COST_X1024,
    train_unigram_vocab,
    viterbi_segment,
    viterbi_segment_words,
)


def test_viterbi_picks_min_cost_segmentation():
    costs = {"ab": 10, "a": 8, "b": 8, "abc": 100, "c": 5}
    # 'abc': ab|c = 15 beats a|b|c = 21 and abc = 100
    assert viterbi_segment("abc", costs) == (2, 15, ["ab", "c"])


def test_viterbi_tie_breaks_toward_longest_piece():
    costs = {"a": 5, "aa": 10}
    # 'aa': a|a = 10 == aa = 10 -> the LONGEST final piece wins
    assert viterbi_segment("aa", costs) == (1, 10, ["aa"])


def test_viterbi_unknown_chars_cost_unk():
    costs = {"a": 5}
    n, c, s = viterbi_segment("axa", costs)
    assert (n, s) == (3, ["a", "x", "a"])
    assert c == 10 + UNK_COST_X1024


def test_viterbi_empty_word():
    assert viterbi_segment("", {"a": 1}) == (0, 0, [])


def test_train_vocab_is_deterministic_topk(spark):
    docs = spark.createDataFrame(
        [(1, "aaa bb aaa"), (2, "bb aaa")], "doc_id long, text string"
    )
    v1 = {
        (r["piece"], r["cost_x1024"])
        for r in train_unigram_vocab(docs, max_pieces=4).collect()
    }
    v2 = {
        (r["piece"], r["cost_x1024"])
        for r in train_unigram_vocab(docs, max_pieces=4).collect()
    }
    assert v1 == v2 and len(v1) == 4
    # frequency order: 'a' appears 9 times (3 per 'aaa' x 3 occurrences)
    pieces = dict(v1)
    assert "a" in pieces
    # more frequent pieces cost less
    costs = {r["piece"]: r["cost_x1024"] for r in
             train_unigram_vocab(docs, max_pieces=8).collect()}
    assert costs["a"] < costs["bb"]


def test_train_vocab_weights_types_by_occurrence_count(spark):
    """The word-type-level explode must weight each type's substrings by
    its occurrence count: piece counts (and therefore costs) are
    bit-identical to per-occurrence enumeration. 'aaa' x3 vs 'bb' x1:
    'a' counts 9 (3 within-word positions x 3 occurrences — within-word
    multiplicity AND cross-occurrence weight), 'b' counts 2."""
    docs = spark.createDataFrame(
        [(1, "aaa bb aaa"), (2, "aaa")], "doc_id long, text string"
    )
    from collections import Counter

    toks = ["aaa", "bb", "aaa", "aaa"]
    expected = Counter()
    for t in toks:
        for i in range(len(t)):
            for j in range(1, min(4, len(t) - i) + 1):
                expected[t[i : i + j]] += 1
    vocab = {
        r["piece"]: r["cost_x1024"]
        for r in train_unigram_vocab(docs, max_pieces=16).collect()
    }
    total = sum(expected.values())
    from affinity_spark.operators.lm import flog2_x1024

    lg = (
        spark.range(1)
        .select(
            *[
                (
                    flog2_x1024(F.lit(total + 16))
                    - flog2_x1024(F.lit(expected[p] + 1))
                ).alias(p)
                for p in expected
            ]
        )
        .collect()[0]
        .asDict()
    )
    assert vocab == lg


def test_spark_segmentation_matches_python_kernel(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alphabet bet a"), (2, "beta beta alpha")],
        "doc_id long, text string",
    )
    vocab = train_unigram_vocab(docs, max_pieces=16)
    costs = {r["piece"]: int(r["cost_x1024"]) for r in vocab.collect()}
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    ).distinct()
    got = {
        r["word"]: (r["n_pieces"], r["cost_x1024"], r["segmentation"])
        for r in viterbi_segment_words(words, vocab).collect()
    }
    for w in ["alpha", "beta", "alphabet", "bet", "a"]:
        n, c, segs = viterbi_segment(w, costs)
        assert got[w] == (n, c, "|".join(segs))


def test_hard_em_reweights_by_usage(spark):
    """One hard-EM round: a piece that WINS segmentations gets cheaper
    relative to overlapping pieces the Viterbi stopped using (substring
    seeding over-counts overlaps; usage counts each character once), and
    the vocabulary stays fixed (same piece set, new costs)."""
    from affinity_spark.operators.unigram import (
        reestimate_costs,
        train_unigram_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "abab abab abab cd")], "doc_id long, text string"
    )
    v0 = train_unigram_vocab(docs, max_pieces=16)
    v1 = reestimate_costs(docs, v0)
    p0 = {r["piece"]: r["cost_x1024"] for r in v0.collect()}
    p1 = {r["piece"]: r["cost_x1024"] for r in v1.collect()}
    assert set(p0) == set(p1)  # fixed vocabulary, re-weighted
    # 'abab' segments as one piece; its parts 'a'/'b'/'ab' fall out of
    # use and must now cost at least as much as the winner
    assert p1["abab"] < p1["ab"]
    assert p1["abab"] <= min(p1["a"], p1["b"])
    # python twin agreement: costs dict from round-1 vocab re-segments
    # identically through the Spark UDF path
    from affinity_spark.operators.unigram import (
        viterbi_segment,
        viterbi_segment_words,
    )

    words = docs.select(F.explode(F.split("text", " ")).alias("word")).distinct()
    got = {
        r["word"]: (r["n_pieces"], r["cost_x1024"], r["segmentation"])
        for r in viterbi_segment_words(words, v1).collect()
    }
    for w in ["abab", "cd"]:
        n, c, segs = viterbi_segment(w, p1)
        assert got[w] == (n, c, "|".join(segs))


def test_sampled_vocab_is_deterministic_and_scales_counts(spark):
    """sample_mod harvests the seed vocabulary from a content-derived
    1/N occurrence sample: deterministic across runs (pure function of
    the data, not of partitioning) and non-empty on a realistic mod."""
    from affinity_spark.operators.unigram import train_unigram_vocab

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(40)],
        "doc_id long, text string",
    )
    v1 = {(r["piece"], r["cost_x1024"])
          for r in train_unigram_vocab(docs, max_pieces=16, sample_mod=3).collect()}
    v2 = {(r["piece"], r["cost_x1024"])
          for r in train_unigram_vocab(
              docs.repartition(7), max_pieces=16, sample_mod=3).collect()}
    assert v1 == v2 and len(v1) == 16


def test_pexp20_contract():
    """Deterministic fixed-point 2^(-c/1024): exact at block boundaries,
    monotone non-increasing, floor-clamped to 1 for huge costs (UNK)."""
    from affinity_spark.operators.unigram import pexp20

    assert pexp20(0) == 1 << 20
    assert pexp20(1024) == 1 << 19
    assert pexp20(2048) == 1 << 18
    prev = pexp20(0)
    for c in range(0, 8192, 64):
        cur = pexp20(c)
        assert cur <= prev
        prev = cur
    assert pexp20(UNK_COST_X1024) == 1  # clamped, never zero


def test_soft_counts_posterior_mass():
    """Forward-backward expected counts: a forced piece carries ~full
    posterior (1024 in x1024 units), ambiguous spans split mass across
    alternatives, and per-position total mass of vocab pieces covering
    any position is <= ~1024 (it IS a posterior)."""
    from affinity_spark.operators.unigram import soft_piece_counts

    costs = {"ab": 3000, "a": 4000, "b": 4100, "cd": 3500, "c": 4200,
             "d": 4300}
    e = dict(soft_piece_counts("cd", costs))
    # 'cd' vs 'c'+'d': both segmentations exist; mass splits, cd favored
    assert e["cd"] > e["c"] and e["cd"] > e["d"]
    assert abs(e["cd"] + e["c"] - 1024) <= 8  # position 0 coverage ~ 1
    # a word with a single segmentation: posterior ~= 1 for each piece
    e2 = dict(soft_piece_counts("x", {"x": 3000}))
    assert abs(e2["x"] - 1024) <= 2
    # all-UNK word: nothing to re-estimate, lattice still sums (no crash)
    assert soft_piece_counts("qz", {"ab": 3000}) == []


def test_soft_counts_vs_hard_viterbi_credit():
    """The divergence soft EM exists to fix: a piece used only by the
    SECOND-best segmentation gets zero hard-EM usage but nonzero soft
    expected count."""
    from affinity_spark.operators.unigram import (
        soft_piece_counts,
        viterbi_segment,
    )

    # 'abc' best = 'ab'+'c' (7100); alternative 'a'+'bc' (7200)
    costs = {"ab": 3000, "c": 4100, "a": 3100, "bc": 4100, "b": 5000}
    _, _, segs = viterbi_segment("abc", costs)
    assert segs == ["ab", "c"]  # hard EM credits only these
    e = dict(soft_piece_counts("abc", costs))
    assert e.get("bc", 0) > 0 and e.get("a", 0) > 0  # soft credits both
    assert e["ab"] > e["bc"]  # ...proportionally to probability


def test_spark_soft_usage_matches_python_kernel(spark):
    """The distributed E-step (pandas UDF over word types) reproduces the
    python kernel bit-for-bit, occurrence weights included."""
    from affinity_spark.operators.unigram import (
        expected_usage_words,
        soft_piece_counts,
        train_unigram_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "abab abab cdcd ab"), (2, "abab cd xyz")],
        "doc_id long, text string",
    )
    vocab = train_unigram_vocab(docs, max_pieces=12)
    costs = {r["piece"]: r["cost_x1024"] for r in vocab.collect()}
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )
    got = {
        (r["word"], r["piece"]): r["e_x1024"]
        for r in expected_usage_words(words, vocab).collect()
    }
    want = {}
    for w, wc in [(r["word"], r["wc"]) for r in words.collect()]:
        for piece, e in soft_piece_counts(w, costs):
            want[(w, piece)] = e
    assert got == want


def test_soft_em_round_is_deterministic_and_fixed_vocab(spark):
    """reestimate_costs_soft: same piece set, new costs, identical on
    repeat evaluation (pure integer pipeline)."""
    from affinity_spark.operators.unigram import (
        reestimate_costs_soft,
        train_unigram_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "abab abab abab cd")], "doc_id long, text string"
    )
    v0 = train_unigram_vocab(docs, max_pieces=16)
    r1 = {r["piece"]: r["cost_x1024"]
          for r in reestimate_costs_soft(docs, v0).collect()}
    r2 = {r["piece"]: r["cost_x1024"]
          for r in reestimate_costs_soft(docs, v0).collect()}
    assert r1 == r2
    assert set(r1) == {r["piece"] for r in v0.collect()}
    # the dominant whole-word piece still wins after soft re-weighting
    assert r1["abab"] < r1["ab"]


def test_pexp20_duckdb_replay_is_bit_exact():
    """The oracle's SQL replay of pexp20 must agree with the python
    kernel on every cost — property-checked across the whole domain the
    lattice can produce (0 .. word_len * UNK)."""
    import duckdb

    from affinity_spark.operators.unigram import pexp20
    from affinity_spark.registry.quality import _pexp

    con = duckdb.connect()
    cases = (
        list(range(0, 4096, 37))
        + [1023, 1024, 1025, 2047, 2048, 1 << 19, 1 << 20, 40 * (1 << 20)]
        + [(i * 2654435761) % (50 << 20) for i in range(200)]
    )
    rows = con.sql(
        "SELECT c, " + _pexp("c") + " AS v FROM (SELECT unnest($cases) AS c)",
        params={"cases": cases},
    ).fetchall()
    for c, v in rows:
        assert v == pexp20(c), (c, v, pexp20(c))

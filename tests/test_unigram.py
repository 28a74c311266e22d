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
    assert viterbi_segment("abc", costs) == (2, 15, "ab|c")


def test_viterbi_tie_breaks_toward_longest_piece():
    costs = {"a": 5, "aa": 10}
    # 'aa': a|a = 10 == aa = 10 -> the LONGEST final piece wins
    assert viterbi_segment("aa", costs) == (1, 10, "aa")


def test_viterbi_unknown_chars_cost_unk():
    costs = {"a": 5}
    n, c, s = viterbi_segment("axa", costs)
    assert (n, s) == (3, "a|x|a")
    assert c == 10 + UNK_COST_X1024


def test_viterbi_empty_word():
    assert viterbi_segment("", {"a": 1}) == (0, 0, "")


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
        assert got[w] == viterbi_segment(w, costs)

"""Positional inverted index + phrase lookup."""

from pyspark.sql import functions as F

from affinity_spark.functions.text import tokenize
from affinity_spark.operators.index import build_positional_index, phrase_lookup


def _pidx(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return build_positional_index(df, ["doc_id"], tokenize(F.col("text")))


def test_positional_index_positions_are_zero_based(spark):
    pidx = _pidx(spark, [(1, "A b  a")])
    got = {(r.term, r.pos) for r in pidx.collect()}
    assert got == {("a", 0), ("b", 1), ("a", 2)}


def test_phrase_lookup_literal_terms(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "quick brown quick brown fox"),
        (3, "brown quick"),           # reversed — no match
        (4, "quick x brown"),         # gap — no match
    ]
    res = {
        r.doc_id: r.n_matches
        for r in phrase_lookup(
            _pidx(spark, rows), ["quick", "brown"], ["doc_id"]
        ).collect()
    }
    assert res == {1: 1, 2: 2}


def test_phrase_lookup_three_terms_and_overlap(spark):
    rows = [(1, "a a a a"), (2, "a a b"), (3, "b a a a")]
    res = {
        r.doc_id: r.n_matches
        for r in phrase_lookup(_pidx(spark, rows), ["a", "a", "a"], ["doc_id"]).collect()
    }
    # overlapping starts count: "a a a a" has starts at 0 and 1
    assert res == {1: 2, 3: 1}


def test_phrase_lookup_dataframe_terms_is_broadcast(spark):
    rows = [(1, "x y z"), (2, "y z x")]
    terms = spark.createDataFrame([("y", "z")], "term_0 string, term_1 string")
    res = phrase_lookup(_pidx(spark, rows), terms, ["doc_id"])
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert {(r.doc_id, r.n_matches) for r in res.collect()} == {(1, 1), (2, 1)}

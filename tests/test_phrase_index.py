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


def test_proximity_lookup_counts_and_order_invariance(spark):
    """NEAR/k matching from the positional index: pairs within the gap in
    EITHER order count; same-position self-pairs never do; out-of-gap
    co-occurrence is excluded."""
    from pyspark.sql import functions as F

    from affinity_spark.operators.index import build_positional_index, proximity_lookup
    from affinity_spark.functions.text import tokenize

    docs = spark.createDataFrame(
        [
            (1, "alpha x beta"),              # gap 2 -> match
            (2, "beta x x x x x alpha"),      # gap 6, reversed -> no match at 5
            (3, "alpha beta alpha"),          # two pairs within gap
            (4, "alpha only here"),           # single term -> no pair
        ],
        ["doc_id", "text"],
    )
    pidx = build_positional_index(docs, ["doc_id"], tokenize(F.col("text")))
    got = {
        r.doc_id: r.n_near
        for r in proximity_lookup(pidx, "alpha", "beta", 5, ["doc_id"]).collect()
    }
    assert got == {1: 1, 3: 2}

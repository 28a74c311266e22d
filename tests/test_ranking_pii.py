"""Unit tests for the PII scrub and BM25 ranking operators."""

import pytest
from pyspark.sql import functions as F

from affinity_spark.operators.pii import PII_PATTERNS, pii_counts, scrub_text
from affinity_spark.operators.ranking import bm25_topk


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (1, "mail me at alice.smith+x@sub.example.org or bob@ex.co today"),
        (2, "server 192.168.0.1 and 10.0.300.7 replied"),
        (3, "call 555-123-4567 x999"),
        (4, "nothing sensitive here"),
        (5, "a@b.io from 8.8.8.8 dial 111-222-3333"),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_pii_counts_per_class(pii_df):
    counts = pii_counts(F.col("text"))
    got = {
        r["id"]: (r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in pii_df.select("id", *[c.alias(n) for n, c in counts.items()]).collect()
    }
    assert got[1] == (2, 0, 0)
    # 10.0.300.7 still matches \d{1,3} quads (300 is three digits) — the
    # pattern is a detector, not a validator, same trade the oracle makes.
    assert got[2] == (0, 2, 0)
    assert got[3] == (0, 0, 1)
    assert got[4] == (0, 0, 0)
    assert got[5] == (1, 1, 1)


def test_scrub_masks_all_classes_and_is_idempotent(pii_df):
    once = pii_df.select("id", scrub_text(F.col("text")).alias("m"))
    twice = once.select("id", scrub_text(F.col("m")).alias("m"))
    m1 = {r["id"]: r["m"] for r in once.collect()}
    m2 = {r["id"]: r["m"] for r in twice.collect()}
    assert m1[5] == "<EMAIL> from <IP> dial <PHONE>"
    assert "alice" not in m1[1] and m1[1].count("<EMAIL>") == 2
    assert m1 == m2  # placeholders contain no PII shapes
    for _, _, token in PII_PATTERNS:
        assert token not in m1[4]


def test_bm25_ranks_higher_tf_and_rarer_terms_first(spark):
    rows = [
        (1, "x x x x x x x x"),               # no query terms
        (2, "vector x x x x x x x"),          # tf=1 common-ish term
        (3, "vector vector vector x x x x x"),  # tf=3 → saturating gain
        (4, "rareterm x x x x x x x"),
        (5, "vector rareterm x x x x x x"),   # two terms beats one
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = bm25_topk(docs, "doc_id", "text", ["vector", "rareterm"], k=10).collect()
    ids = [r["doc_id"] for r in got]
    scores = {r["doc_id"]: r["score_x1e6"] for r in got}
    assert 1 not in ids  # zero-score rows filtered
    assert ids[0] == 5  # both terms
    assert scores[3] > scores[2]  # higher tf, same term
    # rareterm (df=2) outweighs vector (df=3) at equal tf
    assert scores[4] > scores[2]


def test_bm25_plan_has_no_explode_and_broadcasts_stats(spark):
    rows = [(i, "vector stream x y z") for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    df = bm25_topk(docs, "doc_id", "text", ["vector", "stream"], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # tf via array filter, never explode
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_rrf_fuse_semantics_and_tiebreak(spark):
    """RRF contract: score = Σ 1e6 div (c + rank); a doc ranked mid-list
    in BOTH lists outranks either list's sole #1; absent ranks emit 0 and
    contribute 0; ties break on doc_id."""
    from affinity_spark.operators.ranking import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank int"
    )
    vec = spark.createDataFrame(
        [(20, 1), (11, 2), (21, 3)], "doc_id long, rank int"
    )
    rows = rrf_fuse([("bm25", lex), ("cos", vec)], k=10, c=60).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # doc 11 (rank 2 in both) beats both singleton #1s
    assert rows[0]["doc_id"] == 11
    assert by_id[11]["rrf_x1e6"] == 2 * (1000000 // 62)
    assert by_id[10]["rrf_x1e6"] == 1000000 // 61
    assert by_id[10]["cos_rank"] == 0 and by_id[20]["bm25_rank"] == 0
    # equal-score singles (10 vs 20 both rank-1 in one list) tie-break by id
    order = [r["doc_id"] for r in rows]
    assert order.index(10) < order.index(20)


def test_rrf_fuse_three_lists_and_k_cut(spark):
    from affinity_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame([(i, i) for i in range(1, 6)], "doc_id long, rank int")
    b = spark.createDataFrame([(i, 6 - i) for i in range(1, 6)], "doc_id long, rank int")
    c = spark.createDataFrame([(99, 1)], "doc_id long, rank int")
    rows = rrf_fuse([("x", a), ("y", b), ("z", c)], k=3, c=60).collect()
    assert len(rows) == 3
    assert {"x_rank", "y_rank", "z_rank"} <= set(rows[0].asDict())
    # doc 99: only list z → exactly one contribution
    got99 = [r for r in rows if r["doc_id"] == 99]
    if got99:
        assert got99[0]["rrf_x1e6"] == 1000000 // 61

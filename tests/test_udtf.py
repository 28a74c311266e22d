"""Python UDTF surface (§2.12): real @udtf table function via SQL LATERAL."""

from __future__ import annotations

from affinity_spark.functions.udtf_text import register_udtfs, split_sentences


def test_sentence_split_lateral(spark):
    df = spark.createDataFrame(
        [(1, "Hello world. How are you? Fine thanks"), (2, "One sentence")],
        "doc_id long, text string",
    )
    got = split_sentences(spark, df)
    rows = [(r.doc_id, r.sent_idx, r.sentence, r.n_words) for r in got.collect()]
    assert (1, 0, "Hello world", 2) in rows
    assert (1, 1, "How are you", 3) in rows
    assert (1, 2, "Fine thanks", 2) in rows
    assert (2, 0, "One sentence", 2) in rows
    assert len([r for r in rows if r[0] == 1]) == 3


def test_udtf_sql_registration(spark):
    register_udtfs(spark)
    got = spark.sql(
        "SELECT sent_idx, n_words FROM LATERAL sentence_split('A b c. D e')"
    ).collect()
    assert [(r.sent_idx, r.n_words) for r in got] == [(0, 3), (1, 2)]


def test_udtf_null_text_yields_no_rows(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert split_sentences(spark, df).count() == 0

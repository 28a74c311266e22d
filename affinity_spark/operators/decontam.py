"""Benchmark decontamination: drop/flag training documents that overlap an
evaluation set by word n-grams.

The standard training-corpus hygiene op (the GPT-3 / Pile papers use 13-gram
overlap): any training document sharing an n-gram with the held-out
benchmark set is contaminated and must be flagged before training. The
reference engine has no training layer; the op composes this repo's
shingling (``operators/dedup.word_ngrams``) with the scale-correct join
shape.

100 TB shape: the eval set is SMALL by definition (benchmarks are
thousands of documents, the corpus is billions), so its distinct gram set
broadcasts — the contamination check is a map-side broadcast semi-join per
training partition, zero shuffle over the corpus. The only shuffled data
is the matched (doc, gram) hits — bounded by actual contamination, which
is tiny or the corpus is garbage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from affinity_spark.operators.dedup import word_ngrams


def contamination_hits(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per training doc: how many of its distinct word n-grams appear
    anywhere in the eval set, plus the contaminated flag. Every training
    row appears in the output (0 hits = clean) so the result doubles as a
    filter input (``.filter(~F.col("contaminated"))``)."""
    grams = word_ngrams(F.col(text_col), n)
    eval_grams = (
        eval_docs.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    hits = (
        train.select(F.col(id_col), F.explode(grams).alias("gram"))
        .join(F.broadcast(eval_grams), "gram")
        # word_ngrams is distinct per doc, so count(*) counts distinct grams
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0))
            .cast("long")
            .alias("n_contaminated_grams"),
            (F.coalesce(F.col("n_contaminated_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )

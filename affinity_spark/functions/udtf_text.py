"""Python UDTFs (table functions) for text processing — §2.12 surface.

The reference's analyzers produce multiple index records per input record
(e.g. the word tokenizer behind the secondary index,
core/.../state/KVStoreIndex analyzers); Spark's native shape for
one-row-to-many-rows Python logic is the UDTF (``@udtf``), registered and
callable from SQL with ``LATERAL``. The explode-shaped extractors in
``operators/index.py`` stay the JVM fast path; this module demonstrates the
actual UDTF API for logic that genuinely needs per-row Python (stateful
tokenizers, model-backed sentence splitters).

UDTF rows stream back through Arrow (``useArrow=True``) — still per-row
Python underneath, so at 100 TB this remains the slow path reserved for
logic built-ins can't express; everything here has a built-in twin used by
the oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="sent_idx int, sentence string, n_words int", useArrow=True)
class SentenceSplit:
    """(text) -> one row per sentence with its index and word count.

    Sentence boundary = run of ``.!?`` followed by whitespace — a stand-in
    for a model-backed splitter; the UDTF shape (arbitrary rows out per row
    in, optional per-partition state in ``__init__``) is the point.
    """

    def eval(self, text: str):  # noqa: D401
        if text is None:
            return
        import re

        parts = [p.strip() for p in re.split(r"[.!?]+\s+|[.!?]+$", text)]
        idx = 0
        for p in parts:
            if not p:
                continue
            yield idx, p, len(p.split())
            idx += 1


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``SELECT ... FROM tbl, LATERAL
    sentence_split(text)``)."""
    spark.udtf.register("sentence_split", SentenceSplit)


def split_sentences(spark, df, text_col: str = "text"):
    """DataFrame-API entry: LATERAL-join the UDTF against ``df``."""
    register_udtfs(spark)
    df.createOrReplaceTempView("_udtf_in")
    return spark.sql(
        f"SELECT * FROM _udtf_in, LATERAL sentence_split({text_col})"
    )

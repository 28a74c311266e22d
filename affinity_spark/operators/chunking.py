"""Overlapping token-window chunking (retrieval / context-prep surface).

Splits each document into fixed-size token windows with a configurable
overlap — the chunking step every retrieval-augmented pipeline runs before
embedding, and the long-document splitter a training pipeline uses when a
document exceeds the context window but should not be truncated.

Reference analogue: the reference engine exposes record-splitting only
through its stream transformations (``core/src/main/scala/io/amient/affinity/
core/actor/Routed.scala`` routes whole records); chunking documents into
overlapping windows is part of the §2.13 training-pipeline extension, not a
reference operator.

Scale design: the whole operator is a map-side projection + ``posexplode`` —
ZERO shuffles. Chunk boundaries are a pure function of the document's own
token count (no global numbering), so the op parallelizes embarrassingly and
re-runs land identical chunk ids. Fan-out is bounded by
``ceil(n_tokens / stride)`` per document; at 100 TB the output is written
partitioned by the same file layout as the input scan, never collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from affinity_spark.functions.text import _int_div, let_bound, tokenize


def chunk_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Chunk ``i`` (0-based) covers tokens ``[i*stride, i*stride + chunk_size)``
    with ``stride = chunk_size - overlap``; the last chunk may be short
    (slice clamps at the document end) and every token belongs to at least
    one chunk. ``n_chunks = max(ceil((n - overlap) / stride), 1)`` so a
    document at most ``chunk_size`` tokens long yields exactly one chunk.

    Returns one row per chunk: ``(id, chunk_idx, chunk_tokens, chunk_md5)``
    where ``chunk_md5`` is the md5 of the space-joined chunk text —
    md5-derived (not Spark ``hash``) so any engine reproduces the chunk
    fingerprint bit-for-bit, making the chunk table joinable across systems.
    Documents with zero tokens are dropped (nothing to chunk).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap

    toks_expr = tokenize(F.col(text_col))

    def chunks_of(toks: Column) -> Column:
        n = F.size(toks).cast("long")
        n_chunks = F.greatest(
            _int_div(n - F.lit(overlap) + F.lit(stride - 1), F.lit(stride)),
            F.lit(1).cast("long"),
        )

        def one_chunk(i: Column) -> Column:
            piece = F.slice(toks, (i * stride + 1).cast("int"), chunk_size)
            return F.struct(
                F.size(piece).cast("long").alias("chunk_tokens"),
                F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
            )

        return F.transform(F.sequence(F.lit(0), (n_chunks - 1).cast("int")), one_chunk)

    # ONE tokenize per row (let-bound); empty chunks can only come from
    # zero-token documents (the last chunk of any non-empty doc starts at
    # (n_chunks-1)*stride < n), so the post-explode size filter is exactly
    # the drop-empty-docs rule without a second tokenize evaluation.
    chunked = docs.select(
        F.col(id_col),
        let_bound(toks_expr, chunks_of).alias("_chunks"),
    )

    return (
        chunked.select(
            id_col,
            F.posexplode("_chunks").alias("chunk_idx", "_c"),
        )
        .where(F.col("_c.chunk_tokens") > 0)
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("_c.chunk_tokens").alias("chunk_tokens"),
            F.col("_c.chunk_md5").alias("chunk_md5"),
        )
    )

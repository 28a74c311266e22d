"""Unigram-LM (SentencePiece-style) subword tokenization.

The second of the two tokenizer families real pipelines train (Kudo 2018,
public; ``operators/bpe.py`` is the merge-based first): a vocabulary of
subword pieces with unigram costs, applied by VITERBI — each word is
segmented into the piece sequence of minimum total cost. This module
implements the deterministic, oracle-checkable core:

- :func:`train_unigram_vocab` — a substring-frequency seed vocabulary
  (the initialization step of the full EM trainer): token-occurrence-
  weighted counts of every piece of length 1..L, top-K selected
  distributed (TakeOrderedAndProject — the BPE ``max_word_types``
  contract: the driver never sees more than K rows), costs as exact
  integer 1/1024-bit log2 so both engines reproduce them bit-for-bit.
  Full EM (E: expected piece counts under the current model; M:
  re-estimate + prune) composes on top by re-scoring — each round is the
  same train/apply shapes — and is deliberately out of scope here, as
  float EM cannot be oracle-exact.
- :func:`viterbi_segment_words` — exact DP over DISTINCT words (type-
  level work: the corpus never flows through Python; a trillion-token
  corpus has a bounded word-type vocabulary), Arrow-batched pandas UDF
  (inherently sequential per-word DP — the FFD-packing precedent for
  dropping to pandas), vocabulary broadcast in the closure
  (model-sized, the codebook contract).

Tie-breaking is part of the contract (both engines and the oracle
replay it): minimum total cost, ties resolved toward the LONGEST final
piece at each position. Unknown single characters cost ``UNK_COST_X1024``
(greater than any trained piece), so every word is segmentable and the
fallback is visible in the cost.

100 TB shape: train = one bounded explode (≤ L pieces per character) +
one count shuffle + a distributed top-K; apply = one distinct-words
shuffle (vocabulary-sized), map-side Viterbi over types, broadcast join
back to occurrences. Nothing corpus-sized ever reaches the driver or
Python except the word-TYPE frame.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from affinity_spark.functions.text import tokenize
from affinity_spark.operators.lm import flog2_x1024

PIECE_MAX_LEN = 4
UNK_COST_X1024 = 1 << 20


def train_unigram_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_pieces: int = 64,
    piece_max_len: int = PIECE_MAX_LEN,
    sample_mod: int | None = None,
) -> DataFrame:
    """(piece, cost_x1024) — substring-frequency seed vocabulary.

    Every token occurrence contributes all its substrings of length
    1..``piece_max_len``; the ``max_pieces`` most frequent (count desc,
    piece asc — deterministic) are kept, and each gets the integer cost
    ``lg(total + K) - lg(count + 1)`` (lg = flog2_x1024, total = summed
    count of the SELECTED pieces) — a monotone negative-log-frequency in
    exact fixed point. Note ``substring`` byte-scans per call: tokens are
    word-sized here; for pathological unbroken-text inputs, pre-split
    with the char-array idiom (functions/text.py).

    The substring explode (~piece_max_len * avg_len pieces per token) is
    the one corpus-linear stage (measured: the only super-×10 growth in
    the family's ×30 rehearsal). Vocabulary learning doesn't need every
    occurrence: ``sample_mod=N`` harvests from the deterministic
    1/N hash-sample of token occurrences (md5-based, engine-portable) —
    the standard tokenizer-training move at 100 TB, leaving apply
    (type-level Viterbi) untouched."""
    if sample_mod is None:
        toks_df = docs.select(
            F.explode(tokenize(F.col(text_col))).alias("tok")
        )
    else:
        # occurrence key = (doc text digest, in-doc position, token) — a
        # pure function of the DATA, so the sample is identical under any
        # partitioning or engine (monotonically_increasing_id is neither)
        toks_df = docs.select(
            F.md5(F.col(text_col)).alias("_d"),
            F.posexplode(tokenize(F.col(text_col))).alias("_p", "tok"),
        ).filter(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", "_d", "_p", "tok")), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % sample_mod
            == 0
        ).select("tok")
    pieces = toks_df.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("tok")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(piece_max_len), F.length("tok") - i + 1
                            ),
                        ),
                        lambda j: F.substring(F.col("tok"), i, j),
                    ),
                )
            )
        ).alias("piece")
    )
    top = (
        pieces.groupBy("piece")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .orderBy(F.col("c").desc(), F.col("piece").asc())
        .limit(max_pieces)
    )
    tot = top.agg(F.sum("c").cast("long").alias("t"))
    return top.crossJoin(F.broadcast(tot)).select(
        "piece",
        (
            flog2_x1024(F.col("t") + F.lit(max_pieces))
            - flog2_x1024(F.col("c") + F.lit(1))
        ).alias("cost_x1024"),
    )


def viterbi_segment(
    word: str, costs: dict[str, int], piece_max_len: int = PIECE_MAX_LEN
) -> tuple[int, int, list[str]]:
    """Exact integer Viterbi for one word: (n_pieces, total cost, piece
    list). Pure python — the per-row kernel of
    :func:`viterbi_segment_words` and the reference for the tests and
    the recursive-CTE oracle. Tie-break: min cost, then longest piece."""
    n = len(word)
    inf = 1 << 62
    best = [0] + [inf] * n
    bp = [0] * (n + 1)
    for p in range(1, n + 1):
        bc, bj = inf, 0
        for j in range(1, min(piece_max_len, p) + 1):
            piece = word[p - j : p]
            pc = costs.get(piece)
            if pc is None:
                if j != 1:
                    continue
                pc = UNK_COST_X1024
            c = best[p - j] + pc
            if c < bc or (c == bc and j > bj):
                bc, bj = c, j
        best[p], bp[p] = bc, bj
    segs: list[str] = []
    p = n
    while p > 0:
        j = bp[p]
        segs.append(word[p - j : p])
        p -= j
    segs.reverse()
    return len(segs), best[n], segs


def viterbi_segment_words(
    words: DataFrame,
    vocab: DataFrame,
    word_col: str = "word",
    piece_max_len: int = PIECE_MAX_LEN,
) -> DataFrame:
    """Segment a frame of (distinct) words against the vocabulary:
    returns ``words`` + (n_pieces, cost_x1024, segmentation). The vocab
    collect is model-sized by construction (≤ max_pieces rows)."""
    costs = {r["piece"]: int(r["cost_x1024"]) for r in vocab.collect()}

    @F.pandas_udf(
        "n_pieces long, cost_x1024 long, pieces array<string>, "
        "segmentation string"
    )
    def seg(col: pd.Series) -> pd.DataFrame:
        rows = []
        for w in col:
            n, c, segs = viterbi_segment(w, costs, piece_max_len)
            rows.append((n, c, segs, "|".join(segs)))
        return pd.DataFrame(
            rows, columns=["n_pieces", "cost_x1024", "pieces", "segmentation"]
        )

    out = words.withColumn("_s", seg(F.col(word_col)))
    return out.select(
        *words.columns,
        F.col("_s.n_pieces").alias("n_pieces"),
        F.col("_s.cost_x1024").alias("cost_x1024"),
        F.col("_s.pieces").alias("pieces"),
        F.col("_s.segmentation").alias("segmentation"),
    )


def reestimate_costs(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    piece_max_len: int = PIECE_MAX_LEN,
) -> DataFrame:
    """ONE hard-EM round (Kudo 2018 §3.2's E/M with Viterbi hard
    assignments — the deterministic, oracle-exact variant of the
    probabilistic EM; float forward-backward cannot hash-reproduce):
    segment every word TYPE under the current costs, weight each used
    piece by the word's corpus occurrence count, and re-derive costs as
    ``lg(total_used + |V|) - lg(used + 1)`` over the FIXED vocabulary
    (unknown-char fallbacks never enter the estimate). Pieces the
    segmentation stopped using get the max cost instead of vanishing —
    hard-EM prunes by disuse, not by deletion, so the vocab stays
    joinable round over round.

    Scale shape per round: one distinct-words aggregate (type-level),
    the Viterbi pandas UDF over types, one piece-usage aggregate
    (vocab-bounded), zero corpus-sized joins."""
    words = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )
    seg = viterbi_segment_words(words, vocab, piece_max_len=piece_max_len)
    usage = (
        seg.select("wc", F.explode("pieces").alias("piece"))
        .join(F.broadcast(vocab.select("piece")), "piece")
        .groupBy("piece")
        .agg(F.sum("wc").cast("long").alias("used"))
    )
    base = (
        vocab.select("piece")
        .join(usage, "piece", "left")
        .select(
            "piece",
            F.coalesce(F.col("used"), F.lit(0).cast("long")).alias("used"),
        )
    )
    tot = base.agg(
        F.sum("used").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return base.crossJoin(F.broadcast(tot)).select(
        "piece",
        (
            flog2_x1024(F.col("t") + F.col("k"))
            - flog2_x1024(F.col("used") + F.lit(1))
        ).alias("cost_x1024"),
    )


def train_unigram_hard_em(
    docs: DataFrame,
    text_col: str = "text",
    max_pieces: int = 64,
    piece_max_len: int = PIECE_MAX_LEN,
    rounds: int = 1,
) -> DataFrame:
    """Seed vocabulary + ``rounds`` hard-EM refinements. Each round
    re-weights pieces by how much the CURRENT segmentation actually uses
    them (substring frequency over-counts overlapping pieces; usage
    counts each character exactly once), so multi-char pieces that win
    segmentations get cheaper and crowded-out pieces decay toward the
    max cost."""
    vocab = train_unigram_vocab(
        docs, text_col=text_col, max_pieces=max_pieces,
        piece_max_len=piece_max_len,
    )
    for _ in range(rounds):
        vocab = reestimate_costs(
            docs, vocab, text_col=text_col, piece_max_len=piece_max_len
        )
    return vocab

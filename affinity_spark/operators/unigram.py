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
    (type-level Viterbi) untouched.

    The explode itself runs at word-TYPE level: occurrences are first
    reduced to (token, count) by a codegen aggregate with map-side
    partials, and each type's substrings carry its occurrence count into
    the piece sum. Piece counts are bit-identical to the per-occurrence
    form (repeated substrings WITHIN a word are distinct explode rows,
    so within-word multiplicity survives; across occurrences the weight
    is the count) — but the interpreted substring-enumeration HOF
    (CodegenFallback) now runs once per type, not once per occurrence."""
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
    types_df = toks_df.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("wc")
    )
    pieces = types_df.select(
        "wc",
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
        ).alias("piece"),
    )
    top = (
        pieces.groupBy("piece")
        .agg(F.sum("wc").cast("long").alias("c"))
        .orderBy(F.col("c").desc(), F.col("piece").asc())
        .limit(max_pieces)
    )
    # two consumers (the tot broadcast + the output projection), and
    # broadcast exchanges never share work: unpersisted, the corpus-linear
    # substring explode + piece aggregate — the family's one heavy stage —
    # ran TWICE per vocab. max_pieces rows, the cheapest possible persist.
    from affinity_spark.cache import track

    top = track(top.persist())
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


#: fixed-point one (2^20) for the soft-EM lattice arithmetic
WSCALE_BITS = 20
#: saturation cap for the relative forward/backward masses: keeps every
#: intermediate product inside int64 for BOTH engines (al*pexp <= 2^52,
#: then * be <= 2^52+26... see soft_piece_counts), and saturation is part
#: of the deterministic contract (both engines clamp identically)
ALPHA_CAP = 1 << 26


def pexp20(c: int) -> int:
    """Deterministic integer ``2^20 * 2^(-c/1024)`` for c >= 0 — the
    inverse of :func:`~affinity_spark.operators.lm.flog2_x1024`'s
    linear-mantissa idea: exponent from the 1024-block, mantissa linearly
    interpolated, floor-clamped to 1 so no weight is ever exactly zero
    (an all-UNK path must stay representable). DuckDB replays it as
    ``greatest(((2048 - (c % 1024)) * 512) >> least(c // 1024, 60), 1)``.
    Monotone non-increasing; pexp20(0) = 2^20; max error ~6% within a
    block (deterministic, identical in both engines — the contract is
    bit-reproducibility, not float fidelity)."""
    q, r = divmod(int(c), 1024)
    v = ((2048 - r) * 512) >> min(q, 60)
    return v if v > 0 else 1


def soft_piece_counts(
    word: str, costs: dict[str, int], piece_max_len: int = PIECE_MAX_LEN
) -> list[tuple[str, int]]:
    """Expected piece counts for one word under the unigram model —
    the E-step of SOFT EM (Kudo 2018 §3.2's forward-backward), in exact
    integer fixed point so both engines reproduce every count bit-for-bit.

    The key trick making integer forward-backward possible: all masses
    are normalized RELATIVE TO THE VITERBI BEST path through the same
    prefix/suffix — every lattice weight becomes ``pexp20(detour)`` with
    ``detour >= 0`` by Viterbi optimality, so nothing underflows and
    nothing needs float log-sum-exp. Concretely::

        bf[p] = min cost 0..p          (forward Viterbi, the existing DP)
        sb[p] = min cost p..n          (backward Viterbi)
        al[p] = 2^20 * sum over prefix paths 2^(-(cost - bf[p])/1024)
        be[p] = 2^20 * sum over suffix paths 2^(-(cost - sb[p])/1024)
        E(occurrence i,j) = al[i] * pexp20(d) * be[i+j] / (al[n] * 2^20)
          with d = bf[i] + c(piece) + sb[i+j] - bf[n]   (the detour)

    Sums saturate at :data:`ALPHA_CAP` (deterministically, both engines)
    and every division floors in one canonical order. Returns
    ``(piece, e_x1024)`` pairs (expected count in 1/1024 units) for every
    vocabulary piece occurrence with a nonzero posterior; UNK single
    chars participate in the lattice (they carry probability mass) but
    are not reported — like hard EM, the M-step re-estimates only the
    FIXED vocabulary."""
    n = len(word)
    inf = 1 << 62

    def cost_of(piece: str) -> int | None:
        pc = costs.get(piece)
        if pc is None:
            return UNK_COST_X1024 if len(piece) == 1 else None
        return pc

    # forward / backward Viterbi bests
    bf = [0] + [inf] * n
    for p in range(1, n + 1):
        for j in range(1, min(piece_max_len, p) + 1):
            pc = cost_of(word[p - j : p])
            if pc is None:
                continue
            c = bf[p - j] + pc
            if c < bf[p]:
                bf[p] = c
    sb = [inf] * n + [0]
    for p in range(n - 1, -1, -1):
        for j in range(1, min(piece_max_len, n - p) + 1):
            pc = cost_of(word[p : p + j])
            if pc is None:
                continue
            c = pc + sb[p + j]
            if c < sb[p]:
                sb[p] = c
    one = 1 << WSCALE_BITS
    # relative forward mass
    al = [0] * (n + 1)
    al[0] = one
    for p in range(1, n + 1):
        s = 0
        for j in range(1, min(piece_max_len, p) + 1):
            pc = cost_of(word[p - j : p])
            if pc is None or al[p - j] == 0:
                continue
            s += al[p - j] * pexp20(bf[p - j] + pc - bf[p])
        al[p] = min(s >> WSCALE_BITS, ALPHA_CAP)
    # relative backward mass
    be = [0] * (n + 1)
    be[n] = one
    for p in range(n - 1, -1, -1):
        s = 0
        for j in range(1, min(piece_max_len, n - p) + 1):
            pc = cost_of(word[p : p + j])
            if pc is None or be[p + j] == 0:
                continue
            s += pexp20(pc + sb[p + j] - sb[p]) * be[p + j]
        be[p] = min(s >> WSCALE_BITS, ALPHA_CAP)
    z = al[n]
    if z == 0:
        return []
    out: dict[str, int] = {}
    for i in range(n):
        for j in range(1, min(piece_max_len, n - i) + 1):
            piece = word[i : i + j]
            pc = costs.get(piece)
            if pc is None:  # UNK carries mass but is never re-estimated
                continue
            d = bf[i] + pc + sb[i + j] - bf[n]
            # canonical op order (the oracle replays it verbatim):
            # ((al*pexp)>>20)*be, then one floor division
            num = ((al[i] * pexp20(d)) >> WSCALE_BITS) * be[i + j]
            e = (num * 1024) // (z << WSCALE_BITS)
            if e > 0:
                out[piece] = out.get(piece, 0) + e
    return sorted(out.items())


def expected_usage_words(
    words: DataFrame,
    vocab: DataFrame,
    word_col: str = "word",
    piece_max_len: int = PIECE_MAX_LEN,
) -> DataFrame:
    """(piece, e_x1024) expected-count pairs per word row (exploded) —
    the distributed E-step: type-level pandas UDF over distinct words,
    vocabulary broadcast in the closure (the viterbi_segment_words
    contract)."""
    costs = {r["piece"]: int(r["cost_x1024"]) for r in vocab.collect()}

    @F.pandas_udf("array<struct<piece:string,e_x1024:bigint>>")
    def ex(col: pd.Series) -> pd.Series:
        return pd.Series(
            [soft_piece_counts(w, costs, piece_max_len) for w in col]
        )

    return words.select(
        *words.columns, F.explode(ex(F.col(word_col))).alias("_e")
    ).select(
        *words.columns,
        F.col("_e.piece").alias("piece"),
        F.col("_e.e_x1024").alias("e_x1024"),
    )


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) occurrence-weighted word types — the one frame every
    EM round consumes. Callers running several rounds (or hard AND soft
    variants) should compute it once, persist it, and pass it down via
    ``words=`` instead of paying the tokenize+groupBy per round."""
    return (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )


def reestimate_costs_soft(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    piece_max_len: int = PIECE_MAX_LEN,
    words: DataFrame | None = None,
) -> DataFrame:
    """ONE soft-EM round: expected piece usage from the forward-backward
    lattice (occurrence-weighted over word types), costs re-derived over
    the FIXED vocabulary as ``lg(t + k*1024) - lg(used_x1024 + 1024)``
    (the hard-EM formula in 1/1024 fractional-count units — the 1024
    scale cancels in the difference, so the cost magnitudes are directly
    comparable with :func:`reestimate_costs`'s). Same scale shape as the
    hard round: type-level DP, vocab-bounded usage aggregate, zero
    corpus-sized joins."""
    if words is None:
        words = word_counts(docs, text_col)
    usage = (
        expected_usage_words(words, vocab, piece_max_len=piece_max_len)
        .groupBy("piece")
        .agg(F.sum(F.col("wc") * F.col("e_x1024")).cast("long").alias("used"))
    )
    base = (
        vocab.select("piece")
        .join(usage, "piece", "left")
        .select(
            "piece",
            F.coalesce(F.col("used"), F.lit(0).cast("long")).alias("used"),
        )
    )
    # two consumers (tot broadcast + output projection): unpersisted, the
    # type-level E-step pandas UDF upstream (forward-backward / Viterbi)
    # ran TWICE per round; base is vocab-sized
    from affinity_spark.cache import track as _track

    base = _track(base.persist())
    tot = base.agg(
        F.sum("used").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return base.crossJoin(F.broadcast(tot)).select(
        "piece",
        (
            flog2_x1024(F.col("t") + F.col("k") * 1024)
            - flog2_x1024(F.col("used") + F.lit(1024))
        ).alias("cost_x1024"),
    )


def reestimate_costs(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    piece_max_len: int = PIECE_MAX_LEN,
    words: DataFrame | None = None,
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
    if words is None:
        words = word_counts(docs, text_col)
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
    # two consumers (tot broadcast + output projection): unpersisted, the
    # type-level E-step pandas UDF upstream (forward-backward / Viterbi)
    # ran TWICE per round; base is vocab-sized
    from affinity_spark.cache import track as _track

    base = _track(base.persist())
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


def train_unigram_em(
    docs: DataFrame,
    text_col: str = "text",
    max_pieces: int = 64,
    piece_max_len: int = PIECE_MAX_LEN,
    rounds: int = 1,
    soft: bool = False,
) -> DataFrame:
    """Seed vocabulary + ``rounds`` EM refinements, hard (Viterbi
    one-best assignments — deterministic and cheap, but can lock into
    Viterbi-greedy optima: a piece used only in near-best ALTERNATIVE
    segmentations gets zero usage and decays even when it carries real
    probability mass) or soft (``soft=True``: forward-backward expected
    counts over the SAME integer cost lattice — Kudo 2018's actual E
    step, kept engine-exact by the Viterbi-relative fixed-point
    normalization in :func:`soft_piece_counts`). Both variants are
    bit-reproducible and oracle-checkable; soft pays ~L× the per-word
    DP work for the fractional credit assignment."""
    vocab = train_unigram_vocab(
        docs, text_col=text_col, max_pieces=max_pieces,
        piece_max_len=piece_max_len,
    )
    step = reestimate_costs_soft if soft else reestimate_costs
    for _ in range(rounds):
        vocab = step(
            docs, vocab, text_col=text_col, piece_max_len=piece_max_len
        )
    return vocab

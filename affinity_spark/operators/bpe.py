"""Byte-pair-encoding tokenizer training + segmentation (Sennrich et al.
2016, public).

Scale shape: the ONLY corpus-scale stage is the word count (one shuffle —
tokenize is map-side, the aggregate combines partially per partition). BPE
merge training then operates on the distinct-word vocabulary, which is
bounded by the language, not the corpus (the classic argument: a 100 TB
English corpus still has ~1e7 word types) — so the merge loop runs
driver-side over the collected vocab, exactly like the IVF codebook:
collecting a model-sized object is the serving contract, not a hot-path
``collect()``. Segmentation applies the trained merge table in an
Arrow-batched pandas iterator (the merge-rank loop is genuinely imperative
— the same reason real tokenizers are native code, and why this is a
documented non-SQL-expressible op: no DuckDB oracle can replay an
argmax-iterated training loop, so correctness is pinned by goldens + a
pure-python reference model in tests instead).

Determinism: ties in pair frequency break lexicographically, so the merge
table is a pure function of the corpus — retry/re-run stable, the same
contract as the rest of the training pipeline (sampling.py).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from affinity_spark.functions.text import tokenize

END = "</w>"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over the corpus — the one corpus-scale shuffle."""
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for symbols, n in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            pairs[(a, b)] += n
    return pairs


def _apply_merge(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, merged = 0, pair[0] + pair[1]
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_count: int = 2,
    max_word_types: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Ranked merge table from the corpus: repeatedly merge the most
    frequent adjacent symbol pair (ties → lexicographic), starting from
    characters + an end-of-word marker.

    The collected vocabulary is UNCONDITIONALLY capped at the
    ``max_word_types`` most frequent word types (count desc, word asc —
    deterministic): ``min_count`` alone bounds nothing at 100 TB, where
    the ≥-min_count type set is tens of millions of rows. The top-K runs
    distributed (``TakeOrderedAndProject`` — per-partition heaps, never a
    global sort), so the driver sees at most K rows; merge statistics over
    the capped head match the full tail-included counts closely because
    pair frequency is dominated by frequent types (and exactly, on any
    corpus with ≤ K types — pinned by tests/test_bpe.py)."""
    rows = (
        word_counts(df, text_col)
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_word_types)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        vocab[tuple(r.word) + (END,)] = r.n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        # highest count; ties break on the lexicographically smallest pair
        pair = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        vocab = {_apply_merge(s, pair): n for s, n in vocab.items()}
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application (the standard BPE apply)."""
    symbols = list(word) + [END]
    while len(symbols) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(symbols, symbols[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        symbols[i : i + 2] = [symbols[i] + symbols[i + 1]]
    return symbols


def bpe_segment(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Per doc: BPE tokens of the whitespace words under the trained merge
    table. Output (id, n_bpe_tokens, tokens array) — Arrow-batched, merge
    table shipped once per executor via closure."""
    from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bpe_tokens", LongType()),
            StructField("tokens", ArrayType(StringType())),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, counts, toks = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                words = str(text).lower().strip().split()
                out: list[str] = []
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = segment_word(w, ranks)
                        cache[w] = got
                    out.extend(got)
                ids.append(int(i))
                counts.append(len(out))
                toks.append(out)
            yield pd.DataFrame({id_col: ids, "n_bpe_tokens": counts, "tokens": toks})

    return df.select(id_col, text_col).mapInPandas(run, schema)

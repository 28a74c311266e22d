"""Text-analysis column functions (LLM-data-pipeline surface).

All JVM-side built-ins — no Python in the hot path — so they stay inside
whole-stage codegen and scale linearly with executors. Tokenization mirrors
the reference's word extractor (split on whitespace, trim+lowercase,
affinity ``examples/example-secondary-index/.../ESecondaryIndex.scala:109-111``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\s+"

# Deliberately tiny, deterministic English stopword list: the language-ID and
# quality heuristics must be reproducible in ANSI SQL by the DuckDB oracle.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokenize(text: Column) -> Column:
    """lower/trim/split-on-whitespace; empty tokens removed."""
    toks = F.split(F.lower(F.trim(text)), TOKEN_PATTERN)
    return F.filter(toks, lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def shingles(text: Column, n: int = 5) -> Column:
    """Character n-gram shingles of the whitespace-normalized text.

    Used as the MinHash input set. Expressed with sequence+transform so it
    runs JVM-side; returns distinct shingles (set semantics).
    """
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(n))))


def stopword_ratio(text: Column) -> Column:
    toks = tokenize(text)
    stop = F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    return F.when(F.size(toks) > 0, F.size(stop) / F.size(toks)).otherwise(F.lit(0.0))


def lang_id(text: Column, threshold: float = 0.05) -> Column:
    """Heuristic language ID: English-stopword density >= threshold → 'en'.

    A real deployment swaps in a trained n-gram model via mapInPandas; the
    contract (text → label column, no shuffle) is what matters at scale.
    """
    return F.when(stopword_ratio(text) >= F.lit(threshold), F.lit("en")).otherwise(F.lit("und"))


def quality_columns(text: Column) -> dict[str, Column]:
    """Document quality signals: length, token stats, type/token ratio,
    punctuation & digit density. Compose with ``df.withColumns``."""
    toks = tokenize(text)
    n_tok = F.size(toks)
    return {
        "n_chars": F.length(text),
        "n_tokens": n_tok,
        "n_distinct_tokens": F.size(F.array_distinct(toks)),
        "type_token_ratio": F.round(
            F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok).otherwise(F.lit(0.0)), 4
        ),
        "mean_token_len": F.round(
            F.when(
                n_tok > 0,
                F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double") / n_tok,
            ).otherwise(F.lit(0.0)),
            4,
        ),
        "stopword_ratio": F.round(stopword_ratio(text), 4),
        "punct_ratio": F.round(
            (F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))).cast("double")
            / F.greatest(F.length(text), F.lit(1)),
            4,
        ),
        "digit_ratio": F.round(
            (F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))).cast("double")
            / F.greatest(F.length(text), F.lit(1)),
            4,
        ),
    }


def doc_fingerprint(text: Column) -> Column:
    """Whitespace-insensitive content fingerprint: md5 of the normalized text.

    md5 (not Spark ``hash``) so any engine — and the DuckDB oracle — computes
    the identical fingerprint; this is the cross-system dedup key.
    """
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))

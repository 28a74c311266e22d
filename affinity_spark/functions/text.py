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


def let_bound(bound: Column, body) -> Column:
    """Evaluate ``bound`` ONCE and pass it to ``body`` as a lambda variable.

    HOF lambdas re-evaluate any *outer* expression they reference once per
    element — referencing an O(n) expression (a regex normalization, a
    split) inside a transform over n elements silently costs O(n²) per row.
    A lambda *variable* is a real binding: wrap the expensive expression in
    a single-element array and transform over that.
    """
    return F.transform(F.array(bound), body).getItem(0)


def shingles(text: Column, n: int = 5) -> Column:
    """Character n-gram shingles of the whitespace-normalized text.

    Used as the MinHash input set. Expressed with sequence+transform so it
    runs JVM-side; returns distinct shingles (set semantics). The
    normalized text is let-bound so the regex runs once per doc, not once
    per gram (O(n), not O(n²), in document length).
    """
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))

    def grams_of(cs: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(cs) - (n - 1), F.lit(1)))
        return F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(cs, i, n), ""))
        )

    # Grams come from O(1) char-array slices, NOT substring(norm, i, n):
    # substring on a long UTF-8 string byte-scans to char i, so per-gram
    # substrings cost O(n²) per document. split('') is char-correct for
    # multibyte text, keeping md5 parity with the oracle's char-based substr.
    return let_bound(F.split(norm, ""), grams_of)


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
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


#: BPE-ish token pattern (GPT-2 style, lower-cased input): contraction
#: suffixes, space-prefixed letter runs, short digit runs (BPE vocabularies
#: chunk numbers), punctuation runs, whitespace runs. Plain alternation —
#: no lookarounds — so Java regex (Spark) and RE2 (DuckDB) agree.
BPE_TOKEN_PATTERN = r"'[a-z]+| ?[a-z]+| ?[0-9]{1,3}| ?[^a-z0-9\s']+|\s+"


def bpe_token_estimate(text: Column) -> Column:
    """Estimated BPE token count: matches of :data:`BPE_TOKEN_PATTERN` over
    the lower-cased text. Tracks real tokenizer counts far better than
    whitespace words (digits and punctuation cost tokens) while staying a
    single JVM-side codegen'd ``regexp_count`` — no vocab lookup, no UDF.
    The real tokenizer swaps in at the same seam as a pandas UDF when a
    vocab file is available."""
    return F.regexp_count(F.lower(text), F.lit(BPE_TOKEN_PATTERN)).cast("long")


def winnow_fingerprints(text: Column, k: int = 7, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003):
    hash every char k-gram of the normalized text, slide a window of w
    hashes, keep each window's minimum, distinct the kept set.

    Guarantees a match for any shared substring of length >= k + w - 1 while
    storing ~2/(w+1) of the gram hashes — the plagiarism/near-dup
    fingerprint MOSS uses. Pure array expressions, all codegen'd; hashes are
    md5-derived so the DuckDB oracle reproduces the set bit-for-bit.

    Each gram is hashed ONCE: the hash array is let-bound as a lambda
    variable by wrapping it in a single-element array and transforming over
    that (PySpark HOF lambdas re-evaluate any *outer* expression they
    reference per element — the repo-wide lesson from lsh_bands_mapside —
    but a lambda *variable* is a real binding).

    Returns a sorted array<long> column (empty for texts shorter than
    k + w - 1 chars).
    """
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))

    def hashes_of(cs: Column) -> Column:
        def gram_hash(i: Column) -> Column:
            return F.conv(
                F.substring(F.md5(F.array_join(F.slice(cs, i, k), "")), 1, 8),
                16,
                10,
            ).cast("long")

        n_grams = F.size(cs) - F.lit(k - 1)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))), gram_hash
        )

    # char-array slices, not substring(norm, i, k): substring byte-scans to
    # char i on UTF-8, so per-gram substrings are O(n²) per doc (measured
    # 75 s on ONE 170KB doc before this change).
    hashes = let_bound(F.split(norm, ""), hashes_of)

    def windows_of(h: Column) -> Column:
        def win_min(j: Column) -> Column:
            return F.array_min(F.slice(h, j, w))

        return F.transform(
            F.sequence(F.lit(1), F.size(h) - F.lit(w - 1)), win_min
        )

    mins = let_bound(hashes, windows_of)
    return F.when(
        F.length(norm) >= F.lit(k + w - 1),
        F.array_sort(F.array_distinct(mins)),
    ).otherwise(F.array().cast("array<bigint>"))


# (win_hash, pos) packed into one non-negative long: hash * 2^31 + pos.
# hash < 2^32 and pos < 2^31, so enc <= (2^32-1)*2^31 + (2^31-1) = 2^63-1 —
# the full signed-long range with NO overflow (ANSI mode would throw on any).
WINNOW_POS_BASE = 2**31


def winnow_encoded(text: Column, k: int = 7, w: int = 4) -> Column:
    """Positioned winnowing with every per-element value a PRIMITIVE long:
    each k-gram hash is packed with its 0-based offset as
    ``hash * 2^31 + pos``, so ``array_min`` per window selects the minimum
    hash with ties broken to the FIRST position — the exact argmin rule —
    in one primitive comparison, and ``array_distinct``/``array_sort`` hit
    Spark's fast primitive paths.

    This exists because the struct-array formulation was a measured scale
    cliff: higher-order functions are CodegenFallback (interpreted eval),
    and distinct/sort/argmin over array<struct> use interpreted deep
    per-element comparators — O(windows²) interpreted struct compares per
    document. docs_span_dedup built on it ran 921 s at a 30x corpus
    (exponent 1.2); the packed-long form restores the primitive fast paths
    that keep ``winnow_fingerprints`` linear.

    Returns a sorted array<long> of distinct packed selections, ordered by
    (win_hash, pos) — packing preserves that lexicographic order. Decode
    with ``shiftright(enc, 31)`` / ``enc & (2^31 - 1)`` (both codegen'd).
    Empty array for texts shorter than k + w - 1 chars.
    """
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))

    def hashes_of(cs: Column) -> Column:
        def gram_enc(i: Column) -> Column:
            h = F.conv(
                F.substring(F.md5(F.array_join(F.slice(cs, i, k), "")), 1, 8),
                16,
                10,
            ).cast("long")
            return h * F.lit(WINNOW_POS_BASE) + (i - F.lit(1)).cast("long")

        n_grams = F.size(cs) - F.lit(k - 1)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))), gram_enc
        )

    encs = let_bound(F.split(norm, ""), hashes_of)

    def windows_of(h: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(h) - F.lit(w - 1)),
            lambda j: F.array_min(F.slice(h, j, w)),
        )

    mins = let_bound(encs, windows_of)
    return F.when(
        F.length(norm) >= F.lit(k + w - 1),
        F.array_sort(F.array_distinct(mins)),
    ).otherwise(F.array().cast("array<bigint>"))


def winnow_decode_hash(enc: Column) -> Column:
    """Packed winnow selection -> fingerprint value (codegen'd)."""
    return F.shiftright(enc, 31)


def winnow_decode_pos(enc: Column) -> Column:
    """Packed winnow selection -> 0-based char offset (codegen'd)."""
    return enc.bitwiseAND(F.lit(WINNOW_POS_BASE - 1)).cast("int")


def winnow_positioned(text: Column, k: int = 7, w: int = 4) -> Column:
    """``winnow_fingerprints`` variant that keeps WHERE each selected
    fingerprint sits: array<struct<win_hash:bigint, pos:int>> where ``pos``
    is the 0-based char offset of the selected k-gram in the normalized
    text (ties broken to the FIRST minimal gram in the window, same rule
    both engines' argmin uses).

    Thin decoding wrapper over :func:`winnow_encoded`: the selection is
    computed entirely on packed longs (primitive array fast paths); the
    only struct work is one transform over the ~2/(w+1)-sized final
    selection. Output order (win_hash, pos) matches the packed-long sort.
    Prefer consuming ``winnow_encoded`` directly and decoding after the
    explode — a plain projection — when feeding a relational pipeline.
    """
    return F.transform(
        winnow_encoded(text, k=k, w=w),
        lambda e: F.struct(
            winnow_decode_hash(e).alias("win_hash"),
            winnow_decode_pos(e).alias("pos"),
        ),
    )


def _int_div(a: Column, b: Column) -> Column:
    """Exact integer division on columns (HOF-safe, unlike F.expr("div")):
    the numerator is reduced to an exact multiple first, so the double
    quotient is exact for any value below 2^53."""
    return F.when(b > 0, ((a - a % b) / b).cast("long")).otherwise(F.lit(0).cast("long"))


def gopher_rule_struct(text: Column) -> Column:
    """Gopher-style repetition/shape rules as ONE struct column of INTEGER
    fields (engine-
    portable: integer division, never float ratios — the repo's
    hash-compare rule). Signals complementing ``quality_columns``: mean
    word length (x100) and top-token dominance (basis points) — the
    word-repetition family of the Gopher quality filters (Rae et al. 2021,
    public).

    All map-side, zero shuffle: the top-token count is a max over the
    doc's OWN distinct tokens (O(distinct x n) per row) — at corpus scale
    this beats an explode + two-shuffle groupBy whenever document
    vocabulary is bounded, which is exactly the regime the repetition rule
    targets (an unbounded-vocabulary doc passes trivially).

    Returned as a single struct on purpose: alias it once, expand fields
    from the alias — field-per-call would re-evaluate the tokenize +
    aggregate pipeline per field (the shared-subexpression trap).
    """
    toks_expr = tokenize(text)

    def struct_of(toks: Column) -> Column:
        n = F.size(toks).cast("long")
        total_len = F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        )
        top_cnt = F.coalesce(
            F.array_max(
                F.transform(
                    F.array_distinct(toks),
                    lambda w: F.size(F.filter(toks, lambda x: x == w)),
                )
            ),
            F.lit(0),
        ).cast("long")
        return F.struct(
            n.alias("n_words"),
            _int_div(total_len * 100, n).alias("mean_word_len_x100"),
            _int_div(top_cnt * 10000, n).alias("top_token_bp"),
        )

    return let_bound(toks_expr, struct_of)


def bigram_array(toks: Column) -> Column:
    """Adjacent-token bigram strings ("w1 w2") from a token array — the one
    shared builder for every bigram consumer (gopher repetition rules,
    phrase search, LM scoring's struct variant mirrors it). ANSI-safe:
    ``F.get`` nulls on out-of-bounds instead of throwing, and the sequence
    only covers valid starts."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.get(toks, i - 1), F.get(toks, i)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def gopher_rep_struct(text: Column) -> Column:
    """Gopher duplicate-n-gram rules (Rae et al. 2021 §A.1.1, public) at
    n=2, as ONE struct of integer fields: ``n_bigrams``,
    ``top_bigram_bp`` (most frequent bigram's share, basis points) and
    ``dup_bigram_bp`` (share of bigram occurrences beyond their first —
    ``(n - distinct) / n``). Repetitive machine-generated text scores high
    on both; integer basis points keep the gate engine-portable.

    Map-side like :func:`gopher_rule_struct`: the bigram array is built
    once (let-bound), the top count is O(distinct × n) over the doc's own
    bigrams — zero shuffle, no explode.
    """
    toks_expr = tokenize(text)

    def struct_of(bg: Column) -> Column:
        # distinct set let-bound too: d and top both need it, and a HOF
        # lambda would otherwise rebuild it per reference
        def with_distinct(dist: Column) -> Column:
            m = F.size(bg).cast("long")
            top = F.coalesce(
                F.array_max(
                    F.transform(dist, lambda w: F.size(F.filter(bg, lambda x: x == w)))
                ),
                F.lit(0),
            ).cast("long")
            return F.struct(
                m.alias("n_bigrams"),
                _int_div(top * 10000, m).alias("top_bigram_bp"),
                _int_div((m - F.size(dist).cast("long")) * 10000, m).alias(
                    "dup_bigram_bp"
                ),
            )

        return let_bound(F.array_distinct(bg), with_distinct)

    return let_bound(let_bound(toks_expr, bigram_array), struct_of)

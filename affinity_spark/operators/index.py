"""Secondary (inverted) index as a derived table + semi-join lookup.

The reference maintains an inverted index by listening to the primary
state's change stream: each record yields index keys via an extractor, a
tombstone deindexes (affinity ``core/.../state/KVStoreLocal.scala:195-248``,
lookup ``KVStoreIndex.scala:20-37``). Spark-first: the index is a derived
DataFrame ``explode(extractor(row)) → (index_key, primary_key, ts)``; at
scale it is persisted as its own table partitioned by ``index_key`` (query =
partition-pruned scan) and incrementally maintained by the same
``foreachBatch`` MERGE that maintains the primary table. A lookup is a
semi-join back to the primary — a broadcast join whenever the matched key
set is small, which is the common case for selective index terms.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from affinity_spark.timerange import TimeRange


def build_inverted_index(
    df: DataFrame,
    key_cols: Sequence[str],
    extractor: Callable[[DataFrame], Column],
    ts_col: str | None = None,
    index_col: str = "index_key",
) -> DataFrame:
    """Derive the index table: one row per (index key, primary key).

    ``extractor`` maps the primary DataFrame to an array column of index keys
    (the reference's ``Record => List[IK]`` UDTF shape, §2.12) — e.g. word
    extraction ``lambda d: tokenize(d["text"])``.
    """
    cols = [F.explode(F.array_distinct(extractor(df))).alias(index_col)]
    cols += [F.col(c) for c in key_cols]
    if ts_col is not None:
        cols.append(F.col(ts_col))
    return df.select(*cols)


def index_lookup(
    index_df: DataFrame,
    primary_df: DataFrame,
    index_key: object,
    key_cols: Sequence[str],
    time_range: TimeRange | None = None,
    ts_col: str | None = None,
    ts_unit: str = "timestamp",
    index_col: str = "index_key",
) -> DataFrame:
    """index key → primary rows (reference ``KVStoreIndex.apply`` + fetch).

    Equality on ``index_col`` prunes the index scan; the semi-join brings
    back full primary rows. Time bounding applies to the index entries (the
    reference filters ``range.contains(ts)`` on index cells before fetching).
    """
    hits = index_df.filter(F.col(index_col) == F.lit(index_key))
    if time_range is not None:
        if ts_col is None:
            raise ValueError("ts_col required with time_range")
        hits = hits.filter(time_range.predicate(F.col(ts_col), ts_unit))
    keys = hits.select(*key_cols).distinct()
    return primary_df.join(keys, on=list(key_cols), how="left_semi")


def build_positional_index(
    df: DataFrame,
    key_cols: Sequence[str],
    tokens: Column,
    index_col: str = "term",
    pos_col: str = "pos",
) -> DataFrame:
    """Positional inverted index: one row per (term, position, primary key).

    The positional extension of :func:`build_inverted_index` — keeping the
    token offset makes phrase and proximity queries answerable from the
    index alone (no re-tokenization of matched documents). Same §2.12
    extractor shape as the reference's word index
    (``examples/example-secondary-index/.../ESecondaryIndex.scala:109-111``)
    with ``posexplode`` in place of ``explode``.

    At scale the index is persisted partitioned by ``term`` so a phrase
    lookup is a partition-pruned scan per phrase term; positions are 0-based.
    """
    cols = [F.col(c) for c in key_cols]
    return df.select(
        *cols, F.posexplode(tokens).alias(pos_col, index_col)
    ).select(*key_cols, index_col, F.col(pos_col).cast("long").alias(pos_col))


def phrase_lookup(
    pos_index: DataFrame,
    phrase_terms: Sequence[str] | DataFrame,
    key_cols: Sequence[str],
    index_col: str = "term",
    pos_col: str = "pos",
) -> DataFrame:
    """Phrase match from the positional index: keys where the terms appear
    at consecutive positions, with the number of starting positions.

    ``phrase_terms`` is either a literal list of tokens or a 1-row DataFrame
    with columns ``term_0..term_{k-1}`` (so the phrase may itself be
    data-derived and stay engine-side). Each term's postings are filtered
    from the index (partition-pruned scans when the index is stored
    partitioned by term), aligned by subtracting the term's offset from its
    position, and intersected — join cost is bounded by posting-list sizes,
    never corpus size. Returns ``(*key_cols, n_matches)``.
    """
    if isinstance(phrase_terms, DataFrame):
        w = F.broadcast(phrase_terms)
        k = len(phrase_terms.columns)
        if k == 0:
            raise ValueError("phrase must have at least one term column")
        aligned = None
        for i in range(k):
            hits = pos_index.join(
                w, pos_index[index_col] == w[f"term_{i}"], "inner"
            ).select(*key_cols, (F.col(pos_col) - F.lit(i)).alias(pos_col))
            aligned = hits if aligned is None else aligned.join(
                hits, [*key_cols, pos_col], "inner"
            )
    else:
        if not phrase_terms:
            raise ValueError("phrase must have at least one term")
        aligned = None
        for i, term in enumerate(phrase_terms):
            hits = pos_index.filter(F.col(index_col) == F.lit(term)).select(
                *key_cols, (F.col(pos_col) - F.lit(i)).alias(pos_col)
            )
            aligned = hits if aligned is None else aligned.join(
                hits, [*key_cols, pos_col], "inner"
            )
    return aligned.groupBy(*key_cols).agg(F.count("*").alias("n_matches"))


def delete_by_index(
    index_df: DataFrame,
    primary_df: DataFrame,
    index_key: object,
    key_cols: Sequence[str],
    index_col: str = "index_key",
) -> DataFrame:
    """Set-based delete-where-indexed (reference's distributed
    DeleteArticles scatter, ``ESecondaryIndex.scala:88,123-125``): returns the
    primary table minus all rows matching the index key — the anti-join that
    a Delta ``DELETE WHERE key IN (...)`` plans to."""
    keys = (
        index_df.filter(F.col(index_col) == F.lit(index_key))
        .select(*key_cols)
        .distinct()
    )
    return primary_df.join(keys, on=list(key_cols), how="left_anti")


def proximity_lookup(
    pos_index: DataFrame,
    term_a: object,
    term_b: object,
    max_gap: int,
    key_cols: Sequence[str],
    index_col: str = "term",
    pos_col: str = "pos",
) -> DataFrame:
    """Proximity (slop) match from the positional index: keys where
    ``term_a`` and ``term_b`` co-occur within ``max_gap`` positions (either
    order), with the number of such position pairs — the relaxation of
    :func:`phrase_lookup` every search surface grows next (NEAR/k).

    ``term_a``/``term_b`` are literals or 1-row single-column DataFrames
    (data-derived terms stay engine-side). Each term's postings are
    filtered from the index (partition-pruned when stored by term); the
    alignment is a per-key position join bounded by posting-list sizes —
    a range predicate on integers, never a corpus scan.
    """

    def hits(term, alias):
        if isinstance(term, DataFrame):
            w = F.broadcast(term.toDF("_t"))
            got = pos_index.join(w, pos_index[index_col] == w["_t"], "inner")
        else:
            got = pos_index.filter(F.col(index_col) == F.lit(term))
        return got.select(*key_cols, F.col(pos_col).alias(alias))

    a = hits(term_a, "_pa")
    b = hits(term_b, "_pb")
    pairs = a.join(b, list(key_cols)).filter(
        (F.abs(F.col("_pa") - F.col("_pb")) <= F.lit(max_gap))
        & (F.col("_pa") != F.col("_pb"))
    )
    return pairs.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_near"))

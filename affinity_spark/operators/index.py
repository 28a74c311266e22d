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

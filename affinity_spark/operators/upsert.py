"""Batch upsert / MERGE semantics for keyed tables.

The reference's writes (replace/update/insert/delete/getAndUpdate,
affinity ``core/.../state/KVStoreLocal.scala:367-464``) are per-key atomic
upserts into a changelog-backed store. Batch-side on Spark this is MERGE:
with Delta Lake available it is a literal ``MERGE INTO`` (idempotent,
exactly-once under Structured Streaming ``foreachBatch``); here we provide
the engine-level merge as a pure DataFrame transform — the same plan Delta
executes: updates win over base by (key, event-time), tombstones delete.

Scale notes: the merge shuffles both sides on the key once. For a 100 TB
base table the real deployment keys the table layout (bucketing / Delta
clustering) on ``key_cols`` so the base side is already co-located and only
the (small) update batch shuffles; AQE converts to a broadcast merge when a
micro-batch is small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from affinity_spark.operators.kv import compact_latest


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
    tombstone_col: str | None = None,
) -> DataFrame:
    """Last-write-wins merge of ``updates`` into ``base``.

    Both inputs carry the same schema. The result holds, per key, the record
    with the greatest (ts, *tiebreak) across base ∪ updates — with a bias to
    updates on exact ties (an update batch replays must win, matching the
    reference's blind ``replace`` W1). Tombstone rows (``tombstone_col`` =
    true) remove the key from the result.
    """
    b = base.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))
    merged = compact_latest(
        b.unionByName(u),
        key_cols=key_cols,
        ts_col=ts_col,
        tiebreak_cols=list(tiebreak_cols) + ["_src"],
        tombstone_col=tombstone_col,
    )
    return merged.drop("_src")


def insert_only(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """W3 ``insert``: only keys absent from base are added (anti-join)."""
    fresh = updates.join(base.select(*key_cols).distinct(), on=list(key_cols), how="left_anti")
    return base.unionByName(fresh)


def delete_keys(
    base: DataFrame,
    keys: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """W4 ``delete``: set-based tombstone application (anti-join)."""
    return base.join(keys.select(*key_cols).distinct(), on=list(key_cols), how="left_anti")

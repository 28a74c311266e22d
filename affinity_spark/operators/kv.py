"""Keyed-table (KV store) read semantics on DataFrames.

The reference materializes a changelog into a per-partition KV store and
serves point gets, prefix scans and time-range scans off it (affinity
``core/.../state/KVStoreLocal.scala:263-349``, ``KVStore.scala:10-137``). On
Spark, the table IS the compacted view and every read is a declarative plan:

- point get / prefix scan → equality predicates that Catalyst pushes into the
  parquet scan (PushedFilters + min/max row-group skipping). At 100 TB the
  table is partitioned/z-ordered by the leading key columns so these scans
  prune files, not just row groups.
- compaction (latest-by-key) → ``max_by(struct(*), order)`` hash aggregate:
  one shuffle on the key, map-side partial agg, spill handled by Tungsten —
  the exact job the reference's ExternalAppendOnlyMap compactor does
  (``spark/.../LogRDD.scala:51-63``) but whole-stage-codegen'd.
- TTL → a read-time filter (cheap, pushed down) plus a scheduled vacuum
  delete for storage reclamation (affinity ``MemStore.java:140-154`` does the
  same lazily on read).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from affinity_spark.timerange import TimeRange


def compact_latest(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
    tombstone_col: str | None = None,
) -> DataFrame:
    """Latest record per key by event time (log compaction as a query).

    Deterministic: ties on ``ts_col`` break by ``tiebreak_cols`` (supply the
    log offset / a unique id). If ``tombstone_col`` is given, rows where it is
    true win the max like any other record but are dropped from the output —
    compaction semantics of ``LogRDD.compact`` (latest-by-event-time then
    tombstone elimination, ``spark/.../LogRDD.scala:51-63``).
    """
    order = F.struct(*[F.col(ts_col)] + [F.col(c) for c in tiebreak_cols])
    payload_cols = [c for c in df.columns if c not in key_cols]
    latest = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload_cols]), order).alias("_latest")
    )
    out = latest.select(*key_cols, "_latest.*")
    if tombstone_col is not None:
        out = out.filter(~F.col(tombstone_col)).drop(tombstone_col)
    return out


def point_get(df: DataFrame, key: Mapping[str, object]) -> DataFrame:
    """Point lookup: conjunction of key-equality predicates (pushed down)."""
    cond = F.lit(True)
    for c, v in key.items():
        cond = cond & (F.col(c) == F.lit(v))
    return df.filter(cond)


def prefix_scan(
    df: DataFrame,
    prefix: Mapping[str, object],
    time_range: TimeRange | None = None,
    ts_col: str | None = None,
    ts_unit: str = "timestamp",
) -> DataFrame:
    """Leading-key-prefix + time-range scan.

    The reference computes a binary key prefix from leading Avro @Fixed fields
    and walks a RocksDB prefix iterator (``KVStoreLocal.scala:272-293``);
    declaratively that is equality on the leading key columns plus the range
    predicate — both pushed to the scan, and at scale both prune partitions
    when the table is laid out by those columns.
    """
    out = point_get(df, prefix)
    if time_range is not None:
        if ts_col is None:
            raise ValueError("ts_col required when time_range is given")
        out = out.filter(time_range.predicate(F.col(ts_col), ts_unit))
    return out


def ttl_filter(
    df: DataFrame,
    ts_col: str,
    ttl_ms: int,
    now_ms: int,
    ts_unit: str = "timestamp",
) -> DataFrame:
    """Drop records whose event time is older than ``now - ttl``.

    Read-side expiry, same observable behavior as the reference's
    ``MemStore.unwrap`` lazy TTL (``api/.../storage/MemStore.java:140-154``).
    ``now_ms`` is explicit (not ``F.current_timestamp``) so plans are
    deterministic and cacheable; a vacuum job handles physical deletion.
    """
    cutoff = now_ms - ttl_ms
    col = F.col(ts_col)
    if ts_unit == "timestamp":
        return df.filter(col >= F.timestamp_millis(F.lit(cutoff)))
    return df.filter(col >= F.lit(cutoff))


def range_materialize(
    df: DataFrame,
    prefix: Mapping[str, object],
    time_range: TimeRange,
    ts_col: str,
    ts_unit: str = "timestamp",
) -> list:
    """Prefix+range scan collected to the driver (the reference's
    ``range(...): Map[K,V]``, ``KVStoreLocal.scala:331-349``). Serving-path
    only — analytical plans must stay distributed."""
    return prefix_scan(df, prefix, time_range, ts_col, ts_unit).collect()


def approx_num_keys(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Approximate key count (reference ``numKeys``, RocksDB estimate)."""
    return df.select(
        F.approx_count_distinct(F.struct(*[F.col(c) for c in key_cols])).alias("num_keys")
    )

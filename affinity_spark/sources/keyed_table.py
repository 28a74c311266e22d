"""KeyedTable: a persisted, partitioned, last-write-wins keyed table.

The batch materialization of the reference's Keyspace state (changelog →
compacted KV store). Backing format is parquet here (Delta Lake in a real
deployment — MERGE INTO, CDF as the change stream, vacuum for TTL); the
engine-level semantics are identical and implemented as DataFrame plans:

- write/upsert: merge_upsert (last-write-wins by event time, tombstones)
- read: compacted view; point get / prefix scan push down to the scan
- layout: repartitioned by key columns on write so equality predicates prune
  files (at 100 TB: partitionBy leading key cols + clustering/z-order)

Versioned directories + an atomic pointer file give snapshot-isolated
readers without a table format dependency.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from affinity_spark.operators.kv import point_get, prefix_scan
from affinity_spark.operators.upsert import merge_upsert
from affinity_spark.timerange import TimeRange


class KeyedTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: Sequence[str],
        ts_col: str,
        tiebreak_cols: Sequence[str] = (),
        tombstone_col: str | None = None,
        num_buckets: int = 32,
        external: bool = False,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.ts_col = ts_col
        self.tiebreak_cols = list(tiebreak_cols)
        self.tombstone_col = tombstone_col
        self.num_buckets = num_buckets
        # external = populated by another system; reads only (the
        # reference's external/readonly state rejects writes,
        # KVStoreLocalSpec.scala:58)
        self.external = external
        os.makedirs(path, exist_ok=True)

    # --- snapshot pointer ---------------------------------------------------

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_current.json")

    def _current_version_dir(self) -> str | None:
        if not os.path.exists(self._pointer):
            return None
        with open(self._pointer) as f:
            return os.path.join(self.path, json.load(f)["version"])

    def _commit_version(self, version: str) -> None:
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "committed_at": time.time()}, f)
        os.replace(tmp, self._pointer)

    # --- io -------------------------------------------------------------

    def exists(self) -> bool:
        return self._current_version_dir() is not None

    def read(self) -> DataFrame:
        vdir = self._current_version_dir()
        if vdir is None:
            raise FileNotFoundError(f"table at {self.path} has no committed version")
        return self.spark.read.parquet(vdir)

    def overwrite(self, df: DataFrame) -> None:
        if self.external:
            raise PermissionError(f"table at {self.path} is external/read-only")
        version = f"v{int(time.time() * 1000)}"
        out = os.path.join(self.path, version)
        # cluster by key so key-equality scans skip files via min/max stats
        df.repartition(self.num_buckets, *self.key_cols).write.mode("overwrite").parquet(out)
        old = self._current_version_dir()
        self._commit_version(version)
        if old and os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def upsert(self, updates: DataFrame) -> None:
        """MERGE: last-write-wins by (ts, tiebreaks); tombstones delete."""
        if not self.exists():
            merged = merge_upsert(
                updates.limit(0), updates, self.key_cols, self.ts_col,
                self.tiebreak_cols, self.tombstone_col,
            )
        else:
            merged = merge_upsert(
                self.read(), updates, self.key_cols, self.ts_col,
                self.tiebreak_cols, self.tombstone_col,
            )
        self.overwrite(merged)

    # --- reads ----------------------------------------------------------

    def get(self, key: Mapping[str, object]) -> DataFrame:
        return point_get(self.read(), key)

    def scan(
        self,
        prefix: Mapping[str, object],
        time_range: TimeRange | None = None,
        ts_unit: str = "millis",
    ) -> DataFrame:
        return prefix_scan(self.read(), prefix, time_range, self.ts_col, ts_unit)

    # --- maintenance ---------------------------------------------------

    def vacuum(self, ttl_ms: int, now_ms: int, ts_unit: str = "millis") -> int:
        """Physically drop records older than ``now - ttl`` (the scheduled
        reclamation pairing the read-side ``ttl_filter``; affinity deletes
        lazily on read, MemStore.java:140-154 — a table needs a real
        vacuum). Returns the number of rows removed."""
        from affinity_spark.operators.kv import ttl_filter

        before = self.read()
        n_before = before.count()
        kept = ttl_filter(before, self.ts_col, ttl_ms, now_ms, ts_unit)
        self.overwrite(kept)
        return n_before - self.read().count()

"""Maintained sketch store: pre-aggregated approximate-distinct state as
a TABLE, the fourth maintained-index family.

PostingsIndex serves retrieval, BandIndex serves near-dup, IVFIndex
serves ANN; this serves APPROXIMATE AGGREGATION over time: per-day HLL
register tables (2^p rows/day whatever the event volume) kept in a
day-partitioned KeyedTable, so "distinct users in [d0, d1]" is answered
by a PartitionFilters-pruned read of the days in range plus a bucket-max
merge — raw events are never rescanned (reference analogy: the X1
maintained-index contract, core/src/main/scala/io/amient/affinity/core/
state/KVStoreLocal.scala:195-248, applied to sketch state; the sketch
algebra itself is the public HyperLogLog merge property).

Why registers, not counts: counts don't merge (distincts overlap across
days); registers merge by ELEMENTWISE MAX, which is also idempotent —
replaying a micro-batch folds the same ranks into the same maxima, so
the streaming maintainer is exactly-once-equivalent with no batch
markers (stronger than the upsert sinks, which need key-idempotence).

Scale shape: admit IO ∝ touched days (partition-pruned hardlink merge);
a year of p=8 daily sketches is ~93k rows TOTAL — the read side is
always sketch-sized. Register values are engine-exact integers
(shiftright rank field, length(bin)−1), so estimates reproduce
bit-for-bit across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from affinity_spark.operators.sketches import HLL_HASH_BITS, hll_registers_by_group
from affinity_spark.sources.keyed_table import KeyedTable


class HLLStore:
    """Day-partitioned HLL register table with merge-on-read range
    queries and an idempotent streaming maintainer."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        p: int = 8,
        ts_col: str = "ts",
        num_buckets: int = 4,
    ) -> None:
        self.spark = spark
        self.p = p
        self.ts_col = ts_col
        self._table = KeyedTable(
            spark, os.path.join(path, "hll_daily"), ["day", "bucket"],
            ts_col="register", num_buckets=num_buckets, partition_col="day",
        )

    def _daily_registers(self, df: DataFrame, key: Column) -> DataFrame:
        daily = hll_registers_by_group(
            df.withColumn(
                "day", F.date_format(F.col(self.ts_col), "yyyy-MM-dd")
            ),
            "day",
            key,
            p=self.p,
        )
        return daily.select("day", "bucket", "register")

    # --- build / maintain ---------------------------------------------------

    def build(self, df: DataFrame, key: Column) -> None:
        """Full (re)build from raw rows: one groupBy(day, bucket) whose
        shuffle is days × 2^p rows regardless of input volume."""
        self._table.overwrite(self._daily_registers(df, key))

    def admit(self, batch: DataFrame, key: Column) -> None:
        """MERGE a batch of raw rows: the batch's daily registers fold
        into the stored ones by elementwise MAX, rewriting ONLY the
        touched day partitions (hardlinked carry-over for the rest).
        Idempotent by algebra — re-admitting the same rows recomputes
        the same maxima — so a replayed micro-batch is harmless."""
        delta = self._daily_registers(batch, key)
        days = [r[0] for r in delta.select("day").distinct().collect()]
        if not days:
            return
        if not self._table.exists():
            self._table.overwrite(delta)
            return
        base_version = self._table._current_version_dir()
        cur = self._table.read().filter(F.col("day").isin(days))
        merged = (
            cur.unionByName(delta.select(*cur.columns))
            .groupBy("day", "bucket")
            .agg(F.max("register").alias("register"))
            .select(*cur.columns)
        )
        self._table.overwrite_partitions(
            merged, days, expected_base=base_version
        )

    def maintainer(self, key: Column):
        """foreachBatch streaming maintenance — the PostingsIndex/
        BandIndex/IVFIndex contract for sketch state. No batch-id
        bookkeeping: max-merge is idempotent under replay."""

        def apply(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            self.admit(batch_df, key)

        return apply

    # --- reads --------------------------------------------------------------

    def exists(self) -> bool:
        return self._table.exists()

    def daily(self) -> DataFrame:
        """(day, bucket, register) — filters on ``day`` are
        partition-pruned."""
        return self._table.read()

    def registers_for_range(self, d0: str, d1: str) -> DataFrame:
        """Merged registers for days in [d0, d1] (inclusive, 'yyyy-MM-dd'
        strings): a pruned scan of the in-range day partitions + one
        2^p-row bucket-max — raw data is never touched."""
        return (
            self.daily()
            .filter(F.col("day").between(d0, d1))
            .groupBy("bucket")
            .agg(F.max("register").alias("register"))
        )

    def estimate_state(self, d0: str, d1: str) -> DataFrame:
        """One-row EXACT integer estimator state for the range: bucket
        count, register sum, and the harmonic numerator
        ``sum(2^(HLL_HASH_BITS - p - register + 1))`` — everything the
        float HLL formula needs, in engine-exact integers."""
        shift_base = HLL_HASH_BITS - self.p + 1
        pow_term = F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            (F.lit(shift_base) - F.col("register")).cast("int"),
        )
        return self.registers_for_range(d0, d1).agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("register").cast("long").alias("sum_registers"),
            F.sum(pow_term).cast("long").alias("harmonic_num"),
        )

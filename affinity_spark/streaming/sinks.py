"""Streaming sinks: changelog → keyed table maintenance.

The reference's OutputDataStream appends records/tombstones to a log and the
state layer materializes it (affinity ``core/.../util/OutputDataStream.scala``,
``Log.java``). Spark-first the sink is ``foreachBatch``: each micro-batch is
merged into the keyed table — with Delta this is a literal MERGE INTO and
exactly-once comes from (queryId, batchId) idempotence; on plain parquet we
read-merge-overwrite, which is the same logical plan without the transactional
commit (documented gap, closed by any ACID table format in production).

At 100 TB the table layout is keyed (bucketed / liquid-clustered on the key),
so the merge shuffles only the micro-batch side; the base table is read
pruned to the touched key partitions.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from affinity_spark.operators.upsert import merge_upsert


def foreach_batch_merge(
    table_path: str,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
    tombstone_col: str | None = None,
):
    """Build a foreachBatch(batch_df, batch_id) function maintaining a keyed
    parquet table with last-write-wins + tombstone semantics."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(table_path):
            base = spark.read.parquet(table_path)
            if tombstone_col is not None and tombstone_col not in base.columns:
                base = base.withColumn(tombstone_col, F.lit(False))
            merged = merge_upsert(
                base,
                batch_df,
                key_cols,
                ts_col,
                tiebreak_cols,
                tombstone_col=None,  # keep tombstones in the table; filter on read
            )
        else:
            merged = batch_df
        # localCheckpoint materializes the merge result before the overwrite
        # drops the files it was computed from.
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(table_path)

    return apply


def keyed_table_sink(stream: DataFrame, table, checkpoint_path: str):
    """writeStream into a ``KeyedTable``: each micro-batch is a MERGE and
    each merge commits a new snapshot version atomically — readers of the
    table pointer never observe a half-written batch (the versioned
    upgrade of the plain-directory ``changelog_sink``)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        table.upsert(batch_df)

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )


def changelog_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint_path: str,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
    tombstone_col: str | None = None,
):
    """writeStream wiring for foreach_batch_merge (S7 + X4: the table is the
    materialized changelog; the checkpoint is the reference's committed
    consumer offset)."""
    return (
        stream.writeStream.foreachBatch(
            foreach_batch_merge(table_path, key_cols, ts_col, tiebreak_cols, tombstone_col)
        )
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )

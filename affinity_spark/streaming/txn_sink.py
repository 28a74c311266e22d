"""Exactly-once transactional Kafka sink convention for foreachBatch.

The reference achieves exactly-once output with a Kafka transactional
producer driven begin/append/commit/abort by a coordinator
(kafka/storage-kafka/src/main/scala/io/amient/affinity/kafka/
TransactionalProducer.scala:1-111, core/.../actor/TransactionCoordinator.
scala:46-134). Spark's analog: every micro-batch is one Kafka transaction,
and Structured Streaming's replay unit is (query_id, batch_id) — a restart
re-delivers a batch with the SAME batch_id, so idempotence means "commit
each (query_id, batch_id) at most once".

Convention implemented here:

- ``transactional.id`` is stable per query (``affinity-txn-<query_id>``):
  Kafka fences zombie producers from a dead driver via the epoch bump in
  ``init_transactions`` — the reference relies on the same broker mechanism.
- A marker record ``(query_id -> batch_id)`` is appended to
  ``<topic>.__txn_markers`` INSIDE the transaction, the Kafka translation of
  the reference coordinator committing its transaction state atomically with
  the data. Data and marker become visible together or not at all
  (read_committed).
- On batch start the sink reads the last committed marker; a replayed
  batch_id <= that marker is skipped whole — replay produces zero duplicate
  records.
- Any send failure aborts the transaction; aborted records are never
  visible to read_committed consumers, and the retried batch starts clean.

The producer is injected (``producer_factory``) because no broker exists in
this harness; the mock in tests implements the same protocol
(init/begin/send/commit/abort + read_committed_marker). At scale the real
sends happen executor-side via foreachPartition with one producer per
(executor, query); the driver-side marker read stays tiny.
"""

from __future__ import annotations

import struct
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from affinity_spark.functions.murmur2 import kafka_partition_udf

MARKER_TOPIC_SUFFIX = ".__txn_markers"


def transactional_id(query_id: str) -> str:
    return f"affinity-txn-{query_id}"


def encode_batch_marker(batch_id: int) -> bytes:
    return struct.pack(">q", batch_id)


def decode_batch_marker(value: bytes) -> int:
    return struct.unpack(">q", value)[0]


def kafka_txn_foreach_batch(
    topic: str,
    num_partitions: int,
    producer_factory: Callable[[str], object],
    query_id: str,
    key_col: str = "key",
    value_col: str = "value",
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function writing each micro-batch as one
    Kafka transaction with replay-idempotence markers.

    ``producer_factory(transactional_id)`` must return an object with
    ``init_transactions() / begin_transaction() / send(topic, key, value,
    partition) / commit_transaction() / abort_transaction()`` and
    ``read_committed_marker(marker_topic, query_id) -> int | None``.
    """
    marker_topic = topic + MARKER_TOPIC_SUFFIX
    txn_id = transactional_id(query_id)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        producer = producer_factory(txn_id)
        # Fences any zombie with the same transactional.id and aborts its
        # dangling transaction (broker-side epoch bump).
        producer.init_transactions()
        last = producer.read_committed_marker(marker_topic, query_id)
        if last is not None and batch_id <= last:
            return  # replayed batch: already committed atomically, skip whole
        rows = batch_df.select(
            F.col(key_col).alias("key"),
            F.col(value_col).alias("value"),
            kafka_partition_udf(num_partitions)(F.col(key_col)).alias("partition"),
        )
        producer.begin_transaction()
        try:
            # Harness-scale send loop: toLocalIterator streams partitions
            # through the driver without materializing the batch. At cluster
            # scale this loop moves into rows.foreachPartition with one
            # transactional producer per executor task slot.
            for row in rows.toLocalIterator():
                producer.send(topic, row.key, row.value, row.partition)
            producer.send(
                marker_topic,
                query_id.encode("utf-8"),
                encode_batch_marker(batch_id),
                None,
            )
        except Exception:
            producer.abort_transaction()
            raise
        producer.commit_transaction()

    return _sink

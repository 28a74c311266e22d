"""Real-broker Kafka smoke test — env-gated, skipped-not-failed today.

Every Kafka surface (S1 log scan, S7 sink, S15 admin) is implemented and
mock-tested, but this sandbox has no broker and no spark-kafka artifact
(CLAUDE.md env facts), so the reference's embedded-server evidence
(``kafka/test-util-kafka/.../EmbeddedKafka.scala:1-60``,
``KafkaStorageSpec.scala:120-186``) has no live analog here. The moment an
environment provides one, set::

    AFFINITY_KAFKA_BOOTSTRAP=host:9092 python -m pytest tests/test_kafka_broker_smoke.py

and this file lights up: produce through write_log (murmur2 placement),
read back through read_log, and assert every record landed on the
partition ``murmur2_partition`` predicts — the same murmur2-compat
invariant the DuckDB oracle replays for ``events_partition_routing``.
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("AFFINITY_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="no Kafka broker: set AFFINITY_KAFKA_BOOTSTRAP=host:9092 to run",
)


def _kafka_format_available(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "_probe").load()
        return True
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source" not in str(e)


def test_produce_read_roundtrip_with_murmur2_placement(spark):
    from pyspark.sql import functions as F

    from affinity_spark.functions.murmur2 import murmur2_partition
    from affinity_spark.sources.kafka import read_log, write_log

    if not _kafka_format_available(spark):
        pytest.skip("spark-sql-kafka artifact not on the classpath")

    num_partitions = 4
    topic = f"affinity-smoke-{uuid.uuid4().hex[:8]}"
    try:
        from kafka.admin import KafkaAdminClient, NewTopic  # kafka-python, if present

        admin = KafkaAdminClient(bootstrap_servers=BOOTSTRAP)
        admin.create_topics([NewTopic(topic, num_partitions, 1)])
    except ImportError:
        pytest.skip("no kafka admin client available to create the topic")

    rows = [(f"k{i}".encode(), f"v{i}".encode()) for i in range(100)]
    df = spark.createDataFrame(rows, "key binary, value binary")
    write_log(df, BOOTSTRAP, topic, num_partitions)

    back = read_log(spark, BOOTSTRAP, topic, num_partitions).select(
        "key", "value", "partition"
    )
    got = {bytes(r.key): (bytes(r.value), r.partition) for r in back.collect()}
    assert len(got) == 100
    for i in range(100):
        key = f"k{i}".encode()
        value, partition = got[key]
        assert value == f"v{i}".encode()
        # the cross-ecosystem invariant: our writes land where any vanilla
        # murmur2 Kafka producer would put them
        assert partition == murmur2_partition(key, num_partitions)

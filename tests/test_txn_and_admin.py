"""Broker-independent tests of the Kafka transaction convention and topic
admin DDL (reference: TransactionalProducer.scala:1-111,
TransactionCoordinator.scala:46-134, KafkaLogStorage.scala:338-439)."""

from __future__ import annotations

import pytest

from affinity_spark.sources.kafka_admin import (
    JAVA_LONG_MAX,
    ensure_topic,
    required_topic_configs,
)
from affinity_spark.streaming.txn_sink import (
    decode_batch_marker,
    kafka_txn_foreach_batch,
    transactional_id,
)


# --- mock broker ------------------------------------------------------------


class MockBroker:
    """Committed-visibility log shared by mock producers (one 'cluster')."""

    def __init__(self):
        self.committed: list[tuple[str, bytes, bytes, int | None]] = []
        self.epochs: dict[str, int] = {}


class MockTxnProducer:
    def __init__(self, broker: MockBroker, txn_id: str):
        self.broker = broker
        self.txn_id = txn_id
        self.epoch = None
        self.pending: list[tuple[str, bytes, bytes, int | None]] | None = None
        self.fail_after_n_sends: int | None = None

    def init_transactions(self):
        self.broker.epochs[self.txn_id] = self.broker.epochs.get(self.txn_id, 0) + 1
        self.epoch = self.broker.epochs[self.txn_id]

    def _check_fenced(self):
        if self.epoch != self.broker.epochs[self.txn_id]:
            raise RuntimeError("ProducerFencedException")

    def begin_transaction(self):
        self._check_fenced()
        self.pending = []

    def send(self, topic, key, value, partition):
        self._check_fenced()
        if self.fail_after_n_sends is not None and len(self.pending) >= self.fail_after_n_sends:
            raise RuntimeError("broker send failure")
        self.pending.append((topic, bytes(key), bytes(value), partition))

    def commit_transaction(self):
        self._check_fenced()
        self.broker.committed.extend(self.pending)
        self.pending = None

    def abort_transaction(self):
        self.pending = None

    def read_committed_marker(self, marker_topic, query_id):
        last = None
        for topic, key, value, _ in self.broker.committed:
            if topic == marker_topic and key == query_id.encode():
                last = decode_batch_marker(value)
        return last


@pytest.fixture()
def broker():
    return MockBroker()


def _batch(spark, ids):
    rows = [(str(i).encode(), f"v{i}".encode()) for i in ids]
    return spark.createDataFrame(rows, "key binary, value binary")


def _data_records(broker, topic):
    return [(k, v) for t, k, v, _ in broker.committed if t == topic]


def test_commit_then_replay_is_exactly_once(spark, broker):
    sink = kafka_txn_foreach_batch(
        "out", 4, lambda tid: MockTxnProducer(broker, tid), "q1"
    )
    sink(_batch(spark, [1, 2, 3]), 0)
    assert len(_data_records(broker, "out")) == 3
    # restart replays batch 0 with the same batch_id: must be a no-op
    sink(_batch(spark, [1, 2, 3]), 0)
    assert len(_data_records(broker, "out")) == 3
    sink(_batch(spark, [4]), 1)
    assert len(_data_records(broker, "out")) == 4


def test_mid_batch_failure_aborts_then_retry_commits_once(spark, broker):
    factories = []

    def factory(tid):
        p = MockTxnProducer(broker, tid)
        factories.append(p)
        return p

    sink = kafka_txn_foreach_batch("out", 4, factory, "q2")
    # first attempt dies mid-send -> abort -> nothing visible
    def failing_factory(tid):
        p = factory(tid)
        p.fail_after_n_sends = 1
        return p

    failing_sink = kafka_txn_foreach_batch("out", 4, failing_factory, "q2")
    with pytest.raises(RuntimeError, match="send failure"):
        failing_sink(_batch(spark, [1, 2, 3]), 0)
    assert _data_records(broker, "out") == []
    # retry of the SAME batch_id commits exactly once
    sink(_batch(spark, [1, 2, 3]), 0)
    assert len(_data_records(broker, "out")) == 3


def test_zombie_producer_is_fenced(spark, broker):
    zombie = MockTxnProducer(broker, transactional_id("q3"))
    zombie.init_transactions()
    zombie.begin_transaction()
    zombie.send("out", b"z", b"zombie", 0)
    # new incarnation of the same query bumps the epoch
    sink = kafka_txn_foreach_batch(
        "out", 4, lambda tid: MockTxnProducer(broker, tid), "q3"
    )
    sink(_batch(spark, [1]), 0)
    with pytest.raises(RuntimeError, match="Fenced"):
        zombie.commit_transaction()
    assert (b"z", b"zombie") not in _data_records(broker, "out")


def test_marker_and_data_commit_atomically(spark, broker):
    sink = kafka_txn_foreach_batch(
        "out", 4, lambda tid: MockTxnProducer(broker, tid), "q4"
    )
    sink(_batch(spark, [1]), 7)
    markers = [
        decode_batch_marker(v)
        for t, k, v, _ in broker.committed
        if t == "out.__txn_markers"
    ]
    assert markers == [7]


# --- topic admin DDL --------------------------------------------------------


class MockAdmin:
    def __init__(self, topics=None):
        self.topics = topics or {}
        self.altered: dict[str, dict[str, str]] = {}

    def list_topics(self):
        return set(self.topics)

    def create_topic(self, name, num_partitions, replication_factor):
        self.topics[name] = {
            "num_partitions": num_partitions,
            "replication_factor": replication_factor,
            "configs": {},
        }

    def describe_topic(self, name):
        return self.topics[name]

    def describe_configs(self, name):
        return dict(self.topics.get(name, {}).get("configs", {}))

    def alter_configs(self, name, entries):
        self.topics[name]["configs"] = dict(entries)
        self.altered[name] = dict(entries)


def test_ensure_compact_topic_created_and_configured():
    admin = MockAdmin()
    res = ensure_topic(admin, "state", ttl_ms=0, num_partitions=8)
    assert res.created
    cfg = admin.topics["state"]["configs"]
    assert cfg["cleanup.policy"] == "compact"
    assert cfg["retention.ms"] == str(JAVA_LONG_MAX)
    assert cfg["message.timestamp.type"] == "CreateTime"
    assert cfg["retention.bytes"] == "-1"


def test_ensure_ttl_topic_is_compact_delete_with_retention():
    admin = MockAdmin()
    ensure_topic(admin, "state", ttl_ms=86400000, num_partitions=4)
    cfg = admin.topics["state"]["configs"]
    assert cfg["cleanup.policy"] == "compact,delete"
    assert cfg["retention.ms"] == "86400000"
    assert cfg["message.timestamp.difference.max.ms"] == "86400000"


def test_partition_count_mismatch_raises():
    admin = MockAdmin(
        {"state": {"num_partitions": 2, "replication_factor": 1, "configs": {}}}
    )
    with pytest.raises(ValueError, match="2 partitions, expecting: 8"):
        ensure_topic(admin, "state", num_partitions=8)


def test_replication_below_declared_raises():
    admin = MockAdmin(
        {"state": {"num_partitions": 4, "replication_factor": 1, "configs": {}}}
    )
    with pytest.raises(ValueError, match="replication"):
        ensure_topic(admin, "state", num_partitions=4, replication_factor=3)


def test_readonly_topic_reports_drift_never_alters():
    admin = MockAdmin(
        {
            "feed": {
                "num_partitions": 4,
                "replication_factor": 1,
                "configs": {"cleanup.policy": "delete"},
            }
        }
    )
    res = ensure_topic(admin, "feed", readonly=True)
    assert "cleanup.policy" in res.drift_warnings
    assert admin.altered == {}


def test_config_drift_is_converged_preserving_unmanaged_keys():
    admin = MockAdmin(
        {
            "state": {
                "num_partitions": 4,
                "replication_factor": 1,
                "configs": {"cleanup.policy": "delete", "segment.ms": "1234"},
            }
        }
    )
    res = ensure_topic(admin, "state", num_partitions=4)
    assert res.altered["cleanup.policy"] == "compact"
    assert admin.topics["state"]["configs"]["segment.ms"] == "1234"


def test_already_converged_is_noop():
    admin = MockAdmin()
    ensure_topic(admin, "state", ttl_ms=0, num_partitions=8)
    admin.altered = {}
    res = ensure_topic(admin, "state", ttl_ms=0, num_partitions=8)
    assert not res.created and not res.altered and admin.altered == {}


def test_required_configs_matrix():
    assert required_topic_configs(0)["cleanup.policy"] == "compact"
    assert required_topic_configs(1)["cleanup.policy"] == "compact,delete"
    assert required_topic_configs(0)["retention.ms"] == str(JAVA_LONG_MAX)

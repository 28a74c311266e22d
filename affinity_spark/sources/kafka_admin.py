"""Topic admin DDL: declarative topic state -> AdminClient operations.

Mirrors the reference's ``KafkaLogStorage.ensureExists`` /
``ensureCorrectConfiguration`` (kafka/storage-kafka/src/main/scala/io/amient/
affinity/kafka/KafkaLogStorage.scala:338-439): a storage-backed state topic
must be compacted, carry CreateTime timestamps, translate a state TTL into
``retention.ms`` + ``message.timestamp.difference.max.ms`` (policy
``compact,delete``), and have exactly the declared partition count (murmur2
routing breaks silently otherwise) and at least the declared replication.

The AdminClient is injected (any object with the small protocol below), so
the logic is testable without a broker and swappable for kafka-python /
confluent-kafka in a real deployment. No broker exists in this harness; the
mock lives in tests.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

log = logging.getLogger(__name__)

JAVA_LONG_MAX = 9223372036854775807


class TopicAdminProtocol:
    """Duck-typed AdminClient surface ``ensure_topic`` drives.

    - ``list_topics() -> set[str]``
    - ``create_topic(name, num_partitions, replication_factor) -> None``
      (must be idempotent-safe: raising on already-exists is fine, the
      caller re-lists)
    - ``describe_topic(name) -> dict`` with ``num_partitions`` and
      ``replication_factor``
    - ``describe_configs(name) -> dict[str, str]``
    - ``alter_configs(name, entries: dict[str, str]) -> None`` (full
      replacement set, matching the non-incremental alterConfigs the
      reference uses for pre-2.3 broker compat)
    """


@dataclass
class EnsureResult:
    created: bool = False
    altered: dict[str, str] = field(default_factory=dict)
    drift_warnings: dict[str, str] = field(default_factory=dict)


def required_topic_configs(ttl_ms: int) -> dict[str, str]:
    """The config set a state topic must carry (KafkaLogStorage.scala:360-373).

    TTL > 0 turns pure compaction into ``compact,delete`` with retention and
    max timestamp skew pinned to the TTL — expired keys leave the log even
    without a tombstone, matching the reference's memstore TTL semantics.
    """
    effective = str(ttl_ms if ttl_ms > 0 else JAVA_LONG_MAX)
    return {
        "cleanup.policy": "compact,delete" if ttl_ms > 0 else "compact",
        "message.timestamp.type": "CreateTime",
        "message.timestamp.difference.max.ms": effective,
        "retention.ms": effective,
        "retention.bytes": "-1",
    }


def _create_if_not_exists(admin, topic: str, num_partitions: int, replication_factor: int) -> bool:
    if topic in admin.list_topics():
        return False
    admin.create_topic(topic, num_partitions, replication_factor)
    return True


def _verify_layout(admin, topic: str, num_partitions: int, replication_factor: int) -> None:
    desc = admin.describe_topic(topic)
    if num_partitions > 0 and desc["num_partitions"] != num_partitions:
        raise ValueError(
            f"Kafka topic {topic} has {desc['num_partitions']} partitions, "
            f"expecting: {num_partitions}"
        )
    if desc["replication_factor"] < replication_factor:
        raise ValueError(
            f"Kafka topic {topic} has replication {desc['replication_factor']}, "
            f"expecting at least: {replication_factor}"
        )


def ensure_topic(
    admin,
    topic: str,
    ttl_ms: int = 0,
    num_partitions: int = -1,
    replication_factor: int = 1,
    readonly: bool = False,
) -> EnsureResult:
    """Converge a topic onto the declared state (create + verify + configs).

    ``readonly`` topics (external feeds the reference only consumes) are
    never mutated: config drift is reported in ``drift_warnings`` instead of
    altered, same as the reference's warn-only branch.
    """
    result = EnsureResult()
    if num_partitions > 0 and not readonly:
        result.created = _create_if_not_exists(
            admin, topic, num_partitions, replication_factor
        )
        _verify_layout(admin, topic, num_partitions, replication_factor)

    required = required_topic_configs(ttl_ms)
    actual = admin.describe_configs(topic)
    diff = {k: v for k, v in required.items() if actual.get(k) != v}
    if not diff:
        return result
    if readonly:
        log.warning("external topic %s configuration drift: %s", topic, diff)
        result.drift_warnings = diff
        return result
    # full replacement set: required overrides + untouched existing entries
    merged = {**actual, **diff}
    admin.alter_configs(topic, merged)
    result.altered = diff
    return result

"""Kafka source/sink option builders (TimeRange → broker-side seek).

The reference's log scan seeks partitions to a TimeRange with
``offsetsForTimes`` before fetching (affinity
``kafka/storage-kafka/.../KafkaLogStorage.scala:168-285``); its batch view is
one RDD partition per Kafka partition (``spark/.../LogRDD.scala:34-64``).
Spark's kafka source does both natively — this module only *translates*: a
TimeRange becomes ``startingOffsetsByTimestamp``/``endingOffsetsByTimestamp``
so no executor ever reads a record outside the range, and writes stamp an
explicit murmur2 ``partition`` column so topics stay interchangeable with
vanilla Kafka producers (FIXTURES.md §8 invariant).

No broker exists in the test harness; these builders are pure functions and
unit-tested as such. ``read_log`` / ``write_log`` gate on the kafka format
being available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from affinity_spark.functions.murmur2 import kafka_partition_udf
from affinity_spark.timerange import TimeRange


def kafka_batch_options(
    bootstrap: str,
    topic: str,
    num_partitions: int,
    time_range: TimeRange | None = None,
) -> dict[str, str]:
    """Options for ``spark.read.format("kafka")`` bounded by a TimeRange."""
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
    }
    opts.update((time_range or TimeRange.unbounded()).kafka_options(topic, num_partitions))
    return opts


def kafka_stream_options(
    bootstrap: str,
    topic: str,
    starting: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Options for ``spark.readStream.format("kafka")``.

    ``maxOffsetsPerTrigger`` is the backpressure knob standing in for the
    reference's suspend/resume gating (``Group.scala:94-104``).
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": starting,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_log(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    num_partitions: int,
    time_range: TimeRange | None = None,
) -> DataFrame:
    """Bounded batch read of a Kafka log (LogRDD equivalent).

    Returns the raw (key, value, partition, offset, timestamp) frame; decode
    with from_avro/from_json downstream. The residual event-time filter is
    applied on top of the broker seek because offsetsForTimes bounds are
    per-partition monotonic arrival, not exact event time — same residual
    the reference applies via ``TimeRange.contains``.
    """
    reader = spark.read.format("kafka")
    for k, v in kafka_batch_options(bootstrap, topic, num_partitions, time_range).items():
        reader = reader.option(k, v)
    df = reader.load()
    if time_range is not None:
        df = df.filter(time_range.predicate(F.col("timestamp"), "timestamp"))
    return df


def write_log(
    df: DataFrame,
    bootstrap: str,
    topic: str,
    num_partitions: int,
    key_col: str = "key",
    value_col: str = "value",
) -> None:
    """Write (key,value) binary columns to a topic with murmur2 placement.

    Tombstones are rows with a null ``value_col`` (compaction contract).
    """
    out = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).alias("value"),
        kafka_partition_udf(num_partitions)(F.col(key_col)).alias("partition"),
    )
    (
        out.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )

from affinity_spark.sources.kafka import kafka_batch_options, kafka_stream_options
from affinity_spark.sources.keyed_table import KeyedTable

__all__ = ["kafka_batch_options", "kafka_stream_options", "KeyedTable"]

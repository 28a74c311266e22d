from affinity_spark.functions.murmur2 import kafka_partition_udf, murmur2, murmur2_partition
from affinity_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_columns,
    shingles,
    token_count,
    tokenize,
)
from affinity_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "murmur2",
    "murmur2_partition",
    "kafka_partition_udf",
    "tokenize",
    "token_count",
    "shingles",
    "lang_id",
    "quality_columns",
    "doc_fingerprint",
    "cosine_similarity",
    "dot",
    "l2_norm",
]

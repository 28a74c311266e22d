"""JSONL corpus ingestion with corrupt-record dead-lettering.

Training corpora arrive as JSONL shards; at 100 TB some lines are always
malformed (truncated uploads, encoding bugs, crawler junk). The reference's
ingestion stance (AvroSerde rejects bad envelopes loudly rather than
dropping them — avro/.../AvroSerde.scala read path) maps here to Spark's
PERMISSIVE mode + an explicit `_corrupt_record` column: bad lines are
ROUTED, never silently lost, and clean rows keep flowing.

Why not FAILFAST: one bad line in shard 40,000 of a week-long backfill
should quarantine that line, not kill the job. Why not DROPMALFORMED:
silent loss is how corpora rot. The dead-letter split is the same pattern
as `avro_envelope.invalid_envelopes`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read JSONL with the given schema; malformed lines land in
    ``_corrupt_record`` (appended to the schema automatically) instead of
    being dropped. The scan is splittable line-by-line, so shards parallelize
    across executors like any text source.
    """
    full_schema = f"{schema}, {CORRUPT_COL} STRING"
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_corrupt_column, dead_letter_rows).

    Dead-letter rows carry the raw offending line for quarantine/replay —
    write them to a side table, alert on their rate, and the main pipeline
    stays exactly-once over clean rows.

    Call ``.cache()`` on the parsed frame before splitting: Spark disallows
    queries over a raw JSON scan that reference only the corrupt-record
    column (it is populated as a by-product of parsing the data columns),
    and caching also keeps the two branches from re-reading the shard.
    """
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, dead

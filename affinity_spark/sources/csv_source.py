"""CSV/TSV corpus ingestion with the same dead-letter contract as JSONL.

Tabular training metadata (manifests, label files, crawl indexes) ships as
CSV/TSV at least as often as JSONL; the failure modes are identical
(truncated rows, quote damage, wrong column counts). Same stance as
``sources/jsonl.py``: PERMISSIVE + an explicit ``_corrupt_record`` column —
bad rows are ROUTED to a dead-letter frame, never silently dropped
(DROPMALFORMED) and never job-killing (FAILFAST).

The reader is splittable per line (multiLine stays off by default), so
shards parallelize like any text source; schema is explicit, never
inferred — inference is a full extra pass over 100 TB and a determinism
hazard across shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from affinity_spark.sources.jsonl import CORRUPT_COL, split_corrupt

__all__ = ["read_csv", "split_corrupt", "CORRUPT_COL"]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
    header: bool = False,
) -> DataFrame:
    """Read delimited text with an explicit schema; malformed rows land in
    ``_corrupt_record``. ``sep="\\t"`` reads TSV. ``split_corrupt`` (shared
    with the JSONL source) separates clean rows from the dead-letter frame.
    """
    full_schema = f"{schema}, {CORRUPT_COL} STRING"
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("enforceSchema", "true")
        .csv(path)
    )

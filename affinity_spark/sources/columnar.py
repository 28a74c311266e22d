"""Columnar batch IO (Parquet / ORC) with scale-safe defaults.

The reference's batch storage SPI is pluggable by format (S2); Spark-first
that is the DataSource V2 format registry. This module pins the repo's
conventions on top of it:

- explicit format choice (``parquet`` default, ``orc`` for ORC-standard
  lakes) — both splittable, column-pruned, and filter-pushdown-capable;
- hive-style ``partitionBy`` layout so partition-key predicates prune
  directories before any file is opened;
- reads take an optional expected schema and fail loudly on drift
  (silent column-type drift is how 100 TB backfills go wrong).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc")


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    mode: str = "error",
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_columnar(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    expected_schema: str | None = None,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    df = spark.read.format(fmt).load(path)
    if expected_schema is not None:
        expected = spark.createDataFrame([], expected_schema).schema
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        want = {f.name: f.dataType.simpleString() for f in expected.fields}
        if got != want:
            raise ValueError(f"schema drift at {path}: got {got}, want {want}")
    return df

"""Test-data table loading.

The synthetic star schema lives at /root/testdata/sf*/<table>.parquet
(TESTDATA.md). ``load`` is a thin ``spark.read.parquet`` — declarative scans
so Catalyst gets predicate pushdown and column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables a planner should always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

# Tables whose queries are CPU-bound per row (shingling, hashing, vector
# math). A small table arrives as ONE parquet split and would otherwise run
# the whole pipeline on one core; spread it to cluster parallelism. At real
# scale the file count provides the splits and the repartition is a no-op
# branch (n_parts >= cores).
CPU_HEAVY_TABLES = frozenset({"documents", "embeddings"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pin_session_conf(spark: SparkSession) -> None:
    """Pin runtime confs that correctness depends on, whatever session we get.

    The harness may hand us an externally-built SparkSession, so the loader
    (not only our session factory) enforces:
    - UTC session timezone — event-time literals/formatting must not depend
      on host TZ;
    - nanosAsLong — the `events` table is written with parquet
      TIMESTAMP(NANOS), which Spark 4 otherwise refuses to read. We read the
      raw int64 nanos and convert to a proper TimestampType column below
      (micros truncation, matching how micro-resolution engines read ns).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


# (applicationId, abspath, physical fingerprint) -> normalized DataFrame.
# A load() used to cost ~0.1-0.25 s of DRIVER work per call — JVM file
# listing + footer schema read, plus an rdd.getNumPartitions() plan
# conversion for the CPU-heavy tables — and every registry query pays it
# per referenced table. Across a ~170-query bench/gate pass that driver
# constant WAS the "fixed-overhead growth" in the headline set (r13
# verdict #2). DataFrames are immutable plan fragments, so reusing one per
# (session, physical file) is safe; the mtime+size fingerprint evicts the
# memo when the driver regenerates testdata at the same path.
_LOAD_MEMO: dict = {}


def _file_fingerprint(path: str) -> tuple:
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return (None, None)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.abspath(os.path.join(sf_dir, f"{name}.parquet"))
    key = (spark.sparkContext.applicationId, path, _file_fingerprint(path))
    cached = _LOAD_MEMO.get(key)
    if cached is not None:
        return cached
    _pin_session_conf(spark)
    df = spark.read.parquet(path)
    # Normalize timestamp physical variants to one logical type (TimestampType
    # under the pinned UTC session) so operators see a stable schema whatever
    # the generator wrote:
    # - TIMESTAMP(NANOS) arrives as long under nanosAsLong → truncate to
    #   micros (matching micro-resolution engines reading ns);
    # - TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ →
    #   cast to TIMESTAMP (identity on the wall-clock value under UTC; NTZ
    #   additionally refuses numeric casts like ts::long in ANSI mode).
    # Both are cheap projections; pushdown survives post-fold.
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.typeName() in ("long", "bigint"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    if name in CPU_HEAVY_TABLES:
        parallelism = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < parallelism:
            df = df.repartition(parallelism)
    _LOAD_MEMO[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries work."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)

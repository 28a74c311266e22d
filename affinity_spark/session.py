"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for correctness-at-scale first:
- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- UTC session timezone (event-time semantics must not depend on host TZ)
- Arrow on (pandas UDF fast path for the few Python-side operators)
- shuffle partitions sized for the local harness; on a real cluster this is
  overridden per-job (rule of thumb: ~2-3x total cores, or let AQE coalesce
  from a high initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    # events.parquet carries TIMESTAMP(NANOS); read as long + convert (tables.py)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # runtime row-group pruning for selective shuffle joins: the filtered
    # dim side builds a bloom filter that is pushed into the fact scan —
    # at 100 TB this skips most of the fact read for selective joins.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # parquet scan efficiency: pushdown + pruning are on by default in Spark,
    # these make the intent explicit and pin behavior.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.parquet.columnarReaderBatchSize": "4096",
    # broadcast joins for dimension tables (region/nation/customer-sized).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Let AQE coalesce the OUTPUT partitioning of cached plans (off by
    # default in Spark). Without it every persisted frame materializes at
    # the full shuffle-partition count, so model-sized cached frames
    # (vocab/seed/model rows) fan every downstream stage — pandas-UDF
    # stages especially — into shuffle.partitions tasks of ~1 row each;
    # each Arrow task costs ~230 ms of parked (0-CPU) runtime even on
    # reused workers (r15 probe). AQE sizes cached output by BYTES, so
    # the lever is scale-adaptive: corpus-sized cached frames keep their
    # parallelism, and CPU-dense-per-byte cached frames (cheap bytes,
    # heavy downstream kernels) pin their parallelism with an explicit
    # repartition before persist — user repartitions are exempt from
    # coalescing through the cache boundary (probed r15), the same
    # exemption the r14 tfidf_pairs discipline relies on.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
}


def get_spark(
    app_name: str = "affinity-spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if unset)
    so the same entry points work in the test harness and on a cluster where
    master comes from spark-submit.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is None:
        master = "local[*]"
    # Only set master when we're not running under an external cluster manager.
    if not os.environ.get("SPARK_MASTER_URL"):
        builder = builder.master(master)
    merged = dict(_DEFAULTS)
    if conf:
        merged.update(conf)
    # parallelism-invariance runs override the partition count from the
    # environment (results must not depend on partitioning — integer math
    # and deterministic orders everywhere make this testable). Applied
    # AFTER the caller's conf so the sweep cannot be silently shadowed by
    # a hardcoded conf value (e.g. the test fixture's).
    if "SPARK_GRAFT_SHUFFLE_PARTITIONS" in os.environ:
        merged["spark.sql.shuffle.partitions"] = os.environ[
            "SPARK_GRAFT_SHUFFLE_PARTITIONS"
        ]
    # A/B lever for the cached-plan AQE default above (same post-conf
    # precedence rationale as the shuffle-partition sweep).
    if "SPARK_GRAFT_CACHED_PLAN_AQE" in os.environ:
        merged["spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"] = (
            os.environ["SPARK_GRAFT_CACHED_PLAN_AQE"]
        )
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

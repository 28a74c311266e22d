"""Cached-plan output partitioning (r15 session default).

``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true`` lets
AQE right-size a persisted frame's materialized partitioning by BYTES —
without it, every post-shuffle cached frame lands at the full
shuffle-partition count, so model-sized cached frames (vocab/seed/model
rows) fan each downstream stage (Arrow/pandas-UDF stages especially)
into shuffle.partitions tasks of ~1 row each, each paying a
python-worker round trip of parked (0-CPU) runtime.

The safety valve the repo's CPU-dense cached frames rely on: a USER
repartition at the top of the cached plan is exempt from coalescing
through the cache boundary, so frames that are cheap in bytes but feed
heavy kernels (pipeline keepers, the r14 tfidf_pairs shape) pin their
parallelism explicitly. Both properties are pinned here because the
session default is only correct while BOTH hold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from affinity_spark.session import _DEFAULTS


def test_session_default_enables_cached_plan_aqe():
    assert (
        _DEFAULTS["spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"]
        == "true"
    )


def test_cached_post_shuffle_frame_is_byte_coalesced(spark):
    # tiny-bytes aggregate: AQE should collapse the cached output to
    # far fewer partitions than spark.sql.shuffle.partitions
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    agg = (
        spark.range(0, 10000, 1, 4)
        .withColumn("k", F.col("id") % 7)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cached = agg.persist()
    try:
        cached.collect()
        assert cached.rdd.getNumPartitions() < max(parts, 2)
    finally:
        cached.unpersist()


def test_user_repartition_pin_survives_cache_boundary(spark):
    agg = (
        spark.range(0, 10000, 1, 4)
        .withColumn("k", F.col("id") % 7)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pinned = agg.repartition(4, "k").persist()
    try:
        pinned.collect()
        assert pinned.rdd.getNumPartitions() == 4
    finally:
        pinned.unpersist()

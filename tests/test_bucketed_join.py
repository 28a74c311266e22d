"""Bucketed (co-located) joins: the 100 TB strategy for repeated big-big
joins on a stable key — both sides pre-bucketed on the join key mean the
join plans WITHOUT any Exchange (no shuffle at query time). This is the
engine's answer to the reference's aligned-partitioning contract (both
state and its changelog share murmur2 placement, README.md:92-98)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from affinity_spark.plans.introspect import executed_plan, n_exchanges


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customers")
    orders = spark.createDataFrame(
        [(i, i % 100, float(i)) for i in range(10_000)], "o_id long, cust long, amt double"
    )
    custs = spark.createDataFrame(
        [(i, f"c{i}") for i in range(100)], "cust long, name string"
    )
    (
        orders.write.bucketBy(8, "cust").sortBy("cust")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        custs.write.bucketBy(8, "cust").sortBy("cust")
        .mode("overwrite").saveAsTable("b_customers")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customers")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = (
            spark.table("b_orders")
            .join(spark.table("b_customers"), "cust")
            .groupBy("name")
            .agg(F.sum("amt").alias("total"))
        )
        plan = executed_plan(joined)
        assert "SortMergeJoin" in plan
        # co-located: the join itself required zero exchanges; the only
        # shuffle is the final aggregate on `name`
        assert n_exchanges(joined) == 1, plan
        # correctness unchanged
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_same_join_shuffles_both_sides(spark, bucketed_pair):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.table("b_orders").repartition(4)  # strips bucket info
        custs = spark.table("b_customers").repartition(4)
        joined = orders.join(custs, "cust").groupBy("name").agg(F.sum("amt").alias("t"))
        # both join inputs exchange + final agg exchange
        assert n_exchanges(joined) >= 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

"""Top-K operators (SURVEY §2.8): latest-N per key (X6/O2), global top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from affinity_spark.operators.topk import global_top_n, top_n_per_group


def test_top_n_per_group(spark):
    rows = [(g, i, g * 100 + i) for g in (1, 2) for i in range(5)]
    df = spark.createDataFrame(rows, "g int, i int, score int")
    got = top_n_per_group(df, ["g"], [F.col("score").desc()], 2)
    by_g = {}
    for r in got.collect():
        by_g.setdefault(r.g, []).append(r.score)
    assert sorted(by_g[1], reverse=True) == [104, 103]
    assert sorted(by_g[2], reverse=True) == [204, 203]


def test_top_n_per_group_rank_col(spark):
    df = spark.createDataFrame([(1, 10), (1, 20), (1, 30)], "g int, v int")
    got = top_n_per_group(df, ["g"], [F.col("v").desc()], 2, rank_col="rk").collect()
    assert {(r.v, r.rk) for r in got} == {(30, 1), (20, 2)}


def test_global_top_n(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v int")
    got = [r.v for r in global_top_n(df, [F.col("v").desc()], 3).collect()]
    assert got == [99, 98, 97]


def test_global_top_n_plans_take_ordered(spark):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject, not a full sort."""
    df = spark.createDataFrame([(i,) for i in range(100)], "v int")
    plan = global_top_n(df, [F.col("v").desc()], 3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_window_group_limit_pushdown(spark):
    """row_number()<=k should activate WindowGroupLimit so no group
    materializes more than k rows on the reduce side (scale guard)."""
    rows = [(g, i) for g in range(3) for i in range(10)]
    df = spark.createDataFrame(rows, "g int, v int")
    plan = (
        top_n_per_group(df, ["g"], [F.col("v").desc()], 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan

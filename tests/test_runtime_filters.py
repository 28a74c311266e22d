"""Runtime bloom-filter injection: the selective-join scan-skipping path.

At 100 TB the win is structural: a selective filter on the dim side of a
shuffle join becomes a bloom filter evaluated INSIDE the fact scan, so most
fact rows never reach the shuffle. The thresholds here are lowered only to
make the optimizer fire on test-sized data — production defaults
(creation side <= 10 MB plan size) are sane and left alone in session.py.
"""

import pytest
from pyspark.sql import functions as F

_TUNED = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def tuned(spark):
    old = {k: spark.conf.get(k, None) for k in _TUNED}
    for k, v in _TUNED.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_selective_join_injects_bloom_filter_into_fact_scan(tuned, tmp_path):
    spark = tuned
    fact = spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v")
    )
    dim = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("tag")
    )
    fact.write.parquet(str(tmp_path / "fact"))
    dim.write.parquet(str(tmp_path / "dim"))

    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("tag") == 3)
    j = f.join(d, "k")
    rows = j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()

    # the fact side carries a might_contain(...) built from the dim side
    assert "might_contain" in plan and "bloom_filter_agg" in plan
    # semi-reduction only — results identical to the unfiltered plan
    assert len(rows) == sum(1 for i in range(20_000) if i % 7 == 3)


def test_parquet_aggregate_pushdown_answers_from_footers(spark, tmp_path):
    """count/min/max over a parquet table resolve from file footers (DSv2
    scan carries the pushed aggregate) — at 100 TB this is the difference
    between reading metadata and reading every row."""
    spark.range(0, 10_000).selectExpr("id", "id % 5 as g").write.parquet(
        str(tmp_path / "t")
    )
    old = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        q = spark.read.parquet(str(tmp_path / "t")).agg(
            F.count("*").alias("n"), F.min("id").alias("mn"), F.max("id").alias("mx")
        )
        assert q.collect()[0] == (10_000, 0, 9_999)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation: [COUNT(*), MIN(id), MAX(id)]" in plan
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", old)


def test_cbo_statistics_drive_cardinality_estimates(spark):
    """ANALYZE TABLE feeds the cost-based optimizer: with column stats the
    join's estimated rowCount reflects key multiplicity × filter
    selectivity — the input join reordering and strategy choice need at
    warehouse scale (estimates, not guesses)."""
    old = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        spark.sql("DROP TABLE IF EXISTS cbo_big")
        spark.sql("DROP TABLE IF EXISTS cbo_small")
        spark.range(0, 100_000).selectExpr("id", "id % 1000 as fk").write.saveAsTable("cbo_big")
        spark.range(0, 500).selectExpr("id as fk", "id % 7 as tag").write.saveAsTable("cbo_small")
        spark.sql("ANALYZE TABLE cbo_big COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.sql("ANALYZE TABLE cbo_small COMPUTE STATISTICS FOR ALL COLUMNS")

        stats = [r for r in spark.sql("DESCRIBE TABLE EXTENDED cbo_big").collect()
                 if r.col_name == "Statistics"]
        assert stats and "100000 rows" in stats[0].data_type

        q = spark.sql(
            "SELECT count(*) FROM cbo_big JOIN cbo_small ON cbo_big.fk = cbo_small.fk "
            "WHERE cbo_small.tag = 3"
        )
        sw = q._jdf.queryExecution().stringWithStats()
        join_lines = [l for l in sw.splitlines() if "Join Inner" in l and "rowCount" in l]
        assert join_lines, "optimized plan must carry Statistics(rowCount=...) on the join"
        import re
        m = re.search(r"rowCount=([0-9.E+]+)", join_lines[0])
        est = float(m.group(1))
        # truth: 100000 rows × (500/1000 key hit rate) × (1/7 tag filter) ≈ 7.1e3
        assert 1e3 < est < 5e4, f"estimate {est} ignores stats"
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old)
        spark.sql("DROP TABLE IF EXISTS cbo_big")
        spark.sql("DROP TABLE IF EXISTS cbo_small")

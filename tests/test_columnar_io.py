"""Parquet/ORC roundtrip, partition pruning, and pushdown parity."""

import pytest
from pyspark.sql import functions as F

from affinity_spark.sources.columnar import read_columnar, write_columnar


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(i, f"u{i % 4}", float(i)) for i in range(100)],
        "id long, user string, value double",
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_roundtrip_identical(spark, tmp_path, fmt, sample):
    path = str(tmp_path / fmt)
    write_columnar(sample, path, fmt=fmt)
    back = read_columnar(spark, path, fmt=fmt, expected_schema="id long, user string, value double")
    assert sorted(back.collect()) == sorted(sample.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_filter_pushdown_reaches_scan(spark, tmp_path, fmt, sample):
    path = str(tmp_path / fmt)
    write_columnar(sample, path, fmt=fmt)
    q = read_columnar(spark, path, fmt=fmt).filter(F.col("id") > 90).select("id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(id)" in plan
    assert q.count() == 9


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_partition_pruning(spark, tmp_path, fmt, sample):
    path = str(tmp_path / f"part_{fmt}")
    write_columnar(sample, path, fmt=fmt, partition_by=["user"])
    q = read_columnar(spark, path, fmt=fmt).filter(F.col("user") == "u1")
    # partition-key predicate prunes directories before any file opens
    scan = q._jdf.queryExecution().executedPlan().toString()
    assert q.count() == 25
    assert "PartitionFilters: [" in scan and "isnotnull(user" in scan


def test_schema_drift_fails_loudly(spark, tmp_path, sample):
    path = str(tmp_path / "drift")
    write_columnar(sample, path)
    with pytest.raises(ValueError, match="schema drift"):
        read_columnar(spark, path, expected_schema="id long, user string, value string")

"""Declarative quality constraints: counts, uniqueness, referential, gate."""

import pytest

from affinity_spark.operators import constraints as C


def _dirty(spark):
    return spark.createDataFrame(
        [
            (1, "O", 10.0, "1-URGENT"),
            (1, "O", 20.0, "2-HIGH"),          # duplicate key
            (2, None, 30.0, "3-MEDIUM"),       # null status
            (3, "X", -5.0, "9-BOGUS"),         # bad set, bad range, bad pattern
            (4, "F", 40.0, "5-LOW"),
        ],
        "k long, status string, price double, prio string",
    )


def test_violation_counts_single_pass(spark):
    df = _dirty(spark)
    rules = [
        C.not_null("status"),
        C.in_set("status", ["O", "F", "P"]),
        C.in_range("price", 0.0, 100.0),
        C.matches("prio", r"^[1-5]-"),
    ]
    row = C.violation_counts(df, rules).collect()[0]
    assert row["not_null(status)"] == 1
    assert row["in_set(status)"] == 2          # null counts as not-in-set
    assert row["in_range(price)"] == 1
    assert row["matches(prio)"] == 1
    # ONE aggregate node: no per-rule scans
    plan = C.violation_counts(df, rules)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_duplicate_and_orphan_counts(spark):
    df = _dirty(spark)
    assert C.duplicate_key_count(df, ["k"]).collect()[0].duplicate_rows == 1
    child = spark.createDataFrame([(1,), (9,), (9,)], "k long")
    assert (
        C.orphan_count(child, df.select("k"), [("k", "k")]).collect()[0].orphan_rows
        == 2
    )


def test_assert_clean_gate(spark):
    clean = spark.createDataFrame([(1, "O")], "k long, status string")
    row = C.violation_counts(clean, [C.not_null("status")]).collect()[0]
    C.assert_clean(row)  # no raise

    row = C.violation_counts(_dirty(spark), [C.not_null("status")]).collect()[0]
    with pytest.raises(ValueError, match="not_null"):
        C.assert_clean(row, "orders")

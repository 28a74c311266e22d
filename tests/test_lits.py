"""The single-expression literal constructors must be value- and
type-identical to the per-scalar ``F.lit`` forms they replaced (the py4j
round-trip optimization must be invisible to every plan that uses it)."""

import math

from pyspark.sql import functions as F

from affinity_spark.functions.lits import (
    double_array_lit,
    double_matrix_lit,
    long_array_lit,
)

TRICKY = [
    0.0,
    -0.0,
    1.5,
    -1.5,
    0.1,
    1e-308,
    1.7976931348623157e308,
    3.141592653589793,
    -2.2250738585072014e-308,
    123456789.123456789,
    float("inf"),
    float("-inf"),
]


def test_double_array_lit_bit_identical(spark):
    row = spark.range(1).select(
        double_array_lit(TRICKY).alias("fast"),
        F.lit([float(x) for x in TRICKY]).alias("slow"),
    ).first()
    assert [x for x in row.fast] == [x for x in row.slow]
    got = dict(spark.range(1).select(double_array_lit(TRICKY).alias("v")).dtypes)
    assert got["v"] == "array<double>"


def test_double_array_lit_nan(spark):
    row = spark.range(1).select(double_array_lit([float("nan"), 1.0]).alias("v")).first()
    assert math.isnan(row.v[0]) and row.v[1] == 1.0


def test_double_matrix_lit_bit_identical(spark):
    rows = [TRICKY[:4], TRICKY[4:8]]
    row = spark.range(1).select(
        double_matrix_lit(rows).alias("fast"),
        F.lit([[float(x) for x in r] for r in rows]).alias("slow"),
    ).first()
    assert [list(r) for r in row.fast] == [list(r) for r in row.slow]


def test_long_array_lit_bit_identical(spark):
    vals = [0, 1, -1, 1 << 31, 1 << 62, -(1 << 62), (1 << 63) - 1]
    row = spark.range(1).select(
        long_array_lit(vals).alias("fast"),
        F.lit(vals).alias("slow"),
    ).first()
    assert list(row.fast) == list(row.slow) == vals
    got = dict(spark.range(1).select(long_array_lit(vals).alias("v")).dtypes)
    assert got["v"] == "array<bigint>"

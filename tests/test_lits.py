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


def _parity(spark, rows, ddl):
    import struct

    from affinity_spark.functions.lits import local_df

    got = local_df(spark, rows, ddl)
    ref = spark.createDataFrame(rows, ddl)
    assert got.schema == ref.schema
    def canon(df):
        out = []
        for r in df.collect():
            row = []
            for v in r:
                if isinstance(v, float):
                    row.append(struct.pack(">d", v))
                elif isinstance(v, list):
                    row.append(tuple(
                        struct.pack(">d", x) if isinstance(x, float) else x
                        for x in v
                    ) if any(isinstance(x, float) for x in v) else tuple(v))
                else:
                    row.append(v)
            out.append(tuple(row))
        return sorted(out, key=repr)
    assert canon(got) == canon(ref)
    return got


def test_local_df_parity_scalars(spark):
    """Bit-exact value/schema parity with createDataFrame across the
    supported scalar types, including escaping-hostile strings, extreme
    ints, ±0.0 / inf / NaN doubles and NULLs."""
    rows = [
        (1, (1 << 63) - 1, "plain", 1.5, True),
        (-2, -(1 << 63), "qu'ote \\ back\\slash", -0.0, False),
        (0, 0, "new\nline\ttab é中", float("inf"), None),
        (None, None, None, float("nan"), True),
        (3, 7, "", float("-inf"), False),
        (4, 8, "dollar $ brace { } ; -- comment '; DROP", 1e-308, True),
    ]
    _parity(spark, rows, "a int, b bigint, s string, d double, f boolean")


def test_local_df_parity_arrays_and_empty(spark):
    rows = [
        ([1, 2, 3], [1.0, -0.0], ["x", "y'z"]),
        ([], [], []),
        (None, [float("nan")], None),
    ]
    _parity(
        spark, rows,
        "la array<bigint>, da array<double>, sa array<string>",
    )
    # zero-row input stays a (typed, empty) LocalRelation
    empty = _parity(spark, [], "k bigint, v string")
    assert empty.count() == 0


def test_local_df_is_a_local_relation(spark):
    """The whole point: no python-RDD scan stage — the analyzed plan is a
    LocalRelation (createDataFrame plans a Scan ExistingRDD whose every
    job runs defaultParallelism python-worker tasks)."""
    from affinity_spark.functions.lits import local_df

    df = local_df(spark, [(1, "a"), (2, "b")], "k bigint, v string")
    plan = df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
    assert "LocalRelation" in plan and "ExistingRDD" not in plan


def test_local_df_rejects_type_mismatch(spark):
    import pytest as _pytest

    from affinity_spark.functions.lits import local_df

    with _pytest.raises(TypeError):
        local_df(spark, [(1.5,)], "k bigint")
    with _pytest.raises(TypeError):
        local_df(spark, [(True,)], "k bigint")


def test_local_df_large_fallback_keeps_schema(spark):
    from affinity_spark.functions.lits import local_df

    rows = [(i,) for i in range(50)]
    df = local_df(spark, rows, "k bigint", max_inline_rows=10)
    assert df.schema == spark.createDataFrame(rows, "k bigint").schema
    assert sorted(r.k for r in df.collect()) == list(range(50))

"""Bit-identity of the flat fixed-dim vector forms vs the HOF folds.

The fixed forms (functions/vectors.py) exist so pairwise/ANN scoring runs
in whole-stage codegen instead of the interpreted zip_with/aggregate
fallback (r15, guide §4.1). Their contract: IDENTICAL doubles on every
well-formed input (same per-term IEEE ops, same left-associated order),
NULL parity for NULL arrays (except l2_norm_fixed's documented 0.0), and
a loud raise on drifted dims."""

import math

import pytest
from pyspark.sql import functions as F

from affinity_spark.functions.vectors import (
    cosine_similarity,
    cosine_similarity_fixed,
    dot,
    dot_fixed,
    l2_norm,
    l2_norm_fixed,
)

DIM = 8


def _frame(spark, rows):
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "id long, va array<float>, vb array<float>",
    )


HOSTILE = [
    ([1.0] * DIM, [2.0] * DIM),
    ([0.0] * DIM, [1.5] * DIM),  # zero norm -> NULL cosine
    ([-0.0] * DIM, [-0.0] * DIM),
    ([1e-38] * DIM, [1e38] * DIM),  # denormal-ish x huge
    ([float("inf")] + [1.0] * (DIM - 1), [1.0] * DIM),
    ([float("nan")] + [1.0] * (DIM - 1), [1.0] * DIM),
    ([3.14159, -2.71828, 1e-7, -1e7, 0.5, -0.25, 123.456, -0.001],
     [-1.1, 2.2, -3.3, 4.4, -5.5, 6.6, -7.7, 8.8]),
    (None, [1.0] * DIM),  # NULL array
    ([1.0] * DIM, None),
]


def test_fixed_forms_bit_identical(spark):
    df = _frame(spark, HOSTILE)
    out = df.select(
        "id",
        dot(F.col("va"), F.col("vb")).alias("d_hof"),
        dot_fixed("va", "vb", DIM).alias("d_fix"),
        l2_norm(F.col("va")).alias("n_hof"),
        l2_norm_fixed("va", DIM).alias("n_fix"),
        cosine_similarity(F.col("va"), F.col("vb")).alias("c_hof"),
        cosine_similarity_fixed("va", "vb", DIM).alias("c_fix"),
    ).collect()
    for r in out:
        # dot: exact NULL parity + bit equality (NaN == NaN bitwise)
        assert (r.d_hof is None) == (r.d_fix is None), r
        if r.d_hof is not None:
            assert math.isnan(r.d_hof) == math.isnan(r.d_fix), r
            if not math.isnan(r.d_hof):
                assert r.d_hof == r.d_fix, r
        # l2_norm_fixed: NULL input -> 0.0 (documented; every consumer
        # guards the denominator with != 0 so it is indistinguishable)
        if r.n_hof is None:
            assert r.n_fix == 0.0, r
        elif math.isnan(r.n_hof):
            assert math.isnan(r.n_fix), r
        else:
            assert r.n_hof == r.n_fix, r
        assert (r.c_hof is None) == (r.c_fix is None), r
        if r.c_hof is not None:
            assert math.isnan(r.c_hof) == math.isnan(r.c_fix), r
            if not math.isnan(r.c_hof):
                assert r.c_hof == r.c_fix, r


def test_fixed_forms_random_exhaustive(spark):
    import random

    rng = random.Random(0xA5F152)
    rows = [
        (
            [rng.uniform(-2, 2) for _ in range(DIM)],
            [rng.uniform(-2, 2) for _ in range(DIM)],
        )
        for _ in range(500)
    ]
    df = _frame(spark, rows)
    bad = df.select(
        dot(F.col("va"), F.col("vb")).alias("d_hof"),
        dot_fixed("va", "vb", DIM).alias("d_fix"),
        cosine_similarity(F.col("va"), F.col("vb")).alias("c_hof"),
        cosine_similarity_fixed("va", "vb", DIM).alias("c_fix"),
    ).filter(
        "d_hof IS DISTINCT FROM d_fix OR c_hof IS DISTINCT FROM c_fix"
    ).count()
    assert bad == 0


def test_fixed_forms_raise_on_drifted_dim(spark):
    df = spark.sql(
        "SELECT array_repeat(CAST(1.0 AS FLOAT), 7) AS va, "
        "array_repeat(CAST(1.0 AS FLOAT), 8) AS vb"
    )
    with pytest.raises(Exception, match="dim"):
        df.select(dot_fixed("va", "vb", DIM)).collect()
    with pytest.raises(Exception, match="dim"):
        df.select(l2_norm_fixed("va", DIM)).collect()


def test_l2_norm_fixed_is_non_nullable(spark):
    """The non-nullable output is load-bearing: a nullable norm lets
    InferFiltersFromConstraints derive isnotnull(norm) from a
    `denom != 0` filter and push the SUBSTITUTED 64-term sum into the
    scan filter — generated twice per row and beyond janino's 64KB
    method limit (the r15 batch_search compile-fallback finding)."""
    df = spark.sql("SELECT array_repeat(CAST(1.0 AS FLOAT), 8) AS va")
    field = df.select(l2_norm_fixed("va", DIM).alias("n")).schema["n"]
    assert not field.nullable

"""Vector math over array<float|double> columns — JVM-side built-ins only.

``F.zip_with`` + ``F.aggregate`` keep dot products inside codegen; no Python,
no UDF serialization. For very wide vectors (>1k dims) a numpy pandas UDF can
win on SIMD — ``affinity_spark.operators.similarity`` offers that variant —
but at 64-768 dims the built-in expression path benchmarks faster end-to-end
because it avoids Arrow transfer entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL for zero-norm inputs.

    The zero guard matters under Spark 4's default ANSI mode, where a plain
    ``x / 0.0`` raises DIVIDE_BY_ZERO — one degenerate vector must not kill
    a 100 TB job. NULL similarities sort last / drop out of thresholds.
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)

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


def srp_signs(d: int, p: int) -> list[list[int]]:
    """±1 sign matrix for signed random projection, md5-derived from the
    (input-dim, output-dim) pair — a pure function of (d, p), so any engine
    (or the DuckDB oracle) regenerates it independently and bit-exactly.
    Row j is the projection vector for output dimension j."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{i},{j}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for i in range(d)
        ]
        for j in range(p)
    ]


def srp_project(vec: Column, signs: list[list[int]], scale: int = 1 << 20) -> Column:
    """Signed-random-projection dimensionality reduction (the dense-JL
    construction with ±1 entries, Achlioptas 2003): ``array<float>[d]`` →
    ``array<bigint>[p]`` with ``y_j = Σ_i signs[j][i] · floor(v_i·scale + ½)``.

    Entirely map-side (zero shuffle), entirely codegen-able expressions,
    and EXACT integer output: the input is fixed-point quantized once (one
    pass, let-bound) and every later sum/product is int64, so two engines
    — or two runs on differently-partitioned data — agree bit-for-bit.
    ASSUMES |v_i| ≤ 1 (unit-ish inputs): then with scale 2^20,
    |y_j| ≤ d·2^20 and the downstream dot of two projections ≤
    p·(d·2^20)² — inside int64 for d ≤ 64, p ≤ 16. Inputs with |v_i|
    around B shrink that headroom by B² — under ANSI mode an overflow is
    a job-killing exception, not a wrap — so for unnormalized vectors
    pass ``scale ≈ (1 << 20) // B`` (or l2-normalize first); the bound to
    keep is p·(d·B·scale)² < 2^63.

    The sign matrix embeds as ONE nested array literal (two plan nodes
    total, not d·p — the plan-compile-time lesson)."""
    s_lit = F.lit(signs)
    q = F.transform(
        vec, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long")
    )

    def project(qq: Column) -> Column:
        return F.transform(
            s_lit,
            lambda srow: F.aggregate(
                F.zip_with(srow, qq, lambda s, v: s.cast("long") * v),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )

    # let-bind the quantized vector: quantization runs once, not once per
    # output dimension
    proj = F.transform(F.array(q), project).getItem(0)
    # loud dim guard: the sign matrix is FIXED d-wide — a drifted corpus
    # width would otherwise project a prefix silently (zip_with pads with
    # NULL; r12 verdict #5: assert fixed-matrix dims at query build).
    # A NULL vector is NOT a dim mismatch — it projects to NULL
    d = len(signs[0]) if signs else 0
    return (
        F.when(vec.isNull(), F.lit(None).cast("array<bigint>"))
        .when(F.size(vec) == d, proj)
        .otherwise(
            F.raise_error(
                F.lit(f"srp_project: input dim != sign-matrix dim {d}")
            )
        )
    )


def dot_int(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two array<bigint> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL for zero-norm inputs.

    The zero guard matters under Spark 4's default ANSI mode, where a plain
    ``x / 0.0`` raises DIVIDE_BY_ZERO — one degenerate vector must not kill
    a 100 TB job. NULL similarities sort last / drop out of thresholds.
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)

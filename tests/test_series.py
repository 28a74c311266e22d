"""Time-series family (registry/series.py): the Arrow-vectorized motif
kernel must equal the expression-level packed-long twin (same windows,
same L1, same lexicographic tie-break) — the whole-plan-in-Catalyst
reference pins the fast kernel's semantics."""

import random

from pyspark.sql import functions as F

from affinity_spark.registry.series import (
    _motif_expression_level,
    _motif_kernel,
)


def _series_df(spark, n_users=12, seed=3):
    rng = random.Random(seed)
    rows = []
    for u in range(n_users):
        # mix: flat users, spiky users, and an exact repeated motif
        v = [rng.randrange(0, 5) for _ in range(64)]
        if u % 3 == 0:
            pattern = [9, 1, 7, 2, 8, 3, 6, 4]
            v[4:12] = pattern
            v[40:48] = pattern  # exact motif -> l1 == 0
        rows.append((u, v))
    return spark.createDataFrame(rows, "user_id long, v array<long>")


def test_motif_kernel_equals_expression_twin(spark):
    series = _series_df(spark)
    fast = {
        (r["user_id"], r["w_i"], r["w_j"], r["l1_dist"])
        for r in series.select(
            "user_id", _motif_kernel(F.col("v")).alias("_m")
        ).select("user_id", "_m.w_i", "_m.w_j", "_m.l1_dist").collect()
    }
    slow = {
        (r["user_id"], r["w_i"], r["w_j"], r["l1_dist"])
        for r in _motif_expression_level(series).collect()
    }
    assert fast == slow
    # the planted exact motif is found with distance 0
    planted = {t for t in fast if t[0] % 3 == 0}
    assert all(t[3] == 0 for t in planted)
    assert (0, 4, 40, 0) in fast

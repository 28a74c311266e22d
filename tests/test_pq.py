"""Product quantization: training determinism, encode/ADC agreement with a
numpy model, and the plan shape (map-side encode, TakeOrdered search)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from affinity_spark.operators.pq import adc_search, assign_codes, train_pq


def _vectors(spark, n=40, dim=8):
    rows = [
        (i, [float(((i * 13 + d * 7) % 21) - 10) for d in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_train_shapes_and_determinism(spark):
    emb = _vectors(spark)
    books = train_pq(emb, m=2, k=4, dim=8, n_iter=2)
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    assert all(len(c) == 4 for b in books for c in b)
    assert books == train_pq(emb, m=2, k=4, dim=8, n_iter=2)


def test_dim_not_divisible_raises(spark):
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(_vectors(spark), m=3, k=2, dim=8)


def test_codes_and_adc_match_numpy(spark):
    import numpy as np

    emb = _vectors(spark)
    books = train_pq(emb, m=2, k=4, dim=8, n_iter=2)
    codes = assign_codes(emb, books)
    got = {r.vec_id: (r.code_0, r.code_1) for r in codes.collect()}

    X = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    B = [np.array(b) for b in books]
    for vid, x in X.items():
        expect = tuple(
            int(((x[s * 4 : (s + 1) * 4] - B[s]) ** 2).sum(axis=1).argmin())
            for s in range(2)
        )
        assert got[vid] == expect, vid

    query = [0.0] * 8
    top = adc_search(codes, books, query, k=5).collect()
    # numpy ADC: distance table per subspace, sum of lookups
    tables = [((np.array([query[s * 4 : (s + 1) * 4]]) - B[s]) ** 2).sum(axis=1) for s in range(2)]
    dists = {vid: tables[0][c0] + tables[1][c1] for vid, (c0, c1) in got.items()}
    expect_ids = [vid for vid, _ in sorted(dists.items(), key=lambda kv: (kv[1], kv[0]))[:5]]
    assert [r.vec_id for r in top] == expect_ids
    for r in top:
        assert r.adc_dist == pytest.approx(dists[r.vec_id])


def test_plan_shapes(spark):
    from affinity_spark.plans import n_exchanges
    from affinity_spark.plans.introspect import executed_plan

    emb = _vectors(spark)
    books = train_pq(emb, m=2, k=4, dim=8, n_iter=1)
    codes = assign_codes(emb, books)
    assert n_exchanges(codes) == 0, "PQ encode must be map-side"
    plan = executed_plan(adc_search(codes, books, [0.0] * 8, 5))
    assert "TakeOrderedAndProject" in plan, "top-k must never global-sort"

"""IVF ANN: deterministic training, correct assignment, pruned search
with measured recall against brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from affinity_spark.operators.ivf import assign, search, train_centroids
from affinity_spark.operators.similarity import knn_to_query


def _clustered(spark):
    # 3 well-separated clusters around axis unit vectors
    rows = []
    for i in range(30):
        base = [0.0, 0.0, 0.0]
        base[i % 3] = 10.0
        jitter = [((i * 7 + d * 3) % 5) / 10.0 for d in range(3)]
        rows.append((i, [b + j for b, j in zip(base, jitter)]))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_training_is_deterministic(spark):
    emb = _clustered(spark)
    c1 = train_centroids(emb, 3, n_iter=3)
    c2 = train_centroids(emb, 3, n_iter=3)
    assert c1 == c2


def test_assignment_is_argmin(spark):
    emb = _clustered(spark)
    cents = train_centroids(emb, 3, n_iter=3)

    def sqd(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    got = assign(emb, cents).collect()
    for r in got:
        best = min(range(3), key=lambda c: sqd(cents[c], r.embedding))
        assert r.cell == best, (r.vec_id, r.cell, best)
    # separated clusters -> 3 cells of 10
    sizes = sorted(
        assign(emb, cents).groupBy("cell").count().rdd.map(lambda r: r["count"]).collect()
    )
    assert sizes == [10, 10, 10]


def test_search_recall_vs_brute_force(spark):
    emb = _clustered(spark)
    cents = train_centroids(emb, 3, n_iter=3)
    assigned = assign(emb, cents)
    query = [10.0, 0.3, 0.1]  # near cluster 0
    ann = [r.vec_id for r in search(assigned, cents, query, 5, nprobe=1).collect()]
    brute = [r.vec_id for r in knn_to_query(emb, query, 5).collect()]
    # all true neighbors live in the probed cell: recall = 1 here
    assert ann == brute


def test_search_nprobe_widens(spark):
    emb = _clustered(spark)
    cents = train_centroids(emb, 3, n_iter=3)
    assigned = assign(emb, cents)
    narrow = search(assigned, cents, [5.0, 5.0, 0.1], 30, nprobe=1).count()
    wide = search(assigned, cents, [5.0, 5.0, 0.1], 30, nprobe=2).count()
    assert narrow == 10 and wide == 20  # each extra probe adds one cell

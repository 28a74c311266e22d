"""Hot-bucket salting for the LSH band join and the in-bucket cosine join.

Degenerate corpora (many near-identical docs sharing every band bucket, or
one over-full IVF cell) turn a bucket self-join quadratic AND concentrate
it on one task. ``salt_hot_buckets`` splits over-cap buckets into hash
sub-buckets; these tests pin the three contracts:

- work bound: no post-salt join group exceeds ~2x the cap (hash imbalance
  slack), so per-task pair work is ~cap² instead of |hot bucket|²;
- soundness: capped candidate pairs are a SUBSET of the uncapped run's
  (salting prunes, never invents), and emitted values stay exact;
- plan shape: the self-join actually keys on the salt column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from affinity_spark.operators import dedup as dd
from affinity_spark.operators.dedup import salt_hot_buckets
from affinity_spark.operators.similarity import cosine_join_within

CAP = 8


def _degenerate_docs(spark, n=300, hot_frac=0.1):
    """hot_frac of docs share ONE text (hot bucket in every band); the rest
    are distinct."""
    n_hot = int(n * hot_frac)
    rows = [(i, "the same exact duplicated document body repeated verbatim")
            for i in range(n_hot)]
    rows += [(i, f"unique document number {i} with its own words {i * 7} and {i * 13}")
             for i in range(n_hot, n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_salt_splits_only_over_cap_buckets(spark):
    df = spark.createDataFrame(
        [(i, "hot") for i in range(40)] + [(100 + i, f"cold{i}") for i in range(5)],
        "id long, bucket string",
    )
    salted = salt_hot_buckets(df, ["bucket"], "id", CAP)
    groups = (
        salted.groupBy("bucket", "_salt").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    hot = [r for r in groups if r.bucket == "hot"]
    cold = [r for r in groups if r.bucket != "hot"]
    # cold buckets (size <= cap) keep salt 0 — behavior unchanged below cap
    assert all(r._salt == 0 for r in cold)
    # hot bucket split into ceil(40/8)=5 sub-buckets, none grossly over cap
    assert len(hot) > 1
    assert sum(r.n for r in hot) == 40
    assert max(r.n for r in hot) <= 2 * CAP


def test_salt_rejects_nonpositive_cap(spark):
    df = spark.createDataFrame([(1, "b")], "id long, bucket string")
    with pytest.raises(ValueError, match="cap"):
        salt_hot_buckets(df, ["bucket"], "id", 0)


def test_lsh_capped_candidates_bound_hot_bucket_work(spark):
    docs = _degenerate_docs(spark)
    bands = dd.lsh_bands_mapside(
        dd.doc_shingle_arrays(docs, "doc_id", "text", 3), "doc_id"
    )
    uncapped = dd.lsh_candidate_pairs(bands, "doc_id")
    capped = dd.lsh_candidate_pairs(bands, "doc_id", bucket_cap=CAP)

    un = {(r.id_a, r.id_b) for r in uncapped.collect()}
    cp = {(r.id_a, r.id_b) for r in capped.collect()}
    # soundness: salting only ever prunes candidates
    assert cp <= un
    # the 30 identical docs alone make C(30,2)=435 uncapped pairs; capped
    # work is bounded by sub-buckets of ~cap members each
    assert len(un) >= 435
    assert len(cp) < len(un)
    assert len(cp) <= dd.NUM_BANDS * 30 * CAP

    # work bound at the join key: no (band, bucket, salt) group over ~2x cap
    salted = salt_hot_buckets(bands, ["band_id", "band_hash"], "doc_id", CAP)
    worst = (
        salted.groupBy("band_id", "band_hash", "_salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]
        .mx
    )
    assert worst <= 2 * CAP


def test_lsh_capped_join_keys_on_salt(spark):
    docs = _degenerate_docs(spark, n=60)
    bands = dd.lsh_bands_mapside(
        dd.doc_shingle_arrays(docs, "doc_id", "text", 3), "doc_id"
    )
    plan = dd.lsh_candidate_pairs(bands, "doc_id", bucket_cap=CAP)._jdf.queryExecution().analyzed().toString()
    assert "_salt" in plan


def test_cosine_join_capped_is_subset_with_exact_values(spark):
    # one bucket holds 30 of 40 vectors (over-full IVF cell)
    rows = [(i, "hot" if i < 30 else f"c{i % 5}", [float(i % 7 + 1), float(i % 3 + 1)])
            for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, cell string, embedding array<double>")
    uncapped = {(r.id_a, r.id_b): r.cosine
                for r in cosine_join_within(emb, "cell", 0.0).collect()}
    capped = {(r.id_a, r.id_b): r.cosine
              for r in cosine_join_within(emb, "cell", 0.0, bucket_cap=CAP).collect()}
    assert set(capped) <= set(uncapped)
    assert len(capped) < len(uncapped)
    # capping prunes candidates but never changes a surviving pair's score
    for pair, cos in capped.items():
        assert cos == uncapped[pair]

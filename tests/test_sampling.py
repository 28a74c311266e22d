"""Semantics of the corpus-management operators (operators/sampling.py):
determinism under repartition, split-boundary math, packing layout, and the
near-dup survivor rule. The value-level cross-engine checks live in the
oracle gate (docs_train_split / docs_stratified_sample / docs_pack_sequences
/ emb_near_dup_drop)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from affinity_spark.operators.sampling import (
    N_BUCKETS,
    hash_bucket,
    near_dup_survivors,
    pack_sequences,
    stratified_sample,
    train_split,
)


def _py_bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % N_BUCKETS


def test_hash_bucket_matches_reference_md5(spark):
    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.b
        for r in df.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect()
    }
    assert got == {i: _py_bucket(i) for i in range(200)}


def test_split_is_stable_under_repartition(spark):
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    one = {r.doc_id: r.split for r in train_split(df, "doc_id").collect()}
    other = {
        r.doc_id: r.split
        for r in train_split(df.repartition(7), "doc_id").collect()
    }
    assert one == other
    # 90/5/5 within binomial slack on 500 draws.
    n_train = sum(1 for s in one.values() if s == "train")
    assert 400 <= n_train <= 490
    assert set(one.values()) == {"train", "val", "test"}


def test_split_membership_survives_corpus_growth(spark):
    small = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    grown = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    before = {r.doc_id: r.split for r in train_split(small, "doc_id").collect()}
    after = {r.doc_id: r.split for r in train_split(grown, "doc_id").collect()}
    assert all(after[k] == v for k, v in before.items())


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "web" if i % 2 else "books") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = stratified_sample(df, "doc_id", "source", {"books": 100, "web": 10})
    got = kept.groupBy("source").count().collect()
    by = {r.source: r["count"] for r in got}
    assert by["books"] == 500  # 100% of its stratum
    assert 20 <= by["web"] <= 90  # ~10% of 500
    # unlisted strata are dropped
    df2 = df.withColumn("source", F.lit("other"))
    assert stratified_sample(df2, "doc_id", "source", {"books": 100}).count() == 0
    # exact same membership on rerun
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in kept.collect()
    )


def test_pack_sequences_chunk_layout(spark):
    # One shard; tokens 600 each, budget 1000: packs by exclusive cumsum:
    # doc0 starts at 0 -> pack 0, doc1 at 600 -> pack 0, doc2 at 1200 ->
    # pack 1, doc3 at 1800 -> pack 1, doc4 at 2400 -> pack 2 ...
    rows = [(i, "s", 600) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tokens int")
    got = {
        r.doc_id: r.pack_id
        for r in pack_sequences(df, "src", "doc_id", "n_tokens", 1000).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_pack_sequences_shards_are_independent(spark):
    rows = [(i, f"s{i % 3}", 100) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tokens int")
    packed = pack_sequences(df, "src", "doc_id", "n_tokens", 300)
    # each shard has 10 docs of 100 tokens -> packs of 3 docs: ids 0..3
    per_shard = (
        packed.groupBy("src").agg(F.max("pack_id").alias("mx")).collect()
    )
    assert all(r.mx == 3 for r in per_shard)


def test_near_dup_survivor_rule_on_chain(spark):
    # pairs a<b: (1,2) and (2,3) near-dups, (1,3) not. The rule is
    # "survive iff NO smaller-id near-dup exists" (parallel SemDeDup),
    # so 2 AND 3 are both dropped — not the sequential-greedy answer
    # where 3 survives because its only dup 2 was removed first.
    emb = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1)], "vec_id long, label int"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    surv = sorted(r.vec_id for r in near_dup_survivors(pairs, emb).collect())
    assert surv == [1, 4]


def test_train_split_rejects_bad_percents(spark):
    import pytest

    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        train_split(df, "doc_id", train_pct=99, val_pct=10)


def test_per_group_sample_deterministic_and_pruned(spark):
    from affinity_spark.operators.sampling import per_group_sample

    rows = [(i, f"g{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    got = per_group_sample(df, "doc_id", "g", 3)
    sel = sorted((r.g, r.doc_id) for r in got.collect())
    again = sorted((r.g, r.doc_id) for r in per_group_sample(df.repartition(5), "doc_id", "g", 3).collect())
    assert sel == again and len(sel) == 12
    # rank-limit pushes a WindowGroupLimit below the exchange
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_isqrt_exact_at_boundaries(spark):
    from affinity_spark.operators.sampling import isqrt
    import math

    vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 17, 24, 25, 10**12, 10**12 + 1,
            (10**6) ** 2, (10**6) ** 2 - 1, 2**52 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r.x: r.s for r in df.select("x", isqrt(F.col("x")).alias("s")).collect()}
    assert got == {v: math.isqrt(v) for v in vals}


def test_temperature_budgets_scale_with_sqrt_of_mass(spark):
    from affinity_spark.operators.sampling import temperature_budget_sample

    # source A: 100 docs x 100 tokens = 10000; source B: 4 docs x 25 = 100
    rows = [(i, "A", 100) for i in range(100)] + [(1000 + i, "B", 25) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    picked = temperature_budget_sample(df, "doc_id", "source", "n_tokens", 1100)
    by_src = {}
    for r in picked.collect():
        by_src.setdefault(r.source, []).append(r)
    # isqrt masses: A=100, B=10 -> budgets 1100*100//110=1000, 1100*10//110=100
    assert {r.grp_budget for r in by_src["A"]} == {1000}
    assert {r.grp_budget for r in by_src["B"]} == {100}
    # A fills 10 docs (10x100 = budget, last cum_before 900 < 1000);
    # B fills its whole 4 docs (100 tokens = budget)
    assert len(by_src["A"]) == 10
    assert len(by_src["B"]) == 4
    # raw-proportional would have given A 100x B's budget; sqrt gives 10x


def test_token_budget_scalable_matches_window_form_exactly(spark):
    """The two-phase bucket form must select EXACTLY the window form's
    rows with identical cum_before — including zero-weight rows at the
    budget line — while never windowing more than one coarse bucket."""
    import random

    from affinity_spark.operators.sampling import (
        token_budget_sample,
        token_budget_sample_scalable,
    )

    rng = random.Random(5)
    rows = [(i, f"s{i % 3}", rng.randrange(0, 40)) for i in range(400)]
    rows += [(1000 + i, "s0", 0) for i in range(5)]  # zero-weight boundary edge
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    for budget in (1, 37, 500, 10**6):
        a = {
            (r.doc_id, r.cum_before)
            for r in token_budget_sample(df, "doc_id", "source", "n_tokens", budget).collect()
        }
        b = {
            (r.doc_id, r.cum_before)
            for r in token_budget_sample_scalable(
                df, "doc_id", "source", "n_tokens", budget, n_coarse=16
            ).collect()
        }
        assert a == b, budget

    # plan pin: every window partitions by (group, bucket) — bucket-sized
    # state, never a group-wide sort
    plan = token_budget_sample_scalable(
        df, "doc_id", "source", "n_tokens", 500, n_coarse=16
    )._jdf.queryExecution().optimizedPlan().toString()
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        args = spec.split(",")
        if "n_tokens" in spec:  # the data-side running sum
            assert "_coarse" in spec, plan


def test_weighted_group_sample_weight_proportional_and_exact(spark):
    """Ticket replication: a weight-64 row competes with 64 hashes, a
    weight-1 row with one — across 200 independent groups the heavy row
    must win the single seat in roughly 64/73 of them (deterministic
    given the ids; the bound is loose). Selection must also be an exact
    integer function of ids: recomputing yields the identical set."""
    from affinity_spark.operators.sampling import weighted_group_sample

    rows = []
    for g in range(200):
        rows.append((g * 100, g, 64))  # one heavy doc per group
        for i in range(1, 10):
            rows.append((g * 100 + i, g, 1))  # nine light docs
    df = spark.createDataFrame(rows, "doc_id long, grp long, w long")
    kept = weighted_group_sample(df, "doc_id", "grp", "w", 1)
    sel = {r["grp"]: r["doc_id"] for r in kept.collect()}
    assert len(sel) == 200
    heavy_wins = sum(1 for g, d in sel.items() if d == g * 100)
    # E ≈ 200·64/73 ≈ 175; far above any uniform sampler's ≈ 20
    assert heavy_wins > 140, heavy_wins
    sel2 = {r["grp"]: r["doc_id"] for r in kept.collect()}
    assert sel == sel2


def test_weighted_group_sample_clamps_weights(spark):
    """Weights ≤ 0 still hold one ticket (never unsampleable); weights
    above the cap add no tickets beyond it."""
    from affinity_spark.operators.sampling import weighted_group_sample

    df = spark.createDataFrame(
        [(1, 0, 0), (2, 0, -5), (3, 0, 1000000)], "doc_id long, grp long, w long"
    )
    kept = weighted_group_sample(df, "doc_id", "grp", "w", 3, max_tickets=8)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3}

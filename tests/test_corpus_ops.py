"""Unit tests for corpus-level ops: line dedup, token-budget mixing,
near-dup cluster canonicalization."""

from pyspark.sql import functions as F

from affinity_spark.operators.dedup import line_dedup
from affinity_spark.operators.graph import connected_components
from affinity_spark.operators.sampling import hash_bucket, token_budget_sample


def test_line_dedup_drops_only_high_df_lines_and_keeps_order(spark):
    header = "shared header"
    rows = [(i, f"{header}\nunique body {i}\ntail {i % 2}") for i in range(6)]
    df = spark.createDataFrame(rows, ["id", "text"])
    # header df=6 > 3 dropped; "tail 0"/"tail 1" df=3 each, kept
    out = {r["id"]: r for r in line_dedup(df, "id", "text", 3).collect()}
    assert set(out) == set(range(6))
    for i, r in out.items():
        assert (r["n_lines"], r["n_kept"], r["n_dropped"]) == (3, 2, 1)
    # order preserved: body before tail
    got = line_dedup(df, "id", "text", 3)
    one = df.filter(F.col("id") == 0).select(
        F.md5(F.lit("unique body 0\ntail 0")).alias("want")
    ).collect()[0]["want"]
    assert out[0]["clean_md5"] == one


def test_line_dedup_doc_with_all_lines_boilerplate_drops_out(spark):
    rows = [(i, "only line") for i in range(5)]
    df = spark.createDataFrame(rows, ["id", "text"])
    assert line_dedup(df, "id", "text", 2).count() == 0


def test_token_budget_take_while_with_overshoot(spark):
    rows = [(i, "g", 40) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "grp", "w"])
    out = token_budget_sample(df, "id", "grp", "w", 100).collect()
    # exclusive cumsum < 100 → rows at cum 0, 40, 80 → exactly 3, 120 total
    assert len(out) == 3
    assert sorted(r["cum_before"] for r in out) == [0, 40, 80]
    # selection = the 3 smallest hash keys, i.e. a pure function of ids
    order = sorted(range(10), key=lambda i: (
        int(__import__("hashlib").md5(str(i).encode()).hexdigest()[:8], 16)
        % (1 << 31), i))
    assert {r["id"] for r in out} == set(order[:3])


def test_token_budget_is_per_group(spark):
    rows = [(i, "a" if i < 4 else "b", 50) for i in range(8)]
    df = spark.createDataFrame(rows, ["id", "grp", "w"])
    out = token_budget_sample(df, "id", "grp", "w", 100).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], 0)
        by_grp[r["grp"]] += 1
    assert by_grp == {"a": 2, "b": 2}


def test_cluster_canonical_semantics_on_a_chain(spark):
    # a~b, b~c (no a~c edge): one cluster {1,2,3} with canonical 1 —
    # the case pairwise drop-higher-id mishandles.
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 9)], ["id_a", "id_b"])
    cc = connected_components(pairs, "id_a", "id_b")
    comp = {r["vertex"]: r["component"] for r in cc.collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_hash_bucket_matches_duckdb_formula(spark):
    import duckdb

    ids = list(range(100))
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    got = {
        r["id"]: r["b"]
        for r in df.select("id", hash_bucket(F.col("id"), 1 << 31).alias("b")).collect()
    }
    want = {
        i: duckdb.sql(
            f"SELECT CAST(('0x' || substr(md5('{i}'), 1, 8)) AS BIGINT) % 2147483648"
        ).fetchone()[0]
        for i in ids
    }
    assert got == want


def test_leakage_free_split_invariant(spark):
    """No near-dup cluster may straddle a split boundary, and singleton
    docs get exactly the split raw train_split would give them."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    lab = e.docs_leakage_free_split(spark, "/root/testdata/sf0.001")
    lab = lab.persist()
    try:
        spans = (
            lab.groupBy("cluster_id")
            .agg(F.count_distinct("split").alias("n_splits"))
            .filter(F.col("n_splits") > 1)
            .count()
        )
        assert spans == 0
        # at least one real multi-doc cluster exists, else the test is vacuous
        assert (
            lab.groupBy("cluster_id").count().filter(F.col("count") > 1).count() > 0
        )
        # singletons: cluster_id == doc_id -> same bucket rule as train_split
        from affinity_spark.operators.sampling import train_split

        singles = (
            lab.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"), F.first("doc_id").alias("doc_id"))
            .filter((F.col("n") == 1) & (F.col("cluster_id") == F.col("doc_id")))
            .select("doc_id")
        )
        raw = train_split(
            e._t(spark, "/root/testdata/sf0.001", "documents").select("doc_id"),
            "doc_id",
        ).select("doc_id", F.col("split").alias("raw_split"))
        joined = lab.join(singles, "doc_id").join(raw, "doc_id")
        assert joined.filter(F.col("split") != F.col("raw_split")).count() == 0
    finally:
        lab.unpersist()

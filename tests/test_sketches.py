"""Count-min and HLL sketches: estimate bounds, mergeability, exact state."""

from pyspark.sql import functions as F

from affinity_spark.operators.sketches import (
    cms_estimate,
    cms_sketch,
    hll_estimate,
    hll_registers,
)


def _events(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "k string")


def test_cms_never_underestimates_and_is_tight_for_heavy_keys(spark):
    rows = ["a"] * 100 + ["b"] * 50 + [f"x{i}" for i in range(200)]
    sk = [r.asDict() for r in cms_sketch(_events(spark, rows), F.col("k")).collect()]
    true = {"a": 100, "b": 50, "x0": 1}
    for k, t in true.items():
        est = cms_estimate(sk, k)
        assert est >= t  # count-min never underestimates
    # heavy keys dominate their buckets: estimate stays close
    assert cms_estimate(sk, "a") <= 100 + 10
    assert cms_estimate(sk, "b") <= 50 + 10


def test_cms_sketches_merge_by_summing(spark):
    part1, part2 = ["a"] * 10 + ["b"], ["a"] * 5 + ["c"] * 3
    s_all = {
        (r.depth, r.bucket): r.cnt
        for r in cms_sketch(_events(spark, part1 + part2), F.col("k")).collect()
    }
    s1 = {
        (r.depth, r.bucket): r.cnt
        for r in cms_sketch(_events(spark, part1), F.col("k")).collect()
    }
    s2 = {
        (r.depth, r.bucket): r.cnt
        for r in cms_sketch(_events(spark, part2), F.col("k")).collect()
    }
    merged = {c: s1.get(c, 0) + s2.get(c, 0) for c in set(s1) | set(s2)}
    assert merged == s_all


def test_hll_registers_merge_by_max_and_estimate_tracks_cardinality(spark):
    a = [f"u{i}" for i in range(500)]
    b = [f"u{i}" for i in range(250, 750)]  # 250 overlap → union 750
    ra = {r.bucket: r.register for r in hll_registers(_events(spark, a), F.col("k")).collect()}
    rb = {r.bucket: r.register for r in hll_registers(_events(spark, b), F.col("k")).collect()}
    runion = {
        r.bucket: r.register
        for r in hll_registers(_events(spark, a + b), F.col("k")).collect()
    }
    merged = {x: max(ra.get(x, 0), rb.get(x, 0)) for x in set(ra) | set(rb)}
    assert merged == runion

    est = hll_estimate([{"bucket": k, "register": v} for k, v in runion.items()])
    assert 750 * 0.8 <= est <= 750 * 1.2  # p=8 → ~6.5% standard error


def test_hll_duplicates_do_not_move_registers(spark):
    once = hll_registers(_events(spark, ["a", "b", "c"]), F.col("k")).collect()
    many = hll_registers(_events(spark, ["a", "b", "c"] * 50), F.col("k")).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, many))


def test_grouped_hll_matches_per_group_single_hll(spark):
    from pyspark.sql import functions as F
    from affinity_spark.operators.sketches import hll_registers, hll_registers_by_group

    rows = [("t1", f"u{i}") for i in range(80)] + [("t2", f"u{i}") for i in range(40, 60)]
    df = spark.createDataFrame(rows, "t string, k string")
    grouped = {
        (r.t, r.bucket): r.register
        for r in hll_registers_by_group(df, "t", F.col("k")).collect()
    }
    for t in ("t1", "t2"):
        solo = {
            r.bucket: r.register
            for r in hll_registers(df.filter(F.col("t") == t), F.col("k")).collect()
        }
        assert solo == {b: v for (g, b), v in grouped.items() if g == t}


def test_bloom_bitmap_membership_and_merge(spark):
    from affinity_spark.operators.sketches import bloom_bitmap, bloom_might_contain

    present = [f"doc-{i}" for i in range(50)]
    df = _events(spark, present)
    rows = [r.asDict() for r in bloom_bitmap(df, F.col("k")).collect()]
    # no false negatives, ever
    assert all(bloom_might_contain(rows, v) for v in present)
    # false-positive rate at 50 keys / 4096 bits / k=3 is ~tiny: most absent
    # keys must read definitely-not
    absent_hits = sum(bloom_might_contain(rows, f"absent-{i}") for i in range(200))
    assert absent_hits <= 4

    # merge = bit_or of word rows: union bitmap equals bitmap of union
    a, b = present[:25], present[25:]
    ra = {r.word_idx: r.bits for r in bloom_bitmap(_events(spark, a), F.col("k")).collect()}
    rb = {r.word_idx: r.bits for r in bloom_bitmap(_events(spark, b), F.col("k")).collect()}
    merged = {w: ra.get(w, 0) | rb.get(w, 0) for w in set(ra) | set(rb)}
    assert merged == {r.word_idx: r.bits for r in
                      bloom_bitmap(df, F.col("k")).collect()}


def test_dd_sketch_quantiles_within_relative_bound(spark):
    """DD estimates must bracket the exact quantile: lo <= q < lo*(1+1/m),
    and the sketch must be MERGEABLE — two halves' sketches summed give
    the whole corpus's sketch exactly."""
    import pyspark.sql.functions as F

    from affinity_spark.operators.sketches import dd_quantiles, dd_sketch

    rows = [("a", (i * 37) % 5000 + 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "k string, v long")
    sk = dd_sketch(df, ["k"], "v")
    est = {r.k: r for r in dd_quantiles(sk, ["k"]).collect()}["a"]

    vals = sorted(v for _, v in rows)
    for q in (50, 90, 99):
        exact = vals[(len(vals) - 1) * q // 100]
        lo = est[f"p{q}_est"]
        assert lo <= exact < lo * (1 + 1 / 8) + 1, (q, lo, exact)

    # mergeability: sum of half-sketches == whole sketch
    h1 = dd_sketch(df.filter(F.col("v") % 2 == 0), ["k"], "v")
    h2 = dd_sketch(df.filter(F.col("v") % 2 == 1), ["k"], "v")
    merged = (
        h1.unionByName(h2)
        .groupBy("k", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    whole = {(r.k, r.bucket): r.n for r in sk.collect()}
    got = {(r.k, r.bucket): r.n for r in merged.collect()}
    assert got == whole


def test_dd_sketch_clamps_nonpositive_values(spark):
    from affinity_spark.operators.sketches import dd_sketch

    df = spark.createDataFrame([("a", 0), ("a", -5), ("a", 1)], "k string, v long")
    sk = dd_sketch(df, ["k"], "v")
    rows = sk.collect()
    assert len(rows) == 1 and rows[0].bucket == 0 and rows[0].n == 3


def test_heavy_hitters_exact_vs_naive_on_skewed_data(spark):
    """Two-pass Misra-Gries must return EXACTLY the naive answer: the
    candidate union is a provable superset and the recount filter removes
    every false positive."""
    import random

    import pyspark.sql.functions as F

    from affinity_spark.operators.sketches import heavy_hitters

    rng = random.Random(13)
    rows = (
        [("hot",)] * 3000
        + [("warm",)] * 1500
        + [(f"cold{rng.randrange(800)}",) for _ in range(5500)]
    )
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "w string").repartition(7)
    for k in (3, 5, 20):
        got = {(r.w, r.n_occ) for r in heavy_hitters(df, "w", k=k).collect()}
        want = {
            (r.w, r.__getattr__("count"))
            for r in df.groupBy("w").count()
            .filter(F.col("count") * (k + 1) > len(rows))
            .collect()
        }
        assert got == want, k


def test_heavy_hitters_empty_when_nothing_heavy(spark):
    from affinity_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([(f"u{i}",) for i in range(200)], "w string")
    assert heavy_hitters(df, "w", k=5).count() == 0


def test_dd_sketch_maintained_incrementally_equals_batch(spark, tmp_path):
    """The mergeability contract in streaming form: a DD sketch maintained
    from micro-batches via add-only delta merges must equal the batch
    sketch over the full stream — the property that lets a 100 TB
    quantile monitor never recompute from scratch."""
    import json
    import os

    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from affinity_spark.operators.sketches import dd_sketch
    from affinity_spark.sources.keyed_table import KeyedTable

    src = str(tmp_path / "in")
    os.makedirs(src)
    all_rows = [{"k": "a", "v": (i * 97) % 3000 + 1} for i in range(300)]
    for b in range(3):
        tmp = os.path.join(src, f".b{b}.tmp")
        with open(tmp, "w") as f:
            for r in all_rows[b * 100 : (b + 1) * 100]:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, os.path.join(src, f"b{b}.json"))

    table = str(tmp_path / "sketch_table")

    def merge_sketch(batch_df, batch_id):
        sp = batch_df.sparkSession
        tbl = KeyedTable(sp, table, ["k", "bucket"], "")
        last = tbl.commit_meta().get("dd_batch_id")
        if last is not None and batch_id <= last:
            return
        base_version = tbl._current_version_dir()
        delta = dd_sketch(batch_df, ["k"], "v")
        if base_version is None:
            merged = delta
        else:
            merged = (
                sp.read.parquet(base_version)
                .unionByName(delta)
                .groupBy("k", "bucket")
                .agg(F.sum("n").alias("n"))
            )
        tbl.overwrite(merged, expected_base=base_version,
                      meta={"dd_batch_id": batch_id})

    schema = StructType([StructField("k", StringType()), StructField("v", LongType())])
    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
        .writeStream.foreachBatch(merge_sketch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    maintained = {
        (r.k, r.bucket): r.n
        for r in KeyedTable(spark, table, ["k", "bucket"], "").read().collect()
    }
    batch_df = spark.createDataFrame([(r["k"], r["v"]) for r in all_rows], "k string, v long")
    whole = {(r.k, r.bucket): r.n for r in dd_sketch(batch_df, ["k"], "v").collect()}
    assert maintained == whole


def test_kmv_sketch_matches_model_and_merges(spark):
    """KMV state equals the python model (k smallest distinct md5-derived
    hashes per group), the union sketch built from two SKETCHES equals
    the sketch of the unioned raw data (mergeability — the property that
    lets day-sketches combine without raw re-reads), small groups
    estimate EXACTLY, and the window top-k plans as WindowGroupLimit
    (bounded memory, no group's hash set buffered)."""
    import hashlib

    from affinity_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
        kmv_union,
    )
    from affinity_spark.plans.introspect import executed_plan

    k = 8
    rows = [("a", i) for i in range(200)] + [("b", i) for i in range(100, 350)]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_sketch(df, ["g"], F.col("v").cast("string"), k)
    got = {r.g: list(r.kmv) for r in sk.collect()}

    def model(vals):
        hs = {int(hashlib.md5(f"0:{v}".encode()).hexdigest()[:8], 16) for v in vals}
        return sorted(hs)[:k]

    assert got["a"] == model(range(200))
    assert got["b"] == model(range(100, 350))

    # mergeability: union-from-sketches == sketch-of-unioned-raw-data
    merged = (
        sk.groupBy()
        .agg(F.min_by("kmv", "g").alias("ka"), F.max_by("kmv", "g").alias("kb"))
        .select(kmv_union(F.col("ka"), F.col("kb"), k).alias("km"))
        .collect()[0]
        .km
    )
    assert list(merged) == model(range(350))

    # a group smaller than k estimates exactly (sketch IS the set)
    tiny = spark.createDataFrame([("t", i) for i in range(5)], "g string, v long")
    est = (
        kmv_sketch(tiny, ["g"], F.col("v").cast("string"), k)
        .select(kmv_estimate(F.col("kmv"), k).alias("e"))
        .collect()[0]
        .e
    )
    assert est == 5

    # bounded-memory plan: the rn<=k window runs as WindowGroupLimit
    assert "WindowGroupLimit" in executed_plan(sk)

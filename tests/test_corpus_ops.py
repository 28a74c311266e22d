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


def test_span_dedup_excises_shared_runs_and_keeps_one_copy(spark):
    """ExactSubstr removal invariants (Lee et al. 2022):
    1. the keeper (min doc_id per fingerprint) retains the shared run;
    2. every other copy loses the run's CORE (winnow anchoring leaves
       < win+stride residual chars at each edge by construction);
    3. removed_chars accounting is exact;
    4. every removed span's text exists verbatim in the keeper's
       normalized text (it was genuinely duplicated, not collateral);
    5. unaffected docs pass through untouched.
    """
    import re

    from affinity_spark.operators.dedup import span_dedup

    win, stride = 40, 20
    lic = (
        "this program is free software you can redistribute it and or "
        "modify it under the terms of the gnu general public license as "
        "published by the free software foundation"
    )
    rows = [
        (1, f"unique alpha content about spark engines. {lic} trailing alpha words."),
        (2, f"different beta document starts here and then... {lic} beta resumes its own story."),
        (3, "no shared content in this document, entirely original prose long enough to fingerprint."),
        (4, lic),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in span_dedup(df, "doc_id", "text", win, stride).collect()}
    norms = {
        i: re.sub(r"\s+", " ", t.lower().strip()) for i, t in rows
    }

    # (5) untouched doc unchanged
    assert out[3]["n_spans"] == 0 and out[3]["clean_text"] == norms[3]
    # (1) keeper keeps the run
    assert out[1]["n_spans"] == 0 and lic in out[1]["clean_text"]
    # (2) non-keepers lose the core (edge residue < win+stride per side)
    core = lic[win + stride : -(win + stride)]
    assert core and core not in out[2]["clean_text"]
    assert core not in out[4]["clean_text"]
    for i in (2, 4):
        # (3) exact accounting
        assert out[i]["removed_chars"] == len(norms[i]) - len(out[i]["clean_text"])
        assert out[i]["n_spans"] >= 1
        # (4) removed spans exist verbatim in the keeper's normalized text
        for sp in out[i]["spans"]:
            removed = norms[i][sp["s"] : sp["e"]]
            assert removed in norms[1]


def test_span_dedup_is_phase_robust(spark):
    """The shared run sits at offsets differing mod stride in each copy —
    the placement that zeroes out position-strided sampling (r4 lesson).
    Content-anchored winnowing must still excise every non-keeper copy."""
    from affinity_spark.operators.dedup import span_dedup

    import hashlib

    win, stride = 40, 20
    # high-entropy run so winnow mins are informative
    run = " ".join(
        hashlib.md5(str(i).encode()).hexdigest()[:7] for i in range(20)
    )  # ~160 chars, no internal repeats
    pads = ["p" * 3, "q" * 11, "r" * 27]  # offsets 3, 11, 27 — all differ mod 20
    rows = [(i + 1, f"{pads[i]} {run} tail{i}") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in span_dedup(df, "doc_id", "text", win, stride).collect()}
    assert out[1]["n_spans"] == 0  # keeper
    core = run[win + stride : -(win + stride)]
    for i in (2, 3):
        assert out[i]["n_spans"] >= 1
        assert core not in out[i]["clean_text"]


def test_span_dedup_leading_tab_positions_align(spark):
    """Normalization must be idempotent (r7 advice): trim strips 0x20 only,
    so collapse-then-trim is required — a doc starting with '\\t' must not
    shift fingerprint positions by one relative to the excised string.
    The removed span text must still exist verbatim in the keeper."""
    import re

    from affinity_spark.operators.dedup import span_dedup

    win, stride = 40, 20
    lic = (
        "this program is free software you can redistribute it and or "
        "modify it under the terms of the gnu general public license as "
        "published by the free software foundation"
    )
    rows = [
        (1, f"unique alpha content about spark engines. {lic} trailing."),
        (2, f"\t\n {lic} resumed beta prose follows the shared block."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in span_dedup(df, "doc_id", "text", win, stride).collect()
    }
    norms = {i: re.sub(r"\s+", " ", t.lower()).strip() for i, t in rows}
    assert out[1]["n_spans"] == 0
    r2 = out[2]
    assert r2["n_spans"] >= 1
    assert r2["removed_chars"] == len(norms[2]) - len(r2["clean_text"])
    for sp in r2["spans"]:
        removed = norms[2][sp["s"] : sp["e"]]
        assert removed and removed in norms[1]
    core = lic[win + stride : -(win + stride)]
    assert core not in r2["clean_text"]


def test_pack_bestfit_ffd_semantics(spark):
    """FFD invariants: (1) matches an imperative reference fold exactly,
    (2) no pack exceeds capacity except single-doc oversize packs,
    (3) per-shard independence, (4) deterministic."""
    from affinity_spark.operators.sampling import pack_bestfit

    rows = [
        # shard a: lengths force multi-bin placement (cap 100)
        (1, "a", 60), (2, "a", 50), (3, "a", 40), (4, "a", 30), (5, "a", 20),
        (6, "a", 130),              # oversize: own pack
        (7, "b", 90), (8, "b", 90), (9, "b", 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, shard string, w long")
    got = {
        (r["doc_id"]): (r["shard"], r["pack_id"])
        for r in pack_bestfit(df, "shard", "doc_id", "w", 100).collect()
    }

    def ffd(docs, cap):
        docs = sorted(docs, key=lambda x: (-x[1], x[0]))
        loads, out = [], {}
        for d, w in docs:
            placed = -1
            if w <= cap:
                for j, load in enumerate(loads):
                    if load + w <= cap:
                        placed = j
                        break
            if placed < 0:
                loads.append(w)
                placed = len(loads) - 1
            else:
                loads[placed] += w
            out[d] = placed
        return out

    from collections import defaultdict

    byshard = defaultdict(list)
    for d, s, w in rows:
        byshard[s].append((d, w))
    want = {}
    for s, docs in byshard.items():
        for d, p in ffd(docs, 100).items():
            want[d] = (s, p)
    assert got == want
    # capacity invariant
    loads = defaultdict(int)
    for d, s, w in rows:
        loads[got[d]] += w
    for (s, p), load in loads.items():
        members = [d for d, sp in got.items() if sp == (s, p)]
        assert load <= 100 or len(members) == 1  # oversize alone
    # determinism
    again = {
        (r["doc_id"]): (r["shard"], r["pack_id"])
        for r in pack_bestfit(df, "shard", "doc_id", "w", 100).collect()
    }
    assert again == got


def test_ffd_pack_properties():
    """Hypothesis invariants of the pure FFD fold: (1) every pack fits the
    cap unless it holds exactly one oversize weight; (2) first-fit — a
    weight never lands in pack j while an earlier pack j' < j could have
    held it; (3) pack ids are dense 0..B-1; (4) deterministic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from affinity_spark.operators.sampling import ffd_pack

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=300), max_size=60),
        st.integers(min_value=1, max_value=200),
    )
    def check(weights, cap):
        out = ffd_pack(weights, cap)
        assert out == ffd_pack(weights, cap)  # (4)
        assert len(out) == len(weights)
        loads: dict[int, int] = {}
        members: dict[int, int] = {}
        for w, p in zip(weights, out):
            # (2) replay first-fit: every earlier pack must NOT fit w
            if w <= cap:
                for j in range(p):
                    assert loads.get(j, 0) + w > cap
                assert loads.get(p, 0) + w <= cap
            else:
                assert p not in loads  # oversize opens its own pack
            loads[p] = loads.get(p, 0) + w
            members[p] = members.get(p, 0) + 1
        for p, load in loads.items():
            assert load <= cap or members[p] == 1  # (1)
        if out:
            assert sorted(set(out)) == list(range(max(out) + 1))  # (3)

    check()

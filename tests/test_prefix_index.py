"""Maintained PPJoin prefix index (operators/prefix_index.py): served
pairs == the exhaustive inverted join == the derive-per-run ppjoin;
frozen-order exactness under admits; serving-plan hygiene (no window/df
derivation in the read)."""

import os

from pyspark.sql import functions as F

from affinity_spark.operators import dedup as dd
from affinity_spark.operators.prefix_index import PrefixIndex

BODY = "the quick brown fox jumps over the lazy dog and keeps running "


def _docs(spark, n=30):
    rows = []
    for i in range(n):
        if i % 3 == 0:
            text = BODY + f"ending number {i % 6}"  # near-dup clusters
        else:
            text = f"completely distinct document {i} " + " ".join(
                f"w{i}x{j}" for j in range(12)
            )
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _arrs(spark, df):
    return dd.doc_shingle_arrays(df, "doc_id", "text", 3)


def _pairs_set(df):
    return {
        (r["id_a"], r["id_b"], r["n_common"], r["n_union"])
        for r in df.collect()
    }


def _exhaustive(arrs):
    sh = arrs.select("doc_id", F.explode("shingles").alias("shingle"))
    sa = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    cand = (
        sa.join(sb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return dd.jaccard_verify_arrays(cand, arrs, "doc_id", 1, 2)


def test_served_pairs_match_exhaustive_and_derived(spark, tmp_path):
    arrs = _arrs(spark, _docs(spark))
    idx = PrefixIndex(spark, str(tmp_path / "pfx"))
    idx.build(arrs)
    served = _pairs_set(idx.pairs())
    assert served == _pairs_set(_exhaustive(arrs))
    assert served == _pairs_set(dd.ppjoin_pairs(arrs, "doc_id", 1, 2))
    assert served  # the clusters guarantee true pairs exist


def test_admit_stays_exact_under_frozen_order(spark, tmp_path):
    """Admitted docs rank under the order frozen at build time (including
    shingles unseen at build, ranked df=0); pairs() must still equal the
    exhaustive join over the grown corpus — the frozen-order property."""
    full = _docs(spark, 36)
    base = full.filter(F.col("doc_id") < 24)
    batch = full.filter(F.col("doc_id") >= 24)
    idx = PrefixIndex(spark, str(tmp_path / "pfx"))
    idx.build(_arrs(spark, base))
    idx.admit(_arrs(spark, batch))
    assert _pairs_set(idx.pairs()) == _pairs_set(
        _exhaustive(_arrs(spark, full))
    )


def test_admit_replaces_existing_doc(spark, tmp_path):
    """Re-admitting an existing id with new text replaces its prefix
    entries and verify array (keyed upsert), not duplicates them."""
    docs = _docs(spark, 12)
    idx = PrefixIndex(spark, str(tmp_path / "pfx"))
    idx.build(_arrs(spark, docs))
    replaced = spark.createDataFrame(
        [(0, BODY + "ending number 3")], "doc_id long, text string"
    )
    new_docs = docs.filter(F.col("doc_id") != 0).unionByName(replaced)
    idx.admit(_arrs(spark, replaced))
    assert _pairs_set(idx.pairs()) == _pairs_set(
        _exhaustive(_arrs(spark, new_docs))
    )


def test_torn_admit_is_loud_not_silent(spark, tmp_path):
    """A crash between the arrays and prefix commits of one admit leaves
    the two tables at different sync tokens; the serving reads must
    REFUSE (candidates verify via an inner join on arrays, so a torn
    state would otherwise drop true pairs silently). Re-admitting the
    same batch (streaming trailing-batch replay) heals it."""
    import pytest

    full = _docs(spark, 18)
    base = full.filter(F.col("doc_id") < 12)
    batch = full.filter(F.col("doc_id") >= 12)
    idx = PrefixIndex(spark, str(tmp_path / "pfx"))
    idx.build(_arrs(spark, base))

    # inject the tear: admit, then roll the PREFIX table back one version
    # (as if the process died after the arrays commit)
    before = idx._prefix._current_version_dir()
    before_meta = idx._prefix.commit_meta()
    idx.admit(_arrs(spark, batch))
    idx._prefix._commit_version(
        os.path.basename(before),
        idx._prefix._current_version_dir(),
        before_meta,
    )
    idx._pairs_df = None
    with pytest.raises(RuntimeError, match="sync tokens diverge"):
        idx.pairs()
    with pytest.raises(RuntimeError, match="sync tokens diverge"):
        idx.probe(_arrs(spark, batch))
    # replaying the batch heals both tables to one token
    idx.admit(_arrs(spark, batch))
    assert _pairs_set(idx.pairs()) == _pairs_set(
        _exhaustive(_arrs(spark, full))
    )


def test_torn_df_commit_is_loud_not_silent(spark, tmp_path):
    """build() commits the df (frozen order) table FIRST: a crash right
    after it leaves OLD prefix/arrays — mutually consistent, their own
    sync tokens match — beneath a NEW order. probe() would rank the batch
    under the new order against prefix rows ranked under the old one and
    silently drop true pairs; the df_sync tie must make this REFUSE
    (r11 ADVICE, medium). Replay cannot heal an order tear: admit() must
    refuse too. A rebuild re-freezes and heals."""
    import pytest

    docs = _docs(spark, 18)
    arrs = _arrs(spark, docs)
    idx = PrefixIndex(spark, str(tmp_path / "pfx"))
    idx.build(arrs)

    # inject the tear: rebuild, then roll BOTH prefix and arrays back one
    # version (as if the process died right after the df commit of the
    # second build) — their sync tokens still match each other
    torn_tables = [idx._prefix, idx._arrays]
    before = [
        (t, os.path.basename(t._current_version_dir()), t.commit_meta())
        for t in torn_tables
    ]
    idx.build(arrs)
    for t, ver, meta in before:
        t._commit_version(ver, t._current_version_dir(), meta)
    idx._pairs_df = None
    assert (
        idx._prefix.commit_meta()["sync"] == idx._arrays.commit_meta()["sync"]
    )  # the pair-check alone would PASS — the df tie is what must catch it
    with pytest.raises(RuntimeError, match="df order token"):
        idx.pairs()
    with pytest.raises(RuntimeError, match="df order token"):
        idx.probe(arrs)
    with pytest.raises(RuntimeError, match="df order token"):
        idx.admit(arrs)
    idx.build(arrs)  # re-freeze heals
    assert _pairs_set(idx.pairs()) == _pairs_set(_exhaustive(arrs))


def test_needs_reorder_growth_trigger(spark, tmp_path):
    docs = _docs(spark, 20)
    idx = PrefixIndex(spark, str(tmp_path / "pfx"))
    idx.build(_arrs(spark, docs))
    assert not idx.needs_reorder(max_growth=0.5)
    more = spark.createDataFrame(
        [(100 + i, f"fresh growth doc {i} " + " ".join(f"g{i}x{j}" for j in range(12)))
         for i in range(16)],
        "doc_id long, text string",
    )
    idx.admit(_arrs(spark, more))
    assert idx.needs_reorder(max_growth=0.5)


def test_serving_plan_reads_index_only(spark, tmp_path):
    """The serving read must not re-derive the scaffold: no rank Window,
    no explode (Generate) anywhere in the pairs() plan — the corpus-sized
    derivation lives in build/admit only."""
    arrs = _arrs(spark, _docs(spark))
    idx = PrefixIndex(spark, str(tmp_path / "pfx"))
    idx.build(arrs)
    plan = idx.pairs()._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Generate" not in plan


def test_probe_matches_exhaustive_new_vs_existing(spark, tmp_path):
    """probe(batch) == the exhaustive (new x existing) inverted join —
    the prefix filter is LOSSLESS where LSH banding is recall-bounded."""
    full = _docs(spark, 36)
    # range split so the i%3==0 near-dup clusters SPAN the slices
    existing = _arrs(spark, full.filter(F.col("doc_id") < 24))
    batch = _arrs(spark, full.filter(F.col("doc_id") >= 24))
    idx = PrefixIndex(spark, str(tmp_path / "pfx"))
    idx.build(existing)

    sh_e = existing.select(F.col("doc_id").alias("dup_of"),
                           F.explode("shingles").alias("shingle"))
    sh_b = batch.select(F.col("doc_id").alias("new_id"),
                        F.explode("shingles").alias("shingle"))
    cand = sh_e.join(sh_b, "shingle").select("new_id", "dup_of").distinct()
    both = existing.unionByName(batch)
    a = both.select(F.col("doc_id").alias("dup_of"),
                    F.col("shingles").alias("sh_a"),
                    F.col("n_shingles").alias("n_a"))
    b = both.select(F.col("doc_id").alias("new_id"),
                    F.col("shingles").alias("sh_b"),
                    F.col("n_shingles").alias("n_b"))
    expected = (
        cand.join(a, "dup_of").join(b, "new_id")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_common"))
        .filter(2 * F.col("n_common") >= F.col("n_union"))
        .select("new_id", "dup_of", "n_common", "n_union")
    )
    got = {tuple(r) for r in idx.probe(batch).collect()}
    assert got == {tuple(r) for r in expected.collect()}
    assert got  # clusters guarantee cross-slice matches exist


def test_streaming_maintainer_admits_batches(spark, tmp_path):
    """foreachBatch maintenance: sequential micro-batch admits leave
    pairs() exactly where a full build would."""
    full = _docs(spark, 30)
    idx = PrefixIndex(spark, str(tmp_path / "pfx"))
    idx.build(_arrs(spark, full.filter(F.col("doc_id") < 10)))
    apply = idx.maintainer()
    apply(_arrs(spark, full.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))), 0)
    apply(_arrs(spark, full.filter(F.col("doc_id") >= 20)), 1)
    # replay of the last batch is idempotent (keyed upsert)
    apply(_arrs(spark, full.filter(F.col("doc_id") >= 20)), 1)
    assert _pairs_set(idx.pairs()) == _pairs_set(_exhaustive(_arrs(spark, full)))


def test_admit_hardlinks_untouched_buckets(spark, tmp_path):
    """An admit rewrites ONLY the batch's doc-id buckets; every other
    bucket partition hardlinks forward (same inodes) — merge IO ∝ batch,
    never ∝ corpus (the BandIndex delta-IO contract)."""
    import os

    full = _docs(spark, 40)
    idx = PrefixIndex(spark, str(tmp_path / "pfx"))
    idx.build(_arrs(spark, full.filter(F.col("doc_id") < 36)))
    base = idx._arrays._current_version_dir()
    batch = full.filter(F.col("doc_id") >= 36)
    idx.admit(_arrs(spark, batch))
    new = idx._arrays._current_version_dir()
    assert new != base
    touched = {
        r[0]
        for r in batch.select(
            F.pmod(F.hash(F.col("doc_id").cast("string")), F.lit(8))
        ).distinct().collect()
    }
    assert len(touched) < 8  # the batch must not touch every bucket

    def inodes(vdir, b):
        d = os.path.join(vdir, f"_bucket={b}")
        if not os.path.isdir(d):
            return set()
        return {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    carried = rewritten = 0
    for b in range(8):
        old = inodes(base, b)
        if not old:
            continue
        if b in touched:
            rewritten += 1
        else:
            assert inodes(new, b) == old  # hardlinked forward
            carried += 1
    assert carried > 0 and rewritten > 0

"""Property-based tests (SURVEY §5 tier 2, the AvroRecordPropSpec analog):
core operators must agree with a plain-Python model on generated inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from affinity_spark import TimeRange
from affinity_spark.operators.kv import compact_latest
from affinity_spark.operators.upsert import merge_upsert

# one (key, ts, seq, value) changelog entry
entry = st.tuples(
    st.integers(min_value=0, max_value=4),      # key — few keys force collisions
    st.integers(min_value=0, max_value=9),      # ts — small domain forces ties
    st.integers(min_value=0, max_value=99),     # seq (unique-ified below)
    st.integers(min_value=-1000, max_value=1000),
)

changelog = st.lists(entry, min_size=0, max_size=12).map(
    # make seq unique so (ts, seq) is a total order (the log offset role)
    lambda rows: [(k, t, i, v) for i, (k, t, _, v) in enumerate(rows)]
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def model_compact(rows):
    best = {}
    for k, t, s, v in rows:
        if k not in best or (t, s) > (best[k][0], best[k][1]):
            best[k] = (t, s, v)
    return {k: v for k, (t, s, v) in best.items()}


@given(changelog)
@SLOW
def test_compact_latest_matches_model(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(rows, "k int, ts int, seq int, v int")
    got = {
        r.k: r.v
        for r in compact_latest(df, ["k"], "ts", tiebreak_cols=["seq"]).collect()
    }
    assert got == model_compact(rows)


def model_compact_full(rows):
    best = {}
    for k, t, s, v in rows:
        if k not in best or (t, s) > (best[k][0], best[k][1]):
            best[k] = (t, s, v)
    return best  # key -> (ts, seq, value)


@given(changelog, changelog)
@SLOW
def test_merge_upsert_matches_model(spark, base_rows, upd_rows):
    if not base_rows or not upd_rows:
        return
    # base = compacted state (one row per key); updates = raw batch
    base_state = model_compact_full(base_rows)
    base = spark.createDataFrame(
        [(k, t, s, v) for k, (t, s, v) in base_state.items()],
        "k int, ts int, seq int, v int",
    )
    updates = spark.createDataFrame(upd_rows, "k int, ts int, seq int, v int")
    got = {
        r.k: r.v
        for r in merge_upsert(base, updates, ["k"], "ts", tiebreak_cols=["seq"]).collect()
    }
    # model: per key, max by (ts, seq, src) — src=1 for updates, so an
    # update wins an exact (ts, seq) tie (replayed-batch-wins, W1)
    expect = {}
    for src, rows in ((0, [(k, t, s, v) for k, (t, s, v) in base_state.items()]), (1, upd_rows)):
        for k, t, s, v in rows:
            if k not in expect or (t, s, src) > expect[k][:3]:
                expect[k] = (t, s, src, v)
    assert got == {k: v for k, (t, s, src, v) in expect.items()}


def test_timerange_predicate_matches_contains(spark):
    rows = [(i, t) for i, t in enumerate(range(0, 20))]
    df = spark.createDataFrame(rows, "id int, ts long")
    for start, end in [(0, 20), (5, 5), (5, 6), (3, 17), (19, 20)]:
        tr = TimeRange.of(start, end)
        via_spark = {r.id for r in df.filter(tr.predicate(F.col("ts"), "millis")).collect()}
        via_model = {i for i, t in rows if tr.contains(t)}
        assert via_spark == via_model, (start, end)


# ---- corpus-management properties (sampling.py vs plain-python models) ----

pack_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # shard — few shards
        st.integers(min_value=0, max_value=500),   # token count (0 allowed)
    ),
    min_size=1,
    max_size=20,
)


@given(pack_rows, st.integers(min_value=1, max_value=600))
@SLOW
def test_pack_sequences_matches_model(spark, rows, budget):
    from affinity_spark.operators.sampling import pack_sequences

    data = [(i, f"s{s}", t) for i, (s, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, shard string, n_tokens int")
    got = {
        r.doc_id: r.pack_id
        for r in pack_sequences(df, "shard", "doc_id", "n_tokens", budget).collect()
    }
    # model: per shard in doc_id order, pack = exclusive-cumsum // budget
    expect = {}
    cum: dict[str, int] = {}
    for d, sh, tk in sorted(data, key=lambda x: x[0]):
        start = cum.get(sh, 0)
        expect[d] = start // budget
        cum[sh] = start + tk
    assert got == expect


@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=0, max_size=30,
                unique=True))
@SLOW
def test_train_split_partitions_every_row_exactly_once(spark, ids):
    from affinity_spark.operators.sampling import train_split

    if not ids:
        return
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = train_split(df, "doc_id").collect()
    assert len(rows) == len(ids)
    assert all(r.split in ("train", "val", "test") for r in rows)
    # bucket bounds consistent with labels
    for r in rows:
        if r.bucket < 900:
            assert r.split == "train"
        elif r.bucket < 950:
            assert r.split == "val"
        else:
            assert r.split == "test"


# Latin-1 only: above 0xFF, locale case folding (e.g. Turkish İ) diverges
# between Python str.lower and engine lowercasing — not a property the
# operator promises.
text_strategy = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs"),
                           max_codepoint=0xFF),
    min_size=0,
    max_size=120,
)


@given(st.lists(text_strategy, min_size=1, max_size=6))
@SLOW
def test_winnow_matches_model_on_random_text(spark, texts):
    import hashlib
    import re

    from affinity_spark.functions.text import winnow_fingerprints

    def model(text: str, k: int = 7, w: int = 4) -> list[int]:
        # ASCII \s semantics: Java regex (Spark) and RE2 (DuckDB) both treat
        # \s as ASCII-only — those two must agree; python re's Unicode \s
        # (which would eat U+00A0) is the odd one out.
        t = re.sub(r"[ \t\n\r\f\v]+", " ", text.strip(" \t\n\r\f\v").lower())
        if len(t) < k + w - 1:
            return []
        hs = [
            int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:8], 16)
            for i in range(len(t) - k + 1)
        ]
        return sorted({min(hs[j : j + w]) for j in range(len(hs) - w + 1)})

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {
        r.id: list(r.fps)
        for r in df.select("id", winnow_fingerprints(F.col("text")).alias("fps")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == model(t), repr(t)


# --- round-3 integer-exact primitives vs python models ---------------------

@given(st.lists(st.integers(min_value=0, max_value=2**52 - 1), min_size=1, max_size=30))
@SLOW
def test_isqrt_matches_math_isqrt(spark, xs):
    import math
    from affinity_spark.operators.sampling import isqrt

    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = [(r.x, r.s) for r in df.select("x", isqrt(F.col("x")).alias("s")).collect()]
    assert all(s == math.isqrt(x) for x, s in got)


@given(st.lists(st.integers(min_value=1, max_value=2**60 - 1), min_size=1, max_size=30))
@SLOW
def test_flog2_matches_bit_length(spark, xs):
    from affinity_spark.operators.lm import flog2

    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = [(r.x, r.f) for r in df.select("x", flog2(F.col("x")).alias("f")).collect()]
    assert all(f == x.bit_length() - 1 for x, f in got)


@given(
    st.lists(
        st.text(alphabet="ab cd\t\n", min_size=0, max_size=80),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=0, max_value=6),
)
@SLOW
def test_chunking_matches_python_model(spark, texts, size, overlap):
    import hashlib
    from affinity_spark.operators.chunking import chunk_tokens

    if overlap >= size:
        overlap = size - 1
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_tokens, r.chunk_md5)
        for r in chunk_tokens(df, chunk_size=size, overlap=overlap).collect()
    }
    want = {}
    stride = size - overlap
    for doc_id, text in enumerate(texts):
        toks = [t for t in text.lower().strip().split() if t]
        if not toks:
            continue
        n_chunks = max(-(-(len(toks) - overlap) // stride), 1)
        for i in range(n_chunks):
            piece = toks[i * stride : i * stride + size]
            want[(doc_id, i)] = (
                len(piece),
                hashlib.md5(" ".join(piece).encode()).hexdigest(),
            )
    assert got == want


@given(st.lists(st.sampled_from(["a", "b", "c", "dd", "ee"]), min_size=1, max_size=40))
@SLOW
def test_cms_matches_python_model(spark, keys):
    import hashlib
    from affinity_spark.operators.sketches import cms_sketch

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        (r.depth, r.bucket): r.cnt
        for r in cms_sketch(df, F.col("k"), depth=3, width=16).collect()
    }
    want: dict = {}
    for k in keys:
        for i in range(3):
            b = int(hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:8], 16) % 16
            want[(i, b)] = want.get((i, b), 0) + 1
    assert got == want


# --- round-4 operators vs python models ------------------------------------


def model_dd_bucket(v: int, m: int = 8) -> int:
    v = max(v, 1)
    e = v.bit_length() - 1
    return e * m + ((v - (1 << e)) * m) // (1 << e)


@given(st.lists(st.integers(min_value=-10, max_value=10_000_000), min_size=1, max_size=40))
@SLOW
def test_dd_sketch_matches_python_model(spark, values):
    from affinity_spark.operators.sketches import dd_sketch

    df = spark.createDataFrame([("k", v) for v in values], "k string, v long")
    got = {r.bucket: r.n for r in dd_sketch(df, ["k"], "v").collect()}
    want: dict[int, int] = {}
    for v in values:
        b = model_dd_bucket(v)
        want[b] = want.get(b, 0) + 1
    assert got == want


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=120), min_size=1, max_size=8
    )
)
@SLOW
def test_repeated_windows_matches_python_model(spark, texts):
    import hashlib
    import re

    from affinity_spark.operators.dedup import repeated_windows

    win, stride = 10, 4
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.win_hash: r.n_docs
        for r in repeated_windows(df, "doc_id", "text", win, stride).collect()
    }

    def winnow(t: str) -> set[int]:
        norm = re.sub(r"\s+", " ", t.lower().strip())
        if len(norm) < win + stride - 1:
            return set()
        hs = [
            int(hashlib.md5(norm[i : i + win].encode()).hexdigest()[:8], 16)
            for i in range(len(norm) - win + 1)
        ]
        return {min(hs[j : j + stride]) for j in range(len(hs) - stride + 1)}

    seen: dict[int, int] = {}
    for _, t in rows:
        for fp in winnow(t):
            seen[fp] = seen.get(fp, 0) + 1
    want = {fp: n for fp, n in seen.items() if n >= 2}
    assert got == want


# --- r5: debounce_replay vs the python emission fold -------------------------

debounce_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # key — collisions
        st.integers(min_value=0, max_value=40),   # ts — small domain, ties
    ),
    min_size=0,
    max_size=16,
)


@given(rows=debounce_rows, interval=st.integers(min_value=1, max_value=12))
@SLOW
def test_debounce_replay_matches_python_fold(spark, rows, interval):
    from affinity_spark.streaming.state import debounce_replay

    if not rows:
        return
    df = spark.createDataFrame(rows, "k long, ts long")
    got = sorted(
        tuple(r) for r in debounce_replay(df, "k", "ts", interval).collect()
    )

    model = []
    bykey: dict[int, list[int]] = {}
    for k, t in rows:
        bykey.setdefault(k, []).append(t)
    for k, ts in bykey.items():
        last, pending = None, 0
        for t in sorted(ts):
            if last is None or t >= last + interval:
                model.append((k, t, pending))
                last, pending = t, 0
            else:
                pending += 1
    assert got == sorted(model)


# --- r5: rare_key_pairs vs the python pair model ------------------------------

keyed_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # id
        st.integers(min_value=0, max_value=5),   # key — hot keys likely
    ),
    min_size=0,
    max_size=24,
).map(lambda rows: sorted(set(rows)))  # unique per (id, key) — the contract


@given(rows=keyed_rows, cap=st.integers(min_value=1, max_value=6),
       min_shared=st.integers(min_value=1, max_value=3))
@SLOW
def test_rare_key_pairs_matches_python_model(spark, rows, cap, min_shared):
    from collections import Counter

    from affinity_spark.operators.dedup import rare_key_pairs

    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, k string" if False else "doc_id long, k long")
    got = sorted(
        tuple(r)
        for r in rare_key_pairs(df, "k", "doc_id", max_df=cap, min_shared=min_shared).collect()
    )

    dfc = Counter(k for _, k in rows)
    pairs = Counter()
    bykey: dict[int, list[int]] = {}
    for i, k in rows:
        bykey.setdefault(k, []).append(i)
    for k, ids in bykey.items():
        if dfc[k] > cap:
            continue
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pairs[(ids[x], ids[y])] += 1
    model = sorted(
        (a, b, n) for (a, b), n in pairs.items() if n >= min_shared
    )
    assert got == model


# --- r5: ppjoin prefix filtering vs the exhaustive join, any threshold -------

doc_texts = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
        min_size=0,
        max_size=10,
    ).map(" ".join),
    min_size=2,
    max_size=8,
)

thresholds = st.sampled_from([(1, 3), (1, 2), (2, 3), (3, 4), (1, 1)])


@given(texts=doc_texts, t=thresholds)
@SLOW
def test_ppjoin_matches_exhaustive_at_any_threshold(spark, texts, t):
    """The prefix-length formula |x| - ceil(t|x|) + 1 and the length-band
    filter must be exact for EVERY threshold, not just the oracle's 1/2 —
    tiny vocab + short docs force heavy shingle sharing, boundary sizes
    and J == t ties."""
    from pyspark.sql import functions as F

    from affinity_spark.operators.dedup import (
        doc_shingle_arrays,
        jaccard_verify_arrays,
        ppjoin_pairs,
        shingle_table,
    )

    t_num, t_den = t
    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], ["doc_id", "text"]
    )
    arrs = doc_shingle_arrays(docs, "doc_id", "text", 2)
    got = sorted(
        tuple(r) for r in ppjoin_pairs(arrs, "doc_id", t_num, t_den).collect()
    )

    sh = shingle_table(docs, "doc_id", "text", 2).select("doc_id", "shingle")
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    want = sorted(
        tuple(r)
        for r in jaccard_verify_arrays(cand, arrs, "doc_id", t_num, t_den).collect()
    )
    assert got == want


# --- incremental batch-vs-corpus dedup == restricted exhaustive result ------

_doc_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "run", "the", "fox"]),
    min_size=0,
    max_size=12,
)


@given(st.lists(_doc_words, min_size=2, max_size=8))
@SLOW
def test_incremental_lsh_pairs_matches_restricted_full(spark, docs_words):
    """For ANY corpus split into existing (even ids) and new batch (odd
    ids), probing the existing bands with the batch's bands + verify must
    equal the FULL all-pairs LSH+verify result restricted to cross-side
    pairs (reoriented new-first) — banding is per-doc, so subsetting the
    join sides can neither invent nor drop a pair. Tiny word vocabulary
    forces shared shingles, band collisions, and exact duplicates."""
    from affinity_spark.operators import dedup as dd

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    arrs = dd.doc_shingle_arrays(docs, "doc_id", "text", 3)
    existing = arrs.filter(F.col("doc_id") % 2 == 0)
    new_batch = arrs.filter(F.col("doc_id") % 2 == 1)

    got = sorted(
        tuple(r)
        for r in dd.incremental_lsh_pairs(
            existing, new_batch, "doc_id", 1, 2
        ).collect()
    )

    cand = dd.lsh_candidate_pairs(dd.lsh_bands_mapside(arrs, "doc_id"), "doc_id")
    full = dd.jaccard_verify_arrays(cand, arrs, "doc_id", 1, 2).collect()
    want = sorted(
        ((r.id_a, r.id_b, r.n_common, r.n_union) if r.id_a % 2 == 1
         else (r.id_b, r.id_a, r.n_common, r.n_union))
        for r in full
        if (r.id_a % 2) != (r.id_b % 2)
    )
    assert got == want


@given(
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
)
@SLOW
def test_kmv_union_matches_sketch_of_union(spark, xs, ys):
    """KMV mergeability on ANY two value sets: the union sketch built
    from the two k-sketches alone equals the sketch built over the
    unioned raw data — the property that lets day-sketches combine
    without raw re-reads. Small k forces truncation; overlapping small
    value domain forces shared hashes."""
    import hashlib

    from affinity_spark.operators.sketches import kmv_sketch, kmv_union

    k = 4
    rows = [("a", x) for x in xs] + [("b", y) for y in ys]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_sketch(df, ["g"], F.col("v").cast("string"), k)
    merged = (
        sk.groupBy()
        .agg(F.min_by("kmv", "g").alias("ka"), F.max_by("kmv", "g").alias("kb"))
        .select(kmv_union(F.col("ka"), F.col("kb"), k).alias("km"))
        .collect()[0]
        .km
    )

    def model(vals):
        hs = {int(hashlib.md5(f"0:{v}".encode()).hexdigest()[:8], 16) for v in vals}
        return sorted(hs)[:k]

    assert list(merged) == model(set(xs) | set(ys))


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=16,
            max_size=16,
        ),
        min_size=1,
        max_size=6,
    )
)
@SLOW
def test_sign_bit_words_matches_model(spark, vecs):
    """Packed sign codes equal the python model bit for bit on generated
    vectors (16 dims → one word; exercises the sub-word tail path)."""
    from affinity_spark.functions.vectors import sign_bit_words

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: r["code"]
        for r in df.select(
            "vec_id", sign_bit_words(F.col("embedding"), 16).alias("code")
        ).collect()
    }
    import struct

    for i, v in enumerate(vecs):
        # spark stores float32: replicate the cast before the sign test
        v32 = [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        want = sum((1 << j) for j in range(16) if v32[j] >= 0)
        assert got[i] == [want], (i, v)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # doc id — collisions likely
            st.integers(min_value=1, max_value=10),  # rank
        ),
        min_size=0,
        max_size=8,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=1, max_value=10),
        ),
        min_size=0,
        max_size=8,
    ),
)
@SLOW
def test_rrf_fuse_matches_model(spark, la, lb):
    """Fused scores and per-list rank evidence equal the python model on
    generated rank lists (duplicate ids within a list keep the max rank —
    the union+groupBy contract)."""
    from affinity_spark.operators.ranking import rrf_fuse

    if not la and not lb:
        return
    fa = spark.createDataFrame(la or [(999, 1)], "doc_id long, rank int")
    fb = spark.createDataFrame(lb or [(998, 1)], "doc_id long, rank int")
    la = la or [(999, 1)]
    lb = lb or [(998, 1)]
    rows = rrf_fuse([("a", fa), ("b", fb)], k=100, c=60).collect()

    def model(pairs):
        best: dict[int, int] = {}
        for d, r in pairs:
            best[d] = max(best.get(d, 0), r)
        return best

    ma, mb = model(la), model(lb)
    want = {}
    for d in set(ma) | set(mb):
        ra, rb = ma.get(d, 0), mb.get(d, 0)
        score = (1000000 // (60 + ra) if ra else 0) + (
            1000000 // (60 + rb) if rb else 0
        )
        want[d] = (score, ra, rb)
    got = {r["doc_id"]: (r["rrf_x1e6"], r["a_rank"], r["b_rank"]) for r in rows}
    assert got == want
    # output order: score desc, id asc
    keys = [(r["rrf_x1e6"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))

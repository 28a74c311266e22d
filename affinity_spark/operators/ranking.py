"""BM25-style ranked retrieval over the documents corpus.

The reference's query surface is key/prefix/index lookup
(``core/src/main/scala/io/amient/affinity/core/storage/KVStoreIndex.scala:20-37``);
ranked full-text retrieval is the §2.13 training/search extension of the
same inverted-index family (``operators/index.py``).

Spark-first scale shape — for a FIXED small query (a handful of terms),
never build the full inverted index:

1. per-doc term frequencies are map-side array ops
   (``size(filter(tokens, t -> t = term))``) — no explode, no shuffle;
2. corpus statistics (N, total token length, per-term document
   frequencies) reduce to ONE row, broadcast back via a 1-row cross
   join — the only exchange in the plan;
3. scoring is a pure integer projection; top-k is
   ``TakeOrderedAndProject`` (never a global sort).

Scoring is the BM25 saturation formula with k1=1.2, b=0.75 rewritten as
exact integer arithmetic so a DuckDB oracle reproduces it bit-for-bit
(the repo's cross-engine hash rule: never compare summed doubles):

    sat_x1000  = (tf*2200*L*1000) div (tf*1000*L + 300*L + 900*dl*N)
    idf_x1000  = (N - df) * 1000 div N          -- linear idf surrogate
    score_x1e6 = sum over terms of idf_x1000 * sat_x1000

where dl = doc token count, L = total corpus token count. The linear
(N-df)/N rarity weight replaces log-idf: log() on doubles is not
integer-exact across engines, and monotonicity in df — all ranking needs
— is preserved. BIGINT headroom: tf*2200*L*1000 needs L·tf < 4e12,
fine for per-shard scoring at any practical shard size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1_X10 = 12
B_X100 = 75


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: Sequence[str],
    k: int = 20,
) -> DataFrame:
    """Top-k ``(doc id, score_x1e6)`` for an OR-of-terms query.

    Two scans of ``docs`` (one reduced to a single broadcast stats row),
    zero explodes, one TakeOrderedAndProject. Ties break on doc id.
    """
    from affinity_spark.functions.text import tokenize

    toks = docs.select(
        F.col(id_col).alias("_id"), tokenize(F.col(text_col)).alias("_t")
    )

    def tf(term: str) -> F.Column:
        return F.size(F.filter(F.col("_t"), lambda x: x == F.lit(term))).cast("long")

    base = toks.select(
        "_id",
        F.size(F.col("_t")).cast("long").alias("_dl"),
        *[tf(t).alias(f"_tf_{i}") for i, t in enumerate(terms)],
    )

    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_l"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )

    scored = base.crossJoin(F.broadcast(stats))
    contribs = []
    for i in range(len(terms)):
        tf_i = F.col(f"_tf_{i}")
        sat = F.expr(
            f"(_tf_{i} * 2200 * _l * 1000) div "
            f"(_tf_{i} * 1000 * _l + 300 * _l + 900 * _dl * _n)"
        )
        idf = F.expr(f"((_n - _df_{i}) * 1000) div _n")
        contribs.append(F.when(tf_i > 0, idf * sat).otherwise(F.lit(0)))
    score = sum(contribs[1:], contribs[0]).cast("long")
    return (
        scored.select(F.col("_id").alias(id_col), score.alias("score_x1e6"))
        .filter(F.col("score_x1e6") > 0)
        .orderBy(F.col("score_x1e6").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_topk_postings(
    index,
    terms: Sequence[str],
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`bm25_topk` answered from a materialized
    :class:`~affinity_spark.operators.postings.PostingsIndex` - ZERO scans
    of the documents table; bit-identical scores.

    Plan shape: the query-term filter prunes the postings scan to the
    terms' file clusters; per-term df rides the SAME scan as a window
    count over the tf aggregation (a second scan branch for the df
    groupBy was the r13 work-volume finding: the postings table was read
    twice per query — exchange reuse does not survive the broadcast
    conversion); the 1-row (N, L) stats broadcast back; the hits frame
    (docs containing >= 1 query term - the only rows that can score > 0,
    exactly the rows `bm25_topk` keeps) broadcasts into the doclen join;
    top-k stays TakeOrderedAndProject.

    The broadcast hint assumes query terms with bounded posting lists
    (retrieval queries are selective by construction - a corpus-majority
    term scores ~0 under idf anyway). If a caller must score a stopword
    term over a 100 TB corpus, drop the hint and let AQE pick the
    doc_id-shuffled join; results are identical.
    """
    from pyspark.sql import Window

    term_list = list(terms)
    hits = (
        index.tf_postings(1)
        .filter(F.col("term").isin(term_list))
        .withColumn("_df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    )
    scored = (
        F.broadcast(hits)
        .join(index.doclens().withColumnRenamed("dl", "_dl"), id_col)
        .crossJoin(
            F.broadcast(
                index.corpus_stats().select(
                    F.col("n_docs").alias("_n"), F.col("total_len").alias("_l")
                )
            )
        )
        .select(
            id_col,
            (
                F.expr("((_n - _df) * 1000) div _n")
                * F.expr(
                    "(tf * 2200 * _l * 1000) div "
                    "(tf * 1000 * _l + 300 * _l + 900 * _dl * _n)"
                )
            ).alias("_c"),
        )
        .groupBy(id_col)
        .agg(F.sum("_c").cast("long").alias("score_x1e6"))
    )
    return (
        scored.filter(F.col("score_x1e6") > 0)
        .orderBy(F.col("score_x1e6").desc(), F.col(id_col))
        .limit(k)
    )


def tfidf_pairs_postings(
    index,
    n: int,
    max_df: int = 100,
    k: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`tfidf_pairs` answered from a materialized postings index -
    the tf frame IS the index, so the corpus is never re-tokenized: zero
    document scans and the df/self-join aggregations reuse one exchange of
    the postings clustered on term (vs 9 shuffles / ~3 corpus scans for
    the from-scratch plan).  Scores bit-identical (same integer
    floor-log2 idf, same df cap).

    The tf frame is read ONCE and exchanged ONCE: df is a count window
    over the term partitioning (the bm25 single-scan discipline), the
    per-term posting lists (<= max_df entries by construction) are
    collected in place — no second exchange, the groupBy reuses the
    window's — and the Σ w_a·w_b pair terms are enumerated MAP-SIDE inside
    each list, so only the final pair aggregation shuffles. The former
    shape planned the tf scan + df aggregate TWICE (once per self-join
    side) plus a term-keyed join; this one has two exchanges total, and
    the struct HOFs only BUILD pair structs (never sort/distinct them —
    the interpreted-comparator trap needs per-element struct compares)."""
    from pyspark.sql import Window

    tf = index.tf_postings(n)
    # user-specified term partitioning at the session's parallelism: the
    # pair-enumeration HOF downstream is CPU-heavy per BYTE, and AQE's
    # byte-based coalescing squeezed the whole window+collect+Generate
    # stage onto 4 tasks (3.1 s of its CPU serialized onto a 4-task
    # critical path at sf0.1). An explicit repartition is exempt from
    # coalescing, and the window + groupBy(term) both reuse this one
    # exchange (ClusteredDistribution(term) is satisfied by any count).
    # defaultParallelism scales with the session's cores, not a constant.
    tf = tf.repartition(
        tf.sparkSession.sparkContext.defaultParallelism, "term"
    )
    n_docs = index.corpus_stats().select(F.col("n_docs").alias("n"))
    w = (
        tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .filter(F.col("df") <= F.lit(max_df))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.col(id_col).alias("_id"),
            (F.col("tf") * (F.length(F.bin(F.expr("n div df"))) - 1).cast("long")).alias("w"),
        )
        .filter(F.col("w") > 0)
    )
    lst = w.groupBy("term").agg(
        F.collect_list(F.struct(F.col("_id"), F.col("w"))).alias("_lst")
    )

    def pair_terms(l):
        # every unordered doc pair within the posting list, keyed
        # (min id, max id) — list order is immaterial to the product
        return F.flatten(
            F.transform(
                l,
                lambda x, i: F.transform(
                    F.slice(l, i + 2, F.size(l) - i - 1),
                    lambda y: F.struct(
                        F.least(x["_id"], y["_id"]).alias("id_a"),
                        F.greatest(x["_id"], y["_id"]).alias("id_b"),
                        (x["w"] * y["w"]).alias("p"),
                    ),
                ),
            )
        )

    dots = (
        lst.select(F.explode(pair_terms(F.col("_lst"))).alias("_pr"))
        .groupBy(F.col("_pr.id_a").alias("id_a"), F.col("_pr.id_b").alias("id_b"))
        .agg(F.sum(F.col("_pr.p")).alias("dot"))
    )
    return dots.orderBy(F.col("dot").desc(), "id_a", "id_b").limit(k)


def tfidf_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int = 100,
    k: int = 50,
    n: int = 1,
) -> DataFrame:
    """Top-k most similar DOCUMENT PAIRS by sparse TF-IDF dot product —
    doc-to-doc similarity via the inverted index (the retrieval-side
    complement of ``bm25_topk``'s query-to-doc scoring).

    Engine-exact integer weighting: w(t,d) = tf(t,d) * floor_log2(N div
    df(t)) — the repo's floor-log2 fixed point, so any engine reproduces
    the scores bit-for-bit (float idf logs diverge in the last ulp).
    Terms with df > max_df are dropped (posting-list cap), and terms in
    more than half the corpus get idf 0 and vanish — the integer idf IS
    the stopword cut.

    Scale shape: candidates come from the postings self-join on term, so
    pair work is Σ df(t)² over KEPT terms ≤ max_df · Σ df(t) — the cap
    bounds the join quadratic the way LSH banding bounds minhash. One
    TakeOrderedAndProject finishes (per-partition heap, never a global
    sort). The corpus size N is a 1-row broadcast.

    ``n`` sets the term granularity: 1 = unigrams; higher = word n-grams
    (non-distinct, so tf is a real count). Corpora whose unigram
    vocabulary saturates (every word in most docs -> idf 0 across the
    board) keep discriminative terms at n-gram granularity — n-gram df
    shrinks geometrically while the df cap still bounds the join.
    """
    from affinity_spark.functions.text import let_bound, tokenize

    if n == 1:
        terms = F.explode(tokenize(F.col(text_col)))
    else:
        def grams_of(tk):
            cnt = F.greatest(F.size(tk) - (n - 1), F.lit(0))
            grams = F.transform(
                F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
            )
            return F.when(cnt > 0, grams).otherwise(F.array().cast("array<string>"))

        terms = F.explode(let_bound(tokenize(F.col(text_col)), grams_of))
    tf = (
        docs.select(F.col(id_col).alias("_id"), terms.alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # the 1-row corpus count; named to never shadow the n-gram size param
    n_docs_df = docs.agg(F.count(F.lit(1)).alias("n"))
    w = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs_df))
        .filter(F.col("df") <= F.lit(max_df))
        .select(
            "_id",
            "term",
            (F.col("tf") * (F.length(F.bin(F.expr("n div df"))) - 1).cast("long")).alias("w"),
        )
        .filter(F.col("w") > 0)
    )
    a = w.select(F.col("_id").alias("id_a"), "term", F.col("w").alias("w_a"))
    b = w.select(F.col("_id").alias("id_b"), "term", F.col("w").alias("w_b"))
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("w_a") * F.col("w_b")).alias("dot"))
    )
    return dots.orderBy(F.col("dot").desc(), "id_a", "id_b").limit(k)


def pmi_collocations(
    index,
    window: int = 5,
    min_count: int = 5,
    k: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k word collocations by pointwise mutual information, computed
    ENTIRELY from the positional postings index — the corpus-analysis
    companion of the retrieval family (collocation mining for tokenizer /
    embedding diagnostics; Church & Hanks 1990, public).

    Pair counts come from an equi-join of the positional table against
    itself shifted by d=1..window (explode the offsets, join on
    (doc, pos+d)): postings-LINEAR work (|postings| * window output),
    never per-doc quadratic. Ordered pairs (a before b), distance <=
    window.

    PMI is the repo's integer floor-log2 fixed point so any engine
    reproduces it bit-for-bit — computed as a SUM of per-component
    floor_log2 terms (never a single product):

        pmi_log2_x16 = 4 + fl2(n_ab) + 2*fl2(U) - fl2(n_a) - fl2(n_b) - fl2(P)

    with U = total unigram postings, P = total pair observations and
    fl2(x) = floor(log2(x)).  The naive single-expression form
    floor_log2(16*n_ab*U²/(n_a*n_b*P)) overflows int64 once U reaches
    ~1e7 tokens (U² alone exceeds 2^63; ANSI mode aborts the job and the
    DuckDB oracle errors the same way) — the decomposed sum keeps every
    intermediate <= the largest single count, so it is safe at any corpus
    size.  Precision bound: each fl2 drops a fractional bit in [0, 1), so
    the sum is within (-3, +3) bits of the real-valued 16-shifted log2
    ratio — the same granularity class as the old floor-of-quotient form
    (within 1 bit), and identical on both engines, which is the contract
    that matters.  Calibration is unchanged in expectation: independence
    reads ~4, each doubling of association adds ~1, pairs flooring to
    <= 0 drop out (the association cut). Ties: (pmi desc, n_ab desc, w1,
    w2). ``min_count`` is the standard support floor against one-off
    pairs.
    """

    def _fl2(col):
        # floor(log2(x)) for BIGINT x >= 1, bit-exact in Spark and DuckDB
        return (F.length(F.bin(col)) - 1).cast("long")

    pos = index.positional()
    uni = pos.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    a = pos.select(
        F.col(id_col), F.col("pos"), F.col("term").alias("w1")
    ).crossJoin(F.broadcast(
        pos.sparkSession.range(1, window + 1).select(F.col("id").alias("_d"))
    )).select(id_col, (F.col("pos") + F.col("_d")).alias("pos"), "w1")
    b = pos.select(F.col(id_col), "pos", F.col("term").alias("w2"))
    from affinity_spark import cache

    # pair counts persist (vocab²-bounded aggregate output): both the
    # normalizer P (which must be the PRE-filter total, or every PMI
    # shifts by the same bias) and the supported-pair frame consume it
    pairs_all = cache.track(
        a.join(b, [id_col, "pos"])
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .persist()
    )
    pairs = pairs_all.filter(F.col("n_ab") >= F.lit(min_count))
    totals = uni.agg(F.sum("n").alias("_u"))
    n_pairs = pairs_all.agg(F.sum("n_ab").alias("_p"))
    na = uni.select(F.col("term").alias("w1"), F.col("n").alias("n_a"))
    nb = uni.select(F.col("term").alias("w2"), F.col("n").alias("n_b"))
    scored = (
        pairs.join(F.broadcast(na), "w1")
        .join(F.broadcast(nb), "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_pairs))
        .select(
            "w1",
            "w2",
            "n_ab",
            (
                F.lit(4).cast("long")
                + _fl2(F.col("n_ab"))
                + F.lit(2) * _fl2(F.col("_u"))
                - _fl2(F.col("n_a"))
                - _fl2(F.col("n_b"))
                - _fl2(F.col("_p"))
            ).alias("pmi_log2_x16"),
        )
        .filter(F.col("pmi_log2_x16") > 0)
    )
    return scored.orderBy(
        F.desc("pmi_log2_x16"), F.desc("n_ab"), F.asc("w1"), F.asc("w2")
    ).limit(k)


def rrf_fuse(
    ranked: Sequence[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    k: int = 20,
    c: int = 60,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack et al. 2009) of N ranked lists:
    score(d) = Σ_lists 1e6 div (c + rank_list(d)), top-k by fused score.

    ``ranked`` is (list_name, frame) pairs; each frame carries ``id_col``
    and a ``rank`` column (1-based; produce it with a row_number over the
    list's own order — safe as a GLOBAL window because retrieval lists
    are top-k-truncated before fusion, so every fusion input here is
    k-sized, independent of corpus scale). Output keeps each list's rank
    as ``<name>_rank`` (0 = absent) beside the integer ``rrf_x1e6``, so
    the fused order is auditable and hash-stable across engines.

    Shape: union the tagged rank rows and aggregate per id — an N-way
    FULL OUTER join chain would plan as N−1 SortMergeJoins (Spark cannot
    broadcast a full-outer build side); the union+groupBy form is
    map-side unions plus ONE k·N-row exchange and generalizes to any
    list count for free."""
    if not ranked:
        raise ValueError("rrf_fuse: no ranked lists")
    parts = [
        frame.select(
            F.col(id_col),
            F.lit(name).alias("_list"),
            F.col("rank").cast("long").alias("_rank"),
        )
        for name, frame in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    rank_cols = [f"{name}_rank" for name, _ in ranked]
    fused = u.groupBy(id_col).agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("_list") == name, F.col("_rank"))), F.lit(0)
            )
            .cast("long")
            .alias(f"{name}_rank")
            for name, _ in ranked
        ]
    )
    contrib = None
    for rc in rank_cols:
        term = F.when(
            F.col(rc) > 0, F.expr(f"1000000 div ({c} + {rc})")
        ).otherwise(F.lit(0))
        contrib = term if contrib is None else contrib + term
    return (
        fused.select(
            id_col, contrib.cast("long").alias("rrf_x1e6"), *rank_cols
        )
        .orderBy(F.col("rrf_x1e6").desc(), F.col(id_col))
        .limit(k)
    )

"""Count-based language-model scoring and importance weighting.

Two public-paper quality-filter families a training-data pipeline runs at
corpus scale, both expressed as pure DataFrame plans with integer
fixed-point math so any engine reproduces the scores bit-for-bit:

- :func:`lm_score_bits` — CCNet-style perplexity filtering (Wenzek et al.
  2020): score every document against a bigram model trained on a trusted
  reference slice; high bits-per-bigram ≈ out-of-domain / low-quality text.
- :func:`dsir_weights` — DSIR-style importance weights (Xie et al. 2023):
  hashed-unigram log-likelihood ratio between a target distribution and the
  raw corpus, the score used to importance-resample pretraining data toward
  a target domain.
- :func:`train_nb_model` / :func:`nb_score_bits` /
  :func:`classifier_eval` — a fastText-style supervised quality classifier
  (Joulin et al. 2016; the GPT-3/LLaMA "quality filter" step): hashed-
  unigram Naive Bayes trained on a labeled slice, applied as per-document
  integer log-odds, evaluated on a held-out split with exact confusion
  counts. Together the three cover the standard corpus-filter trio:
  perplexity (unsupervised), importance (distribution-matching), and
  classification (supervised).

Float logs diverge across engines at the ULP level, so both operators use
the integer floor-log2 ``flog2(x) = length(bin(x)) - 1`` (exact in any
engine with a binary formatter) — the scores are coarse by design: they
rank and gate, they are not entropy estimates.

Scale design: models are vocabulary/bucket-sized — orders of magnitude
smaller than the corpus — so scoring is explode → broadcast join → one
groupBy(doc) shuffle. Training is one explode + count over the reference
slice only. Nothing driver-side; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from affinity_spark.functions.text import _int_div, let_bound, tokenize


def flog2(x: Column) -> Column:
    """Integer floor(log2(x)) for x >= 1: bit-length minus one. Exact in
    both Spark and DuckDB (``length(bin(x)) - 1``), unlike float log2."""
    return (F.length(F.bin(x)) - 1).cast("long")


def flog2_x1024(x: Column) -> Column:
    """log2(x) in 1/1024-bit fixed point for 1 <= x < 2^53, engine-exact.

    ``1024*e + ((x << 10) >> e) - 1024`` with ``e = floor(log2(x))`` —
    exponent from the bit length, mantissa linearly interpolated (max
    error 0.086 bits, monotone, pure int64 ops). DuckDB replays it as
    ``1024*(length(bin(x))-1) + ((x*1024) >> (length(bin(x))-1)) - 1024``.
    Needed where :func:`flog2`'s whole-bit resolution is too coarse: a
    Naive Bayes log-odds sum is a difference of nearly-equal logs, and
    flooring each term to a whole bit erases the signal entirely (measured:
    every per-token weight rounds to 0 on balanced classes).

    Column-valued shift counts aren't reachable through ``F.shiftright``
    (literal-only wrapper), hence ``F.call_function``.
    """
    e = (F.length(F.bin(x)) - 1).cast("int")
    m = F.call_function(
        "shiftright", F.call_function("shiftleft", x.cast("long"), F.lit(10)), e
    )
    return e.cast("long") * 1024 + m - 1024


def doc_bigrams(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """Explode each document into adjacent token pairs ``(w1, w2)``.

    ANSI-safe: uses ``F.get`` (null on out-of-bounds), never ``element_at``;
    the sequence only covers valid starts so no nulls are produced.
    Documents with fewer than two tokens yield no rows.
    """
    toks_expr = tokenize(F.col(text_col))

    def pairs_of(t: Column) -> Column:
        n = F.size(t)
        return F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
                lambda i: F.struct(
                    F.get(t, i - 1).alias("w1"), F.get(t, i).alias("w2")
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    return df.select(
        *id_cols, F.explode(let_bound(toks_expr, pairs_of)).alias("_bg")
    ).select(*id_cols, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))


def train_bigram_model(ref_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram counts over the reference slice: ``(w1, w2, c)``.

    Context counts and vocabulary size are derived from this one table
    downstream (no second corpus pass). Output is vocabulary²-bounded —
    broadcastable for any realistic vocabulary."""
    return (
        doc_bigrams(ref_docs, [], text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c"))
    )


def train_bigram_models_per_group(
    ref_docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """One bigram model PER GROUP: ``(group, w1, w2, c)`` — the actual
    CCNet construction (Wenzek et al. 2020 train one KenLM per language;
    a cross-lingual model scores every non-reference language as noise).
    Output is groups × vocabulary² — still model-sized and broadcastable
    when the per-group reference slices are (the CCNet shape)."""
    return (
        doc_bigrams(ref_docs, [group_col], text_col)
        .groupBy(group_col, "w1", "w2")
        .agg(F.count("*").cast("long").alias("c"))
    )


def kn_score_bits_per_group(
    docs: DataFrame,
    models: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    discount_quarters: int = 3,
) -> DataFrame:
    """:func:`kn_score_bits` with one KN model per group: every document
    scores against ITS OWN group's model (join keys grow the group
    column; the math per group is identical, see kn_score_bits for the
    exact-integer formulation). Documents whose group has no model (no
    reference bigrams) produce no rows — same contract as the < 2-token
    case. Plan shape unchanged: model-sized broadcast aggregates keyed
    by group, map-side joins, ONE corpus-sized shuffle (groupBy doc)."""
    from affinity_spark.cache import track

    d = int(discount_quarters)
    if not 1 <= d <= 3:
        raise ValueError("discount_quarters must be in 1..3 (D = d/4 in (0,1))")
    # four broadcast consumers: persist the (groups × vocab²)-bounded model
    # so each broadcast reads the cache instead of re-training (see
    # kn_score_bits)
    c2 = track(models.persist())
    ctx = c2.groupBy(group_col, "w1").agg(
        F.sum("c").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    cont = c2.groupBy(group_col, "w2").agg(
        F.count(F.lit(1)).cast("long").alias("np_")
    )
    tot = c2.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("t_"),
        F.countDistinct("w2").cast("long").alias("v_"),
    )

    db = doc_bigrams(docs, [id_col, group_col], text_col)
    tv = F.col("t_") + F.col("v_")
    npl = F.coalesce(F.col("np_"), F.lit(0)) + F.lit(1)
    seen = F.col("c1").isNotNull()
    num = F.when(
        seen,
        F.greatest(F.coalesce(F.col("c"), F.lit(0)) * 4 - F.lit(d), F.lit(0)) * tv
        + F.lit(d) * F.col("n1f") * npl,
    ).otherwise(npl)
    den = F.when(seen, F.col("c1") * 4 * tv).otherwise(tv)
    scored = (
        db.join(F.broadcast(tot), [group_col])
        .join(F.broadcast(c2), [group_col, "w1", "w2"], "left")
        .join(F.broadcast(ctx), [group_col, "w1"], "left")
        .join(F.broadcast(cont), [group_col, "w2"], "left")
        .select(
            id_col,
            group_col,
            (flog2_x1024(den) - flog2_x1024(num)).alias("bits_x1024"),
        )
    )
    agg = scored.groupBy(id_col, group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("bits_x1024").cast("long").alias("nll_kn_x1024"),
    )
    return agg.select(
        id_col,
        group_col,
        "n_bigrams",
        "nll_kn_x1024",
        _int_div(F.col("nll_kn_x1024") * 100, F.col("n_bigrams") * 1024).alias(
            "bits_per_bigram_x100"
        ),
    )


def lm_score_bits(
    docs: DataFrame,
    bigram_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score each document against the bigram model in integer "bits".

    Per-bigram cost ``flog2(C1(w1) + V) - flog2(C2(w1, w2) + 1)`` is the
    floor-log2 of the add-one-smoothed inverse conditional probability
    (``C1`` = left-context count, ``V`` = left-vocabulary size, both derived
    from the model); summed per document it is a monotone integer proxy for
    the negative log-likelihood. Returns one row per document with >= 1
    bigram: ``(id, n_bigrams, nll_bits, bits_per_bigram_x100)``.

    Plan: model-side aggregates are model-sized (broadcast); document
    bigrams join them map-side; ONE corpus-sized shuffle (groupBy doc).
    """
    from affinity_spark.cache import track

    # three broadcast consumers (v, c2, c1) — broadcast exchanges never
    # share work, so an unpersisted model re-runs the whole reference-slice
    # tokenize+bigram aggregation once per broadcast; the model is
    # vocab²-bounded, so persisting it is the cheap side of the r5
    # multi-branch rule
    c2 = track(bigram_model.persist())
    c1 = c2.groupBy("w1").agg(F.sum("c").cast("long").alias("c1"))
    v = c2.agg(F.countDistinct("w1").cast("long").alias("v"))

    db = doc_bigrams(docs, [id_col], text_col)
    scored = (
        db.crossJoin(F.broadcast(v))
        .join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .select(
            id_col,
            (
                flog2(F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                - flog2(F.coalesce(F.col("c"), F.lit(0)) + F.lit(1))
            ).alias("bits"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("bits").cast("long").alias("nll_bits"),
    )
    return agg.select(
        id_col,
        "n_bigrams",
        "nll_bits",
        _int_div(F.col("nll_bits") * 100, F.col("n_bigrams")).alias(
            "bits_per_bigram_x100"
        ),
    )


def kn_score_bits(
    docs: DataFrame,
    bigram_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount_quarters: int = 3,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring in 1/1024-bit fixed point —
    the actual CCNet filter recipe's smoothing family (CCNet uses a KenLM
    5-gram; Kneser & Ney 1995, Chen & Goodman 1999 are the public
    formulation) upgrading :func:`lm_score_bits`'s add-one baseline.

    With discount ``D = discount_quarters/4`` (default 0.75, the standard
    value), all quantities derive from the one bigram count table::

        P_KN(w2|w1) = max(c(w1,w2) - D, 0)/c(w1.) + lam(w1) * Pcont(w2)
        lam(w1)     = D * N1+(w1.) / c(w1.)
        Pcont(w2)   = (N1+(.w2) + 1) / (T + V)     # add-one continuation

    where ``N1+(w1.)`` / ``N1+(.w2)`` are distinct-follower / distinct-
    predecessor type counts, ``T`` = total bigram types, ``V`` = distinct
    right-word vocabulary. The +1/(T+V) smoothing keeps unseen words
    scoreable (plain KN gives them probability zero); since
    sum(N1+(.w2)) = T, the continuation distribution still sums to 1 over
    the vocabulary, so per-bigram probability NUM/DEN <= 1 exactly.

    Multiplying through by 4 (quarters) and by (T+V) makes NUM and DEN
    exact integers::

        NUM = max(4c - d, 0)*(T+V) + d*N1f*(Np+1)      # seen context
        DEN = 4*c1*(T+V)
        NUM = Np + 1, DEN = T + V                      # unseen context

    and per-bigram cost is ``flog2_x1024(DEN) - flog2_x1024(NUM)`` >= 0.
    Counts must satisfy ``4*c1*(T+V) < 2^53`` (flog2_x1024's domain) —
    train the model on a reference SLICE (the CCNet shape), not the whole
    100 TB corpus, which is also what keeps the model broadcastable.

    Output: ``(id, n_bigrams, nll_kn_x1024, bits_per_bigram_x100)`` for
    documents with >= 1 bigram. Plan shape is identical to
    :func:`lm_score_bits`: model-sized broadcast aggregates, map-side
    joins, ONE corpus-sized shuffle (groupBy doc).
    """
    from affinity_spark.cache import track

    d = int(discount_quarters)
    if not 1 <= d <= 3:
        raise ValueError("discount_quarters must be in 1..3 (D = d/4 in (0,1))")
    # FOUR broadcast consumers (tot, c2, ctx, cont) — broadcast exchanges
    # never share work, so an unpersisted model re-runs the reference-slice
    # tokenize+bigram aggregation once per broadcast; the model is
    # vocab²-bounded (the cheap side of the multi-branch persist rule)
    c2 = track(bigram_model.persist())
    # left-context totals AND distinct-follower type counts: one pass
    ctx = c2.groupBy("w1").agg(
        F.sum("c").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    # continuation type counts per right word
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("np_"))
    tot = c2.agg(
        F.count(F.lit(1)).cast("long").alias("t_"),
        F.countDistinct("w2").cast("long").alias("v_"),
    )

    db = doc_bigrams(docs, [id_col], text_col)
    tv = F.col("t_") + F.col("v_")
    npl = F.coalesce(F.col("np_"), F.lit(0)) + F.lit(1)
    seen = F.col("c1").isNotNull()
    num = F.when(
        seen,
        F.greatest(F.coalesce(F.col("c"), F.lit(0)) * 4 - F.lit(d), F.lit(0)) * tv
        + F.lit(d) * F.col("n1f") * npl,
    ).otherwise(npl)
    den = F.when(seen, F.col("c1") * 4 * tv).otherwise(tv)
    scored = (
        db.crossJoin(F.broadcast(tot))
        .join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), ["w1"], "left")
        .join(F.broadcast(cont), ["w2"], "left")
        .select(
            id_col,
            (flog2_x1024(den) - flog2_x1024(num)).alias("bits_x1024"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("bits_x1024").cast("long").alias("nll_kn_x1024"),
    )
    return agg.select(
        id_col,
        "n_bigrams",
        "nll_kn_x1024",
        _int_div(F.col("nll_kn_x1024") * 100, F.col("n_bigrams") * 1024).alias(
            "bits_per_bigram_x100"
        ),
    )


def perplexity_buckets(
    scored: DataFrame,
    group_col: str = "lang",
    score_col: str = "bits_per_bigram_x100",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet head/middle/tail tertiles per group (Wenzek et al. 2020: the
    corpus is sharded by per-language perplexity tertile; "head" = most
    reference-like, typically kept; "tail" = candidates for dropping).

    NOT a rank window: a per-language ntile would globally sort each
    language partition — one task per language at 100 TB. Instead the
    tertile CUTOFFS come from a (group, score) HISTOGRAM (the
    events_mad_outliers rank-selection discipline): scores are bounded
    integers, so the histogram + its cumulative sums are value-domain-
    sized, the two cutoffs per group broadcast, and bucketing is a
    map-side comparison. Tie semantics are cutoff-based (all docs at a
    boundary score share a bucket) — deterministic in any engine, unlike
    ntile's arbitrary tie split.

    Cutoffs: c1 = smallest score with cumulative count >= ceil(n/3),
    c2 = smallest with cum >= ceil(2n/3); bucket = head (score <= c1),
    middle (<= c2), else tail. Returns ``scored``'s rows + ``ppl_bucket``.

    ``scored`` is consumed TWICE (histogram branch + output join branch),
    so an unpersisted expensive scoring subtree recomputes (the repo's
    multi-branch rule). Measured at sf0.1 the KN recompute is a wash
    (model-sized joins, ±2%), so no persist is forced here — callers
    whose scoring derivation is corpus-dominant should persist ``scored``
    before calling.
    """
    from pyspark.sql import Window

    hist = scored.groupBy(group_col, score_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        group_col,
        score_col,
        F.sum("_n").over(w).alias("_cum"),
        F.sum("_n").over(
            Window.partitionBy(group_col).orderBy(score_col).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_tot"),
    )
    cuts = cum.groupBy(group_col).agg(
        F.min(
            F.when(
                F.col("_cum") * 3 >= F.col("_tot"), F.col(score_col)
            )
        ).alias("_c1"),
        F.min(
            F.when(
                F.col("_cum") * 3 >= F.col("_tot") * 2, F.col(score_col)
            )
        ).alias("_c2"),
    )
    out = scored.join(F.broadcast(cuts), group_col).withColumn(
        "ppl_bucket",
        F.when(F.col(score_col) <= F.col("_c1"), F.lit("head"))
        .when(F.col(score_col) <= F.col("_c2"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    return out.drop("_c1", "_c2")


def hashed_bucket(token: Column, n_buckets: int = 1024) -> Column:
    """md5-derived feature bucket — engine-portable (any system with md5
    reproduces the bucketing, so weights are comparable across engines)."""
    return (
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long") % n_buckets
    )


def dsir_weights(
    docs: DataFrame,
    target_filter: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR importance weight per document, in integer bits.

    Tokens hash into ``n_buckets`` md5 buckets; per-token weight is
    ``flog2(Ct(b) + 1) - flog2(Cs(b) + 1)`` where ``Ct`` counts the bucket
    in the target slice (rows matching ``target_filter``) and ``Cs`` in the
    whole corpus — the floor-log2 likelihood ratio of the hashed-unigram
    models. Summed per document it ranks documents by target-domain
    affinity for importance resampling. Returns
    ``(id, n_tokens, weight_bits)`` for documents with >= 1 token.

    Plan: the token explode is declared once and evaluated twice — once
    reducing to the ``n_buckets``-row count model (map-side partial agg, a
    bucket-sized shuffle), once joined back against that broadcast model for
    scoring (one corpus-sized groupBy(doc) shuffle). Both target and source
    counts come from the same aggregate via a conditional sum, so the model
    pass is single. At 100 TB, persist the exploded projection (or harvest
    the model from a sample) to collapse the two scans into one.
    """
    from affinity_spark.cache import track

    toks = docs.select(
        F.col(id_col),
        target_filter.alias("_is_target"),
        F.explode(tokenize(F.col(text_col))).alias("tok"),
    ).select(
        id_col, "_is_target", hashed_bucket(F.col("tok"), n_buckets).alias("b")
    )
    # two consumers (bucket-count model + scoring join): the frame is three
    # narrow ints per token, so persisting beats re-running the tokenize +
    # md5 explode (the exception the r8 fan-out counterexample carves out is
    # frames CARRYING arrays, not this)
    toks = track(toks.persist())

    counts = toks.groupBy("b").agg(
        F.count("*").cast("long").alias("cs"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).cast("long").alias("ct"),
    )

    scored = toks.join(F.broadcast(counts), ["b"], "left").select(
        id_col,
        (
            flog2(F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1))
            - flog2(F.coalesce(F.col("cs"), F.lit(0)) + F.lit(1))
        ).alias("bits"),
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("bits").cast("long").alias("weight_bits"),
    )


def train_nb_model(
    train_docs: DataFrame,
    label: Column,
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Hashed-unigram Naive Bayes model: ``(b, cp, cn)`` per feature bucket.

    ``cp``/``cn`` count token occurrences in positive/negative documents
    (``label`` is a boolean Column over ``train_docs``). The model is
    bucket-sized (``n_buckets`` rows max) regardless of corpus size — one
    explode + one bucket-sized shuffle to train, broadcastable to score.
    Reference analogue: the gather-style UDAF aggregation surface
    (api/.../Gather*.java); the classifier itself is the public
    fastText-as-NB quality-filter recipe, not a reference port.
    """
    toks = train_docs.select(
        label.alias("_pos"), F.explode(tokenize(F.col(text_col))).alias("tok")
    ).select("_pos", hashed_bucket(F.col("tok"), n_buckets).alias("b"))
    return toks.groupBy("b").agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).cast("long").alias("cp"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).cast("long").alias("cn"),
    )


def nb_score_bits(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-document Naive Bayes log-odds in 1/1024-bit fixed point.

    Per-token weight is the likelihood ratio with add-one smoothing,
    normalized by the class token masses::

        w = [lg(cp+1) - lg(cn+1)] - [lg(Np+B) - lg(Nn+B)]

    with ``lg`` = :func:`flog2_x1024` (``Np``/``Nn`` = total positive/
    negative token counts, ``B`` = ``n_buckets`` — the smoothing
    denominator mass). Whole-bit :func:`flog2` is NOT enough here: the
    weight is a difference of nearly-equal logs, and flooring to whole
    bits measurably zeroes every token on balanced classes. Summed per
    document; ``score_x1024 > 0`` predicts positive. Exact integers, so
    any engine reproduces the decision bit-for-bit. Documents with zero
    tokens yield no row (no evidence, no verdict).

    Plan: model + its 1-row totals broadcast; document tokens join them
    map-side; ONE corpus-sized shuffle (groupBy doc).
    """
    totals = model.agg(
        F.sum("cp").cast("long").alias("np_"),
        F.sum("cn").cast("long").alias("nn_"),
    )
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("tok")
    ).select(id_col, hashed_bucket(F.col("tok"), n_buckets).alias("b"))
    scored = (
        toks.join(F.broadcast(model), ["b"], "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            (
                flog2_x1024(F.coalesce(F.col("cp"), F.lit(0)) + F.lit(1))
                - flog2_x1024(F.coalesce(F.col("cn"), F.lit(0)) + F.lit(1))
                - (
                    flog2_x1024(F.col("np_") + F.lit(n_buckets))
                    - flog2_x1024(F.col("nn_") + F.lit(n_buckets))
                )
            ).alias("w"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("w").cast("long").alias("score_x1024"),
    )


def classifier_eval(
    scored: DataFrame,
    truth_col: str = "is_pos",
    score_col: str = "score_x1024",
) -> DataFrame:
    """One-row confusion matrix + precision/recall/F1 in basis points.

    ``scored`` carries a boolean truth column and an integer score column;
    prediction is ``score > 0``. Ratios are exact integer basis points
    (``10000*tp div (tp+fp)`` etc.), zero-guarded so an empty class can't
    raise under ANSI mode. One corpus-sized aggregate, 1-row output — the
    recall-measurement discipline (emb_ivf_recall) applied to the
    supervised filter.
    """
    t = F.col(truth_col)
    p = F.col(score_col) > 0
    cm = scored.agg(
        F.sum(F.when(t & p, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(~t & p, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(t & ~p, 1).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~t & ~p, 1).otherwise(0)).cast("long").alias("tn"),
    )

    def ratio_bp(num: Column, den: Column) -> Column:
        return _int_div(num * 10000, den)  # _int_div is zero-guarded

    return cm.select(
        (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")).alias("n_eval"),
        "tp",
        "fp",
        "fn",
        "tn",
        ratio_bp(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision_bp"),
        ratio_bp(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall_bp"),
        ratio_bp(
            F.col("tp") * 2, F.col("tp") * 2 + F.col("fp") + F.col("fn")
        ).alias("f1_bp"),
    )

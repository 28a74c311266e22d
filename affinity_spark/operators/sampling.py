"""Deterministic sampling / splitting / packing for training-data pipelines.

These are the corpus-management primitives an LLM data pipeline runs after
cleaning and dedup (SURVEY §7 phase 6): carve the corpus into train/val/test,
draw stratified subsamples, and pack documents into fixed-token context
windows. All are expressed as pure DataFrame transforms whose randomness is
*derived* (md5 of the stable document id), never drawn — so a re-run, a
different executor count, or a different engine (the DuckDB oracle) lands
every row in the same bucket.

Scale notes (100 TB):
- ``hash_bucket`` is a map-side projection — zero shuffle; a split/sample is
  a pushdown-friendly filter over it. This is why hash-splits beat
  ``df.randomSplit`` in pipelines: randomSplit re-draws per run and per
  lineage replay, hash splits are stable under retries and incremental
  reruns.
- ``pack_sequences`` windows are partitioned by a shard column (``source``):
  each shard packs independently (the standard concat-and-chunk layout),
  so the sort is per-shard and parallel, never a global single-partition
  window. A straddling document continues into the next pack — chunking at
  the context boundary, exactly what a block-packed training loader does.

Reference intent: the reference has no training-pipeline layer (its analogue
is the per-key deterministic murmur2 routing,
``api/src/main/java/io/amient/affinity/core/Murmur2Partitioner.java:24-31``);
the determinism contract here mirrors that routing-stability requirement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Total buckets for hash splits — 1000 gives 0.1% split granularity.
N_BUCKETS = 1000


def hash_bucket(id_col: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Stable bucket in [0, n_buckets) from the document id.

    md5-derived (first 8 hex chars → int) so DuckDB reproduces it exactly:
    ``CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT) % n``.
    """
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % F.lit(n_buckets)).cast("long")


def train_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Label every row train/val/test by stable hash bucket (percent bounds).

    Adds ``bucket`` and ``split`` columns; no shuffle, no state — the split
    of a row is a pure function of its id, so adding new data never moves
    old rows across splits (critical for eval-set hygiene at corpus scale).
    """
    if not 0 < train_pct + val_pct <= 100:
        raise ValueError("train_pct + val_pct must be in (0, 100]")
    b = hash_bucket(F.col(id_col))
    lo_train = train_pct * (N_BUCKETS // 100)
    lo_val = (train_pct + val_pct) * (N_BUCKETS // 100)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < lo_train, F.lit("train"))
        .when(F.col("bucket") < lo_val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame, id_col: str, stratum_col: str, pct_by_stratum: dict[str, int]
) -> DataFrame:
    """Deterministic per-stratum subsample: keep rows whose hash bucket falls
    under the stratum's percentage. Unlisted strata are dropped.

    A pure filter (bucket < pct*10) — zero-shuffle map-side sampling whose
    rate can differ per stratum (e.g. downsample web crawl to 10%, keep
    curated sources at 100%), the standard corpus-mixing move.
    """
    b = hash_bucket(F.col(id_col))
    keep = F.lit(False)
    for stratum, pct in sorted(pct_by_stratum.items()):
        keep = keep | (
            (F.col(stratum_col) == F.lit(stratum)) & (b < F.lit(pct * (N_BUCKETS // 100)))
        )
    return df.filter(keep)


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    context_tokens: int,
) -> DataFrame:
    """Assign each document the context-window pack it *starts* in.

    Concat-and-chunk packing: within a shard, documents are laid out in
    ``order_col`` order and the token stream is cut every ``context_tokens``
    tokens; ``pack_id`` = exclusive-running-token-count div context size.
    A document straddling a boundary continues into the next pack (block
    packing — no padding waste, the layout GPT-style loaders use).

    One shuffle (window partition by shard); shards pack independently and
    in parallel, so the plan scales with shard count, not corpus size.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    # integer `div`, not double division: for non-power-of-two context
    # sizes a double quotient can land on the wrong side of an integer
    # boundary vs the oracle's `//` once cumulative sums grow large.
    return (
        df.withColumn("_cum_prev", (cum - F.col(tokens_col)).cast("long"))
        .withColumn("pack_id", F.expr(f"_cum_prev div {int(context_tokens)}L"))
        .drop("_cum_prev")
    )


def pack_bestfit(
    df: DataFrame,
    shard_col: str,
    id_col: str,
    tokens_col: str,
    context_tokens: int,
) -> DataFrame:
    """First-Fit-Decreasing bin packing into fixed ``context_tokens``
    windows, per shard — the padding-minimizing alternative to
    :func:`pack_sequences` when documents must stay WHOLE (no straddling):
    sort the shard's docs by (tokens desc, id asc), place each into the
    first already-open pack it fits, else open a new pack. FFD packs
    within 11/9·OPT + 6/9 bins (Dósa 2007) — near-optimal for the
    long-tail doc-length distributions training corpora have.

    A doc longer than the context always opens its own (overflowing) pack
    — the caller chunks oversize docs first (operators/chunking.py) if
    that is not acceptable.

    The fold is genuinely sequential per shard (each placement depends on
    every earlier placement), so this is the documented applyInPandas
    case: shards pack independently and in parallel, the per-shard loop is
    O(docs·bins) over one Arrow batch, and scale comes from shard count —
    a shard is a training-shard-sized unit (~10⁴ docs), never the corpus.
    Output adds ``pack_id`` (0-based, per shard). Deterministic: the sort
    key is total, so retries and engines agree bit-for-bit.
    """
    import pandas as pd  # noqa: F401

    out_schema = (
        f"{id_col} long, {shard_col} string, {tokens_col} long, pack_id long"
    )
    cap = int(context_tokens)

    def pack(pdf):
        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True], kind="mergesort"
        )
        pdf = pdf.assign(pack_id=ffd_pack(list(pdf[tokens_col].astype(int)), cap))
        return pdf[[id_col, shard_col, tokens_col, "pack_id"]]

    return df.select(id_col, shard_col, tokens_col).groupBy(shard_col).applyInPandas(
        pack, out_schema
    )


def ffd_pack(weights: list[int], cap: int) -> list[int]:
    """The pure FFD fold (weights already in placement order): place each
    weight into the FIRST open pack it fits, else open a new pack; an
    oversize weight always opens its own (overflowing) pack. Returns the
    pack index per weight. Property-tested in tests/test_corpus_ops.py;
    shared by pack_bestfit's per-shard Arrow batches."""
    loads: list[int] = []
    assigned: list[int] = []
    for w in weights:
        w = int(w)
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
        assigned.append(placed)
    return assigned


def near_dup_survivors(
    pairs: DataFrame, emb: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Keep-first semantic dedup: drop any row appearing as the *larger* id
    of a near-duplicate pair (pairs carry id_a < id_b), keep everything else.

    ``pairs`` comes from a bucketed candidate generator
    (:func:`affinity_spark.operators.similarity.cosine_join_within`), so the
    anti-join is against a candidate set bounded by Σ|cell|² — the SemDeDup
    recipe (Abbas et al. 2023): cluster, compare within cluster, keep the
    lowest-id member of each near-dup group.
    """
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return emb.join(dropped, id_col, "left_anti")


def per_group_sample(
    df: DataFrame, id_col: str, group_col: str, k: int
) -> DataFrame:
    """Deterministic K-per-group subsample (the distributed stand-in for
    per-group reservoir sampling): rank rows inside each group by the
    md5-derived hash of their id and keep the K smallest.

    Because the rank key is a pure function of the id, the selected set is
    stable across runs, retries, and engines — a true reservoir's selection
    depends on encounter order, which a distributed scan can't fix. One
    shuffle on the group key; ``WindowGroupLimit`` keeps only K rows per
    group on the map side before the exchange.
    """
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(id_col), 1 << 31).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_group_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weight_col: str,
    k: int,
    max_tickets: int = 64,
) -> DataFrame:
    """Deterministic WEIGHTED K-per-group subsample: each row holds
    ``clamp(weight, 1, max_tickets)`` md5 "tickets" (hash of ``id:j``),
    its rank key is the MINIMUM ticket, and the K smallest keys per group
    win — weight-proportional inclusion by ticket replication.

    Why not the textbook A-ES key (u^(1/w), Efraimidis–Spirakis): that
    needs ``ln``/``pow`` on doubles, and libm differs across engines in
    the last ulp — a floor()'d fixed-point log amplifies that into
    different integers, so the selected SET itself becomes
    engine-dependent. Ticket replication keeps every quantity an exact
    int64 (the repo's cross-engine hash rule) at the documented price of
    weight granularity: weights are effectively integers capped at
    ``max_tickets``, so inclusion odds are proportional only up to the
    cap. Per-row cost is ≤ max_tickets md5s, map-side; selection remains
    one WindowGroupLimit shuffle on the group key, like
    :func:`per_group_sample`."""
    from affinity_spark.functions.murmur2 import stable_token_hash

    w_clamped = F.greatest(
        F.lit(1), F.least(F.col(weight_col).cast("long"), F.lit(max_tickets))
    )
    idc = F.col(id_col).cast("string")
    key = F.array_min(
        F.transform(
            F.sequence(F.lit(1).cast("long"), w_clamped),
            lambda j: stable_token_hash(
                F.concat(idc, F.lit(":"), j.cast("string"))
            ),
        )
    )
    win = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def isqrt(x: Column) -> Column:
    """Exact integer sqrt of a nonnegative BIGINT column.

    floor(sqrt(double)) is correct for almost all inputs (IEEE sqrt is
    correctly rounded) but the two CASE corrections make it exact at every
    perfect-square boundary on any engine — the same guard the DuckDB
    oracle applies, so both sides agree bit-for-bit.
    """
    s = F.floor(F.sqrt(x.cast("double"))).cast("long")
    s = F.when((s + 1) * (s + 1) <= x, s + 1).otherwise(s)
    return F.when(s * s > x, s - 1).otherwise(s)


def temperature_budget_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weight_col: str,
    total_budget: int,
) -> DataFrame:
    """Temperature-scaled source mixing (τ=2): each group's token budget is
    proportional to sqrt of its total token mass, then filled in stable
    hash order like :func:`token_budget_sample`.

    The multilingual/pretraining sampling move (sampling exponent 1/τ,
    e.g. XLM-R's α=0.5): raw proportional sampling lets giant sources
    drown the mixture, uniform budgets overweight tiny ones — √-scaling is
    the standard compromise. All integer math: budgets are
    ``(total_budget * isqrt(T_g)) div Σ isqrt(T)``, so any engine
    reproduces the selection exactly.

    Plan: group totals are a group-count-sized aggregate broadcast back;
    the fill is the same single partition-aligned window as
    ``token_budget_sample``.
    """
    totals = df.groupBy(group_col).agg(
        F.sum(F.col(weight_col)).cast("long").alias("_t")
    )
    weights = totals.select(group_col, isqrt(F.col("_t")).alias("_w"))
    wsum = weights.agg(F.sum("_w").cast("long").alias("_wsum"))
    # zero-mass guard: when every group's token mass is 0, _wsum is 0 and
    # an unguarded div is ANSI-fatal; budget 0 selects nothing, matching
    # the oracle's NULL-division row drop.
    budgets = (
        weights.crossJoin(F.broadcast(wsum))
        .select(
            group_col,
            F.expr(
                f"CASE WHEN _wsum > 0 THEN (CAST({total_budget} AS BIGINT) * _w)"
                " div _wsum ELSE 0 END"
            ).alias("grp_budget"),
        )
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(hash_bucket(F.col(id_col), 1 << 31).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(F.col(weight_col)).over(w), F.lit(0)).cast("long")
    return (
        df.join(F.broadcast(budgets), group_col)
        .withColumn("cum_before", cum)
        .filter(F.col("cum_before") < F.col("grp_budget"))
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weight_col: str,
    budget: int,
    order_by: list | None = None,
) -> DataFrame:
    """Fill a per-group token budget: docs are taken in a deterministic
    total order until each group's cumulative weight reaches ``budget``
    (the last doc may overshoot — take-while on the EXCLUSIVE running
    sum). ``order_by`` defaults to stable hash order (selection a pure
    function of ids — run/retry/engine stable); pass explicit sort
    columns for priority-ordered selection (e.g. DSIR importance weights
    descending). Callers must make the order TOTAL (include the id) or
    ties are engine-dependent.

    This is the corpus-mixing primitive behind "x billion tokens per
    source": unlike a percentage sample, the stop condition is the token
    count itself, so skewed sources contribute equal token mass.

    One shuffle (the per-group window); at 100 TB the group is the
    partition column, so the exchange is partition-aligned and the
    running sum never sees more than one group per task.
    """
    if order_by is None:
        order_by = [hash_bucket(F.col(id_col), 1 << 31).asc(), F.col(id_col).asc()]
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(F.col(weight_col)).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("cum_before", cum)
        .filter(F.col("cum_before") < budget)
    )


def token_budget_sample_scalable(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weight_col: str,
    budget: int,
    n_coarse: int = 4096,
) -> DataFrame:
    """``token_budget_sample`` with the full-group window removed — the
    100 TB form of the take-while. Selects EXACTLY the same rows with the
    same ``cum_before`` values (same (hash, id) total order, same
    exclusive-running-sum stop rule), but no window ever spans more than
    one COARSE BUCKET (~group_tokens / n_coarse rows):

    1. coarse bucket = top bits of the same hash the fine order sorts by,
       so coarse is a prefix of the selection order;
    2. per-(group, coarse) token sums + a cumulative over that tiny frame
       (groups x n_coarse rows) classify buckets: fully taken
       (cum + sum < budget), skipped (cum >= budget), boundary (the one
       bucket the budget line crosses);
    3. skipped buckets never rejoin the data; taken/boundary rows get
       their exact cum_before as bucket_offset + within-bucket running
       sum, a window PARTITIONED BY (group, bucket) — bucket-sized state,
       partition-aligned, no group-wide sort anywhere;
    4. the boundary bucket additionally applies the strict
       ``cum_before < budget`` filter, preserving the zero-weight-row
       edge exactly (a bucket landing exactly ON the budget is classified
       boundary, not fully-taken).
    """
    step = (1 << 31) // n_coarse
    base = df.withColumn("_h", hash_bucket(F.col(id_col), 1 << 31)).withColumn(
        "_coarse", F.expr(f"_h div {step}")
    )
    sums = base.groupBy(group_col, "_coarse").agg(
        F.sum(F.col(weight_col)).cast("long").alias("_w")
    )
    wc = (
        Window.partitionBy(group_col)
        .orderBy("_coarse")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = sums.withColumn(
        "_cb", F.coalesce(F.sum("_w").over(wc), F.lit(0)).cast("long")
    )
    kept = marked.filter(F.col("_cb") < budget).select(group_col, "_coarse", "_cb")

    wb = (
        Window.partitionBy(group_col, "_coarse")
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out_cols = df.columns
    return (
        base.join(F.broadcast(kept), [group_col, "_coarse"])
        .withColumn(
            "cum_before",
            (
                F.col("_cb")
                + F.coalesce(F.sum(F.col(weight_col)).over(wb), F.lit(0)).cast("long")
            ),
        )
        .filter(F.col("cum_before") < budget)
        .select(*out_cols, "cum_before")
    )

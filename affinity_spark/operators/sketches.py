"""Mergeable distributed sketches: count-min and HyperLogLog registers.

Sketches are the scale answer to "how often / how many distinct" questions
that don't justify an exact shuffle of the full key set: the sketch TABLE
is tiny and fixed-size (d×w counters, 2^p registers), partial aggregation
happens map-side, and merging is associative (sum for count-min, max for
HLL) — so 1000 executors each reduce their partitions to a sketch and the
final combine is constant-sized regardless of data volume. The reference
keeps exact per-key state; sketches are the §2.13-era counterpart for
cardinalities where exact state no longer fits.

Engine parity: hashes are md5-derived (any engine reproduces them), and
the operators return the sketch's INTEGER state (counters / registers),
not a float estimate — estimates are a trivial driver-side post-step
(:func:`cms_estimate`, :func:`hll_estimate`), while the state itself is
bit-for-bit checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from affinity_spark.functions.lits import long_array_lit


def _h(x: Column, salt: int, hex_chars: int = 8) -> Column:
    """md5-derived positive integer hash of ``x`` with an integer salt
    (``hex_chars`` ≤ 15 keeps conv() inside the positive int64 range)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), x)), 1, hex_chars), 16, 10
    ).cast("long")


def cms_sketch(
    df: DataFrame,
    key: Column,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch of ``key`` occurrences: ``(depth, bucket, cnt)``.

    One pass: each row contributes ``depth`` (row, bucket) updates via an
    inline array explode (map-side, no per-depth re-scan), then one
    ``groupBy(depth, bucket)`` whose output is exactly ``depth × width``
    rows — the shuffle is sketch-sized thanks to partial aggregation.
    Merging two sketches = summing counters per (depth, bucket).
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("depth"),
                (_h(key, i) % width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(sketch_rows: list, key_value: str, depth: int = 3, width: int = 256) -> int:
    """Point estimate for one key from a collected sketch: min over the
    key's d counters (never underestimates; overestimates by collisions)."""
    import hashlib

    table = {(r["depth"], r["bucket"]): r["cnt"] for r in sketch_rows}
    est = None
    for i in range(depth):
        h = int(hashlib.md5(f"{i}:{key_value}".encode()).hexdigest()[:8], 16)
        c = table.get((i, h % width), 0)
        est = c if est is None else min(est, c)
    return int(est or 0)


#: HLL geometry: 60-bit md5-derived hash = p bucket bits + (60-p) rank field
HLL_HASH_BITS = 60


def hll_registers(df: DataFrame, key: Column, p: int = 8) -> DataFrame:
    """HyperLogLog register table of ``key``'s distinct values:
    ``(bucket, register)`` with ``2^p`` rows.

    The 60-bit md5 hash splits into a ``p``-bit bucket and a rank field;
    ``register`` is the max over the bucket's values of (leading-zero count
    of the rank field) + 1 — computed exactly as ``field_bits − floor_log2``
    via ``length(bin(x)) − 1``, so any engine reproduces the registers.
    Merging sketches = elementwise max; the shuffle is 2^p rows.
    """
    field_bits = HLL_HASH_BITS - p
    h = _h(key, 0, hex_chars=15)  # 60 bits, positive
    bucket = h % (1 << p)
    # rank field via shiftright — exact integer op; any float path loses
    # low bits of a 60-bit value (doubles are exact only below 2^53).
    proj = df.select(
        bucket.alias("bucket"), F.shiftright(h, p).alias("_w")
    )
    rank = F.when(
        F.col("_w") > 0,
        F.lit(field_bits) - (F.length(F.bin(F.col("_w"))) - 1),
    ).otherwise(F.lit(field_bits + 1)).cast("long")
    return (
        proj.select("bucket", rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll_registers_by_group(
    df: DataFrame, group_col: str, key: Column, p: int = 8
) -> DataFrame:
    """Per-group HLL register tables: ``(group, bucket, register)``.

    The grouped approx-distinct shape ("distinct users per event type /
    per day / per tenant") — shuffle is ``groups × 2^p`` rows however big
    the input; per-group estimates come from :func:`hll_estimate` over
    each group's registers, and cross-engine the register table is exact.
    """
    field_bits = HLL_HASH_BITS - p
    h = _h(key, 0, hex_chars=15)
    proj = df.select(
        F.col(group_col),
        (h % (1 << p)).alias("bucket"),
        F.shiftright(h, p).alias("_w"),
    )
    rank = F.when(
        F.col("_w") > 0,
        F.lit(field_bits) - (F.length(F.bin(F.col("_w"))) - 1),
    ).otherwise(F.lit(field_bits + 1)).cast("long")
    return (
        proj.select(group_col, "bucket", rank.alias("rank"))
        .groupBy(group_col, "bucket")
        .agg(F.max("rank").alias("register"))
    )


def bloom_bitmap(
    df: DataFrame,
    key: Column,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom filter as DATA: the membership bitmap for ``key``'s values,
    as ``(word_idx, bits)`` rows of 64-bit words — an exportable artifact
    another pipeline (or engine) probes without rescanning this corpus,
    e.g. "have we already trained on this document fingerprint".

    md5-derived bit positions (engine-exact, like every hash here); the
    aggregate is ``bit_or`` per word — associative and mergeable, so the
    shuffle is bitmap-sized (≤ m/63 rows) at any input size. Words hold
    63 bits (0..62): a bit-63 shift overflows DuckDB's checked BIGINT
    arithmetic, and 63-bit words keep every word value positive in any
    engine. Probe with :func:`bloom_might_contain`.

    Each position hashes ONCE: positions are a transform over the salt
    array (one md5 per salt), and the word/bit split reads the position
    as a lambda VARIABLE — a real binding, not a re-evaluated outer
    expression (the repo-wide HOF lesson).
    """
    salts = F.array(*[F.lit(i) for i in range(k_hashes)])
    positions = F.transform(
        salts,
        lambda i: F.conv(
            F.substring(F.md5(F.concat(i.cast("string"), F.lit(":"), key)), 1, 8),
            16,
            10,
        ).cast("long")
        % m_bits,
    )
    # shiftleft takes only a literal count in PySpark — a 63-entry
    # power-of-two lookup array does the variable shift exactly
    pow2 = F.array(*[F.lit(1 << b).cast("long") for b in range(63)])
    cells = F.transform(
        positions,
        lambda pos: F.struct(
            F.floor(pos / 63).cast("long").alias("word_idx"),
            F.get(pow2, (pos % 63).cast("int")).alias("bit"),
        ),
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.word_idx").alias("word_idx"))
        .agg(F.bit_or(F.col("c.bit")).alias("bits"))
    )


def bloom_words_dense(bitmap_rows: list, m_bits: int) -> list[int]:
    """Densify collected ``bloom_bitmap`` rows into a positional word list
    (index = word_idx, 0 for absent words) — the form :func:`bloom_member_expr`
    embeds as ONE array literal. Driver memory is bounded by ``m_bits``
    (m/63 longs) regardless of how many keys built the filter."""
    words = [0] * ((m_bits + 62) // 63)
    for r in bitmap_rows:
        words[r["word_idx"]] = r["bits"]
    return words


def bloom_member_expr(
    key: Column, words: list[int], m_bits: int, k_hashes: int = 3
) -> Column:
    """Map-side bloom probe: True iff every salted md5 position of ``key``
    has its bit set in ``words`` (the :func:`bloom_words_dense` form) —
    i.e. "maybe member"; False is a definite miss (the bloom contract).

    This is the bounded-memory alternative to broadcasting the exact key
    set: the probe plan carries m/63 longs (TWO literal array nodes total —
    the r5 nested-literal lesson, not one node per word), the executor does
    k md5s + k bit tests per value, and NOTHING shuffles. Same position
    math as :func:`bloom_bitmap`, so any engine replays it exactly.

    Each position hashes ONCE: the word/bit split reads the position as a
    let-bound lambda variable, not a re-evaluated outer expression."""
    from affinity_spark.functions.text import let_bound

    words_lit = F.lit(words)
    pow2 = long_array_lit(1 << b for b in range(63))
    salts = F.array(*[F.lit(i) for i in range(k_hashes)])

    def bit_set(i: Column) -> Column:
        pos = (
            F.conv(
                F.substring(
                    F.md5(F.concat(i.cast("string"), F.lit(":"), key)), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )
        return let_bound(
            pos,
            lambda p: F.get(words_lit, F.floor(p / 63).cast("int"))
            .bitwiseAND(F.get(pow2, (p % 63).cast("int")))
            != F.lit(0).cast("long"),
        )

    return F.forall(salts, bit_set)


def bloom_might_contain(
    bitmap_rows: list, value: str, m_bits: int = 4096, k_hashes: int = 3
) -> bool:
    """Probe a collected bitmap: True = maybe present, False = definitely
    not (the bloom contract)."""
    import hashlib

    words = {r["word_idx"]: r["bits"] for r in bitmap_rows}
    for i in range(k_hashes):
        pos = int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:8], 16) % m_bits
        if not (words.get(pos // 63, 0) >> (pos % 63)) & 1:
            return False
    return True


def hll_estimate(register_rows: list, p: int = 8) -> float:
    """Standard HLL estimate from collected registers (driver-side float —
    the cross-engine contract is the register table, not this number)."""
    m = 1 << p
    regs = {r["bucket"]: r["register"] for r in register_rows}
    z = sum(2.0 ** -regs.get(b, 0) for b in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    return alpha * m * m / z


# --- log-linear quantile sketch (DDSketch-style) ----------------------------


def dd_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    m: int = 8,
) -> DataFrame:
    """Mergeable log-linear quantile sketch (the DDSketch family, Masson
    et al. VLDB 2019, public): per key, counts over octave buckets — octave
    e = floor_log2(v) via the repo's ``length(bin(v)) - 1`` fixed point,
    subdivided into ``m`` linear sub-buckets so relative error <= 1/m.

        bucket(v) = e*m + ((v - 2^e) * m) div 2^e        (v clamped to >= 1)

    Pure integer arithmetic: any engine computes identical buckets, so the
    sketch is engine-portable like the CMS/HLL register tables above.
    State is (key, bucket, n) — counts merge by addition, the mergeability
    contract every distributed sketch needs (partial aggregates combine
    map-side; two sketches union+sum). Completes the sketch family:
    CMS = frequency, HLL = distinct, bloom = membership, DD = quantiles.

    Scale shape: one hash aggregate on (key, bucket); the shuffle carries
    at most keys x (64*m) rows regardless of input size.
    """
    base = (
        df.select(
            *key_cols,
            F.greatest(F.col(value_col).cast("long"), F.lit(1).cast("long")).alias("_v"),
        )
        .withColumn("_e", (F.length(F.bin(F.col("_v"))) - 1).cast("int"))
        .withColumn("_pw", F.expr("shiftleft(1L, _e)"))
        .withColumn(
            "bucket",
            F.col("_e").cast("long") * m + F.expr(f"((_v - _pw) * {m}) div _pw"),
        )
    )
    return base.groupBy(*key_cols, "bucket").agg(F.count(F.lit(1)).alias("n"))


def dd_quantiles(
    sketch: DataFrame,
    key_cols: list[str],
    qs: tuple[int, ...] = (50, 90, 99),
    m: int = 8,
) -> DataFrame:
    """Quantile estimates from a ``dd_sketch``: per key, the LOWER BOUND of
    the first bucket whose cumulative count reaches rank
    ``(n-1)*q div 100 + 1`` (the same 1-based rank-selection convention as
    ``events_value_quantiles``), where a bucket's lower bound is

        lo(bucket) = 2^e + (sub * 2^e) div m,  e = bucket div m, sub = bucket % m

    — integer-exact, so estimates reproduce across engines. The guarantee
    is relative: lo <= true quantile < lo * (1 + 1/m)."""
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*key_cols)
    c = (
        sketch.withColumn("_cum", F.sum("n").over(w_cum))
        .withColumn("_tot", F.sum("n").over(w_tot))
        .withColumn("_e", F.expr(f"cast(bucket div {m} as int)"))
        .withColumn("_pw", F.expr("shiftleft(1L, _e)"))
        .withColumn("_lo", F.expr(f"_pw + ((bucket % {m}) * _pw) div {m}"))
    )
    aggs = [
        F.min(
            F.when(
                F.col("_cum") >= F.expr(f"(_tot - 1) * {q} div 100 + 1"), F.col("_lo")
            )
        ).alias(f"p{q}_est")
        for q in qs
    ]
    return c.groupBy(*key_cols).agg(F.max("_tot").alias("n"), *aggs)


# --- bounded-memory heavy hitters (two-pass Misra-Gries) --------------------


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
) -> DataFrame:
    """EXACT keys with count > N/(k+1), found without ever shuffling the
    full key space — the bounded-memory heavy-hitters plan (Misra-Gries
    1982 summaries + exact recount, the standard two-pass distributed
    form).

    Pass 1 runs a k-counter Misra-Gries summary per PARTITION
    (Arrow-batched; memory is k counters regardless of partition size).
    The union of partition candidates provably contains every global
    heavy hitter: if c(x) > N/(k+1) globally, then by averaging some
    partition has c_p(x) > N_p/(k+1), and MG with k counters never evicts
    such an item to zero at partition end. Pass 2 broadcast-semi-joins the
    candidate set (<= partitions * k keys) and recounts exactly; the
    filter ``n_occ * (k+1) > N`` then yields EXACTLY the true heavy
    hitters — candidates are a superset, the recount removes false
    positives, and no false negative can exist.

    Why not plain groupBy(key).count(): at 100 TB with billions of
    distinct keys that shuffles the whole key space to answer a question
    about <= k keys. Here the shuffle carries candidates only; the recount
    join is a broadcast of a tiny set. Output: (key, n_occ), exact.
    """
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    key_field = df.schema[key_col]
    cand_schema = StructType([StructField(key_col, key_field.dataType)])

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[key_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        yield pd.DataFrame({key_col: list(counters.keys())})

    candidates = (
        df.select(key_col).mapInPandas(mg_partition, cand_schema).distinct()
    )
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occ") * (k + 1) > F.col("_n"))
        .select(key_col, "n_occ")
    )


# --- K-minimum-values (theta) distinct sketch -------------------------------

KMV_M = 1 << 32  # _h with 8 hex chars is uniform on [0, 2^32)


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value: Column, k: int = 64
) -> DataFrame:
    """(group..., kmv array<long>): the k SMALLEST distinct md5-derived
    hashes of ``value`` per group — the KMV / theta sketch (Bar-Yossef et
    al. 2002; the Theta family of the DataSketches line). Unlike HLL it
    supports SET ALGEBRA: the union of two sketches is the k smallest of
    the merged arrays (:func:`kmv_union`), and intersections estimate by
    inclusion-exclusion — the question HLL registers cannot answer.

    Plan shape: distinct on (group, hash) → per-group ``row_number() <=
    k`` — Spark rewrites that window into WindowGroupLimit, a bounded
    per-partition top-k heap, so no group's full hash set is ever
    buffered; the output is sketch-sized (<= k rows per group) and the
    final collect_list is over <= k values. Deterministic md5 hashing =
    bit-identical sketches in any engine (the repo's oracle convention).
    """
    from pyspark.sql import Window

    d = df.select(*group_cols, _h(value, 0).alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("_h")).alias("kmv"))
    )


def kmv_estimate(kmv: Column, k: int) -> Column:
    """Integer distinct-count estimate of a KMV sketch: exact size when
    the group had fewer than k distinct values (the sketch IS the set),
    else (k-1)·M / kth_min using EXACT integer arithmetic — the dividend
    (a - a mod b) is divisible by b, so the double division is exact and
    the result matches DuckDB's ``//`` bit-for-bit."""
    c = F.lit((k - 1) * KMV_M).cast("long")
    kth = F.greatest(F.element_at(kmv, k), F.lit(1))
    floor_div = ((c - F.pmod(c, kth)) / kth).cast("long")
    return F.when(F.size(kmv) < k, F.size(kmv).cast("long")).otherwise(floor_div)


def kmv_union(kmv_a: Column, kmv_b: Column, k: int) -> Column:
    """Union sketch from two sketches alone (mergeability): the k
    smallest of the concatenated distinct arrays — identical to a sketch
    built over the unioned raw data, which is what makes KMV sketches
    combinable across partitions, tables, or days without raw re-reads."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(kmv_a, kmv_b))), 1, k)

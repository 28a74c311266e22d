"""Time-series similarity / motif queries over the events table.

The distributed-series-search family (EDBT'19 streaming-series search;
matrix-profile/STAMP motif shape): per-user integer activity series with
pure-integer time quantization so every result is engine-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module level: pandas-UDF type hints resolve against
                     # the DEFINING module's globals (CLAUDE.md r10 rule)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from affinity_spark.registry._shared import _t

def events_series_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the distributed-series-search family,
    e.g. EDBT'19 streaming-series search): each user's 2024 activity as a
    64-bin integer count series (bin = integer time quantization of the
    event timestamp), then the 10 users most similar to the LOWEST-id
    user's series by exact integer L1 distance, ties to the lower id.
    Scale shape = emb_batch_search over derived vectors: one map-side
    partial-agg groupBy to (user, bin) counts, a per-user fold to the
    dense series, the query series broadcast (1 row), distances map-side,
    TakeOrderedAndProject for the top-k — the corpus series never
    shuffle for the search itself."""
    ev = _t(spark, sf_dir, "events")
    # integer 64-way quantization of 2024 (366 days), clamped; pure
    # integer arithmetic so DuckDB reproduces bins bit-for-bit
    bin_ = F.expr(
        # clamp the microsecond delta BEFORE the *64: a far-from-2024 ts
        # (regenerated-corpus drift) would overflow int64 under ANSI mode
        # while DuckDB promotes to HUGEINT — clamping first keeps the
        # product < 2^51 in both engines (r11 ADVICE)
        "(least(greatest(unix_micros(ts) - 1704067200000000, 0),"
        " 31622399999999) * 64) div 31622400000000"
    )
    counts = (
        ev.select("user_id", bin_.alias("bin"))
        .groupBy("user_id", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    series = (
        counts.groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bin", "c"))
            ).alias("m")
        )
        .select(
            "user_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda b: F.coalesce(
                    F.element_at(F.col("m"), b.cast("long")),
                    F.lit(0).cast("long"),
                ),
            ).alias("v"),
        )
    )
    # the query-user selection is IN the plan (a 1-row broadcast agg of
    # the column-pruned events scan) — no separate driver job per call
    # (r11 verdict #7; the serving-latency discipline the store-served
    # reads follow)
    mn1 = ev.agg(F.min("user_id").alias("_mn"))
    q = (
        series.crossJoin(F.broadcast(mn1))
        .filter(F.col("user_id") == F.col("_mn"))
        .select(F.col("v").alias("qv"))
    )
    return (
        series.crossJoin(F.broadcast(mn1))
        .filter(F.col("user_id") != F.col("_mn"))
        .drop("_mn")
        .crossJoin(F.broadcast(q))
        .select(
            "user_id",
            F.aggregate(
                F.zip_with("v", F.col("qv"), lambda a, b: F.abs(a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("l1_dist"),
        )
        .orderBy(F.col("l1_dist").asc(), F.col("user_id").asc())
        .limit(10)
    )


_SERIES_KNN_SQL = """
WITH b AS (
  SELECT user_id,
         (least(greatest(epoch_us(ts) - 1704067200000000, 0),
               31622399999999) * 64) // 31622400000000 AS bin
  FROM events
),
c AS (SELECT user_id, bin, CAST(count(*) AS BIGINT) AS c
      FROM b GROUP BY user_id, bin),
users AS (SELECT DISTINCT user_id FROM b),
spine AS (SELECT u.user_id, t.i AS bin
          FROM users u CROSS JOIN range(0, 64) t(i)),
v AS (SELECT s.user_id, s.bin, coalesce(c.c, 0) AS val
      FROM spine s LEFT JOIN c ON c.user_id = s.user_id AND c.bin = s.bin),
qu AS (SELECT min(user_id) AS q FROM b),
d AS (
  SELECT a.user_id, CAST(sum(abs(a.val - qv.val)) AS BIGINT) AS l1_dist
  FROM v a JOIN v qv ON qv.user_id = (SELECT q FROM qu) AND qv.bin = a.bin
  WHERE a.user_id != (SELECT q FROM qu)
  GROUP BY a.user_id
)
SELECT user_id, l1_dist FROM (
  SELECT user_id, l1_dist,
         row_number() OVER (ORDER BY l1_dist ASC, user_id ASC) AS rn
  FROM d
) WHERE rn <= 10
"""


def events_series_motif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user motif discovery (the matrix-profile family, STAMP/STOMP
    shape): in each user's 64-bin activity series, the most similar pair
    of NON-OVERLAPPING length-8 windows by exact integer L1, ties to the
    lexicographically smallest (i, j). The per-user extraction adds ZERO
    shuffles to the series aggregate: all ~1.2k window-pair distances of
    a row are computed inside one Arrow-vectorized kernel
    (``_motif_kernel`` — numpy sliding windows; the expression-level
    twin ``_motif_expression_level`` computes the same packed-long
    argmin fully in Catalyst but pays ~20x in interpreted HOF eval, so
    the kernel serves and the twin pins equivalence in tests).
    Output: (user_id, w_i, w_j, l1_dist)."""
    ev = _t(spark, sf_dir, "events")
    bin_ = F.expr(
        # clamp the microsecond delta BEFORE the *64: a far-from-2024 ts
        # (regenerated-corpus drift) would overflow int64 under ANSI mode
        # while DuckDB promotes to HUGEINT — clamping first keeps the
        # product < 2^51 in both engines (r11 ADVICE)
        "(least(greatest(unix_micros(ts) - 1704067200000000, 0),"
        " 31622399999999) * 64) div 31622400000000"
    )
    counts = (
        ev.select("user_id", bin_.alias("bin"))
        .groupBy("user_id", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    series = (
        counts.groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bin", "c"))
            ).alias("m")
        )
        .select(
            "user_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda b: F.coalesce(
                    F.element_at(F.col("m"), b.cast("long")),
                    F.lit(0).cast("long"),
                ),
            ).alias("v"),
        )
    )

    return series.select(
        "user_id", _motif_kernel(F.col("v")).alias("_m")
    ).select("user_id", "_m.w_i", "_m.w_j", "_m.l1_dist")


_SERIES_MOTIF_SQL = """
WITH b AS (
  SELECT user_id,
         (least(greatest(epoch_us(ts) - 1704067200000000, 0),
               31622399999999) * 64) // 31622400000000 AS bin
  FROM events
),
c AS (SELECT user_id, bin, CAST(count(*) AS BIGINT) AS c
      FROM b GROUP BY user_id, bin),
users AS (SELECT DISTINCT user_id FROM b),
spine AS (SELECT u.user_id, t.i AS bin
          FROM users u CROSS JOIN range(0, 64) t(i)),
v AS (SELECT s.user_id, s.bin, coalesce(c.c, 0) AS val
      FROM spine s LEFT JOIN c ON c.user_id = s.user_id AND c.bin = s.bin),
pairs AS (
  SELECT u.user_id, wi.i, wj.j,
         CAST(sum(abs(a.val - bb.val)) AS BIGINT) AS l1
  FROM users u
  CROSS JOIN range(0, 49) wi(i)
  CROSS JOIN range(0, 57) wj(j)
  CROSS JOIN range(0, 8) k(k)
  JOIN v a  ON a.user_id = u.user_id AND a.bin = wi.i + k.k
  JOIN v bb ON bb.user_id = u.user_id AND bb.bin = wj.j + k.k
  WHERE wj.j >= wi.i + 8
  GROUP BY u.user_id, wi.i, wj.j
)
SELECT user_id, CAST(i AS BIGINT) AS w_i, CAST(j AS BIGINT) AS w_j,
       l1 AS l1_dist
FROM (
  SELECT user_id, i, j, l1,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY l1 ASC, i ASC, j ASC) AS rn
  FROM pairs
) WHERE rn = 1
"""



from pyspark.sql.types import LongType, StructField, StructType

# DataType object, not a DDL string: string return types parse via the
# ACTIVE SparkContext at decoration time, which breaks plain imports
_MOTIF_TYPE = StructType([
    StructField("w_i", LongType()),
    StructField("w_j", LongType()),
    StructField("l1_dist", LongType()),
])


@F.pandas_udf(_MOTIF_TYPE)
def _motif_kernel(v: pd.Series) -> pd.DataFrame:
    """Vectorized motif extraction: all non-overlapping length-8 window
    pair L1 distances of one 64-bin series via numpy broadcasting
    (57x57x8 integer ops, Arrow-batched) with (l1, i, j) lexicographic
    tie-break. The expression-level twin (packed-long argmin over a
    flattened HOF) computes the same thing but pays interpreted-eval
    per element — measured 20x slower at sf0.1; this is the documented
    escape hatch (Arrow-batched, never row-at-a-time python)."""
    out = []
    for arr in v:
        a = np.asarray(arr, dtype=np.int64)
        W = np.lib.stride_tricks.sliding_window_view(a, 8)  # 57 x 8
        best = 1 << 62
        bi = bj = 0
        for i in range(0, 49):
            row = np.abs(W[i + 8 :] - W[i]).sum(axis=1)
            j = int(np.argmin(row))  # first min -> smallest j
            d = int(row[j])
            if d < best:  # strict: keeps the smallest i on ties
                best, bi, bj = d, i, i + 8 + j
        out.append((bi, bj, best))
    return pd.DataFrame(out, columns=["w_i", "w_j", "l1_dist"])

def _motif_expression_level(series: DataFrame) -> DataFrame:
    """Expression-level motif twin (flattened HOF distances + packed-long
    argmin: dist*4096 + i*64 + j, i,j < 64 — the r8 packed-compare rule):
    identical semantics to the vectorized kernel, kept as the
    whole-plan-in-Catalyst reference shape and pinned equal by
    tests/test_series.py. ~20x the constant of the Arrow kernel at
    sf0.1 (interpreted HOF eval), which is why the served query uses
    the kernel."""

    def win_l1(i, j):
        return F.aggregate(
            F.zip_with(
                F.slice(F.col("v"), i + 1, 8),
                F.slice(F.col("v"), j + 1, 8),
                lambda a, b: F.abs(a - b),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    keys = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(48)),
            lambda i: F.transform(
                F.sequence(i + 8, F.lit(56)),
                lambda j: win_l1(i, j) * 4096 + i * 64 + j,
            ),
        )
    )
    return series.withColumn("_k", F.array_min(keys)).select(
        "user_id",
        F.expr("(_k % 4096) div 64").alias("w_i"),
        F.expr("_k % 64").alias("w_j"),
        F.expr("_k div 4096").alias("l1_dist"),
    )


_MATCHED_TYPE = StructType([
    StructField("w_i", LongType()),
    StructField("match_user", LongType()),
    StructField("w_j", LongType()),
    StructField("l1_dist", LongType()),
])


@F.pandas_udf(_MATCHED_TYPE)
def _matched_window_kernel(
    user_id: pd.Series, v: pd.Series, pack: pd.Series
) -> pd.DataFrame:
    """Cross-user matrix-profile AB-join kernel: for one user's 64-bin
    series, the most similar length-8 window in ANY OTHER cohort user's
    series by exact integer L1 — all 57x57 window distances per user
    pair via numpy broadcasting (Arrow-batched; the motif kernel's
    machinery across series). Tie-break lexicographic on
    (l1, i, match_user, j); per-pair np.argmin over the row-major flat
    array yields smallest (i, j) first, and the explicit tuple compare
    carries the match_user rank."""
    rows = []
    for uid, arr, pk in zip(user_id, v, pack):
        a = np.asarray(arr, dtype=np.int64)
        wa = np.lib.stride_tricks.sliding_window_view(a, 8)  # 57 x 8
        best = None
        for entry in pk:
            b_uid = int(entry["user_id"])
            if b_uid == int(uid):
                continue
            wb = np.lib.stride_tricks.sliding_window_view(
                np.asarray(entry["v"], dtype=np.int64), 8
            )
            d = np.abs(wa[:, None, :] - wb[None, :, :]).sum(axis=2)
            flat = int(np.argmin(d))
            i, j = divmod(flat, d.shape[1])
            cand = (int(d[i, j]), i, b_uid, j)
            if best is None or cand < best:
                best = cand
        rows.append((best[1], best[2], best[3], best[0]))
    return pd.DataFrame(
        rows, columns=["w_i", "match_user", "w_j", "l1_dist"]
    )


def events_series_matched_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-user matched windows — the matrix-profile AB-JOIN
    (``events_series_motif`` finds each series' best pair WITHIN itself;
    this finds each cohort user's best length-8 window match in ANY
    OTHER cohort user's series, exact integer L1, ties
    (l1, i, match_user, j)-lexicographic). Cohort = the 12 most active
    users (count desc, id asc — the bounded-cohort lever: at 100 TB the
    AB-join runs per cohort, the series derivation stays the same
    map-side aggregate over everyone). The 12 series pack into ONE 1-row
    broadcast (12x64 ints — codebook-sized) and every user's 57x11x57
    window distances run inside one Arrow kernel: zero shuffles beyond
    the series aggregate and the cohort top-k. Output:
    (user_id, w_i, match_user, w_j, l1_dist)."""
    ev = _t(spark, sf_dir, "events")
    bin_ = F.expr(
        "(least(greatest(unix_micros(ts) - 1704067200000000, 0),"
        " 31622399999999) * 64) div 31622400000000"
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(12)
        .select("user_id")
    )
    counts = (
        ev.select("user_id", bin_.alias("bin"))
        .join(F.broadcast(top), "user_id")
        .groupBy("user_id", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    series = (
        counts.groupBy("user_id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("bin", "c"))).alias("m")
        )
        .select(
            "user_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda b: F.coalesce(
                    F.element_at(F.col("m"), b.cast("long")),
                    F.lit(0).cast("long"),
                ),
            ).alias("v"),
        )
    )
    pack = series.agg(
        F.array_sort(F.collect_list(F.struct("user_id", "v"))).alias("pack")
    )
    return (
        series.crossJoin(F.broadcast(pack))
        .select(
            "user_id",
            _matched_window_kernel(
                F.col("user_id"), F.col("v"), F.col("pack")
            ).alias("_m"),
        )
        .select("user_id", "_m.w_i", "_m.match_user", "_m.w_j", "_m.l1_dist")
    )


_SERIES_MATCHED_SQL = """
WITH b AS (
  SELECT user_id,
         (least(greatest(epoch_us(ts) - 1704067200000000, 0),
               31622399999999) * 64) // 31622400000000 AS bin
  FROM events
),
act AS (SELECT user_id, count(*) AS n FROM b GROUP BY user_id),
top AS (
  SELECT user_id FROM (
    SELECT user_id, row_number() OVER (ORDER BY n DESC, user_id ASC) AS rn
    FROM act
  ) WHERE rn <= 12
),
c AS (SELECT b.user_id, bin, CAST(count(*) AS BIGINT) AS c
      FROM b JOIN top USING (user_id) GROUP BY b.user_id, bin),
spine AS (SELECT t.user_id, i.i AS bin
          FROM top t CROSS JOIN range(0, 64) i(i)),
v AS (SELECT s.user_id, s.bin, coalesce(c.c, 0) AS val
      FROM spine s LEFT JOIN c ON c.user_id = s.user_id AND c.bin = s.bin),
pairs AS (
  SELECT ua.user_id, wi.i, ub.user_id AS u2, wj.j,
         CAST(sum(abs(a.val - bb.val)) AS BIGINT) AS l1
  FROM top ua
  JOIN top ub ON ub.user_id <> ua.user_id
  CROSS JOIN range(0, 57) wi(i)
  CROSS JOIN range(0, 57) wj(j)
  CROSS JOIN range(0, 8) k(k)
  JOIN v a  ON a.user_id = ua.user_id AND a.bin = wi.i + k.k
  JOIN v bb ON bb.user_id = ub.user_id AND bb.bin = wj.j + k.k
  GROUP BY ua.user_id, wi.i, ub.user_id, wj.j
)
SELECT user_id, CAST(i AS BIGINT) AS w_i, u2 AS match_user,
       CAST(j AS BIGINT) AS w_j, l1 AS l1_dist
FROM (
  SELECT user_id, i, u2, j, l1,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY l1 ASC, i ASC, u2 ASC, j ASC) AS rn
  FROM pairs
) WHERE rn = 1
"""

"""As-of (point-in-time) join.

Not implemented by the reference (SURVEY §2.6 end-note: as-of maps to
union+window); it IS the lookup its stream-table enrichment approximates
when the dimension is itself versioned. Spark-first implementation is the
union-and-window scheme: tag both sides, union on the key, sort within key
by (time, side), and carry the last-seen right-side payload forward onto
left-side rows — one shuffle on the key, no range explosion, no pandas.

At 100 TB this beats per-group ``merge_asof`` in Python because it stays in
whole-stage codegen and the single shuffle co-locates by key; skewed keys
fall to AQE skew handling like any window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) for the same key.

    Right payload columns come back null when no prior right row exists —
    left-outer as-of semantics. Ties among right rows at the same
    (key, right_ts) are broken by the last ``right_payload`` struct in
    column order — pre-deduplicate the right side for full determinism.
    """
    key = list(on)
    # Side tag orders ties at equal ts: non-strict puts right (0) before
    # left (1) so a same-ts right row is visible; strict reverses that.
    l_tag, r_tag = (0, 1) if strict else (1, 0)

    left_payload = [c for c in left.columns if c not in key]
    lhs = left.select(
        *key,
        F.col(left_ts).alias("_t"),
        F.lit(l_tag).alias("_side"),
        F.struct(*[F.col(c) for c in left_payload]).alias("_lpay"),
    )
    rhs = right.select(
        *key,
        F.col(right_ts).alias("_t"),
        F.lit(r_tag).alias("_side"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_rpay"),
    )
    lpay_t = lhs.schema["_lpay"].dataType
    rpay_t = rhs.schema["_rpay"].dataType
    unioned = lhs.withColumn("_rpay", F.lit(None).cast(rpay_t)).unionByName(
        rhs.withColumn("_lpay", F.lit(None).cast(lpay_t))
    )
    w = (
        Window.partitionBy(*key)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_asof", F.last("_rpay", ignorenulls=True).over(w))
    return carried.filter(F.col("_lpay").isNotNull()).select(
        *key,
        F.col("_lpay.*"),
        *[F.col(f"_asof.{c}").alias(c) for c in right_payload],
    )

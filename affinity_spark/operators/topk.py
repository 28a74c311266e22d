"""Top-K / latest-N per group.

The reference keeps a "latest 3 per partition" deque via change listeners
(affinity ``examples/example-external-state/.../ExampleESGateway.scala:63-69``).
Declaratively this is a ranking window — and at scale Spark turns
``row_number() <= k`` into a per-partition top-k (WindowGroupLimit /
rank-limit pushdown) so no group ever materializes more than k rows on the
reduce side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    n: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Deterministic top-n rows per group (order_by must be total)."""
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_by)
    ranked = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n)
    if rank_col:
        return ranked.withColumnRenamed("_rn", rank_col)
    return ranked.drop("_rn")


def global_top_n(df: DataFrame, order_by: Sequence[Column], n: int) -> DataFrame:
    """ORDER BY + LIMIT — Spark plans TakeOrderedAndProject: per-partition
    heap of n then driver merge, no full sort at any scale."""
    return df.orderBy(*order_by).limit(n)

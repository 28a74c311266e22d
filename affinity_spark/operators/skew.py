"""Skew mitigation: salted two-phase aggregation and salted broadcast-side
replication joins.

The reference sidesteps skew by construction (murmur2 spreads keys; hot
keys still serialize through one partition master — its README calls this
the ordering guarantee, not a bug). At 100 TB analytical scale a hot group
key WILL dominate a shuffle, so the engine provides the standard rewrites
(alongside AQE's runtime skew-join splitting, which handles the join case
automatically when stats reveal it):

- ``salted_aggregate``: groupBy(key, salt) partial → groupBy(key) final.
  Exactly the partial/final split Spark already does map-side, but with an
  explicit intermediate shuffle fan-out for the case where ONE reduce key
  is too big for any single task even after map-side combine.
- ``replicate_join``: broadcast-unfriendly-but-skewed equi-join — explode
  the small side into N salted copies, salt the big side uniformly, join on
  (key, salt): the hot key's rows spread over N tasks.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_agg, final_agg) pairs per supported reduction
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: Mapping[str, tuple[Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregate: ``aggs`` maps output name -> (column, reduction)
    with reduction in {sum, count, min, max} (the mergeable reductions; avg
    = sum/count composed by the caller). Results are identical to a direct
    groupBy — verified against the same SQL oracle."""
    salt = (F.spark_partition_id() % n_salts).alias("_salt")
    partial_exprs = []
    final_exprs = []
    for name, (col, red) in aggs.items():
        if red not in _MERGEABLE:
            raise ValueError(f"unsupported reduction {red!r}")
        partial_fn, final_fn = _MERGEABLE[red]
        partial_exprs.append(partial_fn(col).alias(f"_p_{name}"))
        final_exprs.append(final_fn(F.col(f"_p_{name}")).alias(name))
    partial = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)


def replicate_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate ``small`` n_salts times, spread
    ``big`` uniformly across salts, join on (keys + salt)."""
    key = list(on)
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_big = big.withColumn("_salt", F.spark_partition_id() % n_salts)
    return salted_big.join(salted_small, [*key, "_salt"], how).drop("_salt")
